"""Data-layer tests: synthetic dataset invariants, GTEA manifest over a
temp fake dataset layout, AT sequence building, device prefetch."""

import os

import numpy as np
import pytest

from gaze_tpu.data.gtea import build_manifest, pair_batches
from gaze_tpu.data.prefetch import device_prefetch
from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator, generate_sequence
from gaze_tpu.train.at import build_weight_sequences


class TestSynthetic:
    @pytest.fixture(scope="class")
    def seq(self):
        return generate_sequence(SyntheticSpec(num_frames=32, height=64, width=64))

    def test_shapes_and_dtypes(self, seq):
        frames, gaze, fixsac = seq
        assert frames.shape == (32, 64, 64, 3) and frames.dtype == np.uint8
        assert gaze.shape == (32, 2) and fixsac.shape == (32,)

    def test_gaze_matches_blob(self, seq):
        from scipy.ndimage import gaussian_filter

        frames, gaze, _ = seq
        # smoothed brightness peak should be near the gaze on every frame
        # (raw argmax can land on a bright background texel)
        for t in range(0, 32, 7):
            lum = gaussian_filter(frames[t].astype(np.float32).sum(-1), 3.0)
            y, x = np.unravel_index(lum.argmax(), lum.shape)
            assert abs(x - gaze[t, 0]) < 4 and abs(y - gaze[t, 1]) < 4

    def test_fixsac_structure(self, seq):
        _, gaze, fixsac = seq
        assert fixsac.min() == 0.0 and fixsac.max() == 1.0
        # gaze barely moves within fixations
        for t in range(1, 32):
            if fixsac[t] == 1.0 and fixsac[t - 1] == 1.0:
                assert np.linalg.norm(gaze[t] - gaze[t - 1]) < 2.0

    def test_deterministic(self):
        spec = SyntheticSpec(num_frames=8, height=32, width=32, seed=3)
        a = generate_sequence(spec)
        b = generate_sequence(spec)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_batch_iterator(self):
        spec = SyntheticSpec(num_frames=16, height=32, width=32)
        batches = list(batch_iterator(spec, batch_size=4, num_batches=3))
        assert len(batches) == 3
        for b in batches:
            assert b["prev"].shape == (4, 32, 32, 3)
            assert b["cur"].shape == (4, 32, 32, 3)
            assert b["gaze"].shape == (4, 2)
            assert b["fixsac"].shape == (4,)


class TestGTEAManifest:
    @pytest.fixture()
    def fake_root(self, tmp_path):
        from PIL import Image

        root = tmp_path / "gtea"
        for video in ["Alice_Pizza", "Bob_Burger"]:
            vdir = root / "images" / video
            vdir.mkdir(parents=True)
            for i in range(4):
                Image.new("RGB", (32, 24), (i * 10, 0, 0)).save(vdir / f"{i:06d}.jpg")
            (root / "gaze").mkdir(exist_ok=True)
            with open(root / "gaze" / f"{video}.txt", "w") as f:
                for i in range(4):
                    f.write(f"{10 + i} {12 + i}\n")
            (root / "fixsac").mkdir(exist_ok=True)
            with open(root / "fixsac" / f"{video}.txt", "w") as f:
                f.write("1\n1\n0\n1\n")
        return str(root)

    def test_manifest(self, fake_root):
        m = build_manifest(fake_root)
        assert m.videos == ["Alice_Pizza", "Bob_Burger"]
        assert m.subjects() == ["Alice", "Bob"]
        assert len(m.frames["Alice_Pizza"]) == 4
        assert m.frames["Alice_Pizza"][2].fixation == 0.0

    def test_split(self, fake_root):
        m = build_manifest(fake_root)
        train, test = m.split_leave_one_out("Alice")
        assert all(r.video.startswith("Bob") for r in train)
        assert all(r.video.startswith("Alice") for r in test)

    def test_pair_batches_scales_gaze(self, fake_root):
        m = build_manifest(fake_root)
        recs = m.frames["Alice_Pizza"]
        batches = list(pair_batches(recs, 2, target_hw=(224, 224), shuffle=False))
        assert len(batches) == 1
        b = batches[0]
        assert b["prev"].shape == (2, 24, 32, 3)
        # gaze x scaled by 224/32, y by 224/24
        np.testing.assert_allclose(b["gaze"][0], [11 * 224 / 32, 13 * 224 / 24])

    def test_missing_root_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            build_manifest(str(tmp_path / "nope"))


class TestWeightSequences:
    def test_groups_by_fixation_onset(self):
        w = np.arange(10, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
        fixsac = np.array([1, 1, 0, 1, 1, 1, 0, 1, 0, 1], np.float32)
        # fixation onsets at frames 0, 3, 7, 9 -> 4 fixation vectors;
        # window [9] alone has <2 valid steps and is dropped
        seqs, masks = build_weight_sequences(w, fixsac, seq_len=3)
        assert seqs.shape == (1, 3, 4)
        np.testing.assert_allclose(seqs[0, :, 0], [0, 3, 7])
        np.testing.assert_allclose(masks[0], [1, 1, 1])

    def test_too_few_fixations(self):
        w = np.ones((5, 4), np.float32)
        seqs, masks = build_weight_sequences(w, np.zeros(5, np.float32), 4)
        assert seqs.shape[0] == 0


class TestPrefetch:
    def test_preserves_order_and_values(self):
        import jax.numpy as jnp

        batches = [{"x": np.full((4, 2), i, np.float32)} for i in range(5)]
        out = list(device_prefetch(iter(batches)))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert float(b["x"][0, 0]) == i
            assert isinstance(b["x"], jnp.ndarray)
