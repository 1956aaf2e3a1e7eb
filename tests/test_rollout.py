"""Sequential rollout evaluation (evaluation/rollout.py): chunk-boundary
exactness and untracked-gaze masking."""

import jax
import numpy as np
import pytest

from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
from gaze_tpu.evaluation.rollout import rollout_eval_arrays
from gaze_tpu.models.pipeline import GazePipeline
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def rollout_setup():
    cfg = tiny_config()
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    frames, gaze, fixsac = [], [], []
    for i in range(2):
        f, g, fx = generate_sequence(
            SyntheticSpec(num_frames=9, height=32, width=32, seed=10 + i,
                          blob_sigma=3.0)
        )
        frames.append(f)
        gaze.append(g)
        fixsac.append(fx)
    return pipeline, variables, np.stack(frames), np.stack(gaze), np.stack(fixsac)


class TestRolloutArrays:
    def test_chunk_boundaries_are_exact(self, rollout_setup):
        """State threading across chunk boundaries (incl. tail padding)
        must not change any metric: chunk_len 3 == chunk_len 8 == one shot."""
        pipeline, variables, frames, gaze, fixsac = rollout_setup
        outs = [
            rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                chunk_len=c)
            for c in (3, 8, 64)
        ]
        for o in outs[1:]:
            for a, b in zip(outs[0], o):
                np.testing.assert_allclose(a, b, rtol=1e-5)
        # 9 frames -> 8 scored (frame 0 only seeds the flow pair)
        np.testing.assert_array_equal(outs[0][2], [8, 8])

    def test_invalid_frames_cannot_leak(self, rollout_setup):
        """Garbage GT on masked frames must not move the sums."""
        pipeline, variables, frames, gaze, fixsac = rollout_setup
        valid = np.ones(fixsac.shape, np.float32)
        valid[0, 3] = 0.0
        valid[1, 5:7] = 0.0
        clean = rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                    valid=valid)
        garbage = gaze.copy()
        garbage[0, 3] = [1e6, -1e6]
        garbage[1, 5:7] = np.nan
        dirty = rollout_eval_arrays(pipeline, variables, frames, garbage,
                                    fixsac, valid=valid)
        for a, b in zip(clean, dirty):
            np.testing.assert_allclose(a, b, rtol=1e-6)
        np.testing.assert_array_equal(clean[2], [7, 6])


class TestScoreKeyAblation:
    def test_score_key_selects_map(self, rollout_setup):
        """score_key='saliency'/'attention' score a different map than
        the LF fusion on the SAME trajectory (random-init maps differ),
        while count stays identical; bad keys raise."""
        pipeline, variables, frames, gaze, fixsac = rollout_setup
        full = rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac)
        sp = rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                 score_key="saliency")
        at = rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                 score_key="attention")
        np.testing.assert_array_equal(full[2], sp[2])
        np.testing.assert_array_equal(full[2], at[2])
        assert not np.allclose(full[1], sp[1])  # AUC sums differ
        assert not np.allclose(full[1], at[1])
        with pytest.raises(ValueError):
            rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                score_key="nope")


class TestRolloutSharded:
    def test_mesh_sharded_matches_single_device(self, rollout_setup):
        """Rollout eval sharded over the 8-device virtual mesh must agree
        with the single-device path, including the inactive-slot padding
        (2 real videos pad to 8 mesh slots)."""
        from gaze_tpu.parallel.mesh import make_mesh

        pipeline, variables, frames, gaze, fixsac = rollout_setup
        single = rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac)
        mesh = make_mesh(8)
        sharded = rollout_eval_arrays(
            pipeline, variables, frames, gaze, fixsac, mesh=mesh
        )
        for a, b in zip(single, sharded):
            assert a.shape == b.shape  # padding sliced back off
            np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_videos_group_rounds_to_mesh(self, tmp_path, rollout_setup):
        """rollout_eval_videos with a mesh pads the group to a mesh-size
        multiple and still returns per-video numbers identical to the
        unsharded run (fake on-disk GTEA videos)."""
        from PIL import Image

        from gaze_tpu.data.gtea import FrameRecord
        from gaze_tpu.evaluation.rollout import rollout_eval_videos
        from gaze_tpu.parallel.mesh import make_mesh

        pipeline, variables, frames, gaze, fixsac = rollout_setup
        videos = {}
        for vi in range(2):
            recs = []
            for t in range(frames.shape[1]):
                p = tmp_path / f"v{vi}_{t:04d}.jpg"
                Image.fromarray(frames[vi, t]).save(p, quality=95)
                recs.append(FrameRecord(
                    video=f"v{vi}", index=t, image_path=str(p),
                    flow_path=None,
                    gaze=(float(gaze[vi, t, 0]), float(gaze[vi, t, 1])),
                    fixation=float(fixsac[vi, t]),
                ))
            videos[f"v{vi}"] = recs
        base = rollout_eval_videos(pipeline, variables, videos, group_size=3)
        mesh = make_mesh(4)
        sharded = rollout_eval_videos(
            pipeline, variables, videos, group_size=3, mesh=mesh
        )
        assert set(base) == set(sharded) == {"v0", "v1"}
        for v in base:
            np.testing.assert_allclose(base[v][:2], sharded[v][:2], rtol=1e-5)
            assert base[v][2] == sharded[v][2]
