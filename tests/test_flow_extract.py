"""--extract_flow: the on-TPU dense_flow replacement's *producer* side.

The reference's preprocessing runs yjxiong/dense_flow offline to fill
<root>/flows/ with quantized TV-L1 flow JPEGs (SURVEY.md §1 L0). These
tests prove this repo can now PRODUCE that layout (data/flow_extract.py)
and that its own consumption path (build_manifest / pair_batches /
--precomputed_flow) round-trips what it produced.
"""

import os

import numpy as np
import pytest

from gaze_tpu import cli
from gaze_tpu.core.config import TVL1Config
from gaze_tpu.data.gtea import build_manifest, pair_batches


def _make_layout(tmp_path, videos=("Alice_Pizza", "Bob_Burger"), frames=4,
                 hw=(24, 32)):
    """Fake GTEA layout with smooth translating content (so the solver
    recovers a nontrivial flow, unlike pure noise)."""
    from PIL import Image

    root = tmp_path / "gtea"
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for vi, video in enumerate(videos):
        vdir = root / "images" / video
        vdir.mkdir(parents=True)
        for i in range(frames):
            # Smooth sinusoid translating 1 px/frame in x.
            base = 127 + 100 * np.sin((xx - i - 3 * vi) * 0.4) * np.cos(yy * 0.3)
            img = np.repeat(base[..., None], 3, axis=-1).astype(np.uint8)
            Image.fromarray(img).save(vdir / f"{i:06d}.jpg", quality=95)
        (root / "gaze").mkdir(exist_ok=True)
        with open(root / "gaze" / f"{video}.txt", "w") as f:
            for i in range(frames):
                f.write(f"{10 + i} {12 + i}\n")
        (root / "fixsac").mkdir(exist_ok=True)
        with open(root / "fixsac" / f"{video}.txt", "w") as f:
            f.write("1\n" * frames)
    return str(root)


# Tiny solver schedule: the tests check plumbing/quantization exactness,
# not flow quality — keep CPU cost negligible.
_TINY = TVL1Config(pyramid_levels=2, warps=1, iters=2)


class TestExtractFlow:
    def test_png_layout_and_exact_roundtrip(self, tmp_path):
        """xy/png extraction writes flow_x_/flow_y_ for frames 1..T-1
        (never frame 0), the manifest detects them, and the decoded
        values are bit-exact vs the solver+quantizer (png is lossless)."""
        import jax
        import jax.numpy as jnp

        from gaze_tpu.data.flow_extract import (
            FlowExtractSpec, extract_flow_images, make_flow_quant_fn,
        )
        from gaze_tpu.data.gtea import _decode_flow_images
        from gaze_tpu.data.native_io import decode_batch

        root = _make_layout(tmp_path)
        spec = FlowExtractSpec(tvl1=_TINY, bound=15.0, fmt="png",
                               batch_size=2)  # 3 pairs -> tail padding
        total = extract_flow_images(root, spec, verbose=False)
        assert total == 2 * 3  # 2 videos x (4 frames - 1)

        vdir = os.path.join(root, "flows", "Alice_Pizza")
        assert not os.path.exists(os.path.join(vdir, "flow_x_000000.png"))
        for i in range(1, 4):
            assert os.path.exists(os.path.join(vdir, f"flow_x_{i:06d}.png"))
            assert os.path.exists(os.path.join(vdir, f"flow_y_{i:06d}.png"))

        manifest = build_manifest(root, native_hw=(24, 32))
        recs = manifest.frames["Alice_Pizza"]
        assert recs[0].flow_xy_paths is None
        assert all(r.flow_xy_paths is not None for r in recs[1:])

        got = _decode_flow_images(recs[1:])  # (3, 24, 32, 2) uint8
        paths = [r.image_path for r in recs]
        imgs = decode_batch(paths)
        fn = jax.jit(make_flow_quant_fn(spec, imgs.shape[1:3]))
        want = np.asarray(fn(jnp.asarray(imgs[:-1]), jnp.asarray(imgs[1:])))
        np.testing.assert_array_equal(got, want)

    def test_packed_layout(self, tmp_path):
        from gaze_tpu.data.flow_extract import FlowExtractSpec, extract_flow_images
        from gaze_tpu.data.gtea import _decode_flow_images

        root = _make_layout(tmp_path, videos=("Cara_Snack",), frames=3)
        spec = FlowExtractSpec(tvl1=_TINY, bound=15.0, layout="packed",
                               fmt="png", batch_size=4)
        assert extract_flow_images(root, spec, verbose=False) == 2
        manifest = build_manifest(root, native_hw=(24, 32))
        recs = manifest.frames["Cara_Snack"]
        assert recs[1].flow_path and recs[1].flow_path.endswith("000001.png")
        q = _decode_flow_images(recs[1:])
        assert q.shape == (2, 24, 32, 2)
        # Zero motion maps to code ~128; the 1 px/frame translation must
        # move the x channel away from a constant-128 image.
        assert q.dtype == np.uint8 and q[..., 0].std() > 0

    def test_pil_fallback_writer(self, tmp_path, monkeypatch):
        """cv2 is installed in this image, so the PIL branch of _imwrite
        (the cv2-less deployment path, incl. its ndim-3 RGB handling)
        never runs in CI unless forced: monkeypatch _cv2 away and check
        both layouts still produce files that decode to the same values
        the cv2 writer produces (png = lossless, exact)."""
        import gaze_tpu.data.flow_extract as fx
        from gaze_tpu.data.flow_extract import FlowExtractSpec
        from gaze_tpu.data.gtea import _decode_flow_images

        root = _make_layout(tmp_path, videos=("Dana_Tea",), frames=3)
        spec = FlowExtractSpec(tvl1=_TINY, bound=15.0, fmt="png",
                               batch_size=4)
        packed = FlowExtractSpec(tvl1=_TINY, bound=15.0, layout="packed",
                                 fmt="png", batch_size=4)
        # reference values via the default (cv2) writer
        assert fx.extract_flow_images(root, spec, verbose=False) == 2
        want = _decode_flow_images(
            build_manifest(root, native_hw=(24, 32)).frames["Dana_Tea"][1:]
        )
        import shutil

        shutil.rmtree(os.path.join(root, "flows"))
        monkeypatch.setattr(fx, "_cv2", lambda: None)
        assert fx.extract_flow_images(root, spec, verbose=False) == 2
        got = _decode_flow_images(
            build_manifest(root, native_hw=(24, 32)).frames["Dana_Tea"][1:]
        )
        np.testing.assert_array_equal(got, want)  # gray (ndim-2) writes
        shutil.rmtree(os.path.join(root, "flows"))
        assert fx.extract_flow_images(root, packed, verbose=False) == 2
        got_p = _decode_flow_images(
            build_manifest(root, native_hw=(24, 32)).frames["Dana_Tea"][1:]
        )
        np.testing.assert_array_equal(got_p, want)  # packed RGB (ndim-3)

    def test_cli_jpg_extraction_feeds_precomputed_flow(self, tmp_path):
        """The CLI stage end to end: --extract_flow writes dense_flow's
        jpg layout, pair_batches then auto-detects it and yields flow_img
        close to the exact quantized flow (jpg is lossy by design —
        matching the reference's data path)."""
        import jax
        import jax.numpy as jnp

        from gaze_tpu.data.flow_extract import FlowExtractSpec, make_flow_quant_fn
        from gaze_tpu.data.native_io import decode_batch

        root = _make_layout(tmp_path, videos=("Dave_Tea",), frames=4)
        cli.main(["--extract_flow", "--data_root", root,
                  "--batch_size", "2", "--tvl1_warps", "1",
                  "--tvl1_iters", "2"])
        manifest = build_manifest(root, native_hw=(24, 32))
        recs = manifest.frames["Dave_Tea"]
        assert all(r.flow_xy_paths is not None for r in recs[1:])

        batch = next(pair_batches(recs, 3, (24, 32), shuffle=False))
        assert "flow_img" in batch and batch["flow_img"].shape == (3, 24, 32, 2)

        # The CLI built its solver from make_config(args): default config
        # with warps/iters overridden. Recompute the exact codes and
        # bound the jpg loss.
        from gaze_tpu.core.config import default_config
        import dataclasses

        tvl1 = dataclasses.replace(default_config().tvl1, warps=1, iters=2)
        spec = FlowExtractSpec(tvl1=tvl1, bound=tvl1.quant_bound)
        imgs = decode_batch([r.image_path for r in recs])
        fn = jax.jit(make_flow_quant_fn(spec, imgs.shape[1:3]))
        want = np.asarray(
            fn(jnp.asarray(imgs[:3]), jnp.asarray(imgs[1:4]))
        ).astype(np.float32)
        got = batch["flow_img"].astype(np.float32)
        assert np.mean(np.abs(got - want)) < 4.0  # jpeg-loss band (codes)

    def test_cv2_writer_channel_order_and_codec_parity(self, tmp_path):
        """The jpg/png writer goes through cv2 when available (dense_flow
        writes via cv::imwrite — byte-level producer parity). Pins:
        (a) the packed layout's BGR flip is correct — the file decodes
        back as RGB (x, y, pad) regardless of reader; (b) cv2- and
        PIL-encoded JPEGs of the same smooth flow field agree within a
        small code band, so consumers fed either producer see the same
        statistics."""
        cv2 = pytest.importorskip("cv2")
        from PIL import Image

        from gaze_tpu.data.flow_extract import _save_gray, _save_packed

        # Smooth field (flow-like): tight codec loss bounds.
        yy, xx = np.mgrid[0:24, 0:32].astype(np.float32)
        fx = (128 + 40 * np.sin(xx / 8.0)).astype(np.uint8)
        fy = (128 - 30 * np.cos(yy / 6.0)).astype(np.uint8)

        pk = str(tmp_path / "packed.png")  # lossless: exact order check
        _save_packed(np.stack([fx, fy], -1), pk, quality=95)
        rgb = np.asarray(Image.open(pk).convert("RGB"))
        np.testing.assert_array_equal(rgb[..., 0], fx)
        np.testing.assert_array_equal(rgb[..., 1], fy)
        np.testing.assert_array_equal(rgb[..., 2], 128)

        pj = str(tmp_path / "g_cv2.jpg")
        _save_gray(fx, pj, quality=95)
        back = cv2.imread(pj, cv2.IMREAD_GRAYSCALE)
        assert np.abs(back.astype(np.int16) - fx.astype(np.int16)).mean() < 2.0

        pp = str(tmp_path / "g_pil.jpg")
        Image.fromarray(fx, mode="L").save(pp, quality=95)
        a = np.asarray(Image.open(pj).convert("L"), np.int16)
        b = np.asarray(Image.open(pp).convert("L"), np.int16)
        assert np.abs(a - b).mean() < 2.0  # cross-encoder delta band

    def test_requires_data_root(self):
        with pytest.raises(ValueError, match="data_root"):
            cli.main(["--extract_flow"])
