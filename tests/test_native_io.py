"""Native batch JPEG decoder tests (native/gaze_io.cpp via ctypes)."""

import os

import numpy as np
import pytest
from PIL import Image

from gaze_tpu.data.native_io import decode_batch, jpeg_dims, native_available


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        img = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
        p = str(d / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


class TestNativeIO:
    def test_native_builds(self):
        # g++/libjpeg are part of this image; the lib must build+load.
        assert native_available()

    def test_dims(self, jpegs):
        assert jpeg_dims(jpegs[0]) == (32, 24)

    def test_matches_pil(self, jpegs):
        out = decode_batch(jpegs)
        ref = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in jpegs])
        assert out.shape == ref.shape
        np.testing.assert_array_equal(out, ref)

    def test_resize(self, jpegs):
        out = decode_batch(jpegs, target_hw=(12, 16))
        assert out.shape == (8, 12, 16, 3)

    def test_failure_raises(self, jpegs, tmp_path):
        bad = str(tmp_path / "missing.jpg")
        if native_available():
            with pytest.raises(IOError):
                decode_batch(jpegs[:2] + [bad])

    def test_multithreaded_consistency(self, jpegs):
        a = decode_batch(jpegs, threads=1)
        b = decode_batch(jpegs, threads=8)
        np.testing.assert_array_equal(a, b)

    def test_matches_cv2(self, jpegs):
        """Independent cross-check against OpenCV's decoder (the codec
        dense_flow-era tooling used): libjpeg IDCT implementations may
        legitimately differ by a level or two, so pin a tight bound
        rather than exact equality (PIL-exactness is pinned above)."""
        cv2 = pytest.importorskip("cv2")
        out = decode_batch(jpegs)
        ref = np.stack(
            [cv2.imread(p, cv2.IMREAD_COLOR)[..., ::-1] for p in jpegs]
        )
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 2, f"native vs cv2 decode differs by {diff.max()}"
