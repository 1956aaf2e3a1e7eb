"""Gaze-overlay rendering (utils/viz.py): compositing semantics and the
MJPEG overlay video round-trip — the reference's demo-visualization
workflow (ref:README.md demo images), offline with no ffmpeg/OpenCV."""

import io

import numpy as np
import pytest

from gaze_tpu.utils.viz import (
    overlay_gaze_frame,
    render_gaze_track,
    write_overlay_video,
)


def _frame(h=48, w=64, value=120):
    return np.full((h, w, 3), value, np.uint8)


class TestOverlayFrame:
    def test_marker_drawn_at_gaze(self):
        out = overlay_gaze_frame(_frame(), gaze_xy=(32.0, 24.0))
        assert out.dtype == np.uint8 and out.shape == (48, 64, 3)
        # Center dot is the marker color; a far corner is untouched.
        assert tuple(out[24, 32]) == (0, 255, 64)
        assert tuple(out[0, 0]) == (120, 120, 120)
        # The black halo ring exists around the marker.
        assert (out.reshape(-1, 3) == 0).all(axis=1).any()

    def test_negative_gaze_draws_no_marker(self):
        out = overlay_gaze_frame(_frame(), gaze_xy=(-1.0, -1.0))
        np.testing.assert_array_equal(out, _frame())

    def test_heatmap_blend_peaks_red_and_resizes(self):
        # Model-grid (24x32) heatmap onto a 48x64 frame: peak location
        # scales 2x and blends toward red there, not elsewhere.
        hm = np.zeros((24, 32), np.float32)
        hm[6, 8] = 1.0
        out = overlay_gaze_frame(_frame(), heatmap=hm, alpha=0.5)
        peak = out[12, 16].astype(int)
        corner = out[0, 0].astype(int)
        assert peak[0] > corner[0]  # red boosted at the peak
        assert peak[1] < corner[1]  # green suppressed at the peak
        assert tuple(corner) == (120, 120, 120)  # zero heat -> untouched

    def test_rejects_bad_frame_shape(self):
        with pytest.raises(ValueError):
            overlay_gaze_frame(np.zeros((8, 8), np.uint8))


class TestOverlayVideo:
    def test_roundtrip_through_own_demuxer(self, tmp_path):
        from PIL import Image

        from gaze_tpu.data.video import iter_mjpeg_avi_frames

        frames = [_frame(value=v) for v in (40, 90, 140)]
        path = str(tmp_path / "overlay.avi")
        n = write_overlay_video(path, iter(frames), fps=12, quality=95)
        assert n == 3
        decoded = [
            np.asarray(Image.open(io.BytesIO(j)).convert("RGB"))
            for j in iter_mjpeg_avi_frames(path)
        ]
        assert len(decoded) == 3
        for d, f in zip(decoded, frames):
            assert d.shape == f.shape
            assert abs(int(d.mean()) - int(f.mean())) <= 3  # jpeg-lossy

    def test_mismatched_sizes_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            write_overlay_video(
                str(tmp_path / "x.avi"), [_frame(48, 64), _frame(32, 32)]
            )

    def test_empty_rejected(self, tmp_path):
        with pytest.raises(ValueError):
            write_overlay_video(str(tmp_path / "x.avi"), [])


class TestRenderGazeTrack:
    def test_reads_native_frames_and_marks(self, tmp_path):
        from PIL import Image

        paths = []
        for i in range(2):
            p = str(tmp_path / f"{i:06d}.jpg")
            Image.fromarray(_frame()).save(p, quality=95)
            paths.append(p)
        hm = np.zeros((24, 32), np.float32)
        hm[0, 0] = 1.0
        outs = list(
            render_gaze_track(paths, [(-1.0, -1.0), (40.0, 20.0)], [None, hm])
        )
        assert len(outs) == 2
        # Frame 0: no marker, no heatmap -> jpeg-close to the input.
        assert abs(int(outs[0].mean()) - 120) <= 3
        # Frame 1: marker color present at the gaze point.
        assert tuple(outs[1][20, 40]) == (0, 255, 64)
