"""Video-extraction wrapper tests (ffmpeg is a runtime dependency of the
deployment host, like the reference's offline preprocessing; this image
ships none, so the error path is what must be solid)."""

import pytest

from gaze_tpu.data.video import FFmpegNotFound, extract_frames, ffmpeg_path


class TestVideoWrapper:
    def test_missing_ffmpeg_raises_actionable_error(self, tmp_path, monkeypatch):
        if ffmpeg_path() is not None:
            pytest.skip("ffmpeg present; error path not reachable")
        with pytest.raises(FFmpegNotFound, match="images/<video>/"):
            extract_frames("nonexistent.mp4", str(tmp_path / "out"))

    @pytest.mark.skipif(ffmpeg_path() is None, reason="no ffmpeg binary")
    def test_extracts_frames(self, tmp_path):
        import numpy as np
        import subprocess
        from PIL import Image

        # make a tiny mjpeg video from generated frames, then extract
        src = tmp_path / "frames"
        src.mkdir()
        for i in range(5):
            Image.fromarray(
                np.full((16, 16, 3), i * 40, np.uint8)
            ).save(src / f"{i:03d}.jpg")
        video = str(tmp_path / "v.avi")
        subprocess.run(
            [ffmpeg_path(), "-y", "-framerate", "5", "-i",
             str(src / "%03d.jpg"), "-codec", "copy", video],
            check=True, capture_output=True,
        )
        n = extract_frames(video, str(tmp_path / "out"))
        assert n == 5
