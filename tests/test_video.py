"""Video-extraction wrapper tests (ffmpeg is a runtime dependency of the
deployment host, like the reference's offline preprocessing; this image
ships none, so the error path is what must be solid)."""

import pytest

from gaze_tpu.data.video import FFmpegNotFound, extract_frames, ffmpeg_path


class TestVideoWrapper:
    def test_missing_input_raises_filenotfound(self, tmp_path, monkeypatch):
        import gaze_tpu.data.video as video

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        with pytest.raises(FileNotFoundError):
            extract_frames("nonexistent.mp4", str(tmp_path / "out"))

    def test_undecodable_without_cv2_raises_actionable_error(
        self, tmp_path, monkeypatch
    ):
        """The cv2-less deployment host (the original build assumption):
        no binary + no cv2 + non-MJPEG input = the actionable error."""
        import gaze_tpu.data.video as video

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        monkeypatch.setattr(video, "_cv2", lambda: None)
        bad = tmp_path / "x.mp4"
        bad.write_bytes(b"\x00\x00\x00\x18ftypmp42 not a riff file")
        with pytest.raises(FFmpegNotFound, match="images/<video>/"):
            extract_frames(str(bad), str(tmp_path / "out"))

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


def _jpeg_bytes(value, size=16):
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((size, size, 3), value, np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


class TestMJPEGAVIFallback:
    """Pure-Python L0 ingestion: MJPEG AVI frames are complete JPEGs in
    RIFF chunks, so video->frames runs with no ffmpeg binary at all."""

    def test_writer_demuxer_roundtrip_bit_exact(self, tmp_path):
        from gaze_tpu.data.video import iter_mjpeg_avi_frames, write_mjpeg_avi

        frames = [_jpeg_bytes(v) for v in (0, 85, 170, 255, 40)]
        path = str(tmp_path / "v.avi")
        write_mjpeg_avi(path, frames, 16, 16)
        got = list(iter_mjpeg_avi_frames(path))
        assert got == frames  # stream copy: bit-exact JPEG payloads

    def test_extract_frames_falls_back_without_ffmpeg(
        self, tmp_path, monkeypatch
    ):
        import numpy as np
        from PIL import Image

        import gaze_tpu.data.video as video
        from gaze_tpu.data.video import write_mjpeg_avi

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        frames = [_jpeg_bytes(v) for v in (10, 200, 90)]
        avi = str(tmp_path / "clip.avi")
        write_mjpeg_avi(avi, frames, 16, 16)
        out = str(tmp_path / "out")
        n = video.extract_frames(avi, out)
        assert n == 3
        # ffmpeg-compatible 1-based naming; payloads decode to the pixels
        img = np.asarray(Image.open(f"{out}/000002.jpg"))
        assert img.shape == (16, 16, 3)
        assert abs(int(img.mean()) - 200) <= 3  # JPEG-lossy tolerance

    def test_garbage_mp4_raises_actionable_error(self, tmp_path, monkeypatch):
        """Not MJPEG-AVI AND not decodable by cv2/avcodec: the chained
        fallbacks end in the actionable FFmpegNotFound."""
        import gaze_tpu.data.video as video

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        bad = tmp_path / "x.mp4"
        bad.write_bytes(b"\x00\x00\x00\x18ftypmp42 not a riff file")
        with pytest.raises(FFmpegNotFound, match="images/<video>/"):
            video.extract_frames(str(bad), str(tmp_path / "o"))

    def test_non_mjpeg_avi_rejected(self, tmp_path):
        import struct

        from gaze_tpu.data.video import NotMJPEGAVI, iter_mjpeg_avi_frames

        # hand-build an AVI whose 00dc chunk is NOT JPEG (raw codec)
        payload = b"\x00\x01\x02\x03"
        chunk = b"00dc" + struct.pack("<I", len(payload)) + payload
        movi = b"LIST" + struct.pack("<I", 4 + len(chunk)) + b"movi" + chunk
        body = b"AVI " + movi
        p = tmp_path / "raw.avi"
        p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
        with pytest.raises(NotMJPEGAVI, match="not JPEG"):
            list(iter_mjpeg_avi_frames(str(p)))

    def test_extract_dataset_covers_mp4(self, tmp_path, monkeypatch):
        """extract_dataset over a mixed videos/ dir: MJPEG AVI via the
        stream-copy demuxer AND an MP4 via cv2, one call, no ffmpeg."""
        cv2 = pytest.importorskip("cv2")
        import numpy as np

        import gaze_tpu.data.video as video
        from gaze_tpu.data.video import write_mjpeg_avi

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        vids = tmp_path / "videos"
        vids.mkdir()
        write_mjpeg_avi(
            str(vids / "S1_Coffee_C1.avi"), [_jpeg_bytes(60)] * 4, 16, 16
        )
        w = cv2.VideoWriter(
            str(vids / "S2_Tea_C1.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (32, 32),
        )
        assert w.isOpened()
        for _ in range(3):
            w.write(np.full((32, 32, 3), 120, np.uint8))
        w.release()
        res = video.extract_dataset(str(vids), str(tmp_path / "images"))
        assert res == {"S1_Coffee_C1": 4, "S2_Tea_C1": 3}

    def test_extract_dataset_covers_avi(self, tmp_path, monkeypatch):
        """L0 end to end offline: videos/ -> images/<stem>/ layout that
        build_manifest consumes (SURVEY.md §1 L0 -> L1 boundary)."""
        import gaze_tpu.data.video as video
        from gaze_tpu.data.video import write_mjpeg_avi

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        vids = tmp_path / "videos"
        vids.mkdir()
        write_mjpeg_avi(
            str(vids / "S1_Coffee_C1.avi"), [_jpeg_bytes(60)] * 4, 16, 16
        )
        res = video.extract_dataset(str(vids), str(tmp_path / "images"))
        assert res == {"S1_Coffee_C1": 4}
        import os

        assert sorted(os.listdir(tmp_path / "images" / "S1_Coffee_C1")) == [
            "%06d.jpg" % i for i in range(1, 5)
        ]


class TestCV2Ingestion:
    """cv2/avcodec ingestion (L0 without the ffmpeg binary): MP4 and
    non-MJPEG AVI decode, fps dup/drop resampling, lossy fidelity."""

    @staticmethod
    def _write_video(path, fourcc, means, size=(32, 32), fps=30.0):
        cv2 = pytest.importorskip("cv2")
        import numpy as np

        w = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*fourcc), fps, size
        )
        assert w.isOpened(), f"VideoWriter({fourcc}) failed to open"
        for m in means:
            w.write(np.full((size[1], size[0], 3), m, np.uint8))
        w.release()

    def test_mp4_ingestion_without_ffmpeg(self, tmp_path, monkeypatch):
        import numpy as np
        from PIL import Image

        import gaze_tpu.data.video as video

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        means = [20, 80, 140, 200, 240]
        mp4 = tmp_path / "clip.mp4"
        self._write_video(mp4, "mp4v", means)
        out = tmp_path / "out"
        n = video.extract_frames(str(mp4), str(out))
        assert n == 5
        import os

        assert sorted(os.listdir(out)) == [
            "%06d.jpg" % i for i in range(1, 6)
        ]
        # constant frames survive the lossy mp4v->jpg round trip; order
        # must be preserved (1-based ffmpeg-compatible numbering)
        for i, m in enumerate(means):
            img = np.asarray(Image.open(out / ("%06d.jpg" % (i + 1))))
            assert abs(float(img.mean()) - m) <= 6, f"frame {i + 1}"

    def test_non_mjpeg_avi_falls_through_to_cv2(self, tmp_path, monkeypatch):
        """An XVID AVI is RIFF/AVI but not MJPEG: the stream-copy demuxer
        raises NotMJPEGAVI and extract_frames must continue into cv2
        instead of failing (the pre-cv2 behavior)."""
        import gaze_tpu.data.video as video

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        avi = tmp_path / "clip.avi"
        self._write_video(avi, "XVID", [50, 150, 250])
        assert video.extract_frames(str(avi), str(tmp_path / "out")) == 3

    def test_fps_resampling_drop_and_dup(self, tmp_path, monkeypatch):
        import gaze_tpu.data.video as video

        monkeypatch.setattr(video, "ffmpeg_path", lambda: None)
        mp4 = tmp_path / "clip.mp4"
        # 12 frames at 30 fps = 0.4 s of video
        self._write_video(mp4, "mp4v", list(range(10, 130, 10)), fps=30.0)
        # downsample to 10 fps: ticks at t=0,.1,.2,.3 -> source frames
        # 0,3,6,9 -> 4 outputs (ffmpeg fps-filter drop semantics)
        n = video.extract_frames(str(mp4), str(tmp_path / "d"), fps=10.0)
        assert n == 4
        # upsample to 60 fps: every source frame emitted twice
        n = video.extract_frames(str(mp4), str(tmp_path / "u"), fps=60.0)
        assert n == 24

    def test_cv2_absent_raises_decode_error(self, tmp_path, monkeypatch):
        import gaze_tpu.data.video as video
        from gaze_tpu.data.video import VideoDecodeError

        monkeypatch.setattr(video, "_cv2", lambda: None)
        with pytest.raises(VideoDecodeError, match="not installed"):
            video.extract_frames_cv2("x.mp4", str(tmp_path / "o"))
