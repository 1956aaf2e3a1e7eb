"""Video → frame extraction (the reference's ffmpeg preprocessing, L0).

The reference's README has users run ffmpeg offline to turn GTEA videos
into ``images/<video>/*.jpg`` (SURVEY.md §2 L0 native preprocessing).
TPUs have no video decoder, so this stays a host-side step by design
(BASELINE.json: "decode itself stays on host"); this module wraps it so
the framework covers the whole reference workflow from raw video.

This build environment ships no ffmpeg/pyav/imageio-ffmpeg binary; the
wrapper discovers ``ffmpeg`` on PATH at runtime and fails with an
actionable error otherwise. Deployment hosts are expected to provide it
(identical to the reference's requirement).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional


class FFmpegNotFound(RuntimeError):
    pass


def ffmpeg_path() -> Optional[str]:
    return shutil.which("ffmpeg")


def extract_frames(
    video_path: str,
    out_dir: str,
    fps: Optional[float] = None,
    quality: int = 2,
    pattern: str = "%06d.jpg",
) -> int:
    """Extract JPEG frames from a video with ffmpeg.

    Args:
      video_path: input video file.
      out_dir: output directory (created); frames land as pattern.
      fps: optional resampling rate (None = native frame rate, which is
        what the reference pipeline uses so gaze txt rows align 1:1).
      quality: JPEG qscale (2 = high quality, ffmpeg's -q:v).

    Returns:
      number of frames written.

    Raises:
      FFmpegNotFound: if no ffmpeg binary is on PATH.
    """
    exe = ffmpeg_path()
    if exe is None:
        raise FFmpegNotFound(
            "ffmpeg not found on PATH — install it (the reference pipeline "
            "has the same offline dependency) or pre-extract frames into "
            "the images/<video>/ layout."
        )
    os.makedirs(out_dir, exist_ok=True)
    cmd = [exe, "-y", "-i", video_path, "-q:v", str(quality)]
    if fps is not None:
        cmd += ["-vf", f"fps={fps}"]
    cmd += [os.path.join(out_dir, pattern)]
    subprocess.run(cmd, check=True, capture_output=True)
    return len([f for f in os.listdir(out_dir) if f.endswith(".jpg")])


def extract_dataset(videos_dir: str, images_root: str, **kwargs) -> dict:
    """Extract every video under ``videos_dir`` into the GTEA layout
    ``images_root/<video_stem>/``. Returns {video_stem: frame_count}."""
    results = {}
    for name in sorted(os.listdir(videos_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".mp4", ".avi", ".mov", ".mkv", ".mpg"):
            continue
        results[stem] = extract_frames(
            os.path.join(videos_dir, name), os.path.join(images_root, stem), **kwargs
        )
    return results
