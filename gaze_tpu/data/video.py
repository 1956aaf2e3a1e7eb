"""Video → frame extraction (the reference's ffmpeg preprocessing, L0).

The reference's README has users run ffmpeg offline to turn GTEA videos
into ``images/<video>/*.jpg`` (SURVEY.md §2 L0 native preprocessing).
TPUs have no video decoder, so this stays a host-side step by design
(BASELINE.json: "decode itself stays on host"); this module wraps it so
the framework covers the whole reference workflow from raw video.

Two ingestion paths:

- ``ffmpeg`` on PATH (any codec — the reference's own requirement);
- a pure-Python MJPEG-AVI demuxer (``extract_frames_mjpeg_avi``): MJPEG
  AVI stores each frame as a complete JPEG inside RIFF ``00dc`` chunks,
  so "decoding" is container parsing — the JPEG payloads go straight to
  disk in the ``images/<video>/`` layout and the existing libjpeg/PIL
  decoders take it from there. This keeps L0 executable on hosts (like
  this build image) that ship no ffmpeg binary.

``extract_frames`` prefers ffmpeg and falls back to the MJPEG path when
the binary is absent and the input is an MJPEG AVI.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
from typing import Iterator, List, Optional, Tuple


class FFmpegNotFound(RuntimeError):
    pass


class NotMJPEGAVI(RuntimeError):
    pass


def _iter_riff_chunks(data: bytes, start: int, end: int) -> Iterator[
    Tuple[bytes, int, int]
]:
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    range; descends into LIST chunks (their payload begins with a list
    type fourcc). Chunks are padded to even sizes per the RIFF spec."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = pos + 8
        if fourcc in (b"RIFF", b"LIST"):
            # skip the 4-byte form/list type, then recurse
            yield from _iter_riff_chunks(
                data, payload + 4, min(payload + size, end)
            )
        else:
            yield fourcc, payload, size
        pos = payload + size + (size & 1)


def iter_mjpeg_avi_frames(path: str) -> Iterator[bytes]:
    """Yield each video frame of an MJPEG AVI as raw JPEG bytes.

    Pure-Python RIFF walk: video frames live in ``NNdc``/``NNdb`` chunks
    whose payload is a complete JFIF stream (SOI ``FF D8`` magic
    checked). Raises NotMJPEGAVI for non-AVI input or AVIs whose frame
    chunks are not JPEG (e.g. raw/other codecs).
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotMJPEGAVI(f"{path}: not a RIFF/AVI file")
    found = False
    for fourcc, start, size in _iter_riff_chunks(data, 0, len(data)):
        if len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db") and size > 0:
            payload = data[start : start + size]
            if payload[:2] != b"\xff\xd8":
                raise NotMJPEGAVI(
                    f"{path}: video chunk is not JPEG (codec is not MJPEG)"
                )
            found = True
            yield payload
    if not found:
        raise NotMJPEGAVI(f"{path}: no video frame chunks found")


def extract_frames_mjpeg_avi(
    video_path: str, out_dir: str, pattern: str = "%06d.jpg"
) -> int:
    """Demux an MJPEG AVI into ``out_dir/pattern`` JPEG frames (1-based,
    matching ffmpeg's numbering). Returns the frame count."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, jpeg in enumerate(iter_mjpeg_avi_frames(video_path)):
        with open(os.path.join(out_dir, pattern % (i + 1)), "wb") as f:
            f.write(jpeg)
        n += 1
    return n


def write_mjpeg_avi(
    path: str, jpeg_frames: List[bytes], width: int, height: int,
    fps: int = 30,
) -> None:
    """Write JPEG byte strings as a minimal spec-conforming MJPEG AVI
    (RIFF(AVI ){LIST(hdrl){avih, LIST(strl){strh,strf}}, LIST(movi)
    {00dc...}, idx1}). Useful for packaging frame dumps as video and as
    the offline test fixture for the demuxer."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    n = len(jpeg_frames)
    usec_per_frame = int(1_000_000 / max(fps, 1))
    max_bytes = max((len(j) for j in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I", usec_per_frame, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: flags, priority, language, initialFrames, scale,
    # rate, start, length, bufSize, quality, sampleSize, rcFrame (56 B).
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, n, max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpeg_frames)
    movi = lst(b"movi", movi_payload)
    # idx1: offsets are relative to the start of the movi list payload
    idx, off = b"", 4
    for j in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


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
        # Pure-Python fallback: MJPEG AVI demux (native frame rate only —
        # exactly what the reference pipeline uses so gaze txt rows align
        # 1:1; frames are stream-copied, so `quality` doesn't apply).
        if fps is None:
            try:
                return extract_frames_mjpeg_avi(video_path, out_dir, pattern)
            except (NotMJPEGAVI, OSError) as e:
                raise FFmpegNotFound(
                    "ffmpeg not found on PATH and the pure-Python fallback "
                    f"only demuxes MJPEG AVI ({e}) — install ffmpeg (the "
                    "reference pipeline has the same offline dependency) or "
                    "pre-extract frames into the images/<video>/ layout."
                ) from e
        raise FFmpegNotFound(
            "ffmpeg not found on PATH — install it (the reference pipeline "
            "has the same offline dependency) or pre-extract frames into "
            "the images/<video>/ layout (fps resampling requires ffmpeg; "
            "the MJPEG-AVI fallback is native-rate only)."
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
