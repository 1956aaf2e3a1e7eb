"""ctypes binding for the native batch JPEG decoder (native/gaze_io.cpp).

Replaces the reference's per-worker PIL/OpenCV decode (SURVEY.md §2
native inventory) with one multi-threaded C++ call per batch. Builds the
shared library on demand with the repo Makefile if it is missing (g++ is
part of this environment); falls back to PIL transparently when the
toolchain or libjpeg is unavailable, so the pure-Python path always
works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgaze_io.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            # Rebuild when missing OR stale: the library is built with
            # -march=native and is .gitignored, so a stale binary (edited
            # source, different CPU) must never silently shadow the source.
            src_dir = os.path.abspath(_NATIVE_DIR)
            deps = [os.path.join(src_dir, f) for f in ("gaze_io.cpp", "Makefile")]
            stale = not os.path.exists(_LIB_PATH) or any(
                os.path.exists(d) and os.path.getmtime(d) > os.path.getmtime(_LIB_PATH)
                for d in deps
            )
            if stale:
                subprocess.run(
                    ["make", "-s", "-B"],
                    cwd=src_dir,
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gaze_decode_batch.restype = ctypes.c_int
            lib.gaze_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.gaze_jpeg_dims.restype = ctypes.c_int
            lib.gaze_jpeg_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def jpeg_dims(path: str) -> Optional[Tuple[int, int]]:
    """(width, height) of a JPEG, or None if unreadable / lib missing."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.gaze_jpeg_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_batch(
    paths: Sequence[str],
    target_hw: Optional[Tuple[int, int]] = None,
    threads: Optional[int] = None,
) -> np.ndarray:
    """Decode JPEGs into a uint8 (N, H, W, 3) array.

    With target_hw=None, all frames are decoded at the first file's
    native size (the GTEA per-video layout guarantees uniform frames).
    Uses the native threaded decoder when available, PIL otherwise.
    """
    if len(paths) == 0:
        raise ValueError("empty path list")
    lib = _load()
    # The native decoder is libjpeg-only; route non-JPEG batches (e.g.
    # --extract_flow's lossless .png flow images) through PIL. GTEA
    # batches are homogeneous per call, so checking the first suffices.
    if lib is not None and not paths[0].lower().endswith(".jpg") \
            and not paths[0].lower().endswith(".jpeg"):
        with open(paths[0], "rb") as f:
            if f.read(2) != b"\xff\xd8":  # not a JPEG stream either
                lib = None
    if lib is not None:
        if target_hw is None:
            dims = jpeg_dims(paths[0])
            if dims is None:
                raise IOError(f"cannot read {paths[0]}")
            target_hw = (dims[1], dims[0])
        th, tw = target_hw
        out = np.empty((len(paths), th, tw, 3), np.uint8)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        nthreads = threads or min(8, os.cpu_count() or 1)
        failures = lib.gaze_decode_batch(
            arr,
            len(paths),
            th,
            tw,
            nthreads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if failures:
            raise IOError(f"{failures}/{len(paths)} JPEGs failed to decode")
        return out

    # PIL fallback.
    from PIL import Image

    frames = []
    for p in paths:
        with Image.open(p) as im:
            im = im.convert("RGB")
            if target_hw is not None:
                im = im.resize((target_hw[1], target_hw[0]), Image.BILINEAR)
            frames.append(np.asarray(im, np.uint8))
    return np.stack(frames)
