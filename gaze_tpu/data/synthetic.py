"""Synthetic moving-dot gaze dataset.

The reference ships no tests and assumes GTEA Gaze+ on disk (SURVEY.md
§4); this environment is offline, so the framework carries a procedural
dataset with *known* gaze ground truth: a bright Gaussian blob moves over
a textured background in fixation/saccade alternation — the blob center
is the gaze point, and frames where the blob holds still are fixations.
Used by the unit/e2e tests and the benchmark's data generator.

Pure numpy on host (deterministic via a seeded Generator); tensors are
uint8 HWC frames exactly like decoded video frames, so the on-device
preprocessing path is exercised end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticSpec:
    num_frames: int = 64
    height: int = 224
    width: int = 224
    blob_sigma: float = 8.0
    # Frames per fixation segment / per saccade transition.
    fixation_len: int = 8
    saccade_len: int = 2
    background_scale: float = 0.25
    seed: int = 0


def generate_sequence(spec: SyntheticSpec) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate one video sequence.

    Returns:
      frames: (T, H, W, 3) uint8.
      gaze:   (T, 2) float32 (x, y) pixel coords of the blob center.
      fixsac: (T,) float32 — 1.0 on fixation frames, 0.0 during saccades
              (the reference's per-frame fixation labels, SURVEY.md §2
              "Fixation labels" [M]).
    """
    rng = np.random.default_rng(spec.seed)
    T, H, W = spec.num_frames, spec.height, spec.width

    # Static textured background so optical flow has signal.
    bg = rng.uniform(0.0, spec.background_scale, size=(H, W, 3)).astype(np.float32)

    gaze = np.zeros((T, 2), np.float32)
    fixsac = np.zeros((T,), np.float32)

    # Keep the blob inside the frame; clamp for small test frames.
    margin = min(4 * spec.blob_sigma, min(H, W) / 4.0)
    cur = rng.uniform([margin, margin], [W - margin, H - margin])
    t = 0
    while t < T:
        # Fixation: hold position (with sub-pixel jitter).
        for _ in range(spec.fixation_len):
            if t >= T:
                break
            jitter = rng.normal(0.0, 0.3, size=2)
            gaze[t] = cur + jitter
            fixsac[t] = 1.0
            t += 1
        # Saccade: jump toward a new target over a few frames.
        nxt = rng.uniform([margin, margin], [W - margin, H - margin])
        for k in range(spec.saccade_len):
            if t >= T:
                break
            a = (k + 1) / (spec.saccade_len + 1)
            gaze[t] = (1 - a) * cur + a * nxt
            fixsac[t] = 0.0
            t += 1
        cur = nxt

    ys = np.arange(H, dtype=np.float32)[:, None]
    xs = np.arange(W, dtype=np.float32)[None, :]
    frames = np.zeros((T, H, W, 3), np.uint8)
    for i in range(T):
        d2 = (xs - gaze[i, 0]) ** 2 + (ys - gaze[i, 1]) ** 2
        blob = np.exp(-d2 / (2 * spec.blob_sigma**2)).astype(np.float32)
        img = np.clip(bg + blob[..., None], 0.0, 1.0)
        frames[i] = (img * 255.0).astype(np.uint8)
    return frames, gaze, fixsac


def clip_iterator(
    spec: SyntheticSpec,
    batch_size: int,
    clip_len: int,
    num_batches: int,
    seed: int = 0,
) -> Iterator[dict]:
    """Yield contiguous-clip batches for rollout-mode LF training:
    frames (B, clip_len+1, H, W, 3) — index 0 seeds the flow pair —
    with per-frame gaze/fixsac/valid aligned to frames[1:]'s labels."""
    frames, gaze, fixsac = generate_sequence(dataclasses.replace(spec, seed=seed))
    T = frames.shape[0]
    if T < clip_len + 1:
        raise ValueError(f"need >= {clip_len + 1} frames, have {T}")
    rng = np.random.default_rng(seed + 1)
    for _ in range(num_batches):
        starts = rng.integers(0, T - clip_len, size=batch_size)
        idx = starts[:, None] + np.arange(clip_len + 1)[None, :]
        yield {
            "frames": frames[idx],
            "gaze": gaze[idx],
            "fixsac": fixsac[idx],
            "valid": np.ones((batch_size, clip_len + 1), np.float32),
        }


def batch_iterator(
    spec: SyntheticSpec, batch_size: int, num_batches: int, seed: int = 0
) -> Iterator[dict]:
    """Yield SP-style training batches of (rgb_pair, gaze, fixsac).

    Each element pairs consecutive frames (for on-device TV-L1) with the
    current frame's gaze point. Mirrors the reference's STdatas pairing
    of (RGB, flow, GT-heatmap) [M], with the flow computed on device.
    """
    frames, gaze, fixsac = generate_sequence(
        dataclasses.replace(spec, seed=seed)
    )
    T = frames.shape[0]
    rng = np.random.default_rng(seed + 1)
    for _ in range(num_batches):
        idx = rng.integers(1, T, size=batch_size)
        yield {
            "prev": frames[idx - 1],
            "cur": frames[idx],
            "gaze": gaze[idx],
            "fixsac": fixsac[idx],
            # Synthetic gaze is always tracked; key kept so jit signatures
            # match the GTEA loader's (which masks untracked frames).
            "valid": np.ones((batch_size,), np.float32),
        }
