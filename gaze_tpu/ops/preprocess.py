"""Fused on-device preprocessing: resize + normalize + grayscale + flow
input packing.

Replaces the reference's host-side OpenCV/PIL resize/normalize inside
DataLoader workers (ref:data/STdatas.py [M]) with device ops that XLA
fuses into the model's first convolutions (BASELINE.json: "frame decode,
resize/normalize ... as fused JAX/Pallas preprocessing kernels"). JPEG
*decode* stays on host (TPUs have no video/JPEG decoder) — see
``gaze_tpu.data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaze_tpu.core.config import ImageConfig

# ITU-R BT.601 luma weights (what OpenCV's cvtColor RGB->GRAY uses, i.e.
# what dense_flow feeds the TV-L1 solver).
_LUMA = (0.299, 0.587, 0.114)


def to_float(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1]."""
    return img_u8.astype(jnp.float32) * (1.0 / 255.0)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) float -> (..., H, W) luma, BT.601."""
    w = jnp.asarray(_LUMA, dtype=rgb.dtype)
    return jnp.tensordot(rgb, w, axes=[[-1], [0]])


def resize_frames(frames: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize (B, H, W, C) -> (B, height, width, C); no-op when
    already at target size (jax.image.resize still emits work otherwise)."""
    B, h, w, C = frames.shape
    if (h, w) == (height, width):
        return frames
    return jax.image.resize(frames, (B, height, width, C), method="bilinear")


def normalize_rgb(rgb: jnp.ndarray, cfg: ImageConfig) -> jnp.ndarray:
    """ImageNet normalization for the VGG16 spatial stream [M]."""
    mean = jnp.asarray(cfg.mean, dtype=rgb.dtype)
    std = jnp.asarray(cfg.std, dtype=rgb.dtype)
    return (rgb - mean) / std


def normalize_flow_image(flow_q: jnp.ndarray) -> jnp.ndarray:
    """Map a dequantized-or-float flow image scaled to [0,1] into the
    zero-centered range the temporal VGG stream consumes.

    The reference's exact temporal normalization is [U] (SURVEY.md §2
    "Flow input format"); we center at 0.5 — the encoding of zero motion
    in dense_flow's 8-bit format — and scale to roughly unit variance.
    """
    return (flow_q - 0.5) / 0.226


def prepare_spatial_input(frames_u8: jnp.ndarray, cfg: ImageConfig) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> normalized float32 (B, cfg.h, cfg.w, 3)."""
    x = to_float(frames_u8)
    x = resize_frames(x, cfg.height, cfg.width)
    return normalize_rgb(x, cfg)


def prepare_temporal_input(flow: jnp.ndarray, bound: float) -> jnp.ndarray:
    """Float flow (B, H, W, 2) in pixels -> normalized temporal-stream
    input, passing through the same 8-bit quantization the reference's
    flow JPEGs impose (so train/infer see identical statistics)."""
    q = jnp.clip(flow, -bound, bound) * (0.5 / bound) + 0.5  # [0, 1]
    return normalize_flow_image(q)
