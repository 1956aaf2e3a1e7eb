"""Bilinear sampling / backward warping.

TPU-native replacement for the warping inside OpenCV/dense_flow's TV-L1
(``ref`` external dep ``yjxiong/dense_flow``, C++/CUDA — SURVEY.md §2
native inventory). Implemented as 4 flat gathers; shapes are fully static
so XLA can tile it. Used by the TV-L1 solver and by tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at continuous coordinates with border clamping.

    Args:
      img: (B, H, W) float image batch.
      x, y: (B, H, W) absolute sample coordinates (x along W, y along H).

    Returns:
      (B, H, W) sampled values.
    """
    B, H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # Clamp the integer corners so x0+1 stays in range.
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    fx = x - x0i.astype(img.dtype)
    fy = y - y0i.astype(img.dtype)

    flat = img.reshape(B, H * W)
    base = y0i * W + x0i  # (B, H, W) int32

    def gather(offset):
        idx = (base + offset).reshape(B, H * W)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(B, H, W)

    v00 = gather(0)
    v01 = gather(1)
    v10 = gather(W)
    v11 = gather(W + 1)

    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def warp_backward(img: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``img`` by flow (u1, u2): out(p) = img(p + u(p)).

    Args:
      img: (B, H, W).
      u1: (B, H, W) x-displacement.
      u2: (B, H, W) y-displacement.
    """
    B, H, W = img.shape
    dtype = img.dtype
    gy = jax.lax.broadcasted_iota(dtype, (B, H, W), 1)
    gx = jax.lax.broadcasted_iota(dtype, (B, H, W), 2)
    return bilinear_sample(img, gx + u1, gy + u2)
