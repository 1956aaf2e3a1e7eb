"""Gaussian ground-truth heatmap rendering + heatmap post-processing.

The reference renders a Gaussian at the GT gaze point on the host inside
``DataLoader`` workers (ref:data/STdatas.py [M]); here it is a vectorized
device op so the whole batch renders in one fused kernel, and the argmax
decode (heatmap -> gaze point, ref:utils.py [M]) is a device reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_gaussian(
    points: jnp.ndarray, height: int, width: int, sigma: float
) -> jnp.ndarray:
    """Render unit-peak Gaussian heatmaps at the given pixel coordinates.

    Args:
      points: (B, 2) gaze points as (x, y) in pixel units of the target
        grid. Out-of-frame points still render (clipped tails), matching
        the reference's paste-a-template behavior.
      height, width: output grid size.
      sigma: Gaussian sigma in pixels.

    Returns:
      (B, height, width) float32 heatmaps with max value 1 at the point.
    """
    B = points.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (B, height, width), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (B, height, width), 2)
    px = points[:, 0].reshape(B, 1, 1)
    py = points[:, 1].reshape(B, 1, 1)
    d2 = (xs - px) ** 2 + (ys - py) ** 2
    return jnp.exp(-d2 / (2.0 * sigma * sigma))


def heatmap_argmax(hm: jnp.ndarray) -> jnp.ndarray:
    """Decode a (B, H, W) heatmap batch to (B, 2) (x, y) pixel coords of
    the maximum — the reference's gaze-point decode (ref:utils.py [M])."""
    B, H, W = hm.shape
    idx = jnp.argmax(hm.reshape(B, H * W), axis=1)
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    return jnp.stack([x, y], axis=1)


def normalize_map(hm: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Min-max normalize each heatmap to [0, 1] (used on AT attention maps
    before fusion, ref:AT.py map generation [M])."""
    mn = jnp.min(hm, axis=(1, 2), keepdims=True)
    mx = jnp.max(hm, axis=(1, 2), keepdims=True)
    return (hm - mn) / (mx - mn + eps)
