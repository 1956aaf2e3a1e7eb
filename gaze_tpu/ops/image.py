"""Image utilities: separable Gaussian blur, pyramid scaling, gradients,
median filtering — the primitives under the TV-L1 solver and the fused
preprocessing path (replaces the OpenCV/PIL native layer of the reference,
SURVEY.md §2 native inventory)."""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Odd-length 1-D Gaussian kernel (static shape)."""
    if radius is None:
        radius = max(1, int(math.ceil(2.5 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a (B, H, W) batch, edge-padded."""
    k = gaussian_kernel1d(sigma).astype(img.dtype)
    r = (k.shape[0] - 1) // 2

    # Horizontal then vertical 1-D convolution via conv_general_dilated.
    def conv1d(x, axis):
        if axis == 2:  # along W
            kern = k.reshape(1, 1, 1, k.shape[0])
            pad = [(0, 0), (r, r)]
        else:  # along H
            kern = k.reshape(1, 1, k.shape[0], 1)
            pad = [(r, r), (0, 0)]
        x4 = x[:, None, :, :]  # NCHW
        xp = jnp.pad(x4, ((0, 0), (0, 0), tuple(pad[0]), tuple(pad[1])), mode="edge")
        out = jax.lax.conv_general_dilated(
            xp, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out[:, 0, :, :]

    return conv1d(conv1d(img, 2), 1)


def resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (B, H, W) to (B, *shape)."""
    B = img.shape[0]
    return jax.image.resize(img, (B, shape[0], shape[1]), method="bilinear")


def pyramid_downscale(img: jnp.ndarray, shape: Tuple[int, int], sigma: float = 0.8) -> jnp.ndarray:
    """Anti-aliased downscale: Gaussian presmooth then bilinear resize
    (IPOL TV-L1 pyramid construction)."""
    return resize_bilinear(gaussian_blur(img, sigma), shape)


def central_gradient(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients of (B, H, W) with one-sided borders."""
    gx = jnp.concatenate(
        [
            (img[:, :, 1:2] - img[:, :, 0:1]),
            0.5 * (img[:, :, 2:] - img[:, :, :-2]),
            (img[:, :, -1:] - img[:, :, -2:-1]),
        ],
        axis=2,
    )
    gy = jnp.concatenate(
        [
            (img[:, 1:2, :] - img[:, 0:1, :]),
            0.5 * (img[:, 2:, :] - img[:, :-2, :]),
            (img[:, -1:, :] - img[:, -2:-1, :]),
        ],
        axis=1,
    )
    return gx, gy


def forward_gradient(u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward differences with zero Neumann boundary (last row/col 0)."""
    gx = jnp.concatenate([u[:, :, 1:] - u[:, :, :-1], jnp.zeros_like(u[:, :, :1])], axis=2)
    gy = jnp.concatenate([u[:, 1:, :] - u[:, :-1, :], jnp.zeros_like(u[:, :1, :])], axis=1)
    return gx, gy


def divergence(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence, adjoint of ``forward_gradient``."""
    d1 = jnp.concatenate([p1[:, :, :1], p1[:, :, 1:-1] - p1[:, :, :-2], -p1[:, :, -2:-1]], axis=2)
    d2 = jnp.concatenate([p2[:, :1, :], p2[:, 1:-1, :] - p2[:, :-2, :], -p2[:, -2:-1, :]], axis=1)
    return d1 + d2


def median3x3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter of (B, H, W), edge-padded.

    Implemented as a sort over the 9 shifted copies — no data-dependent
    shapes, VPU-friendly. Used between TV-L1 warps (OpenCV's
    ``medianBlurring`` flag) to reject flow outliers.
    """
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="edge")
    H, W = img.shape[1], img.shape[2]
    v = [p[:, dy : dy + H, dx : dx + W] for dy in range(3) for dx in range(3)]

    # Median-of-9 via the classic 19-comparator sorting network (Smith
    # 1996) — pure min/max VPU ops, ~4x cheaper than jnp.median's sort.
    def mn(a, b):
        return jnp.minimum(a, b)

    def mx(a, b):
        return jnp.maximum(a, b)

    def srt(i, j):
        v[i], v[j] = mn(v[i], v[j]), mx(v[i], v[j])

    for i, j in [
        (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
        (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
        (4, 2), (6, 4), (4, 2),
    ]:
        srt(i, j)
    return v[4]
