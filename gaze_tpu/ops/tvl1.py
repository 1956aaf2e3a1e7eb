"""Pyramidal dual TV-L1 optical flow, TPU-native.

Replaces the reference's offline native preprocessing dependency
``yjxiong/dense_flow`` (C++/OpenCV/CUDA TV-L1 -> quantized flow JPEGs;
SURVEY.md §2 native inventory [M], BASELINE.json: "TV-L1 optical-flow
estimation run as fused JAX/Pallas preprocessing kernels").

Algorithm: Zach, Pock, Bischof 2007 as specified in Sanchez et al.,
IPOL 2013 ("TV-L1 Optical Flow Estimation") — the same algorithm behind
OpenCV's ``DualTVL1OpticalFlow`` that dense_flow wraps. Differences made
deliberately for XLA:

- Fixed iteration/warp/level counts (static trip counts; no convergence
  epsilon) so the whole solver jit-compiles to one fused program.
- Batched over (B, H, W): many frame pairs solve concurrently, keeping
  the VPU/MXU busy — dense_flow processes pairs serially per GPU thread.
- The per-warp primal-dual sweep runs under ``lax.scan``.

Everything here is pure elementwise/gather math; XLA fuses the primal and
dual updates into a handful of kernels. A Pallas fused variant of the
inner sweep lives in ``gaze_tpu.ops.pallas`` for the benchmark path.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from gaze_tpu.core.config import TVL1Config
from gaze_tpu.ops.image import (
    central_gradient,
    divergence,
    forward_gradient,
    median3x3,
    pyramid_downscale,
    resize_bilinear,
)
from gaze_tpu.ops.warp import warp_backward

_EPS_GRAD = 1e-9


def _median(u: jnp.ndarray, cfg: TVL1Config) -> jnp.ndarray:
    """Inter-warp flow median: one 3x3 pass (IPOL), or two chained 3x3
    passes approximating OpenCV's medianBlur(5) for the dense_flow-
    matched preset (core.config.dense_flow_tvl1_config)."""
    u = median3x3(u)
    if cfg.median_kernel >= 5:
        u = median3x3(u)
    return u


def _pyramid_shapes(h: int, w: int, levels: int, factor: float) -> List[Tuple[int, int]]:
    """Static pyramid geometry, finest first. Stops early if a level would
    drop below 16 px on a side (static decision — shapes are Python ints)."""
    shapes = [(h, w)]
    for _ in range(1, levels):
        nh, nw = int(round(shapes[-1][0] * factor)), int(round(shapes[-1][1] * factor))
        if nh < 16 or nw < 16:
            break
        shapes.append((nh, nw))
    return shapes


def _warp3(i1, i1x, i1y, u1, u2, cfg: TVL1Config):
    """Warp the image + its two gradients by (u1, u2) with shared weights.

    On TPU this is the block-anchored Pallas kernel (ops/pallas/warp.py)
    — the gather-based fallback costs ~2 ms/frame on TPU (scatter/gather
    unit), ~40x the whole two-stream SP forward. Elsewhere (CPU tests)
    the plain gather path is used. Displacements beyond the kernel's
    +-16 px clamp saturate the reference's 8-bit flow quantization
    anyway (quant_bound), so the clamp is behavior-neutral downstream.
    """
    if cfg.use_pallas_warp and jax.default_backend() == "tpu":
        from gaze_tpu.ops.pallas.warp import warp_fields

        return warp_fields((i1, i1x, i1y), u1, u2)
    return (
        warp_backward(i1, u1, u2),
        warp_backward(i1x, u1, u2),
        warp_backward(i1y, u1, u2),
    )


def _solve_level(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    cfg: TVL1Config,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``cfg.warps`` warps x ``cfg.iters`` primal-dual iterations at one
    pyramid level. All shapes (B, H, W) static."""
    lt = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta

    i1x, i1y = central_gradient(i1)

    p11 = jnp.zeros_like(u1)
    p12 = jnp.zeros_like(u1)
    p21 = jnp.zeros_like(u1)
    p22 = jnp.zeros_like(u1)

    for _ in range(cfg.warps):
        # Warp I1 and its gradients by the current flow estimate. The flow
        # is frozen during the inner iterations (standard warping scheme).
        i1w, i1wx, i1wy = _warp3(i1, i1x, i1y, u1, u2, cfg)
        grad = i1wx * i1wx + i1wy * i1wy
        # Constant part of the linearized residual rho(u).
        rho_c = i1w - i1wx * u1 - i1wy * u2 - i0

        if cfg.use_pallas_pd and jax.default_backend() == "tpu":
            # VMEM-resident fused inner loop (ops/pallas/tvl1_pd.py): the
            # scan below round-trips a 6-array carry through HBM per
            # iteration; the kernel keeps all 10 arrays on-chip.
            from gaze_tpu.ops.pallas.tvl1_pd import pd_iterations

            u1, u2, p11, p12, p21, p22 = pd_iterations(
                u1, u2, p11, p12, p21, p22, i1wx, i1wy, grad, rho_c,
                iters=cfg.iters, tau=cfg.tau, lambda_=cfg.lambda_,
                theta=cfg.theta,
            )
            if cfg.median_filter:
                u1 = _median(u1, cfg)
                u2 = _median(u2, cfg)
            continue

        def body(carry, _):
            u1, u2, p11, p12, p21, p22 = carry
            # --- thresholding step (exact minimizer of the data term) ---
            rho = rho_c + i1wx * u1 + i1wy * u2
            mask_neg = rho < -lt * grad
            mask_pos = rho > lt * grad
            d1 = jnp.where(
                mask_neg, lt * i1wx,
                jnp.where(mask_pos, -lt * i1wx, -rho * i1wx / (grad + _EPS_GRAD)),
            )
            d2 = jnp.where(
                mask_neg, lt * i1wy,
                jnp.where(mask_pos, -lt * i1wy, -rho * i1wy / (grad + _EPS_GRAD)),
            )
            v1 = u1 + d1
            v2 = u2 + d2
            # --- primal update from the dual field ---
            u1n = v1 + cfg.theta * divergence(p11, p12)
            u2n = v2 + cfg.theta * divergence(p21, p22)
            # --- dual ascent + reprojection onto |p| <= 1 ---
            g1x, g1y = forward_gradient(u1n)
            g2x, g2y = forward_gradient(u2n)
            ng1 = 1.0 + taut * jnp.sqrt(g1x * g1x + g1y * g1y)
            ng2 = 1.0 + taut * jnp.sqrt(g2x * g2x + g2y * g2y)
            p11 = (p11 + taut * g1x) / ng1
            p12 = (p12 + taut * g1y) / ng1
            p21 = (p21 + taut * g2x) / ng2
            p22 = (p22 + taut * g2y) / ng2
            return (u1n, u2n, p11, p12, p21, p22), None

        (u1, u2, p11, p12, p21, p22), _ = jax.lax.scan(
            body,
            (u1, u2, p11, p12, p21, p22),
            None,
            length=cfg.iters,
            # Unrolling lets XLA fuse across iterations and cuts the
            # per-iteration dispatch overhead (250 scan steps/frame pair).
            unroll=min(cfg.iters, 5),
        )
        if cfg.median_filter:
            u1 = _median(u1, cfg)
            u2 = _median(u2, cfg)

    return u1, u2


def tvl1_flow(
    i0: jnp.ndarray, i1: jnp.ndarray, cfg: TVL1Config | None = None
) -> jnp.ndarray:
    """Dense TV-L1 optical flow from frame i0 to i1.

    Args:
      i0, i1: (B, H, W) grayscale frames in [0, 1], float32.
      cfg: solver configuration.

    Returns:
      (B, H, W, 2) flow in pixels (x-displacement, y-displacement).
    """
    cfg = cfg or TVL1Config()
    if i0.ndim != 3:
        raise ValueError(f"expected (B, H, W), got {i0.shape}")
    B, H, W = i0.shape
    # The lambda/tau/theta defaults are tuned for the [0, 255] photometric
    # range (IPOL reference code and OpenCV both solve in that range);
    # rescale so [0,1] inputs behave identically.
    i0 = i0 * 255.0
    i1 = i1 * 255.0
    shapes = _pyramid_shapes(H, W, cfg.pyramid_levels, cfg.pyramid_factor)

    # Build the pyramid, finest first.
    pyr0 = [i0]
    pyr1 = [i1]
    for s in shapes[1:]:
        pyr0.append(pyramid_downscale(pyr0[-1], s, cfg.presmooth_sigma))
        pyr1.append(pyramid_downscale(pyr1[-1], s, cfg.presmooth_sigma))

    # Coarse-to-fine solve.
    ch, cw = shapes[-1]
    u1 = jnp.zeros((B, ch, cw), dtype=i0.dtype)
    u2 = jnp.zeros_like(u1)
    for lvl in range(len(shapes) - 1, -1, -1):
        u1, u2 = _solve_level(pyr0[lvl], pyr1[lvl], u1, u2, cfg)
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            sx = nw / shapes[lvl][1]
            sy = nh / shapes[lvl][0]
            u1 = resize_bilinear(u1, (nh, nw)) * sx
            u2 = resize_bilinear(u2, (nh, nw)) * sy

    return jnp.stack([u1, u2], axis=-1)


def quantize_flow(flow: jnp.ndarray, bound: float) -> jnp.ndarray:
    """Quantize float flow to uint8 the way dense_flow stores flow JPEGs:
    clip to [-bound, bound], map linearly to [0, 255]."""
    q = jnp.clip(flow, -bound, bound)
    return jnp.round((q + bound) * (255.0 / (2.0 * bound))).astype(jnp.uint8)


def dequantize_flow(q: jnp.ndarray, bound: float) -> jnp.ndarray:
    """Inverse of :func:`quantize_flow` (lossy by design, matching the
    reference's 8-bit flow-image data path)."""
    return q.astype(jnp.float32) * (2.0 * bound / 255.0) - bound
