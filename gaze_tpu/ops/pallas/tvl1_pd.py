"""Fused TV-L1 primal-dual inner loop — Pallas TPU kernel.

One (level, warp) step of the TV-L1 solver runs ``iters`` primal-dual
iterations over a 6-array carry (u1, u2, p11, p12, p21, p22) plus 4
frozen fields (warped gradients, gradient magnitude, residual constant).
As a ``lax.scan``, every iteration round-trips ~10 frame-sized arrays
through HBM; here the whole loop runs inside one kernel with every
array VMEM-resident, so the iterations are pure VPU compute.

Implementation notes:
- TPU grid programs execute sequentially, so one-frame-per-program
  wastes time on per-program overhead at large stream counts. Frames
  are therefore STACKED into a tall (GB*Hk, Wk) canvas with GB frames
  per program (GB sized to a VMEM budget); the border masking (below)
  makes frame boundaries exact with no extra logic: each frame's
  y-duals are zero at its last real row, and the padded rows between
  frames stay zero, so the stacked divergence reduces to the per-frame
  form.
- Frames are padded to (8k, 128k) canvases for Mosaic layout; the
  Neumann boundary condition is imposed by masking the forward
  differences at the *real* image border (col W-1 / row (H-1 mod Hk)),
  which also firewalls the padded dead zone: divergence at real pixels
  only ever reads p-values at real pixels, and the masked gradient
  keeps the dead zone from leaking into p.
- The math matches gaze_tpu.ops.tvl1._solve_level's scan body exactly
  (thresholding step, primal update from the dual divergence, dual
  ascent with reprojection) — asserted by tests in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_GRAD = 1e-9


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pd_kernel(H, W, Hk, iters, tau, lambda_, theta, *refs):
    (u1_ref, u2_ref, p11_ref, p12_ref, p21_ref, p22_ref,
     i1wx_ref, i1wy_ref, grad_ref, rho_c_ref,
     o_u1, o_u2, o_p11, o_p12, o_p21, o_p22) = refs

    lt = lambda_ * theta
    taut = tau / theta

    Ht, Wk = u1_ref.shape  # tall canvas: GB stacked frames of Hk rows
    row = jax.lax.broadcasted_iota(jnp.int32, (Ht, Wk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Ht, Wk), 1)
    # Neumann bc at each frame's REAL border; also isolates the padded
    # dead zones (incl. the rows between stacked frames).
    mask_x = (col < W - 1).astype(jnp.float32)
    mask_y = ((row % Hk) < H - 1).astype(jnp.float32)

    i1wx = i1wx_ref[:]
    i1wy = i1wy_ref[:]
    grad = grad_ref[:]
    rho_c = rho_c_ref[:]

    def fwd_grad(u):
        gx = jnp.concatenate([u[:, 1:] - u[:, :-1], jnp.zeros((Ht, 1), u.dtype)], 1)
        gy = jnp.concatenate([u[1:, :] - u[:-1, :], jnp.zeros((1, Wk), u.dtype)], 0)
        return gx * mask_x, gy * mask_y

    def div(p1, p2):
        d1 = jnp.concatenate(
            [p1[:, :1], p1[:, 1:-1] - p1[:, :-2], -p1[:, -2:-1]], 1
        )
        d2 = jnp.concatenate(
            [p2[:1, :], p2[1:-1, :] - p2[:-2, :], -p2[-2:-1, :]], 0
        )
        return d1 + d2

    def body(_, carry):
        u1, u2, p11, p12, p21, p22 = carry
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
        u1n = u1 + d1 + theta * div(p11, p12)
        u2n = u2 + d2 + theta * div(p21, p22)
        g1x, g1y = fwd_grad(u1n)
        g2x, g2y = fwd_grad(u2n)
        ng1 = 1.0 + taut * jnp.sqrt(g1x * g1x + g1y * g1y)
        ng2 = 1.0 + taut * jnp.sqrt(g2x * g2x + g2y * g2y)
        p11 = (p11 + taut * g1x) / ng1
        p12 = (p12 + taut * g1y) / ng1
        p21 = (p21 + taut * g2x) / ng2
        p22 = (p22 + taut * g2y) / ng2
        return (u1n, u2n, p11, p12, p21, p22)

    carry = (u1_ref[:], u2_ref[:], p11_ref[:], p12_ref[:], p21_ref[:], p22_ref[:])
    carry = jax.lax.fori_loop(0, iters, body, carry)
    u1, u2, p11, p12, p21, p22 = carry
    o_u1[:] = u1
    o_u2[:] = u2
    o_p11[:] = p11
    o_p12[:] = p12
    o_p21[:] = p21
    o_p22[:] = p22


@functools.partial(
    jax.jit, static_argnames=("iters", "tau", "lambda_", "theta", "interpret")
)
def pd_iterations(
    u1, u2, p11, p12, p21, p22, i1wx, i1wy, grad, rho_c,
    iters: int,
    tau: float,
    lambda_: float,
    theta: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Run ``iters`` fused primal-dual iterations. All args (B, H, W) f32.

    Returns the updated (u1, u2, p11, p12, p21, p22).

    NOTE: the primal update here folds the thresholding step and the
    divergence term into one expression — algebraically identical to the
    reference scan body in ops/tvl1.py.
    """
    B, H, W = u1.shape
    Hk = _ceil_to(H, 8)
    Wk = _ceil_to(W, 128)

    # Frames per program, sized against real VMEM usage: Pallas
    # double-buffers every in/out block (2 x 16 canvases) and the loop
    # carry + scheduler temps live on top. Measured on v5e: the compiler
    # peaks at ~43 canvases/frame (a 38-canvas estimate overflowed the
    # 16M scoped VMEM by 92K at the dense_flow preset's 179² pyramid
    # level) — budget 44 with 14M headroom. Largest divisor of B.
    frame_bytes = Hk * Wk * 4
    budget = 14 * 1024 * 1024
    gb_max = max(1, budget // (44 * frame_bytes))
    gb = max(d for d in range(1, min(B, gb_max) + 1) if B % d == 0)
    n_prog = B // gb

    def padit(x):
        p = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Hk - H), (0, Wk - W)))
        return p.reshape(n_prog, gb * Hk, Wk)

    ins = [padit(x) for x in (u1, u2, p11, p12, p21, p22, i1wx, i1wy, grad, rho_c)]

    kernel = functools.partial(_pd_kernel, H, W, Hk, iters, tau, lambda_, theta)

    def squeezing_kernel(*refs):
        kernel(*[r.at[0] for r in refs])

    spec = pl.BlockSpec((1, gb * Hk, Wk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        squeezing_kernel,
        grid=(n_prog,),
        in_specs=[spec] * 10,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((n_prog, gb * Hk, Wk), jnp.float32)] * 6,
        interpret=interpret,
    )(*ins)
    return tuple(o.reshape(B, Hk, Wk)[:, :H, :W] for o in outs)
