"""Block-anchored bilinear warp — Pallas TPU kernel.

The TV-L1 solver's hot op is backward-warping I1 (and its gradients) by
the current flow, 15-25 times per frame pair. A gather-based bilinear
warp runs at ~2 ms/frame on TPU (the scatter/gather unit is the slowest
path on the chip); that made flow ~40x more expensive than the two VGG16
streams combined. This kernel eliminates the gather:

**Key observation.** Per-pixel 2-D warps are NOT separable into two
shift-select passes (the fractional weights belong to the *output*
pixel; pass 2 would consume pass-1 values interpolated with the wrong
pixel's fraction — a real bug, caught empirically against scipy). But
the bilinear weight of source offset (dy, dx) *factors per output pixel*

    out(p) = sum_dy sum_dx  wy(p, dy) * wx(p, dx) * I(p + (dy, dx))
    wy(p, dy) = (1-fy(p)) * [y0(p)==dy] + fy(p) * [y0(p)==dy-1]

so a bounded-displacement warp is a grid of masked vector FMAs — no
gathers. Affordable only for a small bound, and TV-regularized flow is
piecewise smooth, so per (8 x 128) VPU tile we split

    u = anchor + residual            (anchor: per-tile integer constant)

The anchor relocates the tile's source window (one dynamic VMEM slice),
the residual drives the factored shift-select. Mosaic only allows
dynamically-offset vector loads at sublane-aligned rows, so the y-anchor
is quantized to multiples of 8 and the y-residual bound widened to
DRY=8 (absorbing the quantization); the x-anchor stays free (lane
shifts are unconstrained) with DRX=6.

Pixels whose flow deviates from the tile anchor by more than the
residual bound (rare: motion boundaries crossing one tile) warp with a
clamped displacement — an explicit approximation inside an iterative
solver whose data term re-evaluates at every warp. Displacements are
also clamped to +-MAX_DISP (default 16 ~ the dense_flow 8-bit
quantization bound: larger flow saturates the reference's flow JPEGs
anyway, SURVEY.md §2 "Flow input format").

All fields of one warp step (I1, I1x, I1y) warp in one kernel sharing
the mask/weight computation. Everything is VMEM-resident vector math:
(2*DRY+2)*(2*DRX+2) = 18*14 = 252 masked FMAs per pixel per field.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32   # processing-tile rows (bigger vector ops, fewer loop trips)
TILE_W = 128
QY = 8        # y-anchor quantum: dynamic loads must be sublane-aligned
DRY = 8       # y-residual bound (covers the QY-quantized y anchor)
MAX_DISP = 16

# Field padding. PAD_Y is a sublane multiple (dynamic vector loads must
# be 8-aligned in the sublane dim); the x axis uses NO anchor at all —
# Mosaic requires 128-lane alignment for dynamically offset loads, so
# the whole x displacement (+-MAX_DISP) lives in the mask terms and the
# window load keeps a static, lane-aligned origin.
PAD_Y = 32  # >= MAX_DISP + DRY + 1 = 25, rounded up to a multiple of 8
PAD_X = MAX_DISP
# extra bottom/right padding so the largest window stays in bounds:
# y: base_y max = (Hk-8) + PAD_Y + 16 - DRY, window 8+2*DRY+2 rows
#    -> needs PAD_Y_BOT >= 2*DRY + 2 + MAX_DISP - DRY - 8 = 18
# x: window spans [xs - MAX_DISP, xs + 128 + MAX_DISP + 2) in original
#    coords -> needs PAD_X_R >= MAX_DISP + 18
PAD_Y_BOT = PAD_Y
PAD_X_R = MAX_DISP + 18


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


DRX = 6   # x-residual bound after the lane-rotate x anchor


def _warp_kernel(
    n_fields, gb, n_by, n_bx, n_t, Hk, Hc, interpret, ay_ref, ax_ref, *refs
):
    """refs = [*padded fields, r1, r2, *outputs].

    One program processes ``gb`` stacked frames: the residual/output
    canvases stack at ``Hk``-row strides, the padded field canvases at
    ``Hc``-row strides, and the per-frame anchor vectors at ``n_t``
    entries (each 128-padded so stacking preserves SMEM alignment).
    TPU grid programs run sequentially, so packing frames per program
    amortizes the fixed per-program cost at large stream counts."""
    padded = refs[:n_fields]
    r1_ref, r2_ref = refs[n_fields], refs[n_fields + 1]
    outs = refs[n_fields + 2 :]

    # Window loads are (56, 256): tpu.dynamic_rotate (and friendliest
    # vector layouts) want 8/128-aligned shapes; the extra rows/cols are
    # slack the inner slices never touch.
    WIN_ROWS = 56   # >= TILE_H + 2*DRY + 2 = 50
    WIN_COLS = 256  # >= TILE_W + 2*MAX_DISP + 2 = 162

    def roll_cols(arr, s):
        # new[j] = old[j + s]; wrapped tail lands outside the used range.
        if interpret:
            return jnp.roll(arr, -s, axis=1)
        return pltpu.roll(arr, -s, axis=1)

    tiles_pf = n_by * n_bx

    def tile_body(t, _):
        g = t // tiles_pf          # frame within the stacked block
        tl = t % tiles_pf
        by = tl // n_bx
        bx = tl % n_bx
        ys = pl.multiple_of(g * Hk + by * TILE_H, TILE_H)
        xs = pl.multiple_of(bx * TILE_W, TILE_W)
        ayq = ay_ref[0, g * n_t + tl]  # y anchor / QY
        ax = ax_ref[0, g * n_t + tl]   # x anchor (free; lane rotate)

        r1 = r1_ref[pl.ds(ys, TILE_H), pl.ds(xs, TILE_W)]
        r2 = r2_ref[pl.ds(ys, TILE_H), pl.ds(xs, TILE_W)]
        y0 = jnp.floor(r2)
        fy = r2 - y0
        x0 = jnp.floor(r1)
        fx = r1 - x0
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)

        # Source window origin. base_y is a multiple of 8 by construction
        # (every term is), which Mosaic requires for dynamic vector loads;
        # base_x is static and lane-aligned (x has no anchor).
        base_y = pl.multiple_of(
            g * Hc + (by * TILE_H) + PAD_Y + QY * ayq - DRY, QY
        )
        base_x = xs  # == xs + PAD_X - MAX_DISP

        # Aligned static-x load, then one dynamic lane-rotate applies the
        # integer x anchor: used columns [0, TILE_W + 2*DRX + 2) come from
        # original columns shifted by (ax + MAX_DISP - DRX); the rotate's
        # wrapped tail stays outside that range because the window has
        # 2*(MAX_DISP - DRX) columns of slack.
        shift = ax + (MAX_DISP - DRX)
        srcs = [
            roll_cols(
                p[pl.ds(base_y, WIN_ROWS), pl.ds(base_x, WIN_COLS)], shift
            )
            for p in padded
        ]

        accs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(n_fields)]
        # Residual ranges are usually a small fraction of the mask grid
        # (TV-smooth flow): runtime-skip dy rows whose weights are all
        # zero. lax.cond carries the accumulators functionally; the
        # x-loop stays unrolled inside the taken branch.
        y0min = jnp.min(y0)
        y0max = jnp.max(y0)
        for dy in range(-DRY, DRY + 2):
            oy = dy + DRY

            def dy_work(accs, dy=dy, oy=oy):
                wy = jnp.where(y0 == dy, 1.0 - fy, 0.0) + jnp.where(
                    y0 == dy - 1, fy, 0.0
                )
                out = list(accs)
                for dx in range(-DRX, DRX + 2):
                    wx = jnp.where(x0 == dx, 1.0 - fx, 0.0) + jnp.where(
                        x0 == dx - 1, fx, 0.0
                    )
                    w = wy * wx
                    ox = dx + DRX
                    for f in range(n_fields):
                        out[f] = out[f] + w * jax.lax.slice(
                            srcs[f], (oy, ox), (oy + TILE_H, ox + TILE_W)
                        )
                return tuple(out)

            pred = jnp.logical_and(dy >= y0min, dy <= y0max + 1)
            accs = list(
                jax.lax.cond(pred, dy_work, lambda a: tuple(a), tuple(accs))
            )
            # (An analogous dx-level skip measured neutral: the per-branch
            # overhead cancels the saved FMAs at typical x-ranges.)
        for f in range(n_fields):
            outs[f][pl.ds(ys, TILE_H), pl.ds(xs, TILE_W)] = accs[f]
        return 0

    jax.lax.fori_loop(0, gb * tiles_pf, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret"))
def warp_fields(
    fields: Tuple[jnp.ndarray, ...],
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    max_disp: int = MAX_DISP,
    interpret: bool = False,
) -> List[jnp.ndarray]:
    """Backward-warp (B, H, W) fields by flow (u1, u2), block-anchored.

    Args:
      fields: tuple of (B, H, W) arrays warped with shared weights.
      u1, u2: (B, H, W) x/y displacements in pixels; clamped to
        +-max_disp (must be <= MAX_DISP=16 — padding/mask ranges are
        sized for it).
      interpret: run the kernel in the Pallas interpreter (CPU tests).

    Returns:
      list of warped (B, H, W) float32 arrays.
    """
    B, H, W = u1.shape
    assert max_disp <= MAX_DISP, "padding sized for MAX_DISP"
    Hk = _ceil_to(H, TILE_H)
    Wk = _ceil_to(W, TILE_W)
    n_by = Hk // TILE_H
    n_bx = Wk // TILE_W

    u1c = jnp.clip(u1, -max_disp, max_disp)
    u2c = jnp.clip(u2, -max_disp, max_disp)
    # Pad the flow to the tiled grid. Edge mode, NOT zeros: ragged tiles'
    # anchor means must stay representative of the real pixels, otherwise
    # the residual clamp eats real displacement at the image border.
    u1c = jnp.pad(u1c, ((0, 0), (0, Hk - H), (0, Wk - W)), mode="edge")
    u2c = jnp.pad(u2c, ((0, 0), (0, Hk - H), (0, Wk - W)), mode="edge")

    # Per-tile anchors from tile-mean flow: y quantized to 8s (sublane
    # alignment), x free (applied by an in-kernel lane rotate).
    t1 = u1c.reshape(B, n_by, TILE_H, n_bx, TILE_W)
    t2 = u2c.reshape(B, n_by, TILE_H, n_bx, TILE_W)
    mean1 = jnp.mean(t1, axis=(2, 4))
    mean2 = jnp.mean(t2, axis=(2, 4))
    ayq = jnp.clip(
        jnp.round(mean2 / QY), -(max_disp // QY), max_disp // QY
    ).astype(jnp.int32)
    ax = jnp.clip(jnp.round(mean1), -max_disp + DRX, max_disp - DRX).astype(jnp.int32)
    # Mosaic wants the trailing dim of (even SMEM) blocks 128-aligned.
    n_t = _ceil_to(n_by * n_bx, 128)
    ay_s = jnp.pad(
        ayq.reshape(B, 1, n_by * n_bx), ((0, 0), (0, 0), (0, n_t - n_by * n_bx))
    )
    ax_s = jnp.pad(
        ax.reshape(B, 1, n_by * n_bx), ((0, 0), (0, 0), (0, n_t - n_by * n_bx))
    )

    # Residuals w.r.t. the broadcast anchors, clamped to the bounds.
    ay_b = jnp.repeat(jnp.repeat(ayq * QY, TILE_H, 1), TILE_W, 2).astype(u2c.dtype)
    ax_b = jnp.repeat(jnp.repeat(ax, TILE_H, 1), TILE_W, 2).astype(u1c.dtype)
    r1 = jnp.clip(u1c - ax_b, -DRX, DRX)
    r2 = jnp.clip(u2c - ay_b, -DRY, DRY)

    # Mosaic requires block dims 8/128-aligned; round the padded canvas.
    pad_x_r = PAD_X_R + Wk - W
    pad_x_r += _ceil_to(W + PAD_X + pad_x_r, 128) - (W + PAD_X + pad_x_r)
    padded = [
        jnp.pad(
            f.astype(jnp.float32),
            ((0, 0), (PAD_Y, PAD_Y_BOT + Hk - H), (PAD_X, pad_x_r)),
            mode="edge",
        )
        for f in fields
    ]

    n_fields = len(fields)
    Hc = PAD_Y + Hk + PAD_Y_BOT           # per-frame field-canvas rows
    Wc = W + PAD_X + pad_x_r

    # Frames per program (largest divisor of B within a VMEM budget).
    # Pallas double-buffers all in/out blocks, so the budget is applied
    # to 2x the per-frame block bytes; window loads/accumulators add on
    # top, hence the conservative 4 MB target (measured faster than
    # larger packs at 224^2, where gb=1 wins).
    per_frame_bytes = (n_fields * Hc * Wc + (2 + n_fields) * Hk * Wk) * 4
    budget = 4 * 1024 * 1024
    gb_max = max(1, budget // (2 * per_frame_bytes))
    gb = max(d for d in range(1, min(B, gb_max) + 1) if B % d == 0)
    n_prog = B // gb

    def stack3(x, rows):
        return x.reshape(n_prog, gb * rows, x.shape[-1])

    ay_s = ay_s.reshape(n_prog, 1, gb * n_t)
    ax_s = ax_s.reshape(n_prog, 1, gb * n_t)
    padded = [stack3(f, Hc) for f in padded]
    r1 = stack3(r1, Hk)
    r2 = stack3(r2, Hk)

    def squeezing_kernel(ay_ref, ax_ref, *refs):
        sq = [r.at[0] for r in refs]
        _warp_kernel(
            n_fields, gb, n_by, n_bx, n_t, Hk, Hc, interpret,
            ay_ref.at[0], ax_ref.at[0], *sq,
        )

    in_specs = (
        [
            pl.BlockSpec(
                (1, 1, gb * n_t), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            )
            for _ in range(2)
        ]
        + [
            pl.BlockSpec(
                (1, gb * Hc, Wc), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(n_fields)
        ]
        + [
            pl.BlockSpec(
                (1, gb * Hk, Wk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(2)
        ]
    )
    out_specs = [
        pl.BlockSpec((1, gb * Hk, Wk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(n_fields)
    ]

    outs = pl.pallas_call(
        squeezing_kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, gb * Hk, Wk), jnp.float32)
            for _ in range(n_fields)
        ],
        interpret=interpret,
    )(ay_s, ax_s, *padded, r1, r2)
    return [o.reshape(B, Hk, Wk)[:, :H, :W] for o in outs]
