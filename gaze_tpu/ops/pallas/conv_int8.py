"""Implicit-im2col int8 3x3 conv chain — Pallas TPU kernel.

**MEASURED NEGATIVE RESULT on v5e — selectable, not the default.**
Standalone, XLA's int8 conv reaches only ~200-217 TOPS on the deep VGG
shapes while a plain int8 matmul of the same MACs reaches 330-390
(tools/bench_int8_conv.py), which motivated this kernel: it runs at
296 TOPS (56x56x256x256) to 389 TOPS (28x28x512x512, 99% of the int8
peak) with epilogue and masking included, and is bit-identical to the
XLA chain. But IN CHAIN the comparison inverts: the full quant stream
runs 14.05 ms under XLA (279 TOPS average — the standalone 200-TOPS
reading was a function-boundary artifact; fused into its requant
epilogues XLA's conv tiling is near-optimal) vs 18.0 ms through this
chain, because the canvas padding/reshape copies between stages and
the flattening's garbage rows (border ring + wrap columns + guards:
7-30% of the matmul M depending on grid size) eat the raw-matmul
advantage. End-to-end turbo: 2298 fps (xla) vs 2016 (pallas). Lesson
recorded next to the polyphase decoder's (models/decode_fast.py): on
TPU, measure XLA IN SITU before replacing it — standalone op timings
lie in both directions. Kept selectable (`--quant_conv pallas`,
`GazePipeline.quant_conv`) with interpret-mode + on-hardware
bit-exactness tests.

The kernel runs the conv as NINE ACCUMULATED MATMULS over
shifted views of a flattened padded canvas, with the im2col never
materialized outside VMEM:

**Flattened-canvas identity.** Pad the (H, W) grid to a canvas of
(H+2, W+2) rows and flatten row-major to row index p. The input pixel
for output position p under kernel tap (dy, dx) sits at
p + (dy-1)*(W+2) + (dx-1) — a CONSTANT row offset per tap. So

    acc[p, :] = sum_t X2[p + off_t, :] @ K[t]      (t = 9 taps)

where every operand is a contiguous row-slice of the same VMEM-resident
(rows, Ci) buffer: M = H*(W+2)-ish rows per matmul (large, MXU-shaped)
instead of XLA's spatial tiling. Measured: 296 TOPS at 56x56x256x256,
389 TOPS (99% of the v5e int8 peak) at 28x28x512x512, epilogue and
masking included.

Mechanics that make it fast (probe-measured, each worth 10-40%):
  - guard rows above/below the canvas, rounded to the int8 sublane tile
    (32), so every STORE is tile-aligned (the tap LOADS are misaligned
    by construction — Mosaic handles those well; misaligned stores were
    ~0.7 ms/layer of hidden relayout);
  - the border/garbage mask (canvas border ring, inter-canvas guard
    rows, and the 2 wrap-around columns per row that the flattening
    introduces) is a precomputed (rows, 128) int8 OPERAND, not in-kernel
    iota/mod arithmetic (~0.7 ms/layer cheaper at 56-grid size);
  - masked positions are written the stored-zero code -128, so the
    output IS the next layer's padded canvas: chained convs of a VGG
    stage never leave the canvas coordinate system and never touch XLA
    between layers;
  - small grids stack GB batch canvases per program (guards already
    separate them; taps from one canvas's interior can only reach its
    own guards) to keep matmul M large.

The epilogue reproduces models/quant.py's fused requant EXACTLY
(acc_f32 * a + c, round, clip to [-128, 127]) with the same per-channel
a/c vectors, so the chain is bit-identical to the XLA path — asserted
in interpret mode by tests/test_pallas_conv_int8.py and on hardware by
tests/test_tpu_kernels.py.

Reference: this accelerates the SP VGG16 encoders of ref:models/SP.py
(SURVEY.md §2) on the int8 serving path; the reference has no
quantized or TPU path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Stored value of real zero on the asymmetric activation grid
# (models/quant.py: zero-point 128, stored = q - 128).
_ZERO_CODE = -128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class ConvTap:
    """One 3x3 conv layer of the int8 chain, epilogue folded.

    k9: (9, Ci, Co) int8 — HWIO kernel reshaped tap-major.
    a:  (1, Co) f32 — requant scale  (sx * w_scale / s_next).
    c:  (1, Co) f32 — requant bias   (bias/s_next - 128 + 128*col_sum*a).
    """

    k9: jnp.ndarray
    a: jnp.ndarray
    c: jnp.ndarray


jax.tree_util.register_dataclass(
    ConvTap, data_fields=["k9", "a", "c"], meta_fields=[]
)


def _geometry(B: int, H: int, W: int) -> Tuple[int, int, int, int, int]:
    """(GB, WP, M, G, MP): canvases per program, padded width, canvas
    rows, aligned guard rows, per-canvas rows incl. guards."""
    WP = W + 2
    M = (H + 2) * WP
    G = _ceil_to(WP + 1, 32)
    MP = M + 2 * G
    # Stack canvases while the row count stays MXU-friendly and the
    # VMEM estimate (acc f32 + in/out int8 + weights + mask) fits.
    GB = 1
    for g in (8, 4, 2):
        if B % g == 0 and g * MP <= 2600:
            GB = g
            break
    return GB, WP, M, G, MP


def _row_mask(RT: int, MP: int, WP: int, H: int, W: int, G: int) -> np.ndarray:
    """(RT, 128) int8: 1 at canvas-interior rows, 0 at the border ring,
    guard rows, and the wrap-around columns of the flattening."""
    p = np.arange(RT) % MP - G
    hc, wc = p // WP, p % WP
    valid = (p >= 0) & (p < (H + 2) * WP) & (hc >= 1) & (hc <= H) \
        & (wc >= 1) & (wc <= W)
    return np.broadcast_to(
        valid[:, None], (RT, 128)).astype(np.int8).copy()


def _chain_kernel(offs, G, MR, layers, *refs):
    """All taps of all chained layers run inside one program: the
    intermediate canvases live in VMEM registers, never in HBM."""
    x_ref = refs[0]
    m_ref = refs[1]
    o_ref = refs[-1]
    tap_refs = refs[2:-1]  # (k9, a, c) per layer
    x = x_ref[0]
    n = len(layers)
    for li in range(n):
        k_ref, a_ref, c_ref = tap_refs[3 * li:3 * li + 3]
        Co = k_ref.shape[-1]
        acc = jnp.zeros((MR, Co), jnp.int32)
        for t, off in enumerate(offs):
            xs = x[G + off:G + off + MR, :]
            # precision set EXPLICITLY: an ambient
            # jax_default_matmul_precision="float32" (the test conftest
            # sets one) otherwise reaches Mosaic as an f32-precision
            # request on int8 operands -> "Bad lhs type" compile error.
            acc = acc + jax.lax.dot_general(
                xs, k_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT,
            )
        y = acc.astype(jnp.float32) * a_ref[0] + c_ref[0]
        q = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        q = jnp.where(m_ref[0, G:G + MR, :1] != 0, q, jnp.int8(_ZERO_CODE))
        guard = jnp.full((G, Co), _ZERO_CODE, jnp.int8)
        if li == n - 1:
            o_ref[0, :G, :] = guard
            o_ref[0, G:G + MR, :] = q
            o_ref[0, G + MR:, :] = guard
        else:
            x = jnp.concatenate([guard, q, guard], axis=0)


def conv3x3_int8_chain(
    x: jnp.ndarray,
    layers: Sequence[ConvTap],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a chain of 3x3 SAME int8 convs with fused requant epilogues.

    x: (B, H, W, Ci) int8 STORED values (asymmetric grid, zero-point
    128 — real zero is -128; models/quant.py interior activations).
    Returns (B, H, W, Co_last) int8 stored values — bit-identical to
    models/quant.py's XLA loop over the same layers.

    Constraints: every Ci/Co a multiple of 128 (VGG stages 3-5 qualify);
    all layers share the spatial grid (no pooling inside a chain).
    """
    B, H, W, Ci = x.shape
    if Ci % 128:
        raise ValueError(f"Ci={Ci} must be a multiple of 128")
    for t in layers:
        if t.k9.shape[-1] % 128:
            raise ValueError("Co must be a multiple of 128")
    GB, WP, M, G, MP = _geometry(B, H, W)
    RT = GB * MP
    MR = RT - 2 * G
    offs = tuple((dy - 1) * WP + (dx - 1) for dy in range(3) for dx in range(3))
    Co = int(layers[-1].k9.shape[-1])

    # Interior -> flattened guarded canvas (one fused XLA pad+reshape).
    xc = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=np.int8(_ZERO_CODE))
    xc = xc.reshape(B, M, Ci)
    xc = jnp.pad(xc, ((0, 0), (G, G), (0, 0)),
                 constant_values=np.int8(_ZERO_CODE))
    xc = xc.reshape(B // GB, RT, Ci)
    mask = jnp.asarray(_row_mask(RT, MP, WP, H, W, G))[None]

    tap_args = []
    in_specs = [
        pl.BlockSpec((1, RT, Ci), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, RT, 128), lambda b: (0, 0, 0)),
    ]
    for t in layers:
        ci, co = int(t.k9.shape[1]), int(t.k9.shape[2])
        tap_args += [t.k9, t.a, t.c]
        in_specs += [
            pl.BlockSpec((9, ci, co), lambda b: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda b: (0, 0)),
            pl.BlockSpec((1, co), lambda b: (0, 0)),
        ]

    out = pl.pallas_call(
        functools.partial(_chain_kernel, offs, G, MR, tuple(range(len(layers)))),
        grid=(B // GB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, RT, Co), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B // GB, RT, Co), jnp.int8),
        interpret=interpret,
    )(xc, mask, *tap_args)

    # Guarded canvas -> interior.
    out = out.reshape(B, MP, Co)[:, G:G + M, :]
    out = out.reshape(B, H + 2, WP, Co)[:, 1:H + 1, 1:W + 1, :]
    return out
