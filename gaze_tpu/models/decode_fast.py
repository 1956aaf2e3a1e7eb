"""Polyphase ("pixel-shuffle") fast path for the SP decoder tail.

The canonical decoder (models/sp.py ``Decoder``) mirrors the reference's
ConvTranspose(4x4, stride 2) upsampling blocks (ref:models/SP.py [M]).
XLA lowers a transposed conv as a regular conv over the 2x-dilated
input, so at stride 2 three out of four kernel taps multiply structural
zeros: the MXU does 64*C_in*C_out MACs per output pixel group where only
16 are live. Per tools/bench_sp_layers.py the bf16 deconv stack costs
8.5 ms of the 52.5 ms turbo step.

This module evaluates the SAME trained parameters through the exact
polyphase decomposition instead:

    ConvTranspose(K 4x4, s2, SAME)  ==  pad(1) -> Conv(W 2x2, VALID)
                                        -> offset depth-to-space

with ``W[ty, tx, :, (2r+s)*C:(2r+s+1)*C] = K[2*ty + r, 2*tx + s]``.

Derivation (per dimension, flax/lax ``conv_transpose`` semantics with
``transpose_kernel=False``): SAME at k=4/s=2 pads the 2x-dilated input
by (2, 2), so output phase r uses kernel taps {r, r+2} over input
pixels {m-1, m} (r=0) / {m, m+1} (r=1). Both windows live inside one
2x2 VALID conv over the once-padded input, producing N+1 positions of
which phase 0 reads [0, N) and phase 1 reads [1, N+1). Zero padding of
the dilated canvas and of the polyphase input coincide, so the
equivalence is exact everywhere including borders
(tests/test_decode_fast.py pins it at 1e-5 in f32).

Cost: 2*2*C_in*4*C_out MACs per input pixel — the information-optimal
16x MAC/output-group, a nominal 4x reduction — and, being a regular
conv, it is quantizable to int8 (int8 transposed conv does not compile
through this environment's remote compiler; see memory notes).

MEASURED NEGATIVE RESULT on v5e (tools/bench_decoder.py, B=128, bf16):
canonical deconv tail 11.0 ms; polyphase 35.2 ms (the depth-to-space
interleave is ~21 ms of pure data movement); polyphase with a fake
contiguous reshape instead of d2s still 14.3 ms; int8 polyphase tail
18.9 ms. XLA's TPU transposed-conv lowering is NOT MAC-waste-bound —
these layers are HBM-bandwidth-bound, so the 4x MAC reduction buys
nothing and the interleave costs extra traffic. The canonical deconv
therefore stays the serving default; this path remains available
(--decoder pixelshuffle / QuantSP.tail) as the exactness-tested
alternative for hardware where the tradeoff differs, with compile
coverage in dryrun_multichip. See docs/STATUS.md round-3.

Inference-only: BatchNorm is folded (running stats) into the polyphase
kernel/bias, so this path must not be used for training — the train
path keeps the canonical ``Decoder`` module and parameter tree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gaze_tpu.core.config import SPConfig


def polyphase_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, I, O) ConvTranspose kernel -> (2, 2, I, 4*O) polyphase conv
    kernel; phase block p = 2r + s holds K[2ty+r, 2tx+s]."""
    kh, kw, i, o = k.shape
    assert kh == 4 and kw == 4, f"polyphase form needs 4x4 kernels, got {k.shape}"
    # [ty, r, tx, s, I, O] -> [ty, tx, I, r, s, O] -> (2, 2, I, 4O):
    # the output-channel axis orders as (r, s, O), i.e. phase-major
    # blocks p = 2r + s of width O.
    t = k.reshape(2, 2, 2, 2, i, o).transpose(0, 2, 4, 1, 3, 5)
    return t.reshape(2, 2, i, 4 * o)


def _depth_to_space_offset(y: jnp.ndarray, c: int) -> jnp.ndarray:
    """(B, N+1, M+1, 4C) polyphase conv output -> (B, 2N, 2M, C):
    out[2m+r, 2n+s] = y[m+r, n+s, block(2r+s)]."""
    b = y.shape[0]
    n, m = y.shape[1] - 1, y.shape[2] - 1
    y00 = y[:, :-1, :-1, 0 * c:1 * c]
    y01 = y[:, :-1, 1:, 1 * c:2 * c]
    y10 = y[:, 1:, :-1, 2 * c:3 * c]
    y11 = y[:, 1:, 1:, 3 * c:4 * c]
    # Transpose-free interleave: stacks insert the phase axes directly
    # ahead of the dims they merge with, so both reshapes are contiguous
    # merges (a real minor-dim transpose here dominated the tail's cost
    # on v5e).
    r0 = jnp.stack([y00, y01], axis=3).reshape(b, n, 2 * m, c)
    r1 = jnp.stack([y10, y11], axis=3).reshape(b, n, 2 * m, c)
    return jnp.stack([r0, r1], axis=2).reshape(b, 2 * n, 2 * m, c)


def upsample2x_block(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, dtype: Any
) -> jnp.ndarray:
    """One ConvTranspose(4x4, s2, SAME)-equivalent upsample via the
    polyphase conv. kernel: (4,4,I,O) canonical layout; bias: (O,)."""
    o = kernel.shape[-1]
    w = polyphase_kernel(kernel.astype(jnp.float32))
    b4 = jnp.tile(bias.astype(jnp.float32), 4)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b4.astype(dtype)
    return _depth_to_space_offset(y, o)


def _folded_block_params(
    dec_params: Dict[str, Any],
    dec_stats: Dict[str, Any],
    i: int,
    use_batchnorm: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ConvTranspose kernel/bias of block i with inference-mode BN folded
    in: y = BN(deconv(x)) = deconv_g(x) with k*g, (b - mean)*g + beta."""
    k = dec_params[f"deconv{i + 1}"]["kernel"].astype(jnp.float32)
    b = dec_params[f"deconv{i + 1}"]["bias"].astype(jnp.float32)
    if not use_batchnorm:
        return k, b
    bn = dec_params[f"bn{i + 1}"]
    st = dec_stats[f"bn{i + 1}"]
    g = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        st["var"].astype(jnp.float32) + 1e-5
    )
    return k * g, (b - st["mean"].astype(jnp.float32)) * g + bn[
        "bias"
    ].astype(jnp.float32)


def even_phase_block(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, dtype: Any
) -> jnp.ndarray:
    """Phase-(0,0) subgrid of a ConvTranspose(4x4, s2, SAME) block: the
    EXACT even output samples out[::2, ::2], as one 2x2 conv with taps
    K[{0,2}, {0,2}] over the (m-1, m) windows (pad top/left 1)."""
    w = kernel[::2, ::2].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def _upsample2x_map(m: jnp.ndarray) -> jnp.ndarray:
    """(B, N, M) map -> (B, 2N, 2M): even rows/cols are the input
    samples (grid-aligned, matching the even-phase subgrid's meaning);
    odd ones are the midpoint average with edge clamp."""
    def up1d(x):  # interleave along axis 1
        nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        mid = 0.5 * (x + nxt)
        return jnp.stack([x, mid], axis=2).reshape(
            x.shape[0], 2 * x.shape[1], *x.shape[2:]
        )

    m = up1d(m)                      # rows
    m = jnp.swapaxes(up1d(jnp.swapaxes(m, 1, 2)), 1, 2)  # cols
    return m


def halfres_fuse_decode(
    sp_variables: Dict[str, Any],
    cfg: SPConfig,
    f_spatial: jnp.ndarray,
    f_temporal: jnp.ndarray,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Serving approximation: canonical tail through the second-to-last
    block, then ONLY the exact even-sample subgrid of the final
    ConvTranspose block (even_phase_block), out_conv + sigmoid at half
    resolution, and a 1-channel bilinear interleave back to full size.

    Every even output pixel equals the canonical tail's exactly (BN
    fold aside); odd pixels are midpoint-interpolated — an accuracy
    knob of the same class as half-grid TV-L1 (TVL1Config.flow_scale),
    motivated by the tail being HBM-bound: this removes every
    full-resolution 64-channel tensor from the pipeline
    (tools/bench_decoder.py / docs/STATUS.md for measurements).
    """
    params = sp_variables["params"]
    stats = sp_variables.get("batch_stats", {}).get("decoder", {})
    fused = jnp.concatenate([f_spatial, f_temporal], axis=-1).astype(dtype)
    fk = params["fuse_conv"]["kernel"].astype(dtype)
    fb = params["fuse_conv"]["bias"].astype(dtype)
    x = jax.nn.relu(
        jax.lax.conv_general_dilated(
            fused, fk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + fb
    )
    dec = params["decoder"]
    n = len(cfg.decoder_channels)
    for i in range(n - 1):
        # canonical transposed conv for the early blocks — the
        # polyphase form measured slower on v5e (module docstring)
        k, b = _folded_block_params(dec, stats, i, cfg.use_batchnorm)
        x = jax.nn.relu(
            jax.lax.conv_transpose(
                x.astype(dtype), k.astype(dtype), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dtype)
        )
    k, b = _folded_block_params(dec, stats, n - 1, cfg.use_batchnorm)
    x = jax.nn.relu(even_phase_block(x, k, b, dtype))
    ok = dec["out_conv"]["kernel"].astype(dtype)
    ob = dec["out_conv"]["bias"].astype(dtype)
    logits = jax.lax.conv_general_dilated(
        x, ok, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + ob
    half = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
    return _upsample2x_map(half)


def fast_fuse_decode(
    sp_variables: Dict[str, Any],
    cfg: SPConfig,
    f_spatial: jnp.ndarray,
    f_temporal: jnp.ndarray,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Inference-equivalent of ``SPNet.fuse_decode`` (models/sp.py) on the
    same variable tree, with every ConvTranspose block evaluated in
    polyphase form and BatchNorm (running stats) folded into the conv.

    Returns the (B, H, W) saliency map. Numerics match the canonical
    tail up to float associativity of the BN fold.
    """
    params = sp_variables["params"]
    stats = sp_variables.get("batch_stats", {}).get("decoder", {})
    fused = jnp.concatenate([f_spatial, f_temporal], axis=-1).astype(dtype)
    fk = params["fuse_conv"]["kernel"].astype(dtype)
    fb = params["fuse_conv"]["bias"].astype(dtype)
    x = jax.nn.relu(
        jax.lax.conv_general_dilated(
            fused, fk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + fb
    )
    dec = params["decoder"]
    for i in range(len(cfg.decoder_channels)):
        k, b = _folded_block_params(dec, stats, i, cfg.use_batchnorm)
        x = jax.nn.relu(upsample2x_block(x, k, b, dtype))
    ok = dec["out_conv"]["kernel"].astype(dtype)
    ob = dec["out_conv"]["bias"].astype(dtype)
    logits = jax.lax.conv_general_dilated(
        x, ok, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + ob
    return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
