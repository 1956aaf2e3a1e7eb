"""int8 quantization of the SP fuse/decoder tail via its polyphase form.

models/quant.py quantizes the two VGG16 encoder streams but leaves the
fuse/decoder tail in bf16, because int8 TRANSPOSED conv does not compile
through this environment's remote compiler (memory notes). The exact
polyphase re-formulation (models/decode_fast.py) turns every
ConvTranspose block into a regular 2x2 conv + offset depth-to-space —
which IS int8-compilable — so the whole saliency head can join the
int8-resident chain:

    concat(conv5_s, conv5_t) -> q8 -> 1x1 fuse -> [2x2 polyphase conv
    -> requant -> d2s int8] x4 -> 1x1 out conv -> f32 sigmoid

Scheme identical to quant.py's interior layers: every tail input is
post-ReLU (nonnegative), so all activations use the asymmetric unsigned
[0,255] grid stored int8 with zero-point 128; weights are per-output-
channel symmetric int8 (per PHASE-block channel for the polyphase
kernels — 4x finer than per-canonical-channel); BatchNorm is folded
into the conv weights before quantization (running stats —
inference-only, like decode_fast); padding injects the real-zero code
-128 and convolves VALID; ReLU + requant fold into one clip epilogue
(d2s commutes with the elementwise requant, so the chain stays int8
across HBM between blocks). Only the final 1-channel logits dequantize.

The reference has no quantized path (research code, SURVEY.md §1);
accuracy impact is measured by rollout AAE/AUC on trained checkpoints
(docs/STATUS.md round-3 tables).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.config import SPConfig
from gaze_tpu.models.decode_fast import (
    _depth_to_space_offset,
    _folded_block_params,
    polyphase_kernel,
)

_ZP = 128  # all tail activations are post-ReLU -> asymmetric grid


def tail_layer_names(cfg: SPConfig) -> Tuple[str, ...]:
    return ("fuse", *(f"up{i + 1}" for i in range(len(cfg.decoder_channels))),
            "out")


def fold_tail_params(
    sp_variables: Dict[str, Any], cfg: SPConfig
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Tail conv stack as plain (kernel, bias) f32 pairs: the 1x1 fuse
    conv, each upsample block in polyphase form with BN folded, and the
    1x1 output conv."""
    params = sp_variables["params"]
    stats = sp_variables.get("batch_stats", {}).get("decoder", {})
    folded: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {
        "fuse": (
            params["fuse_conv"]["kernel"].astype(jnp.float32),
            params["fuse_conv"]["bias"].astype(jnp.float32),
        )
    }
    dec = params["decoder"]
    for i in range(len(cfg.decoder_channels)):
        k, b = _folded_block_params(dec, stats, i, cfg.use_batchnorm)
        folded[f"up{i + 1}"] = (polyphase_kernel(k), jnp.tile(b, 4))
    folded["out"] = (
        dec["out_conv"]["kernel"].astype(jnp.float32),
        dec["out_conv"]["bias"].astype(jnp.float32),
    )
    return folded


def _conv(x, k, padding):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def tail_forward_with_bounds(
    folded: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
    cfg: SPConfig,
    x: jnp.ndarray,
    percentile: Optional[float] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """f32 polyphase tail forward on concat features, recording each
    conv's input bound (max or upper percentile — calibration probe)."""
    bounds: Dict[str, jnp.ndarray] = {}

    def record(name, v):
        a = jnp.abs(v)
        bounds[name] = (
            jnp.max(a) if percentile is None
            else jnp.percentile(a.ravel(), percentile)
        )

    record("fuse", x)
    k, b = folded["fuse"]
    x = jax.nn.relu(_conv(x, k, "SAME") + b)
    for i in range(len(cfg.decoder_channels)):
        name = f"up{i + 1}"
        record(name, x)
        k, b = folded[name]
        y = _conv(x, k, ((1, 1), (1, 1))) + b
        x = jax.nn.relu(_depth_to_space_offset(y, k.shape[-1] // 4))
    record("out", x)
    k, b = folded["out"]
    logits = _conv(x, k, "SAME") + b
    return jax.nn.sigmoid(logits)[..., 0], bounds


@dataclasses.dataclass(frozen=True)
class QuantTail:
    """int8 tail parameters + calibrated activation scales."""

    kernels: Dict[str, jnp.ndarray]    # int8 HWIO (polyphase for up*)
    w_scales: Dict[str, jnp.ndarray]   # (O,) f32 per-output-channel
    biases: Dict[str, jnp.ndarray]     # (O,) f32 (BN folded for up*)
    act_scales: Dict[str, jnp.ndarray] # () f32 input scale per conv
    # (O,) f32 sum of the int8 kernel over (h, w, in) — precomputed
    # EAGERLY (like QuantVGG.col_sums): computing it inside the traced
    # forward makes XLA constant-fold a reduce over the full kernel at
    # compile time, which its slow HLO evaluator turns into tens of
    # seconds per conv on CPU compiles (the round-4 dryrun timeout).
    col_sums: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    num_blocks: int = 4


def build_quant_tail(
    sp_variables: Dict[str, Any],
    cfg: SPConfig,
    act_scales: Dict[str, jnp.ndarray],
) -> QuantTail:
    folded = fold_tail_params(sp_variables, cfg)
    kernels, w_scales, biases, col_sums = {}, {}, {}, {}
    for name, (k, b) in folded.items():
        kf = np.asarray(k, np.float32)
        s = np.maximum(np.max(np.abs(kf), axis=(0, 1, 2)) / 127.0, 1e-12)
        q = np.clip(np.round(kf / s), -127, 127).astype(np.int8)
        kernels[name] = jnp.asarray(q)
        w_scales[name] = jnp.asarray(s)
        biases[name] = jnp.asarray(np.asarray(b, np.float32))
        col_sums[name] = jnp.asarray(q.astype(np.float32).sum(axis=(0, 1, 2)))
    return QuantTail(
        kernels=kernels, w_scales=w_scales, biases=biases,
        act_scales=dict(act_scales), col_sums=col_sums,
        num_blocks=len(cfg.decoder_channels),
    )


def calibrate_tail(
    sp_variables: Dict[str, Any],
    cfg: SPConfig,
    feature_batches: List[np.ndarray],
    margin: float = 1.0,
    percentile: Optional[float] = None,
) -> QuantTail:
    """Calibrate from representative CONCATENATED conv5 features
    (B, h, w, 2*512) — i.e. exactly the tail's serving input; aggregate
    per-batch bounds by max, like quant.calibrate_vgg."""
    if not feature_batches:
        raise ValueError("tail PTQ calibration needs at least one batch")
    folded = fold_tail_params(sp_variables, cfg)
    fn = jax.jit(
        lambda x: tail_forward_with_bounds(folded, cfg, x, percentile)[1]
    )
    agg: Dict[str, float] = {}
    for b in feature_batches:
        m = jax.device_get(fn(jnp.asarray(b, jnp.float32)))
        for k, v in m.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    scales = {
        k: jnp.asarray(max(v, 1e-12) * margin / 255.0, jnp.float32)
        for k, v in agg.items()
    }
    return build_quant_tail(sp_variables, cfg, scales)


def quant_tail_forward(
    qt: QuantTail, f_spatial: jnp.ndarray, f_temporal: jnp.ndarray
) -> jnp.ndarray:
    """int8-resident tail: f32 conv5 features -> (B, H, W) saliency.

    Mirrors quant.quant_vgg_forward's interior-layer algebra: stored
    int8 = q - 128 on the unsigned [0,255] grid; conv accumulates int32
    on the MXU; the epilogue (dequant + zero-point correction via the
    kernel column sums + bias + ReLU + next-grid requant) is one fused
    multiply-add-round-clip; depth-to-space runs on the int8 tensors
    (pure data movement). Padding uses the real-zero code -128 with
    VALID convs, which is also exactly the zero padding the polyphase
    equivalence requires (decode_fast.py derivation).
    """
    x = jnp.concatenate([f_spatial, f_temporal], axis=-1).astype(jnp.float32)
    names = ["fuse"] + [f"up{i + 1}" for i in range(qt.num_blocks)] + ["out"]
    sx = qt.act_scales["fuse"]
    xq = (jnp.clip(jnp.round(x / sx), 0, 255) - _ZP).astype(jnp.int8)
    for li, name in enumerate(names):
        sx = qt.act_scales[name]
        k = qt.kernels[name]
        col = qt.col_sums[name]
        if k.shape[0] == 1:  # 1x1 fuse / out conv — no padding needed
            acc = jax.lax.conv_general_dilated(
                xq, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        else:  # 2x2 polyphase conv over the once-padded input
            xp = jnp.pad(
                xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=np.int8(-_ZP),
            )
            acc = jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        sw = sx * qt.w_scales[name]
        if name == "out":
            xf = (acc.astype(jnp.float32) + _ZP * col) * sw + qt.biases[name]
            return jax.nn.sigmoid(xf)[..., 0]
        sn = qt.act_scales[names[li + 1]]
        a = sw / sn
        c = (qt.biases[name] / sn - _ZP) + (_ZP * col) * a
        xq = jnp.clip(
            jnp.round(acc.astype(jnp.float32) * a + c), -128, 127
        ).astype(jnp.int8)
        if name.startswith("up"):
            xq = _depth_to_space_offset(xq, xq.shape[-1] // 4)


jax.tree_util.register_dataclass(
    QuantTail,
    data_fields=["kernels", "w_scales", "biases", "act_scales", "col_sums"],
    meta_fields=["num_blocks"],
)
