"""int8 post-training quantization of the SP VGG streams.

The SP two-stream forward is ~71% of the fused serving step
(tools/profile_pipeline.py), and on v5e an int8 3x3 conv runs ~2.9x
faster than bf16 (the MXU's int8 path has twice the MAC throughput and
half the operand bandwidth). This module quantizes ONLY the two VGG16
encoders — the fuse/decoder/LF tail stays in the pipeline dtype: it is
~20% of the step, and BN/sigmoid heads are the numerically delicate
parts.

Scheme (standard symmetric PTQ):
  - weights: per-output-channel int8, scale = max|w| / 127 per channel;
  - activations: per-layer per-tensor int8, scales CALIBRATED by running
    representative batches through the f32 VGG and recording max|x|
    (post-ReLU activations are nonnegative, so symmetric signed int8
    spends one bit on the empty negative range — the usual PTQ cost);
  - conv accumulates in int32 on the MXU (preferred_element_type), then
    dequantize + bias + ReLU run fused on the VPU, and the result
    requantizes to int8 for the next layer.

The reference has no quantized path (research code, SURVEY.md §1); this
is a TPU-deployment feature measured against the trained checkpoints:
see docs/STATUS.md for the throughput/accuracy numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.models.vgg import VGG16_STAGES

_LAYERS: Tuple[str, ...] = tuple(
    f"conv{s + 1}_{i + 1}"
    for s, stage in enumerate(VGG16_STAGES)
    for i in range(len(stage))
)


@dataclasses.dataclass(frozen=True)
class QuantVGG:
    """Quantized parameters + calibrated activation scales of one stream."""

    kernels: Dict[str, jnp.ndarray]   # int8 HWIO
    w_scales: Dict[str, jnp.ndarray]  # (O,) f32 per-output-channel
    biases: Dict[str, jnp.ndarray]    # (O,) f32
    act_scales: Dict[str, jnp.ndarray]  # () f32 input scale per layer


def quantize_vgg_params(params: Dict[str, Any]) -> Tuple[
    Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]
]:
    """Per-output-channel symmetric int8 quantization of VGG conv kernels."""
    kernels, scales, biases = {}, {}, {}
    for name in _LAYERS:
        k = np.asarray(params[name]["kernel"], np.float32)  # (h, w, I, O)
        s = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
        s = np.maximum(s, 1e-12)
        q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
        kernels[name] = jnp.asarray(q)
        scales[name] = jnp.asarray(s)
        biases[name] = jnp.asarray(np.asarray(params[name]["bias"], np.float32))
    return kernels, scales, biases


def vgg_forward_with_maxes(
    params: Dict[str, Any], x: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """f32 VGG forward that also returns max|input| per conv layer —
    the calibration observable for activation scales."""
    from flax.linen import max_pool

    maxes: Dict[str, jnp.ndarray] = {}
    li = 0
    for s, stage in enumerate(VGG16_STAGES):
        for _ in stage:
            name = _LAYERS[li]
            li += 1
            maxes[name] = jnp.max(jnp.abs(x))
            k = params[name]["kernel"].astype(jnp.float32)
            b = params[name]["bias"].astype(jnp.float32)
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.relu(x)
        if s < len(VGG16_STAGES) - 1:
            x = max_pool(x, window_shape=(2, 2), strides=(2, 2))
    return x, maxes


def calibrate_vgg(
    params: Dict[str, Any], batches: List[np.ndarray], margin: float = 1.0
) -> Dict[str, jnp.ndarray]:
    """Run representative batches through the f32 stream; return per-layer
    symmetric activation scales (max|x| * margin / 127)."""
    if not batches:
        raise ValueError("PTQ calibration needs at least one batch")
    fn = jax.jit(lambda x: vgg_forward_with_maxes(params, x)[1])
    agg: Dict[str, float] = {}
    for b in batches:
        m = jax.device_get(fn(jnp.asarray(b, jnp.float32)))
        for k, v in m.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    return {
        k: jnp.asarray(max(v, 1e-12) * margin / 127.0, jnp.float32)
        for k, v in agg.items()
    }


def build_quant_vgg(
    params: Dict[str, Any], act_scales: Dict[str, jnp.ndarray]
) -> QuantVGG:
    kernels, w_scales, biases = quantize_vgg_params(params)
    return QuantVGG(kernels=kernels, w_scales=w_scales, biases=biases,
                    act_scales=dict(act_scales))


def quant_vgg_forward(q: QuantVGG, x: jnp.ndarray) -> jnp.ndarray:
    """int8 VGG16 forward: f32 NHWC input -> f32 conv5 features.

    int8-RESIDENT chain: each conv accumulates in int32 on the MXU and
    its epilogue writes the next layer's int8 input directly —
    dequant, bias, ReLU and the next requant fold into one fused
    multiply-add-round-clip (ReLU folds into the clip's lower bound 0,
    valid because scales are positive), so intermediate activations
    cross HBM as int8 (4x less traffic than f32 intermediates).
    Max-pooling runs on the int8 tensors (max commutes with the
    positive-scale quantization). Only conv5_3 dequantizes to f32.
    Numerics match the naive dequant->requant scheme up to float
    associativity in the folded scale.
    """
    from flax.linen import max_pool

    x = x.astype(jnp.float32)
    sx0 = q.act_scales[_LAYERS[0]]
    xq = jnp.clip(jnp.round(x / sx0), -127, 127).astype(jnp.int8)
    li = 0
    for s, stage in enumerate(VGG16_STAGES):
        for _ in stage:
            name = _LAYERS[li]
            li += 1
            sx = q.act_scales[name]
            acc = jax.lax.conv_general_dilated(
                xq, q.kernels[name], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            if li < len(_LAYERS):
                # Fused epilogue into the NEXT layer's int8 grid.
                sn = q.act_scales[_LAYERS[li]]
                a = (sx * q.w_scales[name]) / sn
                c = q.biases[name] / sn
                xq = jnp.clip(
                    jnp.round(acc.astype(jnp.float32) * a + c), 0, 127
                ).astype(jnp.int8)
            else:  # conv5_3: dequantize for the f32/bf16 consumers
                xf = acc.astype(jnp.float32) * (sx * q.w_scales[name])
                xf = jax.nn.relu(xf + q.biases[name])
        if s < len(VGG16_STAGES) - 1:
            xq = max_pool(xq, window_shape=(2, 2), strides=(2, 2))
    return xf


@dataclasses.dataclass(frozen=True)
class QuantSP:
    """Quantized two-stream bundle (spatial + temporal encoders)."""

    spatial: QuantVGG
    temporal: QuantVGG


def calibrate_sp(
    sp_params: Dict[str, Any],
    rgb_batches: List[np.ndarray],
    flow_batches: List[np.ndarray],
    margin: float = 1.0,
) -> QuantSP:
    """Calibrate + quantize both SP encoder streams from representative
    (already preprocessed/normalized) rgb and flow inputs."""
    return QuantSP(
        spatial=build_quant_vgg(
            sp_params["spatial"],
            calibrate_vgg(sp_params["spatial"], rgb_batches, margin),
        ),
        temporal=build_quant_vgg(
            sp_params["temporal"],
            calibrate_vgg(sp_params["temporal"], flow_batches, margin),
        ),
    )


def calibrate_pipeline_sp(
    pipeline, variables: Dict[str, Any], frame_pairs, margin: float = 1.0
) -> QuantSP:
    """Calibrate from RAW uint8 frame pairs via the pipeline's own
    preprocessing (resize/normalize + TV-L1 — or the precomputed flow
    image when one is supplied), so activation scales see exactly the
    serving input distribution. Feeding TV-L1 statistics to a stream
    that will serve dense_flow JPEGs (or vice versa) would silently
    mis-scale the temporal activations.

    frame_pairs: iterable of (prev_u8, cur_u8) or
      (prev_u8, cur_u8, flow_img_u8_or_None) (B, H, W, C) arrays.
    """
    if not frame_pairs:
        raise ValueError("PTQ calibration needs at least one frame pair")
    rgb_b, flow_b = [], []
    for pair in frame_pairs:
        prev, cur = pair[0], pair[1]
        fl = pair[2] if len(pair) > 2 else None
        r, f = jax.jit(pipeline.preprocess_pair)(
            jnp.asarray(prev), jnp.asarray(cur),
            None if fl is None else jnp.asarray(fl),
        )
        rgb_b.append(np.asarray(r, np.float32))
        flow_b.append(np.asarray(f, np.float32))
    return calibrate_sp(variables["sp"]["params"], rgb_b, flow_b, margin)


jax.tree_util.register_dataclass(
    QuantVGG,
    data_fields=["kernels", "w_scales", "biases", "act_scales"],
    meta_fields=[],
)
jax.tree_util.register_dataclass(
    QuantSP, data_fields=["spatial", "temporal"], meta_fields=[]
)
