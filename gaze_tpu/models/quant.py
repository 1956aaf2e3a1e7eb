"""int8 post-training quantization of the SP VGG streams.

The SP two-stream forward is ~71% of the fused serving step
(tools/profile_pipeline.py), and on v5e an int8 3x3 conv runs ~2.9x
faster than bf16 (the MXU's int8 path has twice the MAC throughput and
half the operand bandwidth). This module quantizes ONLY the two VGG16
encoders — the fuse/decoder/LF tail stays in the pipeline dtype: it is
~20% of the step, and BN/sigmoid heads are the numerically delicate
parts.

Scheme (asymmetric activations, symmetric weights):
  - weights: per-output-channel int8, scale = max|w| / 127 per channel;
  - activations: the first layer's input (normalized RGB/flow, signed)
    is symmetric signed int8 (zero-point 0, scale = bound/127). Every
    INTERIOR activation is post-ReLU and therefore nonnegative, so it
    uses the full unsigned [0, 255] grid (scale = bound/255 — half the
    quantization step of the signed grid) stored as int8 with
    zero-point 128 (stored value = q - 128). The zero-point folds into
    the conv bias via precomputed per-output-channel weight column sums
    (sum of the int8 kernel over h,w,in), so the MXU still sees a plain
    s8 x s8 -> s32 convolution;
  - SAME padding must inject REAL zeros: on the zero-point-128 grid the
    real-zero code is stored -128, so interior convs pad explicitly
    (jnp.pad constant_values=-128) and convolve VALID — exact, and the
    pad fuses into the conv's input read;
  - activation bounds are CALIBRATED by running representative batches
    through the f32 VGG, recording either max|x| (default) or an upper
    percentile of |x| (outlier-robust; the max over per-batch
    percentiles is kept so coverage cannot collapse on a quiet batch);
  - conv accumulates in int32 on the MXU (preferred_element_type), then
    dequantize + zero-point-bias + ReLU + next-layer requantize run as
    ONE fused multiply-add-round-clip on the VPU (ReLU folds into the
    clip's lower bound), and the result stays int8 in HBM.

The reference has no quantized path (research code, SURVEY.md §1); this
is a TPU-deployment feature measured against the trained checkpoints:
see docs/STATUS.md for the throughput/accuracy numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.models.vgg import VGG16_STAGES

_LAYERS: Tuple[str, ...] = tuple(
    f"conv{s + 1}_{i + 1}"
    for s, stage in enumerate(VGG16_STAGES)
    for i in range(len(stage))
)

# Zero point of every interior (post-ReLU) activation grid; the first
# layer's signed input uses zero point 0. Stored int8 = q - _ZP.
_ZP = 128


@dataclasses.dataclass(frozen=True)
class QuantVGG:
    """Quantized parameters + calibrated activation scales of one stream.

    ``stem_kernel``/``stem_bias`` non-None selects the MIXED stem: conv1_1
    runs in bf16 straight off the float input (no input quantization) and
    its epilogue requantizes into conv1_2's unsigned grid. Measured on
    v5e (tools/bench_sp_layers.py, B=128): the int8 conv1_1 is ~1.1 ms
    SLOWER than bf16 — its contraction depth is 27 (3x3x3 taps), a sliver
    of the MXU's int8 granule, so int8 buys no MAC throughput there and
    the input round/clip is pure overhead. Every interior conv (depth
    >= 576) keeps the int8 win. The bf16 stem is also more accurate (no
    input-grid rounding)."""

    kernels: Dict[str, jnp.ndarray]   # int8 HWIO
    w_scales: Dict[str, jnp.ndarray]  # (O,) f32 per-output-channel
    biases: Dict[str, jnp.ndarray]    # (O,) f32
    act_scales: Dict[str, jnp.ndarray]  # () f32 input scale per layer
    col_sums: Dict[str, jnp.ndarray]  # (O,) f32 sum of int8 kernel over h,w,i
    stem_kernel: Optional[jnp.ndarray] = None  # bf16 HWIO conv1_1 (mixed stem)
    stem_bias: Optional[jnp.ndarray] = None    # (O,) f32


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
    params: Dict[str, Any], x: jnp.ndarray, percentile: Optional[float] = None
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """f32 VGG forward that also returns the per-conv-layer input bound —
    max|input| by default, or the given upper percentile of |input|
    (e.g. 99.9) for outlier-robust calibration."""
    from flax.linen import max_pool

    bounds: Dict[str, jnp.ndarray] = {}
    li = 0
    for s, stage in enumerate(VGG16_STAGES):
        for _ in stage:
            name = _LAYERS[li]
            li += 1
            a = jnp.abs(x)
            bounds[name] = (
                jnp.max(a) if percentile is None
                else jnp.percentile(a.ravel(), percentile)
            )
            k = params[name]["kernel"].astype(jnp.float32)
            b = params[name]["bias"].astype(jnp.float32)
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.relu(x)
        if s < len(VGG16_STAGES) - 1:
            x = max_pool(x, window_shape=(2, 2), strides=(2, 2))
    return x, bounds


def calibrate_vgg(
    params: Dict[str, Any],
    batches: List[np.ndarray],
    margin: float = 1.0,
    percentile: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Run representative batches through the f32 stream; return per-layer
    activation scales.

    The recorded bound is max|x| (default) or the upper ``percentile`` of
    |x| per batch, aggregated by max over batches. The first layer's
    signed input gets the symmetric grid (bound/127); interior post-ReLU
    inputs get the full unsigned [0,255] grid (bound/255)."""
    if not batches:
        raise ValueError("PTQ calibration needs at least one batch")
    fn = jax.jit(lambda x: vgg_forward_with_maxes(params, x, percentile)[1])
    agg: Dict[str, float] = {}
    for b in batches:
        m = jax.device_get(fn(jnp.asarray(b, jnp.float32)))
        for k, v in m.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    return {
        k: jnp.asarray(
            max(v, 1e-12) * margin / (127.0 if k == _LAYERS[0] else 255.0),
            jnp.float32,
        )
        for k, v in agg.items()
    }


def build_quant_vgg(
    params: Dict[str, Any], act_scales: Dict[str, jnp.ndarray],
    bf16_stem: bool = False,
) -> QuantVGG:
    kernels, w_scales, biases = quantize_vgg_params(params)
    col_sums = {
        name: jnp.sum(k.astype(jnp.float32), axis=(0, 1, 2))
        for name, k in kernels.items()
    }
    stem_k = stem_b = None
    if bf16_stem:
        stem_k = jnp.asarray(params[_LAYERS[0]]["kernel"], jnp.bfloat16)
        stem_b = jnp.asarray(params[_LAYERS[0]]["bias"], jnp.float32)
    return QuantVGG(kernels=kernels, w_scales=w_scales, biases=biases,
                    act_scales=dict(act_scales), col_sums=col_sums,
                    stem_kernel=stem_k, stem_bias=stem_b)


def _stage_taps(q: QuantVGG, names: Tuple[str, ...]):
    """ConvTaps (ops/pallas/conv_int8.py) for a run of interior layers:
    the same per-channel requant algebra as the XLA loop below, folded
    into (k9, a, c) so the Pallas chain is bit-identical."""
    from gaze_tpu.ops.pallas.conv_int8 import ConvTap

    taps = []
    for name in names:
        li = _LAYERS.index(name)
        sx, sn = q.act_scales[name], q.act_scales[_LAYERS[li + 1]]
        a = (sx * q.w_scales[name]) / sn
        c = (q.biases[name] / sn - _ZP) + (_ZP * q.col_sums[name]) * a
        k = q.kernels[name]
        taps.append(ConvTap(
            k9=k.reshape(9, k.shape[2], k.shape[3]),
            a=a[None].astype(jnp.float32),
            c=c[None].astype(jnp.float32),
        ))
    return taps


def quant_vgg_forward(
    q: QuantVGG, x: jnp.ndarray, conv_impl: str = "xla"
) -> jnp.ndarray:
    """int8 VGG16 forward: f32 NHWC input -> f32 conv5 features.

    ``conv_impl="pallas"`` routes the deep interior stages (conv3_1..
    conv5_2 — every layer with 128-multiple channels except the
    dequantizing conv5_3) through the implicit-im2col Pallas chain
    (ops/pallas/conv_int8.py) when running on TPU; bit-identical to the
    XLA loop but measured SLOWER in chain on v5e (stream 18.0 vs 14.05
    ms — see the kernel module's negative-result note), so "xla" stays
    the default. Other backends fall back to XLA silently (same
    numerics, matching the use_pallas_warp convention in ops/tvl1.py).

    int8-RESIDENT chain: each conv accumulates in int32 on the MXU and
    its epilogue writes the next layer's int8 input directly — dequant,
    zero-point bias (128 * col_sum, exact on the asymmetric grid), conv
    bias, ReLU and the next requant fold into one fused
    multiply-add-round-clip (ReLU folds into the clip, valid because
    scales are positive), so intermediate activations cross HBM as int8
    (4x less traffic than f32 intermediates). Interior convs pad
    explicitly with the real-zero code -128 and run VALID so SAME
    padding stays exact on the shifted grid. Max-pooling runs on the
    int8 tensors (max commutes with the monotone affine dequant). Only
    conv5_3 dequantizes to f32. Numerics match the naive
    dequant->requant scheme up to float associativity in the folded
    scale.
    """
    from flax.linen import max_pool

    x = x.astype(jnp.float32)
    if q.stem_kernel is None:
        sx0 = q.act_scales[_LAYERS[0]]
        # First layer input: signed data, symmetric grid, zero point 0 —
        # SAME zero-padding is exact here.
        xq = jnp.clip(jnp.round(x / sx0), -127, 127).astype(jnp.int8)
        zp = 0
    use_pallas = conv_impl == "pallas" and jax.default_backend() == "tpu"
    li = 0
    for s, stage in enumerate(VGG16_STAGES):
        consumed = 0
        if use_pallas and s >= 2:
            # Deep interior stages as one Pallas chain per stage (the
            # stage's intermediate canvases never leave VMEM); the
            # dequantizing final layer (conv5_3) stays on the XLA body.
            from gaze_tpu.ops.pallas.conv_int8 import conv3x3_int8_chain

            end = li + len(stage)
            chain = _LAYERS[li:end if end < len(_LAYERS) else end - 1]
            if chain:
                xq = conv3x3_int8_chain(xq, _stage_taps(q, tuple(chain)))
                li += len(chain)
                consumed = len(chain)
        for _ in range(len(stage) - consumed):
            name = _LAYERS[li]
            li += 1
            if li == 1 and q.stem_kernel is not None:
                # Mixed stem: conv1_1 in bf16 off the unquantized input
                # (contraction depth 27 — too shallow for the int8 MXU
                # path to win; see the class docstring), f32 accumulate,
                # then the same fused bias+ReLU+requant epilogue into
                # conv1_2's unsigned grid.
                acc = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), q.stem_kernel, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                sn = q.act_scales[_LAYERS[1]]
                xq = jnp.clip(
                    jnp.round(acc / sn + (q.stem_bias / sn - _ZP)),
                    -128, 127,
                ).astype(jnp.int8)
                zp = _ZP
                continue
            sx = q.act_scales[name]
            if zp == 0:
                acc = jax.lax.conv_general_dilated(
                    xq, q.kernels[name], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
            else:
                # Asymmetric grid: real zero is stored -128, so pad with
                # that code and convolve VALID (all VGG convs are 3x3).
                xp = jnp.pad(
                    xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=np.int8(-_ZP),
                )
                acc = jax.lax.conv_general_dilated(
                    xp, q.kernels[name], (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
            # True accumulator on the real scale:
            #   sx * w_scale * (acc + zp * col_sum)
            # (zp * col_sum corrects the stored -zp offset; exact because
            # padding taps carry the real-zero code).
            zp_bias = (zp * q.col_sums[name]) if zp else 0.0
            if li < len(_LAYERS):
                # Fused epilogue into the NEXT layer's asymmetric grid:
                # q' = clip(round(y/sn), 0, 255), stored q' - 128.
                sn = q.act_scales[_LAYERS[li]]
                a = (sx * q.w_scales[name]) / sn
                c = (q.biases[name] / sn - _ZP) + zp_bias * a
                xq = jnp.clip(
                    jnp.round(acc.astype(jnp.float32) * a + c), -128, 127
                ).astype(jnp.int8)
                zp = _ZP
            else:  # conv5_3: dequantize for the f32/bf16 consumers
                sw = sx * q.w_scales[name]
                xf = (acc.astype(jnp.float32) + zp_bias) * sw
                xf = jax.nn.relu(xf + q.biases[name])
        if s < len(VGG16_STAGES) - 1:
            xq = max_pool(xq, window_shape=(2, 2), strides=(2, 2))
    return xf


@dataclasses.dataclass(frozen=True)
class QuantSP:
    """Quantized two-stream bundle (spatial + temporal encoders), plus
    an optional int8 fuse/decoder tail (models/quant_tail.py) — when
    set, the ENTIRE saliency head runs int8-resident."""

    spatial: QuantVGG
    temporal: QuantVGG
    tail: Any = None  # Optional[quant_tail.QuantTail]


def calibrate_sp(
    sp_params: Dict[str, Any],
    rgb_batches: List[np.ndarray],
    flow_batches: List[np.ndarray],
    margin: float = 1.0,
    percentile: Optional[float] = None,
    sp_variables: Optional[Dict[str, Any]] = None,
    tail_cfg: Any = None,
    bf16_stem: bool = False,
) -> QuantSP:
    """Calibrate + quantize both SP encoder streams from representative
    (already preprocessed/normalized) rgb and flow inputs.

    With ``sp_variables`` + ``tail_cfg`` (an SPConfig), also calibrates
    the int8 fuse/decoder tail (models/quant_tail.py) — on the features
    the QUANTIZED streams emit for the same batches, i.e. exactly the
    tail's serving input distribution."""
    spatial = build_quant_vgg(
        sp_params["spatial"],
        calibrate_vgg(sp_params["spatial"], rgb_batches, margin, percentile),
        bf16_stem=bf16_stem,
    )
    temporal = build_quant_vgg(
        sp_params["temporal"],
        calibrate_vgg(sp_params["temporal"], flow_batches, margin, percentile),
        bf16_stem=bf16_stem,
    )
    tail = None
    if tail_cfg is not None:
        from gaze_tpu.models.quant_tail import calibrate_tail

        if sp_variables is None:
            raise ValueError("tail calibration needs the full sp_variables "
                             "(params + batch_stats for the BN fold)")
        feat = jax.jit(
            lambda r, f: jnp.concatenate(
                [quant_vgg_forward(spatial, r), quant_vgg_forward(temporal, f)],
                axis=-1,
            )
        )
        feature_batches = [
            np.asarray(feat(jnp.asarray(r), jnp.asarray(f)), np.float32)
            for r, f in zip(rgb_batches, flow_batches)
        ]
        tail = calibrate_tail(
            sp_variables, tail_cfg, feature_batches, margin, percentile
        )
    return QuantSP(spatial=spatial, temporal=temporal, tail=tail)


def calibrate_pipeline_sp(
    pipeline, variables: Dict[str, Any], frame_pairs, margin: float = 1.0,
    percentile: Optional[float] = None, quant_tail: bool = False,
    bf16_stem: bool = False,
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
    # One jit reused across pairs — wrapping inside the loop would
    # retrace (and re-invoke the ~5-9 s relay compile service) per batch.
    pre = jax.jit(pipeline.preprocess_pair)
    for pair in frame_pairs:
        prev, cur = pair[0], pair[1]
        fl = pair[2] if len(pair) > 2 else None
        r, f = pre(
            jnp.asarray(prev), jnp.asarray(cur),
            None if fl is None else jnp.asarray(fl),
        )
        rgb_b.append(np.asarray(r, np.float32))
        flow_b.append(np.asarray(f, np.float32))
    return calibrate_sp(
        variables["sp"]["params"], rgb_b, flow_b, margin, percentile,
        sp_variables=variables["sp"] if quant_tail else None,
        tail_cfg=pipeline.config.sp if quant_tail else None,
        bf16_stem=bf16_stem,
    )


jax.tree_util.register_dataclass(
    QuantVGG,
    data_fields=["kernels", "w_scales", "biases", "act_scales", "col_sums",
                 "stem_kernel", "stem_bias"],
    meta_fields=[],
)
jax.tree_util.register_dataclass(
    QuantSP, data_fields=["spatial", "temporal", "tail"], meta_fields=[]
)
