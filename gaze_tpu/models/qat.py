"""Quantization-aware training (QAT) for the SP VGG streams.

PTQ (models/quant.py) quantizes the trained f32 streams after the fact;
QAT fine-tunes the stream weights THROUGH the deployment quantizer so
the weights adapt to the int8 grid. The fake-quant forward here mirrors
the deployed integer chain op for op:

  - weights: per-output-channel symmetric int8 (scale = max|w|/127,
    recomputed from the live weights each step — exactly how deployment
    quantizes the final weights);
  - activations: FIXED calibrated per-layer scales (the same
    ``calibrate_vgg`` bounds deployment uses). First layer input signed
    [-127, 127]; every interior activation on the unsigned [0, 255]
    grid. The deployed epilogue's ReLU folds into the clip's lower
    bound, so the fake-quant epilogue is one round+clip — no separate
    relu;
  - max-pool runs on the fake-quantized values (max commutes with the
    monotone dequant, same as the int8-resident deployed chain).

Gradients use the clipped straight-through estimator: identity inside
the representable range, zero outside (the clip is real saturation);
quantizer scales are stop-gradient.

The reference has no quantized path at all (research code, SURVEY.md
§1); QAT is TPU-deployment infrastructure layered on the PTQ serving
path so the int8 MXU throughput costs as little accuracy as possible on
real data. Deployment consumes a QAT checkpoint through the normal PTQ
machinery — `build_quant_vgg` + the scales this module trained against
(persisted via ``save_act_scales``/``load_act_scales``).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.models.quant import _LAYERS
from gaze_tpu.models.vgg import VGG16_STAGES


def _ste_fake_quant(x: jnp.ndarray, scale: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Quantize to ``scale * clip(round(x / scale), lo, hi)`` with the
    clipped straight-through estimator: gradient 1 where x lands inside
    the representable range, 0 where the clip saturates."""
    s = jax.lax.stop_gradient(scale)
    q = jnp.clip(jnp.round(x / s), lo, hi) * s
    x_c = jnp.clip(x, lo * s, hi * s)  # gradient: 1 inside, 0 outside
    return x_c + jax.lax.stop_gradient(q - x_c)


def fake_quant_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric int8 fake-quant of an HWIO kernel,
    scales recomputed from the live weights (deployment parity)."""
    s = jnp.max(jnp.abs(k), axis=(0, 1, 2), keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return _ste_fake_quant(k, s, -127, 127)


def qat_vgg_forward(
    params: Dict[str, Any], act_scales: Dict[str, jnp.ndarray], x: jnp.ndarray
) -> jnp.ndarray:
    """Differentiable twin of ``quant.quant_vgg_forward``: f32 NHWC input
    -> f32 conv5 features, every tensor constrained to the deployed int8
    grids. Same layer chain as the deployed path (conv -> bias ->
    [relu-folded] requant; pools between stages; conv5_3 output plain
    relu in f32)."""
    from flax.linen import max_pool

    x = x.astype(jnp.float32)
    x = _ste_fake_quant(x, act_scales[_LAYERS[0]], -127, 127)
    li = 0
    for s, stage in enumerate(VGG16_STAGES):
        for _ in stage:
            name = _LAYERS[li]
            li += 1
            k = fake_quant_kernel(params[name]["kernel"].astype(jnp.float32))
            b = params[name]["bias"].astype(jnp.float32)
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            if li < len(_LAYERS):
                # Deployed epilogue: clip(round(y/sn), 0, 255) — the
                # lower clip IS the relu on the unsigned grid.
                x = _ste_fake_quant(y, act_scales[_LAYERS[li]], 0, 255)
            else:
                x = jax.nn.relu(y)
        if s < len(VGG16_STAGES) - 1:
            x = max_pool(x, window_shape=(2, 2), strides=(2, 2))
    return x


_SCALES_FILE = "qat_act_scales.npz"


def save_act_scales(ckpt_dir: str, scales: Dict[str, Dict[str, jnp.ndarray]]) -> str:
    """Persist the activation scales QAT trained against next to the
    checkpoint, so deployment quantizes with the SAME grids instead of
    recalibrating (a shifted scale would undo the weight adaptation)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, _SCALES_FILE)
    flat = {
        f"{stream}/{layer}": np.asarray(v, np.float32)
        for stream, d in scales.items()
        for layer, v in d.items()
    }
    np.savez(path, **flat)
    return path


def load_act_scales(ckpt_dir: str) -> Dict[str, Dict[str, jnp.ndarray]] | None:
    """Load persisted QAT activation scales; None if absent."""
    path = os.path.join(ckpt_dir, _SCALES_FILE)
    if not os.path.exists(path):
        return None
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    with np.load(path) as z:
        for key in z.files:
            stream, layer = key.split("/", 1)
            out.setdefault(stream, {})[layer] = jnp.asarray(z[key])
    return out
