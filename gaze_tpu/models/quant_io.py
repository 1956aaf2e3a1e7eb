"""Persistence for calibrated int8 bundles (QuantSP / QuantVGG / QuantTail).

PTQ calibration needs the f32 weights plus representative batches and a
handful of forward passes — none of which a serving process should
repeat on every restart (and a deployment host may not even have the
training data). A saved bundle is the int8 deployment artifact: load it
and serve.

Format: a single ``.npz`` with flat dotted keys
(``spatial.kernels.conv1_1``, ``tail.w_scales.up2``, ...). The bf16
mixed-stem kernel is stored as f32 (npz has no bfloat16) and cast back
on load — exact, since the stem is itself a bf16 cast of f32 params.
Round-trips are bit-exact for every int8/f32 array (pinned in
tests/test_quant_io.py).

The reference has no quantized path at all (research code, SURVEY.md
§1); this is TPU-deployment infrastructure.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from gaze_tpu.models.quant import QuantSP, QuantVGG

_VGG_DICTS = ("kernels", "w_scales", "biases", "act_scales", "col_sums")
_TAIL_DICTS = ("kernels", "w_scales", "biases", "act_scales", "col_sums")
_VERSION = 1


def _flatten_vgg(prefix: str, q: QuantVGG, out: Dict[str, np.ndarray]) -> None:
    for field in _VGG_DICTS:
        for k, v in getattr(q, field).items():
            out[f"{prefix}.{field}.{k}"] = np.asarray(v)
    if q.stem_kernel is not None:
        out[f"{prefix}.stem_kernel"] = np.asarray(q.stem_kernel, np.float32)
        out[f"{prefix}.stem_bias"] = np.asarray(q.stem_bias, np.float32)


def _unflatten_vgg(prefix: str, data: Dict[str, np.ndarray]) -> QuantVGG:
    fields: Dict[str, Dict[str, jnp.ndarray]] = {f: {} for f in _VGG_DICTS}
    stem_k = stem_b = None
    plen = len(prefix) + 1
    for key, v in data.items():
        if not key.startswith(prefix + "."):
            continue
        rest = key[plen:]
        if rest == "stem_kernel":
            stem_k = jnp.asarray(v, jnp.bfloat16)
        elif rest == "stem_bias":
            stem_b = jnp.asarray(v, jnp.float32)
        else:
            field, name = rest.split(".", 1)
            fields[field][name] = jnp.asarray(v)
    return QuantVGG(
        kernels=fields["kernels"], w_scales=fields["w_scales"],
        biases=fields["biases"], act_scales=fields["act_scales"],
        col_sums=fields["col_sums"], stem_kernel=stem_k, stem_bias=stem_b,
    )


def save_quant_sp(path: str, qsp: QuantSP) -> None:
    """Write a calibrated QuantSP to ``path`` (.npz appended if absent)."""
    out: Dict[str, np.ndarray] = {"meta.version": np.int64(_VERSION)}
    _flatten_vgg("spatial", qsp.spatial, out)
    _flatten_vgg("temporal", qsp.temporal, out)
    if qsp.tail is not None:
        for field in _TAIL_DICTS:
            for k, v in getattr(qsp.tail, field).items():
                out[f"tail.{field}.{k}"] = np.asarray(v)
        out["tail.num_blocks"] = np.int64(qsp.tail.num_blocks)
    np.savez(path, **out)


def load_quant_sp(path: str) -> QuantSP:
    """Load a QuantSP bundle written by :func:`save_quant_sp`."""
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    version = int(data.pop("meta.version", 0))
    if version != _VERSION:
        raise ValueError(
            f"unsupported quant bundle version {version} in {path!r} "
            f"(expected {_VERSION})"
        )
    tail = None
    if any(k.startswith("tail.") for k in data):
        from gaze_tpu.models.quant_tail import QuantTail

        fields: Dict[str, Dict[str, jnp.ndarray]] = {
            f: {} for f in _TAIL_DICTS
        }
        num_blocks: Optional[int] = None
        for key, v in data.items():
            if not key.startswith("tail."):
                continue
            rest = key[len("tail."):]
            if rest == "num_blocks":
                num_blocks = int(v)
            else:
                field, name = rest.split(".", 1)
                fields[field][name] = jnp.asarray(v)
        tail = QuantTail(
            kernels=fields["kernels"], w_scales=fields["w_scales"],
            biases=fields["biases"], act_scales=fields["act_scales"],
            col_sums=fields["col_sums"], num_blocks=num_blocks,
        )
    return QuantSP(
        spatial=_unflatten_vgg("spatial", data),
        temporal=_unflatten_vgg("temporal", data),
        tail=tail,
    )
