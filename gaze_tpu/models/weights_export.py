"""flax -> PyTorch state-dict export (the inverse of weights_io).

Closes the parity loop in the other direction: weights trained by this
framework can be loaded into reference-shaped torch modules and
validated inside the reference's own harness (ref:SP.py / ref:AT.py /
ref:LF.py load ``state_dict`` checkpoints [M] — SURVEY.md §2
"Checkpointing"). The upstream module attribute names are unverifiable
(empty reference mount, SURVEY.md §0), so keys use THIS repo's stable
layer names; mapping them onto the reference is a pure key-rename once
the mount exists. Tensor conventions are torch-native:

- Conv2d weight: OIHW (flax HWIO kernel transposed (3, 2, 0, 1)).
- ConvTranspose2d weight: (I, O, kh, kw) with the spatial taps FLIPPED:
  torch's transposed conv is the gradient of a cross-correlation (a true
  convolution of the dilated input), while flax/lax ``conv_transpose``
  cross-correlates the dilated input with the kernel as stored — the
  flip converts between the two. Equivalence is asserted against real
  ``torch.nn.functional`` forwards in tests/test_weights_export.py.
- BatchNorm: scale/bias -> weight/bias, batch_stats mean/var ->
  running_mean/running_var (eval-mode semantics; both default eps=1e-5).
- LSTM: flax ``OptimizedLSTMCell`` keeps one Dense per gate (ii/if/ig/io
  input projections, bias-free; hi/hf/hg/ho hidden projections with
  bias); torch packs rows in (i, f, g, o) order — the same order — so
  ``weight_ih_l{k}`` is the stacked transposed input kernels,
  ``bias_ih_l{k}`` is zero, and the flax biases land in ``bias_hh_l{k}``.
- Linear: weight = kernel.T.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_GATES = ("i", "f", "g", "o")


def _np(x) -> np.ndarray:
    # Writable owned copy: np.asarray of a jax array is a read-only view,
    # which torch.from_numpy rejects (warns) downstream.
    return np.array(x, dtype=np.float32)


def _conv(out: Dict[str, np.ndarray], key: str, p: Dict[str, Any]) -> None:
    out[f"{key}.weight"] = np.ascontiguousarray(
        _np(p["kernel"]).transpose(3, 2, 0, 1)
    )
    out[f"{key}.bias"] = _np(p["bias"])


def _deconv(out: Dict[str, np.ndarray], key: str, p: Dict[str, Any]) -> None:
    w = _np(p["kernel"]).transpose(2, 3, 0, 1)  # (I, O, kh, kw)
    out[f"{key}.weight"] = w[:, :, ::-1, ::-1].copy()
    out[f"{key}.bias"] = _np(p["bias"])


def _bn(
    out: Dict[str, np.ndarray], key: str, p: Dict[str, Any], stats: Dict[str, Any]
) -> None:
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])
    out[f"{key}.running_mean"] = _np(stats["mean"])
    out[f"{key}.running_var"] = _np(stats["var"])


def sp_to_torch_state(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """SPNet variables ({params, batch_stats}) -> torch state dict.

    Keys: ``spatial.conv{s}_{i}.*``, ``temporal.conv{s}_{i}.*``,
    ``fuse_conv.*``, ``decoder.deconv{n}.*``, ``decoder.bn{n}.*``,
    ``decoder.out_conv.*``.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for stream in ("spatial", "temporal"):
        for name, p in params[stream].items():
            _conv(out, f"{stream}.{name}", p)
    _conv(out, "fuse_conv", params["fuse_conv"])
    dec = params["decoder"]
    dec_stats = stats.get("decoder", {})
    for name, p in dec.items():
        if name.startswith("deconv"):
            _deconv(out, f"decoder.{name}", p)
        elif name.startswith("bn"):
            _bn(out, f"decoder.{name}", p, dec_stats[name])
        else:  # out_conv
            _conv(out, f"decoder.{name}", p)
    return out


def at_to_torch_state(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """LSTMNet variables -> torch state dict.

    Keys follow ``torch.nn.LSTM`` per-layer naming (``weight_ih_l{k}``,
    ``weight_hh_l{k}``, ``bias_ih_l{k}``, ``bias_hh_l{k}``) plus
    ``head.weight``/``head.bias`` for the Dense head.
    """
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    k = 0
    while f"lstm{k}" in params:
        cell = params[f"lstm{k}"]
        w_ih = np.concatenate([_np(cell[f"i{g}"]["kernel"]).T for g in _GATES], 0)
        w_hh = np.concatenate([_np(cell[f"h{g}"]["kernel"]).T for g in _GATES], 0)
        b_hh = np.concatenate([_np(cell[f"h{g}"]["bias"]) for g in _GATES], 0)
        out[f"weight_ih_l{k}"] = w_ih
        out[f"weight_hh_l{k}"] = w_hh
        out[f"bias_ih_l{k}"] = np.zeros_like(b_hh)
        out[f"bias_hh_l{k}"] = b_hh
        k += 1
    out["head.weight"] = np.ascontiguousarray(_np(params["head"]["kernel"]).T)
    out["head.bias"] = _np(params["head"]["bias"])
    return out


def lf_to_torch_state(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """LateFusion variables -> torch state dict (``conv{n}.*``,
    ``out_conv.*``)."""
    out: Dict[str, np.ndarray] = {}
    for name, p in variables["params"].items():
        _conv(out, name, p)
    return out


def export_pipeline_to_torch(variables: Dict[str, Any], path: str) -> None:
    """Write the full {"sp","at","lf"} tree as one torch checkpoint.

    The saved object is ``{"sp": state_dict, "at": state_dict,
    "lf": state_dict}`` of torch tensors, loadable with
    ``torch.load(path)`` and distributable to reference-shaped modules
    via ``module.load_state_dict`` after key renaming.
    """
    import torch

    bundle = {
        "sp": sp_to_torch_state(variables["sp"]),
        "at": at_to_torch_state(variables["at"]),
        "lf": lf_to_torch_state(variables["lf"]),
    }
    torch.save(
        {k: {kk: torch.from_numpy(vv) for kk, vv in sd.items()}
         for k, sd in bundle.items()},
        path,
    )
