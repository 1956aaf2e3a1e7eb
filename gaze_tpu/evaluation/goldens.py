"""Golden-file parity hooks.

BASELINE.json demands "bit-comparable gaze heatmaps" against the
reference's per-module outputs. The reference itself is not runnable in
this offline environment (SURVEY.md §0), so parity is engineered as
infrastructure: every module boundary (SP saliency map, SP conv5
features, AT channel weights, AT attention map, LF heatmap) can be
dumped to .npz goldens and later compared within tolerance — against a
future reference run, or against this framework's own pinned outputs
(regression protection).

The parity path runs float32 (GazePipeline dtype) with
TVL1Config.flow_scale=1.0.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def save_goldens(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Write a named tensor bundle as compressed .npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in tensors.items()})


def load_goldens(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def compare_goldens(
    actual: Dict[str, np.ndarray],
    golden: Dict[str, np.ndarray],
    atol: float = 1e-5,
    rtol: float = 1e-5,
) -> Tuple[bool, Dict[str, float]]:
    """Compare tensor bundles; returns (all_close, per-key max abs diff).

    Missing/extra keys count as failures (diff = inf).
    """
    report: Dict[str, float] = {}
    ok = True
    for k in sorted(set(actual) | set(golden)):
        if k not in actual or k not in golden:
            report[k] = float("inf")
            ok = False
            continue
        a = np.asarray(actual[k], dtype=np.float64)
        g = np.asarray(golden[k], dtype=np.float64)
        if a.shape != g.shape:
            report[k] = float("inf")
            ok = False
            continue
        diff = float(np.max(np.abs(a - g))) if a.size else 0.0
        report[k] = diff
        if not np.allclose(a, g, atol=atol, rtol=rtol):
            ok = False
    return ok, report


def pipeline_module_outputs(
    pipeline, variables, state, prev_u8, cur_u8, fixation, flow_img=None
):
    """Run one fused step and return every module-boundary tensor as the
    golden bundle (the reference's dumped-to-disk stage outputs).

    With ``flow_img`` (quantized uint8 flow images), the temporal stream
    consumes them instead of the on-TPU TV-L1 solve — the strict-parity
    input mode for comparing against a reference fed the same flow JPEGs.
    """
    import jax.numpy as jnp

    from gaze_tpu.models.at import fixation_pool
    from gaze_tpu.ops.heatmap import heatmap_argmax

    cfg = pipeline.config
    rgb_in, flow_in = pipeline.preprocess_pair(prev_u8, cur_u8, flow_img)
    sal, feat = pipeline.sp_forward(variables["sp"], rgb_in, flow_in)
    pool_pt = heatmap_argmax(sal)
    w = fixation_pool(feat, pool_pt, cfg.at)
    new_state, out = pipeline.step(
        variables, state, prev_u8, cur_u8, fixation, flow_img=flow_img
    )
    return {
        "rgb_in": rgb_in.astype(jnp.float32),
        "flow_in": flow_in.astype(jnp.float32),
        "sp_saliency": out["saliency"],
        "sp_conv5": feat,
        "at_weights": w,
        "at_attention": out["attention"],
        "lf_heatmap": out["heatmap"],
        "gaze_xy": out["gaze"],
    }
