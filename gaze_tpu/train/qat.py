"""QAT fine-tuning stage for the SP streams (models/qat.py).

Sits between the reference's SP stage (ref:SP.py [M]) and the int8
serving path: restore the trained f32 SP checkpoint, calibrate the
deployment activation grids once, then fine-tune with both VGG streams
running the fake-quant forward while the fuse/decoder tail trains
normally in f32 (deployment keeps that tail in bf16/f32 too —
models/quant.py module docstring). The loss/step scaffolding matches
train/sp.py, so DP sharding, grad accumulation, and the optimizer
policies all apply unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gaze_tpu.evaluation.losses import floss
from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.models.qat import qat_vgg_forward
from gaze_tpu.models.quant import calibrate_vgg
from gaze_tpu.models.sp import SPNet
from gaze_tpu.ops.heatmap import render_gaussian
from gaze_tpu.train.common import TrainState, jit_dp_step, microbatch_value_and_grad


def calibrate_qat_scales(
    pipeline: GazePipeline,
    variables: Dict[str, Any],
    frame_pairs,
    percentile: Optional[float] = None,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-stream activation grids from raw uint8 frame pairs via the
    pipeline's own preprocessing — the exact bounds deployment's PTQ
    calibration would compute (models/quant.py ``calibrate_vgg``)."""
    if not frame_pairs:
        raise ValueError("QAT calibration needs at least one frame pair")
    pre = jax.jit(pipeline.preprocess_pair)
    rgb_b, flow_b = [], []
    for pair in frame_pairs:
        fl = pair[2] if len(pair) > 2 else None
        r, f = pre(
            jnp.asarray(pair[0]), jnp.asarray(pair[1]),
            None if fl is None else jnp.asarray(fl),
        )
        rgb_b.append(np.asarray(r, np.float32))
        flow_b.append(np.asarray(f, np.float32))
    sp_params = variables["sp"]["params"] if "sp" in variables else variables["params"]
    return {
        "spatial": calibrate_vgg(sp_params["spatial"], rgb_b, percentile=percentile),
        "temporal": calibrate_vgg(sp_params["temporal"], flow_b, percentile=percentile),
    }


def _fake_quant_saliency(
    pipeline: GazePipeline,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    act_scales: Dict[str, Dict[str, jnp.ndarray]],
    rgb_in: jnp.ndarray,
    flow_in: jnp.ndarray,
    train: bool,
):
    """Saliency through fake-quant streams + the real f32 tail. Returns
    (sal, new_batch_stats_or_None).

    Honors ``SPConfig.remat`` ("encoders"/"full" both checkpoint the
    fake-quant streams here — the decoder runs through the flax module,
    whose own remat wrapper SPNet.setup applies): the QAT backward then
    recomputes each stream's forward instead of storing its activations,
    the same memory/FLOPs trade as the plain SP step
    (tools/bench_remat.py)."""
    fwd = qat_vgg_forward
    if pipeline.config.sp.remat != "none":
        fwd = jax.checkpoint(qat_vgg_forward)
    fs = fwd(params["spatial"], act_scales["spatial"], rgb_in)
    ft = fwd(params["temporal"], act_scales["temporal"], flow_in)
    fs = fs.astype(pipeline.dtype)
    ft = ft.astype(pipeline.dtype)
    if train:
        sal, updates = pipeline.sp.apply(
            {"params": params, "batch_stats": batch_stats},
            fs, ft, train=True, mutable=["batch_stats"],
            method=SPNet.fuse_decode,
        )
        return sal, updates["batch_stats"]
    sal = pipeline.sp.apply(
        {"params": params, "batch_stats": batch_stats},
        fs, ft, method=SPNet.fuse_decode,
    )
    return sal, None


def make_qat_train_step(
    pipeline: GazePipeline,
    act_scales: Dict[str, Dict[str, jnp.ndarray]],
    mesh: Optional[Mesh] = None,
):
    """Same contract as ``make_sp_train_step`` — one jit =
    preprocess + fake-quant two-stream forward + floss + backward +
    optimizer — so the CLI's SP training loop drives it unchanged."""
    cfg = pipeline.config

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        if cfg.train.augment_flip:
            from gaze_tpu.data.augment import with_flip_mask

            batch = with_flip_mask(batch, cfg.train.seed, state.step)

        def loss_fn(params, mb):
            if cfg.train.augment_flip:
                from gaze_tpu.data.augment import apply_hflip

                mb = apply_hflip(mb, cfg.image.width)
            rgb_in, flow_in = pipeline.preprocess_pair(
                mb["prev"], mb["cur"], mb.get("flow_img")
            )
            target = render_gaussian(
                mb["gaze"], cfg.image.height, cfg.image.width,
                cfg.image.heatmap_sigma,
            )
            sal, new_bs = _fake_quant_saliency(
                pipeline, params, state.batch_stats, act_scales,
                rgb_in, flow_in, train=True,
            )
            return (
                floss(sal, target, cfg.loss, sample_weight=mb.get("valid")),
                new_bs,
            )

        (loss, new_bs), grads = microbatch_value_and_grad(
            loss_fn, state.params, batch, cfg.train.grad_accum
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss}

    return jit_dp_step(step, mesh)


def make_qat_eval_step(
    pipeline: GazePipeline,
    act_scales: Dict[str, Dict[str, jnp.ndarray]],
):
    """Validation AAE/AUC of the fake-quant saliency — the metric QAT's
    best-checkpoint tracking optimizes (mirrors ``make_sp_eval_step``)."""
    from gaze_tpu.evaluation.metrics import aae, auc_judd

    cfg = pipeline.config

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        rgb_in, flow_in = pipeline.preprocess_pair(
            batch["prev"], batch["cur"], batch.get("flow_img")
        )
        sal, _ = _fake_quant_saliency(
            pipeline, state.params, state.batch_stats, act_scales,
            rgb_in, flow_in, train=False,
        )
        return {
            "aae": aae(sal, batch["gaze"], cfg.camera),
            "auc": auc_judd(sal, batch["gaze"]),
        }

    return jax.jit(step)
