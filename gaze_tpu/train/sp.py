"""SP stage training — TPU rebuild of ``ref:SP.py`` (SURVEY.md §3.1).

The reference's hot loop: DataLoader workers decode/render on host, then
``model_SP.forward`` + ``floss`` + SGD per batch on one GPU. Here the
host only supplies uint8 frame pairs + gaze points; TV-L1 flow, resize,
normalize, GT-heatmap render, forward, loss, and the optimizer update
all fuse into a single jit-compiled, batch-sharded XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gaze_tpu.core.config import PipelineConfig
from gaze_tpu.evaluation.losses import floss
from gaze_tpu.evaluation.metrics import aae, auc_judd
from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.ops.heatmap import render_gaussian
from gaze_tpu.train.common import (
    TrainState,
    jit_dp_step,
    make_optimizer,
    make_state,
    microbatch_value_and_grad,
)


def create_sp_state(rng: jax.Array, pipeline: GazePipeline) -> TrainState:
    cfg = pipeline.config
    h, w = cfg.image.height, cfg.image.width
    rgb = jnp.zeros((1, h, w, 3), pipeline.dtype)
    flw = jnp.zeros((1, h, w, cfg.sp.flow_channels), pipeline.dtype)
    variables = pipeline.sp.init(rng, rgb, flw)
    return make_state(variables, make_optimizer(cfg.train))


def make_sp_train_step(pipeline: GazePipeline, mesh: Optional[Mesh] = None):
    """One jit = flow solve + preprocess + GT render + forward + floss +
    backward + AdamW. With ``cfg.train.grad_accum = K > 1`` the batch is
    scanned as K microbatches inside the same jit (exact mean gradient,
    ~K-fold smaller activation/backward memory — preprocessing and TV-L1
    included, since they run per microbatch); BN running stats take the
    last microbatch's update, and train-mode BN normalizes per
    microbatch (standard accumulation semantics)."""
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
            (sal, _), updates = pipeline.sp.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgb_in,
                flow_in,
                train=True,
                mutable=["batch_stats"],
            )
            # Untracked-gaze frames carry no supervision signal (their
            # rendered target is garbage) — masked out of the loss.
            return (
                floss(sal, target, cfg.loss, sample_weight=mb.get("valid")),
                updates["batch_stats"],
            )

        (loss, new_bs), grads = microbatch_value_and_grad(
            loss_fn, state.params, batch, cfg.train.grad_accum
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss}

    return jit_dp_step(step, mesh)


def make_sp_eval_step(pipeline: GazePipeline, mesh: Optional[Mesh] = None):
    """Validation: saliency AAE/AUC straight from the SP map (the
    reference's periodic ``val()``, minus the per-frame D2H sync)."""
    cfg = pipeline.config

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        rgb_in, flow_in = pipeline.preprocess_pair(
            batch["prev"], batch["cur"], batch.get("flow_img")
        )
        sal, _ = pipeline.sp.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, rgb_in, flow_in
        )
        return {
            "aae": aae(sal, batch["gaze"], cfg.camera),
            "auc": auc_judd(sal, batch["gaze"]),
        }

    return jax.jit(step)


def extract_fixation_weights(pipeline: GazePipeline):
    """AT feature extraction (ref:AT.py extraction step, SURVEY.md §3.2):
    SP spatial-encoder conv5 features pooled at the GT gaze point ->
    512-d channel weights. Returns a jitted (sp_variables, batch) -> (B, C)
    fn; the inter-stage filesystem dump becomes an in-memory array."""
    from gaze_tpu.models.at import fixation_pool

    @jax.jit
    def extract(sp_variables: Any, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        rgb_in, flow_in = pipeline.preprocess_pair(
            batch["prev"], batch["cur"], batch.get("flow_img")
        )
        _, feat = pipeline.sp.apply(sp_variables, rgb_in, flow_in)
        return fixation_pool(feat, batch["gaze"], pipeline.config.at)

    return extract
