"""LF stage training — TPU rebuild of ``ref:LF.py`` (SURVEY.md §3.3).

The reference trains the late-fusion head on SP/AT maps previously
dumped to disk with SP and AT frozen. Here the frozen SP+AT forward and
the LF update run in the *same* jit step — the "extract_late" stage
disappears into the compiled program, with maps never leaving HBM.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gaze_tpu.evaluation.losses import floss
from gaze_tpu.evaluation.metrics import aae, auc_judd
from gaze_tpu.models.at import LSTMNet, attention_map, fixation_pool
from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.ops.heatmap import render_gaussian
from gaze_tpu.train.common import TrainState, jit_dp_step, make_optimizer, make_state


def create_lf_state(rng: jax.Array, pipeline: GazePipeline) -> TrainState:
    cfg = pipeline.config
    maps = jnp.zeros((1, cfg.image.height, cfg.image.width, 2), pipeline.dtype)
    variables = pipeline.lf.init(rng, maps)
    return make_state(variables, make_optimizer(cfg.train))


def _frozen_maps(pipeline: GazePipeline, frozen: Dict[str, Any], batch: Dict[str, jnp.ndarray]):
    """SP saliency + AT attention maps with both modules frozen.

    Training-time AT rollout is teacher-forced at the GT gaze (matching
    the reference's extraction stage [M]); each batch element is treated
    as an independent single-step stream.
    """
    cfg = pipeline.config
    rgb_in, flow_in = pipeline.preprocess_pair(
        batch["prev"], batch["cur"], batch.get("flow_img")
    )
    sal, feat = pipeline.sp_forward(frozen["sp"], rgb_in, flow_in)
    w = fixation_pool(feat, batch["gaze"], cfg.at)
    carries = pipeline.lstm.init_carry(sal.shape[0])
    _, w_hat = pipeline.lstm.apply(frozen["at"], carries, w, method=LSTMNet.step)
    amap = attention_map(feat, w_hat, (cfg.image.height, cfg.image.width))
    return sal, amap


def make_lf_train_step(
    pipeline: GazePipeline, frozen: Dict[str, Any], mesh: Optional[Mesh] = None
):
    cfg = pipeline.config

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        sal, amap = _frozen_maps(pipeline, frozen, batch)
        fused_in = jnp.stack([sal, amap], axis=-1).astype(pipeline.dtype)
        target = render_gaussian(
            batch["gaze"], cfg.image.height, cfg.image.width, cfg.image.heatmap_sigma
        )

        def loss_fn(params):
            pred = pipeline.lf.apply({"params": params}, fused_in)
            return floss(pred, target, cfg.loss, sample_weight=batch.get("valid"))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    return jit_dp_step(step, mesh)


def make_map_extract_step(pipeline: GazePipeline, frozen: Dict[str, Any]):
    """The reference's ``--extract_late`` stage (SURVEY §3.3): frozen
    SP saliency + teacher-forced AT attention maps for a batch, ready to
    be dumped to disk. The in-memory LF path never needs this — it exists
    for users of the reference workflow who expect map files on disk."""

    @jax.jit
    def step(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        sal, amap = _frozen_maps(pipeline, frozen, batch)
        return {"saliency": sal, "attention": amap}

    return step


def make_lf_rollout_train_step(
    pipeline: GazePipeline, frozen: Dict[str, Any], mesh: Optional[Mesh] = None
):
    """Clip-based LF training on ROLLED-OUT attention maps.

    The teacher-forced step above trains LF on zero-carry, GT-pooled AT
    maps, which differ systematically from the inference-time gated
    rollout (train/test skew — the AT map LF sees at eval comes from a
    carried LSTM state pooled at the SP argmax). This step removes the
    skew: each batch element is a contiguous clip, the frozen SP+AT run
    the exact §3.4 rollout inside the train step, and LF learns on the
    same (sal, amap) distribution it will fuse at inference.

    Batch: frames (B, T+1, H, W, 3) u8, fixsac/gaze/valid (B, T+1, ...)
    — labels for frames[1:] supervise; frame 0 seeds the flow pair.
    """
    cfg = pipeline.config

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        frames = batch["frames"]
        B, Tp1 = frames.shape[0], frames.shape[1]
        T = Tp1 - 1
        variables = {"sp": frozen["sp"], "at": frozen["at"],
                     "lf": {"params": state.params}}
        st = pipeline.init_state(B)

        def tx(x):
            return jnp.swapaxes(x, 0, 1)

        def body(carry, xs):
            prev, cur, fix = xs
            carry, out = pipeline.step(variables, carry, prev, cur, fix)
            return carry, (out["saliency"], out["attention"])

        xs = (tx(frames[:, :-1]), tx(frames[:, 1:]), tx(batch["fixsac"][:, 1:]))
        _, (sal, amap) = jax.lax.scan(body, st, xs)
        # (T, B, H, W) -> (B*T, H, W); the rollout is frozen context for
        # the LF head, so no gradient flows back through it.
        sal = jax.lax.stop_gradient(tx(sal)).reshape(B * T, *sal.shape[2:])
        amap = jax.lax.stop_gradient(tx(amap)).reshape(B * T, *amap.shape[2:])
        fused_in = jnp.stack([sal, amap], axis=-1).astype(pipeline.dtype)
        target = render_gaussian(
            batch["gaze"][:, 1:].reshape(B * T, 2),
            cfg.image.height, cfg.image.width, cfg.image.heatmap_sigma,
        )
        weight = batch["valid"][:, 1:].reshape(B * T)

        def loss_fn(params):
            pred = pipeline.lf.apply({"params": params}, fused_in)
            return floss(pred, target, cfg.loss, sample_weight=weight)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    return jit_dp_step(step, mesh)


def make_lf_eval_step(
    pipeline: GazePipeline, frozen: Dict[str, Any], score_key: str = "heatmap"
):
    """Full-pipeline evaluation (the reference's final ``LF.val()``).

    ``score_key`` picks which map the metrics score: the LF fusion
    ("heatmap", default — the reference's metric), the frozen SP
    saliency alone, or the teacher-forced AT attention alone — the same
    per-head ablation surface ``--eval_map`` exposes on the rollout eval.
    """
    cfg = pipeline.config
    if score_key not in ("heatmap", "saliency", "attention"):
        raise ValueError(f"unknown score_key {score_key!r}")

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        sal, amap = _frozen_maps(pipeline, frozen, batch)
        if score_key == "saliency":
            pred = sal
        elif score_key == "attention":
            pred = amap
        else:
            fused_in = jnp.stack([sal, amap], axis=-1).astype(pipeline.dtype)
            pred = pipeline.lf.apply({"params": state.params}, fused_in)
        return {
            "aae": aae(pred, batch["gaze"], cfg.camera),
            "auc": auc_judd(pred, batch["gaze"]),
        }

    return step
