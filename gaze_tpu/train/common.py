"""Shared training scaffolding: train states, optimizers, DP jit helper.

The reference's per-stage trainers (ref:SP.py / ref:AT.py / ref:LF.py
``train()``/``val()`` methods [M]) each own a model + optimizer; here a
stage is a :class:`TrainState` pytree plus a pure ``train_step`` that is
jit-compiled data-parallel: the batch arrives sharded over the mesh's
``data`` axis, parameters/optimizer state are replicated, and XLA SPMD
emits the gradient all-reduce over ICI — no explicit pmean needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct
from jax.sharding import Mesh

from gaze_tpu.core.config import TrainConfig
from gaze_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    """Minimal train state; ``batch_stats`` is empty for stages without
    BatchNorm (AT, LF-without-BN)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any, new_batch_stats: Any = None) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt,
        )


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Learning-rate schedule from the config.

    ``constant`` is the reference behavior (fixed Adam lr, ref:gaze_full.py
    lr flag [M]); ``cosine`` (linear warmup -> cosine decay to 0 over
    ``lr_decay_steps``) and ``step`` (multiply by ``lr_decay_rate`` every
    ``lr_decay_steps``) are the production-training policies the
    reference-era research code predates. Warmup applies to every choice.
    """
    base = cfg.learning_rate
    warm = max(0, cfg.warmup_steps)
    if cfg.lr_schedule == "constant":
        sched = optax.constant_schedule(base)
    elif cfg.lr_schedule == "cosine":
        if cfg.lr_decay_steps <= 0:
            raise ValueError("cosine schedule needs lr_decay_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warm else base,
            peak_value=base,
            warmup_steps=warm,
            decay_steps=max(cfg.lr_decay_steps, warm + 1),
        )
    elif cfg.lr_schedule == "step":
        if cfg.lr_decay_steps <= 0:
            raise ValueError("step schedule needs lr_decay_steps > 0")
        sched = optax.exponential_decay(
            init_value=base,
            transition_steps=cfg.lr_decay_steps,
            decay_rate=cfg.lr_decay_rate,
            staircase=True,
        )
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if warm:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm), sched], [warm]
        )
    return sched


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW — the reference uses Adam with weight decay flags [M/U] —
    behind optional global-norm gradient clipping, driven by the
    configured lr schedule."""
    # Plain float lr for the default policy: a schedule changes the
    # opt_state pytree (scale_by_schedule carries a count), which would
    # break restore of every checkpoint saved before schedules existed.
    if cfg.lr_schedule == "constant" and cfg.warmup_steps <= 0:
        lr: Any = cfg.learning_rate
    else:
        lr = make_lr_schedule(cfg)
    tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    if cfg.grad_clip_norm > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def microbatch_value_and_grad(
    loss_fn: Callable, params: Any, batch: Any, num_microbatches: int
):
    """Gradient accumulation inside one jit step: split ``batch`` into
    ``num_microbatches`` equal leading-dim slices, run value_and_grad per
    slice under ``lax.scan`` (one microbatch's activations live at a
    time — the backward memory shrinks ~K-fold), and average.

    ``loss_fn(params, microbatch) -> (loss, aux)``; every microbatch must
    be the same size, so the mean of per-microbatch mean-losses equals
    the full-batch mean loss and gradients are EXACT for any
    batch-linear loss (per-sample mean). The optimizer then applies one
    update on the averaged gradients — semantically one big-batch step.
    (BatchNorm stages note: train-mode BN normalizes with the CURRENT
    microbatch's statistics, so with BN the forward is the standard
    per-microbatch-BN semantics, not bit-identical to the big batch.)

    Returns ``((loss, aux_of_last_microbatch), grads)`` like
    ``jax.value_and_grad(..., has_aux=True)``.
    """
    import jax.numpy as jnp

    k = num_microbatches
    if k <= 1:
        return jax.value_and_grad(loss_fn, has_aux=True)(params, batch)

    def split(x):
        if x.shape[0] % k:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by grad_accum={k}"
            )
        return x.reshape((k, x.shape[0] // k) + x.shape[1:])

    micro = jax.tree_util.tree_map(split, batch)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def body(carry, mb):
        loss_sum, grad_sum = carry
        (loss, aux), grads = grad_fn(params, mb)
        return (
            loss_sum + loss,
            jax.tree_util.tree_map(jnp.add, grad_sum, grads),
        ), aux

    zero_grads = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, p.dtype), params
    )
    (loss_sum, grad_sum), auxes = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), zero_grads), micro
    )
    mean_grads = jax.tree_util.tree_map(lambda g: g / k, grad_sum)
    last_aux = jax.tree_util.tree_map(lambda a: a[-1], auxes)
    return (loss_sum / k, last_aux), mean_grads


def make_state(variables: Any, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def jit_dp_step(
    step_fn: Callable, mesh: Optional[Mesh] = None, axis_name: str = "data"
) -> Callable:
    """jit a ``(state, batch) -> (state, metrics)`` step data-parallel.

    With a mesh: state/metrics replicated, batch sharded on its leading
    dim; the state buffer is donated so parameters update in place in
    HBM. Without a mesh: plain jit (single device).
    """
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
