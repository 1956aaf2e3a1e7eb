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


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW — the reference uses Adam with weight decay flags [M/U]."""
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)


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
