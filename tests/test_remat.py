"""Rematerialization (SPConfig.remat / jax.checkpoint via nn.remat).

Remat must change WHAT THE BACKWARD STORES and nothing else: parameter
trees, forward outputs, losses, and gradients all match the "none"
mode. (The memory/throughput tradeoff itself is TPU-measured by
tools/bench_remat.py — CI pins the semantics.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import (
    ATConfig,
    ImageConfig,
    PipelineConfig,
    SPConfig,
    TrainConfig,
    TVL1Config,
)
from gaze_tpu.models.pipeline import GazePipeline

_NARROW = ((8, 8), (8, 8), (16, 16, 16), (16, 16, 16), (32, 32, 32))


def _cfg(remat: str, grad_accum: int = 1) -> PipelineConfig:
    return PipelineConfig(
        image=ImageConfig(height=32, width=32, heatmap_sigma=4.0),
        tvl1=TVL1Config(pyramid_levels=2, warps=2, iters=3),
        sp=SPConfig(
            stages=_NARROW,
            fused_channels=32,
            decoder_channels=(16, 16, 8, 8),
            remat=remat,
        ),
        at=ATConfig(feature_dim=32, hidden_size=32, feature_stride=16,
                    roi_size=1),
        train=TrainConfig(batch_size=4, grad_accum=grad_accum),
    )


def _batch(b=4, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "prev": rng.integers(0, 255, (b, h, w, 3), np.uint8),
        "cur": rng.integers(0, 255, (b, h, w, 3), np.uint8),
        "gaze": rng.uniform(4, 28, (b, 2)).astype(np.float32),
        "valid": np.ones((b,), np.float32),
    }


@pytest.mark.parametrize("mode", ["encoders", "full"])
def test_param_tree_identical(mode):
    """nn.remat preserves scopes: checkpoints interchangeable."""
    base = GazePipeline(_cfg("none"))
    rmt = GazePipeline(_cfg(mode))
    v0 = base.sp.init(jax.random.key(0),
                      jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2)))
    v1 = rmt.sp.init(jax.random.key(0),
                     jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2)))
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["encoders", "full"])
def test_forward_and_gradients_match(mode):
    """Same params => same loss and same gradients as remat='none'."""
    from gaze_tpu.evaluation.losses import floss
    from gaze_tpu.ops.heatmap import render_gaussian

    batch = _batch()
    results = {}
    for name in ("none", mode):
        pipe = GazePipeline(_cfg(name))
        variables = pipe.sp.init(
            jax.random.key(1),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2)),
        )

        def loss_fn(params):
            rgb_in, flow_in = pipe.preprocess_pair(
                jnp.asarray(batch["prev"]), jnp.asarray(batch["cur"])
            )
            target = render_gaussian(jnp.asarray(batch["gaze"]), 32, 32, 4.0)
            (sal, _), _ = pipe.sp.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]} | {"params": params},
                rgb_in, flow_in, train=True, mutable=["batch_stats"],
            )
            return floss(sal, target, pipe.config.loss)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        results[name] = (float(loss), jax.device_get(grads))

    l0, g0 = results["none"]
    l1, g1 = results[mode]
    assert np.isclose(l0, l1, rtol=1e-6), (l0, l1)
    key = lambda pa: jax.tree_util.keystr(pa[0])
    for (p0, a), (p1, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=key),
    ):
        assert jax.tree_util.keystr(p0) == jax.tree_util.keystr(p1)
        np.testing.assert_allclose(
            a, b, rtol=2e-5, atol=1e-7, err_msg=str(p0)
        )


def test_train_step_runs_with_remat_and_accum():
    """Full make_sp_train_step under remat + grad accumulation."""
    from gaze_tpu.train.sp import create_sp_state, make_sp_train_step

    pipe = GazePipeline(_cfg("encoders", grad_accum=2))
    state = create_sp_state(jax.random.key(0), pipe)
    state, metrics = make_sp_train_step(pipe)(state, _batch())
    assert np.isfinite(float(metrics["loss"]))


def test_qat_step_matches_without_remat():
    """QAT fine-tuning honors SPConfig.remat: identical loss vs none."""
    from gaze_tpu.train.qat import calibrate_qat_scales, make_qat_train_step
    from gaze_tpu.train.sp import create_sp_state

    batch = _batch()
    losses = {}
    for mode in ("none", "encoders"):
        pipe = GazePipeline(_cfg(mode))
        state = create_sp_state(jax.random.key(2), pipe)
        scales = calibrate_qat_scales(
            pipe, {"params": state.params}, [(batch["prev"], batch["cur"])]
        )
        _, metrics = make_qat_train_step(pipe, scales)(state, batch)
        losses[mode] = float(metrics["loss"])
    assert np.isclose(losses["none"], losses["encoders"], rtol=1e-6), losses


def test_unknown_remat_mode_raises():
    with pytest.raises(ValueError, match="remat"):
        GazePipeline(_cfg("everything")).sp.init(
            jax.random.key(0),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2)),
        )


def test_remat_actually_checkpoints():
    """The remat wrapper must be live: the jaxpr of the VJP under
    remat='encoders' contains remat/checkpoint calls; 'none' does not.
    Guards against the wrapper silently becoming a no-op."""
    def has_remat(pipe):
        variables = pipe.sp.init(
            jax.random.key(0),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2)),
        )

        def loss(params):
            sal, _ = pipe.sp.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 32, 32, 2)),
            )
            return sal.sum()

        jaxpr = jax.make_jaxpr(jax.grad(loss))(variables["params"])
        return "remat" in str(jaxpr) or "checkpoint" in str(jaxpr)

    assert has_remat(GazePipeline(_cfg("encoders")))
    assert not has_remat(GazePipeline(_cfg("none")))
