"""LR schedules, gradient clipping, gradient accumulation.

The reference trains every stage with a fixed Adam lr (ref:gaze_full.py
lr flags [M]) — schedules, clipping, and accumulation are the
production-training features a deployable framework adds on top. The
binding property for accumulation is EXACTNESS: scanning K microbatches
inside one jit step must produce the same mean gradient (hence the same
optimizer update) as the full batch, for any batch-linear loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gaze_tpu.core.config import TrainConfig, default_config
from gaze_tpu.train.common import (
    make_lr_schedule,
    make_optimizer,
    make_state,
    microbatch_value_and_grad,
)


def _cfg(**kw) -> TrainConfig:
    return dataclasses.replace(TrainConfig(), **kw)


class TestLRSchedules:
    def test_constant_default(self):
        s = make_lr_schedule(_cfg(learning_rate=3e-4))
        assert float(s(0)) == pytest.approx(3e-4)
        assert float(s(10_000)) == pytest.approx(3e-4)

    def test_warmup_reaches_base_then_holds(self):
        s = make_lr_schedule(_cfg(learning_rate=1e-3, warmup_steps=100))
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(50)) == pytest.approx(5e-4)
        assert float(s(100)) == pytest.approx(1e-3)
        assert float(s(5000)) == pytest.approx(1e-3)

    def test_cosine_decays_to_zero(self):
        s = make_lr_schedule(_cfg(
            learning_rate=1e-3, lr_schedule="cosine",
            warmup_steps=10, lr_decay_steps=110,
        ))
        assert float(s(10)) == pytest.approx(1e-3)
        mid = float(s(60))
        assert 0.0 < mid < 1e-3
        assert float(s(110)) == pytest.approx(0.0, abs=1e-9)

    def test_step_staircase(self):
        s = make_lr_schedule(_cfg(
            learning_rate=1e-2, lr_schedule="step",
            lr_decay_steps=100, lr_decay_rate=0.1,
        ))
        assert float(s(99)) == pytest.approx(1e-2)
        assert float(s(100)) == pytest.approx(1e-3)
        assert float(s(250)) == pytest.approx(1e-4)

    def test_bad_schedule_rejected(self):
        with pytest.raises(ValueError):
            make_lr_schedule(_cfg(lr_schedule="cyclic"))
        with pytest.raises(ValueError):
            make_lr_schedule(_cfg(lr_schedule="cosine"))  # no horizon

    def test_default_optimizer_state_structure_unchanged(self):
        """Checkpoint compatibility: the default policy must produce the
        SAME opt_state pytree as the pre-schedule optimizer, or every
        existing checkpoint fails to restore (found by a real restore
        failure when a schedule was wrapped unconditionally)."""
        params = {"w": jnp.ones((3,))}
        old = optax.adamw(1e-4, weight_decay=1e-5).init(params)
        new = make_optimizer(_cfg()).init(params)
        assert (jax.tree_util.tree_structure(old)
                == jax.tree_util.tree_structure(new))


class TestGradClip:
    def test_update_norm_bounded(self):
        """With clipping, a huge gradient produces a bounded first-step
        update; without it the update tracks the raw gradient scale
        through Adam's normalizer only (first step |u| ~ lr either way,
        so compare the raw transformed gradients instead)."""
        clip = 1.0
        cfg = _cfg(grad_clip_norm=clip)
        tx = optax.clip_by_global_norm(clip)
        g = {"w": jnp.full((4,), 1e6)}
        clipped, _ = tx.update(g, tx.init(g))
        assert float(optax.global_norm(clipped)) == pytest.approx(clip, rel=1e-5)
        # And the configured optimizer accepts/updates with clipping on.
        params = {"w": jnp.ones((4,))}
        opt = make_optimizer(cfg)
        st = opt.init(params)
        upd, _ = opt.update(g, st, params)
        assert np.all(np.isfinite(np.asarray(upd["w"])))


class TestMicrobatchAccum:
    def _loss(self, params, batch):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2), jnp.mean(pred)

    def _batch(self, n=16, d=5, seed=0):
        r = np.random.RandomState(seed)
        return {
            "x": jnp.asarray(r.randn(n, d), jnp.float32),
            "y": jnp.asarray(r.randn(n), jnp.float32),
        }

    def test_exact_vs_full_batch(self):
        params = {"w": jnp.asarray(np.random.RandomState(1).randn(5), jnp.float32)}
        batch = self._batch()
        (l0, _), g0 = microbatch_value_and_grad(self._loss, params, batch, 1)
        for k in (2, 4, 8):
            (lk, _), gk = microbatch_value_and_grad(self._loss, params, batch, k)
            np.testing.assert_allclose(float(lk), float(l0), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(gk["w"]), np.asarray(g0["w"]), rtol=1e-5, atol=1e-7
            )

    def test_indivisible_batch_rejected(self):
        params = {"w": jnp.zeros((5,))}
        with pytest.raises(ValueError, match="divisible"):
            microbatch_value_and_grad(self._loss, params, self._batch(n=10), 3)

    def test_sp_step_grad_accum_matches_plain(self):
        """The wired SP train step: grad_accum=2 must match grad_accum=1
        on a batch whose halves are identical (so per-microbatch BN
        statistics coincide with the full batch and the comparison
        isolates the accumulation arithmetic). SGD, not Adam: at random
        init many gradient components are float-noise-level, and Adam's
        first-step update is sign(g)*lr — a rounding-order flip between
        the two differently-compiled programs moves a param by 2*lr.
        Under SGD the param delta is linear in the gradient difference."""
        import optax as _optax

        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.train.common import make_state as _make_state
        from gaze_tpu.train.sp import make_sp_train_step

        base = default_config()
        cfg = dataclasses.replace(
            base,
            image=dataclasses.replace(base.image, height=32, width=32),
            tvl1=dataclasses.replace(base.tvl1, pyramid_levels=2, warps=2, iters=4),
        )
        r = np.random.RandomState(0)
        half = {
            "prev": r.randint(0, 255, (4, 32, 32, 3), np.uint8),
            "cur": r.randint(0, 255, (4, 32, 32, 3), np.uint8),
            "gaze": r.uniform(8, 24, (4, 2)).astype(np.float32),
        }
        # Duplicate the halves so microbatch BN stats == full-batch stats
        # and the comparison isolates the accumulation arithmetic.
        batch = {k: jnp.asarray(np.concatenate([v, v])) for k, v in half.items()}

        def run(accum):
            c = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, grad_accum=accum)
            )
            p = GazePipeline(c)
            variables = p.sp.init(
                jax.random.key(0),
                jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 32, 32, c.sp.flow_channels)),
            )
            state = _make_state(variables, _optax.sgd(0.1))
            state, metrics = make_sp_train_step(p)(state, batch)
            return float(metrics["loss"]), state.params

        l1, p1 = run(1)
        l2, p2 = run(2)
        np.testing.assert_allclose(l2, l1, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_sp_step_grad_accum_dp_mesh(self):
        """grad_accum composes with data-parallel sharding: the scanned
        microbatch reshape must stay partitionable on the 8-device CPU
        mesh (batch 16 -> 2 microbatches x 8 rows, one row per device)."""
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.parallel.mesh import make_mesh
        from gaze_tpu.train.sp import create_sp_state, make_sp_train_step

        base = default_config()
        cfg = dataclasses.replace(
            base,
            image=dataclasses.replace(base.image, height=32, width=32),
            tvl1=dataclasses.replace(base.tvl1, pyramid_levels=2, warps=2, iters=4),
            train=dataclasses.replace(base.train, grad_accum=2),
        )
        r = np.random.RandomState(1)
        batch = {
            "prev": jnp.asarray(r.randint(0, 255, (16, 32, 32, 3), np.uint8)),
            "cur": jnp.asarray(r.randint(0, 255, (16, 32, 32, 3), np.uint8)),
            "gaze": jnp.asarray(r.uniform(8, 24, (16, 2)).astype(np.float32)),
        }
        mesh = make_mesh(8)
        p = GazePipeline(cfg)
        state = create_sp_state(jax.random.key(0), p)
        state, metrics = make_sp_train_step(p, mesh)(state, batch)
        assert np.isfinite(float(metrics["loss"]))
