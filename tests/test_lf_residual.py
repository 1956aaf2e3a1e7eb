"""Residual late fusion (LFConfig.residual): the conv stack predicts a
logit-space correction to the SP saliency channel and the final conv is
zero-initialized, so a FRESH head starts exactly at the saliency map —
the stronger single-head baseline the task-cycle ablation measured
(docs/STATUS_r3.md: plain LF 14.03 deg AAE vs saliency 13.59 deg) —
instead of re-learning it from random init."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaze_tpu.core.config import LFConfig
from gaze_tpu.models.lf import LateFusion


def _maps(seed=0, shape=(2, 16, 16)):
    r = np.random.RandomState(seed)
    sal = jax.nn.sigmoid(jnp.asarray(r.randn(*shape), jnp.float32) * 2)
    amap = jnp.asarray(r.rand(*shape), jnp.float32)
    return jnp.stack([sal, amap], axis=-1), sal


class TestLFResidual:
    def test_fresh_init_is_exactly_saliency(self):
        maps, sal = _maps()
        lf = LateFusion(LFConfig(channels=(8, 8), residual=True))
        v = lf.init(jax.random.key(3), maps)
        out = np.asarray(lf.apply(v, maps))
        # sigmoid(logit(clip(sal))) == sal wherever the clip is inactive.
        np.testing.assert_allclose(out, np.asarray(sal), atol=1e-6)

    def test_param_shapes_match_plain_head(self):
        """Checkpoints are interchangeable between modes: identical
        pytree structure and shapes (the residual add has no params)."""
        maps, _ = _maps()
        cfg = LFConfig(channels=(8, 8))
        v_plain = LateFusion(cfg).init(jax.random.key(0), maps)
        v_res = LateFusion(
            LFConfig(channels=(8, 8), residual=True)
        ).init(jax.random.key(0), maps)
        shapes = lambda t: jax.tree.map(lambda a: a.shape, t)
        assert shapes(v_plain) == shapes(v_res)

    def test_training_moves_off_the_baseline_and_improves(self):
        """Zero out_conv blocks no learning: its bias and kernel both get
        nonzero gradients immediately (the kernel's input — the ReLU
        stack — is nonzero), and after the first update the earlier
        convs train too. Target = saliency shifted by a constant logit
        offset, exactly representable by the out_conv bias alone, so a
        few SGD steps must recover most of it."""
        maps, sal = _maps(seed=1)
        target = jax.nn.sigmoid(
            jnp.log(sal) - jnp.log1p(-sal) + 1.5
        )  # saliency alone is wrong by a fixed logit shift
        lf = LateFusion(LFConfig(channels=(8, 8), residual=True))
        v = lf.init(jax.random.key(0), maps)
        params = v["params"]

        def loss_fn(p):
            pred = lf.apply({"params": p}, maps)
            return jnp.mean((pred - target) ** 2)

        tx = optax.sgd(2.0)
        opt = tx.init(params)
        init_loss = float(loss_fn(params))
        step = jax.jit(
            lambda p, o: (lambda g: tx.update(g, o, p))(jax.grad(loss_fn)(p))
        )
        for _ in range(25):
            upd, opt = step(params, opt)
            params = optax.apply_updates(params, upd)
        assert float(loss_fn(params)) < init_loss * 0.5

    def test_composes_with_edge_padding(self):
        maps, sal = _maps(seed=2)
        lf = LateFusion(LFConfig(channels=(8,), residual=True, padding="edge"))
        v = lf.init(jax.random.key(0), maps)
        out = np.asarray(lf.apply(v, maps))
        np.testing.assert_allclose(out, np.asarray(sal), atol=1e-6)
