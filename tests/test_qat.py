"""QAT (models/qat.py + train/qat.py): the fake-quant forward must be a
faithful differentiable twin of the deployed int8 chain, its STE
gradients must train, and the CLI stage must hand --quant_sp weights
that quantize with the scales they adapted to."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.models.qat import (
    fake_quant_kernel,
    load_act_scales,
    qat_vgg_forward,
    save_act_scales,
)
from gaze_tpu.models.quant import build_quant_vgg, calibrate_vgg, quant_vgg_forward
from gaze_tpu.models.vgg import VGG16Features


def _cos(a, b):
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def vgg_setup():
    vgg = VGG16Features()
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, (2, 32, 32, 3)).astype(np.float32)
    params = vgg.init(jax.random.key(0), jnp.asarray(x))["params"]
    scales = calibrate_vgg(params, [x])
    return vgg, params, x, scales


class TestFakeQuantForward:
    def test_matches_deployed_int8_chain(self, vgg_setup):
        """The binding property: fake-quant f32 forward == the integer
        path on the SAME scales, up to float-associativity round flips
        at quantization boundaries."""
        _, params, x, scales = vgg_setup
        fake = np.asarray(qat_vgg_forward(params, scales, jnp.asarray(x)))
        q = build_quant_vgg(params, scales)
        integer = np.asarray(quant_vgg_forward(q, jnp.asarray(x)))
        assert fake.shape == integer.shape
        assert _cos(fake, integer) > 0.999, _cos(fake, integer)
        # Element-level: the overwhelming majority must agree almost
        # exactly (disagreements are single-code round flips).
        close = np.isclose(fake, integer, rtol=5e-2, atol=1e-3)
        assert close.mean() > 0.98, close.mean()

    def test_tracks_f32_like_ptq(self, vgg_setup):
        vgg, params, x, scales = vgg_setup
        ref = np.asarray(vgg.apply({"params": params}, jnp.asarray(x)))
        fake = np.asarray(qat_vgg_forward(params, scales, jnp.asarray(x)))
        assert _cos(fake, ref) > 0.995

    def test_kernel_fake_quant_on_grid(self):
        rng = np.random.default_rng(1)
        k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 4, 8)).astype(np.float32))
        fq = np.asarray(fake_quant_kernel(k))
        s = np.max(np.abs(np.asarray(k)), axis=(0, 1, 2)) / 127.0
        codes = fq / s  # every value must sit on an integer code
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
        assert np.all(np.abs(codes) <= 127.001)

    def test_ste_gradients_flow(self, vgg_setup):
        _, params, x, scales = vgg_setup

        def loss(p):
            return jnp.mean(qat_vgg_forward(p, scales, jnp.asarray(x)) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0.0  # STE passes gradient through the quantizers


class TestScalesPersistence:
    def test_roundtrip(self, tmp_path, vgg_setup):
        _, _, _, scales = vgg_setup
        d = {"spatial": scales, "temporal": scales}
        save_act_scales(str(tmp_path), d)
        back = load_act_scales(str(tmp_path))
        assert set(back) == {"spatial", "temporal"}
        for layer, v in scales.items():
            np.testing.assert_allclose(
                np.asarray(back["spatial"][layer]), np.asarray(v)
            )

    def test_absent_returns_none(self, tmp_path):
        assert load_act_scales(str(tmp_path)) is None


class TestQATTraining:
    def test_loss_decreases(self):
        """A few QAT steps on synthetic data reduce the fake-quant loss
        (the quantizers are in the training graph, so this is the
        deployed objective, not the f32 proxy)."""
        from tests.test_train import tiny_config
        from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.train.qat import calibrate_qat_scales, make_qat_train_step
        from gaze_tpu.train.sp import create_sp_state

        cfg = tiny_config()
        pipeline = GazePipeline(cfg)
        state = create_sp_state(jax.random.key(0), pipeline)
        spec = SyntheticSpec(
            num_frames=24, height=cfg.image.height, width=cfg.image.width
        )
        batches = list(batch_iterator(spec, batch_size=8, num_batches=4))
        pairs = [(b["prev"], b["cur"]) for b in batches[:2]]
        scales = calibrate_qat_scales(pipeline, {"params": state.params}, pairs)
        step = make_qat_train_step(pipeline, scales)
        losses = []
        for _ in range(3):
            for b in batches:
                state, m = step(state, b)
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()
