"""int8 fuse/decoder tail (models/quant_tail.py): the polyphase f32
probe must match the canonical tail, and the int8-resident forward must
track it closely — plus the end-to-end pipeline wiring via
QuantSP.tail."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import SPConfig
from gaze_tpu.models.quant_tail import (
    calibrate_tail,
    fold_tail_params,
    quant_tail_forward,
    tail_forward_with_bounds,
)
from gaze_tpu.models.sp import SPNet


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def tail_setup():
    cfg = SPConfig(decoder_channels=(16, 8), use_batchnorm=True)
    sp = SPNet(cfg)
    kf, kt, ki = jax.random.split(jax.random.PRNGKey(5), 3)
    # post-ReLU-like (nonnegative) features, matching the serving input
    fs = jax.nn.relu(jax.random.normal(kf, (2, 8, 8, 12)))
    ft = jax.nn.relu(jax.random.normal(kt, (2, 8, 8, 12)))
    variables = sp.init(ki, fs, ft, method=SPNet.fuse_decode)
    return cfg, sp, variables, fs, ft


class TestFoldedProbe:
    def test_f32_probe_matches_canonical_tail(self, tail_setup):
        cfg, sp, variables, fs, ft = tail_setup
        ref = sp.apply(variables, fs, ft, method=SPNet.fuse_decode)
        folded = fold_tail_params(variables, cfg)
        x = jnp.concatenate([fs, ft], axis=-1)
        got, bounds = tail_forward_with_bounds(folded, cfg, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        assert set(bounds) == {"fuse", "up1", "up2", "out"}
        assert float(bounds["fuse"]) == pytest.approx(
            float(jnp.abs(x).max()), rel=1e-6
        )


class TestQuantTail:
    def test_tracks_f32_tail(self, tail_setup):
        cfg, sp, variables, fs, ft = tail_setup
        ref = np.asarray(sp.apply(variables, fs, ft, method=SPNet.fuse_decode))
        x = np.asarray(jnp.concatenate([fs, ft], axis=-1), np.float32)
        qt = calibrate_tail(variables, cfg, [x])
        got = np.asarray(quant_tail_forward(qt, fs, ft))
        assert got.shape == ref.shape
        assert np.isfinite(got).all()
        # sigmoid outputs in (0,1); int8 chain should track tightly
        assert _cos(got, ref) > 0.995, _cos(got, ref)
        assert float(np.max(np.abs(got - ref))) < 0.05

    def test_int8_resident_between_blocks(self, tail_setup):
        """The inter-block tensors must be int8 (the whole point: 4x
        less HBM traffic). Checked on the jaxpr of the forward."""
        cfg, _, variables, fs, ft = tail_setup
        x = np.asarray(jnp.concatenate([fs, ft], axis=-1), np.float32)
        qt = calibrate_tail(variables, cfg, [x])
        jaxpr = jax.make_jaxpr(lambda a, b: quant_tail_forward(qt, a, b))(fs, ft)
        n_int8_convs = sum(
            1 for eqn in jaxpr.jaxpr.eqns
            if eqn.primitive.name == "conv_general_dilated"
            and eqn.invars[0].aval.dtype == jnp.int8
        )
        # fuse + 2 up blocks + out conv all run on int8 inputs
        assert n_int8_convs == 4, n_int8_convs


class TestPipelineQuantTail:
    def test_step_with_quant_tail_tracks_f32(self):
        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.models.quant import calibrate_pipeline_sp
        from tests.test_train import tiny_config

        cfg = tiny_config()
        base = GazePipeline(cfg)
        variables = base.init_variables(jax.random.key(0))
        frames, _, _ = generate_sequence(
            SyntheticSpec(num_frames=3, height=32, width=32, blob_sigma=3.0)
        )
        prev, cur = jnp.asarray(frames[None, 0]), jnp.asarray(frames[None, 1])
        fix = jnp.ones((1,), jnp.float32)
        qsp = calibrate_pipeline_sp(base, variables, [(prev, cur)],
                                    quant_tail=True)
        assert qsp.tail is not None
        quant = dataclasses.replace(base, quant_sp=qsp)
        st0 = base.init_state(1)
        _, ref = jax.jit(base.step)(variables, st0, prev, cur, fix)
        _, got = jax.jit(quant.step)(variables, st0, prev, cur, fix)
        assert got["heatmap"].shape == ref["heatmap"].shape
        assert np.isfinite(np.asarray(got["heatmap"])).all()
        c = _cos(np.asarray(got["saliency"]), np.asarray(ref["saliency"]))
        assert c > 0.95, c

    def test_quant_tail_off_by_default(self):
        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.models.quant import calibrate_pipeline_sp
        from tests.test_train import tiny_config

        base = GazePipeline(tiny_config())
        variables = base.init_variables(jax.random.key(0))
        frames, _, _ = generate_sequence(
            SyntheticSpec(num_frames=2, height=32, width=32)
        )
        qsp = calibrate_pipeline_sp(
            base, variables, [(frames[None, 0], frames[None, 1])]
        )
        assert qsp.tail is None
