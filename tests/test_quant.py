"""int8 PTQ path (models/quant.py): quantized VGG streams must track
the f32 forward closely and slot into the fused pipeline step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.models.quant import (
    QuantSP,
    build_quant_vgg,
    calibrate_pipeline_sp,
    calibrate_vgg,
    quant_vgg_forward,
    quantize_vgg_params,
    vgg_forward_with_maxes,
)
from gaze_tpu.models.vgg import VGG16Features


def _cos(a, b):
    a = a.ravel()
    b = b.ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def vgg_setup():
    vgg = VGG16Features()
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, (2, 32, 32, 3)).astype(np.float32)
    params = vgg.init(jax.random.key(0), jnp.asarray(x))["params"]
    return vgg, params, x


class TestQuantVGG:
    def test_weight_quantization_roundtrip(self, vgg_setup):
        _, params, _ = vgg_setup
        kernels, scales, biases = quantize_vgg_params(params)
        k = np.asarray(params["conv1_1"]["kernel"], np.float32)
        deq = np.asarray(kernels["conv1_1"], np.float32) * np.asarray(
            scales["conv1_1"]
        )
        # per-channel symmetric: error bounded by half a step per channel
        step = np.asarray(scales["conv1_1"])
        assert np.all(np.abs(deq - k) <= 0.5 * step + 1e-9)
        assert kernels["conv1_1"].dtype == jnp.int8

    def test_forward_with_maxes_matches_module(self, vgg_setup):
        vgg, params, x = vgg_setup
        ref = np.asarray(vgg.apply({"params": params}, jnp.asarray(x)))
        got, maxes = vgg_forward_with_maxes(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
        assert len(maxes) == 13
        assert float(maxes["conv1_1"]) == pytest.approx(
            float(np.abs(x).max()), rel=1e-6
        )

    def test_quant_forward_tracks_f32(self, vgg_setup):
        vgg, params, x = vgg_setup
        ref = np.asarray(vgg.apply({"params": params}, jnp.asarray(x)))
        scales = calibrate_vgg(params, [x])
        q = build_quant_vgg(params, scales)
        got = np.asarray(quant_vgg_forward(q, jnp.asarray(x)))
        assert got.shape == ref.shape
        assert _cos(got, ref) > 0.98, _cos(got, ref)


class TestQuantPipeline:
    def test_quant_step_runs_and_tracks(self):
        """Pipeline with quant_sp produces heatmaps near the f32 path's
        (same variables, same input) and identical shapes/state."""
        from tests.test_train import tiny_config
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
        import dataclasses

        cfg = tiny_config()
        base = GazePipeline(cfg)
        variables = base.init_variables(jax.random.key(0))
        frames, _, fixsac = generate_sequence(
            SyntheticSpec(num_frames=3, height=32, width=32, blob_sigma=3.0)
        )
        prev = jnp.asarray(frames[None, 0])
        cur = jnp.asarray(frames[None, 1])
        fix = jnp.ones((1,), jnp.float32)

        qsp = calibrate_pipeline_sp(base, variables, [(prev, cur)])
        quant = dataclasses.replace(base, quant_sp=qsp)

        st0 = base.init_state(1)
        _, ref = jax.jit(base.step)(variables, st0, prev, cur, fix)
        _, got = jax.jit(quant.step)(variables, st0, prev, cur, fix)
        assert got["heatmap"].shape == ref["heatmap"].shape
        assert np.isfinite(np.asarray(got["heatmap"])).all()
        c = _cos(np.asarray(got["saliency"]), np.asarray(ref["saliency"]))
        assert c > 0.95, c
