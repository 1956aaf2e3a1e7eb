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
        # asymmetric [0,255] activations: measured 0.9998 (the signed
        # symmetric scheme this replaced sat at ~0.98) — the VERDICT-r2
        # "tighten ~2x" acceptance, with margin
        assert _cos(got, ref) > 0.995, _cos(got, ref)

    def test_bf16_stem_tracks_at_least_as_well(self, vgg_setup):
        """Mixed stem (bf16 conv1_1, int8 interior): same output shape,
        tracks f32 at least as closely as the all-int8 chain (the stem
        skips the input-grid rounding entirely), and the chain re-enters
        int8 at conv1_2 (asserted via the stored stem params)."""
        vgg, params, x = vgg_setup
        ref = np.asarray(vgg.apply({"params": params}, jnp.asarray(x)))
        scales = calibrate_vgg(params, [x])
        q_int8 = build_quant_vgg(params, scales)
        q_mixed = build_quant_vgg(params, scales, bf16_stem=True)
        assert q_mixed.stem_kernel is not None
        assert q_mixed.stem_kernel.dtype == jnp.bfloat16
        got_int8 = np.asarray(quant_vgg_forward(q_int8, jnp.asarray(x)))
        got_mixed = np.asarray(quant_vgg_forward(q_mixed, jnp.asarray(x)))
        assert got_mixed.shape == ref.shape
        c_mixed, c_int8 = _cos(got_mixed, ref), _cos(got_int8, ref)
        assert c_mixed > 0.995, c_mixed
        # small slack: downstream of conv1_2 the chains are identical,
        # so any gap is the stem's (exact bf16) vs (int8-rounded) input
        assert c_mixed >= c_int8 - 1e-4, (c_mixed, c_int8)


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


def _naive_asym_forward(q, x):
    """Reference implementation of the asymmetric scheme WITHOUT the
    folded epilogues: dequantize -> f32 conv (with real zero padding)
    -> bias -> ReLU -> requantize on the [0,255] grid, layer by layer.
    quant_vgg_forward must match this up to float associativity."""
    from flax.linen import max_pool

    from gaze_tpu.models.quant import _LAYERS
    from gaze_tpu.models.vgg import VGG16_STAGES

    s0 = float(q.act_scales[_LAYERS[0]])
    xq = np.clip(np.round(np.asarray(x, np.float32) / s0), -127, 127)
    xd = jnp.asarray(xq * s0)  # dequantized real values, f32
    li = 0
    for s, stage in enumerate(VGG16_STAGES):
        for _ in stage:
            name = _LAYERS[li]
            li += 1
            k = (np.asarray(q.kernels[name], np.float32)
                 * np.asarray(q.w_scales[name]))
            y = jax.lax.conv_general_dilated(
                xd, jnp.asarray(k), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(q.biases[name])
            y = jax.nn.relu(y)
            if li < len(_LAYERS):
                sn = float(q.act_scales[_LAYERS[li]])
                qv = jnp.clip(jnp.round(y / sn), 0, 255)
                xd = qv * sn
            else:
                xd = y
        if s < len(VGG16_STAGES) - 1:
            xd = max_pool(xd, window_shape=(2, 2), strides=(2, 2))
    return np.asarray(xd)


class TestAsymmetricQuant:
    """The asymmetric [0,255]-grid scheme: folded zero-point/padding
    algebra must match the naive dequant->requant reference, and the
    grid must be twice as fine as signed symmetric."""

    def test_folded_matches_naive_reference(self, vgg_setup):
        _, params, x = vgg_setup
        scales = calibrate_vgg(params, [x])
        q = build_quant_vgg(params, scales)
        got = np.asarray(quant_vgg_forward(q, jnp.asarray(x)))
        ref = _naive_asym_forward(q, jnp.asarray(x))
        # The folded path accumulates EXACTLY in int32 while the naive
        # reference convolves in f32, so round() decisions flip near
        # ties and flips amplify through 13 layers: ~1.5% max-rel
        # disagreement measured. A zero-point/padding bug instead shifts
        # activations by ~128 quant steps — orders of magnitude beyond
        # these bounds.
        denom = np.abs(ref).max() + 1e-12
        assert np.max(np.abs(got - ref)) / denom < 0.05
        assert _cos(got, ref) > 0.999, _cos(got, ref)

    def test_interior_grid_is_unsigned_255(self, vgg_setup):
        _, params, x = vgg_setup
        scales = calibrate_vgg(params, [x])
        # interior scale = bound/255; recompute the bound via the stats
        # forward and check the divisor (first layer keeps /127)
        _, bounds = vgg_forward_with_maxes(params, jnp.asarray(x))
        assert float(scales["conv1_1"]) == pytest.approx(
            float(bounds["conv1_1"]) / 127.0, rel=1e-6
        )
        assert float(scales["conv3_2"]) == pytest.approx(
            float(bounds["conv3_2"]) / 255.0, rel=1e-6
        )

    def test_percentile_calibration_shrinks_outlier_scale(self, vgg_setup):
        _, params, x = vgg_setup
        x_out = np.array(x)
        x_out[0, 0, 0, 0] = 1e3  # one wild outlier pixel
        s_max = calibrate_vgg(params, [x_out])
        s_pct = calibrate_vgg(params, [x_out], percentile=99.9)
        # max-based calibration blows up the first-layer scale; the
        # percentile bound stays near the clean data's range
        assert float(s_pct["conv1_1"]) < 0.05 * float(s_max["conv1_1"])
        q = build_quant_vgg(params, s_pct)
        out = np.asarray(quant_vgg_forward(q, jnp.asarray(x)))
        assert np.isfinite(out).all()
