"""Torch-twin full-rollout equivalence (tools/torch_reference.py).

The strongest offline stand-in for BASELINE.json's "bit-comparable gaze
heatmaps": an independent torch/numpy re-implementation of the COMPLETE
SURVEY.md §3.4 sequential inference (ref:LF.py ``val()`` semantics [M])
consumes the ``--export_torch`` weight bundle and must reproduce the JAX
pipeline's per-frame saliency / attention / fused heatmaps, gaze track
and AAE/AUC over a multi-onset rollout — AND the harness must have
teeth: flipping any single convention (resize align-corners, BN eps,
LSTM gate packing, deconv tap flip) breaks the agreement.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence  # noqa: E402
from gaze_tpu.evaluation.goldens import golden_tiny_parity_config  # noqa: E402
from gaze_tpu.models.pipeline import GazePipeline  # noqa: E402
from gaze_tpu.models.weights_export import (  # noqa: E402
    at_to_torch_state,
    lf_to_torch_state,
    sp_to_torch_state,
)
from tools.torch_reference import (  # noqa: E402
    TorchReferenceTwin,
    TwinKnobs,
    aae_np,
    auc_judd_np,
)

T = 10
# Multiple fixation onsets (t=1, 4, 8 after the zero-init prev_fix) so
# the LSTM advances several times and gate/carry conventions matter.
FIXSAC = np.asarray([0, 1, 1, 0, 1, 1, 1, 0, 1, 1], np.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = golden_tiny_parity_config()
    pipeline = GazePipeline(cfg)  # float32 parity path
    variables = pipeline.init_variables(jax.random.key(0))
    # Non-trivial BN running stats (init is mean 0 / var 1 — too bland to
    # catch eps/var conventions). Means stay near zero so the decoder
    # ReLUs keep firing — large positive means normalize every decoder
    # activation negative and a dead tail makes the whole comparison
    # vacuous (constant-0.5 saliency hides deconv/BN convention breaks).
    rng = np.random.default_rng(5)

    def _randomize_stats(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        lo, hi = ((-0.2, 0.2) if name == "mean" else (0.3, 1.2))
        return jnp.asarray(rng.uniform(lo, hi, x.shape).astype(np.float32))

    variables["sp"]["batch_stats"] = jax.tree_util.tree_map_with_path(
        _randomize_stats, variables["sp"]["batch_stats"]
    )
    frames, gaze, _ = generate_sequence(
        SyntheticSpec(num_frames=T, height=cfg.image.height,
                      width=cfg.image.width, seed=7)
    )
    flow = rng.integers(0, 256, (T,) + frames.shape[1:3] + (2,), np.uint8)
    bundle = {
        "sp": sp_to_torch_state(variables["sp"]),
        "at": at_to_torch_state(variables["at"]),
        "lf": lf_to_torch_state(variables["lf"]),
    }
    # JAX side: the literal §3.4 frame-by-frame step (flow-image input
    # mode, AT pooled at the SP argmax, onset-gated LSTM).
    state = pipeline.init_state(1)
    jax_outs = []
    for t in range(1, T):
        state, out = pipeline.step(
            variables, state,
            jnp.asarray(frames[t - 1][None]), jnp.asarray(frames[t][None]),
            jnp.asarray(FIXSAC[t][None]),
            flow_img=jnp.asarray(flow[t][None]),
        )
        jax_outs.append({k: np.asarray(v) for k, v in out.items()})
    return cfg, pipeline, variables, bundle, frames, gaze, flow, jax_outs


def _twin_rollout(setup, knobs=None):
    cfg, _, _, bundle, frames, _, flow, _ = setup
    twin = TorchReferenceTwin(bundle, cfg, knobs=knobs)
    return twin.rollout(frames[None], flow[None], FIXSAC[None])


class TestTwinAgreement:
    def test_per_frame_maps_and_gaze_match(self, setup):
        """Every module-boundary map agrees frame-by-frame, and the
        decoded gaze track is IDENTICAL (same argmax pixel)."""
        *_, jax_outs = setup
        outs = _twin_rollout(setup)
        assert len(outs) == len(jax_outs) == T - 1
        # Guard against a vacuous comparison: a dead decoder yields a
        # constant-0.5 saliency map that would "agree" trivially.
        assert jax_outs[0]["saliency"].std() > 1e-4
        assert jax_outs[0]["heatmap"].std() > 1e-5
        for t, (to, jo) in enumerate(zip(outs, jax_outs)):
            np.testing.assert_allclose(
                to["saliency"], jo["saliency"], atol=5e-6,
                err_msg=f"saliency frame {t + 1}",
            )
            np.testing.assert_allclose(
                to["attention"], jo["attention"], atol=5e-6,
                err_msg=f"attention frame {t + 1}",
            )
            np.testing.assert_allclose(
                to["heatmap"], jo["heatmap"], atol=5e-6,
                err_msg=f"heatmap frame {t + 1}",
            )
            np.testing.assert_array_equal(
                to["gaze"], jo["gaze"], err_msg=f"gaze frame {t + 1}"
            )

    def test_metrics_match_rollout_eval(self, setup):
        """numpy AAE/AUC on the twin's heatmaps equals the JAX eval
        loop's masked sums (rollout_eval_arrays in flow-image mode) —
        closing the loop through evaluation/metrics.py too."""
        from gaze_tpu.evaluation.rollout import rollout_eval_arrays

        cfg, pipeline, variables, _, frames, gaze, flow, _ = setup
        outs = _twin_rollout(setup)
        hms = np.concatenate([o["heatmap"] for o in outs])
        twin_aae = aae_np(hms, gaze[1:], cfg.camera)
        twin_auc = auc_judd_np(hms, gaze[1:])
        aae_s, auc_s, cnt = rollout_eval_arrays(
            pipeline, variables,
            frames[None], gaze[None].astype(np.float32), FIXSAC[None],
            flow_img=flow[None],
        )
        assert cnt[0] == T - 1
        np.testing.assert_allclose(twin_aae.sum(), aae_s[0], rtol=1e-4)
        np.testing.assert_allclose(twin_auc.sum(), auc_s[0], rtol=1e-5)

    def test_lstm_state_actually_advances(self, setup):
        """Guard against a vacuous pass: the attention map must CHANGE
        after a later onset (the LSTM carry/gating path is exercised,
        not frozen at the first prediction)."""
        *_, jax_outs = setup
        amaps = np.stack([o["attention"][0] for o in jax_outs])
        # onsets at t=1, 4, 8 -> frames after t=4 differ from frame 1
        assert np.abs(amaps[4] - amaps[0]).max() > 1e-4


class TestTwinResidualLF:
    def test_residual_mode_matches(self, setup):
        """LFConfig.residual changes the fusion semantics (logit-space
        correction to the saliency channel, models/lf.py); the twin must
        reproduce it — non-vacuously: the zero out_conv is re-randomized
        so the stack's correction is actually nonzero."""
        import dataclasses

        cfg, _, variables, _, frames, _, flow, _ = setup
        cfg_r = dataclasses.replace(
            cfg, lf=dataclasses.replace(cfg.lf, residual=True)
        )
        pipeline = GazePipeline(cfg_r)
        var_r = dict(variables)
        lf_vars = pipeline.lf.init(
            jax.random.key(9), jnp.zeros((1, cfg.image.height,
                                          cfg.image.width, 2), jnp.float32)
        )
        rng = np.random.default_rng(11)
        var_r["lf"] = jax.tree.map(
            lambda x: jnp.asarray(
                rng.normal(0, 0.5, x.shape).astype(np.float32)
            ),
            lf_vars,
        )
        state = pipeline.init_state(1)
        jax_outs = []
        for t in range(1, T):
            state, out = pipeline.step(
                var_r, state,
                jnp.asarray(frames[t - 1][None]), jnp.asarray(frames[t][None]),
                jnp.asarray(FIXSAC[t][None]),
                flow_img=jnp.asarray(flow[t][None]),
            )
            jax_outs.append({k: np.asarray(v) for k, v in out.items()})
        # non-vacuous: the correction moved the heatmap off the saliency
        assert max(
            np.abs(o["heatmap"] - o["saliency"]).max() for o in jax_outs
        ) > 1e-3
        bundle = {
            "sp": sp_to_torch_state(variables["sp"]),
            "at": at_to_torch_state(variables["at"]),
            "lf": lf_to_torch_state(var_r["lf"]),
        }
        outs = TorchReferenceTwin(bundle, cfg_r).rollout(
            frames[None], flow[None], FIXSAC[None]
        )
        # atol 2e-5 (vs 5e-6 plain): logit(sal) amplifies ~1e-7-relative
        # torch-vs-XLA saliency differences wherever sal saturates, so the
        # residual head's float32 agreement is intrinsically a bit looser.
        for t, (to, jo) in enumerate(zip(outs, jax_outs)):
            np.testing.assert_allclose(
                to["heatmap"], jo["heatmap"], atol=2e-5,
                err_msg=f"residual heatmap frame {t + 1}",
            )
            np.testing.assert_array_equal(to["gaze"], jo["gaze"])


class TestTwinHasTeeth:
    """A deliberate wrong-convention twin must FAIL the agreement —
    otherwise the harness could not detect a real parity break."""

    @pytest.mark.parametrize(
        "flip",
        [
            dict(align_corners=True),      # resize convention
            dict(bn_eps=1e-2),             # BatchNorm epsilon
            dict(gate_order="gifo"),       # LSTM gate-row packing
            dict(deconv_flip_taps=False),  # ConvTranspose tap flip
        ],
        ids=["align_corners", "bn_eps", "gate_order", "deconv_flip"],
    )
    def test_convention_flip_breaks_agreement(self, setup, flip):
        *_, jax_outs = setup
        outs = _twin_rollout(setup, knobs=TwinKnobs(**flip))
        worst = max(
            np.abs(to["heatmap"] - jo["heatmap"]).max()
            for to, jo in zip(outs, jax_outs)
        )
        assert worst > 1e-5, f"flip {flip} did not break agreement ({worst})"


class TestQuantTwin:
    """Independent cross-implementation of the int8-resident VGG stream
    (the turbo headline's novel math): TorchQuantVGGTwin (float64 torch
    convs + numpy-f32 epilogue) vs models/quant.quant_vgg_forward (XLA
    s8xs8->s32 + fused VPU epilogue), same QuantVGG arrays."""

    @staticmethod
    def _np_bundle(q):
        g = lambda d: {k: np.asarray(v) for k, v in d.items()}  # noqa: E731
        return {
            "kernels": g(q.kernels),
            "w_scales": g(q.w_scales),
            "biases": g(q.biases),
            "act_scales": g(q.act_scales),
            "col_sums": g(q.col_sums),
            "stem_kernel": (
                None if q.stem_kernel is None
                else np.asarray(q.stem_kernel.astype(jnp.float32))
            ),
            "stem_bias": (
                None if q.stem_bias is None else np.asarray(q.stem_bias)
            ),
        }

    @pytest.fixture(scope="class", params=[False, True],
                    ids=["int8_stem", "bf16_stem"])
    def qsetup(self, request):
        from gaze_tpu.models.quant import calibrate_pipeline_sp, quant_vgg_forward

        cfg = golden_tiny_parity_config()
        pipeline = GazePipeline(cfg)
        variables = pipeline.init_variables(jax.random.key(3))
        frames, _, _ = generate_sequence(
            SyntheticSpec(num_frames=6, height=cfg.image.height,
                          width=cfg.image.width, seed=11)
        )
        pairs = [(frames[t][None], frames[t + 1][None]) for t in range(4)]
        qsp = calibrate_pipeline_sp(
            pipeline, variables, pairs, percentile=99.9,
            bf16_stem=request.param,
        )
        # serving-style preprocessed inputs (rgb stream)
        rgb, fl = jax.jit(pipeline.preprocess_pair)(
            jnp.asarray(frames[4][None]), jnp.asarray(frames[5][None])
        )
        # EAGER reference: per-op XLA semantics (each round/clip/conv its
        # own executable — no cross-op fusion). The twin pins these op
        # semantics bit-exactly; whole-chain jit fusion drift is pinned
        # separately in test_jit_fusion_band.
        want_s = np.asarray(quant_vgg_forward(qsp.spatial, rgb), np.float32)
        want_t = np.asarray(quant_vgg_forward(qsp.temporal, fl), np.float32)
        return qsp, np.asarray(rgb, np.float32), np.asarray(fl, np.float32), \
            want_s, want_t

    def test_streams_match(self, qsetup):
        from tools.torch_reference import TorchQuantVGGTwin

        qsp, rgb, fl, want_s, want_t = qsetup
        for q, x, want, label in (
            (qsp.spatial, rgb, want_s, "spatial"),
            (qsp.temporal, fl, want_t, "temporal"),
        ):
            got = TorchQuantVGGTwin(self._np_bundle(q)).forward(x)
            # Measured 0.0 (bit-exact) for both streams and both stem
            # modes; the 1.5-LSB band only allows a single requant-code
            # flip if some host's libm/FMA behavior ever differs.
            lsb = float(
                np.max(np.asarray(q.act_scales["conv5_3"])
                       * np.asarray(q.w_scales["conv5_3"]))
            )
            err = np.abs(got - want).max()
            assert err <= 1.5 * lsb, f"{label}: err {err} vs lsb {lsb}"
            # non-vacuous: features genuinely vary
            assert want.std() > 0

    def test_jit_fusion_band(self, qsetup):
        """Whole-chain jit is NOT bit-equal to the eager chain: XLA may
        contract the epilogue mul+add into an FMA and reassociate
        fusions, flipping occasional requant codes that then amplify
        through 13 round() layers. Pin that band (measured ~0.5% of the
        output scale on CPU) so a real algebra regression — which
        produces errors orders of magnitude larger, see the teeth
        thresholds — can't hide behind 'jit is just fuzzy'."""
        from gaze_tpu.models.quant import quant_vgg_forward

        qsp, rgb, _, want_s, _ = qsetup
        jitted = np.asarray(
            jax.jit(quant_vgg_forward)(qsp.spatial, jnp.asarray(rgb)),
            np.float32,
        )
        scale = float(np.abs(want_s).max())
        assert np.abs(jitted - want_s).max() <= 0.02 * scale

    def test_twin_has_teeth(self, qsetup):
        """The classic asymmetric-quant bugs must BREAK the agreement:
        padding with code 0 (real value != 0 on the zp-128 grid) and
        dropping the zero-point bias correction."""
        from tools.torch_reference import TorchQuantVGGTwin

        qsp, rgb, _, want_s, _ = qsetup
        b = self._np_bundle(qsp.spatial)
        lsb = float(
            np.max(np.asarray(qsp.spatial.act_scales["conv5_3"])
                   * np.asarray(qsp.spatial.w_scales["conv5_3"]))
        )
        wrong_pad = TorchQuantVGGTwin(b, pad_code=0).forward(rgb)
        assert np.abs(wrong_pad - want_s).max() > 10 * lsb
        no_zp = TorchQuantVGGTwin(b, apply_zp_bias=False).forward(rgb)
        assert np.abs(no_zp - want_s).max() > 10 * lsb
