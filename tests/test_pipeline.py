"""End-to-end pipeline tests: the fused per-frame step, the clip scan,
streaming/scan consistency, and fixsac gating semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
from gaze_tpu.models.pipeline import GazePipeline, make_clip_fn, make_step_fn
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def setup():
    pipeline = GazePipeline(tiny_config())
    variables = pipeline.init_variables(jax.random.key(0))
    frames, gaze, fixsac = generate_sequence(
        SyntheticSpec(num_frames=9, height=32, width=32, blob_sigma=3.0)
    )
    return pipeline, variables, frames, gaze, fixsac


class TestStep:
    def test_output_shapes(self, setup):
        pipeline, variables, frames, _, fixsac = setup
        state = pipeline.init_state(2)
        prev = jnp.asarray(frames[0:2])
        cur = jnp.asarray(frames[1:3])
        state, out = pipeline.step(variables, state, prev, cur, jnp.asarray(fixsac[1:3]))
        assert out["saliency"].shape == (2, 32, 32)
        assert out["attention"].shape == (2, 32, 32)
        assert out["heatmap"].shape == (2, 32, 32)
        assert out["gaze"].shape == (2, 2)
        for k in ("saliency", "attention", "heatmap"):
            v = np.asarray(out[k])
            assert np.isfinite(v).all()
            assert v.min() >= -1e-5 and v.max() <= 1.0 + 1e-5

    def test_saccade_frames_freeze_lstm_state(self, setup):
        pipeline, variables, frames, _, _ = setup
        state0 = pipeline.init_state(1)
        prev = jnp.asarray(frames[0:1])
        cur = jnp.asarray(frames[1:2])
        # saccade frame: fixation=0 -> the LSTM-gated state (carries,
        # w_hat) must be unchanged (prev_gaze tracks the prediction on
        # EVERY frame by design — it is not part of the gated state)
        def gated(s):
            return (s.carries, s.w_hat)

        state1, _ = pipeline.step(variables, state0, prev, cur, jnp.zeros((1,)))
        for a, b in zip(
            jax.tree_util.tree_leaves(gated(state0)),
            jax.tree_util.tree_leaves(gated(state1)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # fixation frame: state must change
        state2, _ = pipeline.step(variables, state0, prev, cur, jnp.ones((1,)))
        changed = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(gated(state0)),
                jax.tree_util.tree_leaves(gated(state2)),
            )
        ]
        assert any(changed)

    def test_at_pool_prediction_uses_previous_gaze(self, setup):
        """at_pool='prediction' must pool at state.prev_gaze — its step
        equals a teacher-forced step with gaze_xy=prev_gaze; the default
        pools at the SP argmax instead (different onset input)."""
        pipeline, variables, frames, _, _ = setup
        pred = GazePipeline(pipeline.config, at_pool="prediction")
        state = pred.init_state(1)
        # seed a distinctive previous prediction away from the SP argmax
        state = state._replace(prev_gaze=jnp.asarray([[3.0, 29.0]]))
        prev = jnp.asarray(frames[0:1])
        cur = jnp.asarray(frames[1:2])
        fix = jnp.ones((1,))
        _, out_pred = pred.step(variables, state, prev, cur, fix)
        _, out_forced = pipeline.step(
            variables, state, prev, cur, fix,
            gaze_xy=state.prev_gaze,
        )
        np.testing.assert_allclose(
            np.asarray(out_pred["heatmap"]), np.asarray(out_forced["heatmap"]),
            atol=1e-6,
        )
        # prev_gaze advances to this frame's final prediction
        _, out2 = pred.step(variables, state, prev, cur, fix)
        s2, _ = pred.step(variables, state, prev, cur, fix)
        np.testing.assert_allclose(
            np.asarray(s2.prev_gaze), np.asarray(out2["gaze"]), atol=0
        )
        with pytest.raises(ValueError):
            GazePipeline(pipeline.config, at_pool="final")


class TestClip:
    def test_clip_matches_streaming(self, setup):
        pipeline, variables, frames, _, fixsac = setup
        clip_fn = make_clip_fn(pipeline)
        f = jnp.asarray(frames[None])          # (1, T+1, H, W, 3)
        fs = jnp.asarray(fixsac[None])
        heatmaps, gaze = clip_fn(variables, f, fs)
        T = frames.shape[0] - 1
        assert heatmaps.shape == (1, T, 32, 32)
        assert gaze.shape == (1, T, 2)

        # streaming step-by-step must produce identical outputs
        step_fn = make_step_fn(pipeline)
        state = pipeline.init_state(1)
        for t in range(T):
            state, out = step_fn(
                variables,
                state,
                jnp.asarray(frames[t : t + 1]),
                jnp.asarray(frames[t + 1 : t + 2]),
                jnp.asarray(fixsac[t + 1 : t + 2]),
            )
            np.testing.assert_allclose(
                np.asarray(out["heatmap"][0]), np.asarray(heatmaps[0, t]), atol=1e-5
            )

    def test_batch_streams_independent(self, setup):
        pipeline, variables, frames, _, fixsac = setup
        clip_fn = make_clip_fn(pipeline)
        f1 = jnp.asarray(frames[None])
        fs1 = jnp.asarray(fixsac[None])
        hm_single, _ = clip_fn(variables, f1, fs1)
        # duplicate the stream in a batch of 2: outputs must match stream 0
        f2 = jnp.concatenate([f1, f1])
        fs2 = jnp.concatenate([fs1, fs1])
        hm_dual, _ = clip_fn(variables, f2, fs2)
        np.testing.assert_allclose(
            np.asarray(hm_dual[0]), np.asarray(hm_single[0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(hm_dual[1]), np.asarray(hm_single[0]), atol=1e-5
        )


class TestFixationOnsetGating:
    def test_lstm_steps_once_per_fixation(self, setup):
        """The AT LSTM advances at fixation ONSET only: two consecutive
        fixation frames must not advance the state twice (SURVEY.md §3.4
        "if new fixation, update LSTM state")."""
        pipeline, variables, frames, _, _ = setup
        prev = jnp.asarray(frames[0:1])
        cur = jnp.asarray(frames[1:2])
        one = jnp.ones((1,))

        s0 = pipeline.init_state(1)
        s1, _ = pipeline.step(variables, s0, prev, cur, one)   # onset
        s2, _ = pipeline.step(variables, s1, prev, cur, one)   # continuation
        # carries/w_hat frozen during the continuation frame
        np.testing.assert_allclose(
            np.asarray(s1.w_hat), np.asarray(s2.w_hat), atol=0
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.carries),
            jax.tree_util.tree_leaves(s2.carries),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # saccade then fixation -> a fresh onset advances the state again
        s3, _ = pipeline.step(variables, s2, prev, cur, jnp.zeros((1,)))
        s4, _ = pipeline.step(variables, s3, prev, cur, one)
        changed = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(s2.carries),
                jax.tree_util.tree_leaves(s4.carries),
            )
        ]
        assert any(changed)


class TestFlowScalePreset:
    def test_half_grid_flow_runs_and_matches_shapes(self, setup):
        """Production preset (flow solved at half the model grid) must
        produce the same output shapes and finite values."""
        import dataclasses

        pipeline, _, frames, _, fixsac = setup
        cfg = dataclasses.replace(
            pipeline.config,
            tvl1=dataclasses.replace(pipeline.config.tvl1, flow_scale=0.5),
        )
        p2 = GazePipeline(cfg)
        variables = p2.init_variables(jax.random.key(0))
        state = p2.init_state(1)
        state, out = p2.step(
            variables,
            state,
            jnp.asarray(frames[0:1]),
            jnp.asarray(frames[1:2]),
            jnp.ones((1,)),
        )
        assert out["heatmap"].shape == (1, 32, 32)
        for k in ("saliency", "attention", "heatmap"):
            assert np.isfinite(np.asarray(out[k])).all()
