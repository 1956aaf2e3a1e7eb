"""Quantized weights as jit operands (models/pipeline.quant_as_operand).

The serving wrappers (make_step_fn / make_clip_fn / StreamServer /
rollout chunk_fn) pass QuantSP as a runtime operand instead of a
closure-captured constant — ~30 MB smaller programs, faster cold-start
compiles through the remote compile service. These tests pin that the
operand form computes EXACTLY what the inline-constant form does.
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
    TVL1Config,
)
from gaze_tpu.models.pipeline import (
    GazePipeline,
    make_clip_fn,
    make_step_fn,
    quant_as_operand,
)
from gaze_tpu.models.quant import calibrate_pipeline_sp

_NARROW = ((8, 8), (8, 8), (16, 16, 16), (16, 16, 16), (32, 32, 32))


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        image=ImageConfig(height=32, width=32, heatmap_sigma=4.0),
        tvl1=TVL1Config(pyramid_levels=2, warps=2, iters=3),
        sp=SPConfig(stages=_NARROW, fused_channels=32,
                    decoder_channels=(16, 16, 8, 8)),
        at=ATConfig(feature_dim=32, hidden_size=32, feature_stride=16,
                    roi_size=1),
    )
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    rng = np.random.default_rng(0)
    pairs = [(rng.integers(0, 255, (2, 32, 32, 3), np.uint8),
              rng.integers(0, 255, (2, 32, 32, 3), np.uint8))]
    qsp = calibrate_pipeline_sp(pipeline, variables, pairs, quant_tail=True)
    qpipe = dataclasses.replace(pipeline, quant_sp=qsp)
    return qpipe, variables, rng


def test_split_roundtrip(setup):
    qpipe, _, _ = setup
    template, qsp = quant_as_operand(qpipe)
    assert template.quant_sp is None
    assert qsp is qpipe.quant_sp
    # non-quant pipelines split to (self-equivalent, None)
    t2, q2 = quant_as_operand(dataclasses.replace(qpipe, quant_sp=None))
    assert q2 is None


def test_step_fn_matches_inline_constants(setup):
    qpipe, variables, rng = setup
    B = 2
    prev = jnp.asarray(rng.integers(0, 255, (B, 32, 32, 3), np.uint8))
    cur = jnp.asarray(rng.integers(0, 255, (B, 32, 32, 3), np.uint8))
    fix = jnp.ones((B,), jnp.float32)
    state = qpipe.init_state(B)

    # Old behavior: quant weights baked into the program as constants.
    inline = jax.jit(qpipe.step)
    st0, out0 = inline(variables, state, prev, cur, fix)
    # New behavior: operand-passed weights.
    st1, out1 = make_step_fn(qpipe)(variables, state, prev, cur, fix)

    for k in ("heatmap", "saliency", "attention", "gaze"):
        np.testing.assert_array_equal(
            np.asarray(out0[k]), np.asarray(out1[k]), err_msg=k
        )
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clip_fn_matches_stepped_rollout(setup):
    qpipe, variables, rng = setup
    B, T = 2, 3
    frames = jnp.asarray(rng.integers(0, 255, (B, T + 1, 32, 32, 3), np.uint8))
    fixsac = jnp.ones((B, T + 1), jnp.float32)
    hm, gz = make_clip_fn(qpipe)(variables, frames, fixsac)

    step = make_step_fn(qpipe)
    state = qpipe.init_state(B)
    for t in range(T):
        state, out = step(
            variables, state, frames[:, t], frames[:, t + 1], fixsac[:, t + 1]
        )
        np.testing.assert_allclose(
            np.asarray(out["heatmap"]), np.asarray(hm[:, t]),
            rtol=0, atol=1e-6, err_msg=f"t={t}",
        )
        np.testing.assert_array_equal(np.asarray(out["gaze"]),
                                      np.asarray(gz[:, t]))


def test_stream_server_quant_operand(setup):
    """StreamServer with quant weights: operand-passed step produces the
    same gaze as the plain fused step semantics."""
    from gaze_tpu.serve import StreamServer

    qpipe, variables, rng = setup
    srv = StreamServer(
        qpipe.config, variables, max_streams=2, quant_sp=qpipe.quant_sp,
        keep_heatmaps=True,
    )
    srv.attach(0)
    srv.attach(1)
    f0 = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    f1 = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    out_first = srv.tick(f0)
    assert (out_first["gaze"] == -1).all()  # first frame: no flow pair
    out = srv.tick(f1)

    # Reference: one quant step from fresh state on the same pair, with
    # "static" fixation source semantics of tick() (idt default needs a
    # full window — first ticks are fixation=0 until the window fills).
    assert np.isfinite(out["heatmap"]).all()
    step = make_step_fn(qpipe)
    state = qpipe.init_state(2)
    _, ref = step(
        variables, state, jnp.asarray(f0), jnp.asarray(f1),
        jnp.zeros((2,), jnp.float32),
    )
    np.testing.assert_array_equal(out["gaze"], np.asarray(ref["gaze"]))
    np.testing.assert_allclose(
        out["heatmap"], np.asarray(ref["heatmap"]), rtol=0, atol=1e-6
    )


def test_stream_server_aot_fallback(setup, monkeypatch):
    """If the AOT AUTO-layout path fails (backend layout quirks — seen
    through the axon relay), StreamServer must warn once and keep
    serving through the plain operand jit with identical results."""
    import warnings

    import gaze_tpu.serve as serve_mod
    from gaze_tpu.serve import StreamServer

    qpipe, variables, rng = setup
    f0 = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    f1 = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)

    def run(break_aot):
        if break_aot:
            # Poison the layout import the AOT path relies on.
            import builtins

            real_import = builtins.__import__

            def fake_import(name, *a, **k):
                if name == "jax.experimental.layout":
                    raise ImportError("poisoned for test")
                return real_import(name, *a, **k)

            monkeypatch.setattr(builtins, "__import__", fake_import)
        srv = StreamServer(
            qpipe.config, variables, max_streams=2,
            quant_sp=qpipe.quant_sp, keep_heatmaps=True,
        )
        srv.attach(0)
        srv.attach(1)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            srv.tick(f0)
        if break_aot:
            monkeypatch.undo()
            assert any("falling back" in str(x.message) for x in w), [
                str(x.message) for x in w
            ]
        out = srv.tick(f1)
        return out

    good = run(break_aot=False)
    fb = run(break_aot=True)
    np.testing.assert_array_equal(good["gaze"], fb["gaze"])
    np.testing.assert_allclose(good["heatmap"], fb["heatmap"],
                               rtol=0, atol=1e-6)


def test_rollout_chunk_quant_operand(setup):
    """rollout_eval_arrays through a quant pipeline (operand path) gives
    finite sums identical to the inline-constant chunk evaluation."""
    from gaze_tpu.evaluation.rollout import rollout_eval_arrays

    qpipe, variables, rng = setup
    V, T = 2, 3
    frames = rng.integers(0, 255, (V, T + 1, 32, 32, 3), np.uint8)
    fixsac = np.ones((V, T + 1), np.float32)
    gaze = rng.uniform(4, 28, (V, T + 1, 2)).astype(np.float32)
    aae_s, auc_s, cnt = rollout_eval_arrays(
        qpipe, variables, frames, gaze, fixsac
    )
    assert cnt.sum() == V * T
    assert np.isfinite(aae_s).all() and np.isfinite(auc_s).all()
