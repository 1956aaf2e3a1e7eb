"""DistributedStreamServer — single-process equivalence + reset
semantics on the 8-virtual-device CPU mesh. The REAL 2-process path
(per-host feeding, cross-process assembly, local readback) is executed
by tests/test_serve_mp.py via the gloo worker harness."""

import dataclasses

import jax
import numpy as np
import pytest

from gaze_tpu.core.config import (
    ATConfig,
    ImageConfig,
    PipelineConfig,
    SPConfig,
    TVL1Config,
)
from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.serve import DistributedStreamServer, StreamServer

_NARROW = ((8, 8), (8, 8), (16, 16, 16), (16, 16, 16), (32, 32, 32))


def _cfg():
    return PipelineConfig(
        image=ImageConfig(height=32, width=32, heatmap_sigma=4.0),
        tvl1=TVL1Config(pyramid_levels=2, warps=2, iters=3),
        sp=SPConfig(stages=_NARROW, fused_channels=32,
                    decoder_channels=(16, 16, 8, 8)),
        at=ATConfig(feature_dim=32, hidden_size=32, feature_stride=16,
                    roi_size=1),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (4, 8, 32, 32, 3), np.uint8)  # (T, S, ...)
    return cfg, variables, frames


def test_matches_stream_server(setup):
    """Single-process DistributedStreamServer == StreamServer on the
    same pool/frames (gaze exact; maps to reduction-order tolerance)."""
    cfg, variables, frames = setup
    S = frames.shape[1]

    ref = StreamServer(cfg, variables, max_streams=S, keep_heatmaps=True)
    dist = DistributedStreamServer(
        cfg, variables, streams_per_host=S, keep_heatmaps=True
    )
    for s in range(S):
        ref.attach(s)
        dist.attach(s)
    for t in range(frames.shape[0]):
        r = ref.tick(frames[t])
        d = dist.tick(frames[t])
        np.testing.assert_array_equal(r["gaze"], d["gaze"], err_msg=f"t={t}")
        np.testing.assert_allclose(
            r["heatmap"], d["heatmap"], rtol=0, atol=5e-6, err_msg=f"t={t}"
        )


def test_partial_attach_and_reattach_resets(setup):
    """Unattached slots return (-1,-1); re-attaching a slot resets its
    recurrent state (the in-graph reset mask) so its post-reattach
    outputs equal a fresh server's."""
    cfg, variables, frames = setup
    S = frames.shape[1]

    srv = DistributedStreamServer(cfg, variables, streams_per_host=S)
    for s in range(0, S, 2):  # attach only even slots
        srv.attach(s)
    out = srv.tick(frames[0])
    assert (out["gaze"][1::2] == -1).all()
    out = srv.tick(frames[1])
    assert (out["gaze"][1::2] == -1).all()
    assert (out["gaze"][0::2] >= 0).all()

    # Re-attach slot 0 — its next outputs must match a fresh server fed
    # only the post-reattach frames.
    srv.attach(0)
    a1 = srv.tick(frames[2])
    a2 = srv.tick(frames[3])
    fresh = DistributedStreamServer(cfg, variables, streams_per_host=S)
    fresh.attach(0)
    b1 = fresh.tick(frames[2])
    b2 = fresh.tick(frames[3])
    assert (a1["gaze"][0] == -1).all() and (b1["gaze"][0] == -1).all()
    np.testing.assert_array_equal(a2["gaze"][0], b2["gaze"][0])


def test_quant_operand_distributed(setup):
    """Quantized weights as replicated operands through the distributed
    tick program."""
    from gaze_tpu.models.quant import calibrate_pipeline_sp

    cfg, variables, frames = setup
    pipeline = GazePipeline(cfg)
    qsp = calibrate_pipeline_sp(
        pipeline, variables, [(frames[0], frames[1])]
    )
    S = frames.shape[1]
    dist = DistributedStreamServer(
        cfg, variables, streams_per_host=S, quant_sp=qsp
    )
    ref = StreamServer(cfg, variables, max_streams=S, quant_sp=qsp)
    for s in range(S):
        dist.attach(s)
        ref.attach(s)
    for t in range(2):
        d = dist.tick(frames[t])
        r = ref.tick(frames[t])
        np.testing.assert_array_equal(r["gaze"], d["gaze"], err_msg=f"t={t}")


def test_submit_pipeline_matches_tick(setup):
    """submit() lags one frame and produces the same tracks as tick()."""
    cfg, variables, frames = setup
    S = frames.shape[1]
    a = DistributedStreamServer(cfg, variables, streams_per_host=S)
    b = DistributedStreamServer(cfg, variables, streams_per_host=S)
    for s in range(S):
        a.attach(s)
        b.attach(s)
    ticked = [a.tick(frames[t])["gaze"] for t in range(3)]
    subbed = [b.submit(frames[t]) for t in range(3)]
    assert subbed[0] is None
    subbed = [r["gaze"] for r in subbed[1:]] + [b.flush()["gaze"]]
    for t in range(3):
        np.testing.assert_array_equal(ticked[t], subbed[t], err_msg=f"t={t}")


def test_pool_must_divide_devices(setup):
    cfg, variables, _ = setup
    with pytest.raises(ValueError, match="divide"):
        DistributedStreamServer(cfg, variables, streams_per_host=3)
