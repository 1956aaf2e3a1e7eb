"""StreamServer tests: slot lifecycle, state isolation, first-frame
semantics, lockstep equivalence with the clip processor."""

import jax
import numpy as np
import pytest

from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
from gaze_tpu.models.pipeline import GazePipeline, make_clip_fn
from gaze_tpu.serve import StreamServer
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config()
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    frames, _, fixsac = generate_sequence(
        SyntheticSpec(num_frames=6, height=32, width=32, blob_sigma=3.0)
    )
    return cfg, variables, frames, fixsac


class TestStreamServer:
    def test_first_frame_returns_sentinel(self, served):
        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=2)
        srv.attach(0)
        out = srv.tick(np.stack([frames[0], frames[0]]))
        assert tuple(out["gaze"][0]) == (-1.0, -1.0)  # no frame pair yet
        assert tuple(out["gaze"][1]) == (-1.0, -1.0)  # inactive slot

    def test_active_streams_produce_gaze(self, served):
        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=2, keep_heatmaps=True)
        srv.attach(0)
        srv.tick(np.stack([frames[0], frames[0]]))
        out = srv.tick(np.stack([frames[1], frames[1]]))
        g = out["gaze"]
        assert (g[0] >= 0).all() and (g[0] < 32).all()
        assert tuple(g[1]) == (-1.0, -1.0)
        assert out["heatmap"].shape == (2, 32, 32)

    def test_matches_clip_processor(self, served):
        """Ticking a single stream frame-by-frame must reproduce the
        batched clip path exactly (same state threading)."""
        cfg, variables, frames, fixsac = served
        pipeline = GazePipeline(cfg)
        clip_fn = make_clip_fn(pipeline)
        hm, gaze_clip = clip_fn(
            variables, frames[None], fixsac[None]
        )

        srv = StreamServer(cfg, variables, max_streams=1, keep_heatmaps=True)
        srv.attach(0)
        srv.tick(frames[0:1], fixsac[0:1])
        for t in range(1, len(frames)):
            out = srv.tick(frames[t : t + 1], fixsac[t : t + 1])
            np.testing.assert_allclose(
                out["heatmap"][0], np.asarray(hm[0, t - 1]), atol=1e-5
            )

    def test_detach_and_reattach_resets_state(self, served):
        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=1)
        srv.attach(0)
        srv.tick(frames[0:1])
        srv.tick(frames[1:2])
        srv.detach(0)
        assert len(srv.active_slots()) == 0
        srv.attach(0)
        out = srv.tick(frames[2:3])
        # fresh slot: first-frame sentinel again
        assert tuple(out["gaze"][0]) == (-1.0, -1.0)


class TestPipelinedSubmit:
    def test_submit_lags_tick_by_one(self, served):
        cfg, variables, frames, fixsac = served
        srv_t = StreamServer(cfg, variables, max_streams=1)
        srv_s = StreamServer(cfg, variables, max_streams=1)
        srv_t.attach(0)
        srv_s.attach(0)

        tick_results = [
            srv_t.tick(frames[t : t + 1], fixsac[t : t + 1])
            for t in range(len(frames))
        ]
        sub_results = [
            srv_s.submit(frames[t : t + 1], fixsac[t : t + 1])
            for t in range(len(frames))
        ]
        assert sub_results[0] is None
        for t in range(1, len(frames)):
            np.testing.assert_allclose(
                sub_results[t]["gaze"], tick_results[t - 1]["gaze"]
            )
        last = srv_s.flush()
        np.testing.assert_allclose(last["gaze"], tick_results[-1]["gaze"])
        assert srv_s.flush() is None


class TestServingIDT:
    def test_attach_during_submit_pipeline_is_safe(self, served):
        """attach() between submits must drain the pending frame first:
        otherwise the stale frame's tick consumes the new stream's
        first/reset bookkeeping and the stream's first REAL frame pairs
        with an unrelated prev frame (garbage flow as a valid gaze).
        The drained result is handed to the next submit(), preserving
        the one-result-per-submit cadence."""
        cfg, variables, frames, fixsac = served

        srv = StreamServer(cfg, variables, max_streams=2)
        srv.attach(0)
        f = lambda t: np.stack([frames[t], frames[t]])
        assert srv.submit(f(0)) is None
        srv.attach(1)              # mid-pipeline: drains frame 0
        r1 = srv.submit(f(1))      # returns the DRAINED frame-0 result
        assert tuple(r1["gaze"][0]) == (-1.0, -1.0)  # slot 0 first frame
        assert tuple(r1["gaze"][1]) == (-1.0, -1.0)  # attached after f0
        r2 = srv.submit(f(2))      # frame 1: slot 1's first frame
        assert tuple(r2["gaze"][1]) == (-1.0, -1.0)
        r3 = srv.flush()           # frame 2: slot 1's first REAL pair
        assert (r3["gaze"][1] >= 0).all()

        # The new stream's outputs equal a fresh single-stream server's
        # on the same frame sequence (no stale-frame poisoning).
        ref = StreamServer(cfg, variables, max_streams=2)
        ref.attach(1)
        ref.tick(f(1))
        ref_out = ref.tick(f(2))
        np.testing.assert_array_equal(r3["gaze"][1], ref_out["gaze"][1])

    def test_idt_labels_from_gaze_history(self, served):
        """Self-running mode: fixation bits derive from the trailing
        predicted-gaze window (dispersion under threshold + full window),
        so a new fixation after a saccade re-fires the LSTM onset."""
        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=3,
                           idt_dispersion_px=5.0, idt_window=3)
        srv.attach(0)
        srv.attach(1)
        srv.attach(2)
        # slot 0: steady gaze -> fixation; slot 1: moving -> saccade;
        # slot 2: window not yet full (one NaN) -> no fixation
        srv._gaze_hist[0] = [[10, 10], [11, 10], [10, 11]]
        srv._gaze_hist[1] = [[2, 2], [10, 10], [20, 20]]
        srv._gaze_hist[2] = [[np.nan, np.nan], [10, 10], [10, 10]]
        np.testing.assert_array_equal(srv._idt_labels(), [1.0, 0.0, 0.0])

    def test_default_mode_advances_lstm_on_new_fixations(self, served):
        """With fixation_source='idt' (default), a steady predicted-gaze
        stream eventually raises a fixation onset — unlike the 'static'
        mode, whose single onset freezes attention for the stream's life."""
        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=1,
                           idt_dispersion_px=64.0, idt_window=2)
        srv.attach(0)
        onsets = 0
        prev_fix = 0.0
        for t in range(len(frames)):
            srv.tick(frames[t : t + 1])
            fix = float(np.asarray(srv._state.prev_fix)[0])
            onsets += int(fix == 1.0 and prev_fix == 0.0)
            prev_fix = fix
        assert onsets >= 1  # the LSTM actually advanced in self-running mode

    def test_static_mode_and_always_alias(self, served):
        """'static' fires exactly one onset per stream life; 'always' is a
        deprecated alias that warns and maps to the same behavior."""
        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=1,
                           fixation_source="static")
        srv.attach(0)
        onsets = 0
        prev_fix = 0.0
        for t in range(len(frames)):
            srv.tick(frames[t : t + 1])
            fix = float(np.asarray(srv._state.prev_fix)[0])
            onsets += int(fix == 1.0 and prev_fix == 0.0)
            prev_fix = fix
        assert onsets == 1  # onset gating: exactly one LSTM advance

        with pytest.warns(DeprecationWarning, match="static"):
            alias = StreamServer(cfg, variables, max_streams=1,
                                 fixation_source="always")
        assert alias.fixation_source == "static"

        with pytest.raises(ValueError):
            StreamServer(cfg, variables, max_streams=1,
                         fixation_source="sometimes")


class TestMeshServing:
    """Multi-chip serving: StreamServer(mesh=...) shards the stream pool
    over the data axis with state device-resident sharded between ticks;
    results must match the unsharded server exactly (each stream is
    independent — the program has zero cross-device collectives)."""

    def test_matches_unsharded(self, served):
        from gaze_tpu.parallel.mesh import make_mesh

        cfg, variables, frames, fixsac = served
        mesh = make_mesh()  # all 8 virtual CPU devices
        n_dev = len(jax.devices())
        assert n_dev == 8, "test env should pin 8 virtual devices"
        S = 2 * n_dev
        plain = StreamServer(cfg, variables, max_streams=S,
                             keep_heatmaps=True)
        meshed = StreamServer(cfg, variables, max_streams=S,
                              keep_heatmaps=True, mesh=mesh)
        for srv in (plain, meshed):
            for s in range(0, S, 3):  # leave gaps: inactive-slot masking
                srv.attach(s)
        rng = np.random.default_rng(0)
        order = rng.permutation(len(frames))
        for t in range(4):
            batch = np.stack(
                [frames[order[(t + i) % len(frames)]] for i in range(S)]
            )
            fix = np.asarray(
                [fixsac[(t + i) % len(fixsac)] for i in range(S)], np.float32
            )
            a = plain.tick(batch, fix)
            b = meshed.tick(batch, fix)
            for k in a:
                # atol 5e-6: the per-shard program tiles/reduces convs in
                # a different order than the full-batch program (measured
                # 1.8e-6 max on the min-max-amplified attention map);
                # gaze argmaxes must still agree exactly below.
                np.testing.assert_allclose(
                    a[k], b[k], atol=5e-6, err_msg=f"tick {t} key {k}"
                )
            np.testing.assert_array_equal(a["gaze"], b["gaze"])
        # shard layout really is batch-split over the mesh
        leaf = jax.tree_util.tree_leaves(meshed._state)[0]
        assert len(leaf.sharding.device_set) == n_dev

    def test_attach_during_submit_on_mesh(self, served):
        """The submit-pipeline drain also holds on the meshed server:
        attaching mid-pipeline must not poison the new stream."""
        from gaze_tpu.parallel.mesh import make_mesh

        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=8, mesh=make_mesh())
        srv.attach(0)
        f = lambda t: np.stack([frames[t]] * 8)
        assert srv.submit(f(0)) is None
        srv.attach(1)
        r1 = srv.submit(f(1))  # drained frame-0 result
        assert tuple(r1["gaze"][1]) == (-1.0, -1.0)
        r2 = srv.submit(f(2))  # frame 1: slot 1's first frame
        assert tuple(r2["gaze"][1]) == (-1.0, -1.0)
        r3 = srv.flush()       # frame 2: slot 1's first real pair
        assert (r3["gaze"][1] >= 0).all()

    def test_divisibility_guard(self, served):
        from gaze_tpu.parallel.mesh import make_mesh

        cfg, variables, _, _ = served
        with pytest.raises(ValueError, match="divide evenly"):
            StreamServer(cfg, variables, max_streams=9, mesh=make_mesh())

    def test_attach_detach_on_mesh(self, served):
        """Slot lifecycle under sharding: reattach resets recurrent state
        (the eager slot update + reshard path)."""
        from gaze_tpu.parallel.mesh import make_mesh

        cfg, variables, frames, fixsac = served
        srv = StreamServer(cfg, variables, max_streams=8, mesh=make_mesh())
        srv.attach(3)
        srv.tick(np.stack([frames[0]] * 8))
        out1 = srv.tick(np.stack([frames[1]] * 8))
        assert (out1["gaze"][3] >= 0).all()
        srv.detach(3)
        out = srv.tick(np.stack([frames[2]] * 8))
        assert tuple(out["gaze"][3]) == (-1.0, -1.0)
        srv.attach(3)  # fresh state: first frame sentinel again
        out = srv.tick(np.stack([frames[3]] * 8))
        assert tuple(out["gaze"][3]) == (-1.0, -1.0)
