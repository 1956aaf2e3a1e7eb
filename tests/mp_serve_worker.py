"""Multi-process SERVING worker: one OS process of a 2-process gloo job
running a DistributedStreamServer (launched by tests/test_serve_mp.py).

Each rank owns half the stream pool: it feeds ONLY its local frames per
tick and records ONLY its local gaze — per-host serving I/O crossing a
real process boundary, the topology of a multi-host TPU serving fleet.
The per-tick program itself has zero collectives (streams are
independent); the gloo context exists only for the alignment barriers.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

_NARROW = ((8, 8), (8, 8), (16, 16, 16), (16, 16, 16), (32, 32, 32))
_T, _S = 3, 4  # ticks, global stream pool


def tiny_cfg():
    from gaze_tpu.core.config import (
        ATConfig,
        ImageConfig,
        PipelineConfig,
        SPConfig,
        TVL1Config,
    )

    return PipelineConfig(
        image=ImageConfig(height=32, width=32, heatmap_sigma=4.0),
        tvl1=TVL1Config(pyramid_levels=2, warps=2, iters=3),
        sp=SPConfig(stages=_NARROW, fused_channels=32,
                    decoder_channels=(16, 16, 8, 8)),
        at=ATConfig(feature_dim=32, hidden_size=32, feature_stride=16,
                    roi_size=1),
    )


def global_frames():
    """The deterministic (T, S, H, W, 3) frames every rank agrees on."""
    import numpy as np

    rng = np.random.default_rng(21)
    return rng.integers(0, 255, (_T, _S, 32, 32, 3), np.uint8)


def reference_run():
    """Single-process StreamServer on the same global pool (driver-side)."""
    import jax
    import numpy as np

    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.serve import StreamServer

    cfg = tiny_cfg()
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    srv = StreamServer(cfg, variables, max_streams=_S,
                       fixation_source="static")
    for s in range(_S):
        srv.attach(s)
    frames = global_frames()
    return np.stack([srv.tick(frames[t])["gaze"] for t in range(_T)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from gaze_tpu.core import distributed

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_collectives="gloo",
    )
    import numpy as np
    from jax.experimental import multihost_utils

    # Establish the gloo context while ranks are aligned (see
    # tests/mp_worker.py for the 30 s rendezvous-deadline rationale).
    multihost_utils.sync_global_devices("gloo_context_warmup")

    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.serve import DistributedStreamServer

    cfg = tiny_cfg()
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))  # same all ranks
    mesh = distributed.global_mesh()
    s_local = _S // args.num_processes
    srv = DistributedStreamServer(
        cfg, variables, streams_per_host=s_local, mesh=mesh,
        fixation_source="static",
    )
    for s in range(s_local):
        srv.attach(s)

    frames = global_frames()
    lo = args.process_id * s_local
    gaze = []
    for t in range(_T):
        out = srv.tick(frames[t, lo:lo + s_local])
        gaze.append(out["gaze"])

    np.savez(
        args.out,
        gaze=np.stack(gaze),
        process_count=np.asarray(jax.process_count()),
        device_count=np.asarray(jax.device_count()),
    )
    multihost_utils.sync_global_devices("pre_shutdown")
    print(f"[rank {args.process_id}] serving OK", flush=True)


if __name__ == "__main__":
    main()
