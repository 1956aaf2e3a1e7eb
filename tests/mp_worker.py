"""Multi-process DP worker: one OS process of a 2-process gloo job.

Launched by tests/test_multiprocess.py as a real subprocess (NOT a
virtual-device simulation): each process owns JAX_NUM_CPU_DEVICES local
CPU devices, joins the coordinator via
``gaze_tpu.core.distributed.initialize(cpu_collectives="gloo")``, feeds
only its ``local_batch_slice`` of the global batch, and runs the actual
SP data-parallel train step — the gradient all-reduce crosses the
process boundary through gloo exactly as it would cross DCN between TPU
hosts. Each rank dumps its losses + final (replicated) params so the
driver can check cross-rank bit-agreement and equality with a
single-process run on the same global batch.

The reference has no distributed path at all (SURVEY.md §5 [U] — single
GPU); this is the executable proof of the TPU build's multi-host story.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def tiny_config():
    from gaze_tpu.core.config import (
        ATConfig,
        ImageConfig,
        PipelineConfig,
        TrainConfig,
        TVL1Config,
    )

    return PipelineConfig(
        image=ImageConfig(height=32, width=32, heatmap_sigma=4.0),
        tvl1=TVL1Config(pyramid_levels=2, warps=2, iters=5),
        at=ATConfig(feature_stride=16, roi_size=1),
        train=TrainConfig(batch_size=8, learning_rate=1e-3),
    )


def global_sp_batch(batch_size: int = 8):
    """The deterministic global batch every rank (and the driver) agrees on."""
    from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator

    spec = SyntheticSpec(num_frames=24, height=32, width=32, blob_sigma=3.0)
    return next(batch_iterator(spec, batch_size=batch_size, num_batches=1))


def reference_run(num_steps: int = 2):
    """Single-process plain-jit run of the same problem (driver-side)."""
    import jax
    import optax

    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.train.common import make_state
    from gaze_tpu.train.sp import make_sp_train_step

    pipeline = GazePipeline(tiny_config())
    batch = global_sp_batch()
    variables = _init_variables(pipeline)
    state = make_state(variables, optax.sgd(0.1))
    step = make_sp_train_step(pipeline)
    losses = []
    for _ in range(num_steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, jax.tree_util.tree_map(
        lambda x: __import__("numpy").asarray(x), state.params
    )


def _init_variables(pipeline):
    import jax
    import jax.numpy as jnp

    h, w = pipeline.config.image.height, pipeline.config.image.width
    return pipeline.sp.init(
        jax.random.key(0),
        jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, pipeline.config.sp.flow_channels)),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True, help="npz path for this rank")
    ap.add_argument("--num_steps", type=int, default=2)
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
    assert jax.process_count() == args.num_processes
    local = jax.local_device_count()

    import numpy as np
    import optax

    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.train.common import make_state
    from gaze_tpu.train.sp import make_sp_train_step

    mesh = distributed.global_mesh()
    assert mesh.size == args.num_processes * local

    # Establish the gloo context BEFORE the big train-step compile: the
    # context's key-value rendezvous has a hard 30 s deadline, and on a
    # 1-core host the two ranks' train-step compiles can skew by more
    # than that (observed: rank 0 enters the first all-reduce, times out
    # "Gloo context initialization failed: DEADLINE_EXCEEDED ... 30 s"
    # while rank 1 is still compiling). A trivial collective compiles in
    # seconds on both ranks — it creates the context while the ranks are
    # still aligned from the init barrier; the train step then reuses it
    # and compile skew no longer races the rendezvous.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo_context_warmup")

    pipeline = GazePipeline(tiny_config())
    batch = global_sp_batch()
    # Per-host input sharding: this process materializes ONLY its rows.
    sl = distributed.local_batch_slice(batch["gaze"].shape[0])
    local_batch = {k: v[sl] for k, v in batch.items()}
    global_batch = jax.tree_util.tree_map(
        lambda x: distributed.host_sharded_array(x, mesh), local_batch
    )

    variables = _init_variables(pipeline)
    state = make_state(variables, optax.sgd(0.1))
    step = make_sp_train_step(pipeline, mesh)

    # AOT-compile the step (purely local — no cross-process traffic),
    # then barrier: execution of the first collective starts with the
    # ranks aligned, so no gloo rendezvous deadline can race a slow
    # compile on this 1-core host.
    compiled = step.lower(state, global_batch).compile()
    multihost_utils.sync_global_devices("train_step_compiled")

    losses = []
    for _ in range(args.num_steps):
        state, metrics = compiled(state, global_batch)
        # Replicated scalar: every rank reads the identical value.
        losses.append(float(metrics["loss"]))

    # Params are replicated — each rank holds a full copy on its local
    # devices; addressable_data(0) reads it without cross-process gather.
    flat, treedef = jax.tree_util.tree_flatten(state.params)
    out = {f"param_{i}": np.asarray(leaf.addressable_data(0)) for i, leaf in enumerate(flat)}
    out["losses"] = np.asarray(losses, np.float64)
    out["process_count"] = np.asarray(jax.process_count())
    out["device_count"] = np.asarray(jax.device_count())
    np.savez(args.out, **out)
    # Re-align before interpreter exit so neither rank waits anywhere
    # near the coordination service's shutdown barrier timeout.
    multihost_utils.sync_global_devices("pre_shutdown")
    print(f"[rank {args.process_id}] OK losses={losses}", flush=True)


if __name__ == "__main__":
    main()
