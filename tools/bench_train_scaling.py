"""SP train-step scaling curves: DP device count + grad-accum cost.

Measures, for a FIXED global batch:
  - steps/sec of the data-parallel SP train step on a 1/2/4/8-device
    mesh (the virtual CPU mesh when no real multi-chip exists — this
    host), and
  - the cost curve of exact in-jit gradient accumulation (K microbatches
    scanned inside one step, train/common.microbatch_value_and_grad).

HONESTY NOTE (read before quoting numbers): this environment has ONE
physical host vCPU and one TPU chip. On the virtual CPU mesh the
"devices" time-share a single core, so the DP curve here measures SPMD
*partitioning overhead* — a flat curve means sharding the step adds no
cost and the collective schedule is sane, NOT that training got faster.
Real DP speedup needs real chips (SURVEY.md §0; the 8-device dryrun in
__graft_entry__.py validates the same sharded step compiles/executes).

Usage:
    python tools/bench_train_scaling.py [--batch 16] [--image_size 64]
        [--steps 4] [--repeats 3] [--out BENCH_train_scaling.json]

Prints one JSON line per measurement plus a final summary line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# Virtual CPU mesh: sanitize the axon TPU env via the shared helper in
# gaze_tpu.testenv (the sitecustomize grabs the TPU at interpreter
# start, and remote compiles would dominate the timing). The helper also
# fires on a CLEAN environment whenever JAX_NUM_CPU_DEVICES isn't pinned
# to 8 — otherwise the dp2/dp4/dp8 rows (the tool's headline output)
# would silently all report "skipped" on a 1-device default process.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
_SENTINEL = "GAZE_TPU_SCALING_REEXEC"


def _reexec_helpers():
    # Deferred import so the testenv module's own plugin-mode re-exec
    # logic (sentinel'd separately) can't fire from this import.
    os.environ.setdefault("GAZE_TPU_TEST_REEXEC", "1")
    from gaze_tpu.testenv import needs_cpu_reexec, sanitized_cpu_env

    return needs_cpu_reexec, sanitized_cpu_env


_needs, _env = _reexec_helpers()
if _needs(_SENTINEL):
    os.execve(sys.executable, [sys.executable] + sys.argv, _env(_SENTINEL))

import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16,
                   help="fixed GLOBAL batch across every device count")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--accum", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
    )
    from gaze_tpu.core.config import (
        ATConfig,
        ImageConfig,
        PipelineConfig,
        TVL1Config,
    )
    from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator
    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.parallel.mesh import make_mesh
    from gaze_tpu.train.sp import create_sp_state, make_sp_train_step

    n = args.image_size
    cfg = PipelineConfig(
        image=ImageConfig(height=n, width=n),
        # Reduced solver effort: the point is RELATIVE scaling of the
        # full fused step, and CPU TV-L1 at IPOL effort would dominate.
        tvl1=TVL1Config(pyramid_levels=3, warps=2, iters=5),
        at=ATConfig(feature_stride=16, roi_size=1),
    )

    batch = next(
        batch_iterator(
            SyntheticSpec(num_frames=args.batch * 2 + 1, height=n, width=n),
            args.batch, 1,
        )
    )

    def time_step(pipeline, mesh, label):
        state = create_sp_state(jax.random.key(0), pipeline)
        step = make_sp_train_step(pipeline, mesh)
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        state, m = step(state, b)
        float(m["loss"])  # compile + sync
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, m = step(state, b)
            float(m["loss"])
            times.append((time.perf_counter() - t0) / args.steps)
        row = {
            "label": label,
            "global_batch": args.batch,
            "steps_per_sec": round(1.0 / min(times), 3),
            "frames_per_sec": round(args.batch / min(times), 2),
            "mean_steps_per_sec": round(float(1.0 / np.mean(times)), 3),
        }
        print(json.dumps(row))
        return row

    rows = []
    avail = jax.device_count()
    for d in args.devices:
        if d > avail or args.batch % d:
            print(json.dumps({"label": f"dp{d}", "skipped":
                              f"devices={avail}, batch%{d}"}))
            continue
        mesh = make_mesh(d) if d > 1 else None
        rows.append(time_step(GazePipeline(cfg), mesh, f"dp{d}"))

    for k in args.accum:
        if args.batch % k:
            continue
        cfg_k = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, grad_accum=k)
        )
        rows.append(time_step(GazePipeline(cfg_k), None, f"accum{k}"))

    base = next((r for r in rows if r["label"] == "dp1"), None)
    summary = {
        "metric": "sp_train_scaling",
        "platform": jax.devices()[0].platform,
        "note": ("virtual-device mesh on shared host cores: DP curve = "
                 "SPMD partitioning overhead, not parallel speedup"),
        "rows": rows,
        "dp_overhead_vs_dp1": {
            r["label"]: round(base["steps_per_sec"] / r["steps_per_sec"], 3)
            for r in rows if base and r["label"].startswith("dp")
        },
        "accum_cost_vs_accum1": {},
    }
    a1 = next((r for r in rows if r["label"] == "accum1"), None)
    if a1:
        summary["accum_cost_vs_accum1"] = {
            r["label"]: round(a1["steps_per_sec"] / r["steps_per_sec"], 3)
            for r in rows if r["label"].startswith("accum")
        }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
