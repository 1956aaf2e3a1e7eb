"""Serving cold-start benchmark: compile + first-tick latency of the
quantized pipeline, three ways.

  inline   — quant weights closure-captured as program constants
             (the pre-round-5 behavior; ~30 MB of literals per program)
  operand  — weights as jit operands (models/pipeline.quant_as_operand)
  server   — StreamServer's AOT AUTO-layout fast path (first tick)

Every form compiles against a FRESH compilation-cache directory so the
numbers are honest cold starts; steady-state step time is reported too
(the operand form pays a per-step weight relayout unless the AUTO
layout path is active — docs/STATUS.md round-5).

    python tools/bench_coldstart.py [--batch 32] [--image_size 224]

One JSON line per form on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Fresh cache: cold numbers. (The default .jax_cache would make
    # every run after the first read as instant.)
    jax.config.update(
        "jax_compilation_cache_dir", tempfile.mkdtemp(prefix="coldstart_")
    )

    from gaze_tpu.core.config import production_fast_config
    from gaze_tpu.models.pipeline import GazePipeline, make_step_fn
    from gaze_tpu.models.quant import calibrate_pipeline_sp
    from gaze_tpu.serve import StreamServer
    from gaze_tpu.utils.profiling import RELAY_RTT_S

    B, hw = args.batch, args.image_size
    cfg = production_fast_config()
    cfg = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, height=hw, width=hw)
    )
    pipe = GazePipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init_variables(jax.random.key(0))
    rng = np.random.default_rng(0)
    prev = rng.integers(0, 255, (B, hw, hw, 3), np.uint8)
    cur = rng.integers(0, 255, (B, hw, hw, 3), np.uint8)
    qsp = calibrate_pipeline_sp(pipe, variables, [(prev, cur)],
                                bf16_stem=True)
    qpipe = dataclasses.replace(pipe, quant_sp=qsp)
    fix = jnp.ones((B,), jnp.float32)
    prev_j, cur_j = jnp.asarray(prev), jnp.asarray(cur)

    def steady(call):
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            r = None
            for _ in range(8):
                r = call()
            jax.block_until_ready(r)
            float(np.asarray(r["gaze"])[0, 0] if isinstance(r, dict)
                  else r[1]["gaze"][0, 0])
            times.append(
                max(time.perf_counter() - t0 - RELAY_RTT_S, 0.0) / 8
            )
        return min(times)

    rows = []

    # inline constants (old behavior)
    st = qpipe.init_state(B)
    fn = jax.jit(qpipe.step)
    t0 = time.perf_counter()
    _, out = fn(variables, st, prev_j, cur_j, fix)
    float(np.asarray(out["gaze"])[0, 0])
    cold = time.perf_counter() - t0
    t = steady(lambda: fn(variables, st, prev_j, cur_j, fix))
    rows.append({"form": "inline_constants", "cold_s": round(cold, 1),
                 "steady_ms": round(t * 1e3, 2)})

    # operand form
    ofn = make_step_fn(qpipe)
    t0 = time.perf_counter()
    _, out = ofn(variables, st, prev_j, cur_j, fix)
    float(np.asarray(out["gaze"])[0, 0])
    cold = time.perf_counter() - t0
    t = steady(lambda: ofn(variables, st, prev_j, cur_j, fix))
    rows.append({"form": "operand", "cold_s": round(cold, 1),
                 "steady_ms": round(t * 1e3, 2)})

    # StreamServer AOT AUTO-layout path (first tick = compile + run)
    srv = StreamServer(cfg, variables, max_streams=B, dtype=jnp.bfloat16,
                       quant_sp=qsp)
    for s in range(B):
        srv.attach(s)
    t0 = time.perf_counter()
    srv.tick(prev)
    cold = time.perf_counter() - t0
    t = steady(lambda: srv.tick(cur))
    rows.append({"form": "server_aot_auto", "cold_s": round(cold, 1),
                 "steady_ms": round(t * 1e3, 2),
                 # The server loop includes PER-TICK host I/O (frame H2D
                 # + gaze D2H sync); on this development relay that
                 # transport dominates steady_ms — compare cold_s across
                 # rows, and the step-level rows for steady-state
                 # compute (bench.py --mode serve has the same caveat).
                 "steady_transport_bound": True})

    for r in rows:
        r.update({"metric": "serve_coldstart", "batch": B, "image": hw})
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
