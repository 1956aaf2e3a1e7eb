"""Measure the remat (jax.checkpoint) memory/throughput tradeoff on TPU.

For each SPConfig.remat mode, compiles the FULL SP train step (TV-L1 +
two-stream forward + floss + backward + AdamW) at the given batch/image
size and reports:

  - XLA's compiled memory analysis: temp (activation workspace),
    argument, output and total HBM bytes — the number that bounds the
    per-chip batch size;
  - measured steady-state step time / frames-per-second (relay-aware
    sync: pipelined dispatches, one trailing scalar pull).

    python tools/bench_remat.py [--batch 32] [--image_size 224]
                                [--dtype bf16|f32] [--repeats 3]
                                [--modes none,encoders,full]

One JSON line per mode on stdout; human table on stderr. The semantics
(identical grads/params across modes) are CI-pinned by
tests/test_remat.py; this tool exists for the measured tradeoff
(docs/STATUS.md round-5 table).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_mode(mode: str, batch: int, hw: int, dtype_name: str,
               repeats: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaze_tpu.core.config import default_config
    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.train.sp import create_sp_state, make_sp_train_step
    from gaze_tpu.utils.profiling import RELAY_RTT_S

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        image=dataclasses.replace(cfg.image, height=hw, width=hw),
        sp=dataclasses.replace(cfg.sp, remat=mode),
        train=dataclasses.replace(
            cfg.train,
            batch_size=batch,
            compute_dtype="bfloat16" if dtype_name == "bf16" else "float32",
        ),
    )
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    pipeline = GazePipeline(cfg, dtype=dtype)
    state = create_sp_state(jax.random.key(0), pipeline)
    step = make_sp_train_step(pipeline)

    rng = np.random.default_rng(0)
    batch_d = {
        "prev": rng.integers(0, 255, (batch, hw, hw, 3), np.uint8),
        "cur": rng.integers(0, 255, (batch, hw, hw, 3), np.uint8),
        "gaze": rng.uniform(10, hw - 10, (batch, 2)).astype(np.float32),
        "valid": np.ones((batch,), np.float32),
    }

    lowered = step.lower(state, batch_d)
    compiled = lowered.compile()
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "argument_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "output_mb": round(ma.output_size_in_bytes / 1e6, 1),
            "total_mb": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.generated_code_size_in_bytes) / 1e6, 1),
        }
    except Exception as e:  # relay backends may not expose it
        mem = {"memory_analysis_error": str(e)[:120]}

    # Warm + steady state (one optimizer step feeds the next).
    state, m = step(state, batch_d)
    float(m["loss"])
    iters = 4
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            state, r = step(state, batch_d)
        float(r["loss"])
        times.append(max(time.perf_counter() - t0 - RELAY_RTT_S, 0.0) / iters)
    t = min(times)
    return {
        "metric": "remat_train_step",
        "remat": mode,
        "batch": batch,
        "image": hw,
        "dtype": dtype_name,
        "ms_per_step": round(t * 1e3, 2),
        "frames_per_sec": round(batch / t, 1),
        "mean_ms": round(1e3 * float(np.mean(times)), 2),
        "std_ms": round(1e3 * float(np.std(times)), 2),
        **mem,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--modes", default="none,encoders,full")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rows = []
    for mode in args.modes.split(","):
        row = bench_mode(mode, args.batch, args.image_size, args.dtype,
                         args.repeats)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(f"\n{'remat':<10}{'ms':>9}{'fps':>9}{'temp MB':>10}{'total MB':>10}",
          file=sys.stderr)
    for r in rows:
        print(f"{r['remat']:<10}{r['ms_per_step']:>9}{r['frames_per_sec']:>9}"
              f"{r.get('temp_mb', '-'):>10}{r.get('total_mb', '-'):>10}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
