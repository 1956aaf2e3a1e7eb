"""Roofline analysis of the fused SURVEY.md §3.4 inference step.

Quantifies "how close to speed-of-light" each bench preset runs on this
chip: XLA's own cost model for the compiled executable (``flops``,
``bytes accessed`` from ``Compiled.cost_analysis()``) combined with the
measured steady-state device time gives

  - achieved TOPS (MXU ops/s) and the fraction of the chip's peak,
  - achieved HBM GB/s and the fraction of peak bandwidth,
  - the program's arithmetic intensity vs the chip's ridge point,
    classifying each preset as compute- or bandwidth-bound.

    python tools/roofline.py [--preset turbo|production|parity|all]
                             [--batch 128] [--frames 8] [--repeats 3]

Prints one JSON line per preset plus a human-readable table on stderr.

Reading the numbers honestly (documented caveats, also emitted in the
JSON):

  * XLA counts MXU multiply-adds as 2 "flops" regardless of dtype — an
    int8 conv counts the same as its f32 twin — so the metric here is
    *ops*, compared against the peak for the dtype actually feeding the
    MXU (int8 convs on the quant path, bf16/f32 elsewhere). Mixed
    programs (turbo = int8 convs + bf16 tail + f32 solver) are bounded
    against BOTH peaks; the truth sits between.
  * ``bytes accessed`` is the cost model's HLO-level estimate: each
    fusion's operands + outputs. Buffers that stay VMEM-resident across
    fusions still count, so it over-estimates true HBM traffic — the
    achieved-GB/s figure is an upper bound on required bandwidth, which
    is the conservative direction for "are we bandwidth-bound".
  * Peaks are data-sheet numbers keyed on PALLAS_AXON_TPU_GEN (v5e:
    197 bf16 TFLOPS / 394 int8 TOPS / 819 GB/s HBM). f32 has no native
    MXU path on v5e — XLA upcasts through bf16 passes — so the parity
    preset is compared against the bf16 peak with that caveat.

Reference has no analog (it publishes no throughput numbers at all,
SURVEY.md §6); this is the TPU-build's own speed-of-light accounting.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Data-sheet peaks per TPU generation: (dense-matmul TFLOPS by dtype,
# HBM GB/s). v5e from the public v5e spec; v4/v6e rows for portability.
_PEAKS = {
    "v4": {"bf16": 275e12, "int8": 275e12, "hbm": 1228e9},
    "v5e": {"bf16": 197e12, "int8": 394e12, "hbm": 819e9},
    "v5p": {"bf16": 459e12, "int8": 918e12, "hbm": 2765e9},
    "v6e": {"bf16": 918e12, "int8": 1836e12, "hbm": 1640e9},
}


def _tpu_gen() -> str:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if gen in _PEAKS:
        return gen
    try:
        import json as _json

        with open("/var/tmp/tool_runtime_env.json") as f:
            gen = _json.load(f).get("PALLAS_AXON_TPU_GEN", "")
    except (OSError, ValueError):  # ValueError covers JSONDecodeError
        pass
    return gen if gen in _PEAKS else "v5e"


def analyze_preset(name: str, batch: int, frames: int, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from gaze_tpu.core.config import default_config
    from gaze_tpu.models.pipeline import GazePipeline, make_clip_fn

    preset = bench.PRESETS[name]
    cfg = default_config()
    tvl1_over = {"flow_scale": preset["flow_scale"]}
    if preset["tvl1_warps"] is not None:
        tvl1_over["warps"] = preset["tvl1_warps"]
    if preset["tvl1_iters"] is not None:
        tvl1_over["iters"] = preset["tvl1_iters"]
    cfg = dataclasses.replace(
        cfg, tvl1=dataclasses.replace(cfg.tvl1, **tvl1_over)
    )
    dtype = jnp.bfloat16 if preset["dtype"] == "bfloat16" else jnp.float32
    pipeline = GazePipeline(cfg, dtype=dtype, decoder_impl=preset["decoder"])
    variables = pipeline.init_variables(jax.random.key(0))

    B, T = batch, frames
    G, seqs = bench._stream_seqs(B, T + 1, cfg.image.height)
    frames_b = jnp.asarray(np.stack([seqs[i % G][0] for i in range(B)]))
    fixsac_b = jnp.asarray(np.stack([seqs[i % G][2] for i in range(B)]))

    if preset["quant"]:
        from gaze_tpu.models.quant import calibrate_pipeline_sp

        pairs = [(np.stack([s[0][t] for s in seqs]),
                  np.stack([s[0][t + 1] for s in seqs]))
                 for t in range(min(4, T))]
        qsp = calibrate_pipeline_sp(pipeline, variables, pairs,
                                    percentile=preset["quant_percentile"],
                                    bf16_stem=preset["quant_stem"] == "bf16")
        # Mirror bench.py exactly, incl. the conv lowering knob — a preset
        # that sets quant_conv must analyze the same program it benches.
        pipeline = dataclasses.replace(
            pipeline, quant_sp=qsp,
            quant_conv=preset.get("quant_conv", "xla"),
        )
    clip_fn = make_clip_fn(pipeline)

    # Identical program to bench.py's driver-facing bench_fn.
    @jax.jit
    def bench_fn(variables, frames_u8, fixsac):
        hm, gz = clip_fn(variables, frames_u8, fixsac)
        return hm[:, -1].sum()

    compiled = bench_fn.lower(variables, frames_b, fixsac_b).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca["flops"])
    bytes_acc = float(ca["bytes accessed"])

    # Steady state, relay-aware: ``iters`` pipelined dispatches per timed
    # repeat with ONE trailing scalar pull (utils/profiling.device_time
    # pattern), RTT subtracted — so small --batch/--frames runs are not
    # dominated by the ~25 ms relay sync.
    from gaze_tpu.utils.profiling import RELAY_RTT_S

    float(bench_fn(variables, frames_b, fixsac_b))
    # One synced probe step sizes the pipeline: enough dispatches that the
    # residual sync jitter is <~10% of the repeat even at tiny B*T.
    t0 = time.perf_counter()
    float(bench_fn(variables, frames_b, fixsac_b))
    probe = max(time.perf_counter() - t0 - RELAY_RTT_S, 1e-4)
    iters = min(64, max(3, int(10 * RELAY_RTT_S / probe) + 1))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = bench_fn(variables, frames_b, fixsac_b)
        float(r)
        times.append(
            max(time.perf_counter() - t0 - RELAY_RTT_S, 0.0) / iters
        )
    t = min(times)

    gen = _tpu_gen()
    peaks = _PEAKS[gen]
    achieved_ops = flops / t
    achieved_bw = bytes_acc / t
    intensity = flops / bytes_acc
    ridge_bf16 = peaks["bf16"] / peaks["hbm"]
    # Attainable ops/s at this intensity under the bf16 roof (the
    # classic roofline): min(peak, intensity * bw_peak).
    roof_bf16 = min(peaks["bf16"], intensity * peaks["hbm"])
    out = {
        "metric": "roofline",
        "preset": name,
        "tpu_gen": gen,
        "batch": B,
        "frames": T,
        "ms_per_step": round(t * 1e3, 2),
        "fps": round(B * T / t, 1),
        "gops_per_frame": round(flops / (B * T) / 1e9, 2),
        "mbytes_per_frame": round(bytes_acc / (B * T) / 1e6, 2),
        "achieved_tops": round(achieved_ops / 1e12, 2),
        "achieved_gbps_upper_bound": round(achieved_bw / 1e9, 1),
        "arithmetic_intensity_ops_per_byte": round(intensity, 1),
        "ridge_point_bf16_ops_per_byte": round(ridge_bf16, 1),
        "pct_of_bf16_peak": round(100 * achieved_ops / peaks["bf16"], 1),
        "pct_of_int8_peak": round(100 * achieved_ops / peaks["int8"], 1),
        "pct_of_hbm_peak_upper_bound": round(
            100 * achieved_bw / peaks["hbm"], 1),
        "pct_of_bf16_roofline_at_this_intensity": round(
            100 * achieved_ops / roof_bf16, 1),
        "bound": "compute" if intensity >= ridge_bf16 else "bandwidth",
        "caveats": "ops counted dtype-blind by XLA; bytes are HLO-level "
                   "(HBM upper bound); f32 parity compared vs bf16 peak",
    }
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="all",
                   choices=["turbo", "production", "parity", "all"])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    names = ["turbo", "production", "parity"] if args.preset == "all" \
        else [args.preset]
    rows = []
    for name in names:
        row = analyze_preset(name, args.batch, args.frames, args.repeats)
        rows.append(row)
        print(json.dumps(row))
    hdr = (f"{'preset':<11}{'ms':>8}{'fps':>9}{'TOPS':>8}"
           f"{'%bf16':>7}{'%int8':>7}{'GB/s≤':>8}{'%HBM≤':>7}"
           f"{'AI':>7}  bound")
    print("\n" + hdr, file=sys.stderr)
    for r in rows:
        print(f"{r['preset']:<11}{r['ms_per_step']:>8}{r['fps']:>9}"
              f"{r['achieved_tops']:>8}{r['pct_of_bf16_peak']:>7}"
              f"{r['pct_of_int8_peak']:>7}"
              f"{r['achieved_gbps_upper_bound']:>8}"
              f"{r['pct_of_hbm_peak_upper_bound']:>7}"
              f"{r['arithmetic_intensity_ops_per_byte']:>7}  {r['bound']}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
