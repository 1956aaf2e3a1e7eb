"""End-to-end throughput benchmark: multi-stream gaze inference.

Measures the parity-critical full-pipeline path of SURVEY.md §3.4 — on-TPU
TV-L1 flow + two-stream SP + AT LSTM step + LF fusion, batched over B
independent video streams and scanned over T frames in one jit — and
prints ONE JSON line:

    {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": N/500}

Baseline: BASELINE.json's binding target of >=500 frames/sec/chip
(the reference publishes no throughput numbers — SURVEY.md §6).

Presets (--preset; individual flags override):
  turbo (default): bf16 tail + int8-PTQ VGG streams + half-grid TV-L1 at
    reduced effort (warps 3, iters 5). The fastest configuration whose
    rollout AAE/AUC on trained checkpoints sits inside the noise band of
    the parity path (docs/STATUS.md round-2 tables; BENCH_quant_r2.json).
  production: bf16 + half-grid flow, full IPOL solver effort, no quant.
  parity: float32, full-grid flow — the exact-math reference path.

Compile time is excluded; steady-state wall clock over several repeats.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _stream_seqs(batch: int, num_frames: int, image_size: int):
    """Distinct per-stream synthetic content, cycled over G seeds.

    Throughput is content-independent on this dense pipeline, but
    identical broadcast clips would leave that unproven. Returns
    (G, [ (frames, gaze, fixsac) x G ]); stream i uses seqs[i % G].
    """
    from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence

    G = min(batch, 16)
    seqs = [
        generate_sequence(
            SyntheticSpec(num_frames=num_frames, height=image_size,
                          width=image_size, seed=s)
        )
        for s in range(G)
    ]
    return G, seqs


# Named configurations (module docstring). Module-level so tools
# (tools/roofline.py) analyze exactly the benchmarked settings.
PRESETS = {
    # turbo calibrates at the 99.9th |x| percentile: identical fps
    # to max-calibration and measurably better rollout accuracy on
    # the trained checkpoints (AAE 1.534 vs 1.591, round-3 table in
    # docs/STATUS.md) — outliers no longer stretch the int8 grid.
    "turbo": dict(dtype="bfloat16", flow_scale=0.5, tvl1_warps=3,
                  tvl1_iters=5, quant=True, quant_percentile=99.9,
                  quant_stem="bf16", decoder="deconv"),
    "production": dict(dtype="bfloat16", flow_scale=0.5, tvl1_warps=None,
                       tvl1_iters=None, quant=False,
                       quant_percentile=None, quant_stem="int8",
                       decoder="deconv"),
    "parity": dict(dtype="float32", flow_scale=1.0, tvl1_warps=None,
                   tvl1_iters=None, quant=False, quant_percentile=None,
                   quant_stem="int8", decoder="deconv"),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", 128)))
    p.add_argument("--frames", type=int, default=int(os.environ.get("BENCH_FRAMES", 8)))
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--preset", choices=["turbo", "production", "parity"],
                   default=None,
                   help="named configuration (see module docstring); "
                        "individual flags below override its choices. "
                        "Default: turbo (infer/serve), production (train)")
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--flow_scale", type=float, default=None,
                   help="solve TV-L1 at this fraction of the model grid "
                        "(1.0 = parity)")
    p.add_argument("--tvl1_warps", type=int, default=None,
                   help="override TV-L1 warps per level (accuracy knob; "
                        "pair with the CLI --tvl1_warps eval ablation)")
    p.add_argument("--tvl1_iters", type=int, default=None,
                   help="override TV-L1 PD iterations per warp")
    p.add_argument("--tvl1_preset", choices=["ipol", "dense_flow"],
                   default="ipol",
                   help="base solver schedule (dense_flow = OpenCV "
                        "DualTVL1 defaults; core.config."
                        "dense_flow_tvl1_config)")
    p.add_argument("--quant_percentile", type=float, default=None,
                   help="PTQ calibration at this upper percentile of |x| "
                        "instead of the max (outlier-robust); <=0 forces "
                        "max-calibration (overriding turbo's 99.9 default)")
    p.add_argument("--quant_stem", choices=["int8", "bf16"], default=None,
                   help="conv1_1 precision in the quant path: bf16 runs "
                        "the 27-deep stem off the unquantized input "
                        "(faster AND more accurate on v5e — the int8 MXU "
                        "path can't win at contraction depth 27; "
                        "models/quant.py QuantVGG docstring)")
    p.add_argument("--quant_conv", choices=["xla", "pallas"], default=None,
                   help="int8 conv implementation for the quant streams: "
                        "pallas = implicit-im2col Pallas chain for the "
                        "deep stages (ops/pallas/conv_int8.py, "
                        "bit-identical to xla; measured slower in chain "
                        "on v5e — see the module's negative-result note)")
    p.add_argument("--quant", choices=["on", "off"], default=None,
                   help="int8-quantize the two VGG encoder streams "
                        "(PTQ calibrated on the bench streams; "
                        "models/quant.py) — int8 MXU serving path. "
                        "infer/serve modes only; train ignores it")
    p.add_argument("--decoder", choices=["deconv", "pixelshuffle", "halfres"],
                   default=None,
                   help="SP decoder tail: canonical ConvTranspose or the "
                        "exact polyphase re-formulation "
                        "(models/decode_fast.py, 4x fewer nominal MACs). "
                        "Inference surfaces only; parity keeps deconv")
    p.add_argument("--mode", choices=["infer", "train", "serve"], default="infer",
                   help="train: SP training-step throughput; serve: "
                        "end-to-end StreamServer tick loop (H2D + step + "
                        "per-tick gaze D2H) instead of the (default, "
                        "driver-facing) inference bench")
    args = p.parse_args()

    _PRESETS = PRESETS
    # Default preset: turbo for infer/serve, production for train (quant
    # and the reduced-effort solver are SERVING knobs). An EXPLICIT
    # --preset is honored in every mode — `--mode train --preset parity`
    # benchmarks the f32 full-grid path — except that train ignores
    # quant (there is no quantized train step; warn so the reader knows).
    if args.preset is None:
        args.preset = "production" if args.mode == "train" else "turbo"
    preset = _PRESETS[args.preset]
    if args.mode == "train" and preset["quant"]:
        import sys

        print(f"bench: --preset {args.preset} requests int8 quant, which "
              "has no train step; benchmarking its dtype/solver settings "
              "unquantized", file=sys.stderr)
    if args.dtype is None:
        args.dtype = preset["dtype"]
    if args.flow_scale is None:
        args.flow_scale = preset["flow_scale"]
    if args.tvl1_warps is None:
        args.tvl1_warps = preset["tvl1_warps"]
    if args.tvl1_iters is None:
        args.tvl1_iters = preset["tvl1_iters"]
    if args.quant_percentile is None:
        args.quant_percentile = preset["quant_percentile"]
    elif args.quant_percentile <= 0:
        args.quant_percentile = None  # explicit max-calibration
    args.quant = preset["quant"] if args.quant is None else args.quant == "on"
    if args.quant_stem is None:
        args.quant_stem = preset["quant_stem"]
    if args.quant_conv is None:
        args.quant_conv = preset.get("quant_conv", "xla")
    if args.decoder is None:
        # The polyphase tail is exact but inference-only (BN folded on
        # running stats) — the train bench keeps the canonical module.
        args.decoder = "deconv" if args.mode == "train" else preset["decoder"]

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gaze_tpu.core.config import default_config
    from gaze_tpu.models.pipeline import GazePipeline, make_clip_fn

    import dataclasses

    cfg = default_config()
    if args.tvl1_preset == "dense_flow":
        from gaze_tpu.core.config import dense_flow_tvl1_config

        cfg = dataclasses.replace(cfg, tvl1=dense_flow_tvl1_config())
    tvl1_over = {"flow_scale": args.flow_scale}
    if args.tvl1_warps is not None:
        tvl1_over["warps"] = args.tvl1_warps
    if args.tvl1_iters is not None:
        tvl1_over["iters"] = args.tvl1_iters
    cfg = dataclasses.replace(
        cfg,
        image=dataclasses.replace(cfg.image, height=args.image_size, width=args.image_size),
        tvl1=dataclasses.replace(cfg.tvl1, **tvl1_over),
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipeline = GazePipeline(cfg, dtype=dtype, decoder_impl=args.decoder)

    if args.mode == "train":
        from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator
        from gaze_tpu.train.sp import create_sp_state, make_sp_train_step

        state = create_sp_state(jax.random.key(0), pipeline)
        step = make_sp_train_step(pipeline)
        batch = next(
            batch_iterator(
                SyntheticSpec(
                    num_frames=args.batch * 2 + 1,
                    height=args.image_size,
                    width=args.image_size,
                ),
                args.batch,
                1,
            )
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, m = step(state, batch)
        float(m["loss"])  # compile + sync
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step(state, batch)
            float(m["loss"])
            times.append((time.perf_counter() - t0) / 4)
        fps = args.batch / min(times)
        fps_all = args.batch / np.asarray(times)
        print(
            json.dumps(
                {
                    "metric": "train_frames_per_sec_per_chip",
                    "value": round(fps, 2),
                    "unit": "frames/s",
                    "vs_baseline": None,
                    "mean": round(float(fps_all.mean()), 2),
                    "std": round(float(fps_all.std()), 2),
                }
            )
        )
        return

    variables = pipeline.init_variables(jax.random.key(0))

    if args.mode == "serve":
        # Production-serving number: the full StreamServer loop — per-tick
        # H2D of B frames, the fused step, online I-DT fixation gating,
        # and the per-tick gaze D2H sync. submit() overlaps each tick's
        # H2D with the previous tick's compute. NOTE: on this axon-relay
        # environment the 19 MB/tick H2D rides a network tunnel
        # (~50 MB/s), so this mode measures the transport, not the chip
        # (~260 fps at B=128 vs ~1500 fps compute-side); on co-located
        # hardware PCIe H2D (~2 ms) would leave it compute-bound.
        from gaze_tpu.serve import StreamServer

        B, T = args.batch, max(args.frames, 4)
        G, seqs = _stream_seqs(B, T, args.image_size)
        qsp = None
        if args.quant:
            from gaze_tpu.models.quant import calibrate_pipeline_sp

            pairs = [(np.stack([s[0][t] for s in seqs]),
                      np.stack([s[0][t + 1] for s in seqs]))
                     for t in range(min(4, T - 1))]
            qsp = calibrate_pipeline_sp(pipeline, variables, pairs,
                                        percentile=args.quant_percentile,
                                        bf16_stem=args.quant_stem == "bf16")
        server = StreamServer(cfg, variables, max_streams=B, dtype=dtype,
                              quant_sp=qsp, decoder_impl=args.decoder,
                              quant_conv=args.quant_conv)
        for s in range(B):
            server.attach(s)
        ticks = [
            np.stack([seqs[i % G][0][t] for i in range(B)]) for t in range(T)
        ]
        for t in range(2):  # warm: compile + fill the submit pipeline
            server.submit(ticks[t])
        times = []
        tick_lat = []  # per-tick submit latency across ALL repeats
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for t in range(T):
                s0 = time.perf_counter()
                server.submit(ticks[t])
                tick_lat.append(time.perf_counter() - s0)
            times.append((time.perf_counter() - t0) / T)
        fps = args.batch / min(times)
        fps_all = args.batch / np.asarray(times)
        lat_ms = np.asarray(tick_lat) * 1e3
        print(
            json.dumps(
                {
                    "metric": "serve_frames_per_sec_per_chip",
                    "value": round(fps, 2),
                    "unit": "frames/s",
                    "vs_baseline": round(fps / 500.0, 3),
                    "mean": round(float(fps_all.mean()), 2),
                    "std": round(float(fps_all.std()), 2),
                    # "Real-time multi-stream" needs a latency number, not
                    # just fps: per-tick submit() latency percentiles (ms).
                    # Each tick serves `batch` streams, so a stream's
                    # frame-to-gaze latency is ~2 ticks (submit pipelining
                    # lags results by one frame).
                    "tick_latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 3),
                    "tick_latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 3),
                    "tick_latency_ms_p99": round(float(np.percentile(lat_ms, 99)), 3),
                    # On the axon relay the per-tick H2D rides a network
                    # tunnel; this mode then measures transport, not the
                    # chip — flag it in the artifact itself so the
                    # vs_baseline ratio is not read as a compute miss.
                    "transport_bound": True,
                }
            )
        )
        return

    clip_fn = make_clip_fn(pipeline)

    B, T = args.batch, args.frames
    G, seqs = _stream_seqs(B, T + 1, args.image_size)
    frames_b = jnp.asarray(np.stack([seqs[i % G][0] for i in range(B)]))
    fixsac_b = jnp.asarray(np.stack([seqs[i % G][2] for i in range(B)]))

    if args.quant:
        from gaze_tpu.models.quant import calibrate_pipeline_sp

        pairs = [(np.stack([s[0][t] for s in seqs]),
                  np.stack([s[0][t + 1] for s in seqs]))
                 for t in range(min(4, T))]  # seqs hold T+1 frames
        qsp = calibrate_pipeline_sp(pipeline, variables, pairs,
                                    percentile=args.quant_percentile,
                                    bf16_stem=args.quant_stem == "bf16")
        pipeline = dataclasses.replace(pipeline, quant_sp=qsp,
                                       quant_conv=args.quant_conv)
        clip_fn = make_clip_fn(pipeline)

    # NOTE on timing: this environment reaches the TPU through a relay
    # where block_until_ready() does not synchronize — only a D2H
    # materialization does (~25ms RTT). We therefore sync by pulling a
    # scalar checksum, and size each repeat (batch*frames) so the RTT is
    # amortized into the noise.
    @jax.jit
    def bench_fn(variables, frames_u8, fixsac):
        hm, gz = clip_fn(variables, frames_u8, fixsac)
        return hm[:, -1].sum()

    float(bench_fn(variables, frames_b, fixsac_b))  # warmup/compile

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(bench_fn(variables, frames_b, fixsac_b))
        times.append(time.perf_counter() - t0)

    best = min(times)
    fps = (B * T) / best
    fps_all = (B * T) / np.asarray(times)
    baseline_fps = 500.0
    print(
        json.dumps(
            {
                "metric": "frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
                # value keeps min-of-repeats for cross-round continuity;
                # mean/std capture run variance in the artifact itself.
                "mean": round(float(fps_all.mean()), 2),
                "std": round(float(fps_all.std()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
