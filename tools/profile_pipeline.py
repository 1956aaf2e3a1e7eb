"""Per-component device-time breakdown of the fused inference step.

Times each stage of the SURVEY.md §3.4 path in isolation at benchmark
settings (steady-state, relay-aware sync via utils.profiling.device_time)
so optimization effort lands where the microseconds are:

    python tools/profile_pipeline.py --batch 128 [--dtype float32]
    python tools/profile_pipeline.py --flow_scale 1.0   # parity preset

Prints one JSON object with per-stage ms/batch and the implied fps.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16")
    p.add_argument("--flow_scale", type=float, default=0.5)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--tvl1_warps", type=int, default=None,
                   help="override TV-L1 warps per level")
    p.add_argument("--tvl1_iters", type=int, default=None,
                   help="override TV-L1 PD iterations per warp")
    p.add_argument("--quant_stem", choices=["int8", "bf16"], default="int8",
                   help="conv1_1 precision under --quant (bf16 = mixed "
                        "stem; models/quant.py QuantVGG docstring)")
    p.add_argument("--quant", action="store_true",
                   help="profile with int8-quantized SP streams "
                        "(models/quant.py; calibrated on the probe clip)")
    p.add_argument("--decoder", choices=["deconv", "pixelshuffle", "halfres"],
                   default="deconv",
                   help="SP decoder tail implementation "
                        "(models/decode_fast.py polyphase form)")
    p.add_argument("--no_rtt_correction", action="store_true",
                   help="skip the ~25 ms relay-RTT subtraction — use on "
                        "co-located hardware, where the subtraction "
                        "corrupts (and for fast ops can zero out) the "
                        "per-stage times")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)) or ".", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from gaze_tpu.core.config import default_config
    from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
    from gaze_tpu.models.at import LSTMNet, attention_map, fixation_pool
    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.ops.heatmap import heatmap_argmax
    from gaze_tpu.ops.image import resize_bilinear
    from gaze_tpu.ops.preprocess import resize_frames, rgb_to_gray, to_float
    from gaze_tpu.ops.tvl1 import tvl1_flow
    from gaze_tpu.utils.profiling import device_time

    cfg = default_config()
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
    variables = pipeline.init_variables(jax.random.key(0))
    if args.quant:
        from gaze_tpu.models.quant import calibrate_pipeline_sp

        f0, _, _ = generate_sequence(
            SyntheticSpec(num_frames=2, height=cfg.image.height,
                          width=cfg.image.width)
        )
        qsp = calibrate_pipeline_sp(
            pipeline, variables, [(f0[None, 0], f0[None, 1])],
            bf16_stem=args.quant_stem == "bf16",
        )
        pipeline = dataclasses.replace(pipeline, quant_sp=qsp)

    B, H, W = args.batch, cfg.image.height, cfg.image.width
    f, g, fx = generate_sequence(SyntheticSpec(num_frames=2, height=H, width=W))
    prev = jnp.asarray(np.broadcast_to(f[0], (B, H, W, 3)).copy())
    cur = jnp.asarray(np.broadcast_to(f[1], (B, H, W, 3)).copy())
    fix = jnp.ones((B,), jnp.float32)
    state = pipeline.init_state(B)

    # Precomputed stage inputs (all on device, realistic shapes/dtypes).
    g0 = rgb_to_gray(resize_frames(to_float(prev), H, W))
    g1 = rgb_to_gray(resize_frames(to_float(cur), H, W))
    s = cfg.tvl1.flow_scale
    fh, fw = int(round(H * s)), int(round(W * s))
    g0s, g1s = resize_bilinear(g0, (fh, fw)), resize_bilinear(g1, (fh, fw))
    rgb_in, flow_in = jax.jit(pipeline.preprocess_pair)(prev, cur)
    sal, feat = jax.jit(lambda v, r, fl: pipeline.sp.apply(v, r, fl))(
        variables["sp"], rgb_in, flow_in
    )
    w = fixation_pool(feat, heatmap_argmax(sal), cfg.at)

    import functools

    device_time = functools.partial(
        device_time, subtract_rtt=not args.no_rtt_correction
    )
    ms = lambda t: round(t * 1e3, 3)
    out = {"batch": B, "dtype": args.dtype, "flow_scale": args.flow_scale}

    # Operands go through device_time's ``args`` (real jit parameters);
    # closing over a f32 VGG's params overflows the relay compile
    # service's request limit (see utils/profiling.device_time).
    out["tvl1_ms"] = ms(device_time(
        lambda a, b: tvl1_flow(a, b, cfg.tvl1)[..., 0],
        iters=args.iters, args=(g0s, g1s)))
    out["preprocess_total_ms"] = ms(device_time(
        lambda a, b: pipeline.preprocess_pair(a, b)[1][..., 0],
        iters=args.iters, args=(prev, cur)))
    # Single choke point: pipeline.sp_forward honors both quant_sp and
    # decoder_impl, so the profile measures exactly the serving math.
    def _sp_fwd(v, r, fl):
        return pipeline.sp_forward(v, r, fl)[0]

    out["sp_forward_ms"] = ms(device_time(
        _sp_fwd, iters=args.iters, args=(variables["sp"], rgb_in, flow_in)))
    out["at_lstm_ms"] = ms(device_time(
        lambda v, c, ww: pipeline.lstm.apply(v, c, ww, method=LSTMNet.step)[1],
        iters=args.iters, args=(variables["at"], state.carries, w)))
    out["attention_map_ms"] = ms(device_time(
        lambda ft, wh: attention_map(ft, wh, (H, W)),
        iters=args.iters, args=(feat, state.w_hat)))
    out["lf_ms"] = ms(device_time(
        lambda v, x: pipeline.lf.apply(v, x),
        iters=args.iters,
        args=(variables["lf"], jnp.stack([sal, sal], axis=-1).astype(dtype))))

    def full(v, st, pv, cu, fx):
        _, o = pipeline.step(v, st, pv, cu, fx)
        return o["heatmap"]

    out["full_step_ms"] = ms(device_time(
        full, iters=args.iters, args=(variables, state, prev, cur, fix)))
    out["sum_of_parts_ms"] = round(
        out["preprocess_total_ms"] + out["sp_forward_ms"] + out["at_lstm_ms"]
        + out["attention_map_ms"] + out["lf_ms"], 3)
    # Guard the division: with RTT subtraction on fast hosts a sub-25ms
    # step can clamp to 0.0 (use --no_rtt_correction there).
    out["fps_implied"] = (
        round(B / (out["full_step_ms"] / 1e3), 1) if out["full_step_ms"] else None
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
