"""Per-layer device-time breakdown of the SP forward (quant or bf16).

Times cumulative prefixes of the VGG16 chain (layer k = chain truncated
after conv k) so per-layer cost = prefix[k] - prefix[k-1], plus the
fuse/decoder tail and each decoder block — locating where the SP
stream's milliseconds actually go before attacking them.

    python tools/bench_sp_layers.py --batch 128 --quant

Prints one JSON object. Differences of device_time measurements carry
~+-0.2 ms noise each; read trends, not third digits.
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
    p.add_argument("--quant", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no_rtt_correction", action="store_true")
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
    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.models.sp import Decoder, SPNet
    from gaze_tpu.models.vgg import VGG16_STAGES
    from gaze_tpu.utils.profiling import device_time

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        image=dataclasses.replace(
            cfg.image, height=args.image_size, width=args.image_size
        ),
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipeline = GazePipeline(cfg, dtype=dtype)
    variables = pipeline.init_variables(jax.random.key(0))

    B, H, W = args.batch, cfg.image.height, cfg.image.width
    f, _, _ = generate_sequence(SyntheticSpec(num_frames=2, height=H, width=W))
    prev = jnp.asarray(np.broadcast_to(f[0], (B, H, W, 3)).copy())
    cur = jnp.asarray(np.broadcast_to(f[1], (B, H, W, 3)).copy())
    rgb_in, flow_in = jax.jit(pipeline.preprocess_pair)(prev, cur)

    import functools

    device_time = functools.partial(
        device_time, subtract_rtt=not args.no_rtt_correction
    )
    ms = lambda t: round(t * 1e3, 3)
    layer_names = [
        f"conv{s + 1}_{i + 1}"
        for s, stage in enumerate(VGG16_STAGES)
        for i in range(len(stage))
    ]
    out = {"batch": B, "dtype": args.dtype, "quant": bool(args.quant)}

    if args.quant:
        from gaze_tpu.models.quant import (
            _LAYERS,
            _ZP,
            calibrate_pipeline_sp,
        )
        from flax.linen import max_pool

        qsp = calibrate_pipeline_sp(
            pipeline, variables, [(np.asarray(prev[:1]), np.asarray(cur[:1]))]
        )
        q = qsp.spatial

        def prefix_fwd(x, n_layers):
            """quant_vgg_forward truncated after n_layers convs; returns
            a tiny slice so the result D2H is negligible."""
            sx0 = q.act_scales[_LAYERS[0]]
            xq = jnp.clip(jnp.round(x / sx0), -127, 127).astype(jnp.int8)
            zp = 0
            li = 0
            for s, stage in enumerate(VGG16_STAGES):
                for _ in stage:
                    if li >= n_layers:
                        return xq[:, 0, 0, 0].astype(jnp.float32)
                    name = _LAYERS[li]
                    li += 1
                    if zp == 0:
                        acc = jax.lax.conv_general_dilated(
                            xq, q.kernels[name], (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.int32,
                        )
                    else:
                        xp = jnp.pad(
                            xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                            constant_values=np.int8(-_ZP),
                        )
                        acc = jax.lax.conv_general_dilated(
                            xp, q.kernels[name], (1, 1), "VALID",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.int32,
                        )
                    zp_bias = (zp * q.col_sums[name]) if zp else 0.0
                    if li < len(_LAYERS):
                        sn = q.act_scales[_LAYERS[li]]
                        a = (q.act_scales[name] * q.w_scales[name]) / sn
                        c = (q.biases[name] / sn - _ZP) + zp_bias * a
                        xq = jnp.clip(
                            jnp.round(acc.astype(jnp.float32) * a + c),
                            -128, 127,
                        ).astype(jnp.int8)
                        zp = _ZP
                    else:
                        sw = q.act_scales[name] * q.w_scales[name]
                        xf = (acc.astype(jnp.float32) + zp_bias) * sw
                        xf = jax.nn.relu(xf + q.biases[name])
                        return xf[:, 0, 0, 0]
                if s < len(VGG16_STAGES) - 1:
                    xq = max_pool(xq, window_shape=(2, 2), strides=(2, 2))
            return xf[:, 0, 0, 0]

        prev_t = 0.0
        for k in range(1, len(layer_names) + 1):
            t = device_time(
                functools.partial(prefix_fwd, n_layers=k),
                iters=args.iters, args=(rgb_in,),
            )
            out[layer_names[k - 1] + "_ms"] = ms(t - prev_t)
            prev_t = t
        out["stream_total_ms"] = ms(prev_t)
        from gaze_tpu.models.quant import quant_vgg_forward

        feat = jax.jit(lambda x: quant_vgg_forward(q, x))(rgb_in)
    else:

        def prefix_fwd(v, x, n_layers):
            from flax.linen import max_pool

            params = v["params"]["spatial"]
            li = 0
            for s, stage in enumerate(VGG16_STAGES):
                for _ in stage:
                    if li >= n_layers:
                        return x[:, 0, 0, 0].astype(jnp.float32)
                    name = layer_names[li]
                    li += 1
                    k = params[name]["kernel"].astype(dtype)
                    b = params[name]["bias"].astype(dtype)
                    x = jax.lax.conv_general_dilated(
                        x.astype(dtype), k, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ) + b
                    x = jax.nn.relu(x)
                if s < len(VGG16_STAGES) - 1:
                    x = max_pool(x, window_shape=(2, 2), strides=(2, 2))
            return x[:, 0, 0, 0].astype(jnp.float32)

        prev_t = 0.0
        for k in range(1, len(layer_names) + 1):
            t = device_time(
                functools.partial(prefix_fwd, n_layers=k),
                iters=args.iters, args=(variables["sp"], rgb_in),
            )
            out[layer_names[k - 1] + "_ms"] = ms(t - prev_t)
            prev_t = t
        out["stream_total_ms"] = ms(prev_t)
        feat = jax.jit(
            lambda v, r, fl: pipeline.sp.apply(v, r, fl)[1]
        )(variables["sp"], rgb_in, flow_in).astype(dtype)

    # Tail: fuse conv + decoder (pipeline dtype).
    out["fuse_decode_ms"] = ms(device_time(
        lambda v, fs, ft: pipeline.sp.apply(
            v, fs.astype(dtype), ft.astype(dtype), method=SPNet.fuse_decode
        ),
        iters=args.iters, args=(variables["sp"], feat, feat),
    ))

    # Decoder blocks cumulatively (random fused input at conv5 shape).
    dec = Decoder(cfg.sp, dtype=dtype, param_dtype=jnp.float32)
    fused = jax.random.normal(
        jax.random.key(1), (B, H // 16, W // 16, cfg.sp.fused_channels), dtype
    )
    dec_vars = dec.init(jax.random.key(2), fused)

    def dec_prefix(v, x, n_blocks):
        import flax.linen as nn

        params = v["params"]
        for i in range(n_blocks):
            name = f"deconv{i + 1}"
            kp = params[name]
            x = jax.lax.conv_transpose(
                x, kp["kernel"].astype(dtype), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + kp["bias"].astype(dtype)
            if cfg.sp.use_batchnorm:
                bnp = params[f"bn{i + 1}"]
                bs = v["batch_stats"][f"bn{i + 1}"]
                inv = jax.lax.rsqrt(bs["var"].astype(dtype) + 1e-5)
                x = (x - bs["mean"].astype(dtype)) * inv * bnp[
                    "scale"
                ].astype(dtype) + bnp["bias"].astype(dtype)
            x = nn.relu(x)
        return x[:, 0, 0, 0].astype(jnp.float32)

    prev_t = 0.0
    for nb in range(1, len(cfg.sp.decoder_channels) + 1):
        t = device_time(
            functools.partial(dec_prefix, n_blocks=nb),
            iters=args.iters, args=(dec_vars, fused),
        )
        out[f"deconv{nb}_ms"] = ms(t - prev_t)
        prev_t = t

    print(json.dumps(out))


if __name__ == "__main__":
    main()
