"""Isolated SP decoder-tail timing: canonical ConvTranspose vs polyphase
variants (conv-only, +depth-to-space, int8), on the real serving shapes.

Usage: python tools/bench_decoder.py [--batch 128] [--dtype bfloat16]

Prints one JSON object of per-variant ms so tail changes can be judged
without re-running the full pipeline bench (docs/STATUS.md round-3
decoder notes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)) or ".",
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from gaze_tpu.core.config import default_config
    from gaze_tpu.models.decode_fast import fast_fuse_decode
    from gaze_tpu.models.quant_tail import (
        calibrate_tail,
        fold_tail_params,
        quant_tail_forward,
    )
    from gaze_tpu.models.sp import SPNet
    from gaze_tpu.utils.profiling import device_time

    cfg = default_config().sp
    sp = SPNet(cfg, dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    B = args.batch
    h = args.image_size // 16
    kf, kt, ki = jax.random.split(jax.random.PRNGKey(0), 3)
    fs = jax.nn.relu(jax.random.normal(kf, (B, h, h, 512), jnp.float32))
    ft = jax.nn.relu(jax.random.normal(kt, (B, h, h, 512), jnp.float32))
    variables = sp.init(ki, fs[:1], ft[:1], method=SPNet.fuse_decode)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    ms = lambda t: round(t * 1e3, 3)
    out = {"batch": B, "dtype": args.dtype}

    out["deconv_ms"] = ms(device_time(
        lambda v, a, b: sp.apply(v, a.astype(dtype), b.astype(dtype),
                                 method=SPNet.fuse_decode),
        iters=args.iters, args=(variables, fs, ft)))

    out["polyphase_ms"] = ms(device_time(
        lambda v, a, b: fast_fuse_decode(v, cfg, a.astype(dtype),
                                         b.astype(dtype), dtype=dtype),
        iters=args.iters, args=(variables, fs, ft)))

    # conv-only variant: polyphase convs but NO depth-to-space — instead
    # a cheap reshape to (B, N, M, 4C)->(B, N, 2M, 2C)-style merge that
    # keeps bytes identical but is layout-contiguous. NOT numerically
    # meaningful; isolates the d2s epilogue's cost.
    folded = fold_tail_params(variables, cfg)

    def conv_only(v_unused, a, b):
        x = jnp.concatenate([a, b], axis=-1).astype(dtype)
        k, bi = folded["fuse"]
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bi.astype(dtype))
        for i in range(len(cfg.decoder_channels)):
            k, bi = folded[f"up{i + 1}"]
            y = jax.lax.conv_general_dilated(
                x, k.astype(dtype), (1, 1), ((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bi.astype(dtype)
            c4 = y.shape[-1]
            # contiguous pseudo-d2s: (B,N,M,4C) -> (B,2N,2M,C) by merges
            bshp, n, m = y.shape[0], y.shape[1], y.shape[2]
            x = jax.nn.relu(y.reshape(bshp, 2 * n, m, c4 // 2)
                             .reshape(bshp, 2 * n, 2 * m, c4 // 4))
        k, bi = folded["out"]
        logits = jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bi.astype(dtype)
        return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]

    out["polyphase_conv_only_ms"] = ms(device_time(
        conv_only, iters=args.iters, args=(variables, fs, ft)))

    x_cat = np.asarray(jnp.concatenate([fs[:8], ft[:8]], axis=-1), np.float32)
    qt = calibrate_tail(variables, cfg, [x_cat])
    out["int8_polyphase_ms"] = ms(device_time(
        lambda q, a, b: quant_tail_forward(q, a, b),
        iters=args.iters, args=(qt, fs, ft)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
