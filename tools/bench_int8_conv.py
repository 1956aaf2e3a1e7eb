"""Headroom probe: XLA int8 conv vs equivalent-FLOP int8 matmul on TPU.

The quant SP stream's interior 3x3 convs run at ~40-50% of the v5e
MXU's int8 peak (tools/bench_sp_layers.py). This tool asks whether
that gap is the CONV LOWERING (in which case a Pallas shift-and-matmul
conv kernel can claw it back) or generic to int8 MXU dispatch (in which
case it can't): for each VGG-interior conv shape it times

  - lax.conv_general_dilated   s8 x s8 -> s32 (what quant.py runs),
  - the same conv via 9 shifted s8 matmuls (shift-and-matmul identity:
    acc[., o] = sum_{dy,dx} Xpad[h+dy, w+dx, :] @ K[dy, dx, :, :]),
  - one plain s8 matmul of identical MAC count ((B*H*W, 9*Ci) @ (9*Ci, Co)),

and prints ms + TOPS for each. Run on the TPU host:

    python tools/bench_int8_conv.py --batch 128

One JSON object per shape on stdout.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# (H, W, Cin, Cout) of the quant-path interior convs that matter
# (per-layer ms from tools/bench_sp_layers.py; conv1_1 runs bf16 now).
SHAPES = {
    "conv1_2": (224, 224, 64, 64),
    "conv2_1": (112, 112, 64, 128),
    "conv2_2": (112, 112, 128, 128),
    "conv3_2": (56, 56, 256, 256),
    "conv4_2": (28, 28, 512, 512),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--shapes", type=str, default=None,
                   help="comma-separated subset of " + ",".join(SHAPES))
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

    from gaze_tpu.utils.profiling import device_time

    names = args.shapes.split(",") if args.shapes else list(SHAPES)
    B = args.batch
    rng = np.random.default_rng(0)

    for name in names:
        H, W, Ci, Co = SHAPES[name]
        x = jnp.asarray(
            rng.integers(-128, 128, (B, H, W, Ci), dtype=np.int8))
        k = jnp.asarray(rng.integers(-127, 128, (3, 3, Ci, Co), dtype=np.int8))
        macs = B * H * W * Ci * Co * 9
        # The matmul variants materialize (B*H*W)-row operands; cap rows
        # (TOPS is what we're after, not the full batch) so the 224/112
        # shapes don't OOM HBM (im2col at B=128, 224^2, Ci=64 is 3.7 GB).
        Bm = max(1, min(B, (1 << 21) // (H * W)))
        macs_m = Bm * H * W * Ci * Co * 9

        def conv(x, k):
            acc = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # Reduce (fuses into the conv epilogue) instead of slicing:
            # a sliced output lets XLA DCE the conv to a window.
            return jnp.sum(acc, dtype=jnp.int32)[None].astype(jnp.float32)

        def shifted_mm(x, k):
            # shift-and-matmul: pad H and W by 1, take 9 shifted views,
            # each a (Bm*H*W, Ci) @ (Ci, Co) s8 matmul into one s32 acc.
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((Bm * H * W, Co), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    xs = jax.lax.dynamic_slice(
                        xp, (0, dy, dx, 0), (Bm, H, W, Ci)
                    ).reshape(Bm * H * W, Ci)
                    acc = acc + jax.lax.dot_general(
                        xs, k[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            return jnp.sum(acc, dtype=jnp.int32)[None].astype(jnp.float32)

        a2 = jnp.asarray(
            rng.integers(-128, 128, (Bm * H * W, 9 * Ci), dtype=np.int8))
        b2 = jnp.asarray(
            rng.integers(-127, 128, (9 * Ci, Co), dtype=np.int8))

        def plain_mm(a, b):
            acc = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.sum(acc, dtype=jnp.int32)[None].astype(jnp.float32)

        xm = x[:Bm]
        out = {"shape": name, "B": B, "B_mm": Bm, "HWIO": [H, W, Ci, Co],
               "tmacs": round(macs / 1e12, 3)}
        for label, fn, fargs, m in (
            ("conv", conv, (x, k), macs),
            ("shifted_mm", shifted_mm, (xm, k), macs_m),
            ("plain_mm", plain_mm, (a2, b2), macs_m),
        ):
            t = device_time(jax.jit(fn), iters=args.iters, args=fargs)
            out[label + "_ms"] = round(t * 1e3, 3)
            out[label + "_tops"] = round(2 * m / t / 1e12, 1) if t > 0 else None
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
