"""Space-to-depth stem experiment (VERDICT r2 weak-spot #6).

Question: the profiler shows the early 224² low-channel VGG layers are
bandwidth/packing-bound — does rewriting conv1_1 (3x3, 3->64 at 224²)
as a space-to-depth conv (3x3, 12->256 at 112², then depth-to-space
back) run faster on the int8 serving path?

Arithmetic: the s2d form does 4x the nominal MACs (112²·256·9·12 vs
224²·64·9·3) but packs the MXU contraction dim 4x better (108 vs 27 of
the 128-lane granule), so the *padded* MAC count is identical — any win
must come from layout/bandwidth effects, which only a measurement can
settle. This tool prints per-variant times; the verdict goes in
docs/STATUS.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gaze_tpu.utils.profiling import device_time

    B, H, W = 128, 224, 224
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (B, H, W, 3)), jnp.int8)
    k = jnp.asarray(rng.integers(-127, 128, (3, 3, 3, 64)), jnp.int8)
    # s2d kernel: output sub-position (di,dj) channel block c reads input
    # block offsets; build it exactly from k so results are comparable.
    k_s2d = np.zeros((3, 3, 12, 256), np.int8)
    kn = np.asarray(k)
    for di in range(2):
        for dj in range(2):
            for ky in range(3):
                for kx in range(3):
                    ay, ax = di + ky - 1, dj + kx - 1  # absolute offset
                    by, sy = divmod(ay + 2, 2)  # block offset+1, subpos
                    bx, sx = divmod(ax + 2, 2)
                    for ci in range(3):
                        k_s2d[by, bx, (sy * 2 + sx) * 3 + ci,
                              (di * 2 + dj) * 64 : (di * 2 + dj + 1) * 64] \
                            = kn[ky, kx, ci]
    k_s2d = jnp.asarray(k_s2d)

    def conv(x, kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def baseline(x):
        return conv(x, k)

    def s2d_variant(x):
        # NHWC space-to-depth, block 2: (B,112,112,12) with channel
        # order (sy, sx, ci)
        xs = x.reshape(B, H // 2, 2, W // 2, 2, 3)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 12)
        y = conv(xs, k_s2d)  # (B,112,112,256), channels (di,dj,co)
        # depth-to-space back to (B,224,224,64)
        y = y.reshape(B, H // 2, W // 2, 2, 2, 64)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, 64)
        return y

    def s2d_no_restore(x):
        xs = x.reshape(B, H // 2, 2, W // 2, 2, 3)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 12)
        return conv(xs, k_s2d)

    # correctness first (interior exactness; borders differ where the
    # 2x2 block window crosses the image edge — SAME pads block-space)
    a = np.asarray(baseline(xq))
    b = np.asarray(s2d_variant(xq))
    interior = np.abs(a[:2, 2:-2, 2:-2] - b[:2, 2:-2, 2:-2]).max()
    print(f"interior max abs diff: {interior} (0 = exact)")

    for name, fn in [("conv1_1 int8 (current)", baseline),
                     ("s2d 12->256 + restore", s2d_variant),
                     ("s2d 12->256 (no restore)", s2d_no_restore)]:
        t = device_time(jax.jit(fn), args=(xq,))
        print(f"{name}: {t * 1e3:.3f} ms  "
              f"({B * H * W * 64 * 27 / t / 1e12:.2f} eff-TOPS on the "
              "original op's MACs)")


if __name__ == "__main__":
    main()
