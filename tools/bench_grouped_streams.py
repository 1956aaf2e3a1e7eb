"""Grouped two-stream probe: both VGG streams as ONE conv per layer.

From conv1_2 onward the spatial and temporal streams share every
activation shape, so each layer pair can run as a single
``feature_group_count=2`` convolution over channel-stacked streams
(per-stream kernels block-stacked along the output-channel axis, so
group g's outputs contract only group g's inputs — mathematically
IDENTICAL to the two separate convs). The hypothesis (VERDICT r3 next
#7): one dispatch with doubled output width per layer amortizes
per-dispatch overhead and may tile the MXU better than two back-to-back
convs. Only conv1_1 stays per-stream (3-channel RGB vs 2-channel flow
inputs).

Measures IN-CHAIN (the whole encoder+fuse+decode forward, so the delta
isolates the encoder packing inside a realistic fused program — CLAUDE.md
measured-negative lesson: standalone op timings mislead on TPU):
  - f32 exactness of the grouped forward vs the separate streams,
  - bf16 timing: separate vs grouped (the production preset's dtype),
  - int8 timing: the quant chain (models/quant.py algebra, whose requant
    epilogues are already per-output-channel and therefore stack) —
    separate vs grouped, plus bit-exactness of the grouped int8 chain.

Run on the TPU host:  python tools/bench_grouped_streams.py
Prints one JSON line per measurement; exit code 0 either way — the
result (positive or negative) goes to docs/STATUS.md like the polyphase/
space-to-depth/pallas-conv probes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--inner", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from flax.linen import max_pool

    from gaze_tpu.core.config import default_config
    from gaze_tpu.models.pipeline import GazePipeline
    from gaze_tpu.models.quant import _LAYERS, _ZP, calibrate_pipeline_sp
    from gaze_tpu.models.sp import SPNet
    from gaze_tpu.models.vgg import VGG16_STAGES

    cfg = default_config()
    n = args.image_size
    import dataclasses

    cfg = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, height=n, width=n)
    )
    B = args.batch
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(B, n, n, 3)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(B, n, n, 2)).astype(np.float32))

    pipeline = GazePipeline(cfg, dtype=jnp.bfloat16)
    variables = pipeline.init_variables(jax.random.key(0))
    sp_params = variables["sp"]["params"]

    # ------------------------------------------------- grouped forward ----
    def grouped_kernels(dtype):
        ks = {}
        for name in _LAYERS[1:]:
            ks[name] = (
                jnp.concatenate(
                    [sp_params["spatial"][name]["kernel"],
                     sp_params["temporal"][name]["kernel"]], axis=3
                ).astype(dtype),
                jnp.concatenate(
                    [sp_params["spatial"][name]["bias"],
                     sp_params["temporal"][name]["bias"]]
                ).astype(jnp.float32),
            )
        return ks

    def grouped_encode(rgb_in, flow_in, gk, dtype):
        def c11(stream, x):
            p = sp_params[stream][_LAYERS[0]]
            return jax.nn.relu(
                jax.lax.conv_general_dilated(
                    x.astype(dtype), p["kernel"].astype(dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + p["bias"].astype(dtype)
            )

        x = jnp.concatenate([c11("spatial", rgb_in), c11("temporal", flow_in)],
                            axis=-1)
        li = 1
        for s, stage in enumerate(VGG16_STAGES):
            for _ in range(len(stage) - (1 if s == 0 else 0)):
                k, b = gk[_LAYERS[li]]
                li += 1
                x = jax.nn.relu(
                    jax.lax.conv_general_dilated(
                        x, k, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=2,
                    ) + b.astype(x.dtype)
                )
            if s < len(VGG16_STAGES) - 1:
                x = max_pool(x, window_shape=(2, 2), strides=(2, 2))
        C = x.shape[-1] // 2
        return x[..., :C], x[..., C:]

    # f32 exactness vs the separate streams
    f32_pipe = GazePipeline(cfg)
    # jit the reference encode: eager apply dispatches ~60 ops one by one,
    # and on the axon relay every eager op is its own remote compile.
    fs_ref, ft_ref = jax.jit(
        lambda r, f: f32_pipe.sp.apply(variables["sp"], r, f,
                                       method=SPNet.encode)
    )(rgb, flow)
    gk32 = grouped_kernels(jnp.float32)
    fs_g, ft_g = jax.jit(
        lambda r, f: grouped_encode(r, f, gk32, jnp.float32)
    )(rgb, flow)
    err = max(
        float(jnp.max(jnp.abs(fs_g - fs_ref))),
        float(jnp.max(jnp.abs(ft_g - ft_ref))),
    )
    print(json.dumps({"check": "grouped_f32_max_abs_err", "value": err}))
    assert err < 1e-3, "grouped conv is not equivalent"

    # ------------------------------------------------------ bf16 timing ----
    def timed(fn, *xs):
        out = fn(*xs)
        float(out)  # compile + sync (relay: block_until_ready lies)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.inner):
                out = fn(*xs)
            float(out)
            times.append((time.perf_counter() - t0) / args.inner)
        return min(times)

    def tail(fs, ft):
        return pipeline.sp.apply(
            variables["sp"], fs.astype(jnp.bfloat16), ft.astype(jnp.bfloat16),
            method=SPNet.fuse_decode,
        ).sum()

    @jax.jit
    def bf16_separate(r, f):
        fs, ft = pipeline.sp.apply(variables["sp"], r.astype(jnp.bfloat16),
                                   f.astype(jnp.bfloat16), method=SPNet.encode)
        return tail(fs, ft)

    gk16 = grouped_kernels(jnp.bfloat16)

    @jax.jit
    def bf16_grouped(r, f):
        fs, ft = grouped_encode(r.astype(jnp.bfloat16), f.astype(jnp.bfloat16),
                                gk16, jnp.bfloat16)
        return tail(fs, ft)

    t_sep = timed(bf16_separate, rgb, flow)
    t_grp = timed(bf16_grouped, rgb, flow)
    print(json.dumps({
        "bench": "bf16_two_stream_encode+tail", "batch": B,
        "separate_ms": round(t_sep * 1e3, 3),
        "grouped_ms": round(t_grp * 1e3, 3),
        "speedup": round(t_sep / t_grp, 4),
    }))

    # ------------------------------------------------------ int8 timing ----
    # Calibrate both streams (bf16 stem = the turbo headline config).
    pairs = [(np.asarray(rng.integers(0, 255, (B, n, n, 3)), np.uint8),
              np.asarray(rng.integers(0, 255, (B, n, n, 3)), np.uint8))]
    qsp = calibrate_pipeline_sp(pipeline, variables, pairs,
                                percentile=99.9, bf16_stem=True)

    from gaze_tpu.models.quant import quant_vgg_forward

    @jax.jit
    def int8_separate(r, f):
        fs = quant_vgg_forward(qsp.spatial, r)
        ft = quant_vgg_forward(qsp.temporal, f)
        return tail(fs, ft)

    # Grouped int8 chain: stack after the (per-stream, bf16) conv1_1 stem;
    # interior epilogue constants a/c are per-output-channel in
    # quant_vgg_forward's algebra already, so they concat per group.
    qs, qt = qsp.spatial, qsp.temporal

    def g_int8_layer(name):
        """Block-stacked kernel + per-output-channel epilogue constants —
        the exact expressions of quant_vgg_forward. Measured: agrees to
        within ONE int8 LSB (max |err| 0.0038 ≈ 1 dequant code at
        B=128/224²), not bit-identical — XLA may reassociate the grouped
        epilogue so a round-at-.5 tie can break the other way."""
        k = jnp.concatenate([qs.kernels[name], qt.kernels[name]], axis=3)
        nxt = _LAYERS[_LAYERS.index(name) + 1] if name != _LAYERS[-1] else None

        def ac(q):
            sx = q.act_scales[name]
            if nxt is None:  # conv5_3 dequantizes: relu((acc+zp*cs)*sw + b)
                sw = sx * q.w_scales[name]
                return sw, q.biases[name], q.col_sums[name]
            sn = q.act_scales[nxt]
            a = (sx * q.w_scales[name]) / sn
            c = (q.biases[name] / sn - _ZP) + (_ZP * q.col_sums[name]) * a
            return a, c, None

        parts = [ac(qs), ac(qt)]
        cat = lambda i: jnp.concatenate([p[i] for p in parts])
        return (k, cat(0), cat(1), cat(2) if nxt is None else None)

    g_taps = {name: g_int8_layer(name) for name in _LAYERS[1:]}

    def stem(q, x):
        acc = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), q.stem_kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        sn = q.act_scales[_LAYERS[1]]
        return jnp.clip(
            jnp.round(acc / sn + (q.stem_bias / sn - _ZP)), -128, 127
        ).astype(jnp.int8)

    def int8_grouped_encode(r, f):
        xq = jnp.concatenate([stem(qs, r), stem(qt, f)], axis=-1)
        li = 1
        for s, stage in enumerate(VGG16_STAGES):
            for _ in range(len(stage) - (1 if s == 0 else 0)):
                name = _LAYERS[li]
                li += 1
                k, a, c, cs = g_taps[name]
                xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                             constant_values=np.int8(-_ZP))
                acc = jax.lax.conv_general_dilated(
                    xp, k, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=2,
                    preferred_element_type=jnp.int32,
                )
                if li < len(_LAYERS):
                    xq = jnp.clip(
                        jnp.round(acc.astype(jnp.float32) * a + c), -128, 127
                    ).astype(jnp.int8)
                else:  # conv5_3: quant.py's exact dequant association
                    x = jax.nn.relu(
                        (acc.astype(jnp.float32) + _ZP * cs) * a + c
                    )
            if s < len(VGG16_STAGES) - 1:
                xq = max_pool(xq, window_shape=(2, 2), strides=(2, 2))
        C = x.shape[-1] // 2
        return x[..., :C], x[..., C:]

    @jax.jit
    def int8_grouped(r, f):
        fs, ft = int8_grouped_encode(r, f)
        return tail(fs, ft)

    # Bit-exactness of the grouped int8 chain vs the per-stream chain.
    fs_q = jax.jit(lambda x: quant_vgg_forward(qsp.spatial, x))(rgb)
    ft_q = jax.jit(lambda x: quant_vgg_forward(qsp.temporal, x))(flow)
    fs_gq, ft_gq = jax.jit(int8_grouped_encode)(rgb, flow)
    qerr = max(float(jnp.max(jnp.abs(fs_gq - fs_q))),
               float(jnp.max(jnp.abs(ft_gq - ft_q))))
    print(json.dumps({"check": "grouped_int8_max_abs_err", "value": qerr}))

    t_qsep = timed(int8_separate, rgb, flow)
    t_qgrp = timed(int8_grouped, rgb, flow)
    print(json.dumps({
        "bench": "int8_two_stream_encode+tail", "batch": B,
        "separate_ms": round(t_qsep * 1e3, 3),
        "grouped_ms": round(t_qgrp * 1e3, 3),
        "speedup": round(t_qsep / t_qgrp, 4),
    }))


if __name__ == "__main__":
    main()
