#!/usr/bin/env python
"""Dump (or verify) module-boundary golden tensors for parity checking.

Workflow (docs/PARITY.md): run the float32 parity path (full-grid flow)
on fixed inputs and dump every module boundary — SP saliency, SP conv5,
AT weights/attention, LF heatmap — to an .npz. Later, compare a new
build (or, when the PyTorch reference is available, its outputs exported
with the same keys) within tolerance.

    python tools/dump_goldens.py --out goldens.npz          # dump
    python tools/dump_goldens.py --compare goldens.npz      # verify
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--compare", type=str, default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--atol", type=float, default=1e-5)
    p.add_argument("--sp_ckpt", type=str, default=None,
                   help="optional SP checkpoint (random init otherwise)")
    p.add_argument("--flow_images", action="store_true",
                   help="feed synthetic quantized flow IMAGES to the "
                        "temporal stream (the reference's data path) "
                        "instead of solving TV-L1 on-TPU — dumps goldens "
                        "for the precomputed-flow parity mode; the flow "
                        "images themselves are stored under 'flow_img'")
    args = p.parse_args()
    if not args.out and not args.compare:
        p.error("need --out or --compare")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaze_tpu.core.config import ImageConfig, default_config
    from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
    from gaze_tpu.evaluation.goldens import (
        compare_goldens,
        load_goldens,
        pipeline_module_outputs,
        save_goldens,
    )
    from gaze_tpu.models.pipeline import GazePipeline

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, image=dataclasses.replace(
            cfg.image, height=args.image_size, width=args.image_size
        )
    )
    # float32 + full-grid flow = the parity path.
    pipeline = GazePipeline(cfg, dtype=jnp.float32)
    variables = pipeline.init_variables(jax.random.key(args.seed))
    if args.sp_ckpt:
        # CLI checkpoints store the full TrainState pytree (step/params/
        # batch_stats/opt_state), so restore into the same template the
        # trainer saves (cli.py's restore path) and peel the variables off.
        from gaze_tpu.core.checkpoint import restore_checkpoint
        from gaze_tpu.train.sp import create_sp_state

        state = restore_checkpoint(
            args.sp_ckpt, create_sp_state(jax.random.key(args.seed), pipeline)
        )
        variables["sp"] = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }

    frames, _, fixsac = generate_sequence(
        SyntheticSpec(
            num_frames=args.batch + 1,
            height=args.image_size,
            width=args.image_size,
            seed=args.seed,
        )
    )
    prev = jnp.asarray(frames[: args.batch])
    cur = jnp.asarray(frames[1 : args.batch + 1])
    fix = jnp.asarray(fixsac[1 : args.batch + 1])
    state = pipeline.init_state(args.batch)

    flow_img = None
    if args.flow_images:
        # Deterministic stand-in for dense_flow JPEGs: solve TV-L1 once,
        # quantize with the documented bound — the exact byte format a
        # reference-exported flow image arrives in.
        from gaze_tpu.ops.preprocess import rgb_to_gray, to_float
        from gaze_tpu.ops.tvl1 import quantize_flow, tvl1_flow

        g0, g1 = rgb_to_gray(to_float(prev)), rgb_to_gray(to_float(cur))
        flow_img = quantize_flow(tvl1_flow(g0, g1, cfg.tvl1), cfg.tvl1.quant_bound)

    out = pipeline_module_outputs(
        pipeline, variables, state, prev, cur, fix, flow_img=flow_img
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    if flow_img is not None:
        out["flow_img"] = np.asarray(flow_img)

    if args.out:
        save_goldens(args.out, out)
        print(f"wrote {len(out)} tensors to {args.out}")
        return 0

    ok, report = compare_goldens(out, load_goldens(args.compare), atol=args.atol)
    for k, d in sorted(report.items()):
        print(f"{k}: max|diff| = {d:.3g}")
    print("PARITY OK" if ok else "PARITY MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
