"""CLI orchestrator — TPU rebuild of ``ref:gaze_full.py`` [M].

Mirrors the reference's per-stage argparse surface (SURVEY.md §2
"Orchestrator"): ``--train_sp``, ``--train_lstm``, ``--train_late``,
``--extract_late``, ``--eval``, data-path / lr / batch / epoch flags and
per-stage pretrained-checkpoint paths — sequencing SP -> AT -> LF.

Differences by design (SURVEY.md §7): stages hand tensors to each other
through HBM/host memory instead of dumping .npy/.pth files between
stages ("extract" stages exist but stream in-memory); training is
data-parallel over the TPU mesh; datasets fall back to the synthetic
moving-dot generator when no GTEA root is given (offline environment).

Usage examples:
    python -m gaze_tpu.cli --train_sp --synthetic --epochs 1
    python -m gaze_tpu.cli --train_sp --train_lstm --train_late \
        --data_root /data/gteaplus --test_subject Alice
    python -m gaze_tpu.cli --eval --data_root /data/gteaplus \
        --sp_ckpt save/sp --at_ckpt save/at --lf_ckpt save/lf
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from gaze_tpu.core.config import (
    ImageConfig,
    PipelineConfig,
    TrainConfig,
    TVL1Config,
    default_config,
)
from gaze_tpu.data.gtea import build_manifest, pair_batches
from gaze_tpu.data.prefetch import device_prefetch
from gaze_tpu.data.synthetic import SyntheticSpec, batch_iterator, generate_sequence
from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.models.weights_io import init_sp_from_torch_vgg16
from gaze_tpu.parallel.mesh import make_mesh
from gaze_tpu.train.at import build_weight_sequences, create_at_state, make_at_train_step
from gaze_tpu.train.lf import create_lf_state, make_lf_eval_step, make_lf_train_step
from gaze_tpu.train.sp import (
    create_sp_state,
    extract_fixation_weights,
    make_sp_eval_step,
    make_sp_train_step,
)
from gaze_tpu.utils.logging import StepLogger


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, prog="gaze_tpu")
    # stage toggles (reference flag names [M])
    p.add_argument("--train_sp", action="store_true", help="train the SP two-stream net")
    p.add_argument("--train_lstm", action="store_true", help="train the AT LSTM")
    p.add_argument("--train_late", action="store_true", help="train the LF head")
    p.add_argument("--extract_late", action="store_true",
                   help="kept for CLI parity; extraction streams in-memory")
    p.add_argument("--eval", action="store_true", help="evaluate the full pipeline")
    # data
    p.add_argument("--data_root", type=str, default=None, help="GTEA Gaze+ root")
    p.add_argument("--test_subject", type=str, default=None,
                   help="leave-one-subject-out test subject")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic moving-dot dataset")
    # optimization
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=100,
                   help="synthetic-data steps per epoch")
    p.add_argument("--seq_len", type=int, default=16, help="AT sequence window")
    # checkpoints
    p.add_argument("--save_dir", type=str, default="save")
    p.add_argument("--sp_ckpt", type=str, default=None)
    p.add_argument("--at_ckpt", type=str, default=None)
    p.add_argument("--lf_ckpt", type=str, default=None)
    p.add_argument("--pretrained_vgg", type=str, default=None,
                   help="torchvision vgg16 .pth for encoder init")
    # misc
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--dp_devices", type=int, default=None,
                   help="devices for data parallelism (default: all)")
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--ckpt_every", type=int, default=500,
                   help="periodic checkpoint interval in steps (0 = only "
                        "at stage end)")
    p.add_argument("--eval_every", type=int, default=0,
                   help="periodic SP validation interval in steps (0 = off)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 activations (f32 params) — the serving/"
                        "throughput preset; default float32 parity path")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the debug-config stand-in "
                        "for sanitizers; SURVEY.md §5)")
    return p


def make_config(args) -> PipelineConfig:
    base = default_config()
    return dataclasses.replace(
        base,
        image=dataclasses.replace(
            base.image, height=args.image_size, width=args.image_size
        ),
        train=dataclasses.replace(
            base.train,
            batch_size=args.batch_size,
            learning_rate=args.lr,
            epochs=args.epochs,
        ),
    )


def _batches(args, cfg: PipelineConfig, train: bool) -> Iterator[Dict]:
    """Unified batch source: GTEA when --data_root is given, synthetic
    otherwise."""
    if args.data_root:
        manifest = build_manifest(args.data_root)
        subject = args.test_subject or manifest.subjects()[0]
        train_recs, test_recs = manifest.split_leave_one_out(subject)
        recs = train_recs if train else test_recs
        return pair_batches(
            recs,
            args.batch_size,
            target_hw=(cfg.image.height, cfg.image.width),
            shuffle=train,
        )
    spec = SyntheticSpec(
        num_frames=max(64, args.batch_size * 4),
        height=cfg.image.height,
        width=cfg.image.width,
        seed=0 if train else 1,
    )
    return batch_iterator(spec, args.batch_size, args.steps_per_epoch, seed=0 if train else 1)


def run_train_sp(args, cfg, pipeline, mesh) -> Dict:
    state = create_sp_state(jax.random.key(cfg.train.seed), pipeline)
    if args.pretrained_vgg:
        variables = init_sp_from_torch_vgg16(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.pretrained_vgg,
            cfg.sp.flow_channels,
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
    ckpt_dir = args.sp_ckpt or os.path.join(args.save_dir, "sp")
    state = restore_checkpoint(ckpt_dir, state)
    step_fn = make_sp_train_step(pipeline, mesh)
    eval_fn = make_sp_eval_step(pipeline) if args.eval_every else None
    logger = StepLogger("sp", every=args.log_every)
    for epoch in range(args.epochs):
        for batch in device_prefetch(_batches(args, cfg, train=True), mesh):
            state, metrics = step_fn(state, batch)
            step_no = int(state.step)
            logger.log(step_no, metrics)
            # Crash-resilience: periodic ASYNC checkpoints — serialization
            # overlaps training (the reference loses everything past the
            # last blocking epoch save — SURVEY.md §5).
            if args.ckpt_every and step_no % args.ckpt_every == 0:
                save_checkpoint(ckpt_dir, step_no, jax.device_get(state), block=False)
            if eval_fn is not None and step_no % args.eval_every == 0:
                vb = next(iter(_batches(args, cfg, train=False)))
                m = eval_fn(state, vb)
                logger.log(
                    step_no,
                    {"val_aae": float(np.mean(np.asarray(m["aae"]))),
                     "val_auc": float(np.mean(np.asarray(m["auc"])))},
                    force=True,
                )
    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    return {"params": state.params, "batch_stats": state.batch_stats}


def run_train_lstm(args, cfg, pipeline, mesh, sp_vars) -> Dict:
    """AT stage: extract fixation weight sequences with the frozen SP
    encoder (in-memory — the reference's per-video .npy dumps), then
    train the LSTM on them."""
    extract = extract_fixation_weights(pipeline)

    # Pass 1: per-video weight sequences.
    all_seqs: List[np.ndarray] = []
    all_masks: List[np.ndarray] = []
    if args.data_root:
        manifest = build_manifest(args.data_root)
        subject = args.test_subject or manifest.subjects()[0]
        train_recs, _ = manifest.split_leave_one_out(subject)
        videos = sorted({r.video for r in train_recs})
        for v in videos:
            recs = [r for r in train_recs if r.video == v]
            ws, fx = [], []
            for batch in pair_batches(
                recs, args.batch_size, (cfg.image.height, cfg.image.width),
                shuffle=False, drop_remainder=False,
            ):
                ws.append(np.asarray(extract(sp_vars, batch)))
                fx.append(batch["fixsac"])
            if ws:
                s, m = build_weight_sequences(
                    np.concatenate(ws), np.concatenate(fx), args.seq_len
                )
                all_seqs.append(s)
                all_masks.append(m)
    else:
        spec = SyntheticSpec(
            num_frames=max(64, args.batch_size * 4),
            height=cfg.image.height, width=cfg.image.width,
        )
        frames, gaze, fixsac = generate_sequence(spec)
        ws = []
        for s in range(1, len(frames), args.batch_size):
            idx = np.arange(s, min(s + args.batch_size, len(frames)))
            batch = {
                "prev": frames[idx - 1], "cur": frames[idx],
                "gaze": gaze[idx], "fixsac": fixsac[idx],
            }
            ws.append(np.asarray(extract(sp_vars, batch)))
        s, m = build_weight_sequences(np.concatenate(ws), fixsac[1:], args.seq_len)
        all_seqs.append(s)
        all_masks.append(m)

    seqs = np.concatenate([s for s in all_seqs if len(s)]) if all_seqs else np.zeros((0,))
    masks = np.concatenate([m for m in all_masks if len(m)]) if all_masks else np.zeros((0,))
    if len(seqs) == 0:
        raise RuntimeError("no fixation sequences extracted — check fixsac labels")

    # Pass 2: LSTM training.
    state = create_at_state(jax.random.key(cfg.train.seed), pipeline)
    ckpt_dir = args.at_ckpt or os.path.join(args.save_dir, "at")
    state = restore_checkpoint(ckpt_dir, state)
    bs = min(args.batch_size, len(seqs))
    # DP batches must divide across the mesh; small corpora train on one
    # device instead of being padded.
    at_mesh = mesh
    if mesh is not None:
        if bs >= mesh.size:
            bs = (bs // mesh.size) * mesh.size
        else:
            at_mesh = None
    step_fn = make_at_train_step(pipeline, at_mesh)
    logger = StepLogger("at", every=args.log_every)
    rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        order = rng.permutation(len(seqs))
        for s in range(0, len(order) - bs + 1, bs):
            idx = order[s : s + bs]
            batch = {"weights": jnp.asarray(seqs[idx]), "mask": jnp.asarray(masks[idx])}
            state, metrics = step_fn(state, batch)
            logger.log(int(state.step), metrics)
    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    return {"params": state.params}


def run_train_late(args, cfg, pipeline, mesh, sp_vars, at_vars) -> Dict:
    frozen = {"sp": sp_vars, "at": at_vars}
    state = create_lf_state(jax.random.key(cfg.train.seed), pipeline)
    ckpt_dir = args.lf_ckpt or os.path.join(args.save_dir, "lf")
    state = restore_checkpoint(ckpt_dir, state)
    step_fn = make_lf_train_step(pipeline, frozen, mesh)
    logger = StepLogger("lf", every=args.log_every)
    for epoch in range(args.epochs):
        for batch in device_prefetch(_batches(args, cfg, train=True), mesh):
            state, metrics = step_fn(state, batch)
            logger.log(int(state.step), metrics)
    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    return state


def run_eval(args, cfg, pipeline, sp_vars, at_vars, lf_state) -> Dict[str, float]:
    """Full-pipeline evaluation; per-video AAE/AUC breakdown plus the
    average, matching the reference's report format (SURVEY.md §3.5)."""
    frozen = {"sp": sp_vars, "at": at_vars}
    eval_fn = make_lf_eval_step(pipeline, frozen)

    def eval_batches(batches):
        aaes, aucs = [], []
        for batch in batches:
            m = eval_fn(lf_state, batch)
            aaes.append(np.asarray(m["aae"]))
            aucs.append(np.asarray(m["auc"]))
        if not aaes:
            return float("nan"), float("nan")
        return (
            float(np.concatenate(aaes).mean()),
            float(np.concatenate(aucs).mean()),
        )

    per_video = {}
    if args.data_root:
        manifest = build_manifest(args.data_root)
        subject = args.test_subject or manifest.subjects()[0]
        _, test_recs = manifest.split_leave_one_out(subject)
        for v in sorted({r.video for r in test_recs}):
            recs = [r for r in test_recs if r.video == v]
            aae_v, auc_v = eval_batches(
                pair_batches(
                    recs, args.batch_size,
                    (cfg.image.height, cfg.image.width),
                    shuffle=False, drop_remainder=False,
                )
            )
            per_video[v] = (aae_v, auc_v)
            print({"video": v, "AAE_deg": round(aae_v, 3), "AUC": round(auc_v, 4)})
        aae = float(np.mean([a for a, _ in per_video.values()]))
        auc = float(np.mean([c for _, c in per_video.values()]))
    else:
        aae, auc = eval_batches(_batches(args, cfg, train=False))

    result = {"AAE_deg": aae, "AUC": auc}
    print(result)
    return result


def main(argv: Optional[List[str]] = None) -> None:
    args = build_argparser().parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = make_config(args)
    pipeline = GazePipeline(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    # DP mesh sized so the batch divides across it: the largest divisor
    # of batch_size that fits the available (or requested) devices.
    avail = args.dp_devices or jax.device_count()
    n_dp = max(d for d in range(1, avail + 1) if args.batch_size % d == 0)
    mesh = make_mesh(n_dp) if n_dp > 1 else None

    rng = jax.random.key(cfg.train.seed)
    sp_vars = at_vars = None
    lf_state = None

    if args.train_sp:
        sp_vars = run_train_sp(args, cfg, pipeline, mesh)
    if args.train_lstm or args.train_late or args.eval:
        if sp_vars is None:
            state = create_sp_state(rng, pipeline)
            state = restore_checkpoint(
                args.sp_ckpt or os.path.join(args.save_dir, "sp"), state
            )
            sp_vars = {"params": state.params, "batch_stats": state.batch_stats}
    if args.train_lstm:
        at_vars = run_train_lstm(args, cfg, pipeline, mesh, sp_vars)
    if args.train_late or args.eval:
        if at_vars is None:
            state = create_at_state(rng, pipeline)
            state = restore_checkpoint(
                args.at_ckpt or os.path.join(args.save_dir, "at"), state
            )
            at_vars = {"params": state.params}
    if args.train_late:
        lf_state = run_train_late(args, cfg, pipeline, mesh, sp_vars, at_vars)
    if args.eval:
        if lf_state is None:
            state = create_lf_state(rng, pipeline)
            lf_state = restore_checkpoint(
                args.lf_ckpt or os.path.join(args.save_dir, "lf"), state
            )
        run_eval(args, cfg, pipeline, sp_vars, at_vars, lf_state)


if __name__ == "__main__":
    main()
