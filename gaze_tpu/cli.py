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
import sys
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.checkpoint import (
    restore_best_or_latest,
    restore_checkpoint,
    save_best_checkpoint,
    save_checkpoint,
)
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
from gaze_tpu.train.at import (
    build_at_validation_windows,
    build_tbptt_schedule,
    build_weight_sequences,
    create_at_state,
    fixation_onset_weights,
    make_at_eval_step,
    make_at_tbptt_step,
    make_at_train_step,
    split_at_validation,
)
from gaze_tpu.train.lf import (
    create_lf_state,
    make_lf_eval_step,
    make_lf_rollout_train_step,
    make_lf_train_step,
)
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
    p.add_argument("--train_qat", action="store_true",
                   help="quantization-aware fine-tune of the SP streams "
                        "through the deployed int8 grids (after/instead "
                        "of --train_sp); saves to save_dir/sp_qat with "
                        "the activation scales it trained against — "
                        "--quant_sp then uses those scales verbatim")
    p.add_argument("--train_lstm", action="store_true", help="train the AT LSTM")
    p.add_argument("--train_late", action="store_true", help="train the LF head")
    p.add_argument("--extract_late", action="store_true",
                   help="dump frozen SP saliency + AT attention maps to "
                        "<save_dir>/maps/<video>.npz (the reference's "
                        "map-extraction stage; the in-memory LF path does "
                        "not need it, but the files match the reference "
                        "workflow)")
    p.add_argument("--extract_flow", action="store_true",
                   help="offline dense_flow replacement: on-TPU TV-L1 "
                        "over every consecutive frame pair of "
                        "<data_root>/images/, written as 8-bit flow "
                        "images in dense_flow's layout (default "
                        "<data_root>/flows/ — which --precomputed_flow "
                        "and reference-era PyTorch workflows consume); "
                        "pair with --tvl1_preset dense_flow for the "
                        "OpenCV-matched solver schedule")
    p.add_argument("--flow_out", type=str, default=None, metavar="DIR",
                   help="--extract_flow output root (default "
                        "<data_root>/flows)")
    p.add_argument("--flow_bound", type=float, default=None,
                   help="--extract_flow quantization clip in ±pixels "
                        "(dense_flow's -b; default: the config's "
                        "tvl1.quant_bound, so produced and consumed "
                        "grids agree)")
    p.add_argument("--flow_layout", choices=["xy", "packed"], default="xy",
                   help="--extract_flow layout: flow_x_/flow_y_ "
                        "grayscale pairs (dense_flow default) or packed "
                        "(ch0=x, ch1=y) single files")
    p.add_argument("--flow_format", choices=["jpg", "png"], default="jpg",
                   help="--extract_flow image format (jpg = dense_flow "
                        "parity, lossy; png = lossless)")
    p.add_argument("--infer", type=str, default=None, metavar="PATH",
                   help="run gaze inference on a raw video file (MJPEG "
                        "AVI works with no ffmpeg; other codecs need "
                        "ffmpeg on PATH) or a directory of frames; "
                        "writes a per-frame gaze track in native pixel "
                        "coords (SURVEY §3.4 packaged end to end)")
    p.add_argument("--infer_batch", type=str, default=None, metavar="DIR",
                   help="batch inference: every video file (or per-video "
                        "frame directory) under DIR advances as one "
                        "stream of a single StreamServer pool — N videos "
                        "decode+predict in LOCKSTEP at multi-stream "
                        "throughput (the reference's val() processes "
                        "videos one at a time). Writes one gaze txt per "
                        "video to --infer_out (a directory here; default "
                        "<save_dir>/infer_batch/)")
    p.add_argument("--infer_out", type=str, default=None, metavar="TXT",
                   help="gaze-track output path (default "
                        "<save_dir>/infer_gaze.txt)")
    p.add_argument("--infer_heatmaps", type=str, default=None, metavar="DIR",
                   help="also dump predicted heatmap PNGs here")
    p.add_argument("--infer_heatmap_every", type=int, default=10,
                   help="dump every Nth heatmap (with --infer_heatmaps)")
    p.add_argument("--infer_overlay", type=str, default=None, metavar="AVI",
                   help="also write a gaze-overlay MJPEG AVI (predicted "
                        "heatmap blend + gaze marker on the native-res "
                        "frames — the reference's demo visualization)")
    p.add_argument("--infer_overlay_fps", type=int, default=24,
                   help="frame rate of the --infer_overlay video")
    p.add_argument("--eval", action="store_true",
                   help="evaluate the full pipeline: per-video sequential "
                        "rollout (fixsac-gated LSTM state carried across "
                        "frames, AT pooled at the SP argmax — SURVEY §3.4)")
    p.add_argument("--eval_map", choices=["heatmap", "saliency", "attention"],
                   default="heatmap",
                   help="which map the eval scores (rollout AND "
                        "--eval_teacher_forced): the LF fusion (default, "
                        "the reference's metric), the SP saliency alone, "
                        "or the AT attention alone — same trajectory, "
                        "per-head ablation")
    p.add_argument("--eval_teacher_forced", action="store_true",
                   help="diagnostic eval variant: stateless per-frame AT "
                        "pooled at the GT gaze (NOT the reference's "
                        "inference path; kept for ablation)")
    # data
    p.add_argument("--data_root", type=str, default=None, help="GTEA Gaze+ root")
    p.add_argument("--test_subject", type=str, default=None,
                   help="leave-one-subject-out test subject")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic moving-dot dataset")
    p.add_argument("--synthetic_blobs", type=int, default=1, metavar="K",
                   help="K > 1 switches the synthetic corpus to the "
                        "TASK-CYCLE variant: K distinct-color blobs with "
                        "no bottom-up cue for which is fixated — gaze "
                        "cycles them in a fixed color order only the AT "
                        "transition LSTM can learn (the non-vacuous "
                        "SP-vs-full ablation corpus; docs/STATUS.md)")
    p.add_argument("--synthetic_videos", type=int, default=1, metavar="V",
                   help="number of distinct synthetic training videos "
                        "(seeds 0..V-1): blob positions/backgrounds vary "
                        "per video while the task structure is shared, "
                        "so K>1 runs can't memorize one layout; eval "
                        "always uses held-out seeds 1000+")
    p.add_argument("--precomputed_flow", choices=["auto", "on", "off"],
                   default="auto",
                   help="consume dense_flow JPEGs from <root>/flows/ for "
                        "the temporal stream (strict parity with the "
                        "reference's data path) instead of solving TV-L1 "
                        "on-TPU; auto = use them when present")
    # optimization
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_schedule", choices=["constant", "cosine", "step"],
                   default="constant",
                   help="LR policy: constant (reference behavior), "
                        "warmup+cosine decay, or staircase step decay")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup steps (any schedule)")
    p.add_argument("--lr_decay_steps", type=int, default=0,
                   help="cosine: total decay horizon (0 = epochs * "
                        "steps_per_epoch); step: decay interval")
    p.add_argument("--lr_decay_rate", type=float, default=0.1,
                   help="step schedule decay factor")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off)")
    p.add_argument("--lf_padding", choices=["zero", "edge"], default="zero",
                   help="LF conv border mode: zero (torch-default parity "
                        "behavior) or edge (replicate — removes the "
                        "constant-corner argmax artifact zero padding can "
                        "learn on weak-response data; see LFConfig)")
    p.add_argument("--lf_residual", action="store_true",
                   help="residual late fusion: the LF stack predicts a "
                        "logit-space correction to the SP saliency map "
                        "and its final conv starts at zero, so a fresh "
                        "head begins exactly at the saliency baseline "
                        "(LFConfig.residual; off = parity behavior)")
    p.add_argument("--remat", choices=["none", "encoders", "full"],
                   default="none",
                   help="rematerialize (jax.checkpoint) training "
                        "activations: 'encoders' recomputes the two VGG "
                        "streams in the backward pass instead of storing "
                        "their activations (~3x larger per-chip batches "
                        "for ~25%% more step FLOPs); 'full' also remats "
                        "the decoder. Param trees/checkpoints are "
                        "identical across modes (SPConfig.remat)")
    p.add_argument("--augment_flip", action="store_true",
                   help="per-sample horizontal-flip augmentation in the "
                        "SP/QAT train steps (gaze mirrored; flow solved "
                        "downstream of the flip; precomputed flow images "
                        "get their x channel negated exactly)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step, scanned inside "
                        "one jit (exact mean gradient, ~K-fold less "
                        "backward memory); batch_size must divide by it")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=100,
                   help="synthetic-data steps per epoch")
    p.add_argument("--seq_len", type=int, default=16, help="AT sequence window")
    p.add_argument("--lf_rollout", type=int, default=0, metavar="T",
                   help="train LF on T-frame clip ROLLOUTS (gated LSTM, "
                        "AT pooled at SP argmax — the inference-time map "
                        "distribution) instead of teacher-forced "
                        "single-frame maps; 0 = teacher-forced (faster)")
    p.add_argument("--at_pool", choices=["sp_argmax", "prediction"],
                   default="sp_argmax",
                   help="AT pooling point at fixation onsets during "
                        "rollout (eval/serving/--lf_rollout): the "
                        "current SP argmax (default, parity path) or "
                        "the model's own previous final prediction "
                        "(self-tracking mode — the LSTM then "
                        "anticipates the CURRENT fixation; see the "
                        "task-cycle ablation in docs/STATUS.md)")
    p.add_argument("--decoder", choices=["deconv", "pixelshuffle", "halfres"],
                   default="deconv",
                   help="SP decoder tail on inference surfaces "
                        "(eval/serve/infer): canonical ConvTranspose or "
                        "the exact polyphase serving form "
                        "(models/decode_fast.py — same trained params, "
                        "4x fewer nominal MACs, BN folded on running "
                        "stats). Training always uses deconv")
    p.add_argument("--at_stateless", action="store_true",
                   help="ablation: train AT on independent zero-carry "
                        "windows instead of the default stateful TBPTT "
                        "(carry chained across a video's windows)")
    # checkpoints
    p.add_argument("--save_dir", type=str, default="save")
    p.add_argument("--sp_ckpt", type=str, default=None)
    p.add_argument("--at_ckpt", type=str, default=None)
    p.add_argument("--lf_ckpt", type=str, default=None)
    p.add_argument("--pretrained_vgg", type=str, default=None,
                   help="torchvision vgg16 .pth for encoder init")
    p.add_argument("--export_torch", type=str, default=None, metavar="PATH",
                   help="export the loaded SP/AT/LF weights as a torch "
                        "state-dict bundle (torch tensor conventions; "
                        "see models/weights_export.py) for validation "
                        "inside the reference's own harness")
    # misc
    p.add_argument("--image_size", type=str, default="224",
                   help="model grid: N (square) or HxW (e.g. 288x384 for "
                        "4:3 GTEA native aspect)")
    p.add_argument("--camera", choices=["gtea_plus", "gtea"],
                   default="gtea_plus",
                   help="AAE camera geometry preset: GTEA Gaze+ (960x720) "
                        "or original GTEA Gaze (640x480) — the reference "
                        "reports both datasets")
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
    p.add_argument("--flow_scale", type=float, default=1.0,
                   help="solve TV-L1 at this fraction of the model grid "
                        "and upsample (1.0 = parity path; 0.5 = the "
                        "production preset's 4x-cheaper solve)")
    p.add_argument("--tvl1_warps", type=int, default=None,
                   help="override TV-L1 warps per pyramid level "
                        "(default per TVL1Config)")
    p.add_argument("--tvl1_iters", type=int, default=None,
                   help="override TV-L1 primal-dual iterations per warp")
    p.add_argument("--tvl1_preset", choices=["ipol", "dense_flow"],
                   default="ipol",
                   help="solver schedule: ipol (Sanchez et al. defaults) "
                        "or dense_flow (OpenCV DualTVL1 defaults — scale "
                        "step 0.8, medianBlur 5, 5x30 iterations — to "
                        "approximate the reference's actual flow when "
                        "flows/ is absent; ~3x solver cost)")
    p.add_argument("--quant_sp", action="store_true",
                   help="int8-quantize the SP VGG streams for eval/"
                        "extraction (PTQ calibrated on a few training "
                        "batches; models/quant.py). Serving-path knob — "
                        "training stages ignore it")
    p.add_argument("--quant_percentile", type=float, default=None,
                   help="calibrate activation scales at this upper "
                        "percentile of |x| (e.g. 99.9) instead of the "
                        "max — robust to outlier pixels on real data")
    p.add_argument("--quant_calib_batches", type=int, default=8,
                   help="training batches used for PTQ calibration")
    p.add_argument("--quant_conv", choices=["xla", "pallas"], default="xla",
                   help="int8 conv implementation under --quant_sp: "
                        "pallas routes the deep VGG stages through the "
                        "implicit-im2col chain (ops/pallas/conv_int8.py "
                        "— bit-identical to xla; measured slower in "
                        "chain on v5e, kept as a tested alternative; "
                        "non-TPU backends fall back to xla silently)")
    p.add_argument("--quant_stem", choices=["int8", "bf16"], default="int8",
                   help="conv1_1 precision under --quant_sp: bf16 runs "
                        "the depth-27 stem off the unquantized input — "
                        "faster AND more accurate on v5e (models/quant.py "
                        "QuantVGG docstring). int8 (default) keeps the "
                        "fully-quantized chain; QAT-scale checkpoints "
                        "always use int8 (the twin they trained against)")
    p.add_argument("--quant_save", type=str, default=None, metavar="NPZ",
                   help="after PTQ/QAT quantization, write the calibrated "
                        "int8 bundle (kernels + scales + col sums, "
                        "models/quant_io.py) — the deployment artifact a "
                        "serving host loads instead of recalibrating")
    p.add_argument("--quant_load", type=str, default=None, metavar="NPZ",
                   help="serve from a saved int8 bundle (implies "
                        "--quant_sp; skips calibration — no training "
                        "data or f32 weights needed for the SP streams)")
    p.add_argument("--tboard", default=None, metavar="DIR",
                   help="also mirror step metrics into TensorBoard event "
                        "files under DIR/<stage>/ (dependency-free "
                        "writer, utils/tboard.py; SURVEY.md §5 "
                        "observability)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the debug-config stand-in "
                        "for sanitizers; SURVEY.md §5)")
    return p


def parse_image_size(spec: str) -> Tuple[int, int]:
    """'224' -> (224, 224); '288x384' -> (288, 384) as (height, width)."""
    if "x" in spec:
        h, w = spec.lower().split("x", 1)
        return int(h), int(w)
    n = int(spec)
    return n, n


def make_config(args) -> PipelineConfig:
    from gaze_tpu.core.config import CameraConfig

    base = default_config()
    ih, iw = parse_image_size(args.image_size)
    cam = (
        CameraConfig.gtea_gaze()
        if getattr(args, "camera", "gtea_plus") == "gtea"
        else CameraConfig.gtea_gaze_plus()
    )
    tvl1_base = base.tvl1
    if getattr(args, "tvl1_preset", "ipol") == "dense_flow":
        from gaze_tpu.core.config import dense_flow_tvl1_config

        tvl1_base = dense_flow_tvl1_config()
    tvl1 = dataclasses.replace(
        tvl1_base,
        flow_scale=getattr(args, "flow_scale", 1.0),
        **{
            k: v
            for k, v in (
                ("warps", getattr(args, "tvl1_warps", None)),
                ("iters", getattr(args, "tvl1_iters", None)),
            )
            if v is not None
        },
    )
    return dataclasses.replace(
        base,
        image=dataclasses.replace(base.image, height=ih, width=iw),
        camera=cam,
        tvl1=tvl1,
        sp=dataclasses.replace(
            base.sp, remat=getattr(args, "remat", "none")
        ),
        lf=dataclasses.replace(
            base.lf,
            padding=getattr(args, "lf_padding", "zero"),
            residual=getattr(args, "lf_residual", False),
        ),
        train=dataclasses.replace(
            base.train,
            batch_size=args.batch_size,
            learning_rate=args.lr,
            epochs=args.epochs,
            lr_schedule=getattr(args, "lr_schedule", "constant"),
            warmup_steps=getattr(args, "warmup_steps", 0),
            # Cosine with no explicit horizon decays over the whole run.
            lr_decay_steps=(
                getattr(args, "lr_decay_steps", 0)
                or (args.epochs * getattr(args, "steps_per_epoch", 100)
                    if getattr(args, "lr_schedule", "constant") == "cosine"
                    else 0)
            ),
            lr_decay_rate=getattr(args, "lr_decay_rate", 0.1),
            grad_clip_norm=getattr(args, "grad_clip", 0.0),
            grad_accum=getattr(args, "grad_accum", 1),
            augment_flip=getattr(args, "augment_flip", False),
        ),
    )


def _flow_mode(args) -> Optional[bool]:
    """--precomputed_flow -> pair_batches' use_precomputed_flow arg."""
    return {"auto": None, "on": True, "off": False}[
        getattr(args, "precomputed_flow", "auto")
    ]


def _synth_spec(args, cfg: PipelineConfig, seed: int,
                num_frames: Optional[int] = None) -> SyntheticSpec:
    """Synthetic-corpus spec honoring --synthetic_blobs (task-cycle
    corpora need more frames per video: one cycle visit = ~10 frames,
    and the LSTM needs several full color cycles to see)."""
    k = getattr(args, "synthetic_blobs", 1)
    if num_frames is None:
        num_frames = max(64, args.batch_size * 4)
        if k > 1:
            num_frames = max(num_frames, 40 * k)
    return SyntheticSpec(
        num_frames=num_frames,
        height=cfg.image.height, width=cfg.image.width,
        seed=seed, num_blobs=k,
    )


def _clip_batches(args, cfg: PipelineConfig, clip_len: int) -> Iterator[Dict]:
    """Contiguous-clip batch source for rollout-mode LF training."""
    if args.data_root:
        from gaze_tpu.data.gtea import clip_batches

        manifest = build_manifest(
            args.data_root,
            native_hw=(cfg.camera.native_height, cfg.camera.native_width),
        )
        subject = args.test_subject or manifest.subjects()[0]
        train_recs, _ = manifest.split_leave_one_out(subject)
        return clip_batches(
            train_recs, args.batch_size, clip_len,
            (cfg.image.height, cfg.image.width),
        )
    from gaze_tpu.data.synthetic import clip_iterator

    nv = getattr(args, "synthetic_videos", 1)
    base = 2 if nv > 1 else 0  # keep seeds 0/1/1000+ disjoint (see _batches)
    spec = _synth_spec(args, cfg, seed=base)
    return clip_iterator(
        spec, args.batch_size, clip_len, args.steps_per_epoch,
        seed=base, num_videos=nv,
    )


def _batches(args, cfg: PipelineConfig, train: bool) -> Iterator[Dict]:
    """Unified batch source: GTEA when --data_root is given, synthetic
    otherwise."""
    if args.data_root:
        manifest = build_manifest(
            args.data_root,
            native_hw=(cfg.camera.native_height, cfg.camera.native_width),
        )
        subject = args.test_subject or manifest.subjects()[0]
        train_recs, test_recs = manifest.split_leave_one_out(subject)
        recs = train_recs if train else test_recs
        return pair_batches(
            recs,
            args.batch_size,
            target_hw=(cfg.image.height, cfg.image.width),
            shuffle=train,
            use_precomputed_flow=_flow_mode(args),
        )
    # Validation (train=False) stays a single held-out sequence (seed 1);
    # training honors --synthetic_videos for layout diversity. Multi-video
    # training starts at seed 2 so seeds 0/1 (single-video train / val)
    # and 1000+ (rollout eval) stay disjoint from it.
    nv = getattr(args, "synthetic_videos", 1) if train else 1
    base = (2 if nv > 1 else 0) if train else 1
    spec = _synth_spec(args, cfg, seed=base)
    return batch_iterator(
        spec, args.batch_size, args.steps_per_epoch, seed=base, num_videos=nv
    )


def _run_sp_like_stage(args, cfg, mesh, state, ckpt_dir, step_fn, eval_fn,
                       stage: str) -> Dict:
    """Shared SP-shaped stage loop (SP training and QAT fine-tuning):
    prefetched batches -> jit step; periodic ASYNC checkpoints
    (crash-resilience — the reference loses everything past the last
    blocking epoch save, SURVEY.md §5); periodic val AAE with
    best-checkpoint tracking (ref:SP.py "saves best checkpoint" [M] —
    downstream stages restore best, not latest)."""
    logger = StepLogger(stage, every=args.log_every, tboard_dir=args.tboard)

    def validate_and_track(step_no: int) -> None:
        vb = next(iter(_batches(args, cfg, train=False)))
        m = eval_fn(state, vb)
        keep = np.asarray(vb["valid"]) > 0 if "valid" in vb else slice(None)
        val_aae = float(np.mean(np.asarray(m["aae"])[keep]))
        logger.log(
            step_no,
            {"val_aae": val_aae,
             "val_auc": float(np.mean(np.asarray(m["auc"])[keep]))},
            force=True,
        )
        save_best_checkpoint(ckpt_dir, step_no, jax.device_get(state), val_aae)

    for epoch in range(args.epochs):
        for batch in device_prefetch(_batches(args, cfg, train=True), mesh):
            state, metrics = step_fn(state, batch)
            step_no = int(state.step)
            logger.log(step_no, metrics)
            if args.ckpt_every and step_no % args.ckpt_every == 0:
                save_checkpoint(ckpt_dir, step_no, jax.device_get(state), block=False)
            if args.eval_every and step_no % args.eval_every == 0:
                validate_and_track(step_no)
    validate_and_track(int(state.step))  # stage-end val: best always exists
    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    best = restore_best_or_latest(ckpt_dir, state)
    return {"params": best.params, "batch_stats": best.batch_stats}


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
    return _run_sp_like_stage(
        args, cfg, mesh, state, ckpt_dir,
        make_sp_train_step(pipeline, mesh), make_sp_eval_step(pipeline), "sp",
    )


def _calibration_pairs(args, cfg) -> List[tuple]:
    """--quant_calib_batches training frame pairs for activation-scale
    calibration (shared by PTQ eval and QAT training)."""
    pairs = []
    for batch in _batches(args, cfg, train=True):
        pairs.append((batch["prev"], batch["cur"], batch.get("flow_img")))
        if len(pairs) >= args.quant_calib_batches:
            break
    return pairs


def run_train_qat(args, cfg, pipeline, mesh, sp_vars) -> Dict:
    """QAT stage: fine-tune the SP streams through the deployment int8
    grids (models/qat.py), starting from the trained/restored SP
    variables. Calibrates the activation scales ONCE up front (the grids
    the weights adapt to must be the grids deployment uses), persists
    them next to the checkpoints, and tracks best-val like SP."""
    from gaze_tpu.models.qat import save_act_scales
    from gaze_tpu.train.qat import (
        calibrate_qat_scales,
        make_qat_eval_step,
        make_qat_train_step,
    )

    state = create_sp_state(jax.random.key(cfg.train.seed), pipeline)
    state = state.replace(
        params=sp_vars["params"], batch_stats=sp_vars["batch_stats"]
    )
    ckpt_dir = os.path.join(args.save_dir, "sp_qat")
    state = restore_checkpoint(ckpt_dir, state)  # resume a crashed QAT run

    pairs = _calibration_pairs(args, cfg)
    if not pairs:
        raise ValueError("--train_qat: no training batches available for "
                         "activation-scale calibration")
    scales = calibrate_qat_scales(
        pipeline, {"params": state.params}, pairs,
        percentile=args.quant_percentile,
    )
    save_act_scales(ckpt_dir, scales)
    return _run_sp_like_stage(
        args, cfg, mesh, state, ckpt_dir,
        make_qat_train_step(pipeline, scales, mesh),
        make_qat_eval_step(pipeline, scales), "qat",
    )


def _extract_video_weights(args, cfg, pipeline, sp_vars) -> List[np.ndarray]:
    """Per-video fixation-onset weight sequences from the frozen SP
    encoder (in-memory — the reference's per-video .npy dumps)."""
    extract = extract_fixation_weights(pipeline)
    video_w: List[np.ndarray] = []
    if args.data_root:
        manifest = build_manifest(
            args.data_root,
            native_hw=(cfg.camera.native_height, cfg.camera.native_width),
        )
        subject = args.test_subject or manifest.subjects()[0]
        train_recs, _ = manifest.split_leave_one_out(subject)
        for v in sorted({r.video for r in train_recs}):
            recs = [r for r in train_recs if r.video == v]
            ws, fx = [], []
            for batch in pair_batches(
                recs, args.batch_size, (cfg.image.height, cfg.image.width),
                shuffle=False, drop_remainder=False,
                use_precomputed_flow=_flow_mode(args),
            ):
                ws.append(np.asarray(extract(sp_vars, batch)))
                # An untracked frame pools features at a garbage point —
                # it must not seed a fixation weight vector.
                fx.append(batch["fixsac"] * batch.get("valid", 1.0))
            if ws:
                video_w.append(
                    fixation_onset_weights(np.concatenate(ws), np.concatenate(fx))
                )
    else:
        # Same corpus/seeds the SP stage trained on (honoring
        # --synthetic_blobs / --synthetic_videos — the reference extracts
        # AT features from its own training videos, SURVEY §3.2).
        nv = getattr(args, "synthetic_videos", 1)
        base = 2 if nv > 1 else 0
        for v in range(nv):
            frames, gaze, fixsac = generate_sequence(
                _synth_spec(args, cfg, seed=base + v)
            )
            ws = []
            for s in range(1, len(frames), args.batch_size):
                idx = np.arange(s, min(s + args.batch_size, len(frames)))
                batch = {
                    "prev": frames[idx - 1], "cur": frames[idx],
                    "gaze": gaze[idx], "fixsac": fixsac[idx],
                }
                ws.append(np.asarray(extract(sp_vars, batch)))
            video_w.append(
                fixation_onset_weights(np.concatenate(ws), fixsac[1:])
            )
    return video_w


def run_train_lstm(args, cfg, pipeline, mesh, sp_vars) -> Dict:
    """AT stage: extract fixation weight sequences with the frozen SP
    encoder, then train the LSTM.

    Default = stateful TBPTT windowing (train/at.py): each video's LSTM
    carry chains across its windows, so fixation n conditions on n-1
    even at window boundaries — matching the reference's per-video
    variable-length sequences [M]. ``--at_stateless`` keeps the
    independent zero-carry windows for ablation.
    """
    video_w = _extract_video_weights(args, cfg, pipeline, sp_vars)
    video_w = [w for w in video_w if len(w) >= 2]
    if not video_w:
        raise RuntimeError("no fixation sequences extracted — check fixsac labels")
    # Held-out fixation windows: masked next-weight MSE each epoch drives
    # best-checkpoint tracking, like SP (val AAE) and LF (epoch-end AAE).
    # The val metric matches the training objective's statefulness:
    # stateless zero-carry windows for --at_stateless, carry-threaded
    # TBPTT windows (make_at_stateful_eval) for the default mode.
    video_w, val_w = split_at_validation(video_w)
    if args.at_stateless:
        val_seqs, val_mask = build_at_validation_windows(val_w, args.seq_len)
        eval_fn = make_at_eval_step(pipeline)

        def val_metric(params) -> Optional[float]:
            if not len(val_seqs):
                return None
            return float(
                eval_fn(params, jnp.asarray(val_seqs), jnp.asarray(val_mask))
            )
    else:
        from gaze_tpu.train.at import make_at_stateful_eval

        val_lanes = max(1, min(args.batch_size, len(val_w)))
        val_schedule = build_tbptt_schedule(val_w, args.seq_len, val_lanes)
        stateful_eval = make_at_stateful_eval(pipeline)

        def val_metric(params) -> Optional[float]:
            if not val_schedule:
                return None
            return stateful_eval(params, val_schedule)

    state = create_at_state(jax.random.key(cfg.train.seed), pipeline)
    ckpt_dir = args.at_ckpt or os.path.join(args.save_dir, "at")
    state = restore_checkpoint(ckpt_dir, state)
    logger = StepLogger("at", every=args.log_every, tboard_dir=args.tboard)

    def validate_and_track() -> None:
        val_mse = val_metric(state.params)
        if val_mse is None:
            return
        logger.log(int(state.step), {"val_mse": val_mse}, force=True)
        save_best_checkpoint(ckpt_dir, int(state.step), jax.device_get(state), val_mse)

    if args.at_stateless:
        # Ablation path: independent zero-carry windows, shuffled.
        all_s, all_m = [], []
        for w in video_w:
            s, m = build_weight_sequences(
                w, np.ones((len(w),), np.float32), args.seq_len,
                per_fixation=False,
            )
            all_s.append(s)
            all_m.append(m)
        seqs = np.concatenate([s for s in all_s if len(s)])
        masks = np.concatenate([m for m in all_m if len(m)])
        bs = min(args.batch_size, len(seqs))
        at_mesh = mesh
        if mesh is not None:
            if bs >= mesh.size:
                bs = (bs // mesh.size) * mesh.size
            else:
                at_mesh = None
        step_fn = make_at_train_step(pipeline, at_mesh)
        rng = np.random.default_rng(0)
        for epoch in range(args.epochs):
            order = rng.permutation(len(seqs))
            for s in range(0, len(order) - bs + 1, bs):
                idx = order[s : s + bs]
                batch = {"weights": jnp.asarray(seqs[idx]),
                         "mask": jnp.asarray(masks[idx])}
                state, metrics = step_fn(state, batch)
                logger.log(int(state.step), metrics)
            validate_and_track()
    else:
        lanes = max(1, min(args.batch_size, len(video_w)))
        at_mesh = mesh
        if mesh is not None:
            if lanes >= mesh.size:
                lanes = (lanes // mesh.size) * mesh.size
            else:
                at_mesh = None
        schedule = build_tbptt_schedule(video_w, args.seq_len, lanes)
        step_fn = make_at_tbptt_step(pipeline, at_mesh)
        L = cfg.at.num_layers
        H = cfg.at.hidden_size
        for epoch in range(args.epochs):
            carry_c = jnp.zeros((lanes, L, H), jnp.float32)
            carry_h = jnp.zeros((lanes, L, H), jnp.float32)
            for sched in schedule:
                batch = {k: jnp.asarray(v) for k, v in sched.items()}
                batch["carry_c"] = carry_c
                batch["carry_h"] = carry_h
                state, metrics = step_fn(state, batch)
                carry_c, carry_h = metrics["carry_c"], metrics["carry_h"]
                logger.log(int(state.step), {"loss": metrics["loss"]})
            validate_and_track()

    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    # Downstream stages get the best-validation LSTM, not the final
    # epoch's (ref:AT.py per-stage best-checkpoint pattern, SURVEY §2).
    best = restore_best_or_latest(ckpt_dir, state)
    return {"params": best.params}


def run_train_late(args, cfg, pipeline, mesh, sp_vars, at_vars) -> Dict:
    frozen = {"sp": sp_vars, "at": at_vars}
    state = create_lf_state(jax.random.key(cfg.train.seed), pipeline)
    ckpt_dir = args.lf_ckpt or os.path.join(args.save_dir, "lf")
    state = restore_checkpoint(ckpt_dir, state)
    if args.lf_rollout > 0:
        step_fn = make_lf_rollout_train_step(pipeline, frozen, mesh)
        batches = lambda: _clip_batches(args, cfg, args.lf_rollout)
    else:
        step_fn = make_lf_train_step(pipeline, frozen, mesh)
        batches = lambda: _batches(args, cfg, train=True)
    eval_fn = make_lf_eval_step(pipeline, frozen)
    logger = StepLogger("lf", every=args.log_every, tboard_dir=args.tboard)
    for epoch in range(args.epochs):
        for batch in device_prefetch(batches(), mesh):
            state, metrics = step_fn(state, batch)
            logger.log(int(state.step), metrics)
        # Epoch-end val + best tracking (teacher-forced proxy metric —
        # cheap; the authoritative number is run_eval's rollout).
        vb = next(iter(_batches(args, cfg, train=False)))
        m = eval_fn(state, vb)
        keep = np.asarray(vb["valid"]) > 0 if "valid" in vb else slice(None)
        val_aae = float(np.mean(np.asarray(m["aae"])[keep]))
        logger.log(int(state.step), {"val_aae": val_aae}, force=True)
        save_best_checkpoint(ckpt_dir, int(state.step), jax.device_get(state), val_aae)
    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    return restore_best_or_latest(ckpt_dir, state)


def run_extract_late(args, cfg, pipeline, sp_vars, at_vars) -> None:
    """The reference's map-extraction stage (SURVEY §3.3): dump frozen
    SP saliency + AT attention maps per video to <save_dir>/maps/.

    The in-memory LF path never reads these — they exist so reference
    users migrating their workflow find the same on-disk artifacts
    (per-video arrays keyed by frame index, float16 to halve the IO).
    """
    from gaze_tpu.train.lf import make_map_extract_step

    step = make_map_extract_step(pipeline, {"sp": sp_vars, "at": at_vars})
    out_dir = os.path.join(args.save_dir, "maps")
    os.makedirs(out_dir, exist_ok=True)

    def dump(video: str, batches) -> None:
        sal, amap, idx = [], [], []
        for batch in batches:
            m = step({k: v for k, v in batch.items() if k != "index"})
            sal.append(np.asarray(m["saliency"], np.float16))
            amap.append(np.asarray(m["attention"], np.float16))
            idx.append(np.asarray(batch.get("index", np.arange(len(sal[-1])))))
        if not sal:
            return
        path = os.path.join(out_dir, f"{video}.npz")
        np.savez_compressed(
            path,
            saliency=np.concatenate(sal),
            attention=np.concatenate(amap),
            index=np.concatenate(idx),
        )
        print({"extracted": video, "frames": sum(len(s) for s in sal),
               "path": path})

    if args.data_root:
        manifest = build_manifest(
            args.data_root,
            native_hw=(cfg.camera.native_height, cfg.camera.native_width),
        )
        subject = args.test_subject or manifest.subjects()[0]
        train_recs, test_recs = manifest.split_leave_one_out(subject)
        all_recs = train_recs + test_recs  # the reference extracts all frames
        for v in sorted({r.video for r in all_recs}):
            recs = [r for r in all_recs if r.video == v]
            dump(v, pair_batches(
                recs, args.batch_size, (cfg.image.height, cfg.image.width),
                shuffle=False, drop_remainder=False,
                use_precomputed_flow=_flow_mode(args),
            ))
    else:
        dump("synthetic", _batches(args, cfg, train=False))


def run_extract_flow(args, cfg) -> int:
    """The reference's offline dense_flow preprocessing pass (SURVEY §1
    L0), run on-TPU: TV-L1 per consecutive frame pair, quantized to
    8-bit flow images under <data_root>/flows/ (or --flow_out). Needs
    only <data_root>/images/ — gaze/fixsac annotations are not read,
    matching dense_flow's bare frame-directory interface."""
    from gaze_tpu.data.flow_extract import FlowExtractSpec, extract_flow_images

    if not args.data_root:
        raise ValueError("--extract_flow requires --data_root")
    spec = FlowExtractSpec(
        tvl1=cfg.tvl1,
        bound=args.flow_bound if args.flow_bound is not None
        else cfg.tvl1.quant_bound,
        layout=args.flow_layout,
        fmt=args.flow_format,
        batch_size=args.batch_size,
        flow_scale=args.flow_scale,
    )
    total = extract_flow_images(args.data_root, spec, out_root=args.flow_out)
    print({"extract_flow_total": total,
           "out": args.flow_out or os.path.join(args.data_root, "flows")})
    return total


def run_eval(args, cfg, pipeline, sp_vars, at_vars, lf_state, mesh=None) -> Dict[str, float]:
    """Full-pipeline evaluation; per-video AAE/AUC breakdown plus the
    average, matching the reference's report format (SURVEY.md §3.5).

    Default = the true §3.4 sequential rollout (evaluation/rollout.py):
    LSTM state carried across each video, gated on fixation onsets, AT
    pooled at the SP argmax — the reference's ``LF.val()`` semantics.
    With a mesh, video groups shard over the data axis. ``--eval_teacher_forced``
    switches to the stateless GT-gaze-pooled diagnostic (explicitly NOT
    the reference's inference path).
    """
    if not args.eval_teacher_forced:
        return _run_eval_rollout(args, cfg, pipeline, sp_vars, at_vars,
                                 lf_state, mesh=mesh)
    frozen = {"sp": sp_vars, "at": at_vars}
    eval_fn = make_lf_eval_step(
        pipeline, frozen, score_key=getattr(args, "eval_map", "heatmap")
    )

    def eval_batches(batches):
        aaes, aucs = [], []
        for batch in batches:
            m = eval_fn(lf_state, batch)
            # Untracked-gaze frames have no usable GT — excluded from the
            # aggregate, matching the reference's metric filtering [M].
            keep = np.asarray(batch["valid"]) > 0 if "valid" in batch else slice(None)
            aaes.append(np.asarray(m["aae"])[keep])
            aucs.append(np.asarray(m["auc"])[keep])
        if not aaes or not len(np.concatenate(aaes)):
            return float("nan"), float("nan")
        return (
            float(np.concatenate(aaes).mean()),
            float(np.concatenate(aucs).mean()),
        )

    per_video = {}
    if args.data_root:
        manifest = build_manifest(
            args.data_root,
            native_hw=(cfg.camera.native_height, cfg.camera.native_width),
        )
        subject = args.test_subject or manifest.subjects()[0]
        _, test_recs = manifest.split_leave_one_out(subject)
        for v in sorted({r.video for r in test_recs}):
            recs = [r for r in test_recs if r.video == v]
            aae_v, auc_v = eval_batches(
                pair_batches(
                    recs, args.batch_size,
                    (cfg.image.height, cfg.image.width),
                    shuffle=False, drop_remainder=False,
                    use_precomputed_flow=_flow_mode(args),
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


def _run_eval_rollout(args, cfg, pipeline, sp_vars, at_vars, lf_state,
                      mesh=None) -> Dict[str, float]:
    """The §3.4 sequential-rollout evaluation (see run_eval)."""
    from gaze_tpu.evaluation.rollout import rollout_eval_arrays, rollout_eval_videos

    variables = {"sp": sp_vars, "at": at_vars, "lf": {"params": lf_state.params}}
    per_video: Dict[str, Tuple[float, float]] = {}
    if args.data_root:
        manifest = build_manifest(
            args.data_root,
            native_hw=(cfg.camera.native_height, cfg.camera.native_width),
        )
        subject = args.test_subject or manifest.subjects()[0]
        _, test_recs = manifest.split_leave_one_out(subject)
        vids: Dict[str, List] = {}
        for r in test_recs:
            vids.setdefault(r.video, []).append(r)
        results = rollout_eval_videos(
            pipeline, variables, vids,
            use_precomputed_flow=_flow_mode(args),
            mesh=mesh,
            score_key=getattr(args, "eval_map", "heatmap"),
        )
        for v in sorted(results):
            aae_v, auc_v, n = results[v]
            per_video[v] = (aae_v, auc_v)
            print({"video": v, "AAE_deg": round(aae_v, 3),
                   "AUC": round(auc_v, 4), "frames": n})
        aae = float(np.mean([a for a, _ in per_video.values()]))
        auc = float(np.mean([c for _, c in per_video.values()]))
    else:
        # Synthetic: a handful of held-out moving-dot videos with
        # DISTINCT seeds, rolled out sequentially.
        n_videos = 4
        k = getattr(args, "synthetic_blobs", 1)
        T = max(32, args.batch_size, 40 * k if k > 1 else 0)
        frames, gaze, fixsac = [], [], []
        for i in range(n_videos):
            f, g, fx = generate_sequence(
                _synth_spec(args, cfg, seed=1000 + i, num_frames=T)
            )
            frames.append(f)
            gaze.append(g)
            fixsac.append(fx)
        aae_s, auc_s, cnt = rollout_eval_arrays(
            pipeline, variables,
            np.stack(frames), np.stack(gaze), np.stack(fixsac),
            mesh=mesh,
            score_key=getattr(args, "eval_map", "heatmap"),
        )
        for i in range(n_videos):
            per_video[f"synthetic_{i}"] = (
                float(aae_s[i] / cnt[i]), float(auc_s[i] / cnt[i])
            )
        aae = float(aae_s.sum() / cnt.sum())
        auc = float(auc_s.sum() / cnt.sum())

    result = {"AAE_deg": aae, "AUC": auc}
    print(result)
    return result


def run_infer(args, cfg, pipeline, sp_vars, at_vars, lf_state) -> str:
    """``--infer PATH``: raw video (or a directory of frames) → per-frame
    gaze track — the reference's practical end-use, SURVEY.md §3.4's
    one-frame inference loop packaged as a command.

    L0 ingestion (ffmpeg when present, else the pure-Python MJPEG-AVI
    demuxer, else cv2/avcodec for MP4/H.264/XVID — data/video.py) →
    streaming sequential rollout through
    StreamServer (LSTM state carried across the whole video, fixation
    onsets from online I-DT on the model's own predicted gaze — no eye
    tracker at inference) → ``<out>.txt`` with one "x y" row per frame
    in NATIVE pixel coordinates, mirroring the dataset's gaze txt
    format. Frame 0 has no flow pair and is written as "-1 -1",
    matching StreamServer's first-tick semantics.

    Note: frames are host-resized (PIL bilinear) to the model grid
    before H2D — the serving transport layout — so heatmaps/gaze can
    differ from the on-device-resize eval path at the last ulp.
    """
    import tempfile

    from PIL import Image

    from gaze_tpu.serve import StreamServer
    from gaze_tpu.utils.logging import dump_heatmap_png

    src = args.infer
    frames_dir = src
    if os.path.isfile(src):
        from gaze_tpu.data.video import extract_frames

        frames_dir = tempfile.mkdtemp(prefix="gaze_infer_frames_")
        n = extract_frames(src, frames_dir)
        print({"infer_extracted_frames": n, "frames_dir": frames_dir})
    paths = _list_frames(frames_dir)
    if not paths:
        raise FileNotFoundError(f"--infer: no frames found under {frames_dir}")

    th, tw = cfg.image.height, cfg.image.width
    variables = {"sp": sp_vars, "at": at_vars, "lf": {"params": lf_state.params}}
    # The overlay video blends every frame's heatmap, so it also needs maps.
    want_maps = bool(args.infer_heatmaps) or bool(args.infer_overlay)
    server = StreamServer(
        cfg, variables, max_streams=1, dtype=pipeline.dtype,
        keep_heatmaps=want_maps, quant_sp=pipeline.quant_sp,
        at_pool=pipeline.at_pool, decoder_impl=pipeline.decoder_impl,
    )
    server.attach(0)

    native_wh = None
    results = []

    def take(out):
        if out is None:
            return
        g = np.asarray(out["gaze"])[0]
        hm = np.asarray(out["heatmap"])[0] if want_maps else None
        results.append((g, hm))

    for p in paths:
        img = Image.open(p).convert("RGB")
        if native_wh is None:
            native_wh = img.size
        # Serving transport layout: model-grid uint8 over the wire.
        frame = np.asarray(img.resize((tw, th), Image.BILINEAR), np.uint8)
        take(server.submit(frame[None]))
    take(server.flush())

    nw, nh = native_wh
    out_path = args.infer_out or os.path.join(args.save_dir, "infer_gaze.txt")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    _write_track(out_path, [(g[0], g[1]) for g, _ in results],
                 (nw, nh), (tw, th))
    if want_maps:
        os.makedirs(args.infer_heatmaps, exist_ok=True)
        for i, (_, hm) in enumerate(results):
            if hm is not None and i % args.infer_heatmap_every == 0:
                dump_heatmap_png(
                    os.path.join(args.infer_heatmaps, f"{i:06d}.png"), hm
                )
    if args.infer_overlay:
        from gaze_tpu.utils.viz import render_gaze_track, write_overlay_video

        gazes = [
            (-1.0, -1.0) if g[0] < 0 else (g[0] * nw / tw, g[1] * nh / th)
            for g, _ in results
        ]
        n = write_overlay_video(
            args.infer_overlay,
            render_gaze_track(paths, gazes, [hm for _, hm in results]),
            fps=args.infer_overlay_fps,
        )
        print({"infer_overlay": args.infer_overlay, "overlay_frames": n})
    print({"infer_frames": len(results), "gaze_track": out_path,
           "native_size": [nw, nh]})
    return out_path


_VIDEO_EXTS = (".avi", ".mp4", ".m4v", ".mov", ".mkv", ".mpg", ".mpeg")
_FRAME_EXTS = (".jpg", ".jpeg", ".png")


def _list_frames(frames_dir: str) -> List[str]:
    """Sorted frame-image paths under a per-video directory."""
    return sorted(
        os.path.join(frames_dir, f)
        for f in os.listdir(frames_dir)
        if f.lower().endswith(_FRAME_EXTS)
    )


def _write_track(path: str, gazes, native_wh, model_wh) -> None:
    """Gaze rows in NATIVE pixels, the --infer txt format ("-1 -1" for
    frames with no prediction)."""
    nw, nh = native_wh
    tw, th = model_wh
    with open(path, "w") as f:
        for gx, gy in gazes:
            if gx < 0:
                f.write("-1 -1\n")
            else:
                f.write(f"{gx * nw / tw:.2f} {gy * nh / th:.2f}\n")


def run_infer_batch(args, cfg, pipeline, sp_vars, at_vars, lf_state) -> str:
    """``--infer_batch DIR``: N videos as N lockstep streams of ONE
    StreamServer pool.

    The reference's practical loop (ref:LF.py ``val()`` [M], SURVEY.md
    §3.4) processes videos one at a time; a TPU chip at 224² serves
    >2000 frames/sec across a batch, so batch inference is the natural
    deployment shape: every video file (data/video.py ingestion — MJPEG
    AVI / MP4 / XVID / MOV without an ffmpeg binary) or per-video frame
    directory under DIR claims one stream slot, frames decode per tick
    through the threaded C++ batch decoder (data/native_io.decode_batch)
    at the model grid, and streams detach as their videos end. Output:
    one ``<stem>.txt`` gaze track per video (native pixels, ``--infer``
    format: first frame "-1 -1").
    """
    import shutil
    import tempfile

    from PIL import Image

    from gaze_tpu.data.native_io import decode_batch
    from gaze_tpu.data.video import extract_frames
    from gaze_tpu.serve import StreamServer

    root = args.infer_batch
    entries = sorted(os.listdir(root))
    videos: List[Tuple[str, List[str]]] = []  # (stem, frame paths)
    tmp_dirs: List[str] = []
    for name in entries:
        path = os.path.join(root, name)
        if os.path.isfile(path) and name.lower().endswith(_VIDEO_EXTS):
            frames_dir = tempfile.mkdtemp(prefix=f"gaze_batch_{name}_")
            tmp_dirs.append(frames_dir)
            extract_frames(path, frames_dir)
            stem = os.path.splitext(name)[0]
        elif os.path.isdir(path):
            frames_dir, stem = path, name
        else:
            continue
        paths = _list_frames(frames_dir)
        if paths:
            videos.append((stem, paths))
    if not videos:
        raise FileNotFoundError(
            f"--infer_batch: no videos or frame directories under {root!r}"
        )
    stems = [stem for stem, _ in videos]
    dupes = sorted({x for x in stems if stems.count(x) > 1})
    if dupes:
        raise ValueError(
            f"--infer_batch: duplicate output stems {dupes} (e.g. a.avi "
            "next to a.mp4 or a frame directory 'a') would overwrite each "
            "other's gaze tracks — rename the inputs"
        )

    th, tw = cfg.image.height, cfg.image.width
    n = len(videos)
    variables = {"sp": sp_vars, "at": at_vars, "lf": {"params": lf_state.params}}
    server = StreamServer(
        cfg, variables, max_streams=n, dtype=pipeline.dtype,
        quant_sp=pipeline.quant_sp, at_pool=pipeline.at_pool,
        decoder_impl=pipeline.decoder_impl,
    )
    native_wh = []
    for v, (_, paths) in enumerate(videos):
        server.attach(v)
        with Image.open(paths[0]) as im:
            native_wh.append(im.size)

    lens = [len(p) for _, p in videos]
    t_max = max(lens)
    tracks: List[List[Tuple[float, float]]] = [[] for _ in videos]

    def take(out):
        if out is None:
            return
        g = np.asarray(out["gaze"])
        for v in range(n):
            if len(tracks[v]) < lens[v]:
                tracks[v].append((float(g[v, 0]), float(g[v, 1])))

    frame = np.zeros((n, th, tw, 3), np.uint8)
    for t in range(t_max):
        live = [v for v in range(n) if t < lens[v]]
        # decode_batch routes native-vs-PIL off its FIRST path (its
        # batches are homogeneous per call), so group mixed-format
        # corpora (JPEG frame dirs next to PNG ones) by extension.
        groups: Dict[bool, List[int]] = {}
        for v in live:
            is_jpg = videos[v][1][t].lower().endswith((".jpg", ".jpeg"))
            groups.setdefault(is_jpg, []).append(v)
        for vs in groups.values():
            decoded = decode_batch(
                [videos[v][1][t] for v in vs], target_hw=(th, tw)
            )
            for i, v in enumerate(vs):
                frame[v] = decoded[i]
        # Ended videos keep re-feeding their final frame: submit() lags
        # results by one tick, so detaching when a video ends would
        # zero out its LAST real frame's gaze — the track-length guard
        # in take() already stops recording past each video's end.
        take(server.submit(frame.copy()))
    take(server.flush())

    # --infer_out names a FILE for --infer; only honor it as this mode's
    # output DIRECTORY when --infer isn't also claiming it.
    out_dir = (args.infer_out if args.infer_out and not args.infer
               else os.path.join(args.save_dir, "infer_batch"))
    os.makedirs(out_dir, exist_ok=True)
    for v, (stem, _) in enumerate(videos):
        _write_track(os.path.join(out_dir, f"{stem}.txt"), tracks[v],
                     native_wh[v], (tw, th))
    for d in tmp_dirs:  # extracted-frame dumps (one per video file)
        shutil.rmtree(d, ignore_errors=True)
    print({"infer_batch_videos": n, "frames": sum(lens),
           "out_dir": out_dir})
    return out_dir


def main(argv: Optional[List[str]] = None) -> None:
    args = build_argparser().parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = make_config(args)
    pipeline = GazePipeline(
        cfg,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        at_pool=getattr(args, "at_pool", "sp_argmax"),
        decoder_impl=getattr(args, "decoder", "deconv"),
    )
    # DP mesh sized so the batch divides across it: the largest divisor
    # of batch_size that fits the available (or requested) devices.
    avail = args.dp_devices or jax.device_count()
    n_dp = max(d for d in range(1, avail + 1) if args.batch_size % d == 0)
    mesh = make_mesh(n_dp) if n_dp > 1 else None

    rng = jax.random.key(cfg.train.seed)
    sp_vars = at_vars = None
    lf_state = None

    def restore_trained(module: str, directory: str, template):
        # restore_best_or_latest, but LOUD when nothing exists: consumer
        # stages (--eval/--infer/--export_torch/--extract_late, later
        # trainers) silently scoring random-init weights is the classic
        # checkpoint-dir-typo footgun — the reference hard-fails on a
        # missing .pth.tar; Orbax's template fallback is quieter.
        state, restored = restore_best_or_latest(
            directory, template, report=True
        )
        if not restored:
            print(
                f"warning: no {module} checkpoint under {directory!r} — "
                f"continuing from random init (train the stage first or "
                f"pass --{module}_ckpt)",
                file=sys.stderr,
            )
        return state

    # Flow extraction runs first: it is the reference's offline
    # preprocessing stage, and training stages in the same invocation
    # then auto-detect the freshly written flows/ (--precomputed_flow).
    if args.extract_flow:
        run_extract_flow(args, cfg)
    if args.train_sp:
        sp_vars = run_train_sp(args, cfg, pipeline, mesh)
    if (args.train_qat or args.train_lstm or args.train_late or args.eval
            or args.extract_late or args.export_torch or args.infer
            or args.infer_batch or (args.quant_sp and args.quant_save)):
        if sp_vars is None:
            state = create_sp_state(rng, pipeline)
            state = restore_trained(
                "sp", args.sp_ckpt or os.path.join(args.save_dir, "sp"), state
            )
            sp_vars = {"params": state.params, "batch_stats": state.batch_stats}
    # QAT scales travel with the checkpoint that trained against them:
    # either this invocation's QAT run, or an --sp_ckpt pointing at one.
    qat_scales = None
    if args.train_qat:
        sp_vars = run_train_qat(args, cfg, pipeline, mesh, sp_vars)
        from gaze_tpu.models.qat import load_act_scales

        qat_scales = load_act_scales(os.path.join(args.save_dir, "sp_qat"))
    elif args.sp_ckpt:
        from gaze_tpu.models.qat import load_act_scales

        qat_scales = load_act_scales(args.sp_ckpt)
    if args.train_lstm:
        at_vars = run_train_lstm(args, cfg, pipeline, mesh, sp_vars)
    if (args.train_late or args.eval or args.extract_late or args.export_torch
            or args.infer or args.infer_batch):
        if at_vars is None:
            state = create_at_state(rng, pipeline)
            state = restore_trained(
                "at", args.at_ckpt or os.path.join(args.save_dir, "at"), state
            )
            at_vars = {"params": state.params}
    # quant_sp applies to EVAL/EXTRACTION only; training stages keep the
    # full-precision pipeline (a separate object, so --train_late in the
    # same invocation never trains the LF head through the int8 path).
    eval_pipeline = pipeline
    if args.quant_load and (args.eval or args.extract_late or args.infer
                            or args.infer_batch):
        # Deployment path: a saved int8 bundle replaces calibration
        # entirely (models/quant_io.py).
        from gaze_tpu.models.quant_io import load_quant_sp

        qsp = load_quant_sp(args.quant_load)
        print({"quant_sp": "int8", "bundle": args.quant_load})
        if args.quant_save:
            print("--quant_save ignored under --quant_load (the bundle "
                  "already exists)", file=sys.stderr)
        eval_pipeline = dataclasses.replace(
            pipeline, quant_sp=qsp, quant_conv=args.quant_conv)
    elif args.quant_sp and (args.eval or args.extract_late or args.infer
                            or args.infer_batch or args.quant_save):
        # PTQ: calibrate activation scales on a few training batches via
        # the pipeline's own preprocessing — including precomputed flow
        # images when the data path supplies them, so the temporal
        # stream's scales match the distribution it will serve.
        from gaze_tpu.models.quant import calibrate_pipeline_sp

        if qat_scales is not None:
            # QAT checkpoint: quantize with the exact grids the weights
            # were fine-tuned against — recalibrating would shift the
            # scales and undo the adaptation.
            from gaze_tpu.models.quant import QuantSP, build_quant_vgg

            qsp = QuantSP(
                spatial=build_quant_vgg(
                    sp_vars["params"]["spatial"], qat_scales["spatial"]
                ),
                temporal=build_quant_vgg(
                    sp_vars["params"]["temporal"], qat_scales["temporal"]
                ),
            )
            if args.quant_stem == "bf16":
                print("--quant_stem bf16 ignored: QAT scales quantize "
                      "through the exact chain the weights were "
                      "fine-tuned against (full int8)", file=sys.stderr)
            print({"quant_sp": "int8", "scales": "qat"})
        else:
            pairs = _calibration_pairs(args, cfg)
            if not pairs:
                raise ValueError(
                    "--quant_sp: no training batches available for PTQ "
                    "calibration (empty training split?)"
                )
            qsp = calibrate_pipeline_sp(
                pipeline, {"sp": sp_vars}, pairs,
                percentile=args.quant_percentile,
                bf16_stem=args.quant_stem == "bf16",
            )
            print({"quant_sp": "int8", "calibration_batches": len(pairs),
                   "percentile": args.quant_percentile,
                   "stem": args.quant_stem})
        if args.quant_save:
            from gaze_tpu.models.quant_io import save_quant_sp

            save_quant_sp(args.quant_save, qsp)
            print({"quant_bundle_saved": args.quant_save})
        eval_pipeline = dataclasses.replace(
            pipeline, quant_sp=qsp, quant_conv=args.quant_conv)
    if args.extract_late:
        run_extract_late(args, cfg, eval_pipeline, sp_vars, at_vars)
    if args.train_late:
        lf_state = run_train_late(args, cfg, pipeline, mesh, sp_vars, at_vars)
    if args.eval or args.export_torch or args.infer or args.infer_batch:
        if lf_state is None:
            state = create_lf_state(rng, pipeline)
            lf_state = restore_trained(
                "lf", args.lf_ckpt or os.path.join(args.save_dir, "lf"), state
            )
    if args.eval:
        run_eval(args, cfg, eval_pipeline, sp_vars, at_vars, lf_state, mesh=mesh)
    if args.infer:
        run_infer(args, cfg, eval_pipeline, sp_vars, at_vars, lf_state)
    if args.infer_batch:
        run_infer_batch(args, cfg, eval_pipeline, sp_vars, at_vars, lf_state)
    if args.export_torch:
        from gaze_tpu.models.weights_export import export_pipeline_to_torch

        export_pipeline_to_torch(
            {
                "sp": sp_vars,
                "at": at_vars,
                "lf": {"params": lf_state.params},
            },
            args.export_torch,
        )
        print({"exported_torch": args.export_torch})


if __name__ == "__main__":
    main()
