"""Configuration dataclasses for the whole pipeline.

Mirrors the argparse surface of ``ref:gaze_full.py`` (flags ``--train_sp``,
``--train_lstm``, ``--train_late``, ``--extract_late``, lr/batch/epoch and
data-path flags — SURVEY.md §2 "Orchestrator" [M]) as one typed config tree.
Values tagged [U] in SURVEY.md are explicit fields with documented defaults
so they can be flipped without code changes once the reference is
re-verifiable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ImageConfig:
    """Input geometry + normalization (ref:data/STdatas.py [M])."""

    height: int = 224
    width: int = 224
    # ImageNet mean/std, RGB order — the reference normalizes with these
    # for the VGG16 spatial stream [M].
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # Ground-truth gaze heatmaps are Gaussians pasted at the gaze point;
    # sigma in pixels at 224x224 [U — defensible default, documented].
    heatmap_sigma: float = 32.0


@dataclasses.dataclass(frozen=True)
class TVL1Config:
    """Pyramidal TV-L1 optical flow (replaces yjxiong/dense_flow, C++/CUDA).

    Defaults follow Sanchez et al., IPOL 2013 ("TV-L1 Optical Flow
    Estimation"), with *fixed* iteration counts instead of convergence
    thresholds so every shape/trip-count is static under jit.
    """

    pyramid_levels: int = 5
    pyramid_factor: float = 0.5      # downscale per level
    tau: float = 0.25                # dual ascent time step
    lambda_: float = 0.15            # data-term weight
    theta: float = 0.3               # tightness
    warps: int = 5                   # image warps per level
    iters: int = 10                  # primal-dual iterations per warp
    # dense_flow stores flow as 8-bit JPEGs clipped to [-bound, bound] and
    # mapped to [0, 255] [U — bound value; dense_flow's common default].
    quant_bound: float = 15.0
    # Presmoothing sigma applied before pyramid construction.
    presmooth_sigma: float = 0.8
    # 3x3 median filter on the flow between warps (OpenCV medianBlurring).
    median_filter: bool = True
    # Median kernel width: 3 = one 3x3 pass (IPOL); 5 = two chained 3x3
    # passes — a documented approximation of OpenCV's medianBlur(5)
    # (true 5x5 median = 25-wide sorting network; the iterated-3x3
    # root-median agrees away from fine structure, which TV-smooth flow
    # fields lack).
    median_kernel: int = 3
    # Use the block-anchored Pallas warp kernel on TPU (ops/pallas/warp.py);
    # falls back to the gather-based warp off-TPU regardless.
    use_pallas_warp: bool = True
    # Fuse the primal-dual inner loop into a VMEM-resident Pallas kernel
    # on TPU (ops/pallas/tvl1_pd.py); off-TPU uses the lax.scan path.
    use_pallas_pd: bool = True
    # Solve the flow at this fraction of the model grid and bilinearly
    # upsample (flow values rescaled). 1.0 = parity path (solve at the
    # model's 224^2 grid). 0.5 is the production serving preset: 4x less
    # solver work; the temporal stream consumes 8-bit-quantized flow
    # images anyway (SURVEY.md §2 "Flow input format"), so the accuracy
    # cost is at the quantization noise level.
    flow_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class SPConfig:
    """Two-stream saliency-prediction network (ref:models/SP.py [M]).

    Spatial stream: RGB (3ch). Temporal stream: quantized TV-L1 flow
    image (2ch x,y by default; the reference's channel packing is [U]).
    Streams fuse at conv5_3 (concat 1024ch -> 1x1 conv -> 512) [U fusion
    point]; decoder mirrors the encoder with ConvTranspose+BN+ReLU,
    14x14 -> 224x224, final 1-channel sigmoid saliency map [M].
    """

    flow_channels: int = 2
    fused_channels: int = 512
    decoder_channels: Tuple[int, ...] = (512, 256, 128, 64)
    use_batchnorm: bool = True
    # Channel widths of the VGG encoder stages (a max-pool follows every
    # stage but the last). The default is canonical VGG16 — the parity
    # configuration [M]. Narrow variants keep the SAME layout (2,2,3,3,3
    # convs -> identical layer names conv{s}_{i}), so every code path
    # (quant/QAT/serving/torch export) works unchanged; used by
    # dryrun_multichip to validate full sharding with cheap compiles.
    # The conv5 width must match ATConfig.feature_dim.
    stages: Tuple[Tuple[int, ...], ...] = (
        (64, 64),
        (128, 128),
        (256, 256, 256),
        (512, 512, 512),
        (512, 512, 512),
    )
    # Rematerialization (jax.checkpoint) of training activations — trades
    # one extra forward pass of FLOPs for not storing the VGG stream
    # activations between forward and backward (the early conv layers at
    # full resolution are ~90% of the train step's activation memory).
    #   "none"     — store everything (parity default; fastest step);
    #   "encoders" — nn.remat both VGG streams: backward recomputes each
    #                stream's forward once; enables ~3x larger per-chip
    #                batches (tools/bench_remat.py for measured numbers);
    #   "full"     — also remat the decoder blocks.
    # Parameter trees are identical across settings (nn.remat preserves
    # scopes), so checkpoints are interchangeable. Inference is
    # unaffected (remat only changes what the backward pass stores).
    remat: str = "none"


@dataclasses.dataclass(frozen=True)
class ATConfig:
    """Attention-transition LSTM (ref:models/LSTMnet.py, ref:AT.py [M]).

    Operates on 512-d channel-weight vectors pooled from conv5 features
    around the fixation point; predicts the *next* fixation's weight
    vector (MSE) [M; hidden size / depth are [U] — configurable].
    """

    feature_dim: int = 512
    hidden_size: int = 512
    num_layers: int = 1
    # ROI width in feature cells for fixation pooling: fixation_pool
    # averages a roi_size x roi_size window (3 -> 3x3 cells on the 14x14
    # conv5 grid) centered on the gaze point.
    roi_size: int = 3
    # conv5 stride relative to input pixels (224/14).
    feature_stride: int = 16


@dataclasses.dataclass(frozen=True)
class LFConfig:
    """Late-fusion conv head (ref:models/late_fusion.py [M]).

    concat(SP map, AT map) = 2ch -> small 3x3 conv stack -> 1ch sigmoid.
    Exact depth/width is [U]; defaults chosen small, configurable.
    """

    channels: Tuple[int, ...] = (32, 32, 8)
    # Border handling of the 3x3 convs. "zero" = torch Conv2d default =
    # the parity behavior [M]. Zero padding can learn a CONSTANT bright
    # border pixel (the corner's receptive field is mostly padding, so
    # its output is input-independent) that hijacks the heatmap argmax
    # whenever the true response is weak — measured on the task-cycle
    # corpus (docs/STATUS.md). "edge" = replicate padding: the border
    # sees extrapolated map values and can't manufacture an artifact.
    padding: str = "zero"
    # Residual fusion (beyond-reference, off for parity): the conv stack
    # predicts a LOGIT-space correction to the SP saliency channel —
    # sigmoid(logit(sal) + stack(maps)) — and the final conv kernel is
    # zero-initialized, so a fresh LF head starts EXACTLY at the
    # saliency map and training can only move off that baseline where
    # the attention channel helps. Motivated by the task-cycle ablation
    # (docs/STATUS_r3.md): the plain stack converges to 14.03° AAE vs
    # the saliency head's 13.59° because it must re-learn the saliency
    # identity from random init before it can refine it. Parameter
    # shapes are unchanged (checkpoints interchangeable; behavior not).
    residual: bool = False


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Focal-style BCE on dense heatmaps (ref:floss.py [M])."""

    gamma: float = 2.0
    eps: float = 1e-7


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """GTEA Gaze+ camera geometry for AAE (ref:utils.py [U intrinsics]).

    AAE converts the pixel offset between predicted and GT gaze into a
    visual angle via a pinhole model. The exact intrinsics used upstream
    are unverifiable (empty mount); we default to the GTEA Gaze+ capture
    geometry commonly cited for the dataset's head-mounted camera and
    expose every number.
    """

    # Native capture resolution of GTEA Gaze+ videos.
    native_width: int = 960
    native_height: int = 720
    # Horizontal field of view, degrees.
    fov_x_deg: float = 74.0

    @staticmethod
    def gtea_gaze_plus() -> "CameraConfig":
        """GTEA Gaze+ capture geometry (the default)."""
        return CameraConfig()

    @staticmethod
    def gtea_gaze() -> "CameraConfig":
        """GTEA Gaze (original) capture geometry: Tobii eye-tracker scene
        camera, 640x480 [U — re-verify against ref:utils.py when the
        mount appears; the reference reports both datasets]."""
        return CameraConfig(native_width=640, native_height=480, fov_x_deg=64.0)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Per-stage optimization knobs (ref:gaze_full.py flags [M])."""

    batch_size: int = 32
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    epochs: int = 10
    # LR schedule: "constant" (the reference's fixed Adam lr [M]),
    # "cosine" (warmup -> cosine decay over lr_decay_steps), or "step"
    # (x lr_decay_rate every lr_decay_steps). Warmup applies to all.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_decay_steps: int = 0
    lr_decay_rate: float = 0.1
    # Global-norm gradient clipping; 0 = off (the reference never clips).
    grad_clip_norm: float = 0.0
    # Gradient accumulation: microbatches per optimizer step, scanned
    # inside ONE jit step (exact mean-gradient; ~K-fold less backward
    # memory). 1 = off.
    grad_accum: int = 1
    # Per-sample horizontal-flip augmentation inside the SP/QAT train
    # steps (data/augment.py). Off on the parity path — the reference
    # trains without augmentation [U].
    augment_flip: bool = False
    # bf16 activations on the throughput path; f32 on the parity path.
    compute_dtype: str = "float32"
    checkpoint_dir: str = "save"
    checkpoint_every_steps: int = 500
    log_every_steps: int = 50
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. The model is VGG16-scale, so the only
    parallelism axis is data (SURVEY.md §2 parallelism table): batch is
    sharded over a 1-D ``data`` axis; XLA SPMD emits the gradient
    all-reduce over ICI."""

    data_axis: str = "data"
    # None -> use all visible devices.
    num_devices: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level config tree for the SP -> AT -> LF pipeline."""

    image: ImageConfig = dataclasses.field(default_factory=ImageConfig)
    tvl1: TVL1Config = dataclasses.field(default_factory=TVL1Config)
    sp: SPConfig = dataclasses.field(default_factory=SPConfig)
    at: ATConfig = dataclasses.field(default_factory=ATConfig)
    lf: LFConfig = dataclasses.field(default_factory=LFConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def dense_flow_tvl1_config() -> TVL1Config:
    """TV-L1 schedule mirroring OpenCV's DualTVL1 defaults — the solver
    dense_flow (yjxiong/dense_flow) actually wraps (SURVEY.md §2 native
    inventory): scaleStep 0.8, nscales 5, warps 5, medianBlur 5, and a
    fixed 30 primal-dual iterations per warp standing in for OpenCV's
    epsilon-stopped 10x30 outer/inner schedule (epsilon stopping is a
    dynamic trip count XLA can't compile; 30 fixed iterations matches
    the typical converged effort). Use when ``flows/`` is absent but the
    on-TPU solve should approximate the reference's flow statistics:
    ~3x the primal-dual work of the IPOL default (150 vs 50 iterations
    per level) on a 1.6x deeper effective pyramid (factor 0.8 vs 0.5).
    Cost/accuracy vs the IPOL preset: docs/STATUS.md round-3 table.
    """
    return TVL1Config(
        pyramid_levels=5,
        pyramid_factor=0.8,
        warps=5,
        iters=30,
        median_kernel=5,
    )


def default_config() -> PipelineConfig:
    return PipelineConfig()


def parity_config() -> PipelineConfig:
    """The exact-math path for reference comparison: full-grid flow
    (float32 activations are chosen by the caller via GazePipeline's
    dtype, which defaults to float32)."""
    base = PipelineConfig()
    return dataclasses.replace(
        base, tvl1=dataclasses.replace(base.tvl1, flow_scale=1.0)
    )


def production_config() -> PipelineConfig:
    """The serving/throughput preset: half-grid TV-L1 (quantization-noise
    accuracy cost, measured +0.2 deg AAE) — pair with dtype=bfloat16."""
    base = PipelineConfig()
    return dataclasses.replace(
        base, tvl1=dataclasses.replace(base.tvl1, flow_scale=0.5)
    )


def production_fast_config() -> PipelineConfig:
    """production_config + reduced TV-L1 effort (warps 3, iters 5 — 70%
    less primal-dual work): 1593 fps/chip at B=128 vs the standard
    preset's 1428 on v5e, with rollout AAE/AUC within noise of the
    parity path on the synthetic benchmark corpus (docs/STATUS.md
    round-2 solver-effort ablation). The standard preset keeps the IPOL
    iteration counts because real GTEA motion statistics are not yet
    validated at reduced effort (reference mount empty, SURVEY.md §0).
    """
    base = production_config()
    return dataclasses.replace(
        base, tvl1=dataclasses.replace(base.tvl1, warps=3, iters=5)
    )
