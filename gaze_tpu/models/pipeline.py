"""Fused end-to-end gaze pipeline: flow -> SP -> AT -> LF in one jit.

This is the parity-critical path of SURVEY.md §3.4 [C]:

    frame t RGB, frames (t-1, t) -> TV-L1 flow        (on-TPU, ops.tvl1)
    -> resize 224^2, normalize                         (ops.preprocess)
    -> SP two-stream forward -> S_t, conv5 F_t
    -> fixsac(t): if fixation, update LSTM state with w pooled from F_t
       at the gaze point; LSTM -> w_hat
    -> A_t = upsample(normalize(sum_c w_hat_c * F_t[c]))
    -> LF(concat(S_t, A_t)) -> final heatmap H_t -> argmax = gaze point

Where the reference runs three filesystem-mediated stages (dump conv5
features / SP maps / AT maps to disk between modules — SURVEY.md §3.2
boundary note), this pipeline keeps every intermediate HBM-resident and
compiles the whole per-frame step into one XLA program. The
data-dependent pieces are made jit-safe per SURVEY.md §7 hard part 2:
fixsac-conditioned LSTM updates are ``where``-gated on a mask, and the
ROI crop is a clamped ``dynamic_slice``.

Multi-stream throughput (BASELINE.json: >=500 frames/sec/chip) comes
from batching B independent video streams per step and scanning over
time with ``lax.scan`` — see :func:`make_clip_fn`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gaze_tpu.core.config import PipelineConfig
from gaze_tpu.models.at import LSTMNet, attention_map, fixation_pool
from gaze_tpu.models.lf import LateFusion
from gaze_tpu.models.sp import SPNet
from gaze_tpu.ops.heatmap import heatmap_argmax
from gaze_tpu.ops.preprocess import (
    normalize_flow_image,
    normalize_rgb,
    prepare_temporal_input,
    resize_frames,
    rgb_to_gray,
    to_float,
)
from gaze_tpu.ops.tvl1 import tvl1_flow


class StreamState(NamedTuple):
    """Per-stream recurrent state carried across frames."""

    carries: Any          # LSTM (c, h) pairs, list over layers
    w_hat: jnp.ndarray    # (B, C) last predicted channel weights
    prev_fix: jnp.ndarray # (B,) previous frame's fixation bit — the AT
                          # LSTM advances once per fixation ONSET
                          # ("if new fixation" — SURVEY.md §3.4 [M]),
                          # not on every frame within a fixation
    prev_gaze: jnp.ndarray # (B, 2) previous frame's FINAL predicted
                          # gaze — the pooling point when
                          # ``at_pool="prediction"`` (self-tracking
                          # streaming mode); carried but unused under
                          # the default "sp_argmax"


@dataclasses.dataclass
class GazePipeline:
    """Bundles the three modules plus config into pure jit-able fns.

    quant_sp: optional ``models.quant.QuantSP`` — when set, the two VGG
    encoder streams run the calibrated int8 path (conv accumulating in
    int32 on the MXU) and only the fuse/decoder tail uses ``dtype``;
    ~2x serving throughput, see models/quant.py.
    """

    config: PipelineConfig
    dtype: Any = jnp.float32
    quant_sp: Any = None
    # int8 conv implementation for the quant streams: "xla" (default)
    # or "pallas" — the implicit-im2col chain for the deep stages
    # (ops/pallas/conv_int8.py; bit-identical, TPU-only — other
    # backends silently fall back to XLA).
    quant_conv: str = "xla"
    # Where the AT module pools its channel weights at a fixation onset
    # when no teacher gaze is supplied:
    #   "sp_argmax"  — the CURRENT frame's SP saliency argmax (default;
    #                  the parity path pinned by the golden bundles);
    #   "prediction" — the PREVIOUS frame's final-heatmap argmax: the
    #                  model tracks its own gaze estimate, so the LSTM
    #                  consumes the fixation sequence one onset late
    #                  and its output ANTICIPATES the current fixation
    #                  — the lock-on mode the task-cycle ablation
    #                  measures (docs/STATUS.md).
    at_pool: str = "sp_argmax"
    # SP decoder-tail implementation for INFERENCE surfaces:
    #   "deconv"      — canonical ConvTranspose tail (parity path; the
    #                   only choice that supports train-mode BN);
    #   "pixelshuffle" — exact polyphase re-formulation
    #                   (models/decode_fast.py): same trained params,
    #                   4x fewer nominal MACs, BN folded (running
    #                   stats). Measured SLOWER on v5e (bandwidth-bound
    #                   tail) — kept as the exactness-tested alternative;
    #   "halfres"     — canonical blocks, but only the exact even-sample
    #                   subgrid of the final block; out_conv + sigmoid at
    #                   half resolution, 1-channel interleave back up.
    #                   Accuracy knob of the half-grid-flow class.
    decoder_impl: str = "deconv"

    def __post_init__(self):
        if self.at_pool not in ("sp_argmax", "prediction"):
            raise ValueError(f"unknown at_pool {self.at_pool!r}")
        if self.decoder_impl not in ("deconv", "pixelshuffle", "halfres"):
            raise ValueError(f"unknown decoder_impl {self.decoder_impl!r}")
        self.sp = SPNet(self.config.sp, dtype=self.dtype)
        self.lstm = LSTMNet(self.config.at, dtype=self.dtype)
        self.lf = LateFusion(self.config.lf, dtype=self.dtype)

    # ---------------------------------------------------------- init ----
    def init_variables(self, rng: jax.Array, batch: int = 1) -> Dict[str, Any]:
        cfg = self.config
        h, w = cfg.image.height, cfg.image.width
        r1, r2, r3 = jax.random.split(rng, 3)
        rgb = jnp.zeros((batch, h, w, 3), self.dtype)
        flow = jnp.zeros((batch, h, w, cfg.sp.flow_channels), self.dtype)
        sp_vars = self.sp.init(r1, rgb, flow)
        lstm_vars = self.lstm.init(r2, jnp.zeros((batch, 2, cfg.at.feature_dim)))
        lf_vars = self.lf.init(r3, jnp.zeros((batch, h, w, 2)))
        return {"sp": sp_vars, "at": lstm_vars, "lf": lf_vars}

    def init_state(self, batch: int) -> StreamState:
        cfg = self.config
        center = jnp.array(
            [(cfg.image.width - 1) / 2.0, (cfg.image.height - 1) / 2.0],
            jnp.float32,
        )
        return StreamState(
            carries=self.lstm.init_carry(batch),
            w_hat=jnp.ones((batch, cfg.at.feature_dim), jnp.float32),
            prev_fix=jnp.zeros((batch,), jnp.float32),
            prev_gaze=jnp.broadcast_to(center, (batch, 2)),
        )

    # ------------------------------------------------------- preproc ----
    def preprocess_pair(
        self,
        prev_u8: jnp.ndarray,
        cur_u8: jnp.ndarray,
        flow_img: jnp.ndarray | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """uint8 frame pair -> (normalized rgb, normalized flow input).

        Resize happens *before* the TV-L1 solve so the flow grid matches
        the model grid (the reference computes flow at native res then
        resizes the flow JPEG; doing it at 224^2 is the deliberate
        TPU-side choice — 18x fewer solver FLOPs, same model statistics
        after quantization-equivalent clipping).

        flow_img: optional (B, h, w, 2) uint8 precomputed dense_flow
          JPEGs (strict-parity mode, ref:data/STdatas.py [M]). When given,
          the TV-L1 solve is skipped and the quantized flow is treated
          exactly as the reference treats it — as an *image*: bilinear
          resize to the model grid, then the temporal normalization
          (values are NOT rescaled by the resize ratio, because the
          reference resizes the JPEG as pixels, not as displacements)."""
        cfg = self.config
        cur = resize_frames(to_float(cur_u8), cfg.image.height, cfg.image.width)
        if flow_img is not None:
            q = resize_frames(
                to_float(flow_img), cfg.image.height, cfg.image.width
            )
            flow_in = normalize_flow_image(q)
            rgb_in = normalize_rgb(cur, cfg.image)
            return rgb_in.astype(self.dtype), flow_in.astype(self.dtype)
        prev = resize_frames(to_float(prev_u8), cfg.image.height, cfg.image.width)
        g0, g1 = rgb_to_gray(prev), rgb_to_gray(cur)
        if cfg.tvl1.flow_scale != 1.0:
            # Production preset: solve at a reduced grid, upsample the
            # field and rescale the displacements (see TVL1Config).
            s = cfg.tvl1.flow_scale
            fh = int(round(cfg.image.height * s))
            fw = int(round(cfg.image.width * s))
            from gaze_tpu.ops.image import resize_bilinear

            flow_lo = tvl1_flow(
                resize_bilinear(g0, (fh, fw)), resize_bilinear(g1, (fh, fw)), cfg.tvl1
            )
            flow = jax.image.resize(
                flow_lo, (flow_lo.shape[0], cfg.image.height, cfg.image.width, 2),
                method="bilinear",
            ) * (1.0 / s)
        else:
            flow = tvl1_flow(g0, g1, cfg.tvl1)
        flow = jax.lax.stop_gradient(flow)
        flow_in = prepare_temporal_input(flow, cfg.tvl1.quant_bound)
        rgb_in = normalize_rgb(cur, cfg.image)
        return rgb_in.astype(self.dtype), flow_in.astype(self.dtype)

    # ----------------------------------------------------- sp_forward ----
    def sp_forward(
        self, sp_variables: Dict[str, Any], rgb_in: jnp.ndarray, flow_in: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """SP forward respecting ``quant_sp``: (saliency, conv5 features).

        Single choke point for every SP consumer (the fused step, LF
        map extraction, goldens) so the int8 path cannot silently
        diverge between eval and extraction surfaces.
        """
        from gaze_tpu.models.sp import SPNet

        if self.quant_sp is not None:
            from gaze_tpu.models.quant import quant_vgg_forward

            feat = quant_vgg_forward(
                self.quant_sp.spatial, rgb_in, conv_impl=self.quant_conv)
            f_temporal = quant_vgg_forward(
                self.quant_sp.temporal, flow_in, conv_impl=self.quant_conv)
            if self.quant_sp.tail is not None:
                from gaze_tpu.models.quant_tail import quant_tail_forward

                sal = quant_tail_forward(self.quant_sp.tail, feat, f_temporal)
                return sal, feat
        elif self.decoder_impl != "deconv":
            feat, f_temporal = self.sp.apply(
                sp_variables, rgb_in, flow_in, method=SPNet.encode
            )
            feat = feat.astype(jnp.float32)
        else:
            return self.sp.apply(sp_variables, rgb_in, flow_in)
        if self.decoder_impl in ("pixelshuffle", "halfres"):
            from gaze_tpu.models import decode_fast

            fn = (decode_fast.fast_fuse_decode
                  if self.decoder_impl == "pixelshuffle"
                  else decode_fast.halfres_fuse_decode)
            sal = fn(
                sp_variables, self.config.sp,
                feat.astype(self.dtype), f_temporal.astype(self.dtype),
                dtype=self.dtype,
            )
        else:
            sal = self.sp.apply(
                sp_variables,
                feat.astype(self.dtype),
                f_temporal.astype(self.dtype),
                method=SPNet.fuse_decode,
            )
        return sal, feat

    # ---------------------------------------------------------- step ----
    def step(
        self,
        variables: Dict[str, Any],
        state: StreamState,
        prev_u8: jnp.ndarray,
        cur_u8: jnp.ndarray,
        fixation: jnp.ndarray,
        gaze_xy: jnp.ndarray | None = None,
        flow_img: jnp.ndarray | None = None,
    ) -> Tuple[StreamState, Dict[str, jnp.ndarray]]:
        """One fused per-frame step over B independent streams.

        Args:
          state: recurrent StreamState.
          prev_u8/cur_u8: (B, H, W, 3) uint8 frames.
          fixation: (B,) 1.0 where frame t is a fixation.
          gaze_xy: optional (B, 2) teacher gaze for feature pooling
            (training-time extraction); None -> pool at SP's argmax
            (self-sufficient inference).
          flow_img: optional (B, h, w, 2) uint8 precomputed flow image
            (strict-parity input path — see preprocess_pair).

        Returns:
          (new_state, outputs) with saliency/attention/final heatmaps and
          the decoded gaze point.
        """
        cfg = self.config
        rgb_in, flow_in = self.preprocess_pair(prev_u8, cur_u8, flow_img)
        sal, feat = self.sp_forward(variables["sp"], rgb_in, flow_in)

        if gaze_xy is not None:
            pool_pt = gaze_xy
        elif self.at_pool == "prediction":
            pool_pt = state.prev_gaze
        else:
            pool_pt = heatmap_argmax(sal)
        w = fixation_pool(feat, pool_pt, cfg.at)

        new_carries, w_pred = self.lstm.apply(
            variables["at"], state.carries, w, method=LSTMNet.step
        )
        # Gate the recurrent update on fixation ONSET (jit-safe masking):
        # the AT LSTM models transitions *between* fixations, so it steps
        # once when a new fixation begins, not on every frame of it.
        onset = fixation * (1.0 - state.prev_fix)
        m = onset.reshape(-1, 1)
        carries = jax.tree_util.tree_map(
            lambda new, old: jnp.where(m, new, old), new_carries, state.carries
        )
        w_hat = jnp.where(m, w_pred, state.w_hat)

        amap = attention_map(feat, w_hat, (cfg.image.height, cfg.image.width))
        fused_in = jnp.stack([sal, amap], axis=-1).astype(self.dtype)
        final = self.lf.apply(variables["lf"], fused_in)

        out = {
            "saliency": sal,
            "attention": amap,
            "heatmap": final,
            "gaze": heatmap_argmax(final),
        }
        new_state = StreamState(
            carries=carries, w_hat=w_hat, prev_fix=fixation,
            prev_gaze=out["gaze"].astype(jnp.float32),
        )
        return new_state, out


def quant_as_operand(pipeline: GazePipeline):
    """(template, qsp): split the quantized weights out of the pipeline
    so jit wrappers can pass them as RUNTIME OPERANDS instead of
    closure-captured constants.

    Why: a closed-over QuantSP inlines ~30 MB of int8 kernels into the
    lowered HLO as literals — every (re)compile uploads and processes
    them (slow through this environment's relay compile service, and
    the reason behind past HTTP-413 size limits; utils/profiling has
    the same note for f32 params). As operands they are device-resident
    buffers referenced by the executable: identical numerics (pinned in
    tests/test_quant_operand.py), much smaller programs, faster serving
    cold-start. ``dataclasses.replace(template, quant_sp=qsp)`` inside
    the traced function rebinds the (possibly traced) pytree.
    """
    return dataclasses.replace(pipeline, quant_sp=None), pipeline.quant_sp


def make_step_fn(pipeline: GazePipeline) -> Callable:
    """jit-compiled single-frame step.

    The stream state is deliberately NOT donated: StreamServer.tick
    reuses its pre-step ``self._state`` after the call (first-frame
    revert), so donation would hand XLA a buffer the host still reads.

    Quantized weights (``pipeline.quant_sp``) are passed as jit operands
    rather than baked into the program (see :func:`quant_as_operand`).
    """
    import functools

    if pipeline.quant_sp is None:

        @jax.jit
        def step_fn(variables, state, prev_u8, cur_u8, fixation):
            return pipeline.step(variables, state, prev_u8, cur_u8, fixation)

        return step_fn

    template, qsp = quant_as_operand(pipeline)

    @jax.jit
    def qstep_fn(qsp, variables, state, prev_u8, cur_u8, fixation):
        p = dataclasses.replace(template, quant_sp=qsp)
        return p.step(variables, state, prev_u8, cur_u8, fixation)

    return functools.partial(qstep_fn, qsp)


def make_clip_fn(pipeline: GazePipeline) -> Callable:
    """jit-compiled clip processor: (B, T+1, H, W, 3) frames ->
    (B, T, h, w) heatmaps, scanning the fused step over time.

    This is the multi-stream benchmark entry: B streams advance in
    lockstep, so every frame's 2xVGG16 + TV-L1 runs batched on the MXU
    while the LSTM recurrence stays a cheap (B, 512) matmul per step.

    Quantized weights ride as jit operands (:func:`quant_as_operand`),
    not program constants.
    """
    import functools

    template, qsp = quant_as_operand(pipeline)

    def clip_fn(qsp, variables, frames_u8, fixsac):
        p = (template if qsp is None
             else dataclasses.replace(template, quant_sp=qsp))
        B, Tp1 = frames_u8.shape[0], frames_u8.shape[1]
        state = p.init_state(B)

        def body(state, xs):
            prev, cur, fix = xs
            state, out = p.step(variables, state, prev, cur, fix)
            return state, (out["heatmap"], out["gaze"])

        xs = (
            jnp.swapaxes(frames_u8[:, :-1], 0, 1),
            jnp.swapaxes(frames_u8[:, 1:], 0, 1),
            jnp.swapaxes(fixsac[:, 1:], 0, 1),
        )
        _, (heatmaps, gaze) = jax.lax.scan(body, state, xs)
        return jnp.swapaxes(heatmaps, 0, 1), jnp.swapaxes(gaze, 0, 1)

    return functools.partial(jax.jit(clip_fn), qsp)
