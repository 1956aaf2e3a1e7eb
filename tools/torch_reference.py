"""Torch-twin of the full §3.4 sequential inference loop.

An INDEPENDENT torch/numpy re-implementation of the reference's
``LF.val()`` semantics (SURVEY.md §3.4: per-frame SP forward, fixation
pooling at the SP argmax, onset-gated LSTM, attention-map min-max +
bilinear upsample, LF fusion, argmax decode, AAE/AUC) consuming the
``--export_torch`` weight bundle — written with torch-native conventions
(NCHW, ``F.conv2d``/``F.conv_transpose2d``/``F.interpolate``) exactly as
the PyTorch reference would compute them.

Purpose: the strongest offline stand-in for BASELINE.json's
"bit-comparable gaze heatmaps". The reference itself is not runnable in
this environment (SURVEY.md §0 — empty mount, no GTEA data), so the
parity claim is engineered as a twin: if this torch rollout and the JAX
pipeline (evaluation/rollout.py) produce the same per-frame heatmaps,
gaze tracks and AAE/AUC from the same exported weights, then every
convention the heatmaps depend on — normalization constants, deconv tap
flipping, BN eps, LSTM gate packing, min-max-then-resize order,
onset gating, argmax tie order — agrees between the frameworks.
tests/test_torch_twin.py pins the agreement frame-by-frame AND proves
the harness has teeth: flipping any single convention (resize
align-corners, BN eps, LSTM gate order, deconv tap flip) breaks it.

The twin consumes PRECOMPUTED flow images (the reference's actual data
path: dense_flow JPEGs, ref:data/STdatas.py [M]); the TV-L1 solver has
its own CPU-equivalence tests (tests/test_ops.py) and is out of scope
here by design — both sides of the comparison eat identical flow bytes.

Torch-only module: imports ``gaze_tpu.core.config`` (pure dataclasses)
but never jax, so it runs wherever the reference would.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import torch
import torch.nn.functional as F

from gaze_tpu.core.config import CameraConfig, PipelineConfig
from gaze_tpu.models.vgg import VGG16_STAGES

_GATES = "ifgo"  # torch + flax OptimizedLSTMCell row packing order


def _t(x) -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x.float()
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return _t(np.transpose(np.asarray(x_nhwc, np.float32), (0, 3, 1, 2)))


def _permute_gate_rows(w: torch.Tensor, order: str) -> torch.Tensor:
    """Reinterpret the 4 stacked gate-row blocks of an LSTM weight/bias
    under a different assumed packing order ("ifgo" = identity)."""
    blocks = torch.chunk(w, 4, dim=0)
    by_name = dict(zip(_GATES, blocks))
    return torch.cat([by_name[g] for g in order], dim=0)


@dataclasses.dataclass
class TwinKnobs:
    """Convention knobs. Defaults = the conventions the export encodes;
    each flip is a deliberate wrong-convention mode for the negative
    tests (a twin that cannot fail proves nothing)."""

    align_corners: bool = False     # attention-map upsample convention
    bn_eps: float = 1e-5            # decoder BatchNorm epsilon
    gate_order: str = "ifgo"        # assumed LSTM gate-row packing
    deconv_flip_taps: bool = True   # exporter pre-flips ConvTranspose taps


class TorchReferenceTwin:
    """Sequential full-pipeline gaze inference in torch, from an
    ``export_pipeline_to_torch`` bundle.

    State dict keys per models/weights_export.py; per-frame semantics
    per models/pipeline.py ``GazePipeline.step`` (at_pool="sp_argmax",
    flow-image input mode, LF zero padding — the parity path).
    """

    def __init__(
        self,
        bundle: Dict[str, Dict[str, Any]],
        config: PipelineConfig,
        knobs: Optional[TwinKnobs] = None,
    ):
        if config.lf.padding != "zero":
            raise NotImplementedError(
                "twin implements the parity LF padding ('zero') only"
            )
        self.cfg = config
        self.knobs = knobs or TwinKnobs()
        self.sp = {k: _t(v) for k, v in bundle["sp"].items()}
        self.lf = {k: _t(v) for k, v in bundle["lf"].items()}
        at = {k: _t(v) for k, v in bundle["at"].items()}
        if not self.knobs.deconv_flip_taps:
            # wrong-convention mode: undo the exporter's tap flip
            self.sp = {
                k: (v.flip(-1).flip(-2) if ".deconv" in k and k.endswith("weight")
                    else v)
                for k, v in self.sp.items()
            }
        g = self.knobs.gate_order
        self.at = {
            k: (_permute_gate_rows(v, g) if k.startswith(("weight_", "bias_"))
                else v)
            for k, v in at.items()
        }
        self.num_layers = 0
        while f"weight_ih_l{self.num_layers}" in self.at:
            self.num_layers += 1

    # ---------------------------------------------------- preprocessing ----
    def preprocess(
        self, cur_u8: np.ndarray, flow_u8: np.ndarray
    ) -> Tuple[torch.Tensor, torch.Tensor]:
        """uint8 (B,H,W,3) frame + (B,h,w,2) flow image -> normalized
        NCHW inputs (ops/preprocess.py conventions: /255, ImageNet
        mean/std; flow centered at 0.5 and scaled by 1/0.226)."""
        cfg = self.cfg.image
        rgb = _nchw(cur_u8) / 255.0
        rgb = self._resize(rgb, (cfg.height, cfg.width))
        mean = _t(np.asarray(cfg.mean)).view(1, 3, 1, 1)
        std = _t(np.asarray(cfg.std)).view(1, 3, 1, 1)
        rgb_in = (rgb - mean) / std
        q = _nchw(flow_u8) / 255.0
        q = self._resize(q, (cfg.height, cfg.width))
        flow_in = (q - 0.5) / 0.226
        return rgb_in, flow_in

    def _resize(self, x: torch.Tensor, hw: Tuple[int, int]) -> torch.Tensor:
        if tuple(x.shape[-2:]) == hw:
            return x
        return F.interpolate(
            x, size=hw, mode="bilinear",
            align_corners=self.knobs.align_corners,
        )

    # -------------------------------------------------------- SP forward ----
    def _vgg(self, prefix: str, x: torch.Tensor) -> torch.Tensor:
        sd = self.sp
        for si, stage in enumerate(VGG16_STAGES):
            for ci in range(len(stage)):
                k = f"{prefix}.conv{si + 1}_{ci + 1}"
                x = F.relu(F.conv2d(x, sd[f"{k}.weight"], sd[f"{k}.bias"],
                                    padding=1))
            if si < len(VGG16_STAGES) - 1:
                x = F.max_pool2d(x, 2, 2)
        return x

    def sp_forward(
        self, rgb_in: torch.Tensor, flow_in: torch.Tensor
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(saliency (B,H,W), spatial conv5 (B,h,w,C) NHWC) as numpy."""
        sd = self.sp
        fs = self._vgg("spatial", rgb_in)
        ft = self._vgg("temporal", flow_in)
        x = torch.cat([fs, ft], dim=1)
        x = F.relu(F.conv2d(x, sd["fuse_conv.weight"], sd["fuse_conv.bias"]))
        n = len(self.cfg.sp.decoder_channels)
        for i in range(1, n + 1):
            x = F.conv_transpose2d(
                x, sd[f"decoder.deconv{i}.weight"], sd[f"decoder.deconv{i}.bias"],
                stride=2, padding=1,
            )
            if self.cfg.sp.use_batchnorm:
                x = F.batch_norm(
                    x,
                    sd[f"decoder.bn{i}.running_mean"],
                    sd[f"decoder.bn{i}.running_var"],
                    sd[f"decoder.bn{i}.weight"],
                    sd[f"decoder.bn{i}.bias"],
                    training=False, eps=self.knobs.bn_eps,
                )
            x = F.relu(x)
        x = F.conv2d(x, sd["decoder.out_conv.weight"], sd["decoder.out_conv.bias"])
        sal = torch.sigmoid(x)[:, 0].numpy()
        feat = fs.numpy().transpose(0, 2, 3, 1)
        return sal, feat

    # --------------------------------------------------------- AT module ----
    def fixation_pool(self, feat: np.ndarray, points: np.ndarray) -> np.ndarray:
        """models/at.py fixation_pool: clamped ROI mean on the conv5 grid
        (round-half-even pixel->cell mapping, like jnp.round)."""
        at = self.cfg.at
        B, h, w, C = feat.shape
        r = min(at.roi_size, h, w)
        fx = np.clip(
            np.round(points[:, 0] / at.feature_stride).astype(np.int64) - r // 2,
            0, w - r,
        )
        fy = np.clip(
            np.round(points[:, 1] / at.feature_stride).astype(np.int64) - r // 2,
            0, h - r,
        )
        out = np.empty((B, C), np.float32)
        for b in range(B):
            out[b] = feat[b, fy[b]: fy[b] + r, fx[b]: fx[b] + r].mean(axis=(0, 1))
        return out

    def lstm_step(
        self, h: List[torch.Tensor], c: List[torch.Tensor], x: torch.Tensor
    ) -> Tuple[List[torch.Tensor], List[torch.Tensor], torch.Tensor]:
        """One multi-layer LSTM step + ReLU Dense head (torch gate math:
        rows packed i,f,g,o; sigmoid/sigmoid/tanh/sigmoid)."""
        sd = self.at
        new_h, new_c = [], []
        inp = x
        for k in range(self.num_layers):
            gates = (
                inp @ sd[f"weight_ih_l{k}"].T + sd[f"bias_ih_l{k}"]
                + h[k] @ sd[f"weight_hh_l{k}"].T + sd[f"bias_hh_l{k}"]
            )
            gi, gf, gg, go = torch.chunk(gates, 4, dim=-1)
            i, f, o = torch.sigmoid(gi), torch.sigmoid(gf), torch.sigmoid(go)
            g = torch.tanh(gg)
            ck = f * c[k] + i * g
            hk = o * torch.tanh(ck)
            new_h.append(hk)
            new_c.append(ck)
            inp = hk
        pred = F.relu(inp @ sd["head.weight"].T + sd["head.bias"])
        return new_h, new_c, pred

    def attention_map(self, feat: np.ndarray, w_hat: np.ndarray) -> np.ndarray:
        """Channel-reweight + min-max normalize (on the conv5 grid,
        BEFORE upsampling) + bilinear upsample — models/at.py
        attention_map order."""
        cfg = self.cfg.image
        amap = np.einsum("bhwc,bc->bhw", feat, w_hat).astype(np.float32)
        mn = amap.min(axis=(1, 2), keepdims=True)
        mx = amap.max(axis=(1, 2), keepdims=True)
        amap = (amap - mn) / (mx - mn + 1e-8)
        up = self._resize(_t(amap)[:, None], (cfg.height, cfg.width))[:, 0]
        return up.numpy()

    # --------------------------------------------------------- LF module ----
    def lf_forward(self, sal: np.ndarray, amap: np.ndarray) -> np.ndarray:
        sd = self.lf
        x = _t(np.stack([sal, amap], axis=1))  # (B, 2, H, W)
        for i in range(1, len(self.cfg.lf.channels) + 1):
            x = F.relu(F.conv2d(x, sd[f"conv{i}.weight"], sd[f"conv{i}.bias"],
                                padding=1))
        x = F.conv2d(x, sd["out_conv.weight"], sd["out_conv.bias"], padding=1)
        logits = x[:, 0]
        if self.cfg.lf.residual:
            # Residual fusion (models/lf.py LFConfig.residual): the stack
            # is a logit-space correction to the saliency channel, same
            # clip constant as the JAX side.
            s = torch.clamp(_t(sal), 1e-6, 1 - 1e-6)
            logits = logits + torch.log(s) - torch.log1p(-s)
        return torch.sigmoid(logits).numpy()

    # ----------------------------------------------------------- rollout ----
    def init_state(self, batch: int) -> Dict[str, Any]:
        H = self.at["weight_hh_l0"].shape[1]
        z = [torch.zeros((batch, H)) for _ in range(self.num_layers)]
        return {
            "h": z,
            "c": [torch.zeros((batch, H)) for _ in range(self.num_layers)],
            "w_hat": np.ones((batch, self.cfg.at.feature_dim), np.float32),
            "prev_fix": np.zeros((batch,), np.float32),
        }

    def step(
        self,
        state: Dict[str, Any],
        cur_u8: np.ndarray,
        flow_u8: np.ndarray,
        fixation: np.ndarray,
    ) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
        """One fused frame step — GazePipeline.step semantics: pool at the
        SP argmax, advance the LSTM only on fixation ONSETS
        (fix * (1 - prev_fix)), reuse the held w_hat otherwise."""
        with torch.no_grad():
            rgb_in, flow_in = self.preprocess(cur_u8, flow_u8)
            sal, feat = self.sp_forward(rgb_in, flow_in)
            pool_pt = heatmap_argmax_np(sal)
            w = self.fixation_pool(feat, pool_pt)
            new_h, new_c, w_pred = self.lstm_step(
                state["h"], state["c"], _t(w)
            )
            onset = fixation * (1.0 - state["prev_fix"])
            m = torch.from_numpy(onset.astype(np.float32)).view(-1, 1)
            h = [torch.where(m > 0, nh, oh) for nh, oh in zip(new_h, state["h"])]
            c = [torch.where(m > 0, nc, oc) for nc, oc in zip(new_c, state["c"])]
            w_hat = np.where(
                onset[:, None] > 0, w_pred.numpy(), state["w_hat"]
            ).astype(np.float32)
            amap = self.attention_map(feat, w_hat)
            final = self.lf_forward(sal, amap)
        out = {
            "saliency": sal,
            "attention": amap,
            "heatmap": final,
            "gaze": heatmap_argmax_np(final),
        }
        new_state = {
            "h": h, "c": c, "w_hat": w_hat,
            "prev_fix": np.asarray(fixation, np.float32),
        }
        return new_state, out

    def rollout(
        self,
        frames: np.ndarray,
        flow_imgs: np.ndarray,
        fixsac: np.ndarray,
    ) -> List[Dict[str, np.ndarray]]:
        """Sequential rollout over (B, T, H, W, 3) uint8 frames with
        (B, T, h, w, 2) uint8 flow images; frame 0 only seeds the pair
        (no step — matching evaluation/rollout.py's scoring-from-1).
        Returns T-1 per-frame output dicts (steps t = 1..T-1, where step
        t consumes frame t and flow_imgs[:, t])."""
        B, T = frames.shape[:2]
        state = self.init_state(B)
        outs = []
        for t in range(1, T):
            state, out = self.step(
                state, frames[:, t], flow_imgs[:, t], fixsac[:, t]
            )
            outs.append(out)
        return outs


# ----------------------------------------------------- int8 quant twin ----
class TorchQuantVGGTwin:
    """Independent torch/numpy re-implementation of the int8-resident
    VGG stream (models/quant.py ``quant_vgg_forward`` — the math under
    bench.py's turbo headline).

    The JAX side runs s8×s8→s32 convolutions on the MXU with a fused
    f32 multiply-add-round-clip epilogue. This twin reproduces those
    semantics with DIFFERENT machinery so a shared bug cannot hide:

    - integer convolutions run as ``F.conv2d`` in float64 (a 3×3×512
      int8 accumulation is ≤ ~7.5e7, exact in float64's 53-bit
      mantissa — bit-equal to the MXU's int32 accumulator);
    - the epilogue replays the exact JAX dtype discipline in numpy
      float32: accumulator cast s32→f32 (RNE — NOT exact above 2^24,
      faithfully reproduced), folded scale ``a = sx*w_scale/sn`` and
      offset ``c = (b/sn - 128) + 128*col_sum*a`` as single-rounded f32
      ops, then round-half-even → clip → int8;
    - the asymmetric interior grid pads with the stored real-zero code
      -128 and convolves VALID, like the JAX chain;
    - the optional bf16 stem casts input/kernel through torch.bfloat16
      (RNE) and accumulates in float64 — the MXU accumulates the same
      exact products in float32, so stem sums can differ by f32
      rounding; downstream requant absorbs it to ≤1 LSB.

    Residual tolerance vs JAX is therefore ≤1 requant code wherever a
    rounding boundary is hit (XLA may contract the epilogue's mul+add
    into an FMA; the grouped-streams probe measured the same 1-LSB
    band) — tests/test_torch_twin.py pins that band and proves the twin
    has teeth (zero-pad-code or dropped zero-point-bias modes break it).

    Bundle: plain numpy dict (no jax import) —
      {"kernels": {layer: int8 HWIO}, "w_scales"/"biases"/"col_sums":
       {layer: f32 (O,)}, "act_scales": {layer: f32 ()},
       "stem_kernel": f32 HWIO of the bf16 values or None,
       "stem_bias": f32 (O,) or None}
    """

    _ZP = 128

    def __init__(
        self,
        bundle: Dict[str, Any],
        pad_code: Optional[int] = None,
        apply_zp_bias: bool = True,
    ):
        self.b = bundle
        self.layers = tuple(
            f"conv{s + 1}_{i + 1}"
            for s, stage in enumerate(VGG16_STAGES)
            for i in range(len(stage))
        )
        # wrong-convention knobs for the negative tests
        self.pad_code = -self._ZP if pad_code is None else pad_code
        self.apply_zp_bias = apply_zp_bias

    def _conv_int(self, codes: np.ndarray, name: str, zp: int) -> np.ndarray:
        """Exact integer 3×3 SAME conv on stored int8 codes (NHWC in,
        NHWC accumulator out), via float64 torch conv."""
        k = torch.from_numpy(
            self.b["kernels"][name].astype(np.float64).transpose(3, 2, 0, 1)
        )
        x = torch.from_numpy(
            np.ascontiguousarray(codes.astype(np.float64).transpose(0, 3, 1, 2))
        )
        if zp:
            x = F.pad(x, (1, 1, 1, 1), value=float(self.pad_code))
            acc = F.conv2d(x, k)
        else:
            acc = F.conv2d(x, k, padding=1)
        return acc.numpy().transpose(0, 2, 3, 1)

    def forward(self, x_nhwc_f32: np.ndarray) -> np.ndarray:
        """f32 normalized NHWC input → f32 NHWC conv5 features."""
        b = self.b
        x = np.asarray(x_nhwc_f32, np.float32)
        li = 0
        zp = 0
        xq = acc = None
        if b.get("stem_kernel") is None:
            sx0 = np.float32(b["act_scales"][self.layers[0]])
            xq = np.clip(np.round(x / sx0), -127, 127).astype(np.int64)
        for s, stage in enumerate(VGG16_STAGES):
            for _ in stage:
                name = self.layers[li]
                li += 1
                if li == 1 and b.get("stem_kernel") is not None:
                    # bf16 stem: round operands through bfloat16 (RNE),
                    # accumulate exactly in float64.
                    xb = torch.from_numpy(
                        np.ascontiguousarray(x.transpose(0, 3, 1, 2))
                    ).to(torch.bfloat16).double()
                    kb = torch.from_numpy(
                        b["stem_kernel"].astype(np.float64).transpose(3, 2, 0, 1)
                    )
                    acc = F.conv2d(xb, kb, padding=1).numpy().transpose(
                        0, 2, 3, 1
                    ).astype(np.float32)
                    sn = np.float32(b["act_scales"][self.layers[1]])
                    cst = b["stem_bias"].astype(np.float32) / sn - np.float32(
                        self._ZP
                    )
                    xq = np.clip(
                        np.round(acc / sn + cst), -128, 127
                    ).astype(np.int64)
                    zp = self._ZP
                    continue
                sx = np.float32(b["act_scales"][name])
                acc = self._conv_int(xq, name, zp).astype(np.float32)
                zp_bias = (
                    np.float32(zp) * b["col_sums"][name].astype(np.float32)
                    if (zp and self.apply_zp_bias)
                    else np.float32(0.0)
                )
                if li < len(self.layers):
                    sn = np.float32(b["act_scales"][self.layers[li]])
                    a = (sx * b["w_scales"][name].astype(np.float32)) / sn
                    c = (
                        b["biases"][name].astype(np.float32) / sn
                        - np.float32(self._ZP)
                    ) + zp_bias * a
                    xq = np.clip(np.round(acc * a + c), -128, 127).astype(
                        np.int64
                    )
                    zp = self._ZP
                else:  # conv5_3 dequantizes for the f32/bf16 consumers
                    sw = sx * b["w_scales"][name].astype(np.float32)
                    xf = (acc + zp_bias) * sw
                    xf = np.maximum(
                        xf + b["biases"][name].astype(np.float32), 0.0
                    )
            if s < len(VGG16_STAGES) - 1:
                t = torch.from_numpy(
                    xq.astype(np.float32).transpose(0, 3, 1, 2)
                )
                xq = (
                    F.max_pool2d(t, 2, 2).numpy()
                    .transpose(0, 2, 3, 1).astype(np.int64)
                )
        return xf


# ------------------------------------------------------- numpy metrics ----
def heatmap_argmax_np(hm: np.ndarray) -> np.ndarray:
    """(B, H, W) -> (B, 2) (x, y) of the max — first-max tie order, like
    ops/heatmap.heatmap_argmax (row-major flattened argmax)."""
    B, H, W = hm.shape
    idx = hm.reshape(B, H * W).argmax(axis=1)
    return np.stack([(idx % W), (idx // W)], axis=1).astype(np.float32)


def pixel_to_ray_np(
    points: np.ndarray, grid_hw: Tuple[int, int], cam: CameraConfig
) -> np.ndarray:
    gh, gw = grid_hw
    sx = cam.native_width / gw
    sy = cam.native_height / gh
    f = (cam.native_width / 2.0) / np.tan(np.deg2rad(cam.fov_x_deg) / 2.0)
    x = points[:, 0] * sx - cam.native_width / 2.0
    y = points[:, 1] * sy - cam.native_height / 2.0
    rays = np.stack([x, y, np.full_like(x, f)], axis=1)
    return rays / np.linalg.norm(rays, axis=1, keepdims=True)


def aae_np(
    pred_hm: np.ndarray, gt_points: np.ndarray, cam: CameraConfig
) -> np.ndarray:
    """Chord-stable angular error in degrees (evaluation/metrics.aae)."""
    H, W = pred_hm.shape[1:3]
    r_pred = pixel_to_ray_np(heatmap_argmax_np(pred_hm), (H, W), cam)
    r_gt = pixel_to_ray_np(np.asarray(gt_points, np.float64), (H, W), cam)
    chord = np.linalg.norm(r_pred - r_gt, axis=1)
    return np.rad2deg(2.0 * np.arcsin(np.clip(chord * 0.5, 0.0, 1.0)))


def auc_judd_np(pred_hm: np.ndarray, gt_points: np.ndarray) -> np.ndarray:
    """Closed-form Judd AUC vs a single GT pixel (evaluation/metrics)."""
    B, H, W = pred_hm.shape
    xi = np.clip(np.round(gt_points[:, 0]).astype(np.int64), 0, W - 1)
    yi = np.clip(np.round(gt_points[:, 1]).astype(np.int64), 0, H - 1)
    flat = pred_hm.reshape(B, H * W)
    gt_val = flat[np.arange(B), yi * W + xi][:, None]
    below = (flat < gt_val).sum(axis=1).astype(np.float64)
    ties = (flat == gt_val).sum(axis=1).astype(np.float64)
    return (below + 0.5 * ties) / float(H * W)


def load_bundle(path: str) -> Dict[str, Dict[str, torch.Tensor]]:
    return torch.load(path, weights_only=False)


def main() -> None:
    """CLI: roll the twin out over a fixed-seed synthetic video and print
    per-frame gaze + aggregate AAE/AUC — run it against the JAX side's
    ``--eval`` on the same weights to eyeball parity by hand (the test
    suite pins it automatically, tests/test_torch_twin.py)."""
    import argparse
    import json

    from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
    from gaze_tpu.evaluation.goldens import golden_tiny_parity_config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export", required=True,
                   help="--export_torch bundle path")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    if args.size == 32:
        cfg = golden_tiny_parity_config()
    else:
        # Honor the requested resolution (GT sigma scales with it) so the
        # hand-run comparison matches a JAX side configured the same way.
        import dataclasses

        from gaze_tpu.core.config import ImageConfig, parity_config

        cfg = parity_config()
        if args.size != cfg.image.height:
            cfg = dataclasses.replace(
                cfg,
                image=ImageConfig(
                    height=args.size,
                    width=args.size,
                    heatmap_sigma=cfg.image.heatmap_sigma
                    * args.size / cfg.image.height,
                ),
            )
    twin = TorchReferenceTwin(load_bundle(args.export), cfg)
    frames, gaze, fixsac = generate_sequence(
        SyntheticSpec(num_frames=args.frames, height=cfg.image.height,
                      width=cfg.image.width, seed=args.seed)
    )
    rng = np.random.default_rng(args.seed)
    flow = rng.integers(0, 256, frames.shape[:3] + (2,), np.uint8)
    outs = twin.rollout(frames[None], flow[None], fixsac[None])
    hms = np.concatenate([o["heatmap"] for o in outs])
    gts = gaze[1:]
    print(json.dumps({
        "frames_scored": len(outs),
        "gaze_track": [list(map(float, o["gaze"][0])) for o in outs],
        "AAE_deg": float(aae_np(hms, gts, cfg.camera).mean()),
        "AUC": float(auc_judd_np(hms, gts).mean()),
    }))


if __name__ == "__main__":
    main()
