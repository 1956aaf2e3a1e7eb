"""SP — two-stream saliency-prediction encoder-decoder.

TPU-native rebuild of ``ref:models/SP.py`` [M] (SURVEY.md §2 "SP model"):

- spatial stream: VGG16 over normalized RGB (B, 224, 224, 3);
- temporal stream: VGG16 over the normalized TV-L1 flow image
  (B, 224, 224, 2 by default — packing is [U], configurable);
- fusion at conv5_3: channel-concat (1024) -> 1x1 conv -> 512 [U fusion
  point, documented in SPConfig];
- decoder: mirrored ConvTranspose(stride 2) + BN + ReLU blocks,
  14x14 -> 224x224, then 1x1 conv -> 1 channel sigmoid saliency map.

Outputs both the saliency map and the *spatial-stream* conv5 features —
the AT module pools its 512-d channel-weight vectors from those
(SURVEY.md §2 "AT feature extraction" [M]).

Everything is NHWC; transposed convs lower to XLA convolutions with LHS
dilation, which the TPU backend maps onto the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gaze_tpu.core.config import SPConfig
from gaze_tpu.models.vgg import VGG16Features


class Decoder(nn.Module):
    """Upsampling decoder: len(channels) ConvTranspose x2 blocks."""

    cfg: SPConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.cfg.decoder_channels):
            x = nn.ConvTranspose(
                ch,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"deconv{i + 1}",
            )(x)
            if self.cfg.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"bn{i + 1}",
                )(x)
            x = nn.relu(x)
        x = nn.Conv(
            1,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out_conv",
        )(x)
        return x  # logits, (B, H, W, 1)


class SPNet(nn.Module):
    """Two-stream SP network. Returns (saliency (B,H,W), conv5 (B,h,w,512)).

    setup-style submodules (attribute names == param scopes, so the
    checkpoint tree is identical to the original compact layout): the
    ``fuse_decode`` tail is independently applyable, which is how the
    int8-quantized serving path (models/quant.py) splices its encoder
    outputs into the unquantized fusion/decoder head.
    """

    cfg: SPConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.cfg.remat not in ("none", "encoders", "full"):
            raise ValueError(f"unknown remat mode {self.cfg.remat!r}")
        # jax.checkpoint via nn.remat: under a grad, the stream (and with
        # "full" the decoder) activations are NOT stored — backward
        # recomputes the wrapped module's forward. Scopes/param trees are
        # unchanged, so checkpoints stay interchangeable across modes;
        # pure inference is untouched (no residual backward to feed).
        vgg_cls = VGG16Features if self.cfg.remat == "none" else nn.remat(
            VGG16Features
        )
        dec_cls = Decoder if self.cfg.remat != "full" else nn.remat(
            Decoder, static_argnums=(2,)
        )
        self.spatial = vgg_cls(stages=self.cfg.stages, **kw)
        self.temporal = vgg_cls(stages=self.cfg.stages, **kw)
        self.fuse_conv = nn.Conv(self.cfg.fused_channels, kernel_size=(1, 1), **kw)
        self.decoder = dec_cls(self.cfg, **kw)

    def __call__(
        self, rgb: jnp.ndarray, flow: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f_spatial, f_temporal = self.encode(rgb, flow)
        sal = self.fuse_decode(f_spatial, f_temporal, train=train)
        return sal, f_spatial.astype(jnp.float32)

    def encode(
        self, rgb: jnp.ndarray, flow: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Both streams' conv5 features — public so serving paths that
        replace the tail (models/decode_fast.py polyphase decoder) can
        run the unquantized encoders via
        ``sp.apply(vars, rgb, flow, method=SPNet.encode)``."""
        return self.spatial(rgb), self.temporal(flow)

    def fuse_decode(
        self, f_spatial: jnp.ndarray, f_temporal: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """conv5 features (both streams) -> saliency map. Public so the
        quantized encoders can reuse the exact trained tail via
        ``sp.apply(vars, fs, ft, method=SPNet.fuse_decode)``."""
        fused = jnp.concatenate([f_spatial, f_temporal], axis=-1)
        fused = nn.relu(self.fuse_conv(fused))
        # positional ``train``: under remat="full" it is a
        # static_argnums entry, which jax.checkpoint only honors for
        # positional arguments.
        logits = self.decoder(fused, train)
        return nn.sigmoid(logits.astype(jnp.float32))[..., 0]
