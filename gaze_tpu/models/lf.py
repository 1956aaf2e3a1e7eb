"""LF — late-fusion conv head.

TPU-native rebuild of ``ref:models/late_fusion.py`` [M]: the SP saliency
map and the AT attention map are stacked as a 2-channel image and fused
by a small 3x3 conv stack into the final 1-channel sigmoid gaze heatmap.
Exact upstream depth/width is [U] (SURVEY.md §2 "LF model"); the stack is
configurable via LFConfig.channels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from gaze_tpu.core.config import LFConfig


class LateFusion(nn.Module):
    """(B, H, W, 2) -> (B, H, W) final gaze heatmap."""

    cfg: LFConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, maps: jnp.ndarray) -> jnp.ndarray:
        # "edge" replicate-pads the input of each conv and runs VALID, so
        # border outputs extrapolate the map instead of seeing fabricated
        # zeros (LFConfig.padding rationale; parameter shapes identical
        # either way — checkpoints are interchangeable, behavior is not).
        edge = self.cfg.padding == "edge"
        if not edge and self.cfg.padding != "zero":
            raise ValueError(f"unknown LF padding {self.cfg.padding!r}")

        def pad(x):
            return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

        x = maps
        for i, ch in enumerate(self.cfg.channels):
            x = nn.Conv(
                ch,
                kernel_size=(3, 3),
                padding=0 if edge else 1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i + 1}",
            )(pad(x) if edge else x)
            x = nn.relu(x)
        x = nn.Conv(
            1,
            kernel_size=(3, 3),
            padding=0 if edge else 1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            # Residual mode zero-inits the kernel so the whole stack's
            # initial contribution is exactly zero (LFConfig.residual).
            kernel_init=(nn.initializers.zeros if self.cfg.residual
                         else nn.linear.default_kernel_init),
            name="out_conv",
        )(pad(x) if edge else x)
        logits = x.astype(jnp.float32)[..., 0]
        if self.cfg.residual:
            # The stack predicts a logit-space correction to the SP
            # saliency channel; at init (zero out_conv) the head IS the
            # saliency map (up to the numerical clip), so training
            # starts from the stronger single-head baseline instead of
            # re-learning it from random init.
            sal = jnp.clip(maps[..., 0].astype(jnp.float32), 1e-6, 1 - 1e-6)
            logits = logits + jnp.log(sal) - jnp.log1p(-sal)
        return nn.sigmoid(logits)
