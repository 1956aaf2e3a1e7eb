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
            name="out_conv",
        )(pad(x) if edge else x)
        return nn.sigmoid(x.astype(jnp.float32))[..., 0]
