"""VGG16 convolutional backbone (flax.linen, NHWC).

TPU-native equivalent of the torchvision VGG16 feature stack the
reference's SP encoders use (ref:models/SP.py [M]). Runs through
conv5_3 + ReLU, applying only the first four max-pools, so a 224x224
input yields 14x14x512 conv5 features — the tensor the AT module pools
(SURVEY.md §1 pipeline diagram [C]).

NHWC + bf16-capable: channels-last is the layout XLA tiles best onto the
MXU; ``dtype`` selects the activation/compute precision while parameters
stay float32 (``param_dtype``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (channels per conv in each stage); a max-pool follows every stage
# except the last (pool5 is omitted — the decoder starts from conv5_3).
VGG16_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)


class VGG16Features(nn.Module):
    """VGG16 conv stack through conv5_3; returns (B, H/16, W/16, 512).

    ``stages`` overrides the channel widths (layout must stay 2,2,3,3,3
    so layer names — and every name-keyed consumer — are unchanged);
    see SPConfig.stages.
    """

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    stages: Tuple[Tuple[int, ...], ...] = VGG16_STAGES

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for stage_idx, stage in enumerate(self.stages):
            for conv_idx, ch in enumerate(stage):
                x = nn.Conv(
                    ch,
                    kernel_size=(3, 3),
                    padding=1,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv{stage_idx + 1}_{conv_idx + 1}",
                )(x)
                x = nn.relu(x)
            if stage_idx < len(self.stages) - 1:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x
