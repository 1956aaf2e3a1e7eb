"""AT — attention-transition module (fixation pooling + LSTM).

TPU-native rebuild of ``ref:models/LSTMnet.py`` + the feature-extraction
logic in ``ref:AT.py`` (SURVEY.md §2 "AT feature extraction", "AT model"
[M]):

- ``fixation_pool``: average-pool the conv5 feature map over a fixed-size
  ROI centered on the gaze point -> 512-d channel-weight vector ``w``.
  The crop is a clamped ``dynamic_slice`` (static ROI shape — no
  data-dependent shapes under jit; SURVEY.md §7 hard part #2).
- ``LSTMNet``: LSTM over the per-fixation weight sequence, trained to
  regress the *next* fixation's weight vector (MSE [U loss]); a ReLU
  Dense head keeps predicted weights nonnegative (conv5 is post-ReLU).
- ``attention_map``: channel-reweight conv5 by the predicted ``w_hat``,
  sum over channels -> 14x14 anticipated attention map; min-max
  normalize; bilinear-upsample to input resolution.

The sequential recurrence runs under ``jax.lax.scan`` (one fused cell,
compiled once); throughput scales by batching videos, not by
parallelizing the inherently-sequential time axis (SURVEY.md §5
long-context note).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaze_tpu.core.config import ATConfig


def fixation_pool(
    features: jnp.ndarray, points: jnp.ndarray, cfg: ATConfig
) -> jnp.ndarray:
    """Pool conv5 features around gaze points.

    Args:
      features: (B, h, w, C) conv5 feature maps (h=w=14 at 224 input).
      points: (B, 2) gaze (x, y) in *input-pixel* coordinates.
      cfg: AT config (roi_size, feature_stride).

    Returns:
      (B, C) channel-weight vectors.
    """
    B, h, w, C = features.shape
    # Clamp the ROI to the feature grid (tiny test inputs give conv5
    # grids smaller than the default 3x3 ROI).
    r = min(cfg.roi_size, h, w)
    # Map pixel coords -> feature cells; clamp so the ROI stays in-bounds.
    fx = jnp.clip(
        jnp.round(points[:, 0] / cfg.feature_stride).astype(jnp.int32) - r // 2, 0, w - r
    )
    fy = jnp.clip(
        jnp.round(points[:, 1] / cfg.feature_stride).astype(jnp.int32) - r // 2, 0, h - r
    )

    def pool_one(feat, x0, y0):
        roi = jax.lax.dynamic_slice(feat, (y0, x0, 0), (r, r, C))
        return jnp.mean(roi, axis=(0, 1))

    return jax.vmap(pool_one)(features, fx, fy)


class LSTMNet(nn.Module):
    """LSTM over channel-weight sequences; predicts the next weight vector.

    ``__call__`` consumes a whole (B, T, D) sequence via ``nn.scan``;
    ``init_carry``/``step`` expose the single-step interface the streaming
    inference pipeline uses (fixsac-gated state updates).
    """

    cfg: ATConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _head(self):
        return nn.Dense(
            self.cfg.feature_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )

    @nn.compact
    def __call__(self, ws: jnp.ndarray) -> jnp.ndarray:
        """(B, T, D) -> (B, T, D) predicted next-step weight vectors.

        The whole sequence runs through ``nn.scan``-wrapped LSTM cells —
        one compiled fused cell stepped T times by ``lax.scan``. Cell
        parameter scopes (``lstm{i}``) are shared with :meth:`step` and
        :meth:`rollout`, so every path uses the exact same weights.
        """
        _, out = self._rollout(self.init_carry(ws.shape[0]), ws)
        return out

    @nn.compact
    def rollout(self, carries, ws: jnp.ndarray):
        """Sequence rollout from an EXPLICIT initial carry.

        (carries, (B, T, D)) -> (new_carries, (B, T, D) predictions).
        This is the TBPTT entry: window k of a video resumes from window
        k-1's final carry instead of zeros, so fixation n always
        conditions on fixation n-1 even across window boundaries
        (train/at.py stateful windowing).
        """
        return self._rollout(carries, ws)

    def _rollout(self, carries, ws: jnp.ndarray):
        ScanCell = nn.scan(
            nn.OptimizedLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        h = ws
        new_carries = []
        for i in range(self.cfg.num_layers):
            cell = ScanCell(
                self.cfg.hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"lstm{i}",
            )
            carry, h = cell(carries[i], h)
            new_carries.append(carry)
        return new_carries, nn.relu(self._head()(h))

    def init_carry(self, batch: int):
        """Zero LSTM state for streaming inference (list over layers).

        OptimizedLSTMCell's carry is an (c, h) pair of (B, hidden) zeros;
        built directly so this is callable outside of apply()."""
        z = jnp.zeros((batch, self.cfg.hidden_size), dtype=self.dtype)
        return [(z, z) for _ in range(self.cfg.num_layers)]

    @nn.compact
    def step(self, carries, w: jnp.ndarray):
        """One recurrence step: (carries, (B, D)) -> (carries, (B, D))."""
        h = w
        new_carries = []
        for i in range(self.cfg.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.cfg.hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"lstm{i}",
            )
            carry, h = cell(carries[i], h)
            new_carries.append(carry)
        return new_carries, nn.relu(self._head()(h))


def attention_map(
    features: jnp.ndarray, w_hat: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Anticipated attention map from predicted channel weights.

    Args:
      features: (B, h, w, C) conv5 features of the *current* frame.
      w_hat: (B, C) predicted next-fixation channel weights.
      out_hw: output (H, W), e.g. (224, 224).

    Returns:
      (B, H, W) maps min-max normalized to [0, 1].
    """
    amap = jnp.einsum("bhwc,bc->bhw", features, w_hat)
    mn = jnp.min(amap, axis=(1, 2), keepdims=True)
    mx = jnp.max(amap, axis=(1, 2), keepdims=True)
    amap = (amap - mn) / (mx - mn + 1e-8)
    B = amap.shape[0]
    return jax.image.resize(amap, (B, out_hw[0], out_hw[1]), method="bilinear")
