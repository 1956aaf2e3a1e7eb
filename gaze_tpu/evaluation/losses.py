"""Focal-style heatmap loss — TPU-native equivalent of ``ref:floss.py`` [M].

The reference's ``floss`` is a focal binary cross-entropy over dense
saliency heatmaps: most of a gaze heatmap is easy background, so plain BCE
is dominated by negatives; the focal modulation ``(1-p_t)^gamma``
down-weights easy pixels (Lin et al., ICCV 2017). Exact upstream
formulation is [M]; gamma is configurable (default 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from gaze_tpu.core.config import LossConfig


def floss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    cfg: LossConfig | None = None,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Focal BCE between predicted and target heatmaps.

    Args:
      pred: (B, H, W) sigmoid outputs in (0, 1).
      target: (B, H, W) ground-truth heatmaps in [0, 1] (soft Gaussian
        targets — treated as per-pixel Bernoulli probabilities).
      cfg: loss knobs (gamma, eps).
      sample_weight: optional (B,) per-frame weights — 0.0 drops a frame
        entirely (untracked-gaze masking); the mean renormalizes over the
        surviving frames so a batch of mostly-invalid frames doesn't
        shrink the gradient.

    Returns:
      scalar mean loss.
    """
    cfg = cfg or LossConfig()
    p = jnp.clip(pred, cfg.eps, 1.0 - cfg.eps)
    t = target
    pos = -t * ((1.0 - p) ** cfg.gamma) * jnp.log(p)
    neg = -(1.0 - t) * (p ** cfg.gamma) * jnp.log(1.0 - p)
    per_px = pos + neg
    if sample_weight is None:
        return jnp.mean(per_px)
    w = sample_weight.astype(per_px.dtype)
    per_frame = jnp.mean(per_px, axis=(1, 2))
    return jnp.sum(per_frame * w) / (jnp.sum(w) + 1e-8)


def bce(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Plain BCE (gamma=0 special case), kept for ablation parity."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return jnp.mean(-target * jnp.log(p) - (1.0 - target) * jnp.log(1.0 - p))


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE — the AT LSTM's next-weight regression loss (ref:AT.py [M/U])."""
    return jnp.mean((pred - target) ** 2)
