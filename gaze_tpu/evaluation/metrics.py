"""AAE / AUC gaze metrics — TPU-native equivalent of the reference's
``computeAAEAUC``-style functions in ``ref:utils.py`` [M].

The reference computes these per-frame on host numpy after a D2H copy
(SURVEY.md §3.1 hot-loop note); here both metrics are batched device
reductions so evaluation never syncs per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaze_tpu.core.config import CameraConfig
from gaze_tpu.ops.heatmap import heatmap_argmax


def pixel_to_ray(
    points: jnp.ndarray, grid_hw: tuple[int, int], cam: CameraConfig
) -> jnp.ndarray:
    """Map (B, 2) (x, y) pixel coords on a grid of size ``grid_hw`` to unit
    3-D viewing rays under a pinhole model.

    The upstream intrinsics are unverifiable (SURVEY.md §0); we use the
    documented CameraConfig: focal length from the horizontal FOV at the
    native capture resolution, principal point at the image center, and
    square pixels. All constants are explicit so parity can be re-tuned
    against the reference once it is runnable.
    """
    gh, gw = grid_hw
    sx = cam.native_width / gw
    sy = cam.native_height / gh
    f = (cam.native_width / 2.0) / jnp.tan(jnp.deg2rad(cam.fov_x_deg) / 2.0)
    cx = cam.native_width / 2.0
    cy = cam.native_height / 2.0
    x = points[:, 0] * sx - cx
    y = points[:, 1] * sy - cy
    rays = jnp.stack([x, y, jnp.full_like(x, f)], axis=1)
    return rays / jnp.linalg.norm(rays, axis=1, keepdims=True)


def aae(
    pred_hm: jnp.ndarray,
    gt_points: jnp.ndarray,
    cam: CameraConfig | None = None,
) -> jnp.ndarray:
    """Average angular error in degrees.

    Args:
      pred_hm: (B, H, W) predicted heatmaps.
      gt_points: (B, 2) GT gaze (x, y) in pred-grid pixel coords.

    Returns:
      (B,) per-frame angular error, degrees. Mean it over valid frames.
    """
    cam = cam or CameraConfig()
    H, W = pred_hm.shape[1], pred_hm.shape[2]
    pred_pts = heatmap_argmax(pred_hm)
    r_pred = pixel_to_ray(pred_pts, (H, W), cam)
    r_gt = pixel_to_ray(gt_points, (H, W), cam)
    # Chord-based angle (2*asin(|a-b|/2)): numerically stable for small
    # angles where arccos(dot) loses ~2 decimal digits in float32.
    chord = jnp.linalg.norm(r_pred - r_gt, axis=1)
    return jnp.rad2deg(2.0 * jnp.arcsin(jnp.clip(chord * 0.5, 0.0, 1.0)))


def auc_judd(pred_hm: jnp.ndarray, gt_points: jnp.ndarray) -> jnp.ndarray:
    """Judd-style ROC AUC of each heatmap against a single GT fixation.

    With one positive pixel, the ROC AUC reduces to one closed-form
    reduction (no threshold sweep): the fraction of pixels whose
    saliency is strictly below the GT pixel's value plus half the ties.
    Convention note: the GT pixel itself is counted in its own tie set
    and in the H*W denominator, so a strictly-max GT pixel scores
    1 - 0.5/(H*W), not 1.0 — an O(1/HW) offset (≤0.002% at 224²) that
    is identical for every model being compared and pinned by the
    golden bundles. (The exact negatives-only form would use
    (below + 0.5*(ties-1)) / (H*W - 1).)

    Args:
      pred_hm: (B, H, W).
      gt_points: (B, 2) (x, y) in pred-grid pixels (rounded to nearest).

    Returns:
      (B,) per-frame AUC in [0, 1].
    """
    B, H, W = pred_hm.shape
    xi = jnp.clip(jnp.round(gt_points[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(gt_points[:, 1]).astype(jnp.int32), 0, H - 1)
    flat = pred_hm.reshape(B, H * W)
    gt_val = jnp.take_along_axis(flat, (yi * W + xi)[:, None], axis=1)
    below = jnp.sum(flat < gt_val, axis=1).astype(jnp.float32)
    ties = jnp.sum(flat == gt_val, axis=1).astype(jnp.float32)
    return (below + 0.5 * ties) / float(H * W)


@jax.jit
def compute_aae_auc(
    pred_hm: jnp.ndarray, gt_points: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (AAE degrees, AUC) — the reference's ``computeAAEAUC`` [M]."""
    return aae(pred_hm, gt_points), auc_judd(pred_hm, gt_points)
