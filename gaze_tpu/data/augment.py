"""On-device training augmentation: per-sample horizontal flip.

The reference trains without augmentation [U — research code; SURVEY.md
§2 SP dataset row lists resize+normalize only], so this is opt-in
(``TrainConfig.augment_flip`` / CLI ``--augment_flip``) and OFF on the
parity path. Horizontal flip is the one cheap augmentation that is
label-consistent for gaze: egocentric scenes have no canonical
left/right, the gaze point mirrors with the frame, and the flow field
mirrors with its x-component negated.

Everything runs inside the jit train step on device (a `jnp.flip` is a
lane reversal, nearly free next to the VGG forward):

- frames: mirror the W axis; the TV-L1 solve runs DOWNSTREAM of the
  flip, so the solved flow is automatically consistent — no flow
  fix-up needed on the on-TPU solve path;
- gaze: x -> (W_model - 1) - x in model-grid pixel coordinates (the
  Gaussian target render then mirrors exactly);
- precomputed dense_flow images: mirror W, and negate the x channel on
  the 8-bit grid (v -> 255 - v). This is EXACT through
  ``normalize_flow_image``: to_float gives f = v/255, and
  (1 - f) - 0.5 = -(f - 0.5) — the zero-motion code 0.5 is the
  symmetry center.

The per-sample flip mask is drawn OUTSIDE the microbatch scan (one
bernoulli per batch row, keyed on the train seed + step), so gradient
accumulation sees independent per-row decisions and the step stays
deterministic given (seed, step).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def with_flip_mask(batch: Dict[str, jnp.ndarray], seed: int, step: jnp.ndarray) -> Dict:
    """Return a copy of ``batch`` carrying a per-sample flip mask under
    the reserved key ``"_flip"`` (float 0/1 so it tree-splits like every
    other leaf). Deterministic in (seed, step)."""
    key = jax.random.fold_in(jax.random.key(seed), step)
    b = batch["gaze"].shape[0]
    mask = jax.random.bernoulli(key, 0.5, (b,)).astype(jnp.float32)
    return dict(batch, _flip=mask)


def apply_hflip(batch: Dict[str, jnp.ndarray], model_width: int) -> Dict:
    """Apply the ``"_flip"`` mask: mirror frames (and flow images, with
    x negated on the u8 grid), map gaze x through the model-grid mirror.
    Rows with mask 0 pass through untouched. Involution: applying the
    same mask twice restores the batch (tested)."""
    if "_flip" not in batch:
        return batch
    m = batch["_flip"]
    out = dict(batch)

    def img(x):
        return jnp.where(m[:, None, None, None] > 0, jnp.flip(x, axis=2), x)

    for k in ("prev", "cur"):
        if k in out:
            out[k] = img(out[k])
    if out.get("flow_img") is not None:
        f = jnp.flip(out["flow_img"], axis=2)
        # x channel: negate on the 8-bit grid (255 - v); y unchanged.
        fx = (255 - f[..., :1].astype(jnp.int32)).astype(f.dtype)
        f = jnp.concatenate([fx, f[..., 1:]], axis=-1)
        out["flow_img"] = jnp.where(m[:, None, None, None] > 0, f, out["flow_img"])
    if "gaze" in out:
        g = out["gaze"]
        gx = jnp.where(m > 0, (model_width - 1) - g[..., 0], g[..., 0])
        out["gaze"] = jnp.stack([gx, g[..., 1]], axis=-1)
    return out
