"""AT stage training — TPU rebuild of ``ref:AT.py`` (SURVEY.md §3.2).

Trains the attention-transition LSTM to regress the next fixation's
512-d channel-weight vector (MSE [U loss]) over per-video fixation
sequences. Sequences are fixed-length windows (static shapes under jit);
shorter tails are zero-padded and masked via ``mask``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.train.common import TrainState, jit_dp_step, make_optimizer, make_state


def create_at_state(rng: jax.Array, pipeline: GazePipeline) -> TrainState:
    cfg = pipeline.config
    ws = jnp.zeros((1, 2, cfg.at.feature_dim), pipeline.dtype)
    variables = pipeline.lstm.init(rng, ws)
    return make_state(variables, make_optimizer(cfg.train))


def make_at_train_step(pipeline: GazePipeline, mesh: Optional[Mesh] = None):
    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        ws = batch["weights"]          # (B, T, C) fixation weight sequences
        mask = batch["mask"]           # (B, T) 1.0 on valid steps

        def loss_fn(params):
            pred = pipeline.lstm.apply({"params": params}, ws[:, :-1])
            err = (pred - ws[:, 1:]) ** 2
            m = (mask[:, :-1] * mask[:, 1:])[..., None]
            return jnp.sum(err * m) / (jnp.sum(m) * ws.shape[-1] + 1e-8)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    return jit_dp_step(step, mesh)


def build_weight_sequences(
    weights: np.ndarray, fixsac: np.ndarray, seq_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Group per-frame weight vectors into per-fixation sequences.

    One weight vector per fixation *segment* (first frame of each run of
    fixsac==1 — the reference operates per fixation, not per frame [M]),
    windowed into (N, seq_len, C) with a (N, seq_len) validity mask.
    """
    starts = [
        i for i in range(len(fixsac)) if fixsac[i] > 0 and (i == 0 or fixsac[i - 1] == 0)
    ]
    fix_w = weights[starts] if starts else np.zeros((0, weights.shape[-1]), weights.dtype)
    n = len(fix_w)
    if n < 2:
        return (
            np.zeros((0, seq_len, weights.shape[-1]), np.float32),
            np.zeros((0, seq_len), np.float32),
        )
    seqs, masks = [], []
    for s in range(0, n, seq_len):
        chunk = fix_w[s : s + seq_len]
        pad = seq_len - len(chunk)
        m = np.concatenate([np.ones(len(chunk)), np.zeros(pad)]).astype(np.float32)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[-1]), chunk.dtype)])
        if m.sum() >= 2:  # need at least one (w_t, w_{t+1}) pair
            seqs.append(chunk)
            masks.append(m)
    if not seqs:
        return (
            np.zeros((0, seq_len, weights.shape[-1]), np.float32),
            np.zeros((0, seq_len), np.float32),
        )
    return np.stack(seqs).astype(np.float32), np.stack(masks)
