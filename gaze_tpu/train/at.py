"""AT stage training — TPU rebuild of ``ref:AT.py`` (SURVEY.md §3.2).

Trains the attention-transition LSTM to regress the next fixation's
512-d channel-weight vector (MSE [U loss]) over per-video fixation
sequences.

Two batching modes:

- **Stateful windowing (default, TBPTT)**: the reference trains
  per-video variable-length sequences (SURVEY §2 "AT dataset" [M]);
  variable shapes don't jit, so each video becomes fixed-length windows
  whose LSTM carry is CHAINED — window k starts from window k-1's final
  state (gradients stopped at the boundary, standard truncated BPTT).
  Input windows lag target windows by one step, so every consecutive
  fixation pair — including pairs straddling a window boundary — is
  trained exactly once.
- **Stateless windows** (``build_weight_sequences``): independent
  zero-carry windows; kept for ablation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gaze_tpu.models.at import LSTMNet
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


def make_at_eval_step(pipeline: GazePipeline):
    """Masked next-weight MSE on held-out fixation windows.

    The validation metric for AT best-checkpoint tracking in the
    STATELESS (``--at_stateless``) ablation mode (the reference's
    per-stage trainers all checkpoint on validation — ref:SP.py /
    ref:AT.py pattern, SURVEY.md §2). Stateless zero-carry windows —
    the matching objective for that mode; the default TBPTT mode
    validates with :func:`make_at_stateful_eval` instead, so the val
    metric shares the training objective's statefulness.
    ``(params, seqs (N,T,C), mask (N,T)) -> scalar mse``.
    """

    @jax.jit
    def eval_mse(params, seqs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        pred = pipeline.lstm.apply({"params": params}, seqs[:, :-1])
        m = (mask[:, :-1] * mask[:, 1:])[..., None]
        err = (pred - seqs[:, 1:]) ** 2
        return jnp.sum(err * m) / (jnp.sum(m) * seqs.shape[-1] + 1e-8)

    return eval_mse


def make_at_stateful_eval(pipeline: GazePipeline):
    """Stateful (TBPTT-matched) validation MSE.

    Threads the LSTM carry across each lane's consecutive windows
    exactly like :func:`make_at_tbptt_step` — so best-checkpoint ranking
    scores the SAME objective stateful training optimizes (a stateless
    zero-carry proxy can rank-order checkpoints differently on
    long-carry corpora). Consume a schedule from
    :func:`build_tbptt_schedule` over the held-out videos.

    Returns ``evaluate(params, schedule) -> float`` (masked mean MSE
    over all windows; NaN on an empty schedule).
    """
    L = pipeline.config.at.num_layers

    @jax.jit
    def window_mse(params, carry_c, carry_h, inputs, targets, mask, reset):
        keep = (1.0 - reset).reshape(-1, 1, 1)
        cc = carry_c * keep
        ch = carry_h * keep
        carries = [(cc[:, i], ch[:, i]) for i in range(L)]
        new_carries, pred = pipeline.lstm.apply(
            {"params": params}, carries, inputs, method=LSTMNet.rollout
        )
        err = jnp.sum((pred - targets) ** 2 * mask[..., None])
        cnt = jnp.sum(mask) * pred.shape[-1]
        new_cc = jnp.stack([c for c, _ in new_carries], axis=1)
        new_ch = jnp.stack([h for _, h in new_carries], axis=1)
        return new_cc, new_ch, err, cnt

    def evaluate(params, schedule: List[Dict[str, np.ndarray]]) -> float:
        if not schedule:
            return float("nan")
        lanes = schedule[0]["inputs"].shape[0]
        H = pipeline.config.at.hidden_size
        cc = jnp.zeros((lanes, L, H), jnp.float32)
        ch = jnp.zeros((lanes, L, H), jnp.float32)
        # Accumulate on-device and pull ONE scalar after the loop: the
        # carry chain already pipelines the window dispatches, and a
        # per-window float() would pay a full relay round-trip each
        # window (CLAUDE.md sync-amortization rule).
        tot = jnp.zeros((), jnp.float32)
        cnt = jnp.zeros((), jnp.float32)
        for sched in schedule:
            cc, ch, e, c = window_mse(
                params, cc, ch,
                jnp.asarray(sched["inputs"]), jnp.asarray(sched["targets"]),
                jnp.asarray(sched["mask"]), jnp.asarray(sched["reset"]),
            )
            tot = tot + e
            cnt = cnt + c
        return float(tot) / max(float(cnt), 1e-8)

    return evaluate


def split_at_validation(
    video_w: List[np.ndarray], holdout_frac: float = 0.1
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Deterministic train/val split of per-video fixation sequences.

    Multi-video corpora hold out the trailing ``max(1, N*frac)`` videos
    (order is the caller's sorted-by-name order, so the split is stable
    across runs). A single-video corpus holds out the trailing 20% of
    its fixations (both sides keeping >=2 so each yields a pair); below
    6 fixations the whole sequence doubles as validation — degenerate
    but still a monotone signal for best-tracking on tiny smoke runs.
    """
    if len(video_w) >= 2:
        n_val = max(1, int(len(video_w) * holdout_frac))
        return video_w[:-n_val], video_w[-n_val:]
    w = video_w[0]
    if len(w) >= 6:
        k = min(len(w) - 2, max(2, int(0.8 * len(w))))
        return [w[:k]], [w[k:]]
    return [w], [w]


def build_at_validation_windows(
    val_w: List[np.ndarray], seq_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack validation sequences into (N, seq_len, C) windows + mask
    for :func:`make_at_eval_step`."""
    seqs, masks = [], []
    for w in val_w:
        s, m = build_weight_sequences(
            w, np.ones((len(w),), np.float32), seq_len, per_fixation=False
        )
        if len(s):
            seqs.append(s)
            masks.append(m)
    if not seqs:
        dim = val_w[0].shape[-1] if val_w else 0
        return (np.zeros((0, seq_len, dim), np.float32),
                np.zeros((0, seq_len), np.float32))
    return np.concatenate(seqs), np.concatenate(masks)


def fixation_onset_weights(weights: np.ndarray, fixsac: np.ndarray) -> np.ndarray:
    """Per-fixation weight vectors: one per run of fixsac==1 (its first
    frame — the reference operates per fixation, not per frame [M])."""
    starts = [
        i for i in range(len(fixsac)) if fixsac[i] > 0 and (i == 0 or fixsac[i - 1] == 0)
    ]
    if not starts:
        return np.zeros((0, weights.shape[-1]), np.float32)
    return weights[starts].astype(np.float32)


def build_tbptt_schedule(
    video_weights: List[np.ndarray], seq_len: int, lanes: int
) -> List[Dict[str, np.ndarray]]:
    """Pack per-video fixation-weight sequences into a TBPTT schedule.

    Each video's sequence w_0..w_{K-1} becomes (input=w[:-1],
    target=w[1:]) split into consecutive ``seq_len`` windows. Videos are
    packed greedily into ``lanes`` parallel lanes (longest first, onto
    the shortest lane); a lane runs its videos back to back, raising
    ``reset`` on each video's first window so the train step zeroes that
    lane's carry.

    Returns a list of per-step dicts — iterate IN ORDER, threading the
    carry returned by :func:`make_at_tbptt_step`:
      inputs  (lanes, seq_len, C)
      targets (lanes, seq_len, C)
      mask    (lanes, seq_len)   1.0 on real (input, target) pairs
      reset   (lanes,)           1.0 where the lane starts a new video
    """
    per_video: List[List[Tuple[np.ndarray, np.ndarray, np.ndarray]]] = []
    dim = None
    for w in video_weights:
        if len(w) < 2:
            continue
        dim = w.shape[-1]
        inp, tgt = w[:-1], w[1:]
        wins = []
        for s in range(0, len(inp), seq_len):
            ci, ct = inp[s : s + seq_len], tgt[s : s + seq_len]
            pad = seq_len - len(ci)
            m = np.concatenate([np.ones(len(ci)), np.zeros(pad)]).astype(np.float32)
            if pad:
                z = np.zeros((pad, dim), np.float32)
                ci = np.concatenate([ci, z])
                ct = np.concatenate([ct, z])
            wins.append((ci.astype(np.float32), ct.astype(np.float32), m))
        per_video.append(wins)
    if not per_video:
        return []

    lane_wins: List[List[Tuple[Tuple, bool]]] = [[] for _ in range(lanes)]
    for wins in sorted(per_video, key=len, reverse=True):
        lane = min(lane_wins, key=len)
        lane.extend((w, j == 0) for j, w in enumerate(wins))

    steps = []
    for k in range(max(len(l) for l in lane_wins)):
        inputs = np.zeros((lanes, seq_len, dim), np.float32)
        targets = np.zeros((lanes, seq_len, dim), np.float32)
        mask = np.zeros((lanes, seq_len), np.float32)
        reset = np.zeros((lanes,), np.float32)
        for li, lane in enumerate(lane_wins):
            if k < len(lane):
                (ci, ct, m), is_start = lane[k]
                inputs[li], targets[li], mask[li] = ci, ct, m
                reset[li] = float(is_start)
        steps.append(
            {"inputs": inputs, "targets": targets, "mask": mask, "reset": reset}
        )
    return steps


def make_at_tbptt_step(pipeline: GazePipeline, mesh: Optional[Mesh] = None):
    """Stateful-window AT train step.

    ``(state, batch) -> (state, metrics)`` where batch additionally
    carries ``carry_c``/``carry_h`` (B, num_layers, hidden) from the
    previous window (zeros for step 0); metrics return the new carries
    (gradient-stopped — truncated BPTT). ``reset`` zeroes a lane's carry
    at video starts so videos packed back-to-back in a lane stay
    independent.
    """
    L = pipeline.config.at.num_layers

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        keep = (1.0 - batch["reset"]).reshape(-1, 1, 1)
        cc = batch["carry_c"] * keep  # (B, L, H)
        ch = batch["carry_h"] * keep
        carries = [(cc[:, i], ch[:, i]) for i in range(L)]
        mask = batch["mask"]

        def loss_fn(params):
            new_carries, pred = pipeline.lstm.apply(
                {"params": params}, carries, batch["inputs"], method=LSTMNet.rollout
            )
            err = (pred - batch["targets"]) ** 2 * mask[..., None]
            loss = jnp.sum(err) / (jnp.sum(mask) * pred.shape[-1] + 1e-8)
            return loss, new_carries

        (loss, new_carries), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_cc = jax.lax.stop_gradient(jnp.stack([c for c, _ in new_carries], axis=1))
        new_ch = jax.lax.stop_gradient(jnp.stack([h for _, h in new_carries], axis=1))
        return state.apply_gradients(grads), {
            "loss": loss,
            "carry_c": new_cc,
            "carry_h": new_ch,
        }

    return jit_dp_step(step, mesh)


def build_weight_sequences(
    weights: np.ndarray,
    fixsac: np.ndarray,
    seq_len: int,
    per_fixation: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Group per-frame weight vectors into per-fixation sequences.

    One weight vector per fixation *segment* (first frame of each run of
    fixsac==1 — the reference operates per fixation, not per frame [M]),
    windowed into (N, seq_len, C) with a (N, seq_len) validity mask.
    With ``per_fixation=False`` the weights are taken as an
    already-extracted fixation sequence and only windowed.
    """
    if per_fixation:
        fix_w = fixation_onset_weights(weights, fixsac)
    else:
        fix_w = np.asarray(weights, np.float32)
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
