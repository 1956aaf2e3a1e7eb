"""Sequential full-pipeline rollout evaluation — the parity-critical
inference loop of SURVEY.md §3.4/§3.5 (ref:gaze_full.py / ref:LF.py
``val()`` [M]).

Per video, frames are processed IN ORDER with real streaming semantics:

- the AT LSTM state is carried across the whole video, advanced only on
  fixation onsets (fixsac-gated);
- AT features are pooled at the SP map's argmax — the model's own
  prediction, never the ground-truth gaze (no teacher forcing);
- the LF head fuses SP saliency with the rolled-out attention map and
  the final heatmap's argmax is scored against GT with AAE/AUC.

TPU shape: V test videos advance in lockstep as a batch (padded to a
fixed group size), scanning time inside one jit per fixed-length chunk;
the recurrent state + previous frame live in HBM between chunks, so the
host only streams decoded uint8 frames in. Untracked-gaze frames and
tail padding are masked out of the metric sums in-graph (one D2H sync
per chunk, never per frame — the reference syncs per frame, SURVEY.md
§3.1 hot-loop note).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gaze_tpu.evaluation.metrics import aae, auc_judd
from gaze_tpu.models.pipeline import GazePipeline


def make_rollout_chunk_fn(
    pipeline: GazePipeline,
    with_flow: bool = False,
    mesh: Optional[Mesh] = None,
    score_key: str = "heatmap",
) -> Callable:
    """jit-compiled chunk evaluator.

    Signature: ``(variables, state, prev, frames, fixsac, gaze, valid
    [, flow_img]) -> (state, prev, sums)`` where

      state:   StreamState carried across chunks (per video slot),
      prev:    (V, H, W, 3) uint8 — last frame of the previous chunk,
      frames:  (V, T, H, W, 3) uint8 current-frame chunk,
      fixsac:  (V, T) fixation bits (0 on padding),
      gaze:    (V, T, 2) GT gaze in model-grid pixels,
      valid:   (V, T) 1.0 where the frame exists AND its gaze is tracked,
      flow_img:(V, T, h, w, 2) uint8 precomputed flow (with_flow=True),
      sums:    dict of (V,) masked sums — "aae", "auc", "count".

    ``variables`` is the full {"sp","at","lf"} tree; AT pooling is at the
    SP argmax (``gaze_xy=None`` in ``pipeline.step``).

    With ``mesh``, the video axis V is sharded over the mesh's data axis
    (variables replicated): every per-video argument — recurrent state,
    prev frame, chunks, metric sums — is batch-leading, so eval scales
    across chips with zero inter-chip communication (each chip rolls out
    its own video slots; only the final (V,) sums come back to host).
    V must be a multiple of ``mesh.size`` (callers pad groups).

    ``score_key`` picks which of the step's maps is scored — "heatmap"
    (the LF fusion, default = the reference's reported metric),
    "saliency" (SP-only ablation) or "attention" (AT-only ablation).
    The rollout dynamics are identical in all three: the LSTM still
    advances on onsets and AT still pools at the SP argmax; only the
    scored map changes, so the ablations isolate each head's
    contribution on the same trajectory.
    """
    if score_key not in ("heatmap", "saliency", "attention"):
        raise ValueError(f"unknown score_key {score_key!r}")
    cfg = pipeline.config
    # Quantized weights as jit operands, not inlined constants
    # (models/pipeline.quant_as_operand rationale).
    import dataclasses as _dc
    import functools as _ft

    from gaze_tpu.models.pipeline import quant_as_operand

    template, qsp = quant_as_operand(pipeline)

    def chunk_fn(qsp, variables, state, prev, frames, fixsac, gaze, valid,
                 flow_img=None):
        p = (template if qsp is None
             else _dc.replace(template, quant_sp=qsp))

        def body(carry, xs):
            st, pv = carry
            if with_flow:
                cur, fix, gz, vd, fl = xs
            else:
                cur, fix, gz, vd = xs
                fl = None
            st, out = p.step(variables, st, pv, cur, fix, flow_img=fl)
            a = aae(out[score_key], gz, cfg.camera)
            u = auc_judd(out[score_key], gz)
            # where (not *): a masked frame may carry NaN gaze, and
            # NaN * 0 would poison the sum.
            keep = vd > 0
            return (st, cur), (
                jnp.where(keep, a, 0.0),
                jnp.where(keep, u, 0.0),
                vd,
            )

        def tx(x):
            return jnp.swapaxes(x, 0, 1)

        xs = (tx(frames), tx(fixsac), tx(gaze), tx(valid))
        if with_flow:
            xs = xs + (tx(flow_img),)
        (state, prev), (aaes, aucs, cnts) = jax.lax.scan(body, (state, prev), xs)
        sums = {
            "aae": jnp.sum(aaes, axis=0),
            "auc": jnp.sum(aucs, axis=0),
            "count": jnp.sum(cnts, axis=0),
        }
        return state, prev, sums

    if mesh is None:
        return _ft.partial(jax.jit(chunk_fn), qsp)
    from gaze_tpu.parallel.mesh import batch_sharding, replicated

    rep, bsh = replicated(mesh), batch_sharding(mesh)
    if qsp is not None:
        qsp = jax.device_put(qsp, rep)
    n_in = 8 if with_flow else 7
    return _ft.partial(
        jax.jit(
            chunk_fn,
            # Pytree-prefix shardings: quant weights + variables
            # replicated, everything else (state pytree, prev, chunk
            # tensors) sharded on the leading V.
            in_shardings=(rep, rep) + (bsh,) * (n_in - 1),
            out_shardings=(bsh, bsh, bsh),
        ),
        qsp,
    )


def rollout_eval_arrays(
    pipeline: GazePipeline,
    variables: Dict[str, Any],
    frames: np.ndarray,
    gaze: np.ndarray,
    fixsac: np.ndarray,
    valid: Optional[np.ndarray] = None,
    chunk_len: int = 32,
    mesh: Optional[Mesh] = None,
    score_key: str = "heatmap",
    flow_img: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rollout-evaluate V equal-length in-memory videos.

    Args:
      frames: (V, T, H, W, 3) uint8 — frame 0 seeds the flow pair and is
        not scored (no pair exists yet), matching the loader's pairing.
      gaze:   (V, T, 2) GT gaze in model-grid pixels.
      fixsac: (V, T) fixation bits.
      valid:  optional (V, T) gaze-validity mask (default all valid).
      mesh:   optional data mesh — videos shard over it (V is padded up
        to a multiple of the mesh size with inactive slots).
      flow_img: optional (V, T, h, w, 2) uint8 precomputed flow images
        (the strict-parity dense_flow input mode — the TV-L1 solve is
        skipped and frame t consumes flow_img[:, t], exactly like the
        on-disk ``flows/`` path of :func:`rollout_eval_videos`).

    Returns:
      (aae_sum, auc_sum, count) arrays of shape (V,) — divide for means.
    """
    V, T = frames.shape[:2]
    if valid is None:
        valid = np.ones((V, T), np.float32)
    V_real = V
    if mesh is not None and V % mesh.size:
        pad_v = mesh.size - V % mesh.size
        frames = np.concatenate([frames, np.zeros((pad_v,) + frames.shape[1:], frames.dtype)])
        gaze = np.concatenate([gaze, np.zeros((pad_v,) + gaze.shape[1:], gaze.dtype)])
        fixsac = np.concatenate([fixsac, np.zeros((pad_v,) + fixsac.shape[1:], fixsac.dtype)])
        valid = np.concatenate([valid, np.zeros((pad_v, T), np.float32)])
        if flow_img is not None:
            flow_img = np.concatenate(
                [flow_img,
                 np.full((pad_v,) + flow_img.shape[1:], 128, flow_img.dtype)]
            )
        V = V + pad_v
    chunk_fn = make_rollout_chunk_fn(
        pipeline, with_flow=flow_img is not None, mesh=mesh,
        score_key=score_key,
    )
    state = pipeline.init_state(V)
    prev = jnp.asarray(frames[:, 0])
    aae_s = np.zeros((V,), np.float64)
    auc_s = np.zeros((V,), np.float64)
    cnt = np.zeros((V,), np.float64)
    for s in range(1, T, chunk_len):
        e = min(s + chunk_len, T)
        pad = chunk_len - (e - s)

        def pad_t(x, fill=0):
            if pad == 0:
                return x
            shape = (V, pad) + x.shape[2:]
            return np.concatenate([x, np.full(shape, fill, x.dtype)], axis=1)

        extra = ()
        if flow_img is not None:
            # zero-motion (128) padding: the masked tail still runs the
            # step, so keep its flow input benign.
            extra = (jnp.asarray(pad_t(flow_img[:, s:e], fill=128)),)
        state, prev, sums = chunk_fn(
            variables,
            state,
            prev,
            jnp.asarray(pad_t(frames[:, s:e])),
            jnp.asarray(pad_t(fixsac[:, s:e].astype(np.float32))),
            jnp.asarray(pad_t(gaze[:, s:e].astype(np.float32))),
            jnp.asarray(pad_t(valid[:, s:e].astype(np.float32))),
            *extra,
        )
        aae_s += np.asarray(sums["aae"], np.float64)
        auc_s += np.asarray(sums["auc"], np.float64)
        cnt += np.asarray(sums["count"], np.float64)
    return aae_s[:V_real], auc_s[:V_real], cnt[:V_real]


def _decode_group_chunk(
    group, recs, s, chunk_len, V, nh, nw, th, tw, use_precomputed_flow
):
    """Decode one lockstep chunk for a WHOLE group of videos.

    All frame paths across the group go into ONE batched decode call
    (the threaded native_io/libjpeg path parallelizes inside a batch;
    the old per-video loop serialized V small batches), and likewise
    one batched flow decode. Returns the chunk tensors as numpy.
    """
    from gaze_tpu.data.gtea import _decode_flow_images, _decode_images

    frames_c = np.zeros((V, chunk_len, nh, nw, 3), np.uint8)
    fix_c = np.zeros((V, chunk_len), np.float32)
    gaze_c = np.zeros((V, chunk_len, 2), np.float32)
    valid_c = np.zeros((V, chunk_len), np.float32)
    slots: List[Tuple[int, int]] = []
    flat_recs = []
    for vi, v in enumerate(group):
        rs = recs[v][s : s + chunk_len]
        if not rs:
            continue
        fix_c[vi, : len(rs)] = [r.fixation for r in rs]
        gaze_c[vi, : len(rs)] = [
            (r.gaze[0] * tw / nw, r.gaze[1] * th / nh) for r in rs
        ]
        valid_c[vi, : len(rs)] = [float(r.gaze_valid) for r in rs]
        slots.extend((vi, t) for t in range(len(rs)))
        flat_recs.extend(rs)
    if flat_recs:
        imgs = _decode_images([r.image_path for r in flat_recs])
        for (vi, t), img in zip(slots, imgs):
            frames_c[vi, t] = img
    flow_c = None
    if use_precomputed_flow:
        if flat_recs:
            fl = _decode_flow_images(flat_recs)
            flow_c = np.full((V, chunk_len) + fl.shape[1:], 128, np.uint8)
            for (vi, t), f in zip(slots, fl):
                flow_c[vi, t] = f
        else:  # pragma: no cover — unreachable from rollout_eval_videos
            # (starts never exceed T_max, so some record always lands in
            # the chunk); fail loudly rather than guess flow dims.
            raise AssertionError(
                "empty chunk: caller advanced past every video's end"
            )
    return frames_c, fix_c, gaze_c, valid_c, flow_c


def rollout_eval_videos(
    pipeline: GazePipeline,
    variables: Dict[str, Any],
    videos: Dict[str, Sequence],
    chunk_len: int = 32,
    group_size: int = 8,
    use_precomputed_flow: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
    score_key: str = "heatmap",
) -> Dict[str, Tuple[float, float, int]]:
    """Rollout-evaluate GTEA videos from FrameRecord lists.

    Videos advance in lockstep groups of ``group_size`` (padded — one
    compiled program regardless of corpus shape); frames are decoded
    chunk-by-chunk on host so a full video never needs to fit in RAM.
    Host decode is DOUBLE-BUFFERED against device compute: a background
    thread decodes chunk k+1 (one batched decode across all videos in
    the group) while the device rolls out chunk k, so the TPU no longer
    idles during PIL/libjpeg work (training got this via
    data/prefetch.py; eval was decode-bound — VERDICT r2 missing #5).
    With ``mesh``, each group's video slots shard over the data axis
    (group_size is rounded up to a mesh-size multiple).

    Returns {video: (mean_aae_deg, mean_auc, frames_scored)}.
    """
    from concurrent.futures import ThreadPoolExecutor

    from gaze_tpu.data.gtea import _decode_images

    cfg = pipeline.config
    if mesh is not None and group_size % mesh.size:
        group_size += mesh.size - group_size % mesh.size
    th, tw = cfg.image.height, cfg.image.width
    names = sorted(videos.keys())
    recs = {v: sorted(videos[v], key=lambda r: r.index) for v in names}

    def rec_has_flow(r) -> bool:
        return r.flow_path is not None or r.flow_xy_paths is not None

    if use_precomputed_flow is None:
        use_precomputed_flow = bool(names) and all(
            rec_has_flow(r) for v in names for r in recs[v]
        )

    chunk_fn = make_rollout_chunk_fn(
        pipeline, with_flow=use_precomputed_flow, mesh=mesh,
        score_key=score_key,
    )
    results: Dict[str, Tuple[float, float, int]] = {}

    empty = [v for v in names if not recs[v]]
    if empty:
        raise ValueError(
            f"rollout_eval_videos: empty record lists for {empty[:5]} — "
            "a truncated/abandoned manifest entry; drop them before eval"
        )
    results_single: Dict[str, Tuple[float, float, int]] = {}
    with ThreadPoolExecutor(max_workers=1) as pool:
        for g in range(0, len(names), group_size):
            group = names[g : g + group_size]
            V = group_size  # fixed batch: pad short groups w/ inactive slots
            T_max = max(len(recs[v]) for v in group)
            if T_max < 2:
                # Single-frame videos have no flow pair — nothing to
                # score (matches rollout_eval_arrays' count of 0).
                for v in group:
                    results_single[v] = (float("nan"), float("nan"), 0)
                continue
            state = pipeline.init_state(V)

            # Seed prev with each video's frame 0 (scoring starts at 1).
            decoded0 = _decode_images([recs[v][0].image_path for v in group])
            nh, nw = decoded0.shape[1:3]
            prev_np = np.zeros((V, nh, nw, 3), np.uint8)
            prev_np[: len(group)] = decoded0
            prev = jnp.asarray(prev_np)

            aae_s = np.zeros((V,), np.float64)
            auc_s = np.zeros((V,), np.float64)
            cnt = np.zeros((V,), np.float64)

            def decode(s):
                return _decode_group_chunk(
                    group, recs, s, chunk_len, V, nh, nw, th, tw,
                    use_precomputed_flow,
                )

            def to_device(chunk):
                frames_c, fix_c, gaze_c, valid_c, flow_c = chunk
                dev = [
                    jnp.asarray(frames_c), jnp.asarray(fix_c),
                    jnp.asarray(gaze_c), jnp.asarray(valid_c),
                ]
                if use_precomputed_flow:
                    dev.append(jnp.asarray(flow_c))
                return dev

            starts = list(range(1, T_max, chunk_len))
            fut = pool.submit(decode, starts[0])
            dev = to_device(fut.result())
            for si, s in enumerate(starts):
                if si + 1 < len(starts):
                    # decode the next chunk while the device runs this one
                    fut = pool.submit(decode, starts[si + 1])
                # async dispatch: returns before the device finishes
                state, prev, sums = chunk_fn(variables, state, prev, *dev)
                if si + 1 < len(starts):
                    # decode + H2D of chunk k+1 ride out chunk k's compute
                    # (the frame tensors dominate transfer; on
                    # relay-attached hosts H2D is the eval bottleneck —
                    # same overlap serve.py's submit() uses)
                    dev = to_device(fut.result())
                # np.asarray syncs on the device chunk — the decode
                # thread keeps working through this wait.
                aae_s += np.asarray(sums["aae"], np.float64)
                auc_s += np.asarray(sums["auc"], np.float64)
                cnt += np.asarray(sums["count"], np.float64)

            for vi, v in enumerate(group):
                n = max(cnt[vi], 1e-9)
                results[v] = (
                    float(aae_s[vi] / n), float(auc_s[vi] / n), int(cnt[vi])
                )
    results.update(results_single)
    return results
