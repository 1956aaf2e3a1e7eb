"""Orbax checkpointing — replaces the reference's ``torch.save``/``load``
of per-stage ``state_dict``s to ``save/*.pth.tar`` (ref:utils.py +
trainers, SURVEY.md §2 "Checkpointing" [M]).

Each pipeline stage (SP / AT / LF) checkpoints independently under its
own subdirectory, mirroring the reference's per-stage files, and restore
is by-template so sharded training state round-trips losslessly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _mngr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


# Kept open between async saves so serialization overlaps training; the
# reference's torch.save blocks the train loop for the full write.
_async_mngrs: dict = {}


def save_checkpoint(directory: str, step: int, state: Any, block: bool = True) -> None:
    """Save a pytree (params/opt state/step) at ``directory/step``.

    With ``block=False`` the write happens on Orbax's background thread
    (SURVEY.md §5 "Orbax async checkpointing every N steps"): the device
    arrays are snapshotted immediately, the train loop continues, and
    the manager is kept open so a later save/finalize joins the write.
    """
    key = os.path.abspath(directory)
    if not block:
        mngr = _async_mngrs.get(key)
        if mngr is None:
            mngr = _async_mngrs[key] = _mngr(key)
        mngr.save(step, args=ocp.args.StandardSave(state))
        return
    mngr = _async_mngrs.pop(key, None) or _mngr(key)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def finalize_checkpoints() -> None:
    """Join all in-flight async saves (call at stage end / shutdown)."""
    for mngr in _async_mngrs.values():
        mngr.wait_until_finished()
        mngr.close()
    _async_mngrs.clear()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mngr = _mngr(directory)
    step = mngr.latest_step()
    mngr.close()
    return step


def _best_dir(directory: str) -> str:
    return directory.rstrip("/") + "_best"


def _best_metric_path(directory: str) -> str:
    # Sibling file, NOT inside the Orbax root (the manager's step scan
    # must only ever see step directories).
    return _best_dir(directory) + ".metric.json"


def best_metric(directory: str) -> Optional[float]:
    """The tracked best validation metric for a stage dir, if any."""
    try:
        with open(_best_metric_path(directory)) as f:
            return float(json.load(f)["metric"])
    except (OSError, ValueError, KeyError):
        return None


def save_best_checkpoint(
    directory: str, step: int, state: Any, metric: float
) -> bool:
    """Track the best-validation checkpoint (lower metric = better).

    The reference's SP trainer "saves best checkpoint" on validation
    (ref:SP.py, SURVEY.md §2); here every stage dir ``d`` gets a sibling
    ``d_best`` holding exactly the best-metric state, which downstream
    stages restore in preference to the latest periodic save.

    Returns True iff ``metric`` improved and the state was saved.
    """
    prev = best_metric(directory)
    if prev is not None and not (metric < prev):
        return False
    save_checkpoint(_best_dir(directory), step, state, block=True)
    with open(_best_metric_path(directory), "w") as f:
        json.dump({"metric": float(metric), "step": int(step)}, f)
    return True


def restore_best_or_latest(directory: str, template: Any, *,
                           report: bool = False) -> Any:
    """Restore the best-validation checkpoint when one was tracked,
    falling back to the latest periodic save (then to the template).

    With ``report=True`` returns ``(state, restored)`` so callers can
    warn on the template-fallback path without a second directory scan
    (each ``latest_step`` probe builds an Orbax manager — possibly over
    cold NFS)."""
    state, restored = template, False
    for d in (_best_dir(directory), directory):
        step = latest_step(d)
        if step is not None:
            state, restored = restore_checkpoint(d, template, step), True
            break
    return (state, restored) if report else state


def restore_checkpoint(directory: str, template: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``template``. Returns the
    template unchanged when no checkpoint exists (fresh start)."""
    mngr = _mngr(directory)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        mngr.close()
        return template
    out = mngr.restore(step, args=ocp.args.StandardRestore(template))
    mngr.close()
    return out
