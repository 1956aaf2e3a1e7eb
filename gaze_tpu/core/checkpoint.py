"""Orbax checkpointing — replaces the reference's ``torch.save``/``load``
of per-stage ``state_dict``s to ``save/*.pth.tar`` (ref:utils.py +
trainers, SURVEY.md §2 "Checkpointing" [M]).

Each pipeline stage (SP / AT / LF) checkpoints independently under its
own subdirectory, mirroring the reference's per-stage files, and restore
is by-template so sharded training state round-trips losslessly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _mngr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any) -> None:
    """Save a pytree (params/opt state/step) at ``directory/step``."""
    mngr = _mngr(directory)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mngr = _mngr(directory)
    step = mngr.latest_step()
    mngr.close()
    return step


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
