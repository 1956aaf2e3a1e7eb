"""Device mesh + sharding helpers.

The reference's parallelism is at most single-process ``nn.DataParallel``
(SURVEY.md §2, [U]); the TPU build replaces it with a first-class 1-D
``data`` mesh: batches are sharded over the mesh, parameters are
replicated, and XLA SPMD emits the gradient all-reduce over ICI
(BASELINE.json: "batched data-parallel training sharded over ICI").
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D data-parallel mesh over the visible devices.

    The model is VGG16-scale (~15.5 GFLOP/stream at 224^2), far below the
    HBM of one chip, so tensor/pipeline parallelism is deliberately out of
    scope (SURVEY.md §2 parallelism table); the single mesh axis is batch.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """device_put a host pytree with its leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
