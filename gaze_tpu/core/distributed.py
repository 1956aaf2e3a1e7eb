"""Multi-host initialization + global mesh construction.

The reference has no distributed communication layer at all (SURVEY.md
§5 — single GPU, at most threaded nn.DataParallel). The TPU build makes
it first-class but thin: ``jax.distributed.initialize()`` across hosts,
a single global 1-D ``data`` mesh over every chip in the slice/pod, and
per-host input sharding. XLA SPMD emits the gradient all-reduce over
ICI within a slice and DCN across slices — no NCCL/MPI analog exists in
user code by design.

Single-process usage (this environment, tests) needs no initialization:
``global_mesh()`` degrades to the local-device mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from gaze_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
) -> None:
    """Initialize multi-host JAX. No-op for single-process runs.

    With no arguments, relies on the TPU environment's automatic
    discovery (GCE metadata / megascale coordinator), which is how
    jax.distributed is meant to run on TPU pods.

    ``cpu_collectives`` selects the cross-process collective backend for
    the CPU platform ("gloo" or "mpi"). On TPU leave it None — XLA emits
    collectives over ICI/DCN natively. The gloo path is what makes
    multi-process runs *executable* on plain CPU hosts (and is exercised
    for real by tests/test_multiprocess.py: two OS processes, one
    coordinator, a genuine gradient all-reduce per train step).
    """
    if num_processes is not None and num_processes <= 1:
        return
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over ALL devices in the job (every host's chips)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this host must feed.

    Input pipelines are sharded per host: each process loads only its
    1/num_processes of the batch; jax.make_array_from_process_local_data
    (or device_put with the global sharding) assembles the global array.
    """
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return slice(idx * per, (idx + 1) * per)


def host_sharded_array(global_batch_leaf, mesh: Mesh):
    """Assemble a global batch-sharded array from per-host local data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(mesh.axis_names[0])), global_batch_leaf
    )
