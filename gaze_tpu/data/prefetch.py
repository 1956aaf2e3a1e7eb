"""Host-side prefetch: overlap host decode with device compute.

The reference hides decode latency behind ``DataLoader(num_workers=N)``
worker *processes* (SURVEY.md §2 "Host data parallelism" [M]). The JAX
equivalent is a background thread that stages the next batches onto the
device (sharded over the mesh) while the current step runs — device_put
is async, so a small queue of in-flight batches double-buffers H2D
against compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_prefetch(
    it: Iterator[Any],
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    buffer_size: int = 2,
) -> Iterator[Any]:
    """Wrap a host batch iterator with sharded async device staging.

    Each pytree leaf's leading (batch) dim is sharded over ``axis_name``
    of ``mesh`` (replicated if no mesh). A daemon thread keeps up to
    ``buffer_size`` batches in flight.
    """
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis_name))
        put = lambda x: jax.device_put(x, sharding)
    else:
        put = jax.device_put

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    _END = object()

    def producer():
        # Producer errors (corrupt JPEG mid-epoch, H2D failure) must
        # PROPAGATE to the training loop, not end the epoch early with a
        # success exit code — enqueue the exception and re-raise it on
        # the consumer side.
        try:
            for batch in it:
                q.put(jax.tree_util.tree_map(put, batch))
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — relayed, not dropped
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
