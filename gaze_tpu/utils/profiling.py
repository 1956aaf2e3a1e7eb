"""Profiling helpers: jax.profiler traces + step timing.

The reference has no profiler hooks (SURVEY.md §5 "Tracing/profiling" —
at most manual timing prints); here a context manager captures a
Perfetto-compatible device trace, and ``device_time`` measures steady-
state device time for a jitted fn.

NOTE on this environment: the TPU sits behind a relay where
``block_until_ready`` does not synchronize and each D2H materialization
costs ~25 ms RTT. ``device_time`` therefore syncs by pulling a scalar
and amortizes over ``iters`` in-graph repetitions via ``lax.scan``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp

RELAY_RTT_S = 0.025


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with Perfetto/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(
    op: Callable[[], jnp.ndarray],
    iters: int = 10,
    repeats: int = 3,
    subtract_rtt: bool = True,
) -> float:
    """Steady-state seconds per execution of ``op`` (a thunk returning an
    array whose sum is pulled to host as the sync point)."""

    @jax.jit
    def loop():
        def body(c, _):
            return c + op().sum(), None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c

    float(loop())  # compile + warm
    best = min(
        _timed(lambda: float(loop())) for _ in range(repeats)
    )
    if subtract_rtt:
        best = max(best - RELAY_RTT_S, 0.0)
    return best / iters


def _timed(f: Callable[[], object]) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0
