"""Profiling helpers: jax.profiler traces + step timing.

The reference has no profiler hooks (SURVEY.md §5 "Tracing/profiling" —
at most manual timing prints); here a context manager captures a
Perfetto-compatible device trace, and ``device_time`` measures steady-
state device time for a jitted fn.

NOTE on this environment: the TPU sits behind a relay where
``block_until_ready`` does not synchronize and each D2H materialization
costs ~25 ms RTT. ``device_time`` therefore syncs by pulling a scalar
once after ``iters`` pipelined dispatches (do NOT "improve" this back
into an in-graph ``lax.scan`` repeat: a carry-independent body gets
hoisted out of the loop by XLA and measures 10x fast — see the
function docstring).
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
    op: Callable[..., jnp.ndarray],
    iters: int = 10,
    repeats: int = 3,
    subtract_rtt: bool = True,
    args: tuple = (),
) -> float:
    """Steady-state seconds per execution of ``op`` (returns an array
    whose sum is pulled to host as the sync point).

    Pass large operands (model params, batch tensors) via ``args`` rather
    than closing over them: closure-captured arrays are attached to the
    lowered module as constants, and on this relay-compiled environment a
    f32 VGG's worth of constants exceeds the compile service's request
    size limit (HTTP 413). ``args`` become real jit parameters.

    Measurement = ``iters`` back-to-back async dispatches of one compiled
    executable, synced once at the end (device queue is FIFO, so the last
    result's materialization bounds them all). An earlier in-graph
    ``lax.scan`` variant measured 10x fast once operands became jit
    parameters: the body was carry-independent, so XLA hoisted the whole
    op out of the loop — dispatch pipelining can't be "optimized away".
    """
    f = jax.jit(lambda *a: op(*a).sum())
    float(f(*args))  # compile + warm

    def run() -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = f(*args)
        float(r)
        return time.perf_counter() - t0

    best = min(run() for _ in range(repeats))
    if subtract_rtt:
        best = max(best - RELAY_RTT_S, 0.0)
    return best / iters
