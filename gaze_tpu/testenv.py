"""pytest early-load plugin: sanitize the environment for CPU tests.

Loaded via ``addopts = "-p gaze_tpu.testenv"`` (pyproject.toml), which
imports this module during pytest's option pre-parsing — *before* the
capture plugin swaps fd1/fd2 and before initial conftests load. That
early slot matters twice over in this image:

1. ``sitecustomize`` (PYTHONPATH=/root/.axon_site) imports jax and
   registers the axon TPU PJRT plugin at interpreter start, so no
   conftest can force the 8-device virtual CPU mesh the sharding tests
   need (SURVEY.md §4) — the backend is already initialized.
2. The axon path routes XLA compiles through a remote service (~5-9s
   wall per executable, even trivial ones); pure-local CPU compiles are
   milliseconds.

So: if the axon sitecustomize is on PYTHONPATH — or the process would
otherwise come up without the 8 virtual CPU devices the sharding tests
need — re-exec pytest once with a clean environment, guarded by a
sentinel. Re-exec here is safe — fd1 is still the real terminal.

``sanitized_cpu_env`` / ``needs_cpu_reexec`` are shared with
``tests/conftest.py`` (the direct-invocation fallback) and the CPU-mesh
tools (``tools/bench_train_scaling.py``), so the axon quirks live in
exactly one place.
"""

import os
import sys

_SENTINEL = "GAZE_TPU_TEST_REEXEC"


def needs_cpu_reexec(sentinel: str = _SENTINEL, n_devices: int = 8) -> bool:
    """True when the current process should re-exec into a sanitized
    CPU environment: the axon sitecustomize is active, JAX is pointed at
    a non-CPU platform, or the virtual CPU device count isn't pinned to
    ``n_devices`` (a clean machine still needs the 8-device mesh)."""
    if os.environ.get(sentinel) == "1":
        return False
    return (
        ".axon_site" in os.environ.get("PYTHONPATH", "")
        or os.environ.get("JAX_PLATFORMS", "") not in ("cpu", "")
        or os.environ.get("JAX_NUM_CPU_DEVICES") != str(n_devices)
    )


def sanitized_cpu_env(sentinel: str = _SENTINEL, n_devices: int = 8) -> dict:
    """A copy of ``os.environ`` scrubbed of the axon TPU path and pinned
    to ``n_devices`` local CPU devices, with the repo root on PYTHONPATH
    and ``sentinel`` set so the re-exec happens at most once."""
    env = dict(os.environ)
    env[sentinel] = "1"
    parts = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in parts:
        parts.insert(0, repo_root)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = str(n_devices)
    return env


def _needs_sanitizing() -> bool:
    if os.environ.get("GAZE_TPU_HW_TESTS") == "1":
        # On-hardware mode: keep the TPU backend so the `tpu`-marked
        # compiled-kernel tests (tests/test_tpu_kernels.py) can run.
        return False
    return needs_cpu_reexec()


if _needs_sanitizing():
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        sanitized_cpu_env(),
    )
