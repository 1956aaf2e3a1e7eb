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

So: if the axon sitecustomize is on PYTHONPATH, re-exec pytest once with
a clean environment (no axon path, JAX_PLATFORMS=cpu, 8 CPU devices),
guarded by a sentinel. Re-exec here is safe — fd1 is still the real
terminal.
"""

import os
import sys

_SENTINEL = "GAZE_TPU_TEST_REEXEC"


def _needs_sanitizing() -> bool:
    if os.environ.get(_SENTINEL) == "1":
        return False
    if os.environ.get("GAZE_TPU_HW_TESTS") == "1":
        # On-hardware mode: keep the TPU backend so the `tpu`-marked
        # compiled-kernel tests (tests/test_tpu_kernels.py) can run.
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return ".axon_site" in pythonpath or os.environ.get("JAX_PLATFORMS", "") not in (
        "cpu",
        "",
    )


if _needs_sanitizing():
    env = dict(os.environ)
    env[_SENTINEL] = "1"
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
    env["JAX_NUM_CPU_DEVICES"] = "8"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
