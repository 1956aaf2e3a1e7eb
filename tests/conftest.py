"""Test configuration: 8-device virtual CPU mesh + compile cache.

The heavy lifting (sanitizing away this image's axon sitecustomize,
forcing JAX_PLATFORMS=cpu with 8 virtual devices for sharding tests)
happens in ``gaze_tpu/testenv.py``, loaded as an early ``-p`` plugin via
pyproject's addopts — see its docstring for why a conftest is too late.
This fallback covers direct invocations that bypass addopts; output may
be swallowed by pytest's capture in that path, but results are correct.
"""

import os
import sys

_SENTINEL = "GAZE_TPU_TEST_REEXEC"

if (
    os.environ.get(_SENTINEL) != "1"
    and os.environ.get("GAZE_TPU_HW_TESTS") != "1"
    and ".axon_site" in os.environ.get("PYTHONPATH", "")
):
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    parts = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in parts:
        parts.insert(0, repo_root)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compile cache (CPU-specific dir — entries compiled through
# the axon remote-compile path target different machine features; the
# on-hardware GAZE_TPU_HW_TESTS mode shares bench's TPU cache instead).
_CACHE_DIR = os.path.join(
    os.path.dirname(__file__), "..",
    ".jax_cache" if jax.default_backend() == "tpu" else ".jax_cache_cpu",
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
