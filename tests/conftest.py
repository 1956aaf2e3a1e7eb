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

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from gaze_tpu.testenv import needs_cpu_reexec, sanitized_cpu_env  # noqa: E402

if os.environ.get("GAZE_TPU_HW_TESTS") != "1" and needs_cpu_reexec():
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        sanitized_cpu_env(),
    )

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
