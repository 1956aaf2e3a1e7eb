"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in this environment; sharding
logic is validated the JAX-supported way — 8 virtual CPU devices via
XLA_FLAGS (SURVEY.md §4 "Distributed tests without a cluster"). Must run
before the first jax import, hence module scope in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

# XLA compiles are pathologically slow in this environment (~5-9s wall per
# executable, even trivial ones); the persistent cache makes re-runs cheap.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
