"""Profiling helper tests (device_time's loop-amortized measurement)."""

import jax.numpy as jnp
import numpy as np

from gaze_tpu.utils.profiling import device_time, trace


class TestDeviceTime:
    def test_measures_positive_time(self):
        x = jnp.ones((256, 256))
        t = device_time(lambda a: a @ a, iters=4, repeats=2, args=(x,))
        assert t >= 0.0
        assert np.isfinite(t)

    def test_scales_with_work(self):
        # Operands via args= (jit parameters): a closed-over constant
        # matmul could be constant-folded at compile time, leaving only
        # dispatch overhead to measure.
        small = jnp.ones((64, 64))
        big = jnp.ones((1024, 1024))
        t_small = device_time(lambda a: a @ a, iters=4, repeats=2,
                              subtract_rtt=False, args=(small,))
        t_big = device_time(lambda a: a @ a, iters=4, repeats=2,
                            subtract_rtt=False, args=(big,))
        assert t_big > t_small


class TestTrace:
    def test_writes_trace_dir(self, tmp_path):
        import os

        d = str(tmp_path / "trace")
        with trace(d):
            x = jnp.ones((32, 32))
            (x + 1).block_until_ready()
        # jax writes plugins/profile/... under the log dir
        found = any("profile" in root for root, _, _ in os.walk(d))
        assert found
