"""Golden-file parity infrastructure tests + a pinned-output regression
check of the full fused step on the float32 parity path."""

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.evaluation.goldens import (
    compare_goldens,
    load_goldens,
    pipeline_module_outputs,
    save_goldens,
)
from gaze_tpu.models.pipeline import GazePipeline
from tests.test_train import tiny_config


class TestGoldenIO:
    def test_roundtrip(self, tmp_path):
        t = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(4)}
        p = str(tmp_path / "g.npz")
        save_goldens(p, t)
        loaded = load_goldens(p)
        ok, report = compare_goldens(t, loaded)
        assert ok and max(report.values()) == 0.0

    def test_detects_mismatch(self):
        a = {"x": np.zeros(3)}
        g = {"x": np.full(3, 0.5)}
        ok, report = compare_goldens(a, g)
        assert not ok and abs(report["x"] - 0.5) < 1e-12

    def test_detects_missing_key(self):
        ok, report = compare_goldens({"x": np.zeros(2)}, {})
        assert not ok and report["x"] == float("inf")

    def test_detects_shape_mismatch(self):
        ok, _ = compare_goldens({"x": np.zeros(2)}, {"x": np.zeros(3)})
        assert not ok


class TestModuleBoundaryDump:
    def test_all_boundaries_present_and_reproducible(self, tmp_path):
        pipeline = GazePipeline(tiny_config())  # float32 parity dtype
        variables = pipeline.init_variables(jax.random.key(0))
        state = pipeline.init_state(2)
        rng = np.random.default_rng(0)
        prev = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
        cur = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
        fix = jnp.ones((2,))

        out1 = pipeline_module_outputs(pipeline, variables, state, prev, cur, fix)
        expected_keys = {
            "rgb_in", "flow_in", "sp_saliency", "sp_conv5",
            "at_weights", "at_attention", "lf_heatmap", "gaze_xy",
        }
        assert set(out1) == expected_keys

        p = str(tmp_path / "goldens.npz")
        save_goldens(p, {k: np.asarray(v) for k, v in out1.items()})
        out2 = pipeline_module_outputs(pipeline, variables, state, prev, cur, fix)
        ok, report = compare_goldens(
            {k: np.asarray(v) for k, v in out2.items()}, load_goldens(p)
        )
        assert ok, f"parity path not deterministic: {report}"
