"""Checkpoint/resume tests (the reference's torch.save/--pretrained_model
path, SURVEY.md §5) — per-stage Orbax round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.checkpoint import latest_step, restore_checkpoint, save_checkpoint


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {
            "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "step": jnp.asarray(7, jnp.int32),
        }
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, 7, state)
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = restore_checkpoint(d, template)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
        )
        assert int(restored["step"]) == 7
        assert latest_step(d) == 7

    def test_restore_missing_returns_template(self, tmp_path):
        template = {"x": jnp.zeros((2,))}
        out = restore_checkpoint(str(tmp_path / "none"), template)
        np.testing.assert_array_equal(np.asarray(out["x"]), np.zeros((2,)))
        assert latest_step(str(tmp_path / "none")) is None

    def test_keeps_latest(self, tmp_path):
        d = str(tmp_path / "ckpt")
        for s in [1, 2, 3]:
            save_checkpoint(d, s, {"v": jnp.asarray(float(s))})
        assert latest_step(d) == 3
        out = restore_checkpoint(d, {"v": jnp.asarray(0.0)})
        assert float(out["v"]) == 3.0


class TestAsyncCheckpoint:
    def test_async_then_blocking_roundtrip(self, tmp_path):
        from gaze_tpu.core.checkpoint import finalize_checkpoints

        d = str(tmp_path / "ckpt")
        # periodic async saves, then a blocking stage-end save
        for s in (1, 2):
            save_checkpoint(d, s, {"v": jnp.asarray(float(s))}, block=False)
        save_checkpoint(d, 3, {"v": jnp.asarray(3.0)})  # blocking, joins
        out = restore_checkpoint(d, {"v": jnp.asarray(0.0)})
        assert float(out["v"]) == 3.0
        assert latest_step(d) == 3

    def test_finalize_joins_inflight(self, tmp_path):
        from gaze_tpu.core.checkpoint import finalize_checkpoints

        d = str(tmp_path / "ckpt2")
        save_checkpoint(d, 5, {"v": jnp.asarray(5.0)}, block=False)
        finalize_checkpoints()
        assert latest_step(d) == 5


class TestBestCheckpoint:
    """ref:SP.py "saves best checkpoint" (SURVEY.md §2): a worsened final
    epoch must still hand downstream stages the best-validation state."""

    def test_keeps_best_not_latest(self, tmp_path):
        from gaze_tpu.core.checkpoint import (
            best_metric,
            restore_best_or_latest,
            save_best_checkpoint,
        )

        d = str(tmp_path / "sp")
        template = {"v": jnp.asarray(0.0)}
        # epoch 1: AAE 9.0; epoch 2: improves to 3.5; epoch 3: WORSE (7.0)
        assert save_best_checkpoint(d, 1, {"v": jnp.asarray(1.0)}, 9.0)
        assert save_best_checkpoint(d, 2, {"v": jnp.asarray(2.0)}, 3.5)
        assert not save_best_checkpoint(d, 3, {"v": jnp.asarray(3.0)}, 7.0)
        save_checkpoint(d, 3, {"v": jnp.asarray(3.0)})  # latest periodic
        assert best_metric(d) == 3.5
        # downstream restore prefers the best-epoch state...
        best = restore_best_or_latest(d, template)
        assert float(best["v"]) == 2.0
        # ...while plain restore still sees the latest
        latest = restore_checkpoint(d, template)
        assert float(latest["v"]) == 3.0

    def test_falls_back_to_latest_without_best(self, tmp_path):
        from gaze_tpu.core.checkpoint import restore_best_or_latest

        d = str(tmp_path / "sp")
        save_checkpoint(d, 5, {"v": jnp.asarray(5.0)})
        out = restore_best_or_latest(d, {"v": jnp.asarray(0.0)})
        assert float(out["v"]) == 5.0
