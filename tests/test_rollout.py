"""Sequential rollout evaluation (evaluation/rollout.py): chunk-boundary
exactness and untracked-gaze masking."""

import jax
import numpy as np
import pytest

from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
from gaze_tpu.evaluation.rollout import rollout_eval_arrays
from gaze_tpu.models.pipeline import GazePipeline
from tests.test_train import tiny_config


@pytest.fixture(scope="module")
def rollout_setup():
    cfg = tiny_config()
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    frames, gaze, fixsac = [], [], []
    for i in range(2):
        f, g, fx = generate_sequence(
            SyntheticSpec(num_frames=9, height=32, width=32, seed=10 + i,
                          blob_sigma=3.0)
        )
        frames.append(f)
        gaze.append(g)
        fixsac.append(fx)
    return pipeline, variables, np.stack(frames), np.stack(gaze), np.stack(fixsac)


class TestRolloutArrays:
    def test_chunk_boundaries_are_exact(self, rollout_setup):
        """State threading across chunk boundaries (incl. tail padding)
        must not change any metric: chunk_len 3 == chunk_len 8 == one shot."""
        pipeline, variables, frames, gaze, fixsac = rollout_setup
        outs = [
            rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                chunk_len=c)
            for c in (3, 8, 64)
        ]
        for o in outs[1:]:
            for a, b in zip(outs[0], o):
                np.testing.assert_allclose(a, b, rtol=1e-5)
        # 9 frames -> 8 scored (frame 0 only seeds the flow pair)
        np.testing.assert_array_equal(outs[0][2], [8, 8])

    def test_invalid_frames_cannot_leak(self, rollout_setup):
        """Garbage GT on masked frames must not move the sums."""
        pipeline, variables, frames, gaze, fixsac = rollout_setup
        valid = np.ones(fixsac.shape, np.float32)
        valid[0, 3] = 0.0
        valid[1, 5:7] = 0.0
        clean = rollout_eval_arrays(pipeline, variables, frames, gaze, fixsac,
                                    valid=valid)
        garbage = gaze.copy()
        garbage[0, 3] = [1e6, -1e6]
        garbage[1, 5:7] = np.nan
        dirty = rollout_eval_arrays(pipeline, variables, frames, garbage,
                                    fixsac, valid=valid)
        for a, b in zip(clean, dirty):
            np.testing.assert_allclose(a, b, rtol=1e-6)
        np.testing.assert_array_equal(clean[2], [7, 6])
