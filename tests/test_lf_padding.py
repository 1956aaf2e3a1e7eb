"""LF border modes (LFConfig.padding): zero padding can learn a bright
input-independent border pixel that hijacks the heatmap argmax on
weak-response data (measured: the task-cycle corpus's LF argmax sat at
pixel (0,0) every frame with value 0.5245 while the map median was
~0.32 — docs/STATUS.md). Edge (replicate) padding cannot manufacture a
border artifact: for any constant input map the entire output is
constant, borders included."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import LFConfig
from gaze_tpu.models.lf import LateFusion


def _apply(padding, x, seed=0):
    lf = LateFusion(LFConfig(channels=(8, 8), padding=padding))
    v = lf.init(jax.random.key(seed), x)
    return lf, v, np.asarray(lf.apply(v, x))


class TestLFPadding:
    def test_edge_constant_input_gives_constant_output(self):
        x = jnp.full((1, 16, 16, 2), 0.37)
        _, _, out = _apply("edge", x)
        np.testing.assert_allclose(out, out[0, 8, 8], rtol=1e-5)

    def test_zero_constant_input_has_border_deviation(self):
        """The contrast case: zero padding makes border outputs differ
        from the interior on a constant input — that deviation is the
        artifact edge mode removes (random init; any nonzero conv
        weights touching the pad region deviate)."""
        x = jnp.full((1, 16, 16, 2), 0.37)
        _, _, out = _apply("zero", x)
        interior = out[0, 8, 8]
        border = np.concatenate([out[0, 0, :], out[0, -1, :], out[0, :, 0], out[0, :, -1]])
        assert np.max(np.abs(border - interior)) > 1e-4

    def test_same_params_same_interior_behavior(self):
        """Checkpoints are interchangeable between modes: identical
        param shapes, and deep-interior outputs (outside the stacked
        receptive field of the borders) agree exactly."""
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 2), jnp.float32)
        lf_z = LateFusion(LFConfig(channels=(8, 8), padding="zero"))
        v = lf_z.init(jax.random.key(1), x)
        lf_e = LateFusion(LFConfig(channels=(8, 8), padding="edge"))
        out_z = np.asarray(lf_z.apply(v, x))
        out_e = np.asarray(lf_e.apply(v, x))
        # 3 convs of 3x3 -> border influence reaches 3 pixels deep.
        np.testing.assert_allclose(
            out_e[:, 4:-4, 4:-4], out_z[:, 4:-4, 4:-4], atol=1e-6
        )
        assert not np.allclose(out_e, out_z)  # borders differ by design

    def test_unknown_padding_rejected(self):
        x = jnp.zeros((1, 8, 8, 2))
        lf = LateFusion(LFConfig(padding="reflect"))
        with pytest.raises(ValueError, match="padding"):
            lf.init(jax.random.key(0), x)
