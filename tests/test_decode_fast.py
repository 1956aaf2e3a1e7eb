"""Polyphase decoder equivalence: models/decode_fast.py must reproduce
the canonical ConvTranspose tail (SPNet.fuse_decode) on the SAME
variable tree — this is the guard that lets the serving path swap the
4x-MAC-wasting transposed convs for the 2x2 polyphase form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import SPConfig
from gaze_tpu.models.decode_fast import (
    fast_fuse_decode,
    polyphase_kernel,
    upsample2x_block,
)
from gaze_tpu.models.sp import SPNet


def _rand_features(key, b, h, w, c, dtype=jnp.float32):
    return jax.random.normal(key, (b, h, w, c), dtype)


class TestUpsampleBlock:
    @pytest.mark.parametrize("shape", [(2, 7, 7, 8), (1, 14, 14, 16), (3, 5, 9, 4)])
    def test_matches_conv_transpose(self, shape):
        """pad(1)+2x2 conv+offset d2s == ConvTranspose(4,4,s2,SAME),
        including borders and non-square inputs."""
        import flax.linen as nn

        key = jax.random.PRNGKey(0)
        b, h, w, c = shape
        o = 6
        x = _rand_features(key, b, h, w, c)
        mod = nn.ConvTranspose(o, kernel_size=(4, 4), strides=(2, 2),
                               padding="SAME")
        variables = mod.init(jax.random.PRNGKey(1), x)
        ref = mod.apply(variables, x)
        got = upsample2x_block(
            x, variables["params"]["kernel"], variables["params"]["bias"],
            jnp.float32,
        )
        assert got.shape == (b, 2 * h, 2 * w, o)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_polyphase_kernel_layout(self):
        """W[ty,tx,:,p*O:(p+1)*O] == K[2ty+r, 2tx+s] for p = 2r+s."""
        k = jnp.arange(4 * 4 * 3 * 5, dtype=jnp.float32).reshape(4, 4, 3, 5)
        w = polyphase_kernel(k)
        assert w.shape == (2, 2, 3, 20)
        for r in range(2):
            for s in range(2):
                p = 2 * r + s
                for ty in range(2):
                    for tx in range(2):
                        np.testing.assert_array_equal(
                            np.asarray(w[ty, tx, :, p * 5:(p + 1) * 5]),
                            np.asarray(k[2 * ty + r, 2 * tx + s]),
                        )


class TestHalfres:
    def test_even_samples_exact(self):
        """halfres_fuse_decode's even output pixels must equal the
        canonical tail's out[::2, ::2] exactly (the odd ones are
        midpoint-interpolated by design)."""
        from gaze_tpu.models.decode_fast import halfres_fuse_decode

        cfg = SPConfig(decoder_channels=(16, 8), use_batchnorm=True)
        sp = SPNet(cfg)
        kf, kt, ki = jax.random.split(jax.random.PRNGKey(4), 3)
        fs = _rand_features(kf, 2, 8, 8, 12)
        ft = _rand_features(kt, 2, 8, 8, 12)
        variables = sp.init(ki, fs, ft, method=SPNet.fuse_decode)
        ref = sp.apply(variables, fs, ft, method=SPNet.fuse_decode)
        got = halfres_fuse_decode(variables, cfg, fs, ft)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got)[:, ::2, ::2], np.asarray(ref)[:, ::2, ::2],
            atol=1e-5, rtol=1e-5,
        )
        # odd samples: interpolated, bounded by sigmoid range and close
        # to the reference in aggregate
        g, r = np.asarray(got), np.asarray(ref)
        assert g.min() >= 0.0 and g.max() <= 1.0
        assert np.mean(np.abs(g - r)) < 0.05

    def test_upsample_map_geometry(self):
        from gaze_tpu.models.decode_fast import _upsample2x_map

        x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 2, 4))
        y = np.asarray(_upsample2x_map(x))
        assert y.shape == (1, 4, 8)
        np.testing.assert_array_equal(y[:, ::2, ::2], np.asarray(x))
        # odd cols are midpoints; last odd col clamps to the edge value
        assert y[0, 0, 1] == pytest.approx(0.5)
        assert y[0, 0, 7] == pytest.approx(3.0)
        # odd rows are row-midpoints
        assert y[0, 1, 0] == pytest.approx(2.0)

    def test_pipeline_halfres_step_runs(self):
        import dataclasses

        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
        from gaze_tpu.models.pipeline import GazePipeline
        from tests.test_train import tiny_config

        pipe = dataclasses.replace(
            GazePipeline(tiny_config()), decoder_impl="halfres"
        )
        variables = pipe.init_variables(jax.random.PRNGKey(0))
        frames, _, fixsac = generate_sequence(
            SyntheticSpec(num_frames=3, height=32, width=32)
        )
        _, out = pipe.step(
            variables, pipe.init_state(2),
            jnp.asarray(frames[0:2]), jnp.asarray(frames[1:3]),
            jnp.asarray(fixsac[1:3]),
        )
        assert out["heatmap"].shape == (2, 32, 32)
        assert np.isfinite(np.asarray(out["heatmap"])).all()


class TestPipelineDecoderImpl:
    def test_step_matches_deconv_path(self):
        """decoder_impl='pixelshuffle' must reproduce the default step's
        outputs on the same variables (the serving-path swap guard)."""
        import dataclasses

        from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence
        from gaze_tpu.models.pipeline import GazePipeline
        from tests.test_train import tiny_config

        base = GazePipeline(tiny_config())
        variables = base.init_variables(jax.random.PRNGKey(0))
        fast = dataclasses.replace(base, decoder_impl="pixelshuffle")
        frames, _, fixsac = generate_sequence(
            SyntheticSpec(num_frames=3, height=32, width=32)
        )
        prev, cur = jnp.asarray(frames[0:2]), jnp.asarray(frames[1:3])
        fix = jnp.asarray(fixsac[1:3])
        st_a, out_a = base.step(variables, base.init_state(2), prev, cur, fix)
        st_b, out_b = fast.step(variables, fast.init_state(2), prev, cur, fix)
        for k in ("saliency", "attention", "heatmap"):
            np.testing.assert_allclose(
                np.asarray(out_a[k]), np.asarray(out_b[k]),
                atol=1e-5, rtol=1e-5,
            )
        np.testing.assert_array_equal(
            np.asarray(out_a["gaze"]), np.asarray(out_b["gaze"])
        )

    def test_rejects_unknown_impl(self):
        import dataclasses

        from gaze_tpu.models.pipeline import GazePipeline
        from tests.test_train import tiny_config

        with pytest.raises(ValueError, match="decoder_impl"):
            dataclasses.replace(
                GazePipeline(tiny_config()), decoder_impl="nope"
            )


class TestFastFuseDecode:
    @pytest.mark.parametrize("use_bn", [True, False])
    def test_matches_canonical_tail(self, use_bn):
        cfg = SPConfig(decoder_channels=(16, 8), use_batchnorm=use_bn)
        sp = SPNet(cfg)
        key = jax.random.PRNGKey(2)
        kf, kt, ki = jax.random.split(key, 3)
        fs = _rand_features(kf, 2, 8, 8, 12)
        ft = _rand_features(kt, 2, 8, 8, 12)
        # init via fuse_decode so only the tail's params exist
        variables = sp.init(ki, fs, ft, method=SPNet.fuse_decode)
        ref = sp.apply(variables, fs, ft, method=SPNet.fuse_decode)
        got = fast_fuse_decode(variables, cfg, fs, ft)
        assert got.shape == ref.shape == (2, 32, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_nontrivial_batch_stats(self):
        """After BN running stats move off init defaults, the folded fast
        path must still track the canonical inference tail."""
        cfg = SPConfig(decoder_channels=(16, 8), use_batchnorm=True)
        sp = SPNet(cfg)
        kf, kt, ki, kr = jax.random.split(jax.random.PRNGKey(3), 4)
        fs = _rand_features(kf, 2, 8, 8, 12)
        ft = _rand_features(kt, 2, 8, 8, 12)
        variables = sp.init(ki, fs, ft, method=SPNet.fuse_decode)
        # one train-mode application updates the running stats
        _, mut = sp.apply(variables, fs, ft, train=True,
                          method=SPNet.fuse_decode, mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
        ref = sp.apply(variables, fs, ft, method=SPNet.fuse_decode)
        got = fast_fuse_decode(variables, cfg, fs, ft)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
