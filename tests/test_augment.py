"""On-device horizontal-flip augmentation (data/augment.py): label
consistency is the whole game — the gaze mirror must match the frame
mirror exactly, and the flow-image x negation must be exact through the
temporal normalization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.config import default_config
from gaze_tpu.data.augment import apply_hflip, with_flip_mask
from gaze_tpu.ops.heatmap import render_gaussian
from gaze_tpu.ops.preprocess import normalize_flow_image, to_float


def _batch(b=4, h=16, w=24, seed=0, flow_img=False):
    r = np.random.RandomState(seed)
    out = {
        "prev": jnp.asarray(r.randint(0, 255, (b, h, w, 3), np.uint8)),
        "cur": jnp.asarray(r.randint(0, 255, (b, h, w, 3), np.uint8)),
        "gaze": jnp.asarray(r.uniform(0, w - 1, (b, 2)).astype(np.float32)),
    }
    if flow_img:
        out["flow_img"] = jnp.asarray(r.randint(0, 255, (b, h, w, 2), np.uint8))
    return out


class TestApplyHFlip:
    def test_involution(self):
        """Applying the same mask twice restores every leaf exactly."""
        batch = dict(_batch(flow_img=True), _flip=jnp.asarray([1.0, 0.0, 1.0, 1.0]))
        twice = apply_hflip(apply_hflip(batch, 24), 24)
        for k in ("prev", "cur", "gaze", "flow_img"):
            np.testing.assert_array_equal(np.asarray(twice[k]), np.asarray(batch[k]), k)

    def test_unflipped_rows_untouched(self):
        batch = dict(_batch(flow_img=True), _flip=jnp.asarray([0.0, 1.0, 0.0, 0.0]))
        out = apply_hflip(batch, 24)
        for k in ("prev", "cur", "gaze", "flow_img"):
            np.testing.assert_array_equal(
                np.asarray(out[k])[0], np.asarray(batch[k])[0], k
            )
        assert not np.array_equal(np.asarray(out["cur"])[1], np.asarray(batch["cur"])[1])

    def test_gaze_mirror_matches_frame_mirror(self):
        """render(flipped gaze) == flip(render(gaze)) — the Gaussian
        target is exactly the mirrored target."""
        b, h, w = 3, 16, 24
        batch = dict(_batch(b, h, w), _flip=jnp.ones((b,)))
        out = apply_hflip(batch, w)
        hm = np.asarray(render_gaussian(batch["gaze"], h, w, 3.0))
        hm_f = np.asarray(render_gaussian(out["gaze"], h, w, 3.0))
        np.testing.assert_allclose(hm_f, hm[:, :, ::-1], atol=1e-6)

    def test_flow_image_negation_exact_through_normalization(self):
        """normalize(flipped flow img).x == -flip(normalize(img).x) and
        .y == flip(.y) — the 0.5 zero-motion code is the symmetry
        center, so 255-v negates exactly."""
        batch = dict(_batch(flow_img=True), _flip=jnp.ones((4,)))
        out = apply_hflip(batch, 24)
        norm = np.asarray(normalize_flow_image(to_float(batch["flow_img"])))
        norm_f = np.asarray(normalize_flow_image(to_float(out["flow_img"])))
        np.testing.assert_allclose(norm_f[..., 0], -norm[:, :, ::-1, 0], atol=1e-6)
        np.testing.assert_allclose(norm_f[..., 1], norm[:, :, ::-1, 1], atol=1e-6)

    def test_mask_deterministic_in_seed_and_step(self):
        b = _batch()
        m1 = with_flip_mask(b, seed=3, step=jnp.asarray(7))["_flip"]
        m2 = with_flip_mask(b, seed=3, step=jnp.asarray(7))["_flip"]
        m3 = with_flip_mask(b, seed=3, step=jnp.asarray(8))["_flip"]
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        assert set(np.asarray(m1).tolist()) <= {0.0, 1.0}
        # different steps eventually differ (not a hard guarantee per
        # step, so draw a few)
        diffs = [
            not np.array_equal(
                np.asarray(with_flip_mask(b, 3, jnp.asarray(s))["_flip"]),
                np.asarray(m1),
            )
            for s in range(8, 20)
        ]
        assert any(diffs)


class TestTrainStepWithFlip:
    def test_sp_step_runs_and_is_deterministic(self):
        from gaze_tpu.models.pipeline import GazePipeline
        from gaze_tpu.train.sp import create_sp_state, make_sp_train_step

        base = default_config()
        cfg = dataclasses.replace(
            base,
            image=dataclasses.replace(base.image, height=32, width=32),
            tvl1=dataclasses.replace(base.tvl1, pyramid_levels=2, warps=2, iters=4),
            train=dataclasses.replace(base.train, augment_flip=True),
        )
        p = GazePipeline(cfg)
        r = np.random.RandomState(0)
        batch = {
            "prev": jnp.asarray(r.randint(0, 255, (8, 32, 32, 3), np.uint8)),
            "cur": jnp.asarray(r.randint(0, 255, (8, 32, 32, 3), np.uint8)),
            "gaze": jnp.asarray(r.uniform(4, 28, (8, 2)).astype(np.float32)),
        }
        step = make_sp_train_step(p)
        s0 = create_sp_state(jax.random.key(0), p)
        _, m1 = step(s0, batch)
        s0b = create_sp_state(jax.random.key(0), p)
        _, m2 = step(s0b, batch)
        assert float(m1["loss"]) == float(m2["loss"])  # (seed, step)-keyed
        assert np.isfinite(float(m1["loss"]))
