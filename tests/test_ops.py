"""Unit tests for the compute ops: warp, TV-L1 flow, heatmaps, image
utilities — the SURVEY.md §4 plan's "TV-L1 kernel vs a trusted CPU
implementation on synthetic translations" etc."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import TVL1Config
from gaze_tpu.ops.heatmap import heatmap_argmax, normalize_map, render_gaussian
from gaze_tpu.ops.image import (
    divergence,
    forward_gradient,
    gaussian_blur,
    median3x3,
)
from gaze_tpu.ops.tvl1 import dequantize_flow, quantize_flow, tvl1_flow
from gaze_tpu.ops.warp import bilinear_sample, warp_backward


def smooth_texture(h, w, seed=0, sigma=2.0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, size=(1, h, w)).astype(np.float32)
    return np.asarray(gaussian_blur(jnp.asarray(img), sigma))


class TestWarp:
    def test_identity(self):
        img = jnp.asarray(smooth_texture(16, 24))
        z = jnp.zeros_like(img)
        out = warp_backward(img, z, z)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_integer_shift(self):
        img = jnp.asarray(smooth_texture(16, 24))
        u1 = jnp.ones_like(img) * 2.0  # sample from x+2
        out = warp_backward(img, u1, jnp.zeros_like(img))
        np.testing.assert_allclose(out[:, :, :-2], img[:, :, 2:], atol=1e-5)

    def test_subpixel_interpolates(self):
        img = jnp.asarray(smooth_texture(16, 24))
        half = warp_backward(img, jnp.full_like(img, 0.5), jnp.zeros_like(img))
        expected = 0.5 * (img[:, :, :-1] + img[:, :, 1:])
        np.testing.assert_allclose(half[:, :, :-1], expected, atol=1e-5)

    def test_border_clamped(self):
        img = jnp.asarray(smooth_texture(8, 8))
        out = bilinear_sample(img, jnp.full_like(img, 100.0), jnp.zeros_like(img))
        np.testing.assert_allclose(out[0, 0], img[0, 0, -1], atol=1e-5)


class TestGradientOperators:
    def test_divergence_is_adjoint_of_gradient(self):
        # <grad u, p> == -<u, div p> (discrete adjointness, Neumann bc)
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.standard_normal((2, 9, 11)).astype(np.float32))
        p1 = jnp.asarray(rng.standard_normal((2, 9, 11)).astype(np.float32))
        p2 = jnp.asarray(rng.standard_normal((2, 9, 11)).astype(np.float32))
        gx, gy = forward_gradient(u)
        lhs = jnp.sum(gx * p1 + gy * p2)
        rhs = -jnp.sum(u * divergence(p1, p2))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_median3x3_matches_numpy(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 7, 7)).astype(np.float32)
        out = np.asarray(median3x3(jnp.asarray(x)))
        pad = np.pad(x[0], 1, mode="edge")
        for i in range(7):
            for j in range(7):
                expected = np.median(pad[i : i + 3, j : j + 3])
                assert abs(out[0, i, j] - expected) < 1e-6


class TestTVL1:
    @pytest.fixture(scope="class")
    def cfg(self):
        return TVL1Config(pyramid_levels=3, warps=3, iters=15)

    def test_recovers_translation(self, cfg):
        tex = smooth_texture(48, 64, seed=3, sigma=3.0)[0]
        dx, dy = 2.0, 1.0
        # i1 shifted by (dx, dy): i1(p) = i0(p - d) -> flow i0->i1 is +d
        ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
        from scipy.ndimage import map_coordinates

        i1 = map_coordinates(tex, [ys - dy, xs - dx], order=1, mode="nearest")
        flow = np.asarray(
            tvl1_flow(jnp.asarray(tex[None]), jnp.asarray(i1[None].astype(np.float32)), cfg)
        )
        interior = flow[0, 8:-8, 8:-8]
        assert abs(np.median(interior[..., 0]) - dx) < 0.4
        assert abs(np.median(interior[..., 1]) - dy) < 0.4

    def test_zero_motion(self, cfg):
        tex = smooth_texture(32, 32, seed=4)[0]
        flow = np.asarray(tvl1_flow(jnp.asarray(tex[None]), jnp.asarray(tex[None]), cfg))
        assert np.abs(flow).max() < 0.2

    def test_batched_independent(self, cfg):
        a = smooth_texture(32, 32, seed=5)
        b = smooth_texture(32, 32, seed=6)
        single = np.asarray(tvl1_flow(jnp.asarray(a), jnp.asarray(a), cfg))
        batched = np.asarray(
            tvl1_flow(
                jnp.concatenate([jnp.asarray(a), jnp.asarray(b)]),
                jnp.concatenate([jnp.asarray(a), jnp.asarray(b)]),
                cfg,
            )
        )
        np.testing.assert_allclose(batched[0], single[0], atol=1e-5)


class TestFlowQuantization:
    def test_roundtrip_within_step(self):
        rng = np.random.default_rng(7)
        flow = rng.uniform(-10, 10, size=(1, 8, 8, 2)).astype(np.float32)
        bound = 15.0
        deq = np.asarray(dequantize_flow(quantize_flow(jnp.asarray(flow), bound), bound))
        step = 2 * bound / 255.0
        assert np.abs(deq - flow).max() <= step / 2 + 1e-5

    def test_clipping(self):
        flow = jnp.full((1, 2, 2, 2), 100.0)
        q = quantize_flow(flow, 15.0)
        assert int(q.max()) == 255


class TestHeatmap:
    def test_peak_at_point(self):
        pts = jnp.asarray([[10.0, 20.0], [5.0, 3.0]])
        hm = render_gaussian(pts, 32, 32, sigma=3.0)
        decoded = np.asarray(heatmap_argmax(hm))
        np.testing.assert_allclose(decoded, np.asarray(pts), atol=0.5)
        assert float(hm.max()) <= 1.0 + 1e-6

    def test_sigma_controls_spread(self):
        pts = jnp.asarray([[16.0, 16.0]])
        narrow = render_gaussian(pts, 32, 32, sigma=2.0)
        wide = render_gaussian(pts, 32, 32, sigma=8.0)
        assert float(narrow.sum()) < float(wide.sum())

    def test_normalize_map(self):
        hm = jnp.asarray(np.random.default_rng(8).uniform(2, 5, size=(2, 8, 8)))
        out = normalize_map(hm)
        np.testing.assert_allclose(np.asarray(out).min(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out).max(axis=(1, 2)), 1.0, atol=1e-4)


class TestTVL1AffineFlow:
    def test_recovers_small_rotation_zoom(self):
        """Affine motion (rotation + zoom) — endpoint error bound in the
        interior, exercising spatially-varying flow through the solver."""
        from scipy.ndimage import map_coordinates

        cfg = TVL1Config(pyramid_levels=3, warps=3, iters=15)
        H, W = 48, 64
        tex = smooth_texture(H, W, seed=11, sigma=3.0)[0]
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        cy, cx = H / 2.0, W / 2.0
        ang, zoom = 0.03, 1.02  # ~1.7 deg rotation, 2% zoom
        # inverse map for i1(p) = i0(A^-1 p)
        xr = (np.cos(ang) * (xs - cx) + np.sin(ang) * (ys - cy)) / zoom + cx
        yr = (-np.sin(ang) * (xs - cx) + np.cos(ang) * (ys - cy)) / zoom + cy
        i1 = map_coordinates(tex, [yr, xr], order=1, mode="nearest")
        # ground-truth forward flow: where each i0 pixel appears in i1
        gt_u = np.stack([xs - xr, ys - yr], -1)  # approx for small motion
        flow = np.asarray(
            tvl1_flow(jnp.asarray(tex[None]), jnp.asarray(i1[None]), cfg)
        )[0]
        epe = np.linalg.norm(flow - gt_u, axis=-1)[10:-10, 10:-10]
        assert np.median(epe) < 0.5, float(np.median(epe))


class TestDenseFlowPreset:
    """The OpenCV-DualTVL1-matched schedule (dense_flow_tvl1_config):
    recovers synthetic translations at least as accurately as the IPOL
    default, on its documented 0.8-scale-step pyramid."""

    def test_preset_values_mirror_opencv_defaults(self):
        from gaze_tpu.core.config import dense_flow_tvl1_config

        c = dense_flow_tvl1_config()
        assert (c.pyramid_factor, c.pyramid_levels, c.warps) == (0.8, 5, 5)
        assert c.iters == 30 and c.median_kernel == 5
        # shared algorithm constants (both follow Zach/Pock/Bischof)
        assert (c.tau, c.lambda_, c.theta) == (0.25, 0.15, 0.3)

    def test_recovers_translation_at_least_as_well_as_ipol(self):
        from scipy.ndimage import map_coordinates

        from gaze_tpu.core.config import dense_flow_tvl1_config

        tex = smooth_texture(48, 64, seed=3, sigma=3.0)[0]
        dx, dy = 2.0, 1.0
        ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
        i1 = map_coordinates(tex, [ys - dy, xs - dx], order=1, mode="nearest")
        args = (jnp.asarray(tex[None]), jnp.asarray(i1[None].astype(np.float32)))

        def err(cfg):
            flow = np.asarray(tvl1_flow(*args, cfg))
            interior = flow[0, 8:-8, 8:-8]
            return abs(np.median(interior[..., 0]) - dx) + abs(
                np.median(interior[..., 1]) - dy
            )

        e_df = err(dense_flow_tvl1_config())
        e_ipol = err(TVL1Config())
        assert e_df < 0.4, e_df
        # 3x the PD work + finer pyramid must not be WORSE (small slack
        # for median-kernel differences on synthetic texture)
        assert e_df <= e_ipol + 0.05, (e_df, e_ipol)

    def test_median5_kernel_is_smoother(self):
        # two chained 3x3 medians remove isolated outliers a single pass
        # leaves in pairs
        from gaze_tpu.ops.image import median3x3

        rng = np.random.default_rng(0)
        u = rng.normal(0, 0.1, (1, 16, 16)).astype(np.float32)
        u[0, 8, 8] = u[0, 8, 9] = 10.0  # outlier PAIR survives one pass
        one = np.asarray(median3x3(jnp.asarray(u)))
        two = np.asarray(median3x3(median3x3(jnp.asarray(u))))
        assert two.max() < one.max()
