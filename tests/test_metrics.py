"""AAE/AUC metric tests against hand-computed cases (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.config import CameraConfig, LossConfig
from gaze_tpu.evaluation.losses import bce, floss, mse
from gaze_tpu.evaluation.metrics import aae, auc_judd, pixel_to_ray
from gaze_tpu.ops.heatmap import render_gaussian


class TestAAE:
    def test_zero_when_correct(self):
        pts = jnp.asarray([[10.0, 12.0]])
        hm = render_gaussian(pts, 32, 32, sigma=2.0)
        err = np.asarray(aae(hm, pts))
        assert err[0] < 1e-3

    def test_known_angle(self):
        cam = CameraConfig(native_width=960, native_height=720, fov_x_deg=74.0)
        H = W = 224
        # GT at center; prediction offset horizontally by native dx pixels.
        f = (960 / 2.0) / np.tan(np.deg2rad(74.0) / 2.0)
        dx_native = f * np.tan(np.deg2rad(5.0))  # 5 degrees
        dx_grid = dx_native * W / 960
        gt = jnp.asarray([[W / 2.0, H / 2.0]])
        pred_pt = jnp.asarray([[W / 2.0 + dx_grid, H / 2.0]])
        hm = render_gaussian(pred_pt, H, W, sigma=1.0)
        err = float(aae(hm, gt, cam)[0])
        # argmax quantizes to the nearest pixel -> allow ~half-pixel slack
        assert abs(err - 5.0) < 0.2

    def test_rays_are_unit(self):
        pts = jnp.asarray([[0.0, 0.0], [223.0, 223.0], [112.0, 112.0]])
        rays = np.asarray(pixel_to_ray(pts, (224, 224), CameraConfig()))
        np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, atol=1e-5)


class TestAUC:
    def test_perfect_prediction(self):
        pts = jnp.asarray([[16.0, 16.0]])
        hm = render_gaussian(pts, 32, 32, sigma=2.0)
        assert float(auc_judd(hm, pts)[0]) > 0.99

    def test_uniform_map_is_half(self):
        hm = jnp.full((1, 32, 32), 0.5)
        pts = jnp.asarray([[10.0, 10.0]])
        np.testing.assert_allclose(float(auc_judd(hm, pts)[0]), 0.5, atol=1e-6)

    def test_anti_prediction_is_low(self):
        pts = jnp.asarray([[4.0, 4.0]])
        wrong = render_gaussian(jnp.asarray([[28.0, 28.0]]), 32, 32, sigma=4.0)
        assert float(auc_judd(wrong, pts)[0]) < 0.6

    def test_hand_computed_tiny(self):
        # 2x2 map [[0.9, 0.1], [0.5, 0.5]], GT at (0,0) value 0.9:
        # below=3, ties=1 -> (3 + 0.5)/4 = 0.875
        hm = jnp.asarray([[[0.9, 0.1], [0.5, 0.5]]])
        pts = jnp.asarray([[0.0, 0.0]])
        np.testing.assert_allclose(float(auc_judd(hm, pts)[0]), 0.875, atol=1e-6)


class TestLosses:
    def test_floss_prefers_correct_heatmap(self):
        pts = jnp.asarray([[16.0, 16.0]])
        target = render_gaussian(pts, 32, 32, sigma=3.0)
        good = jnp.clip(target, 0.01, 0.99)
        bad = jnp.clip(1.0 - target, 0.01, 0.99)
        assert float(floss(good, target)) < float(floss(bad, target))

    def test_floss_gamma_zero_is_bce(self):
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.uniform(0.05, 0.95, size=(1, 8, 8)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, size=(1, 8, 8)).astype(np.float32))
        np.testing.assert_allclose(
            float(floss(p, t, LossConfig(gamma=0.0))), float(bce(p, t)), rtol=1e-5
        )

    def test_focal_downweights_easy(self):
        # An easy background pixel (target 0, pred 0.1) should contribute
        # much less with gamma=2 than gamma=0.
        p = jnp.full((1, 1, 1), 0.1)
        t = jnp.zeros((1, 1, 1))
        assert float(floss(p, t, LossConfig(gamma=2.0))) < 0.05 * float(
            floss(p, t, LossConfig(gamma=0.0))
        )

    def test_mse(self):
        a = jnp.asarray([[1.0, 2.0]])
        b = jnp.asarray([[1.0, 4.0]])
        np.testing.assert_allclose(float(mse(a, b)), 2.0)


class TestCameraPresets:
    def test_gtea_gaze_plus_default(self):
        assert CameraConfig.gtea_gaze_plus() == CameraConfig()

    def test_gtea_gaze_geometry(self):
        cam = CameraConfig.gtea_gaze()
        assert (cam.native_width, cam.native_height) == (640, 480)
        # same pixel offset reads as a larger angle on the narrower camera
        import jax.numpy as jnp
        pts_a = jnp.asarray([[112.0, 112.0]])
        pts_b = jnp.asarray([[122.0, 112.0]])
        hm_b = render_gaussian(pts_b, 224, 224, sigma=1.0)
        e_plus = float(aae(hm_b, pts_a, CameraConfig.gtea_gaze_plus())[0])
        e_gaze = float(aae(hm_b, pts_a, cam)[0])
        assert e_gaze > 0 and e_plus > 0
