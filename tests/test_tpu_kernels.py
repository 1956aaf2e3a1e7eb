"""On-hardware Mosaic-compiled kernel equivalence (VERDICT r1 weak #2).

The interpret-mode tests (test_pallas_*.py) pin the kernels' *logic*;
this module runs the same equivalences through the REAL Mosaic compile
path on a TPU, catching the alignment/layout bug class that interpret
mode cannot see. CPU CI auto-skips it.

Run on the TPU host:

    GAZE_TPU_HW_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

(GAZE_TPU_HW_TESTS=1 stops gaze_tpu.testenv's CPU re-exec, keeping the
axon TPU backend; see the verify skill for the full recipe.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="compiled-kernel equivalence needs TPU hardware",
    ),
]


def _smooth_flow(B, H, W, scale=4.0, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    u1 = (scale * np.sin(xx / 17.0 + rng.uniform(0, 3))).astype(np.float32)
    u2 = (scale * np.cos(yy / 11.0 + rng.uniform(0, 3))).astype(np.float32)
    return (
        jnp.asarray(np.broadcast_to(u1, (B, H, W)).copy()),
        jnp.asarray(np.broadcast_to(u2, (B, H, W)).copy()),
    )


class TestCompiledWarp:
    @pytest.mark.parametrize("shape", [(2, 224, 224), (1, 48, 200)])
    def test_compiled_matches_gather_warp(self, shape):
        """Mosaic-compiled warp_fields vs the XLA gather warp on
        TV-smooth flow, at the production 224^2 and one ragged shape."""
        from gaze_tpu.ops.pallas.warp import warp_fields
        from gaze_tpu.ops.warp import warp_backward

        B, H, W = shape
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        u1, u2 = _smooth_flow(B, H, W)
        out = np.asarray(warp_fields((img,), u1, u2)[0])  # compiled
        ref = np.asarray(warp_backward(img, u1, u2))
        # 2e-5: Mosaic's fused-MAC ordering differs from XLA's by ~1 ulp
        # on the bilinear blend (measured max 1.06e-5 over 100k px).
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_compiled_multi_field(self):
        from gaze_tpu.ops.pallas.warp import warp_fields
        from gaze_tpu.ops.warp import warp_backward

        B, H, W = 2, 224, 224
        rng = np.random.default_rng(2)
        fields = tuple(
            jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
            for _ in range(3)
        )
        u1, u2 = _smooth_flow(B, H, W, seed=3)
        outs = warp_fields(fields, u1, u2)
        for f, ref in zip(outs, fields):
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(warp_backward(ref, u1, u2)), atol=2e-5
            )


class TestCompiledPD:
    @pytest.mark.parametrize("shape", [(2, 224, 224), (1, 24, 40)])
    def test_compiled_matches_scan_solver(self, shape):
        """Mosaic-compiled pd_iterations vs the lax.scan solver body."""
        from gaze_tpu.core.config import TVL1Config
        from gaze_tpu.ops.image import central_gradient
        from gaze_tpu.ops.pallas.tvl1_pd import pd_iterations
        from tests.test_pallas_pd import scan_reference

        cfg = TVL1Config(iters=7)
        B, H, W = shape
        rng = np.random.default_rng(0)
        i1 = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
        i0 = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
        i1x, i1y = central_gradient(i1)
        grad = i1x**2 + i1y**2
        rho_c = i1 - i0
        z = jnp.zeros(shape, jnp.float32)
        u1 = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        u2 = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

        ref = scan_reference(u1, u2, z, z, z, z, i1x, i1y, grad, rho_c, cfg)
        out = pd_iterations(
            u1, u2, z, z, z, z, i1x, i1y, grad, rho_c,
            iters=cfg.iters, tau=cfg.tau, lambda_=cfg.lambda_, theta=cfg.theta,
        )
        for n, a, b in zip(["u1", "u2", "p11", "p12", "p21", "p22"], out, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, err_msg=n
            )


class TestCompiledEndToEnd:
    def test_tvl1_pallas_vs_xla_path(self):
        """Full TV-L1 solve: the Pallas-kernel production path vs the
        pure-XLA path on the same frames must agree to solver tolerance
        (both are the same math; only the kernels differ)."""
        import dataclasses

        from gaze_tpu.core.config import TVL1Config
        from gaze_tpu.ops.tvl1 import tvl1_flow

        rng = np.random.default_rng(4)
        base = rng.uniform(0, 1, (2, 224, 224)).astype(np.float32)
        shifted = np.roll(base, shift=(2, -3), axis=(1, 2))
        i0, i1 = jnp.asarray(base), jnp.asarray(shifted)
        cfg_pallas = TVL1Config(use_pallas_warp=True, use_pallas_pd=True)
        cfg_xla = dataclasses.replace(
            cfg_pallas, use_pallas_warp=False, use_pallas_pd=False
        )
        f_pallas = np.asarray(jax.jit(tvl1_flow, static_argnums=2)(i0, i1, cfg_pallas))
        f_xla = np.asarray(jax.jit(tvl1_flow, static_argnums=2)(i0, i1, cfg_xla))
        # interior agreement (borders differ by the warp's edge handling)
        diff = np.abs(f_pallas - f_xla)[:, 8:-8, 8:-8]
        assert np.median(diff) < 0.05, float(np.median(diff))
        assert np.mean(diff) < 0.2, float(np.mean(diff))


class TestCompiledConvInt8:
    def test_quant_stream_pallas_vs_xla_bitwise(self):
        """The implicit-im2col int8 conv chain (ops/pallas/conv_int8.py)
        must be BIT-identical to the XLA quant chain when compiled on
        hardware: integer conv accumulation is exact and the f32 requant
        epilogue is the same expression, so any deviation is a real
        kernel bug (alignment, mask, guard geometry)."""
        from gaze_tpu.models.quant import (
            build_quant_vgg,
            calibrate_vgg,
            quant_vgg_forward,
        )
        from gaze_tpu.models.vgg import VGG16Features

        rng = np.random.default_rng(0)
        x = rng.normal(0.0, 1.0, (4, 64, 64, 3)).astype(np.float32)
        params = VGG16Features().init(
            jax.random.key(0), jnp.asarray(x))["params"]
        for stem in (False, True):
            q = build_quant_vgg(params, calibrate_vgg(params, [x]),
                                bf16_stem=stem)
            f_xla = jax.jit(lambda v: quant_vgg_forward(q, v, "xla"))
            f_pal = jax.jit(lambda v: quant_vgg_forward(q, v, "pallas"))
            np.testing.assert_array_equal(
                np.asarray(f_xla(jnp.asarray(x))),
                np.asarray(f_pal(jnp.asarray(x))),
                err_msg=f"bf16_stem={stem}",
            )
