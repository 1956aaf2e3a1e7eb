"""Fused PD-loop kernel vs the reference lax.scan solver body
(interpret mode — logic equivalence; the compiled path runs in bench)."""

import numpy as np

import jax
import jax.numpy as jnp

from gaze_tpu.core.config import TVL1Config
from gaze_tpu.ops.image import central_gradient, divergence, forward_gradient
from gaze_tpu.ops.pallas.tvl1_pd import pd_iterations


def scan_reference(u1, u2, p11, p12, p21, p22, i1wx, i1wy, grad, rho_c, cfg):
    lt = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta

    def body(carry, _):
        u1, u2, p11, p12, p21, p22 = carry
        rho = rho_c + i1wx * u1 + i1wy * u2
        mask_neg = rho < -lt * grad
        mask_pos = rho > lt * grad
        d1 = jnp.where(
            mask_neg, lt * i1wx,
            jnp.where(mask_pos, -lt * i1wx, -rho * i1wx / (grad + 1e-9)),
        )
        d2 = jnp.where(
            mask_neg, lt * i1wy,
            jnp.where(mask_pos, -lt * i1wy, -rho * i1wy / (grad + 1e-9)),
        )
        u1n = u1 + d1 + cfg.theta * divergence(p11, p12)
        u2n = u2 + d2 + cfg.theta * divergence(p21, p22)
        g1x, g1y = forward_gradient(u1n)
        g2x, g2y = forward_gradient(u2n)
        ng1 = 1.0 + taut * jnp.sqrt(g1x**2 + g1y**2)
        ng2 = 1.0 + taut * jnp.sqrt(g2x**2 + g2y**2)
        return (
            u1n, u2n,
            (p11 + taut * g1x) / ng1, (p12 + taut * g1y) / ng1,
            (p21 + taut * g2x) / ng2, (p22 + taut * g2y) / ng2,
        ), None

    carry, _ = jax.lax.scan(
        body, (u1, u2, p11, p12, p21, p22), None, length=cfg.iters
    )
    return carry


def test_matches_scan_solver():
    cfg = TVL1Config(iters=7)
    B, H, W = 2, 24, 40  # ragged vs the (8, 128) canvas on purpose
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    i0 = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    i1x, i1y = central_gradient(i1)
    grad = i1x**2 + i1y**2
    rho_c = i1 - i0
    z = jnp.zeros((B, H, W), jnp.float32)
    u1 = jnp.asarray(rng.uniform(-1, 1, (B, H, W)).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(-1, 1, (B, H, W)).astype(np.float32))

    ref = scan_reference(u1, u2, z, z, z, z, i1x, i1y, grad, rho_c, cfg)
    out = pd_iterations(
        u1, u2, z, z, z, z, i1x, i1y, grad, rho_c,
        iters=cfg.iters, tau=cfg.tau, lambda_=cfg.lambda_, theta=cfg.theta,
        interpret=True,
    )
    names = ["u1", "u2", "p11", "p12", "p21", "p22"]
    for n, a, b in zip(names, out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=n
        )


def test_nonzero_initial_duals():
    """p-carry across warps: the kernel must accept a warm dual state
    whose real border column/row is zero (the solver invariant)."""
    cfg = TVL1Config(iters=3)
    B, H, W = 1, 16, 128
    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    i0 = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    i1x, i1y = central_gradient(i1)
    grad = i1x**2 + i1y**2
    rho_c = i1 - i0
    u1 = jnp.zeros((B, H, W))
    u2 = jnp.zeros((B, H, W))

    def mkp(seed, zero_last_col=False, zero_last_row=False):
        p = rng.uniform(-0.5, 0.5, (B, H, W)).astype(np.float32)
        if zero_last_col:
            p[:, :, -1] = 0
        if zero_last_row:
            p[:, -1, :] = 0
        return jnp.asarray(p)

    # The solver invariant: x-duals (p*1) have a zero last column, y-duals
    # (p*2) a zero last row (forward differences vanish at the border).
    p11 = mkp(1, zero_last_col=True)
    p12 = mkp(2, zero_last_row=True)
    p21 = mkp(3, zero_last_col=True)
    p22 = mkp(4, zero_last_row=True)

    ref = scan_reference(u1, u2, p11, p12, p21, p22, i1x, i1y, grad, rho_c, cfg)
    out = pd_iterations(
        u1, u2, p11, p12, p21, p22, i1x, i1y, grad, rho_c,
        iters=cfg.iters, tau=cfg.tau, lambda_=cfg.lambda_, theta=cfg.theta,
        interpret=True,
    )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
