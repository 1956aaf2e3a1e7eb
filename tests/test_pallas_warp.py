"""Block-anchored Pallas warp kernel tests (interpret mode on CPU).

The compiled path is exercised on real TPU by the benchmark; these tests
pin the kernel's *logic* against the gather-based reference warp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaze_tpu.ops.pallas.warp import MAX_DISP, warp_fields
from gaze_tpu.ops.warp import warp_backward


def smooth_flow(B, H, W, scale=4.0, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    u1 = (scale * np.sin(xx / 17.0 + rng.uniform(0, 3))).astype(np.float32)
    u2 = (scale * np.cos(yy / 11.0 + rng.uniform(0, 3))).astype(np.float32)
    return (
        jnp.asarray(np.broadcast_to(u1, (B, H, W)).copy()),
        jnp.asarray(np.broadcast_to(u2, (B, H, W)).copy()),
    )


@pytest.mark.parametrize("shape", [(2, 32, 64), (1, 14, 14), (2, 48, 224)])
def test_matches_gather_warp(shape):
    B, H, W = shape
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    u1, u2 = smooth_flow(B, H, W)
    out = warp_fields((img,), u1, u2, interpret=True)[0]
    ref = warp_backward(img, u1, u2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_multi_field_shares_weights():
    B, H, W = 2, 32, 64
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    u1, u2 = smooth_flow(B, H, W, seed=3)
    outs = warp_fields((a, b, c), u1, u2, interpret=True)
    for f, ref in zip(outs, (a, b, c)):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(warp_backward(ref, u1, u2)), atol=1e-5
        )


def test_large_flow_clamps_to_max_disp():
    """|u| > MAX_DISP saturates — equivalent to warping with clipped flow
    (the dense_flow 8-bit quantization bound saturates there anyway)."""
    B, H, W = 1, 32, 64
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    u1 = jnp.full((B, H, W), 40.0)
    u2 = jnp.full((B, H, W), -40.0)
    out = warp_fields((img,), u1, u2, interpret=True)[0]
    ref = warp_backward(
        img, jnp.clip(u1, -MAX_DISP, MAX_DISP), jnp.clip(u2, -MAX_DISP, MAX_DISP)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_zero_flow_is_identity():
    B, H, W = 2, 16, 128
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    z = jnp.zeros((B, H, W))
    out = warp_fields((img,), z, z, interpret=True)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_motion_boundary_residual_clamp():
    """Flow with a sharp discontinuity inside one tile: pixels whose flow
    deviates from the tile anchor by more than the residual bound warp
    with a clamped displacement — outputs stay finite and the smooth
    region is still exact."""
    B, H, W = 1, 16, 256
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    u1 = np.zeros((B, H, W), np.float32)
    u1[:, :, 128:] = 14.0  # jump exactly at the (8,128) tile boundary
    u1 = jnp.asarray(u1)
    z = jnp.zeros((B, H, W))
    out = warp_fields((img,), u1, z, interpret=True)[0]
    assert np.isfinite(np.asarray(out)).all()
    # each tile's flow is uniform, so both sides must be exact (the
    # clamped-approximation case is a jump *inside* one tile, where the
    # residual bound bites — that case only guarantees finiteness)
    ref = warp_backward(img, u1, z)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :120], np.asarray(ref)[:, :, :120], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 136:], np.asarray(ref)[:, :, 136:], atol=1e-5
    )
