"""Interpret-mode exactness of the implicit-im2col int8 conv chain
(ops/pallas/conv_int8.py) against the XLA quant chain it replaces.

These tests are the CI-level guard on the kernel logic (CI has no TPU);
tests/test_tpu_kernels.py re-runs the comparison compiled on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.ops.pallas.conv_int8 import (
    ConvTap,
    conv3x3_int8_chain,
)


def _xla_reference(x, layers):
    """models/quant.py's interior-conv step: pad with the stored-zero
    code, VALID conv, fused requant epilogue (quant.py:199-225)."""
    out = x
    for t in layers:
        k = t.k9.reshape(3, 3, t.k9.shape[1], t.k9.shape[2])
        xp = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=np.int8(-128))
        acc = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * t.a[0] + t.c[0]
        out = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    return out


def _make_layers(rng, chans):
    layers = []
    for ci, co in zip(chans[:-1], chans[1:]):
        layers.append(ConvTap(
            k9=jnp.asarray(rng.integers(-127, 128, (9, ci, co),
                                        dtype=np.int8)),
            a=jnp.asarray(rng.normal(0, 2e-3, (1, co)).astype(np.float32)
                          ** 2 + 1e-4),
            c=jnp.asarray(rng.normal(-20, 40.0, (1, co)).astype(np.float32)),
        ))
    return layers


@pytest.mark.parametrize("B,H,chans", [
    (2, 14, (128, 128)),           # single layer, minimal grid
    (2, 14, (128, 256, 128)),      # chained, channel change
    (4, 28, (128, 128)),           # GB batch-stacking path
    (2, 13, (128, 128)),           # odd W: exercises the wrap columns
])
def test_chain_matches_xla_bitwise(B, H, chans):
    rng = np.random.default_rng(0)
    W = H
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, chans[0]),
                                 dtype=np.int8))
    layers = _make_layers(rng, chans)
    want = np.asarray(jax.jit(lambda x: _xla_reference(x, layers))(x))
    got = np.asarray(conv3x3_int8_chain(x, layers, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_rejects_unaligned_channels():
    rng = np.random.default_rng(0)
    x = jnp.zeros((1, 8, 8, 64), jnp.int8)
    layers = _make_layers(rng, (64, 128))
    with pytest.raises(ValueError, match="multiple of 128"):
        conv3x3_int8_chain(x, layers, interpret=True)
