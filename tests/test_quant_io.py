"""QuantSP bundle persistence (models/quant_io.py): bit-exact roundtrip
and forward equivalence — the deployment artifact must reproduce the
calibrated pipeline exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import (
    ATConfig,
    ImageConfig,
    PipelineConfig,
    SPConfig,
    TVL1Config,
)
from gaze_tpu.models.pipeline import GazePipeline
from gaze_tpu.models.quant import calibrate_pipeline_sp
from gaze_tpu.models.quant_io import load_quant_sp, save_quant_sp

_NARROW = ((8, 8), (8, 8), (16, 16, 16), (16, 16, 16), (32, 32, 32))


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        image=ImageConfig(height=32, width=32, heatmap_sigma=4.0),
        tvl1=TVL1Config(pyramid_levels=2, warps=2, iters=3),
        sp=SPConfig(stages=_NARROW, fused_channels=32,
                    decoder_channels=(16, 16, 8, 8)),
        at=ATConfig(feature_dim=32, hidden_size=32, feature_stride=16,
                    roi_size=1),
    )
    pipeline = GazePipeline(cfg)
    variables = pipeline.init_variables(jax.random.key(0))
    rng = np.random.default_rng(0)
    pairs = [(rng.integers(0, 255, (2, 32, 32, 3), np.uint8),
              rng.integers(0, 255, (2, 32, 32, 3), np.uint8))]
    return cfg, pipeline, variables, pairs


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    key = lambda pa: jax.tree_util.keystr(pa[0])
    for (pa, va), (pb, vb) in zip(sorted(la, key=key), sorted(lb, key=key)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert np.asarray(va).dtype == np.asarray(vb).dtype, pa
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("tail,stem", [(False, False), (True, True)])
def test_roundtrip_bit_exact(setup, tmp_path, tail, stem):
    cfg, pipeline, variables, pairs = setup
    qsp = calibrate_pipeline_sp(
        pipeline, variables, pairs, quant_tail=tail, bf16_stem=stem
    )
    path = str(tmp_path / "bundle.npz")
    save_quant_sp(path, qsp)
    loaded = load_quant_sp(path)
    assert (loaded.tail is None) == (qsp.tail is None)
    assert (loaded.spatial.stem_kernel is None) == (
        qsp.spatial.stem_kernel is None
    )
    _assert_tree_equal(qsp, loaded)
    if tail:
        assert loaded.tail.num_blocks == qsp.tail.num_blocks


def test_loaded_bundle_forward_identical(setup, tmp_path):
    """The serving forward from a loaded bundle is bit-identical to the
    freshly calibrated one."""
    cfg, pipeline, variables, pairs = setup
    qsp = calibrate_pipeline_sp(pipeline, variables, pairs, quant_tail=True)
    path = str(tmp_path / "bundle.npz")
    save_quant_sp(path, qsp)
    loaded = load_quant_sp(path)

    prev = jnp.asarray(pairs[0][0])
    cur = jnp.asarray(pairs[0][1])
    fix = jnp.ones((2,), jnp.float32)

    outs = []
    for q in (qsp, loaded):
        qpipe = dataclasses.replace(pipeline, quant_sp=q)
        state = qpipe.init_state(2)
        _, out = jax.jit(qpipe.step)(variables, state, prev, cur, fix)
        outs.append(jax.device_get(out))
    np.testing.assert_array_equal(outs[0]["heatmap"], outs[1]["heatmap"])
    np.testing.assert_array_equal(outs[0]["gaze"], outs[1]["gaze"])


def test_version_gate(setup, tmp_path):
    cfg, pipeline, variables, pairs = setup
    qsp = calibrate_pipeline_sp(pipeline, variables, pairs)
    path = str(tmp_path / "bundle.npz")
    save_quant_sp(path, qsp)
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    data["meta.version"] = np.int64(99)
    np.savez(path, **data)
    with pytest.raises(ValueError, match="version"):
        load_quant_sp(path)
