"""Model-layer tests: shapes, fixation pooling semantics, LSTM scan/step
consistency, attention maps, and the torch->flax VGG16 weight converter
checked against a direct torch conv forward (golden-activation check,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaze_tpu.core.config import ATConfig, LFConfig, SPConfig
from gaze_tpu.models.at import LSTMNet, attention_map, fixation_pool
from gaze_tpu.models.lf import LateFusion
from gaze_tpu.models.sp import SPNet
from gaze_tpu.models.vgg import VGG16Features, VGG16_STAGES

RNG = jax.random.key(0)


class TestSPNet:
    @pytest.fixture(scope="class")
    def sp_setup(self):
        cfg = SPConfig()
        sp = SPNet(cfg)
        rgb = jnp.zeros((1, 64, 64, 3))
        flow = jnp.zeros((1, 64, 64, 2))
        variables = sp.init(RNG, rgb, flow)
        return sp, variables

    def test_output_shapes(self, sp_setup):
        sp, variables = sp_setup
        rgb = jnp.zeros((2, 64, 64, 3))
        flow = jnp.zeros((2, 64, 64, 2))
        sal, feat = sp.apply(variables, rgb, flow)
        assert sal.shape == (2, 64, 64)
        assert feat.shape == (2, 4, 4, 512)

    def test_saliency_in_unit_range(self, sp_setup):
        sp, variables = sp_setup
        rgb = jax.random.normal(RNG, (1, 64, 64, 3))
        flow = jax.random.normal(RNG, (1, 64, 64, 2))
        sal, _ = sp.apply(variables, rgb, flow)
        assert float(sal.min()) >= 0.0 and float(sal.max()) <= 1.0

    def test_train_mode_updates_batch_stats(self, sp_setup):
        sp, variables = sp_setup
        rgb = jax.random.normal(RNG, (2, 64, 64, 3))
        flow = jax.random.normal(RNG, (2, 64, 64, 2))
        _, updates = sp.apply(variables, rgb, flow, train=True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestFixationPool:
    def test_pools_correct_region(self):
        cfg = ATConfig(roi_size=1, feature_stride=16)
        feat = jnp.zeros((1, 14, 14, 4))
        feat = feat.at[0, 3, 7, :].set(jnp.asarray([1.0, 2.0, 3.0, 4.0]))
        # pixel (112, 48) -> cell (7, 3)
        w = fixation_pool(feat, jnp.asarray([[112.0, 48.0]]), cfg)
        np.testing.assert_allclose(np.asarray(w[0]), [1, 2, 3, 4], atol=1e-6)

    def test_clamps_at_borders(self):
        cfg = ATConfig(roi_size=3, feature_stride=16)
        feat = jax.random.normal(RNG, (1, 14, 14, 8))
        w = fixation_pool(feat, jnp.asarray([[-50.0, 5000.0]]), cfg)
        assert np.isfinite(np.asarray(w)).all()
        expected = jnp.mean(feat[0, 11:14, 0:3, :], axis=(0, 1))
        np.testing.assert_allclose(np.asarray(w[0]), np.asarray(expected), atol=1e-6)


class TestLSTMNet:
    @pytest.fixture(scope="class")
    def lstm_setup(self):
        cfg = ATConfig(feature_dim=16, hidden_size=16)
        lstm = LSTMNet(cfg)
        variables = lstm.init(RNG, jnp.zeros((1, 2, 16)))
        return cfg, lstm, variables

    def test_scan_matches_steps(self, lstm_setup):
        cfg, lstm, variables = lstm_setup
        ws = jax.random.normal(RNG, (2, 5, 16))
        seq_out = lstm.apply(variables, ws)
        carries = lstm.init_carry(2)
        outs = []
        for t in range(5):
            carries, o = lstm.apply(variables, carries, ws[:, t], method=LSTMNet.step)
            outs.append(o)
        step_out = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(seq_out), np.asarray(step_out), atol=1e-5)

    def test_output_nonnegative(self, lstm_setup):
        _, lstm, variables = lstm_setup
        ws = jax.random.normal(RNG, (2, 4, 16))
        assert float(lstm.apply(variables, ws).min()) >= 0.0

    def test_rollout_chains_across_windows(self, lstm_setup):
        """rollout(carry_k-1, window_k) chained over two windows must
        equal one full-sequence rollout — the TBPTT state-continuity
        contract (train/at.py stateful windowing)."""
        cfg, lstm, variables = lstm_setup
        ws = jax.random.normal(RNG, (2, 6, 16))
        full = lstm.apply(variables, ws)  # zero-carry whole sequence
        carries = lstm.init_carry(2)
        carries, out_a = lstm.apply(
            variables, carries, ws[:, :3], method=LSTMNet.rollout
        )
        _, out_b = lstm.apply(variables, carries, ws[:, 3:], method=LSTMNet.rollout)
        chained = jnp.concatenate([out_a, out_b], axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chained), atol=1e-5)


class TestAttentionMap:
    def test_channel_reweighting(self):
        feat = jnp.zeros((1, 4, 4, 2))
        feat = feat.at[0, 1, 1, 0].set(5.0)
        feat = feat.at[0, 2, 3, 1].set(5.0)
        # weight channel 1 only -> peak must come from cell (2, 3); after
        # 2x bilinear upsampling that cell covers rows 4-5, cols 6-7
        amap = attention_map(feat, jnp.asarray([[0.0, 1.0]]), (8, 8))
        idx = np.unravel_index(np.asarray(amap[0]).argmax(), (8, 8))
        assert 4 <= idx[0] <= 5 and 6 <= idx[1] <= 7

    def test_normalized(self):
        feat = jax.random.normal(RNG, (2, 4, 4, 8))
        w = jax.random.uniform(RNG, (2, 8))
        amap = np.asarray(attention_map(feat, w, (8, 8)))
        assert amap.min() >= -1e-5 and amap.max() <= 1.0 + 1e-5


class TestLateFusion:
    def test_shapes_and_range(self):
        lf = LateFusion(LFConfig())
        x = jax.random.uniform(RNG, (2, 32, 32, 2))
        variables = lf.init(RNG, x)
        out = lf.apply(variables, x)
        assert out.shape == (2, 32, 32)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestWeightConverter:
    def _fake_torch_vgg16_state(self, rng):
        """Random torchvision-shaped VGG16 ``features.*`` state dict."""
        state = {}
        idx_map = {
            0: (64, 3), 2: (64, 64),
            5: (128, 64), 7: (128, 128),
            10: (256, 128), 12: (256, 256), 14: (256, 256),
            17: (512, 256), 19: (512, 512), 21: (512, 512),
            24: (512, 512), 26: (512, 512), 28: (512, 512),
        }
        for i, (o, c) in idx_map.items():
            state[f"features.{i}.weight"] = rng.standard_normal((o, c, 3, 3)).astype(
                np.float32
            ) * 0.05
            state[f"features.{i}.bias"] = rng.standard_normal((o,)).astype(np.float32) * 0.05
        return state

    def test_matches_torch_forward(self):
        """Golden-activation check: flax VGG16 with converted weights must
        match torch's functional conv/pool stack on the same input."""
        import torch
        import torch.nn.functional as F

        from gaze_tpu.models.weights_io import vgg16_params_from_torch

        rng = np.random.default_rng(0)
        state = self._fake_torch_vgg16_state(rng)
        params = vgg16_params_from_torch(state, in_channels=3)

        x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        ours = np.asarray(
            VGG16Features().apply({"params": params}, jnp.asarray(x))
        )

        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        idx_order = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        pool_after = {2, 7, 14, 21}
        h = xt
        for i in idx_order:
            w = torch.from_numpy(state[f"features.{i}.weight"])
            b = torch.from_numpy(state[f"features.{i}.bias"])
            h = F.relu(F.conv2d(h, w, b, padding=1))
            if i in pool_after:
                h = F.max_pool2d(h, 2)
        theirs = np.transpose(h.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)

    def test_cross_modality_first_conv(self):
        from gaze_tpu.models.weights_io import vgg16_params_from_torch

        rng = np.random.default_rng(1)
        state = self._fake_torch_vgg16_state(rng)
        params = vgg16_params_from_torch(state, in_channels=2)
        k = params["conv1_1"]["kernel"]
        assert k.shape == (3, 3, 2, 64)
        # both replicated input channels equal the scaled RGB mean
        np.testing.assert_allclose(k[..., 0, :], k[..., 1, :])

    def test_stage_structure(self):
        total_convs = sum(len(s) for s in VGG16_STAGES)
        assert total_convs == 13


class TestSPWeightImport:
    def test_init_sp_from_torch_checkpoint(self, tmp_path):
        """Full import path: torch .pth on disk -> both SP encoder streams
        loaded (spatial 3ch, temporal 2ch cross-modality), decoder left
        at its random init."""
        import torch

        from gaze_tpu.core.config import SPConfig
        from gaze_tpu.models.weights_io import init_sp_from_torch_vgg16

        rng = np.random.default_rng(3)
        state = {
            k: torch.from_numpy(v)
            for k, v in TestWeightConverter()._fake_torch_vgg16_state(rng).items()
        }
        pth = str(tmp_path / "vgg16.pth")
        torch.save(state, pth)

        sp = SPNet(SPConfig())
        variables = sp.init(
            RNG, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2))
        )
        old_decoder = jax.tree_util.tree_leaves(variables["params"]["decoder"])
        loaded = init_sp_from_torch_vgg16(variables, pth, flow_channels=2)

        # spatial conv1_1 must equal the converted torch kernel
        w_torch = state["features.0.weight"].numpy()
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["spatial"]["conv1_1"]["kernel"]),
            np.transpose(w_torch, (2, 3, 1, 0)),
            atol=1e-6,
        )
        # temporal first conv has 2 input channels
        assert loaded["params"]["temporal"]["conv1_1"]["kernel"].shape[2] == 2
        # decoder untouched
        new_decoder = jax.tree_util.tree_leaves(loaded["params"]["decoder"])
        for a, b in zip(old_decoder, new_decoder):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and the loaded model still runs
        sal, feat = sp.apply(
            loaded, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2))
        )
        assert np.isfinite(np.asarray(sal)).all()
