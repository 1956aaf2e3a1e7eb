"""flax -> torch export (models/weights_export.py): every exported
module must reproduce its flax forward inside real torch ops — the
reverse of test_models.py's torch->flax golden-activation check, and the
guarantee that checkpoints exported for reference-side validation
actually compute the same function."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from gaze_tpu.core.config import ATConfig, LFConfig, SPConfig  # noqa: E402
from gaze_tpu.models.at import LSTMNet  # noqa: E402
from gaze_tpu.models.lf import LateFusion  # noqa: E402
from gaze_tpu.models.sp import SPNet  # noqa: E402
from gaze_tpu.models.vgg import VGG16_STAGES  # noqa: E402
from gaze_tpu.models.weights_export import (  # noqa: E402
    at_to_torch_state,
    export_pipeline_to_torch,
    lf_to_torch_state,
    sp_to_torch_state,
)


def _t(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def _torch_vgg(sd, prefix, x):
    for si, stage in enumerate(VGG16_STAGES):
        for ci in range(len(stage)):
            w = torch.from_numpy(sd[f"{prefix}.conv{si + 1}_{ci + 1}.weight"])
            b = torch.from_numpy(sd[f"{prefix}.conv{si + 1}_{ci + 1}.bias"])
            x = F.relu(F.conv2d(x, w, b, padding=1))
        if si < len(VGG16_STAGES) - 1:
            x = F.max_pool2d(x, 2, 2)
    return x


class TestSPExport:
    def test_torch_forward_matches(self):
        """Full SP forward (two VGG streams, 1x1 fusion, ConvTranspose+BN
        decoder, sigmoid) rebuilt from the exported state dict in torch
        must match the flax forward."""
        cfg = SPConfig(decoder_channels=(16, 8))  # 32 -> conv5 2x2 -> 8
        sp = SPNet(cfg)
        rng = np.random.default_rng(0)
        rgb = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        flow = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        variables = sp.init(jax.random.key(0), jnp.asarray(rgb), jnp.asarray(flow))
        # Non-trivial batch stats (init vars are mean 0 / var 1).
        variables["batch_stats"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
            ),
            variables["batch_stats"],
        )
        sal, feat = sp.apply(variables, jnp.asarray(rgb), jnp.asarray(flow))

        sd = sp_to_torch_state(variables)
        fs = _torch_vgg(sd, "spatial", _t(rgb))
        ft = _torch_vgg(sd, "temporal", _t(flow))
        x = torch.cat([fs, ft], dim=1)
        x = F.relu(
            F.conv2d(
                x,
                torch.from_numpy(sd["fuse_conv.weight"]),
                torch.from_numpy(sd["fuse_conv.bias"]),
            )
        )
        for i in range(len(cfg.decoder_channels)):
            x = F.conv_transpose2d(
                x,
                torch.from_numpy(sd[f"decoder.deconv{i + 1}.weight"]),
                torch.from_numpy(sd[f"decoder.deconv{i + 1}.bias"]),
                stride=2,
                padding=1,
            )
            x = F.batch_norm(
                x,
                torch.from_numpy(sd[f"decoder.bn{i + 1}.running_mean"]),
                torch.from_numpy(sd[f"decoder.bn{i + 1}.running_var"]),
                torch.from_numpy(sd[f"decoder.bn{i + 1}.weight"]),
                torch.from_numpy(sd[f"decoder.bn{i + 1}.bias"]),
                training=False,
                eps=1e-5,
            )
            x = F.relu(x)
        x = F.conv2d(
            x,
            torch.from_numpy(sd["decoder.out_conv.weight"]),
            torch.from_numpy(sd["decoder.out_conv.bias"]),
        )
        sal_t = torch.sigmoid(x).numpy()[:, 0]

        np.testing.assert_allclose(sal_t, np.asarray(sal), atol=2e-5)
        np.testing.assert_allclose(
            fs.numpy().transpose(0, 2, 3, 1), np.asarray(feat), atol=2e-4
        )


class TestATExport:
    def test_torch_lstm_matches(self):
        """torch.nn.LSTM + Linear head with exported weights must match
        LSTMNet's sequence forward (incl. multi-layer stacking)."""
        cfg = ATConfig(feature_dim=12, hidden_size=10, num_layers=2)
        net = LSTMNet(cfg)
        rng = np.random.default_rng(1)
        ws = rng.normal(size=(3, 5, 12)).astype(np.float32)
        variables = net.init(jax.random.key(1), jnp.asarray(ws))
        pred = np.asarray(net.apply(variables, jnp.asarray(ws)))

        sd = at_to_torch_state(variables)
        lstm = torch.nn.LSTM(12, 10, num_layers=2, batch_first=True)
        lstm.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items() if "head" not in k}
        )
        with torch.no_grad():
            h, _ = lstm(torch.from_numpy(ws))
            out = F.relu(
                F.linear(
                    h,
                    torch.from_numpy(sd["head.weight"]),
                    torch.from_numpy(sd["head.bias"]),
                )
            )
        np.testing.assert_allclose(out.numpy(), pred, atol=1e-5)


class TestLFExport:
    def test_torch_conv_stack_matches(self):
        cfg = LFConfig(channels=(8, 4))
        lf = LateFusion(cfg)
        rng = np.random.default_rng(2)
        maps = rng.uniform(0, 1, size=(2, 16, 16, 2)).astype(np.float32)
        variables = lf.init(jax.random.key(2), jnp.asarray(maps))
        out = np.asarray(lf.apply(variables, jnp.asarray(maps)))

        sd = lf_to_torch_state(variables)
        x = _t(maps)
        for i in range(len(cfg.channels)):
            x = F.relu(
                F.conv2d(
                    x,
                    torch.from_numpy(sd[f"conv{i + 1}.weight"]),
                    torch.from_numpy(sd[f"conv{i + 1}.bias"]),
                    padding=1,
                )
            )
        x = F.conv2d(
            x,
            torch.from_numpy(sd["out_conv.weight"]),
            torch.from_numpy(sd["out_conv.bias"]),
            padding=1,
        )
        np.testing.assert_allclose(
            torch.sigmoid(x).numpy()[:, 0], out, atol=1e-6
        )


class TestBundleExport:
    def test_roundtrip_file(self, tmp_path):
        """export_pipeline_to_torch writes a torch.load-able bundle with
        all three stages."""
        from gaze_tpu.core.config import PipelineConfig, ImageConfig, TVL1Config
        from gaze_tpu.models.pipeline import GazePipeline
        import dataclasses

        cfg = PipelineConfig(
            image=ImageConfig(height=32, width=32),
            sp=SPConfig(decoder_channels=(8, 4)),
            at=ATConfig(feature_dim=512, hidden_size=8, num_layers=1),
            lf=LFConfig(channels=(4,)),
        )
        pipeline = GazePipeline(cfg)
        variables = pipeline.init_variables(jax.random.key(0))
        path = str(tmp_path / "export.pth")
        export_pipeline_to_torch(variables, path)
        loaded = torch.load(path, weights_only=False)
        assert set(loaded) == {"sp", "at", "lf"}
        assert "spatial.conv1_1.weight" in loaded["sp"]
        assert loaded["sp"]["spatial.conv1_1.weight"].shape == (64, 3, 3, 3)
        assert "weight_ih_l0" in loaded["at"]
