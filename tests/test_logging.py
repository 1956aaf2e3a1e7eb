"""Logging/observability tests: structured step logs + heatmap PNG dumps
(the reference's loss prints and dumped prediction images, SURVEY.md §5)."""

import io
import json

import numpy as np
import pytest

from gaze_tpu.utils.logging import StepLogger, dump_heatmap_png


class TestStepLogger:
    def test_json_lines_every_n(self):
        buf = io.StringIO()
        logger = StepLogger("sp", every=2, stream=buf)
        for step in range(1, 5):
            logger.log(step, {"loss": 0.5 / step})
        lines = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert [l["step"] for l in lines] == [2, 4]
        assert lines[0]["stage"] == "sp"
        assert "steps_per_sec" in lines[0]

    def test_force(self):
        buf = io.StringIO()
        StepLogger("lf", every=100, stream=buf).log(1, {"loss": 1.0}, force=True)
        assert json.loads(buf.getvalue())["step"] == 1


class TestHeatmapDump:
    def test_writes_png(self, tmp_path):
        from PIL import Image

        hm = np.random.default_rng(0).uniform(0, 1, (32, 32)).astype(np.float32)
        p = str(tmp_path / "out" / "hm.png")
        dump_heatmap_png(p, hm)
        with Image.open(p) as im:
            assert im.size == (32, 32)

    def test_blend_over_frame(self, tmp_path):
        from PIL import Image

        hm = np.zeros((16, 16), np.float32)
        hm[8, 8] = 1.0
        frame = np.full((16, 16, 3), 128, np.uint8)
        p = str(tmp_path / "blend.png")
        dump_heatmap_png(p, hm, frame)
        with Image.open(p) as im:
            arr = np.asarray(im)
        assert arr.shape == (16, 16, 3)
        # the peak pixel must be redder than the background
        assert arr[8, 8, 0] > arr[0, 0, 0]


class TestTensorBoardWriter:
    """Dependency-free TF-events writer (utils/tboard.py): wire-format
    invariants + scalar round-trip through the bundled reader."""

    def test_crc32c_known_vector(self):
        from gaze_tpu.utils.tboard import _crc32c

        # RFC 3720 / iSCSI test vector
        assert _crc32c(b"123456789") == 0xE3069283
        assert _crc32c(b"") == 0

    def test_varint_encoding(self):
        from gaze_tpu.utils.tboard import _varint

        assert _varint(0) == b"\x00"
        assert _varint(127) == b"\x7f"
        assert _varint(300) == b"\xac\x02"  # protobuf docs example

    def test_scalar_roundtrip(self, tmp_path):
        from gaze_tpu.utils.tboard import SummaryWriter, read_scalars

        w = SummaryWriter(str(tmp_path / "run"))
        w.add_scalar("loss", 0.5, step=1)
        w.add_scalar("loss", 0.25, step=2)
        w.add_scalars({"val_aae": 3.5, "val_auc": 0.9}, step=2)
        w.close()
        got = list(read_scalars(w.path))
        assert (1, "loss") == got[0][:2] and abs(got[0][2] - 0.5) < 1e-7
        assert (2, "loss") == got[1][:2] and abs(got[1][2] - 0.25) < 1e-7
        tags = {t for _, t, _ in got}
        assert tags == {"loss", "val_aae", "val_auc"}

    def test_corruption_detected(self, tmp_path):
        from gaze_tpu.utils.tboard import SummaryWriter, read_scalars

        w = SummaryWriter(str(tmp_path / "run"))
        w.add_scalar("x", 1.0, step=5)
        w.close()
        data = bytearray(open(w.path, "rb").read())
        data[-6] ^= 0xFF  # flip a payload byte of the last record
        open(w.path, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="crc"):
            list(read_scalars(w.path))

    def test_steplogger_mirrors_scalars(self, tmp_path):
        import glob
        import io

        from gaze_tpu.utils.logging import StepLogger
        from gaze_tpu.utils.tboard import read_scalars

        lg = StepLogger("sp", every=1, stream=io.StringIO(),
                        tboard_dir=str(tmp_path / "tb"))
        lg.log(1, {"loss": 0.75})
        lg.log(2, {"loss": 0.5}, force=True)
        (path,) = glob.glob(str(tmp_path / "tb" / "sp" / "events.out.*"))
        rows = [(s, t, v) for s, t, v in read_scalars(path) if t == "loss"]
        assert [s for s, _, _ in rows] == [1, 2]
        assert abs(rows[1][2] - 0.5) < 1e-7
