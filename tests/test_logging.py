"""Logging/observability tests: structured step logs + heatmap PNG dumps
(the reference's loss prints and dumped prediction images, SURVEY.md §5)."""

import io
import json

import numpy as np

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
