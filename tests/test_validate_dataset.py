"""Dataset preflight tool (tools/validate_dataset.py) against a fake
GTEA layout — the check that must run first when real data appears."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "validate_dataset.py")
    spec = importlib.util.spec_from_file_location("validate_dataset", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def fake_root(tmp_path):
    from PIL import Image

    root = tmp_path / "gtea"
    rng = np.random.default_rng(0)
    for video in ["Alice_Pizza", "Bob_Burger"]:
        vdir = root / "images" / video
        vdir.mkdir(parents=True)
        for i in range(6):
            img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
            Image.fromarray(img).save(vdir / f"{i:06d}.jpg")
        (root / "gaze").mkdir(exist_ok=True)
        with open(root / "gaze" / f"{video}.txt", "w") as f:
            for i in range(6):
                # one untracked sentinel row in Bob's video
                f.write("0 0\n" if video == "Bob_Burger" and i == 3
                        else f"{10 + i} {12 + i}\n")
        (root / "fixsac").mkdir(exist_ok=True)
        with open(root / "fixsac" / f"{video}.txt", "w") as f:
            f.write("1\n1\n0\n1\n1\n1\n")
    return str(root)


def _run(mod, argv, capsys):
    old = sys.argv
    sys.argv = ["validate_dataset.py"] + argv
    try:
        code = mod.main()
    finally:
        sys.argv = old
    return code, json.loads(capsys.readouterr().out)


class TestValidateDataset:
    def test_reports_layout(self, fake_root, capsys):
        mod = _load_tool()
        code, rep = _run(mod, [fake_root], capsys)
        assert rep["ok"] is True
        assert rep["subjects"] == ["Alice", "Bob"]
        assert rep["totals"]["frames"] == 12
        assert rep["videos"]["Bob_Burger"]["gaze_valid_pct"] < 100.0
        assert rep["videos"]["Alice_Pizza"]["fixsac_source"] == "txt"
        # 24x32 frames != gtea_plus native 720x960 -> resolution warning
        assert code == 2
        assert any("resolution" in w for w in rep["warnings"])

    def test_missing_layout(self, tmp_path, capsys):
        mod = _load_tool()
        code, rep = _run(mod, [str(tmp_path / "nope")], capsys)
        assert code == 1 and rep["ok"] is False

    def test_pipeline_check(self, fake_root, capsys):
        mod = _load_tool()
        code, rep = _run(mod, [fake_root, "--pipeline_check",
                               "--batch_size", "2", "--image_size", "32"],
                         capsys)
        pc = rep["pipeline_check"]
        assert pc["finite"] is True
        assert pc["used_precomputed_flow"] is False
        assert pc["heatmap_shape"][0] == 2
