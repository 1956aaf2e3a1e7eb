"""Pure-python checks of tools/roofline.py's accounting.

The tool's measured output is TPU-only (hardware cost_analysis +
steady-state timing); what CI can pin is the peak table, generation
detection, and the roofline arithmetic it derives numbers from.
"""

import importlib.util
import os
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "roofline.py")


@pytest.fixture(scope="module")
def roofline():
    spec = importlib.util.spec_from_file_location("roofline_tool", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_peak_table_sane(roofline):
    for gen, peaks in roofline._PEAKS.items():
        assert set(peaks) == {"bf16", "int8", "hbm"}, gen
        assert peaks["int8"] >= peaks["bf16"]  # int8 MXU never slower
        # Ridge points land in the plausible TPU range (tens to ~1k
        # ops/byte) — catches unit slips (GB vs B, TFLOPs vs FLOPs).
        ridge = peaks["bf16"] / peaks["hbm"]
        assert 50 < ridge < 1200, (gen, ridge)


def test_v5e_numbers(roofline):
    # The generation this environment exposes — data-sheet values.
    v5e = roofline._PEAKS["v5e"]
    assert v5e["bf16"] == 197e12
    assert v5e["int8"] == 2 * v5e["bf16"]
    assert v5e["hbm"] == 819e9


def test_tpu_gen_detection(roofline, monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "v6e")
    assert roofline._tpu_gen() == "v6e"
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "nonsense")
    # Unknown generations fall back (possibly via the runtime-env file,
    # which on this host also says v5e) to a key that exists.
    assert roofline._tpu_gen() in roofline._PEAKS


def test_presets_shared_with_bench(roofline, monkeypatch):
    monkeypatch.syspath_prepend(os.path.dirname(_TOOL).rsplit(os.sep, 1)[0])
    import bench

    assert set(bench.PRESETS) == {"turbo", "production", "parity"}
    # The tool analyzes exactly bench.py's driver-facing settings.
    assert bench.PRESETS["turbo"]["quant"] is True
    assert bench.PRESETS["parity"]["dtype"] == "float32"
    assert bench.PRESETS["parity"]["flow_scale"] == 1.0
