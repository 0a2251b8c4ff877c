"""The SVG accuracy-plot writer (tools/accuracy_plots.py) — parity
surface for the reference's plot harness (examples/accuracy.rs). Pure
file generation, no Ray."""

from __future__ import annotations

import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "accuracy_plots", os.path.join(REPO, "tools", "accuracy_plots.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["accuracy_plots"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_plots_generate_and_are_well_formed(tmp_path):
    mod = _load()
    mod.OUT_DIR = str(tmp_path)
    mod.main()
    svgs = sorted(os.listdir(tmp_path))
    # 7 distributions x 2 metrics + 1 memory chart
    assert len(svgs) == 15
    assert "acc_vs_memory.svg" in svgs
    for name in svgs:
        s = (tmp_path / name).read_text()
        assert s.startswith("<svg") and s.rstrip().endswith("</svg>")
        assert "NaN" not in s
        coords = [
            float(x)
            for x in re.findall(r'(?:x|y|cx|cy|x1|y1|x2|y2)="(-?\d+\.?\d*)"', s)
        ]
        assert coords and all(-5 <= c <= 900 for c in coords), name
        if name != "acc_vs_memory.svg":
            # one line + 12 markers per sketch config, legend per series
            assert s.count("<polyline") == 8
            assert s.count("<circle") == 96
