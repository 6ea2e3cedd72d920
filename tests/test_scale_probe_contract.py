"""tools/scale_probe.py output contract, no Spark (r13 verdict item 3):
every probe artifact must carry the full calibration sextet so probe
walls are host-pathology-attributable in-artifact — r13's probe run was
"~1.5-2x slower host at identical single-core calib", which the
fault/bandwidth pairs would have attributed without forensics."""

from __future__ import annotations

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import scale_probe  # noqa: E402


def test_host_calibrations_carries_the_sextet(monkeypatch):
    """host_calibrations() returns exactly the six bench denominators,
    mapped to the same field names bench.py prints (cross-artifact
    joins must not need a rename table). Bench's calibration functions
    are stubbed: this pins plumbing, not host timing."""
    import bench

    monkeypatch.setattr(bench, "cpu_calibration", lambda: 0.11)
    monkeypatch.setattr(bench, "parallel_cpu_calibration", lambda: 0.28)
    monkeypatch.setattr(bench, "mem_calibrations", lambda: (0.52, 0.06))
    monkeypatch.setattr(
        bench, "parallel_mem_calibrations", lambda: (9.7, 0.41)
    )
    out = scale_probe.host_calibrations()
    assert out == {
        "calib": 0.11,
        "pcalib": 0.28,
        "mcalib": 0.06,
        "pmcalib": 0.41,
        "fcalib": 0.52,
        "pfcalib": 9.7,
    }
    assert tuple(out) == scale_probe.CALIB_FIELDS


def test_main_splices_host_calibrations_into_result():
    """main() must merge host_calibrations() into the printed result
    dict (a `**host` splice) — pinned structurally via the AST so the
    test needs neither Spark nor testdata. Guards against the sextet
    silently falling out of the artifact in a future main() refactor."""
    tree = ast.parse(
        (Path(scale_probe.__file__)).read_text(), scale_probe.__file__
    )
    main_fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    # 1) main() calls host_calibrations()
    calls = [
        n.func.id for n in ast.walk(main_fn)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Name)
    ]
    assert "host_calibrations" in calls
    # 2) some dict literal in main() splices a ** expansion (the host
    #    sextet) — the result dict construction
    has_splice = any(
        isinstance(n, ast.Dict) and any(k is None for k in n.keys)
        for n in ast.walk(main_fn)
    )
    assert has_splice
