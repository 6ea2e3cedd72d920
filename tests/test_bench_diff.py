"""tools/bench_diff.py contract: the code-regression rule's arithmetic
(per-query ratio table, median, the screen*median above-shift screen,
the plan-row-diff gate), pinned so the rule the r15 close applies is
the rule written down at the r14 close (SCALE_NOTES.md), not a drifted
re-implementation. No Spark."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import bench_diff  # noqa: E402


def _detail(queries):
    return {"metric": "headline_queries_total_wall_clock",
            "value": sum(queries.values()), "unit": "sec",
            "queries": queries, "sf": 0.1}


def _quiet(queries):
    return {"quiet_gate": {"gate_met": True},
            "printed_line": {"value": sum(queries.values())},
            "detail": _detail(queries)}


PLANS = """# PLANS
| query | shuffles | bcast | join strategy | top-k |
|---|---|---|---|---|
| q_a | 1 | 2 | broadcast hash | — |
| q_b | 1 | 0 | — | — |
| q_c | 2 | 0 | — | — |
"""

PLANS_B_CHANGED = PLANS.replace("| q_b | 1 | 0 |", "| q_b | 3 | 0 |")


def _run(tmp_path, old_q, new_q, plans_old=None, plans_new=None,
         engine_diff="", screen=1.5, old_shape=_quiet, new_shape=_detail):
    """Invoke the CLI end-to-end (arg parsing, both artifact shapes,
    file IO) and return (exit_code, parsed out JSON)."""
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps(old_shape(old_q)))
    new_p.write_text(json.dumps(new_shape(new_q)))
    argv = ["bench_diff.py", "--old", str(old_p), "--new", str(new_p),
            "--engine-diff", engine_diff, "--screen", str(screen),
            "--out", str(tmp_path / "out.json")]
    for flag, text in (("--plans-old", plans_old), ("--plans-new", plans_new)):
        if text is not None:
            p = tmp_path / f"{flag[2:]}.md"
            p.write_text(text)
            argv += [flag, str(p)]
    old_argv, sys.argv = sys.argv, argv
    try:
        code = bench_diff.main()
    finally:
        sys.argv = old_argv
    return code, json.loads((tmp_path / "out.json").read_text())


def test_median_and_screen_arithmetic(tmp_path):
    """median over COMMON ratioable queries; above-shift = ratio >
    screen * median (strict), sorted worst-first."""
    old = {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0, "q_d": 1.0, "q_e": 1.0}
    new = {"q_a": 0.8, "q_b": 0.8, "q_c": 0.8, "q_d": 1.2, "q_e": 2.0}
    code, out = _run(tmp_path, old, new)
    assert out["median_ratio"] == 0.8
    # screen boundary: 1.2 == 1.5 * 0.8 exactly -> NOT above (strict >)
    assert list(out["above_shift"]) == ["q_e"]
    assert out["above_shift"]["q_e"]["ratio"] == 2.0
    assert out["above_shift"]["q_e"]["ratio_vs_median"] == 2.5
    assert code == 0  # engine diff empty -> nothing can be code-regressed


def test_zero_engine_diff_clears_everything(tmp_path):
    """Rule clause (b): a round with zero engine lines changed has no
    code-regressed queries regardless of how far any ratio shifted."""
    code, out = _run(tmp_path, {"q_a": 1.0, "q_b": 1.0},
                     {"q_a": 1.0, "q_b": 9.0}, engine_diff="   \n")
    assert out["engine_changed"] is False
    assert out["above_shift"]["q_b"]["verdict"] == "host_noise"
    assert out["code_regressed"] == []
    assert code == 0


def test_plan_row_diff_gates_the_verdict(tmp_path):
    """Engine changed: an above-shift query is code_regressed iff its
    PLANS.md row changed; byte-identical rows clear it (the r14
    adjudication of multimodal_simhash_neardup/q21/q1); a row missing
    on either side cannot be cleared mechanically."""
    old = {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0, "q_x": 1.0,
           "s1": 1.0, "s2": 1.0, "s3": 1.0, "s4": 1.0}
    new = {"q_a": 1.0, "q_b": 9.0, "q_c": 9.0, "q_x": 9.0,
           "s1": 1.0, "s2": 1.0, "s3": 1.0, "s4": 1.0}
    code, out = _run(tmp_path, old, new, plans_old=PLANS,
                     plans_new=PLANS_B_CHANGED, engine_diff="dedup.py | 4 +-")
    v = out["above_shift"]
    assert v["q_b"]["verdict"] == "code_regressed"
    assert v["q_b"]["plan_row_changed"] is True
    assert v["q_c"]["verdict"] == "host_noise"
    assert v["q_c"]["plan_row_changed"] is False
    assert v["q_x"]["verdict"] == "suspect_no_plan"  # row absent both sides
    assert out["code_regressed"] == ["q_b"]
    assert code == 4  # non-zero exit flags the regression to the close loop


def test_membership_and_unratioable_bookkeeping(tmp_path):
    """Queries on one side only are reported, never silently dropped;
    a zero old wall is unratioable and excluded from the median."""
    code, out = _run(tmp_path, {"q_a": 1.0, "q_gone": 2.0, "q_z": 0.0},
                     {"q_a": 1.1, "q_new": 3.0, "q_z": 5.0})
    assert out["only_old"] == ["q_gone"]
    assert out["only_new"] == ["q_new"]
    assert out["unratioable"] == ["q_z"]
    assert out["queries_compared"] == 1
    assert out["median_ratio"] == 1.1


def test_accepts_quiet_and_raw_detail_shapes(tmp_path):
    """Both artifact shapes load: the quiet wrapper (detail nested) and
    a raw BENCH_DETAIL.json; non-numeric walls are ignored."""
    old = {"q_a": 2.0}
    code, out = _run(tmp_path, old, {"q_a": 1.0}, old_shape=_detail,
                     new_shape=_quiet)
    assert out["median_ratio"] == 0.5
    assert code == 0
