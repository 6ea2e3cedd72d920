"""tools/quiet_bench.py gate logic, no Spark: the round-close bench
must retry while the box is loud, persist the accepted run under the
versioned name, and flag gate_met honestly when the box never goes
quiet (r10 verdict item 2)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import quiet_bench  # noqa: E402


def _fake_line(end_load1: float, total: float = 65.4) -> str:
    return json.dumps({
        "metric": "headline_queries_total_wall_clock", "value": total,
        "unit": "sec", "sf": 0.1,
        "load": [0.4, 0.5, 0.6, end_load1, 1.0, 1.1],
    })


def _setup(monkeypatch, tmp_path, ambient_loads, start_quiet=True,
           faults=None, totals=None):
    """ambient_loads: the post-cool-down 1-min loadavg samples the gate
    sees, one per attempt. The in-run end load in the fake line is
    always HIGH (7.9) — it is the bench's own load and must not be
    what the gate reads (the r11 lesson: r10's quiet run 'ended at
    7.36' because load1 at run end is self-load). ``faults``: the
    post-cool-down fcalib samples, one per attempt (default: healthy
    1.2 s every time). ``totals``: per-attempt bench totals (default:
    65.4 every time)."""
    (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps({"queries": {}}))
    monkeypatch.setattr(quiet_bench, "REPO", str(tmp_path))
    monkeypatch.setattr(
        quiet_bench, "wait_quiet", lambda *a, **k: (start_quiet, 1.2)
    )
    fault_calls = iter(faults or [1.2] * len(ambient_loads))
    monkeypatch.setattr(
        quiet_bench, "measure_fault", lambda: next(fault_calls)
    )
    total_calls = iter(totals or [65.4] * len(ambient_loads))
    monkeypatch.setattr(
        quiet_bench, "run_bench",
        lambda: (_fake_line(7.9, next(total_calls)), ""),
    )
    monkeypatch.setattr(quiet_bench.time, "sleep", lambda s: None)
    calls = iter(ambient_loads)
    monkeypatch.setattr(
        quiet_bench.os, "getloadavg", lambda: (next(calls), 0.0, 0.0)
    )


def test_quiet_run_accepted_first_try(monkeypatch, tmp_path, capsys):
    _setup(monkeypatch, tmp_path, [0.8])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "11"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r11.json").read_text())
    assert out["quiet_gate"] == {
        "gate_load1": 1.5, "gate_met": True, "attempts": 1,
        "kept_attempt": 1,
        "attempt_totals": [{"attempt": 1, "total": 65.4, "gate_met": True}],
        "ambient_after_cooldown": 0.8, "cooldown_sec": 180,
        "fault_gate_sec": 10.0, "fcalib_before": 1.2, "fcalib_after": 1.2,
        "fault_probe_ok": True,
    }
    assert out["printed_line"]["value"] == 65.4
    assert out["detail"] == {"queries": {}}
    # the wrapper re-prints the accepted line as its LAST stdout line
    # so it can stand in for bench.py in the round-close loop
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last)["value"] == 65.4


def test_loud_end_retries_then_accepts(monkeypatch, tmp_path):
    _setup(monkeypatch, tmp_path, [7.2, 0.9])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "11"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r11.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["quiet_gate"]["attempts"] == 2


def test_fault_pathology_retries_at_quiet_load(monkeypatch, tmp_path):
    """r13: the load gate is BLIND to the page-supply pathology (fcalib
    measured 114 s at load1 0.11). An attempt whose post-cool-down
    fcalib breaches the fault gate must retry even though ambient load
    is pristine, and the accepted attempt's samples are recorded."""
    _setup(monkeypatch, tmp_path, [0.3, 0.4], faults=[87.2, 1.4])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "13"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r13.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["quiet_gate"]["attempts"] == 2
    assert out["quiet_gate"]["fcalib_after"] == 1.4


def test_fault_gate_disabled_skips_probe(monkeypatch, tmp_path):
    """--fault-gate 0 must never call the probe (a 256 MiB alloc)."""
    _setup(monkeypatch, tmp_path, [0.8])
    monkeypatch.setattr(
        quiet_bench, "measure_fault",
        lambda: (_ for _ in ()).throw(AssertionError("probe called")),
    )
    monkeypatch.setattr(
        sys, "argv",
        ["quiet_bench.py", "--round", "13", "--fault-gate", "0"],
    )
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r13.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["quiet_gate"]["fcalib_after"] is None
    # disabled gate: the null fcalib is EXPECTED, not a probe failure
    assert out["quiet_gate"]["fault_probe_ok"] is True


def test_probe_failure_is_distinguishable(monkeypatch, tmp_path):
    """r13 ADVICE: fault gate ENABLED but measure_fault() fails (e.g.
    numpy import error) -> the run must still persist (the probe can
    never block a measurement), but the record must NOT read like a
    passed or disabled fault gate: fault_probe_ok=False tells a judge
    the fault axis went unverified on this run."""
    _setup(monkeypatch, tmp_path, [0.8], faults=[None])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "14"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r14.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True  # load axis still held
    assert out["quiet_gate"]["fcalib_after"] is None
    assert out["quiet_gate"]["fault_probe_ok"] is False


def test_never_quiet_persists_honest_flag(monkeypatch, tmp_path):
    """A loud number with gate_met=false beats no number — the flag
    tells the judge which it was."""
    _setup(monkeypatch, tmp_path, [7.2, 6.8, 9.1])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "11"])
    assert quiet_bench.main() == 3
    out = json.loads((tmp_path / "BENCH_QUIET_r11.json").read_text())
    assert out["quiet_gate"]["gate_met"] is False
    assert out["quiet_gate"]["attempts"] == 3


def test_gate_failed_attempts_keep_min_total(monkeypatch, tmp_path, capsys):
    """r14 (mechanizing the r13 close-out's hand-applied policy): when
    every attempt fails the gate, the persisted run is the MINIMUM
    total, not the last (the r14 close-out lost two attempts' totals
    to last-wins), and every attempt's total stays recorded."""
    _setup(monkeypatch, tmp_path, [7.2, 6.8, 9.1],
           totals=[88.3, 71.2, 95.0])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "14"])
    assert quiet_bench.main() == 3
    out = json.loads((tmp_path / "BENCH_QUIET_r14.json").read_text())
    assert out["printed_line"]["value"] == 71.2
    assert out["quiet_gate"]["kept_attempt"] == 2
    assert [t["total"] for t in out["quiet_gate"]["attempt_totals"]] == \
        [88.3, 71.2, 95.0]
    # the re-printed stdout line is the kept (min) one
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last)["value"] == 71.2


def test_malformed_line_discarded_keeps_earlier(monkeypatch, tmp_path):
    """r14 ADVICE: a truncated/malformed JSON line (bench killed
    mid-print) must not crash the wrapper — it is discarded like the
    no-line path and earlier valid candidates still persist."""
    _setup(monkeypatch, tmp_path, [7.2, 7.2])
    lines = iter([_fake_line(7.9, 88.3),
                  '{"metric": "headline_quer',  # truncated mid-print
                  _fake_line(7.9, 92.0)])
    monkeypatch.setattr(quiet_bench, "run_bench",
                        lambda: (next(lines), ""))
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "15"])
    assert quiet_bench.main() == 3
    out = json.loads((tmp_path / "BENCH_QUIET_r15.json").read_text())
    assert out["printed_line"]["value"] == 88.3
    assert [t["total"] for t in out["quiet_gate"]["attempt_totals"]] == \
        [88.3, 92.0]


def test_nonnumeric_value_ranks_last_serializes_null(monkeypatch, tmp_path):
    """r14 ADVICE: a line whose "value" is missing/non-numeric must not
    raise mid-loop, must rank LAST (never outrank a measured total),
    and must serialize as null — never the non-standard `Infinity`
    token that breaks strict-JSON consumers of the artifact."""
    _setup(monkeypatch, tmp_path, [7.2, 7.2])
    bad = json.dumps({"metric": "headline_queries_total_wall_clock",
                      "value": "oops", "unit": "sec", "sf": 0.1})
    lines = iter([bad, _fake_line(7.9, 90.0)])
    monkeypatch.setattr(quiet_bench, "run_bench",
                        lambda: (next(lines), ""))
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "15",
                                      "--retries", "1"])
    assert quiet_bench.main() == 3
    raw = (tmp_path / "BENCH_QUIET_r15.json").read_text()
    assert "Infinity" not in raw
    out = json.loads(raw)
    assert out["printed_line"]["value"] == 90.0
    assert out["quiet_gate"]["kept_attempt"] == 2
    assert [t["total"] for t in out["quiet_gate"]["attempt_totals"]] == \
        [None, 90.0]


def _write_prior(tmp_path, rnd, total, gate_met, detail=None):
    (tmp_path / f"BENCH_QUIET_r{rnd:02d}.json").write_text(json.dumps({
        "quiet_gate": {
            "gate_load1": 1.5, "gate_met": gate_met, "attempts": 1,
            "kept_attempt": 1,
            "attempt_totals": [
                {"attempt": 1, "total": total, "gate_met": gate_met}],
            "ambient_after_cooldown": 0.7, "cooldown_sec": 180,
            "fault_gate_sec": 10.0, "fcalib_before": 1.1,
            "fcalib_after": 1.3, "fault_probe_ok": True,
        },
        "printed_line": {"metric": "headline_queries_total_wall_clock",
                         "value": total, "unit": "sec", "sf": 0.1},
        "detail": detail or {"queries": {"prior": True}},
    }))


def test_prior_gate_met_artifact_survives_loud_rerun(monkeypatch, tmp_path):
    """r15: the round policy is 'run quiet_bench early, re-run
    opportunistically' — so a later loud invocation must never clobber
    an earlier gate-met artifact via last-wins. The prior run is
    folded into the min-of-N as a candidate under the same keep rule
    (gate-met beats gate-failed regardless of total)."""
    _write_prior(tmp_path, 15, 85.0, True)
    _setup(monkeypatch, tmp_path, [7.2, 7.2, 7.2],
           totals=[60.0, 61.0, 62.0])  # faster but loud
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "15"])
    assert quiet_bench.main() == 0  # the KEPT run is gate-met
    out = json.loads((tmp_path / "BENCH_QUIET_r15.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["quiet_gate"]["kept_attempt"] == "prior:1"
    assert out["printed_line"]["value"] == 85.0
    assert out["detail"] == {"queries": {"prior": True}}
    assert [t["total"] for t in out["quiet_gate"]["attempt_totals"]] == \
        [60.0, 61.0, 62.0, 85.0]
    assert [t["attempt"] for t in out["quiet_gate"]["attempt_totals"]] == \
        [1, 2, 3, "prior:1"]


def test_new_gate_met_run_replaces_prior_loud_artifact(monkeypatch, tmp_path):
    """The symmetric case: an early loud artifact yields to a later
    gate-met run, and among gate-equivalent runs the lower total wins."""
    _write_prior(tmp_path, 15, 70.0, False)
    _setup(monkeypatch, tmp_path, [0.8], totals=[86.0])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "15"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r15.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["quiet_gate"]["kept_attempt"] == 1
    assert out["printed_line"]["value"] == 86.0
    # the prior attempt's total stays in the provenance trail
    assert {"attempt": "prior:1", "total": 70.0, "gate_met": False} in \
        out["quiet_gate"]["attempt_totals"]


def test_prior_gate_met_min_total_wins(monkeypatch, tmp_path):
    """Among gate-MET runs across invocations the lowest total wins."""
    _write_prior(tmp_path, 15, 82.0, True)
    _setup(monkeypatch, tmp_path, [0.8], totals=[79.5])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "15"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r15.json").read_text())
    assert out["printed_line"]["value"] == 79.5
    assert out["quiet_gate"]["kept_attempt"] == 1


def test_corrupt_prior_artifact_never_blocks(monkeypatch, tmp_path):
    """A corrupt/truncated prior artifact is ignored, never fatal."""
    (tmp_path / "BENCH_QUIET_r15.json").write_text('{"quiet_gate": {tr')
    _setup(monkeypatch, tmp_path, [0.8])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "15"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r15.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["printed_line"]["value"] == 65.4


def test_gate_met_beats_faster_gate_failed(monkeypatch, tmp_path):
    """A gate-met run wins over a FASTER gate-failed one: the gate
    exists because loud totals aren't trustworthy numbers — a lucky-
    looking low total measured under a breached gate must not
    outrank a clean measurement."""
    _setup(monkeypatch, tmp_path, [7.2, 0.9], totals=[60.1, 70.5])
    monkeypatch.setattr(sys, "argv", ["quiet_bench.py", "--round", "14"])
    assert quiet_bench.main() == 0
    out = json.loads((tmp_path / "BENCH_QUIET_r14.json").read_text())
    assert out["quiet_gate"]["gate_met"] is True
    assert out["quiet_gate"]["kept_attempt"] == 2
    assert out["printed_line"]["value"] == 70.5
