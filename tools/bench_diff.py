#!/usr/bin/env python3
"""Mechanize the bench code-regression rule (r14 verdict item 3).

The rule, written down at the r14 close (SCALE_NOTES.md "code-regression
rule") and applied by hand each round since r12: a query is
code-regressed for round N iff

  (a) its per-query wall ratio new/old exceeds ``--screen`` (default
      1.5) times the round's per-query MEDIAN ratio — the median is the
      host; a query the host alone moved rides the median — AND
  (b) round N changed code or the plan in its path, which this tool
      checks mechanically as: the query's PLANS.md row differs between
      the two regens (plan-byte-identity clears a query even when the
      round touched the package).

Given two bench artifacts (BENCH_QUIET_r{N}.json wrappers or raw
BENCH_DETAIL.json shapes), the two rounds' PLANS.md regens, and the
round's package diff stats, emit the per-query ratio table, the median,
the above-shift list, and the rule verdict per query — as ONE JSON
document (committed beside the round's quiet artifact) plus a readable
table on stderr.

    python tools/bench_diff.py --old BENCH_QUIET_r14.json \
        --new BENCH_QUIET_r15.json \
        --plans-old /tmp/PLANS_r14.md --plans-new PLANS.md \
        --engine-diff "$(git diff --stat r14..HEAD -- datafusion_streams_spark/)" \
        --out BENCH_DIFF_r15.json

Verdicts per above-shift query:
  code_regressed — above screen AND its plan row changed
  suspect_no_plan — above screen, package changed, but no plan row is
      available on one side (cannot clear mechanically; investigate)
  host_noise — above screen but plan row byte-identical (and/or the
      round's engine diff is empty): the r12-r14 adjudication
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    """Per-query walls from a quiet artifact, a raw detail file, or a
    driver BENCH_r{N}.json printed line — anything carrying a
    ``queries`` map (wrapped in ``detail`` for quiet artifacts)."""
    with open(path) as f:
        art = json.load(f)
    detail = art.get("detail", art)
    queries = detail.get("queries")
    if not isinstance(queries, dict):
        queries = art.get("parsed", {}).get("queries")
    if not isinstance(queries, dict):
        raise SystemExit(f"{path}: no 'queries' map found")
    return {
        name: float(wall)
        for name, wall in queries.items()
        if isinstance(wall, (int, float)) and not isinstance(wall, bool)
    }


def load_plan_rows(path: str | None) -> dict[str, str] | None:
    """PLANS.md table rows keyed by query name (byte-exact row text)."""
    if not path:
        return None
    rows: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.startswith("| ") or line.startswith("| query "):
                continue
            cells = [c.strip() for c in line.split("|")]
            if len(cells) >= 3 and cells[1] and cells[1] != "---":
                rows[cells[1]] = line
    return rows or None


def diff(old: dict[str, float], new: dict[str, float],
         plans_old: dict[str, str] | None,
         plans_new: dict[str, str] | None,
         engine_changed: bool, screen: float) -> dict:
    common = sorted(set(old) & set(new))
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    unratioable = [q for q in common if old[q] <= 0]
    median = statistics.median(ratios.values()) if ratios else None
    above = sorted(
        (q for q, r in ratios.items() if median and r > screen * median),
        key=lambda q: -ratios[q],
    )
    verdicts = {}
    for q in above:
        row_old = (plans_old or {}).get(q)
        row_new = (plans_new or {}).get(q)
        if not engine_changed:
            verdict, plan_changed = "host_noise", False
        elif row_old is None or row_new is None:
            verdict, plan_changed = "suspect_no_plan", None
        elif row_old != row_new:
            verdict, plan_changed = "code_regressed", True
        else:
            verdict, plan_changed = "host_noise", False
        verdicts[q] = {
            "ratio": round(ratios[q], 4),
            "ratio_vs_median": round(ratios[q] / median, 4),
            "plan_row_changed": plan_changed,
            "verdict": verdict,
        }
    return {
        "screen": screen,
        "engine_changed": engine_changed,
        "queries_compared": len(ratios),
        "median_ratio": round(median, 4) if median is not None else None,
        "ratios": {q: round(r, 4) for q, r in sorted(ratios.items())},
        "above_shift": verdicts,
        "code_regressed": sorted(
            q for q, v in verdicts.items() if v["verdict"] == "code_regressed"
        ),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "unratioable": unratioable,
    }


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--old", required=True, help="previous round artifact")
    ap.add_argument("--new", required=True, help="this round's artifact")
    ap.add_argument("--plans-old", help="PLANS.md regen at the old HEAD")
    ap.add_argument("--plans-new", help="PLANS.md regen at the new HEAD")
    ap.add_argument("--engine-diff", default="",
                    help="the round's package diff stat (e.g. `git diff "
                    "--stat OLD..HEAD -- datafusion_streams_spark/`); "
                    "empty/whitespace = zero engine lines changed, which "
                    "clears rule clause (b) for every query")
    ap.add_argument("--screen", type=float, default=1.5,
                    help="above-shift screen: ratio > screen * median")
    ap.add_argument("--out", help="write the JSON verdict here")
    args = ap.parse_args()

    result = diff(
        load_queries(args.old), load_queries(args.new),
        load_plan_rows(args.plans_old), load_plan_rows(args.plans_new),
        engine_changed=bool(args.engine_diff.strip()),
        screen=args.screen,
    )
    result["old"] = args.old
    result["new"] = args.new
    result["plans_old"] = args.plans_old
    result["plans_new"] = args.plans_new

    print(f"compared {result['queries_compared']} queries; "
          f"median ratio {result['median_ratio']}; "
          f"engine_changed={result['engine_changed']}", file=sys.stderr)
    for q, v in result["above_shift"].items():
        print(f"  {q}: {v['ratio']}x ({v['ratio_vs_median']}x of median) "
              f"plan_changed={v['plan_row_changed']} -> {v['verdict']}",
              file=sys.stderr)
    print(f"code-regressed queries: {result['code_regressed'] or 'NONE'}",
          file=sys.stderr)

    payload = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        print(payload)
    return 0 if not result["code_regressed"] else 4


if __name__ == "__main__":
    raise SystemExit(main())
