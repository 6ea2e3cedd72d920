#!/usr/bin/env python3
"""Registry-wide exchange-reuse audit (r10).

The q15 lesson: a query that computes a per-key aggregate AND a
derived 1-row total in one DAG should pay ONE fact scan + shuffle —
AQE's stage cache inserts a ReusedExchange when (and only when) the
two exchange subtrees canonicalize identically. q15's supplier
equi-join pushed an isnotnull below the agg on one branch only, the
subtrees stopped matching, and the fact pipeline silently ran twice.
That class is invisible to result tests and to pre-execution plans
(ReusedExchange only appears in the EXECUTED plan).

This audit runs every registered batch query at sf0.001, fingerprints
each shuffle exchange in the final adaptive plan (normalized argument
+ normalized subtree), and flags any query containing two IDENTICAL
fingerprints — i.e. the same data shuffled twice with no reuse. Plain
duplicate *scans* of a table are NOT flagged: two scans with different
pushed filters/columns are usually cheaper than scan-once-reuse at
100 TB (pushdown wins), and the suite's plan tests cover pushdown.

    cd /tmp && python /root/repo/tools/reuse_audit.py   # one JSON line

Clean output = {"flagged": {}}. Expected cadence: after any change to
a query that derives multiple aggregates from one subtree. r10 HEAD:
0 flagged across all 238 batch queries (the executed-plan reuse test
in tests/test_plans.py pins the two known broadcast-total queries;
this sweep catches NEW instances).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exchange_fingerprints(final_plan: str) -> list[str]:
    """One fingerprint per shuffle exchange: the exchange line plus its
    subtree (lines more indented than it), with expr ids / plan ids /
    codegen stage ids normalized away — the string-level analogue of
    Spark's plan canonicalization."""
    lines = final_plan.splitlines()
    fps = []
    for i, line in enumerate(lines):
        if not re.search(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", line
        ):
            continue
        indent = len(line) - len(line.lstrip(" :+-*("))
        sub = [line]
        for j in range(i + 1, min(i + 40, len(lines))):
            nxt = lines[j]
            nindent = len(nxt) - len(nxt.lstrip(" :+-*("))
            if nindent <= indent:
                break
            sub.append(nxt)
        fp = re.sub(r"#\d+[A-Za-z]*", "#", "\n".join(sub))
        fp = re.sub(r"plan_id=\d+", "plan_id=", fp)
        fp = re.sub(r"\*\(\d+\)", "*", fp)
        fps.append(fp)
    return fps


def main() -> int:
    from datafusion_streams_spark import get_session
    from datafusion_streams_spark.operators import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_session(app_name="reuse-audit", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    flagged: dict[str, object] = {}
    n_batch = 0
    for name, spec in REGISTRY.items():
        if "streaming" in spec.tags:
            continue
        n_batch += 1
        try:
            df = spec.fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # audit tool: record, keep sweeping
            flagged[name] = f"ERR {type(e).__name__}: {e}"
            continue
        final = plan.split("== Initial Plan ==")[0]
        counts = Counter(exchange_fingerprints(final))
        dups = sum(n - 1 for n in counts.values() if n > 1)
        if dups:
            flagged[name] = {
                "duplicate_exchanges": dups,
                "sample": [fp.splitlines()[0].strip()[:110]
                           for fp, n in counts.items() if n > 1],
            }
    print(json.dumps({"probe": "exchange_reuse_audit", "batch_queries": n_batch,
                      "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
