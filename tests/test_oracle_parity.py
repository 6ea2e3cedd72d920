"""The correctness gate, locally: every registered query runs on Spark
and on DuckDB (oracle SQL) at sf0.01 and must match exactly —
mirroring the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from datafusion_streams_spark.operators import REGISTRY
from tests.conftest import SF_DIR, assert_frames_match

ORACLE_QUERIES = [name for name, spec in REGISTRY.items() if spec.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, spec in REGISTRY.items() if spec.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"key", "value", "len_value"}


def test_registry_complete():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) >= 25, f"expected a wide inventory, got {len(q)}"
    assert set(o) <= set(q)


def test_verified_prefix_is_the_r7_rotation():
    """The driver hard-verifies only the first 50 registry slots. The
    round-7 window (round-6 verdict item #1) is the terminal
    burn-down: the 13 never-driver-checked oracle-backed queries lead
    (after this round, every oracle-backed query has a driver hash
    row), the next 23 slots re-verify queries whose code changed after
    their last green row (BPE canonical-greedy first), and the last 14
    refresh the oldest (r1/r2) evidence. Every slot carries a DuckDB
    oracle — zero expected err rows."""
    import json
    import os

    from datafusion_streams_spark.operators import ROTATED_IN_R7, VERIFIED_FIRST

    names = list(REGISTRY)
    assert len(VERIFIED_FIRST) == 50
    assert names[:50] == list(VERIFIED_FIRST) == list(ROTATED_IN_R7)

    window = names[:50]
    # every window slot is hash-checkable — no rows-only queries burn a
    # slot this round (the sketch queries are pytest accuracy-bounded)
    rows_only = [n for n in window if REGISTRY[n].oracle is None]
    assert rows_only == [], rows_only

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set = set()
    for r in ("r01", "r02", "r03", "r04", "r05", "r06"):
        f = os.path.join(repo, f"CORRECTNESS_{r}.json")
        if os.path.exists(f):
            checked.update(json.load(open(f)).keys())
    if checked:  # absent in a bare checkout
        # the leading 13 slots are exactly the queries with no driver
        # row in any prior round...
        never = [n for n in window if n not in checked]
        assert never == list(window[:13]), never
        # ...and after this window runs, the only registered queries
        # without a driver row anywhere are the two rows-only sketches.
        remaining = set(REGISTRY) - checked - set(window)
        assert remaining == {"agg_hll_mergeable", "agg_approx_top_k"}, sorted(remaining)


def test_approx_distinct_accuracy(spark, duck):
    """HLL estimate within 5% of the exact distinct count per group."""
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in REGISTRY["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 0.05 * v, (k, approx[k], v)


def test_vectorized_ann_matches_bruteforce(spark):
    """The numpy scale path must return the same neighbor sets (same
    ranking on this data) as the strict-fold bruteforce definition."""
    brute = {
        (r.q_id, r.rn): r.neighbor_id
        for r in REGISTRY["ann_topk_bruteforce"].fn(spark, SF_DIR).collect()
    }
    fast = {
        (r.q_id, r.rn): r.neighbor_id
        for r in REGISTRY["ann_topk_vectorized"].fn(spark, SF_DIR).collect()
    }
    assert brute == fast


def test_approx_percentile_accuracy(spark, duck):
    """GK-sketch percentiles within 1% relative of the exact
    interpolated quantiles per group."""
    approx = {
        r["l_returnflag"]: (r["ap50_price"], r["ap90_price"])
        for r in REGISTRY["agg_approx_percentile"].fn(spark, SF_DIR).collect()
    }
    exact = {
        k: (p50, p90)
        for k, p50, p90 in duck.execute(
            "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5), "
            "quantile_cont(l_extendedprice, 0.9) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for k, (e50, e90) in exact.items():
        a50, a90 = approx[k]
        assert abs(a50 - e50) <= 0.01 * e50, (k, a50, e50)
        assert abs(a90 - e90) <= 0.01 * e90, (k, a90, e90)


def test_no_boolean_output_columns(spark):
    """Repo convention (r5 verdict item #5): no registered query may
    emit a top-level BooleanType column — booleans are cast to BIGINT
    on both engines so a future hash-normalization change can never
    flip a green query red over bool representation. Schema-only: the
    DataFrames are built, never executed."""
    from pyspark.sql.types import BooleanType

    offenders = []
    for name, spec in REGISTRY.items():
        try:
            schema = spec.fn(spark, SF_DIR).schema
        except Exception:
            continue  # streaming-only shapes raise on plain build; the
            # parity sweep covers their executed schemas
        for f in schema.fields:
            if isinstance(f.dataType, BooleanType):
                offenders.append(f"{name}.{f.name}")
    assert offenders == [], offenders
