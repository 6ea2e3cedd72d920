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


def test_verified_prefix_covers_every_family():
    """The driver hard-verifies only the first 50 registry slots. The
    round-4 window rotates (round-3 verdict items #1/#2): every query
    that has never had a driver CORRECTNESS row leads (r3 + r4
    additions), then the repaired streaming/ANN queries, then keystones
    biased toward this round's changed code — so that CUMULATIVE driver
    coverage reaches the whole registry."""
    from datafusion_streams_spark.operators import (
        KEYSTONES_R4,
        REPAIRED_IN_R4,
        ROTATED_IN_R4,
        VERIFIED_FIRST,
    )

    names = list(REGISTRY)
    assert len(VERIFIED_FIRST) == 50
    assert names[: len(VERIFIED_FIRST)] == list(VERIFIED_FIRST)

    window = names[:50]
    # every never-driver-checked query (r3+r4 additions) is in the window
    assert set(ROTATED_IN_R4) <= set(window)
    # the five repaired streaming queries + the re-oracled ANN path must
    # get fresh driver rows
    assert set(REPAIRED_IN_R4) <= set(window)
    # keystones keep one representative per family that the rotated set
    # doesn't already exercise
    window_tags = {t for n in window for t in REGISTRY[n].tags}
    required_tags = {
        "reference", "filter", "agg", "join", "semi", "anti",
        "outer", "sort", "topk", "setop", "scalar", "string", "json",
        "sql", "subquery", "temporal", "asof", "range", "rollup",
        "window", "rank", "funnel", "stateful", "broadcast",
        "dedup", "lsh", "similarity", "ann", "clustering", "iterative",
        "text", "quality", "multimodal", "sampling", "pipeline",
        "streaming", "skew", "scale",
    }
    missing = required_tags - window_tags
    assert not missing, f"families outside the verified window: {missing}"
    assert set(KEYSTONES_R4) <= set(window)
    # every window slot carries a DuckDB oracle (hash-checked) except the
    # GK-sketch percentile (genuinely non-SQL-expressible; 1%-accuracy-
    # bounded in pytest — the driver records its weaker rows-only check);
    # the BLAS ANN path got a ranking-only oracle in r4 so it no longer
    # burns a slot
    rows_only = [n for n in window if REGISTRY[n].oracle is None]
    assert rows_only == ["agg_approx_percentile"], rows_only


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
