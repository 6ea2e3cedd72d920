"""ANSI-mode invariance: results must not depend on non-ANSI leniency.

Under the default (non-ANSI) mode Spark silently wraps integer
overflow, nulls invalid casts, and tolerates out-of-bounds access;
DuckDB raises on all three. Any query whose result *depends* on that
leniency is a silent cross-engine parity split waiting for scale — the
exact class the r9 `{W}` widening removed (functions._micro_sql). The
full-registry `tools/driver_sweep.py --ansi` proved all 262 queries
green under ANSI at r9 HEAD; this test pins the invariant permanently
for the arithmetic-heaviest subset so a regression fails in pytest, not
in a future round's sweep: each query must produce IDENTICAL rows with
`spark.sql.ansi.enabled` on and off (and raise nowhere).
"""

from __future__ import annotations

import pytest

from datafusion_streams_spark.operators import REGISTRY
from tests.conftest import SF_DIR

# the widened / micro-integer / decimal-power-sum queries: the ones
# whose inner arithmetic runs closest to type boundaries
ANSI_SENSITIVE = [
    "events_forecast_backtest",
    "embedding_dim_stats",
    "embedding_norm_audit",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_perplexity_buckets",
    "text_classifier_score",
    "agg_skew_kurtosis",
    "agg_linear_fit",
    "agg_bitmap_distinct",
    "agg_weighted_median",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_approx_top_k",
    "agg_hll_mergeable",
    "join_bloom_prefilter",
    "scalar_bitwise_pack",
    "dedup_minhash_lsh",
]


def _rows(df) -> list[tuple[str, ...]]:
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("name", ANSI_SENSITIVE)
def test_result_identical_under_ansi(spark, name):
    spec = REGISTRY[name]
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    base = _rows(spec.fn(spark, SF_DIR))
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = _rows(spec.fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert base == ansi, f"{name}: result depends on non-ANSI leniency"
