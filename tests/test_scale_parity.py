"""Scale-conditional oracle gate (round-2 ADVICE).

Several operators derive a model parameter from corpus size (kmeans k,
LSH bits per band) while their registered DuckDB oracles replay the
FIXTURE configuration as static SQL. The contract making that sound is:
the parameter function returns its base value for every shipped fixture
(n <= base_rows) and grows only beyond. These tests pin that contract
two ways: unit asserts on the parameter functions at every fixture
size, and a full oracle-parity re-run of the scale-conditional queries
at sf0.1 — the largest fixture, where round-2's kmeans_k defect
(k=31 vs the oracle's hard-coded 8) actually manifested. The sf0.01
sweep in test_oracle_parity.py cannot catch that class of drift.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_streams_spark.catalog import TABLES
from datafusion_streams_spark.operators import REGISTRY
from tests.conftest import assert_frames_match

SF01_DIR = "/root/testdata/sf0.1"

# fixture corpus sizes: embeddings rows (500/500/2000 at sf0.001/0.01/0.1)
# and the documents max (5000 at sf0.1)
FIXTURE_SIZES = (500, 2000, 5000)

# every registered query whose oracle is static SQL but whose Spark side
# consumes a corpus-size-derived parameter
SCALE_CONDITIONAL = (
    "cluster_kmeans_embeddings",
    "dedup_semantic_clusters",
    "pipeline_curation_v2",
    "ann_lsh_bucketed",
    "dedup_embedding_cosine",
)


def test_kmeans_k_stable_across_fixtures():
    from datafusion_streams_spark.operators.clustering import (
        BASE_KMEANS_ROWS,
        K_CLUSTERS,
        TARGET_CLUSTER_SIZE,
        kmeans_k,
    )

    for n in FIXTURE_SIZES:
        assert n <= BASE_KMEANS_ROWS, f"fixture {n} outside oracle-valid base"
        assert kmeans_k(n) == K_CLUSTERS
    assert kmeans_k(BASE_KMEANS_ROWS) == K_CLUSTERS
    # beyond the base, k grows so cluster population stays bounded
    big = 10 * BASE_KMEANS_ROWS
    assert kmeans_k(big) == big // TARGET_CLUSTER_SIZE


def test_lsh_bits_stable_across_fixtures():
    from datafusion_streams_spark.operators.similarity import (
        BASE_BITS_PER_BAND,
        BASE_LSH_ROWS,
        lsh_bits_per_band,
    )

    for n in FIXTURE_SIZES:
        assert n <= BASE_LSH_ROWS, f"fixture {n} outside oracle-valid base"
        assert lsh_bits_per_band(n) == BASE_BITS_PER_BAND
    assert lsh_bits_per_band(8 * BASE_LSH_ROWS) > BASE_BITS_PER_BAND


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALE_CONDITIONAL)
def test_scale_conditional_oracle_holds_at_sf01(spark, duck_sf01, name):
    spec = REGISTRY[name]
    assert spec.oracle is not None
    spark_pdf = spec.fn(spark, SF01_DIR).toPandas()
    oracle_pdf = duck_sf01.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}@sf0.1")


# r8: every query whose 6-dp outputs come from integer ratios — the
# class where rounding the DOUBLE splits Spark (HALF_UP on the
# shortest-decimal rendering) from DuckDB (rounds the binary value) on
# exact 6th-decimal halves. text_classifier_score hit a live half
# (5165/80000) at sf0.1 only; all sites now round via the exact
# wide-integer functions.round6_ratio family, and this gate re-runs
# them against their oracles at sf0.1 so a regression to double
# rounding (or a new half-sensitive site joining this list unrounded)
# fails here before any driver or judge sweep.
ROUNDING_HALF_SENSITIVE = (
    "text_classifier_score",
    "window_gaps_islands",
    "events_anomaly_mad",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_lang_confusion",
    "text_perplexity_buckets",
    "text_domain_mix",
    "text_bpe_fertility",
    "dedup_novelty_curve",
    "dedup_minhash_estimate_error",
    "agg_heavy_hitters",
    "agg_skew_kurtosis",
    "events_forecast_backtest",
    "events_audience_overlap",
    "embedding_norm_audit",
    "embedding_dim_stats",
    "pipeline_token_packing",
    "sample_temperature_rebalance",
    "sample_importance_dsir",
)


@pytest.mark.parametrize("name", ROUNDING_HALF_SENSITIVE)
def test_integer_ratio_rounding_holds_at_sf01(spark, duck_sf01, name):
    spec = REGISTRY[name]
    assert spec.oracle is not None
    spark_pdf = spec.fn(spark, SF01_DIR).toPandas()
    oracle_pdf = duck_sf01.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}@sf0.1")


# r8: queries whose threshold comes from a scalar aggregate of a
# possibly-EMPTY relation (TPC-H Q11/Q15/Q22 shapes). At sf0.001 the
# q11 nation holds no stock: the eager .first() scalar pull crashed on
# float(None) while the oracle returned 0 rows (caught by the first
# full-registry sweep at that scale; fixed by broadcasting the 1-row
# total into the same DAG). This gate re-runs the family at sf0.001 so
# the empty edge stays covered by pytest, not just by ad-hoc sweeps.
SCALAR_THRESHOLD_FAMILY = (
    "q11_important_stock",
    "q15_top_supplier",
    "q22_sales_opportunity",
)

SF0001_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_sf0001():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF0001_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALAR_THRESHOLD_FAMILY)
def test_scalar_threshold_queries_survive_empty_inputs(spark, duck_sf0001, name):
    spec = REGISTRY[name]
    assert spec.oracle is not None
    spark_pdf = spec.fn(spark, SF0001_DIR).toPandas()
    oracle_pdf = duck_sf0001.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}@sf0.001")
