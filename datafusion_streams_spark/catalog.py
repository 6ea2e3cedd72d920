"""Fixture-table loading and SQL catalog registration.

The reference never finished its SQL/catalog layer — ``src/kafka/
context.rs`` is an empty placeholder (see SURVEY.md §3 entry point 3).
In Spark this layer is one line per table: ``createOrReplaceTempView``.
We ship it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its TIMESTAMP(NANOS) column normalized.

    Spark has no nanosecond timestamp type (parquet NANOS is read as
    long via spark.sql.legacy.parquet.nanosAsLong); convert with an
    integer ns->us floor division — exactly what DuckDB does when it
    narrows nanos to its microsecond timestamps, so both engines see
    identical values.
    """
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us``: event time as INTEGER microseconds.

    Derived from ``load_events``'s normalized timestamp (single source
    of truth for the ns->us narrowing) — for operators that need an
    integer ordering key (RANGE window frames, as-of arithmetic) with
    exact cross-engine parity (DuckDB mirror: ``epoch_ns(ts) // 1000``;
    the UTC session makes the NTZ->instant cast exact).
    """
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def spread(spark: SparkSession, df: DataFrame, *cols: str) -> DataFrame:
    """Repartition with an EXPLICIT partition count (defaultParallelism).

    A bare ``repartition(col)`` has no pinned count, so AQE sizes the
    exchange by shuffle bytes — and small-but-compute-heavy relations
    (5k documents of raw text feeding shingle HOFs) coalesce into ONE
    partition, serializing all downstream map work on a single task
    (the round-3 `dedup_ngram_jaccard` 1.8x regression). An explicit
    count is exempt from AQE coalescing. On a real pre-split 100 TB
    table these repartitions are cheap no-op-shaped exchanges; on the
    single-file fixtures they are what buys parallelism.
    """
    n = spark.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread across the cluster for compute-heavy map
    pipelines (shingling, tokenization, quality scoring)."""
    return spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture parquet under ``sf_dir`` as a DataFrame.

    Plain ``spark.read.parquet`` so Catalyst sees a native parquet
    relation: predicate pushdown, column pruning and partition-level
    parallelism all apply (a 100 TB table just means more row groups —
    the plan shape is identical).
    """
    out = {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in TABLES
        if name != "events"
    }
    out["events"] = load_events(spark, sf_dir)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (the SQL entry point
    the reference stubbed out and never built)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
