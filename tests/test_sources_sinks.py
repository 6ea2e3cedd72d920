"""Source-format and sink coverage (SURVEY.md §2.3 rows: file scans /
formats, sinks)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from datafusion_streams_spark.sources.files import read_csv, read_json, read_parquet
from datafusion_streams_spark.sources.kafka import kafka_like_stream
from tests.conftest import SF_DIR_SMALL


def _events_sample(spark):
    from datafusion_streams_spark.catalog import load_events

    return load_events(spark, SF_DIR_SMALL).select(
        "event_id", "user_id", "event_type", "value"
    )


def test_csv_roundtrip(spark):
    src = _events_sample(spark)
    d = tempfile.mkdtemp(prefix="dfs_csv_")
    src.write.mode("overwrite").option("header", "true").csv(d)
    back = read_csv(
        spark, d, schema="event_id long, user_id long, event_type string, value double"
    )
    assert back.count() == src.count()
    assert back.agg(F.sum("event_id")).first()[0] == src.agg(F.sum("event_id")).first()[0]


def test_json_roundtrip(spark):
    src = _events_sample(spark)
    d = tempfile.mkdtemp(prefix="dfs_json_")
    src.write.mode("overwrite").json(d)
    back = read_json(
        spark, d, schema="event_id long, user_id long, event_type string, value double"
    )
    assert back.count() == src.count()
    assert back.agg(F.sum("event_id")).first()[0] == src.agg(F.sum("event_id")).first()[0]


def test_parquet_roundtrip_partitioned(spark):
    """Partitioned parquet write + partition-pruned read: the layout a
    100 TB table would actually use."""
    src = _events_sample(spark)
    d = tempfile.mkdtemp(prefix="dfs_part_")
    src.write.mode("overwrite").partitionBy("event_type").parquet(d)
    back = read_parquet(spark, d).filter(F.col("event_type") == "purchase")
    expected = src.filter(F.col("event_type") == "purchase").count()
    assert back.count() == expected
    plan = back._sc._jvm.PythonSQLUtils.explainString(back._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan


def test_streaming_parquet_sink(spark):
    """writeStream -> parquet files (exactly-once file sink with the
    offset/commit log the reference lacks entirely)."""
    out = tempfile.mkdtemp(prefix="dfs_sink_")
    ckpt = tempfile.mkdtemp(prefix="dfs_sinkckpt_")
    msgs = kafka_like_stream(spark, SF_DIR_SMALL).select(
        F.col("key").cast("string").alias("key"),
        F.length(F.col("value").cast("string")).alias("len_value"),
    )
    q = (
        msgs.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    assert written.count() == spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet").count()
    assert set(written.columns) == {"key", "len_value"}
