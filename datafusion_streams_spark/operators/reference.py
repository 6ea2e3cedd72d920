"""Reference-parity pipeline (batch form).

Mirrors the reference's end-to-end test — Kafka scan with fixed
``(key binary, value binary)`` schema (`/root/reference/src/lib.rs:7-12`)
→ cast both to UTF-8 → project with ``length()``
(`/root/reference/tests/basic_tests.rs:53-61`) — over a deterministic
Kafka-shaped table derived from the ``events`` fixture. The message
generators copy the reference's test fixtures: ``key = "Key {id}"``,
``value = "Message {id}"`` (`/root/reference/tests/utils.rs:214-220`).

The streaming (micro-batch) form of the same pipeline lives in
``datafusion_streams_spark.streaming.queries``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_streams_spark.operators import query
from datafusion_streams_spark.sources.kafka import kafka_like_from_events

_REF_PIPELINE_ORACLE = """
WITH msgs AS (
    SELECT
        encode('Key ' || CAST(event_id AS VARCHAR)) AS key,
        encode('Message ' || CAST(event_id AS VARCHAR)) AS value
    FROM events
)
SELECT
    decode(key)            AS key,
    decode(value)          AS value,
    length(decode(value))  AS len_value
FROM msgs
"""


@query("ref_kafka_pipeline", oracle=_REF_PIPELINE_ORACLE, tags=("reference", "cast", "projection", "scalar"))
def ref_kafka_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan (binary key, binary value) → cast to string → length projection.

    Exactly `/root/reference/tests/basic_tests.rs:53-61` as three lines
    of PySpark: the cast/alias/length all run inside whole-stage
    codegen; at 100 TB this is a map-only pipeline with zero shuffles.
    """
    msgs = kafka_like_from_events(spark, sf_dir)
    key_s = F.col("key").cast("string").alias("key")
    value_s = F.col("value").cast("string").alias("value")
    # cast long: DuckDB length() returns BIGINT (repo convention for
    # int-returning functions)
    return msgs.select(
        key_s,
        value_s,
        F.length(F.col("value").cast("string")).cast("long").alias("len_value"),
    )


@query(
    "ref_kafka_datasource_pipeline",
    oracle=_REF_PIPELINE_ORACLE,
    tags=("reference", "source", "datasource"),
)
def ref_kafka_datasource_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline driven through a PLUGGABLE source: the
    Spark-4 Python DataSource (`sources/pydatasource.py`) is this
    engine's literal analogue of the reference registering
    ``KafkaExecutionPlan`` into DataFusion
    (`/root/reference/src/kafka/execution.rs:31`, used at
    `tests/basic_tests.rs:47-51`) — a custom scan node with the fixed
    binary schema, per-partition tasks, and micro-batch planning hooks,
    plugged into the engine's planner rather than bolted on beside it.
    Downstream is the identical cast -> length projection, so the same
    oracle verifies the custom source produces byte-identical data to
    the built-in path (``ref_kafka_pipeline``)."""
    from datafusion_streams_spark.sources.pydatasource import register_kafka_emu

    register_kafka_emu(spark)
    msgs = (
        spark.read.format("kafka_emu")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    return msgs.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.length(F.col("value").cast("string")).cast("long").alias("len_value"),
    )
