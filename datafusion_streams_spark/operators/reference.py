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
