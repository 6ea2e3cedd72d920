"""Custom stateful streaming operators + stream-stream joins — the
capability tier where Spark exceeds the reference (SURVEY.md §2.3
'Stateful ops / dedup'; the reference has no state at all)."""

from __future__ import annotations

import tempfile

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tests.conftest import SF_DIR_SMALL


def test_apply_in_pandas_with_state_running_count(spark):
    """Custom stateful operator via applyInPandasWithState: a running
    per-user event counter carried across micro-batches — the pattern
    for operators Structured Streaming lacks natively."""
    src_dir = tempfile.mkdtemp(prefix="dfs_state_")
    rows1 = [(i, i % 3) for i in range(9)]
    rows2 = [(i, i % 3) for i in range(9, 15)]
    spark.createDataFrame(rows1, "event_id long, user_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src_dir}/b1")
    spark.createDataFrame(rows2, "event_id long, user_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src_dir}/b2")

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("total_events", LongType())]
    )
    state_schema = StructType([StructField("count", LongType())])

    def count_events(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [total]})

    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*/part-*.parquet")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_events, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    name = "state_counts"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    result = spark.table(name).toPandas()
    # last emission per user must equal the full count (5 per user: 15 rows / 3 users)
    final = result.groupby("user_id")["total_events"].max()
    assert dict(final) == {0: 5, 1: 5, 2: 5}, result


def test_stream_stream_join_with_watermarks(spark):
    """Stream-stream inner join bounded by watermarks: impressions x
    clicks within a 30-minute interval condition."""
    imp_dir = tempfile.mkdtemp(prefix="dfs_imp_")
    clk_dir = tempfile.mkdtemp(prefix="dfs_clk_")
    imp = [(i, f"2024-01-01 10:{i:02d}:00") for i in range(10)]
    clk = [(i, f"2024-01-01 10:{i + 5:02d}:00") for i in range(0, 10, 2)]
    spark.createDataFrame(imp, "ad_id long, ts_str string").select(
        "ad_id", F.col("ts_str").cast("timestamp").alias("imp_ts")
    ).coalesce(1).write.mode("overwrite").parquet(imp_dir + "/d")
    spark.createDataFrame(clk, "ad_id long, ts_str string").select(
        F.col("ad_id").alias("click_ad_id"), F.col("ts_str").cast("timestamp").alias("click_ts")
    ).coalesce(1).write.mode("overwrite").parquet(clk_dir + "/d")

    imps = (
        spark.readStream.schema("ad_id long, imp_ts timestamp")
        .parquet(imp_dir + "/d/part-*.parquet")
        .withWatermark("imp_ts", "1 hour")
    )
    clicks = (
        spark.readStream.schema("click_ad_id long, click_ts timestamp")
        .parquet(clk_dir + "/d/part-*.parquet")
        .withWatermark("click_ts", "1 hour")
    )
    joined = imps.join(
        clicks,
        F.expr(
            "ad_id = click_ad_id AND click_ts BETWEEN imp_ts AND imp_ts + INTERVAL 30 MINUTES"
        ),
    )
    name = "ss_join"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.ad_id for r in spark.table(name).collect()}
    assert got == {0, 2, 4, 6, 8}, got


def test_transform_with_state_in_pandas(spark):
    """transformWithStateInPandas (Spark 4.0 arbitrary-state API):
    running per-user counts with a RocksDB-backed ValueState.

    Environment-gated: the API's Python worker requires a functional
    google.protobuf (absent in this container), so this skips here and
    runs in protobuf-capable deployments. Install re-attempted in round
    3 (2026-08-13) and round 6 (2026-08-14): ``pip install protobuf``
    fails with DNS resolution errors on every retry — the container has
    no package-index network route, so the skip stands.
    applyInPandasWithState above covers the same capability tier.
    """
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas python worker needs protobuf",
    )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self.count.get()[0] if self.count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self):
            pass

    src = tempfile.mkdtemp(prefix="dfs_tws_")
    spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "event_id long, user_id long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = (
        spark.readStream.schema("event_id long, user_id long")
        .parquet(f"{src}/b*/part-*.parquet")
        .groupBy("user_id")
        .transformWithStateInPandas(Counter(), "user_id long, n long", "Update", "None")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r.user_id, r.n) for r in spark.table("tws_test").collect())
    assert got == [(0, 4), (1, 4), (2, 4)]


def test_sessionize_sink_independence(spark, tmp_path):
    """The sink-isolated scale probe (tools/scale_probe.py, r13) drains
    the SHARED pipeline builder (streaming.queries.sessionize_updates)
    through a foreachBatch parquet sink instead of the registered
    query's memory sink. Pin the contract that makes the probe's
    numbers stand for the registered operator: the same final
    aggregation over the parquet-sunk update-mode emissions must equal
    the registered query's result exactly — the sink changes where
    emissions land, never what they say."""
    from datafusion_streams_spark.operators import REGISTRY
    from datafusion_streams_spark.streaming.microbatch import run_microbatch
    from datafusion_streams_spark.streaming.queries import sessionize_updates

    sink_dir = str(tmp_path / "sessionize_parquet")
    run_microbatch(
        sessionize_updates(spark, SF_DIR_SMALL),
        lambda df, _eid: df.write.mode("append").parquet(sink_dir),
        output_mode="update",
        state_partitions=8,
        timeout_sec=240,
    )
    emitted = spark.read.parquet(sink_dir)
    final = F.max_by(
        F.struct("n_events", "s_start_us", "s_end_us"), F.col("n_events")
    ).alias("f")
    via_parquet = sorted(
        (r.user_id, r.session_seq, r.n_events, r.s_start_us, r.s_end_us)
        for r in emitted.groupBy("user_id", "session_seq")
        .agg(final)
        .select(
            "user_id",
            "session_seq",
            F.col("f.n_events").alias("n_events"),
            F.col("f.s_start_us").alias("s_start_us"),
            F.col("f.s_end_us").alias("s_end_us"),
        )
        .collect()
    )
    via_memory = sorted(
        (r.user_id, r.session_seq, r.n_events, r.s_start_us, r.s_end_us)
        for r in REGISTRY["streaming_sessionize_state"]
        .fn(spark, SF_DIR_SMALL)
        .collect()
    )
    assert via_parquet == via_memory
