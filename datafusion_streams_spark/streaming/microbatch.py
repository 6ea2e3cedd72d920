"""Micro-batch runners mirroring the reference's execution semantics.

Reference semantics -> Spark mapping (SURVEY.md §4.2):
  1. batch closes on min(time_window, batch_size rows)
     (`/root/reference/src/kafka/execution.rs:87`)
     -> trigger(processingTime) + maxOffsetsPerTrigger / maxFilesPerTrigger
  2. drain-then-stop on partition EOF (`…/execution.rs:93-96`)
     -> Trigger.AvailableNow
  3. start at earliest offset (`…/execution.rs:77-79`)
     -> startingOffsets=earliest (and, unlike the reference, Spark
     checkpoints offsets -> exactly-once instead of replay-always)
  4. per-source-partition parallelism (`…/execution.rs:47-49,75`)
     -> built into every Spark source

The reference's per-micro-batch replan hook (StreamingProvider::recv,
`…/execution.rs:119-132`) is MicroBatchExecution itself — nothing to
implement.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

# Opt-in executed-plan capture for the duplicated-shuffle audit
# (tools/reuse_audit.py). Batch queries expose their executed plan via
# queryExecution(); a streaming query's per-trigger physical plan is
# only reachable from the StreamingQuery handle, which the registered
# query functions do not return — so the shared runners (and the three
# inline writeStream sites in streaming/queries.py) log it here when a
# caller installs a list. None (the default) keeps the hot path free:
# no JVM round trip per run.
PLAN_LOG: list[str] | None = None

# Opt-in per-trigger progress capture (r10 verdict item 3: the
# stateful-streaming scale probe needs batchDuration / numInputRows per
# micro-batch). Same contract as PLAN_LOG: None keeps the hot path
# free; a probe installs a list and reads StreamingQueryProgress dicts.
PROGRESS_LOG: list[dict] | None = None


def log_executed_plan(q: StreamingQuery) -> None:
    """Append the last micro-batch's physical plan to PLAN_LOG and the
    query's recent per-trigger progress to PROGRESS_LOG (each a no-op
    unless an audit/probe installed a list). The plan survives stop()
    — StreamExecution retains its lastExecution — and is batch-shape
    invariant under a fixed config, so the last batch stands for all;
    recentProgress retains the last ~100 triggers, far above any
    drain-then-stop run here."""
    if PLAN_LOG is not None:
        try:
            PLAN_LOG.append(q._jsq.explainInternal(False))
        except Exception as e:
            # "No physical plan. Waiting for data." paths raise on some
            # accessors. Log a SENTINEL instead of silently passing so
            # the reuse audit can count capture gaps per query rather
            # than under-covering while reporting clean (r10 ADVICE).
            PLAN_LOG.append(f"PLAN_UNAVAILABLE: {type(e).__name__}: {e}")
    if PROGRESS_LOG is not None:
        try:
            PROGRESS_LOG.extend(q.recentProgress)
        except Exception as e:
            PROGRESS_LOG.append(
                {"PROGRESS_UNAVAILABLE": f"{type(e).__name__}: {e}"}
            )


def run_drain_to_memory(
    df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 120,
    state_partitions: int | None = None,
) -> tuple[str, StreamingQuery]:
    """Drain-then-stop (reference EOF mode, A4): process everything
    available, write to an in-memory table, stop. Returns the memory
    table name; read results with ``spark.table(name)``.

    ``state_partitions`` sizes the stateful operators' shuffle (= state
    store instance count, fixed for the query's lifetime at first
    start). State volume scales with DISTINCT GROUPS, not input rows —
    a windowed agg over 100 TB with a few thousand active windows still
    carries tiny state — so callers size this to their keyspace instead
    of inheriting the input-sized session default; each state store
    instance costs per-trigger setup/commit, which dominates small
    triggers (measured ~0.5 s/trigger at 32 stores vs 8 locally).
    """
    spark = df.sparkSession
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        name = f"mb_{uuid.uuid4().hex[:12]}"
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # the conf is captured at query start; restore immediately
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination(timeout_sec)
    log_executed_plan(q)
    return name, q


def run_microbatch(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    trigger_interval: str | None = None,
    available_now: bool = True,
    timeout_sec: int = 120,
    output_mode: str | None = None,
    state_partitions: int | None = None,
) -> StreamingQuery:
    """foreachBatch runner — the programmatic sink the reference's test
    loop emulates by iterating ``execute_stream`` batches
    (`/root/reference/tests/basic_tests.rs:63-72`).

    ``output_mode`` must be set (to "update") when the plan contains an
    update-mode stateful operator — the UnsupportedOperationChecker
    validates the operator against the SINK's mode, and foreachBatch
    defaults to append. ``state_partitions`` sizes the state-store
    shuffle exactly as in run_drain_to_memory (captured at query start,
    restored immediately)."""
    spark = df.sparkSession
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        writer = df.writeStream.foreachBatch(batch_fn).option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_")
        )
        if output_mode is not None:
            writer = writer.outputMode(output_mode)
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        q = writer.start()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination(timeout_sec)
    log_executed_plan(q)
    return q


def rate_micro_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Unbounded test stream (rate source) for trigger/backpressure tests
    — stands in for a live Kafka topic in broker-free environments."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def run_drain_until(
    df: DataFrame,
    done: Callable[[SparkSession, str], bool],
    output_mode: str = "complete",
    trigger_interval: str = "100 milliseconds",
    timeout_sec: int = 120,
    state_partitions: int | None = None,
) -> tuple[str, StreamingQuery]:
    """Drain with a REAL processing-time trigger loop until a caller
    predicate observes completion, then stop — for sources that do not
    support Trigger.AvailableNow (Python DataSourceStreamReader falls
    back to single-batch under it, silently ignoring per-trigger
    limits). This is the closest Spark mapping of the reference's
    drain-then-stop EOF loop for a genuinely rate-limited source: the
    engine replans micro-batches at the trigger cadence and the
    caller decides when the stream has caught up (e.g. all input rows
    visible in the sink)."""
    import time as _time

    spark = df.sparkSession
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        name = f"mb_{uuid.uuid4().hex[:12]}"
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="dfs_ckpt_"))
            .trigger(processingTime=trigger_interval)
            .start()
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    deadline = _time.monotonic() + timeout_sec
    while _time.monotonic() < deadline:
        try:
            if done(spark, name):
                break
        except Exception:
            pass  # sink table not materialized yet
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(timeout_sec)
    log_executed_plan(q)
    return name, q
