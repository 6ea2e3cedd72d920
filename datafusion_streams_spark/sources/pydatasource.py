"""A pluggable Kafka-style micro-batch source (Spark 4 Python DataSource).

The reference's whole contribution is a custom pluggable source: a
``KafkaExecutionPlan`` registered into DataFusion that turns a Kafka
topic into per-partition record batches with a fixed binary schema and
a per-micro-batch replan hook
(`/root/reference/src/kafka/execution.rs:31,47-49,62-112,119-132`).
SURVEY.md §7 maps that to Spark's extension point for the same job:
``spark.dataSource.register`` + the DataSource API. This module is that
mapping, broker-free: messages are derived deterministically from the
``events`` fixture exactly like ``kafka_like_from_events`` (generator
format from the reference's own test fixture,
`/root/reference/tests/utils.rs:214-220`).

Parity with the reference operator, point by point:
  - fixed binary (key, value) schema -> ``schema()`` declares binary
    columns; absent payloads are empty bytes, never NULL
    (`src/kafka/execution.rs:137,140`)
  - one consumer task per Kafka partition
    (``UnknownPartitioning(3)``, `execution.rs:47-49`) -> ``partitions()``
    returns N_PARTITIONS splits; Spark schedules one task each
  - micro-batch row cap (`execution.rs:87`) -> the stream reader's
    ``latestOffset`` advances at most ``maxRowsPerBatch`` per trigger
    (the planner-side half of the bound; the time half is the trigger)
  - start-at-beginning (`execution.rs:77-79`) -> ``initialOffset`` = 0
  - drain-then-stop on EOF (`execution.rs:93-96`) -> AvailableNow over
    the bounded fixture

Executors read the parquet directly with pyarrow (no driver fan-out);
each split reads the id range/stripe it owns — the same
data-local-per-partition shape as the reference's consumer tasks.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

N_PARTITIONS = 3  # mirrors the reference's UnknownPartitioning(3)
DEFAULT_MAX_ROWS_PER_BATCH = 20_000


def _event_ids(path: str) -> list[int]:
    import pyarrow.parquet as pq

    col = pq.read_table(path, columns=["event_id"]).column("event_id")
    return sorted(col.to_pylist())


def _batches_for_ids(ids, batch_rows: int = 8192):
    """Arrow RecordBatches for a split's message ids — the DataSource
    channel ships these columnar instead of pickling per-row tuples
    (measured 2.4x/1.5x on the avro paths when r7 made the same
    conversion there). key "Key {id}" / value "Message {id}" — the
    reference's generator (`tests/utils.rs:214-220`); partition =
    id % N (sticky like a keyed producer), offset = position within
    the partition."""
    import pyarrow as pa

    for off in range(0, len(ids), batch_rows):
        chunk = ids[off : off + batch_rows]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([f"Key {i}".encode() for i in chunk], type=pa.binary()),
                pa.array([f"Message {i}".encode() for i in chunk], type=pa.binary()),
                pa.array([int(i) % N_PARTITIONS for i in chunk], type=pa.int32()),
                pa.array([int(i) // N_PARTITIONS for i in chunk], type=pa.int64()),
            ],
            names=["key", "value", "partition", "offset"],
        )


class _Split(InputPartition):
    def __init__(self, part_id: int, start: int, end: int):
        self.part_id = part_id
        self.start = start
        self.end = end


class KafkaEmuBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [_Split(p, 0, 1 << 62) for p in range(N_PARTITIONS)]

    def read(self, split: _Split):
        ids = [
            i
            for i in _event_ids(self.path)
            if i % N_PARTITIONS == split.part_id and split.start <= i // N_PARTITIONS < split.end
        ]
        yield from _batches_for_ids(ids)


class KafkaEmuStreamReader(DataSourceStreamReader):
    """Micro-batch planner: offsets are per-partition row positions, and
    each trigger admits at most maxRowsPerBatch new rows in total —
    the reference's batch-size bound at the planning layer."""

    def __init__(self, options):
        self.path = options["path"]
        self.max_rows = int(options.get("maxRowsPerBatch", DEFAULT_MAX_ROWS_PER_BATCH))
        per_part = [0] * N_PARTITIONS
        for i in _event_ids(self.path):
            per_part[i % N_PARTITIONS] += 1
        self._eof = per_part  # rows available per partition (bounded fixture)
        self._cursor = {str(p): 0 for p in range(N_PARTITIONS)}

    def initialOffset(self):
        return {str(p): 0 for p in range(N_PARTITIONS)}

    def latestOffset(self):
        # called once per trigger (no args in this API level): advance
        # the driver-held cursor by an equal per-partition share of the
        # row cap. NOTE: under Trigger.AvailableNow the drain target is
        # the FIRST latestOffset result, so cap-bounded reads pair with
        # processingTime triggers; drain mode runs uncapped.
        share = max(1, self.max_rows // N_PARTITIONS)
        self._cursor = {
            str(p): min(self._eof[p], self._cursor[str(p)] + share)
            for p in range(N_PARTITIONS)
        }
        return dict(self._cursor)

    def partitions(self, start, end):
        return [
            _Split(p, int(start.get(str(p), 0)), int(end.get(str(p), 0)))
            for p in range(N_PARTITIONS)
        ]

    def read(self, split: _Split):
        ids = [
            i
            for i in _event_ids(self.path)
            if i % N_PARTITIONS == split.part_id and split.start <= i // N_PARTITIONS < split.end
        ]
        yield from _batches_for_ids(ids)

    def commit(self, end):
        pass  # bounded fixture; nothing to clean up


class KafkaEmuDataSource(DataSource):
    """``spark.read.format("kafka_emu").option("path", ...)`` — batch
    and streaming scans of the emulated topic."""

    @classmethod
    def name(cls):
        return "kafka_emu"

    def schema(self):
        return "key binary, value binary, partition int, offset bigint"

    def reader(self, schema):
        return KafkaEmuBatchReader(self.options)

    def streamReader(self, schema):
        return KafkaEmuStreamReader(self.options)


def register_kafka_emu(spark) -> None:
    """Idempotent registration of the pluggable source.

    Registered for pickle-BY-VALUE (see pysink.register_manifest_sink):
    executor Python workers cannot re-import this package unless the
    driver's working directory happens to be the repo root — by-value
    serialization ships the reader code with the task instead."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        spark.dataSource.register(KafkaEmuDataSource)
    except Exception:
        pass  # already registered in this session
