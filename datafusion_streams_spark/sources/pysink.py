"""A pluggable manifest-committing sink (Spark 4 Python DataSource
writer API) — the writer-side twin of ``pydatasource``.

The reference's only sink is a console print inside its test
(`/root/reference/tests/basic_tests.rs:67`); its architecture, though,
is "register a custom plan into the engine" — and Spark 4's DataSource
API exposes exactly that extension point for WRITES as well as reads.
This module exercises it end to end:

  - per-task writes: each partition writes one parquet part file and
    returns a ``WriterCommitMessage`` carrying (path, rows) — the
    task-side half of a two-phase commit;
  - atomic commit: the driver's ``commit(messages)`` writes a single
    ``_MANIFEST.json`` listing exactly the files of the successful
    attempt — readers that go through the manifest never observe
    partial/zombie task output (same contract as the parquet sink's
    ``_spark_metadata`` commit log, here implemented in ~30 lines of
    user code);
  - ``abort()`` removes orphans on failure.

The streaming variant (``streamWriter``) appends one manifest entry
per micro-batch keyed by ``batchId`` — replayed batches overwrite
their own entry, which is what makes a foreachBatch-style sink
idempotent under at-least-once delivery.

At 100 TB the same shape holds with an object store substituted for
the local filesystem: tasks upload parts, the driver commits one
manifest object; atomicity rides on the single manifest PUT, never on
listing consistency.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


class PartFileCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


def _write_part(path_dir: str, batches) -> PartFileCommit:
    """Write one partition's Arrow RecordBatches as a parquet part file
    (executor-side pyarrow, zero row-wise conversion: Spark hands the
    task columnar batches and they go straight to the parquet encoder).
    Empty partitions commit an empty message instead of a zero-column
    file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    batches = [b for b in batches if b.num_rows >= 0]
    if not batches or sum(b.num_rows for b in batches) == 0:
        return PartFileCommit("", 0)
    table = pa.Table.from_batches(batches)
    part = f"part-{uuid.uuid4().hex}.parquet"
    pq.write_table(table, os.path.join(path_dir, part))
    return PartFileCommit(part, table.num_rows)


class ManifestBatchWriter(DataSourceArrowWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, list(iterator))

    def commit(self, messages):
        manifest = {
            "files": [
                {"path": m.path, "rows": m.rows} for m in messages if m and m.path
            ],
            "total_rows": sum(m.rows for m in messages if m),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except OSError:
                    pass


class ManifestStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, list(iterator))

    def commit(self, messages, batchId):
        entry = {
            "batchId": batchId,
            "files": [
                {"path": m.path, "rows": m.rows} for m in messages if m and m.path
            ],
        }
        # one manifest entry per batch id: a replayed batch overwrites
        # its own entry (idempotent under at-least-once restart)
        with open(os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w") as f:
            json.dump(entry, f)

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except OSError:
                    pass


class ManifestSinkDataSource(DataSource):
    """format("manifest_sink") — writer-only data source."""

    @classmethod
    def name(cls):
        return "manifest_sink"

    def writer(self, schema, overwrite):
        return ManifestBatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return ManifestStreamWriter(self.options)


def register_manifest_sink(spark) -> None:
    """Idempotent registration of the pluggable sink.

    The writer classes are registered for pickle-BY-VALUE: executors'
    Python workers inherit the driver process's environment, not its
    sys.path, so a driver embedding this package from an arbitrary
    working directory would otherwise hand workers a class they cannot
    re-import (ModuleNotFoundError at task start). By-value
    serialization ships the code with the task — the deployment story
    a pluggable sink needs anyway (no package install on executors)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:
        pass  # already registered in this session


def manifest_files(path: str) -> list[str]:
    """Committed part files per the manifest(s) — the only sanctioned
    way to read this sink's output."""
    out: list[str] = []
    for name in sorted(os.listdir(path)):
        if name == "_MANIFEST.json" or (
            name.startswith("_MANIFEST-") and name.endswith(".json")
        ):
            with open(os.path.join(path, name)) as f:
                out.extend(e["path"] for e in json.load(f)["files"])
    return [os.path.join(path, p) for p in out]
