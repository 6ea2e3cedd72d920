"""Operator/query registry.

Every operator from SURVEY.md §2 (plus the north-star LLM-pipeline
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` paired with an equivalent DuckDB
oracle SQL string (or ``None`` for genuinely non-SQL-expressible ops,
which downgrade to a rows-only check).

Parity contract: the Spark result and the oracle result must match on
column names, schema, and an order-insensitive value hash. All float
aggregates therefore route through exact decimal arithmetic (see
``datafusion_streams_spark.functions``) and all float folds are
deterministic left-to-right reductions mirrored verbatim in the SQL.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver (and any embedding application) supplies its own
# SparkSession; these SQL confs are required for correctness parity and
# are safe to set per-session at runtime. Applied before every query:
#   - timeZone UTC: timestamp semantics must match the DuckDB oracle
#   - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), unreadable
#     by Spark otherwise (converted in catalog.load_events)
#   - AQE/arrow/broadcast: the execution posture the plans assume
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf in this deployment — session.py already set it


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


REGISTRY: "OrderedDict[str, QuerySpec]" = OrderedDict()


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation + its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, tags=tags)
        return fn

    return deco


def _populate() -> None:
    # Import for side effects: each module registers its queries.
    from datafusion_streams_spark.operators import (  # noqa: F401
        reference,
        relational,
        tpch_extended,
        sql_surface,
        temporal,
        windows,
        dedup,
        similarity,
        text,
        multimodal,
        pipeline,
    )
    from datafusion_streams_spark.streaming import queries as streaming_queries  # noqa: F401


_populate()
