"""File-format source layer (SURVEY.md §2.3 'File scans / formats').

The reference inherits format support from DataFusion (avro feature
flag only, never exercised — `/root/reference/Cargo.toml:7`); Spark
provides parquet/csv/json natively (avro via the spark-avro package,
not bundled in this container — gated behind a try).

All readers return plain DataFrames so Catalyst's pushdown/pruning
applies wherever the format supports it (parquet: filters+columns;
csv/json: column pruning and, for csv, filter skipping at parse time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan. Always pass a schema in production: schema inference
    is a full extra pass over the data — unacceptable at 100 TB."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan; same schema discipline as CSV."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — requires the spark-avro package (the reference's only
    format flag, `/root/reference/Cargo.toml:7`). Raises a clear error
    when the package is absent (as in this container)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "avro support needs the org.apache.spark:spark-avro package on the classpath; "
            "for null/deflate/snappy container files, format('avro_py') "
            "(datafusion_streams_spark.sources.avro_py, pure Python, no jar) reads and writes "
            "without it"
        ) from exc
