"""UDF / UDAF / UDTF surface (SURVEY.md §2.3 last row) — each flavor
exercised once, with the scale caveat encoded in the choice: Arrow
paths (pandas_udf) for anything per-row-ish, plain Python only at
driver-negligible cardinalities."""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from tests.conftest import SF_DIR_SMALL


def test_pandas_udaf_grouped_agg(spark):
    """Grouped-aggregate pandas UDF (vectorized UDAF): geometric mean of
    order totals per priority, validated against log-mean-exp."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    o = spark.read.parquet(f"{SF_DIR_SMALL}/orders.parquet")
    got = {
        r.o_orderpriority: r.gm
        for r in o.groupBy("o_orderpriority").agg(geo_mean("o_totalprice").alias("gm")).collect()
    }
    rows = o.select("o_orderpriority", "o_totalprice").collect()
    by_prio: dict[str, list[float]] = {}
    for r in rows:
        by_prio.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for prio, vals in by_prio.items():
        expected = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert math.isclose(got[prio], expected, rel_tol=1e-9), prio


def test_python_udtf_explode_ranges(spark):
    """Python UDTF (Spark 3.5+/4): one input row -> many output rows,
    the table-function form of operators like sessionize/expand."""

    @udtf(returnType="bucket: int, lo: double, hi: double")
    class PriceBuckets:
        def eval(self, price: float, n: int):
            step = price / n
            for i in range(n):
                yield i, i * step, (i + 1) * step

    spark.udtf.register("price_buckets", PriceBuckets)
    out = spark.sql("SELECT * FROM price_buckets(CAST(100.0 AS DOUBLE), 4)").collect()
    assert len(out) == 4
    assert out[0].lo == 0.0 and out[3].hi == 100.0


def test_scalar_pandas_udf_tokenize(spark):
    """Scalar Arrow UDF over document text — the shape of every custom
    per-document scorer; validated against the JVM-side equivalent."""

    @pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.lower().str.split(r"\s+").map(len)

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    joined = docs.select(
        "doc_id",
        n_tokens("text").alias("py_tokens"),
        F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("jvm_tokens"),
    )
    mismatches = joined.filter(F.col("py_tokens") != F.col("jvm_tokens")).count()
    assert mismatches == 0
