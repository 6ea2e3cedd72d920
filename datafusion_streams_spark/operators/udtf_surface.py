"""Python UDTF surface as a registered, oracle-checked query.

The reference has zero UDF surface (its plans are fixed Rust operator
trees); Spark's table-function extension point is part of the inherited
relational envelope (SURVEY.md §2.3 last row) and was previously
exercised only in tests/test_udf_surface.py. This registers a real
LATERAL table function — overlapping token-window extraction, one input
row fanning out to many output rows — with a DuckDB unnest mirror, so
the driver can hash-check the UDTF execution path end-to-end.

Scale posture: a Python UDTF is row-at-a-time over Arrow-shipped
batches — the SLOW path by design (this query exists to pin the
extension point's semantics, not to win benchmarks). The JVM-side
equivalent of the same shape is text_chunking (explode over
stride-spaced slices, map-only); a user migrating custom imperative
chunkers starts here and graduates there. Parallelism is
per-partition as usual: the UDTF runs inside each task, no shuffle is
introduced beyond the source scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from datafusion_streams_spark.catalog import load_documents
from datafusion_streams_spark.operators import query

# Deliberately different window geometry from text_chunking (40/30):
# both queries must stay independently derivable.
WINDOW_TOKENS = 16
WINDOW_STRIDE = 12

_UDTF_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
    FROM documents
),
sized AS (
    SELECT doc_id, tk,
        CASE WHEN len(tk) > {WINDOW_TOKENS}
             THEN CAST(ceil((len(tk) - {WINDOW_TOKENS}) / {WINDOW_STRIDE}.0) AS BIGINT) + 1
             ELSE 1 END AS n_windows
    FROM t WHERE len(tk) > 0
),
ex AS (
    SELECT doc_id, tk, unnest(range(1, n_windows + 1)) AS w FROM sized
)
SELECT doc_id,
    CAST(w AS BIGINT) AS window_idx,
    array_to_string(list_slice(tk, (w-1)*{WINDOW_STRIDE} + 1, (w-1)*{WINDOW_STRIDE} + {WINDOW_TOKENS}), ' ') AS window_text,
    CAST(len(list_slice(tk, (w-1)*{WINDOW_STRIDE} + 1, (w-1)*{WINDOW_STRIDE} + {WINDOW_TOKENS})) AS BIGINT) AS n_tokens
FROM ex
"""


@query("udtf_token_windows", oracle=_UDTF_ORACLE, tags=("udf", "udtf", "text", "lateral"))
def udtf_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL Python UDTF: overlapping {16-token, stride-12} windows
    per document — (doc_id, window_idx, window_text, n_tokens), one
    input row to ceil((n-16)/12)+1 output rows. The DuckDB oracle
    derives the identical relation declaratively (regexp split +
    range unnest + list_slice), proving the UDTF path — pickled class
    shipped to Python workers, row-at-a-time eval with a generator
    body, lateral join binding columns from the outer relation —
    computes exactly what the declarative mirror does.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id: bigint, window_idx: bigint, window_text: string, "
            "n_tokens: bigint"
        )
    )
    class TokenWindows:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            toks = [t for t in re.split(r"\s+", text) if t]
            n = len(toks)
            if n == 0:
                return
            if n > WINDOW_TOKENS:
                n_windows = -(-(n - WINDOW_TOKENS) // WINDOW_STRIDE) + 1
            else:
                n_windows = 1
            for w in range(n_windows):
                piece = toks[w * WINDOW_STRIDE : w * WINDOW_STRIDE + WINDOW_TOKENS]
                yield doc_id, w + 1, " ".join(piece), len(piece)

    spark.udtf.register("dfs_token_windows", TokenWindows)
    load_documents(spark, sf_dir).createOrReplaceTempView("dfs_udtf_docs")
    return spark.sql(
        "SELECT s.* FROM dfs_udtf_docs, LATERAL dfs_token_windows(doc_id, text) s"
    )
