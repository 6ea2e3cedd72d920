"""Embedding similarity search over the ``embeddings`` table.

Three operators:
  - ann_topk_bruteforce: exact cosine top-k (the correctness baseline)
  - similarity_pairs:    all pairs above a cosine threshold
  - ann_lsh_bucketed:    sign-random-projection LSH -> bucket join ->
                         verified pairs (the scale path)

Float determinism: cosine is computed as a strict left-to-right fold
over double-cast arrays (see functions.dot) and the DuckDB oracle uses
``list_reduce`` — also a left fold — over the same double values, so
scores are bit-identical and rankings cannot diverge.

Scale posture: brute force is O(n_queries x n_corpus) — fine for a
broadcast query set, wrong for all-pairs at 100 TB. The LSH variant
bounds the join to same-bucket candidates; its hyperplanes are
compile-time constants (md5-derived +-1 vectors), so both engines and
every executor agree on them with zero coordination.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_streams_spark.functions import (
    as_double_array,
    cosine,
    dot,
    round6_micro,
    round6_ratio,
    sql_round6_micro,
    sql_round6_ratio,
)
from datafusion_streams_spark.operators import query

EMBED_DIM = 64
N_SIGN_BANDS = 4  # bands of sign bits; bucket keys concat one band's bits
BASE_BITS_PER_BAND = 4  # at fixture scale (the static oracle mirrors this)
BASE_LSH_ROWS = 5000  # largest fixture corpus (sf0.1)
N_PLANES = N_SIGN_BANDS * BASE_BITS_PER_BAND  # plane count at fixture scale
TOP_K = 5
PAIR_THRESHOLD = 0.4


def lsh_bits_per_band(n_rows: int, base_rows: int = BASE_LSH_ROWS) -> int:
    """Sign bits per band as a function of corpus size.

    Per-band collision probability for unrelated vectors is ~2^-bits,
    so expected candidates ~ n^2 * bands * 2^-bits. Growing bits by
    log2(n / base) keeps that ~linear in n — the parametric rule
    SCALE_NOTES.md derives. At or below ``base_rows`` (default: the
    largest fixture) this returns BASE_BITS_PER_BAND, which the static
    DuckDB oracle mirrors (the oracle is generated for the fixture
    configuration; parity is checked at fixture sizes by construction).
    """
    import math

    if n_rows <= base_rows:
        return BASE_BITS_PER_BAND
    return BASE_BITS_PER_BAND + math.ceil(math.log2(n_rows / base_rows))


def _sign_planes(n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic +-1 hyperplanes from md5 parity — public-knowledge
    sign-random-projection LSH (Charikar, STOC 2002) with a seedable,
    engine-independent source of randomness."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(EMBED_DIM):
            digest = hashlib.md5(f"{j}_{i}".encode()).hexdigest()
            row.append(1.0 if int(digest[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


SIGNS = _sign_planes()


def _dot_sql(a: str, b: str) -> str:
    """SQL mirror of functions.dot: left-to-right fold, init-equivalent
    (0.0 + x1 == x1 bitwise, so list_reduce's first-element seed matches
    Spark aggregate's 0.0 seed)."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]), "
        "(acc, x) -> acc + x)"
    )


def _cosine_sql(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"


# Normalize once per vector, then pair score is a single fold. Both
# engines perform the identical per-element division then the identical
# left fold, so scores stay bit-identical — and per-pair cost drops 3x
# (the norm folds move out of the O(n^2) loop). This is the formulation
# that survives scale: normalization is map-side and cacheable.
_NORMALIZED_SQL = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (
    SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
    FROM (SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm FROM e)
)
"""


def _normalized_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, vn): unit-normalized double vectors — Spark mirror of
    _NORMALIZED_SQL (same division, same element order)."""
    from datafusion_streams_spark.functions import l2_norm

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    # repartition: the single-file fixture scan is one split; spread the
    # normalize + downstream pair folds across all cores (a real-scale
    # table arrives pre-split).
    return (
        e.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
        .select("vec_id", F.transform("v", lambda x: x / F.col("nrm")).alias("vn"))
    )


# ---------------------------------------------------------------------------
# brute-force top-k
# ---------------------------------------------------------------------------

_ANN_ORACLE = f"""
WITH {_NORMALIZED_SQL.strip()},
q AS (SELECT vec_id AS q_id, vn AS qn FROM n WHERE vec_id < 10),
scored AS (
    SELECT q.q_id, n.vec_id AS neighbor_id,
           {_dot_sql('q.qn', 'n.vn')} AS score
    FROM q CROSS JOIN n
    WHERE n.vec_id <> q.q_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY q_id ORDER BY score DESC, neighbor_id
    ) AS BIGINT) AS rn
    FROM scored
)
SELECT q_id, neighbor_id, score, rn FROM ranked WHERE rn <= {TOP_K}
"""


@query("ann_topk_bruteforce", oracle=_ANN_ORACLE, tags=("similarity", "ann", "window"))
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for each query vector (vec_id < 10).

    Scale: the query set broadcasts (it is small by construction); the
    corpus streams through map tasks — no corpus shuffle. The top-k
    window partitions by query id, so state is k rows per query.
    """
    n = _normalized_df(spark, sf_dir)
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vn").alias("qn")
    )
    scored = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qn"), F.col("vn")).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# threshold pairs (brute force)
# ---------------------------------------------------------------------------

_PAIRS_ORACLE = f"""
WITH {_NORMALIZED_SQL.strip()}
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_dot_sql('a.vn', 'b.vn')} AS score
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_dot_sql('a.vn', 'b.vn')} >= {PAIR_THRESHOLD}
"""


# Hard ceiling for the quadratic baselines: 20k vectors = 400M candidate
# pairs, the most a correctness baseline should ever attempt. Real
# corpora go through ann_lsh_bucketed (sub-quadratic) or
# similarity_pairs_vectorized (block-partitioned, distributed O(n^2)).
MAX_QUADRATIC_ROWS = 20_000


def _fence_quadratic(spark: SparkSession, sf_dir: str, op: str) -> None:
    """Refuse to run an all-pairs baseline on a corpus it cannot handle.

    The count is a parquet metadata scan (no column IO), so the guard
    costs one cheap job and prevents a silent O(n^2) blow-up when
    someone points the baseline at a production-sized table."""
    n_rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    if n_rows > MAX_QUADRATIC_ROWS:
        raise ValueError(
            f"{op}: corpus has {n_rows} vectors > {MAX_QUADRATIC_ROWS}; "
            "this operator is the quadratic correctness baseline — use "
            "ann_lsh_bucketed (sub-quadratic) or "
            "similarity_pairs_vectorized (block-partitioned) instead"
        )


@query("similarity_pairs", oracle=_PAIRS_ORACLE, tags=("similarity", "join"))
def similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.4 (brute-force; the LSH
    variant below is the scale path for the same semantics).

    Guarded: refuses corpora beyond MAX_QUADRATIC_ROWS — the broadcast
    nested-loop theta join is the correctness baseline, not a scale
    path.

    Normalize-then-dot: norms are computed once per vector (map-side),
    so each of the O(n^2) pairs costs a single fold."""
    _fence_quadratic(spark, sf_dir, "similarity_pairs")
    n = _normalized_df(spark, sf_dir)
    a = n.select(F.col("vec_id").alias("a_id"), F.col("vn").alias("an"))
    b = n.select(F.col("vec_id").alias("b_id"), F.col("vn").alias("bn"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", dot(F.col("an"), F.col("bn")).alias("score"))
        .filter(F.col("score") >= PAIR_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# sign-LSH bucketed pairs
# ---------------------------------------------------------------------------


def _signs_sql(j: int) -> str:
    vals = ", ".join(str(s) for s in SIGNS[j])
    return f"([{vals}]::DOUBLE[])"  # parens: the literal is indexed as x[i]


def lsh_ctes() -> str:
    """The sign-LSH pipeline as a reusable SQL WITH-body ending in
    ``lsh_pairs`` (verified same-bucket pairs) — shared by the
    standalone query's oracle and the embedding-dedup oracle."""
    bit_cols = ",\n        ".join(
        f"CASE WHEN {_dot_sql('v', _signs_sql(j))} > 0 THEN 1 ELSE 0 END AS b{j}"
        for j in range(N_PLANES)
    )
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT vec_id, {band} AS band, "
        "CAST(b{i0} AS VARCHAR) || CAST(b{i1} AS VARCHAR) || CAST(b{i2} AS VARCHAR) || CAST(b{i3} AS VARCHAR) AS bkey "
        "FROM sig".format(band=b, i0=4 * b, i1=4 * b + 1, i2=4 * b + 2, i3=4 * b + 3)
        for b in range(N_SIGN_BANDS)
    )
    return f"""{_NORMALIZED_SQL.strip()},
sig AS (
    SELECT vec_id, v,
        {bit_cols}
    FROM e
),
bands AS (
{band_selects}
),
cand AS (
    SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
),
lsh_pairs AS (
    SELECT c.a_id, c.b_id, {_dot_sql('na.vn', 'nb.vn')} AS score
    FROM cand c
    JOIN n na ON c.a_id = na.vec_id
    JOIN n nb ON c.b_id = nb.vec_id
    WHERE {_dot_sql('na.vn', 'nb.vn')} >= {PAIR_THRESHOLD}
)"""


def _lsh_oracle() -> str:
    return f"""
WITH {lsh_ctes()}
SELECT a_id, b_id, score FROM lsh_pairs
"""


def _lsh_signature_df(emb: DataFrame, n_bands: int, bits: int) -> DataFrame:
    """(vec_id, vn, b0..b{planes-1}) — plane bits + unit-normalized
    vector in ONE Arrow-batched numpy pass with a sequential dimension
    loop — bit-identical to the interpreted left-to-right fold the
    oracle replays (elementwise SIMD ops never reassociate the
    per-vector accumulation order), but ~an order of magnitude cheaper
    than planes+1 interpreted HOF folds per row. Bits come from the RAW
    vector (not vn) to stay bitwise-faithful to the oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    n_planes = n_bands * bits
    signs = np.array(_sign_planes(n_planes), dtype=np.float64)  # (planes, dim)
    sig_schema = StructType(
        [StructField("vec_id", LongType()), StructField("vn", ArrayType(DoubleType()))]
        + [StructField(f"b{j}", IntegerType()) for j in range(n_planes)]
    )

    def compute_sig(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            n, dim = v.shape
            # sequential sums == left folds, bitwise
            nrm = np.sqrt(np.cumsum(v * v, axis=1)[:, -1])
            vn = v / nrm[:, None]
            acc = np.zeros((n, signs.shape[0]), dtype=np.float64)
            for i in range(dim):
                acc += v[:, i][:, None] * signs[None, :, i]
            bits_m = (acc > 0).astype(np.int32)
            out = {"vec_id": ids, "vn": list(vn)}
            for j in range(signs.shape[0]):
                out[f"b{j}"] = bits_m[:, j]
            yield pd.DataFrame(out)

    return emb.select("vec_id", "embedding").mapInPandas(compute_sig, sig_schema)


def _lsh_candidates(sig: DataFrame, n_bands: int, bits: int) -> DataFrame:
    """Distinct same-bucket pairs: explode each row into its band keys,
    equi-join on (band, key). Bucket keys are uniform by construction,
    so the join shuffle is balanced at any corpus size."""
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "",
                            *[F.col(f"b{bits * b + i}").cast("string") for i in range(bits)],
                        ).alias("bkey"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
        .distinct()
    )


def _lsh_bucket_scored_pairs(sig: DataFrame, n_bands: int, bits: int) -> DataFrame:
    """Verified pairs scored INSIDE each (band, bucket) group.

    Each bucket's vectors ship through Arrow exactly once per band
    (total volume ~ n_bands * corpus, NOT per candidate pair), and the
    intra-bucket pair tile is scored with the sequential-accumulation
    numpy fold — bitwise the oracle's left fold. A pair colliding in
    multiple bands produces byte-identical score rows (same fold, same
    doubles), so the final distinct() collapses them to the oracle's
    DISTINCT candidate semantics. Bucket sizes stay bounded because
    bits grow with n (lsh_bits_per_band), so the per-group tile is
    O((n / 2^bits)^2) regardless of corpus size.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    bands = sig.select(
        "vec_id",
        "vn",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "",
                            *[F.col(f"b{bits * b + i}").cast("string") for i in range(bits)],
                        ).alias("bkey"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "vn", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))

    out_schema = StructType(
        [
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def score_bucket(pdf):
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "score": []})
        vn = np.array(list(pdf["vn"]), dtype=np.float64)
        acc = np.zeros((len(ids), len(ids)), dtype=np.float64)
        for k in range(vn.shape[1]):
            acc += vn[:, k][:, None] * vn[None, :, k]
        li, ri = np.nonzero((ids[:, None] < ids[None, :]) & (acc >= PAIR_THRESHOLD))
        return pd.DataFrame({"a_id": ids[li], "b_id": ids[ri], "score": acc[li, ri]})

    return bands.groupBy("band", "bkey").applyInPandas(score_bucket, out_schema).distinct()


@query("ann_lsh_bucketed", oracle=_lsh_oracle(), tags=("similarity", "lsh", "join"))
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH: hyperplane bits -> banded bucket keys
    -> intra-bucket pair scoring -> cosine threshold at >= 0.4.

    Scale: replaces the all-pairs join with per-bucket tiles whose
    keys are uniform by construction; scoring is vectorized numpy
    (sequential accumulation — bitwise the oracle's fold) and touches
    only bucket collisions. Bits per band GROW with the corpus
    (``lsh_bits_per_band``: +log2(n/base) beyond fixture scale), which
    keeps expected candidates ~linear in n — demonstrated sub-quadratic
    in tests/test_scale_behaviors.py. At fixture sizes the
    configuration is 4 bands x 4 bits, which the static oracle replays
    bit-for-bit (recall there: P(candidate | cos=0.5) ~ 0.59).
    """
    return _lsh_pairs_df(spark, sf_dir)


def _lsh_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified sign-LSH cosine pairs (>= PAIR_THRESHOLD) — the Spark
    mirror of ``lsh_ctes``'s ``lsh_pairs``, shared by
    ``ann_lsh_bucketed`` and ``dedup_embedding_cosine``."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bits = lsh_bits_per_band(emb.count())  # metadata-cheap count
    sig = _lsh_signature_df(emb.repartition(spark.sparkContext.defaultParallelism, "vec_id"), N_SIGN_BANDS, bits)
    return _lsh_bucket_scored_pairs(sig, N_SIGN_BANDS, bits)


_EMBEDDING_DEDUP_ORACLE = f"""
WITH RECURSIVE {lsh_ctes()},
edges AS (
    SELECT a_id AS src, b_id AS dst FROM lsh_pairs
    UNION
    SELECT b_id AS src, a_id AS dst FROM lsh_pairs
),
reach(src, node) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
)
SELECT src AS vec_id, CAST(LEAST(src, MIN(node)) AS BIGINT) AS canonical_id
FROM reach GROUP BY src
"""


@query(
    "dedup_embedding_cosine",
    oracle=_EMBEDDING_DEDUP_ORACLE,
    tags=("dedup", "similarity", "lsh", "graph", "iterative"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: every vector in a cosine-similarity
    cluster (sign-LSH pairs >= 0.4) mapped to the cluster's canonical
    (minimum) vec_id — semantic dedup's keeper-selection step, the
    embedding-space sibling of ``dedup_components``.

    Scale: pair finding is the sub-quadratic bucketed LSH path;
    clustering is checkpointed min-label propagation over the
    (candidate-pair-sized) edge list — see
    ``dedup.min_label_components``. The DuckDB oracle replays the
    identical bucketing and computes the same fixpoint via a recursive
    transitive-closure CTE.
    """
    from datafusion_streams_spark.operators.dedup import min_label_components

    pairs = _lsh_pairs_df(spark, sf_dir).select("a_id", "b_id")
    return min_label_components(pairs, id_col="vec_id")


# ---------------------------------------------------------------------------
# vectorized scale path (Arrow/numpy) — rows-only check
# ---------------------------------------------------------------------------


# Ranking-only oracle: the strict-fold _ANN_ORACLE with the score
# projected OUT. The BLAS path's summation order differs from the
# strict fold in the last float bits, so the score column can never be
# hash-identical — but the RANKING is (asserted additionally against
# the bruteforce in tests), and (q_id, neighbor_id, rn) is exactly the
# answer an ANN caller consumes. This upgrades the query from a
# rows-only check to a real hash-checked CORRECTNESS row.
_ANN_RANKING_ORACLE = f"""
WITH {_NORMALIZED_SQL.strip()},
q AS (SELECT vec_id AS q_id, vn AS qn FROM n WHERE vec_id < 10),
scored AS (
    SELECT q.q_id, n.vec_id AS neighbor_id,
           {_dot_sql('q.qn', 'n.vn')} AS score
    FROM q CROSS JOIN n
    WHERE n.vec_id <> q.q_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY q_id ORDER BY score DESC, neighbor_id
    ) AS BIGINT) AS rn
    FROM scored
)
SELECT q_id, neighbor_id, rn FROM ranked WHERE rn <= {TOP_K}
"""


@query(
    "ann_topk_vectorized",
    oracle=_ANN_RANKING_ORACLE,
    tags=("similarity", "ann", "pandas-udf", "scale"),
)
def ann_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-speed exact top-k: numpy matmul inside mapInPandas.

    Same semantics as ann_topk_bruteforce (validated against it in
    tests/test_similarity.py) but ~2 orders of magnitude faster per
    batch: the corpus streams through Arrow batches, each batch is one
    BLAS matmul against the broadcast query matrix, followed by a
    per-query global top-k window. Output is ranking-only
    (q_id, neighbor_id, rn): BLAS summation order perturbs the score's
    last bits vs the strict-fold definition, so the hash-checked
    contract is the ranking — which is identical (also asserted
    against the bruteforce in tests) — not the float score.
    """
    import numpy as np
    import pandas as pd

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_rows = (
        e.filter(F.col("vec_id") < 10).select("vec_id", "embedding").collect()
    )  # tiny by construction: the query set, not the corpus
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def score_batches(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = q_mat @ mat.T  # (n_queries, batch)
            for qi, q_id in enumerate(q_ids):
                mask = ids != q_id
                n = min(TOP_K, mask.sum())
                if n == 0:
                    continue
                row = sims[qi][mask]
                cand = np.argpartition(-row, n - 1)[:n]
                yield pd.DataFrame(
                    {
                        "q_id": q_id,
                        "neighbor_id": ids[mask][cand],
                        "score": row[cand],
                    }
                )

    scored = e.select("vec_id", "embedding").mapInPandas(score_batches, out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "neighbor_id", "rn")
    )


# Target rows per block for the block-partitioned all-pairs scorer: a
# (T x T) float64 score tile is T^2 * 8 bytes — 2048 -> 32 MiB, well
# inside an executor task's working memory.
_BLOCK_TARGET_ROWS = 2048
# Below this many rows a block is too small to amortize its replication
# cost (each row is shuffled B+1 times): the parallelism floor yields to
# corpus size so small corpora don't over-tile (round-2 bench showed the
# 32-core floor forcing ~66 tiles on a 2k-row corpus, doubling cold
# time; a 3-rep sweep at sf0.1 picked 512 — 4 blocks / 10 tiles —
# as the cold+warm optimum, 2.3 s cold vs 4.3 s in round 2).
_MIN_BLOCK_ROWS = 512
# Above this many rows the two-consumer block relation persists
# DISK_ONLY instead of MEMORY_AND_DISK (r15 verdict item 5): a
# corpus-sized cache must never compete with execution memory at scale,
# while fixture-sized corpora keep the in-memory default. At 64-dim
# float64 embeddings, 2M rows ~ 1 GiB of vectors per executor-storage
# replica — the order where spill pressure starts to matter.
_DISK_CACHE_ROWS = 2_000_000


@query("similarity_pairs_vectorized", oracle=_PAIRS_ORACLE, tags=("similarity", "pandas-udf", "scale"))
def similarity_pairs_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine >= 0.4 — block-partitioned Arrow/numpy
    scale path, SAME oracle as similarity_pairs.

    Distribution: each vector lands in block b = vec_id % B; every
    unordered block pair (bi <= bj) becomes one task that scores the
    bi x bj tile. NOTHING is collected to the driver — rows reach
    their block-pair groups via a broadcast join against the tiny
    (B*(B+1)/2)-row combo table, and each executor task holds only its
    two blocks (~2 * _BLOCK_TARGET_ROWS rows). Replication factor is
    B+1 per row — the canonical distributed all-pairs layout: compute
    is inherently O(n^2); memory and shuffle stay O(n * B) with no
    single-machine bottleneck.

    Bit-exactness by construction: scores accumulate as dim sequential
    vectorized outer-product adds (acc += a[:,k] (x) b[:,k] for k in
    order), the identical left-to-right addition chain as the Spark
    fold and DuckDB's list_reduce — elementwise SIMD ops don't
    reassociate the per-pair sum, so the oracle hash still matches.
    Normalization uses the same sequential-cumsum norm for the same
    reason. No BLAS matmul anywhere (matmul reassociates).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # metadata-cheap row count -> number of blocks; B grows with the
    # corpus so tile memory stays constant at any scale. The parallelism
    # floor (~2 tiles per core, tiles = B*(B+1)/2) applies only once the
    # corpus is big enough that blocks stay >= _MIN_BLOCK_ROWS — tiny
    # corpora take a handful of fat tiles instead of paying B+1x
    # replication for parallelism they don't need.
    import math

    n_rows = raw.count()
    cores = spark.sparkContext.defaultParallelism
    b_min = math.ceil((math.sqrt(16 * cores + 1) - 1) / 2)
    # parallelism floor, capped so blocks keep >= _MIN_BLOCK_ROWS rows;
    # the memory ceiling ceil(n/_BLOCK_TARGET_ROWS) always wins at scale
    b_floor = min(b_min, max(1, -(-n_rows // _MIN_BLOCK_ROWS)))
    n_blocks = max(b_floor, -(-n_rows // _BLOCK_TARGET_ROWS))

    combos = spark.createDataFrame(
        [(bi, bj) for bi in range(n_blocks) for bj in range(bi, n_blocks)],
        "bi INT, bj INT",
    )
    # persisted: the L and R branches below each consume this relation,
    # so without it the parquet scan + block tagging runs twice per
    # action (measured r15: two 32-task scan jobs -> one; 3.36 s ->
    # 2.83 s min-of-4 interleaved). Corpus-sized but narrow (id, vector,
    # block tag) — so the StorageLevel is size-gated (r16, making the
    # code match its own 100 TB posture): small corpora keep the
    # MEMORY_AND_DISK default, anything past _DISK_CACHE_ROWS goes
    # DISK_ONLY so a corpus-sized relation never competes with
    # execution memory (guide §5 — cached data vs execution pressure).
    # release_shared_caches() frees it between sweeps either way.
    from pyspark.storagelevel import StorageLevel

    level = (
        StorageLevel.DISK_ONLY
        if n_rows > _DISK_CACHE_ROWS
        else StorageLevel.MEMORY_AND_DISK_DESER
    )
    rows = raw.select(
        "vec_id",
        "embedding",
        (F.col("vec_id") % n_blocks).cast("int").alias("blk"),
    ).persist(level)
    # side L = the row's block is the combo's bi; side R = bj. The
    # diagonal combo (bi == bj) takes the row once, as L.
    left = rows.join(F.broadcast(combos), F.col("blk") == F.col("bi")).withColumn(
        "side", F.lit("L")
    )
    right = (
        rows.join(
            F.broadcast(combos),
            (F.col("blk") == F.col("bj")) & (F.col("bi") != F.col("bj")),
        )
        .withColumn("side", F.lit("R"))
    )
    tagged = left.unionByName(right).select("bi", "bj", "side", "vec_id", "embedding")

    out_schema = StructType(
        [
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def normalize(mat: "np.ndarray") -> "np.ndarray":
        sq = mat * mat
        norms = np.sqrt(np.cumsum(sq, axis=1)[:, -1])  # sequential sum == left fold
        return mat / norms[:, None]

    def tile_scores(a_vn: "np.ndarray", b_vn: "np.ndarray") -> "np.ndarray":
        # sequential accumulation over dimensions == left fold bitwise
        acc = np.zeros((a_vn.shape[0], b_vn.shape[0]), dtype=np.float64)
        for k in range(a_vn.shape[1]):
            acc += a_vn[:, k][:, None] * b_vn[None, :, k]
        return acc

    empty = pd.DataFrame({"a_id": [], "b_id": [], "score": []})

    def score_tile(key, pdf):
        bi, bj = key
        is_l = (pdf["side"] == "L").to_numpy()
        l_ids = pdf["vec_id"].to_numpy(dtype=np.int64)[is_l]
        if not len(l_ids):
            return empty
        l_vn = normalize(np.array(list(pdf["embedding"].to_numpy()[is_l]), dtype=np.float64))
        if bi == bj:  # diagonal tile: pairs within one block
            acc = tile_scores(l_vn, l_vn)
            li, ri = np.nonzero(
                (l_ids[:, None] < l_ids[None, :]) & (acc >= PAIR_THRESHOLD)
            )
            a_ids, b_ids = l_ids[li], l_ids[ri]
        else:  # off-diagonal: every L x R pair is a distinct vec_id pair
            r_ids = pdf["vec_id"].to_numpy(dtype=np.int64)[~is_l]
            if not len(r_ids):
                return empty
            r_vn = normalize(
                np.array(list(pdf["embedding"].to_numpy()[~is_l]), dtype=np.float64)
            )
            acc = tile_scores(l_vn, r_vn)
            li, ri = np.nonzero(acc >= PAIR_THRESHOLD)
            a_ids = np.minimum(l_ids[li], r_ids[ri])
            b_ids = np.maximum(l_ids[li], r_ids[ri])
        return pd.DataFrame({"a_id": a_ids, "b_id": b_ids, "score": acc[li, ri]})

    return tagged.groupBy("bi", "bj").applyInPandas(score_tile, out_schema)


# ---------------------------------------------------------------------------
# metadata-filtered ANN (top-k within a label)
# ---------------------------------------------------------------------------

_FILTERED_ANN_ORACLE = f"""
WITH {_NORMALIZED_SQL.strip()},
lab AS (SELECT vec_id, label FROM embeddings),
q AS (
    SELECT n.vec_id AS q_id, vn AS qn, label AS q_label
    FROM n JOIN lab ON n.vec_id = lab.vec_id
    WHERE n.vec_id < 10
),
c AS (SELECT n.vec_id, vn, label FROM n JOIN lab ON n.vec_id = lab.vec_id),
scored AS (
    SELECT q.q_id, q.q_label AS label, c.vec_id AS neighbor_id,
           {_dot_sql('q.qn', 'c.vn')} AS score
    FROM q JOIN c ON c.label = q.q_label AND c.vec_id <> q.q_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY q_id ORDER BY score DESC, neighbor_id
    ) AS BIGINT) AS rn
    FROM scored
)
SELECT q_id, label, neighbor_id, score, rn FROM ranked WHERE rn <= {TOP_K}
"""


@query("ann_topk_filtered", oracle=_FILTERED_ANN_ORACLE, tags=("similarity", "ann", "filtered"))
def ann_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: top-5 cosine neighbors sharing
    the query's label — the filtered-ANN shape every vector store
    offers (pre-filter, not post-filter).

    Scale: the label predicate is an equi-join key, NOT an after-the-
    fact filter on a top-k that might starve — so a label-partitioned
    (or label-bucketed) corpus prunes to matching partitions and the
    per-query candidate set shrinks by the label selectivity before
    any distance math runs.
    """
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lab = e.select("vec_id", "label")
    n = _normalized_df(spark, sf_dir).join(lab, "vec_id")
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("vn").alias("qn"),
        F.col("label").alias("q_label"),
    )
    scored = (
        n.join(F.broadcast(q), (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("q_id")))
        .select(
            "q_id",
            F.col("q_label").alias("label"),
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qn"), F.col("vn")).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# IVF-style probed ANN (coarse quantizer -> inverted lists -> probe)
# ---------------------------------------------------------------------------

N_CENTROIDS = 8  # deterministic coarse quantizer: the first 8 vectors
N_PROBE = 2  # centroids probed per query

_IVF_ORACLE = f"""
WITH {_NORMALIZED_SQL.strip()},
cent AS (SELECT vec_id AS c_id, vn AS cn FROM n WHERE vec_id < {N_CENTROIDS}),
assign_scored AS (
    SELECT n.vec_id, cent.c_id,
           CAST(row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY {_dot_sql('n.vn', 'cent.cn')} DESC, cent.c_id
           ) AS BIGINT) AS crn
    FROM n CROSS JOIN cent
),
assigned AS (SELECT vec_id, c_id FROM assign_scored WHERE crn = 1),
q AS (SELECT vec_id AS q_id, vn AS qn FROM n WHERE vec_id < 10),
probes AS (
    SELECT q_id, c_id FROM (
        SELECT q.q_id, cent.c_id,
               CAST(row_number() OVER (
                   PARTITION BY q.q_id
                   ORDER BY {_dot_sql('q.qn', 'cent.cn')} DESC, cent.c_id
               ) AS BIGINT) AS prn
        FROM q CROSS JOIN cent
    ) WHERE prn <= {N_PROBE}
),
scored AS (
    SELECT q.q_id, a.vec_id AS neighbor_id,
           {_dot_sql('q.qn', 'n.vn')} AS score
    FROM probes p
    JOIN assigned a ON a.c_id = p.c_id
    JOIN q ON q.q_id = p.q_id
    JOIN n ON n.vec_id = a.vec_id
    WHERE a.vec_id <> q.q_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY q_id ORDER BY score DESC, neighbor_id
    ) AS BIGINT) AS rn
    FROM scored
)
SELECT q_id, neighbor_id, score, rn FROM ranked WHERE rn <= {TOP_K}
"""


@query("ann_ivf_probe", oracle=_IVF_ORACLE, tags=("similarity", "ann", "ivf"))
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer -> inverted lists -> probe the
    nprobe nearest lists per query -> exact re-rank within them.

    The quantizer is deterministic (centroids = the first N_CENTROIDS
    vectors by id, unit-normalized) so both engines agree with zero
    coordination — in production the centroid table comes from k-means
    and everything downstream is unchanged. Scale: assignment is a
    map-side broadcast pass (corpus x 8 centroid dots, one shuffle to
    nothing — the corpus never repartitions); each query scores only
    its probed inverted lists (~ nprobe/n_centroids of the corpus)
    instead of everything, which is the recall/cost dial every vector
    store exposes. Inverted lists are equi-join keys, so a
    centroid-partitioned (bucketed) layout prunes scan + shuffle to
    the probed lists at 100 TB.
    """
    n = _normalized_df(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("vn").alias("cn")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cscore"), F.asc("c_id")
    )
    assigned = (
        n.crossJoin(F.broadcast(cent))
        .select("vec_id", "vn", "c_id", dot(F.col("vn"), F.col("cn")).alias("cscore"))
        .withColumn("crn", F.row_number().over(w_assign))
        .filter(F.col("crn") == 1)
        .select("vec_id", "vn", "c_id")
    )
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vn").alias("qn")
    )
    w_probe = Window.partitionBy("q_id").orderBy(F.desc("pscore"), F.asc("c_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("q_id", "qn", "c_id", dot(F.col("qn"), F.col("cn")).alias("pscore"))
        .withColumn("prn", F.row_number().over(w_probe))
        .filter(F.col("prn") <= N_PROBE)
        .select("q_id", "qn", "c_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "c_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qn"), F.col("vn")).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# approximate-path evaluation: LSH recall against the exact pair set
# ---------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH {lsh_ctes()},
exact AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_dot_sql('a.vn', 'b.vn')} >= {PAIR_THRESHOLD}
),
common AS (
    SELECT l.a_id FROM lsh_pairs l JOIN exact e
      ON l.a_id = e.a_id AND l.b_id = e.b_id
)
SELECT
    CAST((SELECT COUNT(*) FROM exact) AS BIGINT)  AS n_exact,
    CAST((SELECT COUNT(*) FROM lsh_pairs) AS BIGINT) AS n_lsh,
    CAST((SELECT COUNT(*) FROM common) AS BIGINT) AS n_common,
    CAST((SELECT COUNT(*) FROM common) AS DOUBLE)
        / (SELECT COUNT(*) FROM exact) AS recall
"""


@query("similarity_recall_lsh", oracle=_RECALL_ORACLE, tags=("similarity", "lsh", "evaluation"))
def similarity_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality evaluation of the approximate path: recall of the sign-
    LSH pair set against the exact threshold pairs, plus the subset
    invariant (every LSH pair must also be an exact pair, since buckets
    only PROPOSE candidates and verification applies the exact fold —
    so n_common == n_lsh by construction, and the oracle proves it).

    This is the eval every approximate-dedup deployment runs before
    trusting the fast path at scale: both sides are the already-
    registered operators, composed; the exact side uses the block-
    partitioned scorer (never the fenced quadratic baseline)."""
    exact = similarity_pairs_vectorized(spark, sf_dir).select("a_id", "b_id")
    lsh = _lsh_pairs_df(spark, sf_dir).select("a_id", "b_id")
    common = lsh.join(exact, ["a_id", "b_id"])
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(F.broadcast(lsh.agg(F.count(F.lit(1)).alias("n_lsh"))))
        .crossJoin(F.broadcast(common.agg(F.count(F.lit(1)).alias("n_common"))))
        .select(
            "n_exact",
            "n_lsh",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_exact")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization (round 3): storage compression audit
# ---------------------------------------------------------------------------

INT8_LEVELS = 127.0

_INT8_ORACLE = f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
m AS (
    SELECT vec_id, v,
        list_reduce(list_transform(v, x -> abs(x)), (a, b) -> greatest(a, b)) AS max_abs
    FROM v
),
s AS (
    SELECT vec_id, v, max_abs, {INT8_LEVELS} / max_abs AS scale
    FROM m WHERE max_abs > 0
)
SELECT vec_id, max_abs,
    CAST(len(list_filter(v, x -> abs(floor(x * scale + 0.5)) >= {INT8_LEVELS})) AS BIGINT)
        AS n_saturated,
    round(list_reduce(
        list_transform(v, x -> (x - floor(x * scale + 0.5) / scale)
                             * (x - floor(x * scale + 0.5) / scale)),
        (a, b) -> a + b) / len(v), 6) AS mse
FROM s
"""


@query("embedding_int8_quantize", oracle=_INT8_ORACLE, tags=("similarity", "quantization", "storage"))
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per-vector absmax scaling
    (q = floor(x*127/max_abs + 0.5)), saturation count, and
    reconstruction MSE — the decision table for shipping embeddings at
    1/4 the bytes (the standard vector-store compression step; PQ in
    ``ann_pq_adc`` is the aggressive follow-on).

    Float parity: max is order-free, scale is one IEEE division,
    quantize/reconstruct are single-op chains mirrored verbatim, and
    the squared-error sum is a strict left fold on both engines
    (F.aggregate <-> list_reduce); one final round(6) on the MSE.
    Scale: map-only projection, no shuffle at all.
    """
    from datafusion_streams_spark.functions import as_double_array

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    m = e.select(
        "vec_id",
        "v",
        F.aggregate(
            F.transform("v", lambda x: F.abs(x)),
            F.lit(0.0),
            lambda a, b: F.greatest(a, b),
        ).alias("max_abs"),
    ).filter(F.col("max_abs") > 0)
    s = m.withColumn("scale", F.lit(INT8_LEVELS) / F.col("max_abs"))
    scale = F.col("scale")
    quant = lambda x: F.floor(x * scale + F.lit(0.5))  # noqa: E731
    err2 = lambda x: (x - quant(x) / scale) * (x - quant(x) / scale)  # noqa: E731
    return s.select(
        "vec_id",
        "max_abs",
        F.size(F.filter("v", lambda x: F.abs(quant(x)) >= INT8_LEVELS)).cast("long").alias("n_saturated"),
        F.round(
            F.aggregate(F.transform("v", err2), F.lit(0.0), lambda a, b: a + b) / F.size("v"),
            6,
        ).alias("mse"),
    )


# ---------------------------------------------------------------------------
# embedding norm audit (round 4)
# ---------------------------------------------------------------------------

_NORM_AUDIT_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nrm AS (
    SELECT vec_id, round(sqrt({_dot_sql('v', 'v')}), 6) AS l2
    FROM e
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
        {sql_round6_ratio("SUM(CAST(round(l2 * 1000000, 0) AS {W}))", "CAST(1000000 AS {W}) * COUNT(*)")} AS mean_l2
    FROM nrm
)
SELECT nrm.vec_id, nrm.l2,
    CAST(nrm.l2 < stats.mean_l2 * 0.5 OR nrm.l2 > stats.mean_l2 * 2.0 AS BIGINT) AS is_outlier
FROM nrm CROSS JOIN stats
"""


@query("embedding_norm_audit", oracle=_NORM_AUDIT_ORACLE, tags=("similarity", "quality", "scale"))
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding data-quality audit: every vector's L2 norm plus an
    outlier flag for norms outside [0.5x, 2x] of the corpus mean —
    the cheap screen that catches zero vectors, unnormalized batches,
    and precision-corrupted embeddings BEFORE they poison
    cosine-similarity dedup (a zero/huge norm silently reorders every
    top-k it touches).

    Float parity: the norm is the strict left-to-right dot fold
    (functions.dot discipline) rounded to 6 dp; the corpus mean
    accumulates exact integer micros. One map pass + the 1-row stats
    aggregate broadcast back lazily (crossJoin(F.broadcast(...)), no
    driver collect) — single Catalyst DAG, no shuffle of the corpus
    at any scale.
    """
    from datafusion_streams_spark.functions import dot

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    nrm = e.select(
        "vec_id", F.round(F.sqrt(dot(F.col("v"), F.col("v"))), 6).alias("l2")
    )
    stats = nrm.agg(
        # exact-integer 6-dp rounding (functions.round6_ratio); {W}
        # widens the micro sum past int64 (a trillion-vector corpus
        # would wrap the long sum silently in Spark, not in DuckDB)
        round6_ratio(
            "sum(cast(round(l2 * 1000000, 0) as {W}))", "CAST(1000000 AS {W}) * count(*)"
        ).alias("mean_l2"),
    )
    return nrm.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "l2",
        (
            (F.col("l2") < F.col("mean_l2") * 0.5)
            | (F.col("l2") > F.col("mean_l2") * 2.0)
        ).cast("long").alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall audit (round 4)
# ---------------------------------------------------------------------------

_MRL_DIMS = 16

_MRL_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (
    SELECT vec_id, list_transform(v, x -> x / nrm) AS vn
    FROM (SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm FROM e)
),
t0 AS (SELECT vec_id, (v)[1:{_MRL_DIMS}] AS t FROM e),
t AS (
    SELECT vec_id, list_transform(t, x -> x / nrm) AS vt
    FROM (SELECT vec_id, t, sqrt({_dot_sql('t', 't')}) AS nrm FROM t0)
),
qf AS (SELECT vec_id AS q_id, vn AS qn FROM n WHERE vec_id < 10),
qt AS (SELECT vec_id AS q_id, vt AS qv FROM t WHERE vec_id < 10),
fs AS (
    SELECT q.q_id, c.vec_id AS neighbor_id,
        row_number() OVER (
            PARTITION BY q.q_id
            ORDER BY {_dot_sql('q.qn', 'c.vn')} DESC, c.vec_id
        ) AS rn
    FROM n c JOIN qf q ON c.vec_id <> q.q_id
),
ts AS (
    SELECT q.q_id, c.vec_id AS neighbor_id,
        row_number() OVER (
            PARTITION BY q.q_id
            ORDER BY {_dot_sql('q.qv', 'c.vt')} DESC, c.vec_id
        ) AS rn
    FROM t c JOIN qt q ON c.vec_id <> q.q_id
),
ov AS (
    SELECT f.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM (SELECT q_id, neighbor_id FROM fs WHERE rn <= {TOP_K}) f
    JOIN (SELECT q_id, neighbor_id FROM ts WHERE rn <= {TOP_K}) s
      ON f.q_id = s.q_id AND f.neighbor_id = s.neighbor_id
    GROUP BY f.q_id
)
SELECT q.q_id,
    CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
    CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / {TOP_K}.0 AS recall_at_5
FROM (SELECT DISTINCT q_id FROM qf) q
LEFT JOIN ov ON q.q_id = ov.q_id
"""


@query("embedding_mrl_recall", oracle=_MRL_ORACLE, tags=("similarity", "ann", "embedding", "analytic"))
def embedding_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit: recall@5 of cosine top-k computed
    on the first 16 of 64 dimensions (re-normalized) against the
    full-dimension ranking — the measurement that decides whether an
    MRL-style truncated index (4x cheaper storage and bandwidth) is
    good enough to serve as the coarse stage of a two-phase retriever
    (Kusupati et al. 2022).

    Both rankings use the engine-shared strict left-to-right dot
    folds, so scores are bit-identical and recall is a ratio of exact
    integers. Scale: two broadcast-query brute-force passes (the
    corpus never shuffles — same posture as ann_topk_bruteforce); at
    real scale the full-dim pass is the thing being replaced, so the
    audit runs over a deterministic hash sample of queries, same
    contract.
    """
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    e = e.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    from datafusion_streams_spark.functions import l2_norm

    n = e.select(
        "vec_id",
        F.transform("v", lambda x: x / l2_norm(F.col("v"))).alias("vn"),
    )
    t0 = e.select("vec_id", F.slice("v", 1, _MRL_DIMS).alias("t"))
    t = t0.select(
        "vec_id",
        F.transform("t", lambda x: x / l2_norm(F.col("t"))).alias("vt"),
    )
    qf = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vn").alias("qn")
    )
    qt = t.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vt").alias("qv")
    )

    def topk(corpus, qs, cvec, qvec):
        w = Window.partitionBy("q_id").orderBy(F.desc("score"), "neighbor_id")
        return (
            corpus.crossJoin(F.broadcast(qs))
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                F.col("vec_id").alias("neighbor_id"),
                dot(F.col(qvec), F.col(cvec)).alias("score"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("q_id", "neighbor_id")
        )

    full_top = topk(n, qf, "vn", "qn")
    trunc_top = topk(t, qt, "vt", "qv")
    ov = full_top.join(trunc_top, ["q_id", "neighbor_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return (
        qf.select("q_id")
        .join(ov, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)).cast("double") / TOP_K).alias(
                "recall_at_5"
            ),
        )
    )


# ---------------------------------------------------------------------------
# per-dimension embedding health audit (round 4)
# ---------------------------------------------------------------------------

_DIM_STATS_ORACLE = f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
el AS (
    SELECT CAST(unnest(range(1, len(v) + 1)) AS BIGINT) AS dim, unnest(v) AS val
    FROM v
),
agg AS (
    SELECT dim,
        CAST(COUNT(*) AS BIGINT) AS n_vals,
        SUM(CAST(round(val * 1000000, 0) AS BIGINT)) AS s1i,
        SUM(CAST(round(val * val * 1000000000000, 0) AS BIGINT)) AS s2i,
        MIN(val) AS min_val,
        MAX(val) AS max_val
    FROM el GROUP BY dim
),
w AS (
    SELECT dim, n_vals, min_val, max_val,
        {sql_round6_micro("s1i", "CAST(1000000 AS {W}) * n_vals")} AS m_u,
        {sql_round6_micro("s2i", "CAST(1000000000000 AS {W}) * n_vals")} AS e_u
    FROM agg
)
SELECT dim, n_vals,
    CAST(m_u AS DOUBLE) / 1000000.0 AS mean_val,
    round(sqrt(greatest(
        {sql_round6_ratio("CAST(e_u AS {W}) * 1000000 - CAST(m_u AS {W}) * m_u", "1000000000000")},
        0)), 6) AS std_val,
    min_val, max_val
FROM w
"""


@query("embedding_dim_stats", oracle=_DIM_STATS_ORACLE, tags=("similarity", "quality", "agg"))
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health audit: mean, std, min, max for
    every coordinate of the embedding space — the table that catches
    dead dimensions (std ~ 0), mis-scaled encoders (outlier ranges),
    and mean drift between corpus snapshots before an ANN index is
    built on bad vectors.

    Float parity: per-element values scale to exact integers
    (round-to-nearest at 1e6 / 1e12 before the cast, per the repo's
    integer-scaling discipline — val and val*val are exact doubles),
    sums stay integral, then a fixed sequence of rounded double ops;
    sqrt is IEEE-correctly-rounded in both engines. At 100 TB the
    long sums become decimal sums (same operator shape).

    Scale: map-only posexplode then ONE aggregation keyed by dim —
    64 groups, perfectly combinable map-side; no joins, no windows,
    nothing driver-sized but the 64-row report.
    """
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        as_double_array("embedding").alias("v")
    )
    el = e.select(F.posexplode("v").alias("pos", "val")).select(
        (F.col("pos") + 1).cast("long").alias("dim"), "val"
    )
    # sums widened to DECIMAL(38,0): DuckDB's SUM(BIGINT) is already
    # HUGEINT, so Spark's wrapping long sum was the silent-split side
    # (s2i alone passes 2^63 near ~1e7 elements/dim); the {W} operands
    # below widen the caller-side products the same way (_micro_sql)
    agg = el.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_vals"),
        F.sum(F.round(F.col("val") * 1000000, 0).cast("long").cast("decimal(38,0)"))
        .alias("s1i"),
        F.sum(
            F.round(F.col("val") * F.col("val") * 1000000000000, 0)
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("s2i"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    # 6-dp mean and E[x^2] as exact micro integers, then the variance
    # difference rounded on exact integers too — every double round in
    # the old chain could split engines on exact halves (round6_ratio)
    w = agg.select(
        "dim",
        "n_vals",
        "min_val",
        "max_val",
        round6_micro("s1i", "CAST(1000000 AS {W}) * n_vals").alias("m_u"),
        round6_micro("s2i", "CAST(1000000000000 AS {W}) * n_vals").alias("e_u"),
    )
    return w.select(
        "dim",
        "n_vals",
        (F.col("m_u").cast("double") / 1000000.0).alias("mean_val"),
        F.round(
            F.sqrt(
                F.greatest(
                    round6_ratio(
                        "CAST(e_u AS {W}) * 1000000 - CAST(m_u AS {W}) * m_u",
                        "1000000000000",
                    ),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("std_val"),
        "min_val",
        "max_val",
    )
