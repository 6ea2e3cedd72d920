"""Shared column-expression helpers.

Everything here stays JVM-side (built-in ``pyspark.sql.functions`` —
whole-stage codegen eligible); no Python row loops. The decimal helpers
exist for *oracle parity*: fixture money/quantity columns are exact
2-decimal values stored as double, so summing them as DECIMAL is exact
in both Spark and DuckDB, and the final CAST(decimal AS DOUBLE) is the
same IEEE rounding in both engines — bit-identical aggregates without
any float-summation-order nondeterminism. At 100 TB this matters even
more: decimal partial aggregation is exact under any partitioning, so
results don't drift when the cluster size (and thus combine order)
changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

# ---------------------------------------------------------------------------
# Exact-arithmetic helpers (Spark <-> DuckDB bit parity)
# ---------------------------------------------------------------------------


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Cast a 2-dp-valued double column to DECIMAL for exact aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(precision, scale))


def dsum(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Exact decimal SUM, returned as double (deterministic final cast)."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Exact-sum average: decimal sum -> double, one double division.

    Identical in Spark and DuckDB because the only float op is the
    final division of two exactly-determined numbers.
    """
    return (F.sum(dec(col, precision, scale)).cast("double") / F.count(F.lit(1)))


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal arithmetic."""
    return dec("l_extendedprice") * (F.lit(1).cast(DecimalType(3, 2)) - dec("l_discount", 3, 2))


def charged_price() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (F.lit(1).cast(DecimalType(3, 2)) + dec("l_tax", 3, 2))


# ---------------------------------------------------------------------------
# Vector helpers (embedding similarity) — built-in higher-order functions,
# deterministic left-to-right reduction so Spark == DuckDB bitwise.
# ---------------------------------------------------------------------------


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products (double).

    ``F.aggregate`` folds in array order; starting from 0.0 keeps the
    result bit-identical to DuckDB's ``list_reduce`` (0.0 + x == x).
    """
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# Text helpers (shingling / hashing for dedup + fingerprinting)
# ---------------------------------------------------------------------------

TOKEN_SPLIT_RE = r"\s+"


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), TOKEN_SPLIT_RE)


def word_shingles(col: str | Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column, as array<string>.

    Built entirely from higher-order functions (transform over an index
    range + array_join) — stays in codegen, no UDF. This is the scale
    path: shingling 100 TB of documents is a map-only operation.
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.array_join(toks, " "))))


def minhash_halves(shingle: Column) -> tuple[Column, Column]:
    """Two independent 48-bit integer hashes from ONE md5 digest.

    48 hex-substring bits parse exactly into BIGINT in both Spark
    (``conv(x, 16, 10)``) and DuckDB (``('0x'||x)::BIGINT``), so the
    oracle replays the integers bit-for-bit.
    """
    m = F.md5(shingle)
    h1 = F.conv(F.substring(m, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 13, 12), 16, 10).cast("long")
    return h1, h2


def minhash_expr(h1: Column, h2: Column, seed: int) -> Column:
    """MinHash family member seed s via Kirsch–Mitzenmacher double
    hashing: ``h_s = h1 + s*h2`` (Kirsch & Mitzenmacher, ESA 2006 —
    two base hashes simulate s independent ones).

    One md5 per shingle instead of one per (shingle, seed): at 100 TB
    the signature pass is hash-bound, so this is a ~16× kernel saving.
    Max value ≈ 16·2^48 < 2^63 — no overflow in either engine, and the
    integer MIN shuffles 8 bytes/perm instead of a 32-char digest.
    """
    return h1 + F.lit(seed) * h2
