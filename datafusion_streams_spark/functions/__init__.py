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


def round6_ratio(numer_sql: str, denom_sql: str) -> Column:
    """``round(numer/denom, 6)`` computed in EXACT integer arithmetic
    (half away from zero), for integral ``numer``/``denom`` SQL
    expressions with ``denom > 0``.

    Rounding the DOUBLE ratio instead splits engines whenever the
    exact value lands on a 6th-decimal half (e.g. 5165/80000 =
    .0645625): Spark's ``round`` HALF_UPs the double's
    shortest-decimal rendering while DuckDB rounds the true binary
    value — one goes up, the other down. Caught live by the r8 sf0.1
    full-registry sweep on ``text_classifier_score``; every
    ratio-of-integers 6-dp site now routes through this helper and its
    oracle twin ``sql_round6_ratio`` so both engines round the SAME
    exact integer.

    The arithmetic runs WIDE — numerator cast to DECIMAL(38,0) here,
    HUGEINT in the DuckDB twin — so ``2 * |numer| * 1e6`` cannot
    overflow even for DECIMAL(38,0)-exact cent sums at cluster scale
    (int32/int64 inputs would overflow at *1e6 otherwise). These
    expressions evaluate on RESULT-sized rows (post-aggregation), so
    the wide types cost nothing. ``div`` on non-negative operands is
    floor division, so ``(2*|n|*1e6 + d) div (2*d)`` is round-half-up
    of ``|n|*1e6/d``; the sign is restored afterwards (= half away
    from zero, matching what both engines' round() does for exact
    decimal inputs). Domain bound: the scaled quotient ``ratio*1e6``
    must stay under 2^53 for the final double to be exact (and under
    int64 for ``div``), i.e. |numer/denom| < ~9e9 — satisfied by every
    quantity for which 6 decimal places are meaningful (shares,
    averages, scores, prices); property-checked against exact Fraction
    rounding over adversarial 2^a·5^b denominators in
    tests/test_properties.py. The bound is STRUCTURAL: past it both
    engines raise identically (see ``_micro_sql``) instead of Spark's
    decimal ``div`` silently wrapping its LONG result.
    """
    return F.expr(
        f"CAST({_micro_sql(numer_sql, denom_sql, 'DECIMAL(38,0)', 'div', _SPARK_RAISER)}"
        " AS DOUBLE) / 1000000.0"
    )


def round6_micro(numer_sql: str, denom_sql: str) -> Column:
    """``round(numer/denom, 6) * 1e6`` as the exact BIGINT micro
    integer — for intermediates that feed FURTHER integer arithmetic
    (variance differences, micro-error sums). Never reconstruct this
    by multiplying :func:`round6_ratio`'s double back by 1e6: q/1e6 is
    not an exact double, and the round trip truncates in Spark while
    DuckDB rounds — a one-ulp class of the very bug this family
    exists to kill.

    Residual boundary (r9 ADVICE), now STRUCTURAL (r10 verdict item
    6): ``_micro_sql`` guards the documented domain |numer/denom| <=
    9e9 in exact wide arithmetic and makes BOTH engines raise the same
    error past it — which also bounds the micro value at ~9.0e15, so
    this final ``CAST(... AS BIGINT)`` can never overflow (and, the
    deeper fix: the decimal ``div`` feeding it can never silently wrap
    its LONG result — see ``_micro_sql``). The guard evaluates on
    RESULT-sized rows (post-aggregation), so it costs nothing. A
    caller that cannot argue the domain bound should keep the value in
    DECIMAL."""
    return F.expr(
        f"CAST({_micro_sql(numer_sql, denom_sql, 'DECIMAL(38,0)', 'div', _SPARK_RAISER)}"
        " AS BIGINT)"
    )


_DOMAIN_BOUND = "9000000000"  # |numer/denom| <= 9e9: the documented domain
_OVERFLOW_MSG = "round6 domain overflow: |numer/denom| exceeds 9e9"
_SPARK_RAISER = f"CAST(raise_error('{_OVERFLOW_MSG}') AS DECIMAL(38,0))"
_DUCK_RAISER = f"CAST(error('{_OVERFLOW_MSG}') AS HUGEINT)"


def _micro_sql(
    numer_sql: str, denom_sql: str, wide: str, intdiv: str, raiser: str
) -> str:
    """The helper's OWN scaling (``2*|n|*1e6``) runs wide, but a
    caller-supplied expression like ``cents * hist_n - hist_sum`` is
    evaluated in its native BIGINT *before* the outer CAST — and on
    int64 overflow non-ANSI Spark wraps silently while DuckDB raises,
    turning a scale-up into a silent parity split. Callers whose
    internal products/sums can approach 2^63 at cluster scale mark the
    operands to widen with a ``{W}`` placeholder (e.g.
    ``CAST(cents AS {W}) * hist_n - hist_sum``), which expands to
    DECIMAL(38,0) on the Spark side and HUGEINT in the DuckDB twin —
    both ~1e38, unreachable. Unmarked expressions must document why
    their domain stays under int64 (plain row counts are always safe:
    2^63 rows is not a table). Cross-engine equality of the widened
    path beyond int64 is pinned in tests/test_properties.py.

    STRUCTURAL domain guard (r10 verdict item 6, strengthened): Spark's
    ``div`` on DECIMAL operands returns LONG and under non-ANSI mode
    SILENTLY WRAPS past 2^63 (probed live: ``DECIMAL(38,0) div 2``
    wraps negative) while DuckDB's HUGEINT ``//`` stays exact — so the
    real overflow boundary of this family was the integral division
    itself, one level deeper than the final BIGINT cast the r9 note
    blamed, and it corrupted :func:`round6_ratio` too, not just the
    micro form. The guard fires at the DOCUMENTED domain bound
    |numer/denom| <= 9e9 — checked as ``abs(n) <= d * 9e9`` in exact
    wide arithmetic, bit-identical across engines — which keeps the
    quotient <= ~9.0e15, three orders of magnitude below int64, so the
    ``div`` can never wrap and the BIGINT cast in ``round6_micro``
    needs no second guard. Past the bound BOTH engines raise the same
    message (Spark ``raise_error``, DuckDB ``error``): loud and
    symmetric, no longer ANSI-sweep-enforced. ``raiser`` is the
    engine's raising expression cast to ``wide`` so the CASE branches
    agree. (Residual: ``d * 9e9`` itself leaves the wide type only
    past d ~ 1.1e28 — not a denominator that exists; there Spark
    yields NULL→raise, DuckDB raises its own overflow — both still
    loud.) Pinned in tests/test_properties.py."""
    numer_sql = numer_sql.replace("{W}", wide)
    denom_sql = denom_sql.replace("{W}", wide)
    n = f"CAST(({numer_sql}) AS {wide})"
    d = f"CAST(({denom_sql}) AS {wide})"
    ng = f"(CASE WHEN abs({n}) <= {d} * {_DOMAIN_BOUND} THEN {n} ELSE {raiser} END)"
    q = f"((2 * abs({ng}) * 1000000 + {d}) {intdiv} (2 * {d}))"
    return f"(CASE WHEN {n} >= 0 THEN {q} ELSE -{q} END)"


def sql_round6_ratio(numer_sql: str, denom_sql: str) -> str:
    """DuckDB twin of :func:`round6_ratio` (``//`` is HUGEINT floor
    division there); emit this in oracle SQL wherever the Spark side
    uses the helper. Carries the same structural domain guard —
    DuckDB's ``error()`` mirrors Spark's ``raise_error`` so both
    engines fail identically past |numer/denom| = 9e9."""
    return (
        f"CAST({_micro_sql(numer_sql, denom_sql, 'HUGEINT', '//', _DUCK_RAISER)}"
        " AS DOUBLE) / 1000000.0"
    )


def sql_round6_micro(numer_sql: str, denom_sql: str) -> str:
    """DuckDB twin of :func:`round6_micro` (exact BIGINT micros),
    including the structural domain guard (see :func:`sql_round6_ratio`)."""
    return (
        f"CAST({_micro_sql(numer_sql, denom_sql, 'HUGEINT', '//', _DUCK_RAISER)}"
        " AS BIGINT)"
    )


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
