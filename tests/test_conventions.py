"""Source-scan conventions the verdicts established, pinned so they
cannot silently regress:

- r10: no eager ``.first()`` scalar pulls inside registered query
  bodies — every scalar threshold broadcasts its 1-row aggregate back
  into the same DAG (the q11 idiom; the eager pull crashed on empty
  input at sf0.001 and costs an extra job). The only sanctioned
  ``.first()`` calls are driver-side CONVERGENCE/CATCH-UP predicates,
  which genuinely need a value on the driver to decide whether to loop
  again (connected-components label sum, streaming catch-up row
  count).
- r8/r9: zero row-at-a-time ``F.udf`` anywhere — Python touches data
  only through Arrow (pandas_udf / mapInPandas / applyInPandas).
"""

import io
import tokenize
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "datafusion_streams_spark"


def _count_first_calls(source: str) -> int:
    """Count ``.first()`` CALL SITES (zero-arg — the eager
    DataFrame action) via the token stream. Docstrings and comments
    legitimately discuss the anti-pattern, and ``F.first(col)`` is the
    harmless AGGREGATE function — neither may trip the scan, which is
    why this is tokens with an empty-parens requirement, not a grep."""
    toks = list(tokenize.generate_tokens(io.StringIO(source).readline))
    n = 0
    for i in range(len(toks) - 3):
        if (
            toks[i].type == tokenize.OP and toks[i].string == "."
            and toks[i + 1].type == tokenize.NAME and toks[i + 1].string == "first"
            and toks[i + 2].type == tokenize.OP and toks[i + 2].string == "("
            and toks[i + 3].type == tokenize.OP and toks[i + 3].string == ")"
        ):
            n += 1
    return n

# file (relative to the package) -> exact allowed .first() count, each
# a loop-convergence or catch-up predicate audited in the r9 verdict
ALLOWED_FIRST = {
    "operators/dedup.py": 1,       # connected-components label-sum convergence
    "streaming/queries.py": 1,     # streaming catch-up predicate
}


def _source_files():
    return sorted(PKG.rglob("*.py"))


def test_no_eager_first_outside_convergence_predicates():
    offenders = {}
    for f in _source_files():
        n = _count_first_calls(f.read_text())
        rel = str(f.relative_to(PKG))
        if n != ALLOWED_FIRST.get(rel, 0):
            offenders[rel] = n
    assert not offenders, (
        f"unexpected .first() counts {offenders}; registered queries must "
        "broadcast 1-row scalar aggregates back into the DAG "
        "(see q11_important_stock) — if a NEW convergence predicate is "
        "genuinely driver-side, add it to ALLOWED_FIRST with a comment"
    )


def test_no_row_at_a_time_python_udf():
    offenders = [
        str(f.relative_to(PKG))
        for f in _source_files()
        if "F.udf(" in f.read_text() or "functions.udf(" in f.read_text()
    ]
    assert offenders == [], (
        f"row-at-a-time Python UDF in {offenders}: use pandas_udf / "
        "mapInPandas (Arrow-vectorized) instead"
    )
