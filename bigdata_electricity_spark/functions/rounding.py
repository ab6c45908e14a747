"""Cross-engine deterministic rounding.

Spark's ROUND on doubles goes through the value's shortest decimal
representation (BigDecimal.valueOf + HALF_UP) while DuckDB rounds the
binary double directly — so any value whose decimal expansion ends in a
'5' at the cut digit rounds differently (e.g. 17947.60995 → 17947.61 in
Spark, 17947.6099 in DuckDB). Products/sums of 2-decimal money columns
hit this constantly.

Fix: round as ``floor(x·10ⁿ + 0.5) / 10ⁿ`` on BOTH engines — pure double
arithmetic that is bit-identical across them (half-up toward +inf).
:func:`hround` is the Spark side; :func:`dround` emits the matching
DuckDB SQL for oracle strings.

Domain: |x|·10ⁿ must stay below 2⁵³ (exact-integer double range) —
beyond it Spark's floor (→ LONG) and DuckDB's floor (→ DOUBLE) diverge
(property-tested in tests/test_rounding_cross_engine.py). Callers pick n
accordingly: large-magnitude aggregates round coarser (e.g. variance at
n=-2), never finer.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _scale(n: int) -> float:
    return float(10.0 ** n)


def hround(col: Column | str, n: int) -> Column:
    """Deterministic half-up round of a double Column to n decimals."""
    c = F.col(col) if isinstance(col, str) else col
    s = _scale(n)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def dround(expr: str, n: int) -> str:
    """DuckDB SQL fragment computing exactly what :func:`hround` computes."""
    s = repr(_scale(n))
    return f"floor(({expr}) * {s} + 0.5) / {s}"
