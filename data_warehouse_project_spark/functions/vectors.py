"""Vector arithmetic primitives as native Column expressions.

Dot products are sequential left-folds (``aggregate`` over ``zip_with``)
— deterministic evaluation order, so results are bit-identical to any
engine that folds the same way (the DuckDB oracle uses ``list_reduce``).
Elements are cast float→double before arithmetic on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


# SQL-text twins for the DuckDB oracle (identical fold order).
DOT_SQL = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"
)


def cos_sql(a: str, b: str) -> str:
    d = DOT_SQL.format(a=a, b=b)
    na = DOT_SQL.format(a=a, b=a)
    nb = DOT_SQL.format(a=b, b=b)
    return f"({d}) / (sqrt({na}) * sqrt({nb}))"


def round6(col: Column) -> Column:
    """Deterministic 6-decimal round: ``floor(x*1e6 + 0.5)/1e6`` — the
    SAME IEEE operations in both engines, so equal inputs give equal
    outputs by construction. Engine-native ``ROUND(x, 6)`` must NOT be
    used where cross-engine equality matters: Spark rounds the
    shortest-decimal representation while DuckDB rounds in double
    arithmetic, and they disagree for inputs within 1 ulp of a .5e-6
    boundary (measured 249/20000 on adversarial doubles). Negative
    halves round toward +inf here — identically on both sides, which
    is the only property the value-hash gate needs."""
    return F.floor(col * 1000000.0 + F.lit(0.5)).cast("double") / 1000000.0


def round6_sql(expr: str) -> str:
    """DuckDB twin of :func:`round6` for oracle strings."""
    return f"(FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def cos6(a: Column, b: Column) -> Column:
    """Cosine similarity rounded via :func:`round6` — the comparison/
    ranking form every vector query must share with its oracle."""
    return round6(cosine(a, b))


def cos6_sql(a: str, b: str) -> str:
    return round6_sql(cos_sql(a, b))
