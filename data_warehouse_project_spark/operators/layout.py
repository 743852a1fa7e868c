"""Z-order (Morton-curve) storage layout: multi-dimensional clustering
so parquet min/max statistics prune BOTH filter dimensions.

A single-column sort gives perfect file-skipping on that column and
none on any other. Interleaving the low bits of two columns into one
z-value and range-partitioning + sorting the write on it bounds every
file's extent in *both* dimensions — the standard lakehouse OPTIMIZE
ZORDER technique, here as a pure-DataFrame write path (the z-value is
a codegen bit expression; nothing leaves the JVM, and the only shuffle
is the range partitioner's).

The bit expression uses only ``>> << & |`` and therefore parses
identically in Spark SQL and DuckDB — the ``zorder_locality_profile``
query oracle reuses the exact same string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """SQL text interleaving the low ``bits`` bits of two non-negative
    integer expressions into a Morton code (x even bits, y odd bits).

    Valid in both Spark SQL and DuckDB (shared operator subset).
    """
    # Every term fully parenthesized: DuckDB's bitwise operators share
    # one precedence level (left-to-right), unlike Spark's C-like table.
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zvalue(x_expr: str, y_expr: str, bits: int = 8) -> Column:
    return F.expr(zvalue_sql(x_expr, y_expr, bits)).cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    x_expr: str,
    y_expr: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of two columns.

    ``repartitionByRange`` on the z-value gives each output file a
    contiguous z-range (one shuffle, AQE-coalescible); the within-file
    sort keeps row groups tight so row-group-level stats prune too.
    The helper column is dropped before the write — layout is pure
    physical placement, the schema is unchanged.
    """
    (
        df.withColumn("__z", zvalue(x_expr, y_expr, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
