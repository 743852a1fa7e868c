"""Distributed ordered prefix sums (running totals) without a global
single-task window.

``SUM(x) OVER (ORDER BY k)`` funnels the whole frame through ONE task —
fine for day-grain or n_buckets-sized aggregate frames, a scale-killer
when the frame is proportional to a table (a billion-part catalog in
``abc_classification_parts``). The distributed replacement is the same
two-pass partition-offset shape as ``operators.keys.with_distributed_keys``:

1. bin each row into a bucket via a MONOTONE expression of the leading
   order key (``range_bucket`` — fixed-width value ranges, so buckets
   respect the global order AND are deterministic/engine-portable; a
   sampling range partitioner would not be oracle-replayable);
2. running-sum within each bucket — an n_buckets-way parallel window;
3. add per-bucket exclusive offsets = running sum over the one-row-per-
   bucket totals frame (bounded model state, constant partition key).

The result is exactly ``SUM(val) OVER (ORDER BY order_by ROWS UNBOUNDED
PRECEDING)`` for any total order, so a DuckDB oracle can keep the plain
global-window formulation: prefix sums are bucketing-invariant.

Reference parity: the reference computes running shares inside single-
node SQL windows (PL/pgSQL reports); this operator is the 100 TB form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def single_group(col: Column) -> Column:
    """A constant-VALUED but non-foldable partition key: ``pmod(
    xxhash64(col), 1)`` == 0 for every row, yet Catalyst cannot
    constant-fold it away (a bare ``lit(0)`` partition key is eliminated
    by the optimizer, reintroducing WindowExec's global-window warning —
    verified empirically on Spark 4.1). The coalesce keeps NULL inputs
    in the same single group (xxhash64(NULL) is NULL, which would
    otherwise split the frame into a second partition). Use ONLY for
    windows over frames bounded by a constant (day-grain or
    n_buckets-row aggregates): the execution is still one task; this
    just declares that intent so real unbounded global windows stand
    out in logs."""
    return F.pmod(F.coalesce(F.xxhash64(col), F.lit(0)), F.lit(1))


def range_bucket(col: Column, width: int | float, descending: bool = False) -> Column:
    """Deterministic fixed-width bin id of ``col``, monotone
    NON-DECREASING along the requested order (pass ``descending=True``
    when the prefix sum orders by ``col`` DESC).

    Pick ``width`` so the expected value range yields hundreds-to-
    thousands of buckets: bucket ids are model state (one totals row
    per bucket rides the offset frame), while rows within a bucket are
    processed n_buckets-way parallel. Monotonicity — not boundary
    placement — is what correctness needs, so double rounding in the
    division is harmless.

    NULL keys land in the sentinel bucket matching Spark's default
    NULL sort position (ASC → NULLS FIRST → smallest id; DESC → NULLS
    LAST → largest id) — they keep their place in the total order
    instead of being dropped by the offset equi-join.
    """
    b = F.floor(col.cast("double") / F.lit(float(width))).cast("bigint")
    b = (-b) if descending else b
    sentinel = F.lit((1 << 62) if descending else -(1 << 62)).cast("bigint")
    return F.when(col.isNull(), sentinel).otherwise(b).alias("bucket")


def bucketed_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    val_col: str,
    out_col: str,
    bucket: Column,
    total_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running SUM(``val_col``) over the
    total order ``order_by``, computed with NO sf-proportional
    single-partition window.

    ``group_cols``: grouped form — the running sum restarts per group
    (``SUM OVER (PARTITION BY group ORDER BY ...)``). Buckets are then
    scoped per group, the offset frame grows to (n_groups x n_buckets)
    rows (still bounded model state), and the within-group offset pass
    parallelizes across groups instead of needing ``single_group``.
    This is the scale answer for per-domain running totals where one
    group may hold most of the table: a plain partitioned window would
    funnel that group through one task.

    ``bucket`` must be monotone non-decreasing along ``order_by``
    (build it with ``range_bucket`` on the leading order key). Rows
    with equal bucket ids are ordered by the within-bucket window, so
    ``order_by`` must still be a total order for reproducibility.

    ``total_col``: also attach the grand total SUM(``val_col``) — free
    here (one more window over the bounded bucket-totals frame, carried
    by the same broadcast join), where a caller-side ``agg`` would cost
    a second full scan of ``df``'s lineage.
    """
    g = list(group_cols or [])
    b = df.withColumn("__pb", bucket)
    totals = b.groupBy(*g, "__pb").agg(F.sum(val_col).alias("__pbsum"))
    # running sums over the one-row-per-bucket(-per-group) frame:
    # bounded model state; ungrouped, single_group declares the
    # intentional one-task pass, while the grouped form parallelizes
    # across groups
    off_part = g if g else [single_group(F.col("__pb"))]
    off_w = (
        Window.partitionBy(*off_part)
        .orderBy("__pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        *g,
        "__pb",
        # nullable by design: NULL iff no previous bucket carries a
        # non-null value — needed to replicate SUM OVER's exact NULL
        # semantics (the running sum is NULL only while the whole
        # prefix frame is null-valued)
        F.sum("__pbsum").over(off_w).alias("__poff"),
        F.sum("__pbsum")
        .over(Window.partitionBy(*off_part))
        .alias("__ptot"),
    )
    in_w = (
        Window.partitionBy(*g, "__pb")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_cum = F.sum(val_col).over(in_w)
    combined = F.when(
        in_cum.isNull() & F.col("__poff").isNull(), F.lit(None)
    ).otherwise(F.coalesce(in_cum, F.lit(0)) + F.coalesce(F.col("__poff"), F.lit(0)))
    # null-safe on the group keys: NULL is a real partition in SQL's
    # PARTITION BY (and in the windows above) — a name-based equi-join
    # would silently drop every NULL-group row here
    offs_b = F.broadcast(offs)
    cond = b["__pb"] == offs_b["__pb"]
    for c in g:
        cond = cond & b[c].eqNullSafe(offs_b[c])
    out = b.join(offs_b, cond).drop(offs_b["__pb"])
    for c in g:
        out = out.drop(offs_b[c])
    out = out.withColumn(out_col, combined)
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__ptot"))
    return out.drop("__pb", "__poff", "__ptot")
