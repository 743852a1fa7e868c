"""Surrogate-key and default-row operators (reference W2/P7/F14).

The reference allocates surrogate keys with per-row NEXTVAL
(load_3nf_ce_continents_table.sql:89) and seeds a ``-1`` default row in
every dimension (:48-69). Distributed equivalents:

- ``with_surrogate_keys``: deterministic dense ids via row_number over a
  *stable total order* + the current max of the target — reproducible
  across runs (the reference's insertion order is not, which we document
  as an intentional order-insensitive equivalence; SURVEY.md §7).
  A global row_number single-partitions the new batch; that is correct
  for dimension-sized data. For billion-row key assignment use
  ``monotonically_increasing_id`` or per-partition offsets instead —
  exposed via ``dense=False``.
- ``with_default_row``: union the sentinel row (id -1, 'n.a.',
  1900-01-01 — load_3nf_ce_continents_table.sql:57-64) unless present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.localframe import local_rows

# hard ceiling on the dense (single-task window) path: a dimension that
# outgrows this is data-proportional and MUST move to
# with_distributed_keys. Enforced inside the plan (raise_error), not by
# convention — a schema change that makes a "bounded" dim scale with
# data fails loudly at the first load instead of silently serializing.
DENSE_KEY_MAX_ROWS = 100_000


def with_surrogate_keys(
    batch: DataFrame,
    key_col: str,
    order_by: list[str | Column],
    start_at: int = 1,
    dense: bool = True,
) -> DataFrame:
    """Assign surrogate ids ``start_at, start_at+1, ...`` in the total
    order given by ``order_by`` (must be a total order for
    reproducibility).

    ⚠ The dense path funnels the whole batch through ONE task (global
    window): correct only for provably tiny frames (a handful of
    regions/nations). Every real loader uses ``with_distributed_keys``.
    The tiny-frame contract is ENFORCED, not trusted: the minted key
    expression raises ``USER_RAISED_EXCEPTION`` at execution time if
    the batch exceeds ``DENSE_KEY_MAX_ROWS`` — a zero-job guard (no
    extra count; the row_number the path already computes is the
    witness).
    """
    if dense:
        # constant-valued partition key == the same one-task global sort,
        # minus the WindowExec warning; documented tiny-frame-only.
        # Keyed off the batch's first column, NOT order_by[0] — an
        # order_by entry may be a SortOrder (F.desc(...)), which cannot
        # feed a hash function
        from data_warehouse_project_spark.operators.prefix import single_group

        w = Window.partitionBy(single_group(F.col(batch.columns[0]))).orderBy(
            *order_by
        )
        rn = F.row_number().over(w)
        sk = (
            F.when(
                rn > F.lit(DENSE_KEY_MAX_ROWS),
                F.raise_error(
                    F.lit(
                        "with_surrogate_keys(dense=True) saw a batch over "
                        f"{DENSE_KEY_MAX_ROWS} rows — this dimension is "
                        "data-proportional; use with_distributed_keys"
                    )
                ),
            )
            .otherwise(rn + F.lit(start_at - 1))
            .cast("bigint")
        )
    else:
        # sparse but fully parallel: stable only within one run
        sk = (F.monotonically_increasing_id() + F.lit(start_at)).cast("bigint")
    return batch.withColumn(key_col, sk)


def bucket_of(col: Column, n_buckets: int) -> Column:
    """Deterministic, engine-portable bucket id in [0, n_buckets):
    first 4 hex chars of md5 of the value's string form. The same
    expression is writable in ANSI SQL/DuckDB
    (``('0x' || substring(md5(x), 1, 4))::BIGINT % n``), so bucketed key
    assignment stays oracle-checkable."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def with_distributed_keys(
    batch: DataFrame,
    key_col: str,
    order_by: list[str],
    start_at: int = 1,
    n_buckets: int = 256,
) -> DataFrame:
    """Scale-safe dense surrogate ids: ``start_at .. start_at+N-1``,
    deterministic, with NO global single-task sort.

    Two-pass partition-offset assignment (the distributed replacement
    for the reference's per-row NEXTVAL, and for a global
    ``row_number() over (order by …)`` which serializes the batch
    through one task):

    1. bucket each row by an md5-prefix hash of its leading natural-key
       column (``bucket_of`` — data-dependent, partitioning-independent,
       so ids are stable across runs/cluster layouts);
    2. ``row_number`` within each bucket over ``order_by`` — a hash
       shuffle on the bucket id, n_buckets-way parallel;
    3. add per-bucket starting offsets = exclusive cumulative counts in
       bucket order, computed as a running-sum window over the
       O(n_buckets)-row count frame. The offset frame is bounded by a
       constant (independent of data size) and stays INSIDE the lazy
       plan — no driver collect, no extra Spark job; the whole
       assignment materializes with the consumer's one action.

    Ids are dense overall but NOT sorted by the natural key across
    buckets (bucket-major order). Every consumer treats surrogate ids as
    opaque, so only determinism matters (SURVEY.md §7.2).

    Note: the count aggregation is one extra (count-only,
    map-side-combined) pass over ``batch`` within the same job; cache
    upstream if it is expensive to recompute.
    """
    b = batch.withColumn("__kb", bucket_of(F.col(order_by[0]), n_buckets))
    counts = b.groupBy("__kb").agg(F.count(F.lit(1)).alias("__kcnt"))
    # exclusive running sum in bucket order; the single-partition window
    # is over <= n_buckets rows — bounded model state, not data. The
    # constant-VALUED (but non-foldable) partition key keeps the spec
    # non-empty: same one-task execution, no global-window warning.
    from data_warehouse_project_spark.operators.prefix import single_group

    off_w = (
        Window.partitionBy(single_group(F.col("__kb")))
        .orderBy("__kb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = counts.select(
        "__kb",
        F.coalesce(F.sum("__kcnt").over(off_w), F.lit(0)).alias("__koff"),
    )
    w = Window.partitionBy("__kb").orderBy(*order_by)
    return (
        b.join(F.broadcast(off_df), "__kb", "left")
        .withColumn(
            key_col,
            (F.row_number().over(w) + F.col("__koff") + F.lit(start_at - 1)).cast(
                "bigint"
            ),
        )
        .drop("__kb", "__koff")
    )


def next_key_offset(existing: DataFrame | None, key_col: str) -> int:
    """MAX(key)+1 of the existing table (sequence emulation), 1 if empty."""
    if existing is None:
        return 1
    row = existing.agg(F.max(key_col).alias("m")).first()
    return int(row["m"]) + 1 if row["m"] is not None else 1


def with_default_row(
    dim: DataFrame, defaults: dict[str, object], key_col: str
) -> DataFrame:
    """Ensure the sentinel default row exists exactly once (P7 guard).

    ``defaults`` must cover every column of ``dim``; the row is appended
    only when no row with ``key_col == defaults[key_col]`` exists.
    """
    spark = dim.sparkSession
    row = [tuple(defaults[c] for c in dim.columns)]
    default_df = local_rows(spark, row, dim.schema)
    missing = default_df.join(
        dim.filter(F.col(key_col) == F.lit(defaults[key_col])),
        on=key_col,
        how="left_anti",
    )
    return dim.unionByName(missing)
