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


def with_surrogate_keys(
    batch: DataFrame,
    key_col: str,
    order_by: list[str | Column],
    start_at: int = 1,
    dense: bool = True,
) -> DataFrame:
    """Assign surrogate ids ``start_at, start_at+1, ...`` in the total
    order given by ``order_by`` (must be a total order for
    reproducibility)."""
    if dense:
        w = Window.orderBy(*order_by)
        sk = (F.row_number().over(w) + F.lit(start_at - 1)).cast("bigint")
    else:
        # sparse but fully parallel: stable only within one run
        sk = (F.monotonically_increasing_id() + F.lit(start_at)).cast("bigint")
    return batch.withColumn(key_col, sk)


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
    default_df = spark.createDataFrame(row, dim.schema)
    missing = default_df.join(
        dim.filter(F.col(key_col) == F.lit(defaults[key_col])),
        on=key_col,
        how="left_anti",
    )
    return dim.unionByName(missing)
