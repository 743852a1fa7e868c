"""Set-based SCD Type 1 / Type 2 maintenance engines — the reference's
signature capability (SURVEY.md §2.8 M2/M3), re-expressed as pure
DataFrame transforms.

The reference maintains SCDs row-at-a-time inside PostgreSQL
transactions (`ON CONFLICT DO UPDATE` for SCD1,
load_3nf_ce_customers_scd_table_type1.sql:101-144; expire-then-insert
loops for SCD2, load_3nf_ce_products_scd_table_type2.sql:59-248).
Without a transactional store, the distributed equivalent is a
*snapshot rewrite*: compute the next state of the dimension as one
DataFrame and atomically swap it in (write-temp-then-rename, or Delta
MERGE where available). Each engine below is a pure function
``(current, updates) -> next`` so the storage strategy stays separate
and the logic is unit-testable on in-memory frames.

Batch semantics notes (equivalence with the reference proven by tests):
- one logical timestamp per run (the reference uses wall-clock per row;
  a batch has a single effective time — SURVEY.md §7 hard part 1);
- updates may contain several versions of one key; they are collapsed
  to the latest by ``change_order`` before applying (the reference
  processes them in row order — same end state);
- SCD2 expiry uses end = run_ts - 1 second and the open-end sentinel
  9999-12-31 (load_3nf_ce_products_scd_table_type2.sql:129, :86-100).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = dt.datetime(9999, 12, 31)


def _any_changed(left: str, right: str, cols: list[str]) -> Column:
    """Null-safe 'any tracked column differs' (reference IS DISTINCT FROM,
    F13)."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return pred


def _latest_per_key(updates: DataFrame, key: str, change_order: list[str]) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in change_order])
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd1_upsert(
    current: DataFrame | None,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    change_order: list[str],
    run_ts: dt.datetime | None = None,
) -> DataFrame:
    """SCD Type 1: update-in-place, keep INSERT_DT, bump UPDATE_DT only
    when a tracked column actually changed (M2).

    ``current`` columns: key, *tracked, insert_dt, update_dt.
    ``updates`` columns: key, *tracked, *change_order.
    Returns the next snapshot with the same audit columns.
    """
    ts = F.lit(run_ts or dt.datetime.now())
    upd = _latest_per_key(updates, key, change_order).select(key, *tracked)

    if current is None:
        return upd.withColumn("insert_dt", ts).withColumn("update_dt", ts)

    cur = current.withColumn("__in_cur", F.lit(True)).alias("cur")
    new = upd.withColumn("__in_new", F.lit(True)).alias("new")
    joined = cur.join(new, on=key, how="full_outer")

    in_cur = F.col("cur.__in_cur").isNotNull()
    in_new = F.col("new.__in_new").isNotNull()
    changed = _any_changed("cur", "new", tracked)

    picked = [F.col(key)]
    for c in tracked:
        picked.append(
            F.when(in_new, F.col(f"new.{c}")).otherwise(F.col(f"cur.{c}")).alias(c)
        )
    picked.append(F.coalesce(F.col("cur.insert_dt"), ts).alias("insert_dt"))
    picked.append(
        F.when(~in_cur, ts)  # brand-new key
        .when(in_new & changed, ts)  # real change → bump UPDATE_DT
        .otherwise(F.col("cur.update_dt"))  # untouched or no-op redelivery
        .alias("update_dt")
    )
    return joined.select(*picked)


def scd2_apply(
    current: DataFrame | None,
    updates: DataFrame,
    key: str,
    compare: list[str],
    attrs: list[str],
    change_order: list[str],
    run_ts: dt.datetime | None = None,
) -> DataFrame:
    """SCD Type 2: expire-and-version on change of any ``compare`` column
    (M3). Returns the full next version table.

    ``current`` columns: key, *compare, *attrs, start_dt, end_dt,
    is_active ('Y'/'N').  ``updates``: key, *compare, *attrs,
    *change_order.

    Algorithm (set-based, one shuffle on the key):
      changed  = latest-update ⟕ active-current  where no active row or
                 any compare col differs (null-safe)       [J10]
      expired  = active-current ⋉ changed  with end_dt = ts-1s, 'N'
      new_vers = changed with [ts, 9999-12-31), 'Y'
      result   = untouched ∪ expired ∪ new_vers
    """
    now = run_ts or dt.datetime.now()
    ts = F.lit(now)
    ts_minus_1s = F.lit(now - dt.timedelta(seconds=1))
    open_end = F.lit(OPEN_END)

    upd = _latest_per_key(updates, key, change_order).select(key, *compare, *attrs)
    out_cols = [key, *compare, *attrs, "start_dt", "end_dt", "is_active"]

    def as_version(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("start_dt", ts)
            .withColumn("end_dt", open_end)
            .withColumn("is_active", F.lit("Y"))
        ).select(*out_cols)

    if current is None:
        return as_version(upd)

    active = current.filter(F.col("is_active") == "Y").alias("cur")
    new = upd.alias("new")

    # J10: no active version, or any compare column null-safely differs
    cmp_changed = _any_changed("cur", "new", compare)
    joined = new.join(active, on=key, how="left")
    changed_keys = joined.filter(
        F.col("cur.start_dt").isNull() | cmp_changed
    ).select(F.col(key), *[F.col(f"new.{c}").alias(c) for c in (*compare, *attrs)])

    # expire the active versions of changed keys
    to_expire = current.join(
        changed_keys.select(key), on=key, how="left_semi"
    ).filter(F.col("is_active") == "Y")
    expired = to_expire.withColumn("end_dt", ts_minus_1s).withColumn(
        "is_active", F.lit("N")
    )

    untouched = current.join(
        to_expire.select(key, "start_dt"), on=[key, "start_dt"], how="left_anti"
    )
    # canonical column order regardless of which branch contributed
    return (
        untouched.select(*out_cols)
        .unionByName(expired.select(*out_cols))
        .unionByName(as_version(changed_keys))
    )
