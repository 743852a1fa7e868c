"""As-of join — the temporal lookup the reference side-steps by always
joining `IS_ACTIVE='Y'` (SURVEY.md §2.3 note: an as-of join is implied
by SCD2 semantics, sale date ∈ [START_DT, END_DT), but the reference
pins to the active version; load_3nf_ce_sales_pre_fact_table.sql:56-57).
We provide the real thing as an extension.

Scale-correct formulation: an as-of join "for each left row, latest
right row with ts ≤ left.ts (same key)" is NOT implemented as a range
join (quadratic blowup, nested-loop at scale). Instead: union both
sides tagged, sort within key partitions, carry the last right value
forward with a window (`last_value(ignore nulls)`), then keep left
rows. One shuffle on the key, linear in rows — the standard
time-series engine trick re-expressed in windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For every left row, attach right_vals of the latest right row
    with right_ts <= left_ts for the same key (NULLs if none).

    When several right rows share the same (key, right_ts), the one with
    the greatest ``struct(*right_vals)`` wins — a total, run-stable
    tie-break (without it, which duplicate-timestamp row gets carried
    forward would depend on partitioning/run order)."""
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tag = (
        right.select(
            key, F.col(right_ts).alias("__ts"), *right_vals
        )
        .withColumn("__side", F.lit(0))
    )
    reserved = {"__side", "__ts"} | {f"__asof_{v}" for v in right_vals}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left frame columns collide with internal names: "
            f"{sorted(clash)}"
        )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (__side 0<1);
    # equal-timestamp right rows are totally ordered by their value tuple
    # so the carried-forward row is deterministic across partitionings
    tie = F.when(
        F.col("__side") == 0, F.struct(*[F.col(v) for v in right_vals])
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged
    for v in right_vals:
        src = F.when(F.col("__side") == 0, F.col(v))
        carried = carried.withColumn(
            f"__asof_{v}", F.last(src, ignorenulls=True).over(w)
        )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_{v}").alias(f"asof_{v}") for v in right_vals
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


@register(
    "asof_event_order_state",
    oracle="""
    WITH latest AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate,
             (SELECT MAX(o.o_orderdate) FROM orders o
               WHERE o.o_custkey = oc.o_custkey
                 AND o.o_orderdate <= l.l_shipdate) AS asof_order_dt
      FROM lineitem l JOIN orders oc ON l.l_orderkey = oc.o_orderkey
      WHERE l.l_linenumber = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(asof_order_dt) AS BIGINT) AS n_matched,
           CAST(MIN(asof_order_dt) AS DATE) AS first_asof,
           CAST(MAX(asof_order_dt) AS DATE) AS last_asof
    FROM latest
    """,
    doc="As-of join summary: for each first-line shipment, the latest "
    "order date of the same customer at ship time. Spark side uses the "
    "union+window carry-forward (one key shuffle, linear); the oracle "
    "states the same semantics as a correlated MAX subquery — "
    "intentionally different formulations, identical results.",
    tags=("join", "asof"),
)
def asof_event_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    left = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "o_custkey"
    )
    right = o.select("o_custkey", F.col("o_orderdate"))
    joined = asof_join(
        left,
        right.withColumn("order_dt", F.col("o_orderdate")),
        key="o_custkey",
        left_ts="l_shipdate",
        right_ts="o_orderdate",
        right_vals=["order_dt"],
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("asof_order_dt").alias("n_matched"),
        F.min(F.col("asof_order_dt").cast("date")).alias("first_asof"),
        F.max(F.col("asof_order_dt").cast("date")).alias("last_asof"),
    )
