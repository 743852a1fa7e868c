"""Statistical aggregates with exact cross-engine determinism, plus
product-analytics funnels.

Naive VARIANCE/STDDEV/CORR are float power sums — their values depend
on partitioning and accumulation order, so they can never pass a
cross-engine value-hash gate. These queries compute the same
statistics from EXACT integer/decimal power sums (n, Σx, Σy, Σxy,
Σx², Σy² in scaled integer units, summed as 38-digit decimals on the
Spark side and HUGEINTs in the oracle), then apply the closed-form
formulas with a fixed sequence of IEEE double operations on identical
operands — bit-identical results on any cluster layout, and the
partial (map-side) aggregation stays exact at any scale.

Reference parity anchor: the reference's gold layer serves BI
consumers (SURVEY.md §2.1 S10); variance/correlation/trend are the
next queries such consumers run after the Q1-Q3 summary set
(dw_etl_tests.py:470-506).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import register

_DEC = "decimal(38,0)"


@register(
    "price_discount_stats",
    oracle="""
    WITH units AS (
      SELECT l_returnflag AS returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x,
             CAST(ROUND(l_discount * 1000000) AS BIGINT) AS y
      FROM lineitem
    ),
    sums AS (
      SELECT returnflag,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM units GROUP BY returnflag
    )
    ,
    mom AS (
      -- hugeint -> double through VARCHAR: DuckDB's direct
      -- CAST(HUGEINT AS DOUBLE) is not correctly rounded (off by 1 ulp
      -- for ~1% of >2^64 integers; measured), while the string parse is
      -- — and Spark's decimal(38,0) -> double IS correctly rounded, so
      -- only this route makes the two engines' doubles bit-identical
      SELECT returnflag, n, sx,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dsx,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS var_x,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS var_y,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov
      FROM sums
    )
    SELECT returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(dsx / n / 100 AS DOUBLE) AS mean_price,
           CAST(sqrt(var_x) / n / 100 AS DOUBLE) AS stddev_price,
           CAST(cov / (sqrt(var_x) * sqrt(var_y)) AS DOUBLE)
             AS price_discount_corr,
           CAST(cov / var_y / 100.0 * 1000000.0 AS DOUBLE)
             AS price_per_discount_unit
    FROM mom
    ORDER BY returnflag
    """,
    doc="Deterministic second-moment statistics per returnflag: mean and "
    "population stddev of the line price, Pearson correlation between "
    "price and discount, and the least-squares regression slope of "
    "price on discount. All six power sums are exact (integer cents / "
    "discount-millionths, decimal(38,0) accumulation in Spark, "
    "HUGEINT in the oracle); the closed-form combination is a fixed "
    "sequence of IEEE ops on identical operands, so the doubles match "
    "bit-for-bit despite 32-way parallel partial aggregation. This is "
    "the pattern that makes ANY moment-based statistic (variance, "
    "skew, covariance matrices) safe on a 1000-executor cluster: "
    "exact partials, floats only at the very end.",
    tags=("stats", "agg"),
)
def price_discount_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    x = cents("l_extendedprice")
    y = F.round(F.col("l_discount") * 1000000).cast("bigint")
    units = li.select(
        F.col("l_returnflag").alias("returnflag"), x.alias("x"), y.alias("y")
    )
    sums = units.groupBy("returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_DEC)).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("syy"),
    )
    n = F.col("n").cast(_DEC)
    var_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return sums.select(
        "returnflag",
        F.col("n").cast("bigint").alias("n"),
        (F.col("sx").cast("double") / F.col("n") / 100).cast("double").alias(
            "mean_price"
        ),
        (F.sqrt(var_x) / F.col("n") / 100).cast("double").alias("stddev_price"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).cast("double").alias(
            "price_discount_corr"
        ),
        (cov / var_y / 100.0 * 1000000.0).cast("double").alias(
            "price_per_discount_unit"
        ),
    ).orderBy("returnflag")


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH first_view AS (
      SELECT user_id, MIN(ts) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    first_click AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN first_view v
        ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    first_purchase AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN first_click c
        ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM first_view) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM first_click) AS BIGINT) AS n_clicked,
           CAST((SELECT COUNT(*) FROM first_purchase) AS BIGINT) AS n_purchased,
           CAST((SELECT COUNT(*) FROM first_click) * 1000000
                // (SELECT COUNT(*) FROM first_view) AS BIGINT)
             AS view_to_click_ppm,
           CAST((SELECT COUNT(*) FROM first_purchase) * 1000000
                // (SELECT COUNT(*) FROM first_click) AS BIGINT)
             AS click_to_purchase_ppm
    """,
    doc="Ordered funnel conversion (view → click → purchase): a user "
    "converts a stage only with a strictly later event than their "
    "previous stage's first event — the standard product-analytics "
    "funnel with anti-reordering semantics. Each stage is a per-user "
    "MIN joined forward with a timestamp residual; all three stages "
    "and both joins hash on user_id, so the whole funnel is ONE "
    "exchange reused (AQE coalesces), and each stage's input shrinks "
    "monotonically. Conversion rates are exact integer ppm divisions. "
    "At 100 TB the same plan holds: user_id is high-cardinality, no "
    "global state, no window over everything.",
    tags=("funnel", "agg", "events"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    first_click = (
        e.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    first_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = first_view.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = first_click.agg(F.count(F.lit(1)).alias("n_clicked"))
    np_ = first_purchase.agg(F.count(F.lit(1)).alias("n_purchased"))
    return (
        nv.join(F.broadcast(nc))
        .join(F.broadcast(np_))
        .select(
            F.col("n_viewed").cast("bigint").alias("n_viewed"),
            F.col("n_clicked").cast("bigint").alias("n_clicked"),
            F.col("n_purchased").cast("bigint").alias("n_purchased"),
            F.expr("n_clicked * 1000000 div n_viewed").cast("bigint").alias(
                "view_to_click_ppm"
            ),
            F.expr("n_purchased * 1000000 div n_clicked").cast("bigint").alias(
                "click_to_purchase_ppm"
            ),
        )
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_partkey AS partkey, COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT COUNT(*) AS total FROM lineitem)
    SELECT p.partkey,
           CAST(p.n_rows AS BIGINT) AS n_rows,
           CAST(p.n_rows * 1000000 // t.total AS BIGINT) AS share_ppm
    FROM per_key p, tot t
    ORDER BY n_rows DESC, partkey
    LIMIT 10
    """,
    doc="Join-key skew diagnostic: the 10 heaviest partkeys and their "
    "row share in exact integer ppm — the profile you run BEFORE "
    "picking a join strategy (broadcast / salt / AQE skew-split) for "
    "a 100 TB shuffle. One partial-agg pass (map-side combine makes "
    "per-key counts cheap even for hot keys), a 1-row total "
    "broadcast-crossed on, TakeOrdered for the top-10 with a total "
    "tie-break. The same frame feeds operators/skew.salted_join's "
    "replica-count choice.",
    tags=("stats", "diagnostics"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    per_key = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = li.agg(F.count(F.lit(1)).alias("total"))
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "partkey",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.expr("n_rows * 1000000 div total").cast("bigint").alias("share_ppm"),
        )
        .orderBy(F.desc("n_rows"), "partkey")
        .limit(10)
    )
