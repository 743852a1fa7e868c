"""TPC-H-shaped analytics, second tranche: the remaining canonical
query shapes a warehouse user expects (Q10 returned-item reporting,
Q14 promo share, Q16 supplier variety with an exclusion list, Q18
large-volume customers, Q19 disjunctive bracket predicates, Q22
idle-balance anti-join), adapted to the driver's column subset (no
partsupp / shipmode / commitdate / phone columns).

Each query keeps the cross-engine determinism discipline of
plans/queries.py: integer-unit sums, single final divisions, total
tie-breaks in every ranking, identical aliases in Spark and oracle.
Reference parity anchor: the reference's analytics live in
dw_etl_tests.py:470-506 (its three summary queries); these extend that
surface with the standard decision-support shapes its PG warehouse
would run via plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import (
    _sql_exact_sum,
    exact_sum,
    register,
)


@register(
    "returned_revenue_by_customer",
    oracle=f"""
    SELECT c.c_custkey AS custkey,
           c.c_name AS name,
           n.n_name AS nation,
           {_sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: revenue lost to returned items per customer, "
    "top 20. lineitem⋈orders is the one real shuffle (both sides "
    "orderkey-hashed); customer and nation broadcast. The returnflag "
    "filter sits on the scan so parquet prunes before the join. The "
    "final top-20 is a TakeOrdered on an already-aggregated frame — no "
    "global sort of the fact. Revenue is an integer-cent sum divided "
    "once, so the DESC ranking compares identical doubles in both "
    "engines; custkey tie-break makes it total.",
    tags=("join", "agg", "topk"),
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            exact_sum(disc).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


@register(
    "promo_revenue_share",
    oracle=f"""
    WITH m AS (
      SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
             SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS promo_cents,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS total_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT ship_month,
           CAST(100.0 * promo_cents / total_cents AS DOUBLE) AS promo_pct,
           CAST(total_cents / 100.0 AS DOUBLE) AS total_revenue
    FROM m ORDER BY ship_month
    """,
    doc="TPC-H Q14 shape: percentage of revenue from promotional parts "
    "per ship month. Both the numerator and denominator are integer-cent "
    "partial sums (map-side combinable); the percent division happens "
    "exactly once per group, so both engines emit bit-identical doubles. "
    "part is broadcast into the fact scan; the year filter pushes to "
    "parquet. The conditional-sum-over-join shape is the canonical "
    "'promo share' KPI.",
    tags=("join", "agg", "conditional"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("bigint")
    m = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(cents).alias("total_cents"),
        )
    )
    return m.select(
        "ship_month",
        (F.lit(100.0) * F.col("promo_cents") / F.col("total_cents"))
        .cast("double")
        .alias("promo_pct"),
        (F.col("total_cents") / F.lit(100.0)).cast("double").alias("total_revenue"),
    ).orderBy("ship_month")


@register(
    "supplier_variety_by_brand",
    oracle="""
    SELECT p.p_brand AS brand,
           p.p_type AS type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, brand, type
    """,
    doc="TPC-H Q16 shape (partsupp-free adaptation): how many distinct "
    "suppliers ship each brand×type, excluding a denylist (suppliers in "
    "arrears, standing in for Q16's complaint list). The NOT IN becomes "
    "a broadcast left_anti join — null-safe here because s_suppkey is a "
    "key. COUNT(DISTINCT suppkey) forces the two-phase distinct agg; "
    "grouping keys come from the broadcast part side so the only "
    "shuffle is the final (brand,type,suppkey) distinct — the same "
    "partial-distinct plan Spark uses at any scale.",
    tags=("join", "anti", "agg"),
)
def supplier_variety_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("type"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type")
    )


@register(
    "large_volume_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {_sql_exact_sum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
    )
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_totalprice AS totalprice,
           b.sum_qty AS sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice DESC, orderkey
    """,
    doc="TPC-H Q18 shape: customers whose single orders exceed 250 units "
    "across lines. The HAVING pre-aggregates lineitem on its natural "
    "orderkey partitioning *before* any join — at 100 TB the filter "
    "passes ~0.1% of orders, so the subsequent joins move a trivial "
    "frame; customer broadcasts. The HAVING predicate compares the "
    "integer-unit partial sum (not the divided double), keeping the "
    "cut-off exact in both engines.",
    tags=("agg", "having", "join"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    units = F.sum(cents("l_quantity"))
    big = (
        li.groupBy("l_orderkey")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            units.alias("__units"),
        )
        .filter(F.col("__units") > 25000)
        .drop("__units")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "orderkey")
    )


@register(
    "disjunctive_bracket_revenue",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE
               WHEN p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
                    AND l.l_quantity BETWEEN 1 AND 20 THEN 'small'
               WHEN p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
                    AND l.l_quantity BETWEEN 10 AND 30 THEN 'medium'
               WHEN p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
                    AND l.l_quantity BETWEEN 20 AND 50 THEN 'large'
             END AS bracket,
             l.l_extendedprice, l.l_discount
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT bracket,
           {_sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM tagged WHERE bracket IS NOT NULL
    GROUP BY bracket ORDER BY bracket
    """,
    doc="TPC-H Q19 shape: disjunction of three (brand, size-range, "
    "quantity-range) brackets, evaluated as a first-match CASE so each "
    "line lands in exactly one bracket (the brand predicates are "
    "disjoint, so first-match equals the OR). part broadcasts; the "
    "disjunctive predicate stays inside whole-stage codegen rather than "
    "becoming three scans + union. Q19's container/shipmode columns "
    "don't exist in this dataset — size and quantity brackets carry the "
    "same plan shape.",
    tags=("join", "conditional", "agg"),
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bracket = (
        F.when((br == "Brand#12") & sz.between(1, 15) & q.between(1, 20), "small")
        .when((br == "Brand#23") & sz.between(10, 30) & q.between(10, 30), "medium")
        .when((br == "Brand#19") & sz.between(20, 50) & q.between(20, 50), "large")
    )
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        j.select(bracket.alias("bracket"), disc.alias("__disc"))
        .filter(F.col("bracket").isNotNull())
        .groupBy("bracket")
        .agg(
            exact_sum(F.col("__disc")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("bracket")
    )


@register(
    "idle_balance_by_segment",
    oracle="""
    WITH thr AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS DOUBLE)
             AS total_balance
    FROM customer c, thr
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > thr.avg_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
    doc="TPC-H Q22 shape: wealthy-but-idle customers — balance above the "
    "positive-balance average, no orders since 2001 — counted per "
    "market segment (standing in for Q22's phone country codes, which "
    "this dataset lacks). The scalar average is a 1-row broadcast cross "
    "join; the NOT EXISTS is a left_anti against a date-pruned orders "
    "key projection (the filter pushes to the parquet scan). Threshold "
    "compares integer cents against a once-divided double, identical "
    "in both engines. At scale the anti-join shuffles only (custkey) "
    "pairs, never order payloads.",
    tags=("anti", "subquery", "agg"),
)
def idle_balance_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    bal_cents = cents("c_acctbal")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bal_cents).cast("double") / F.count(F.lit(1))).alias("avg_cents")
        )
    )
    rich = (
        c.join(F.broadcast(thr))
        .filter(bal_cents > F.col("avg_cents"))
        .drop("avg_cents")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(bal_cents) / F.lit(100.0)).cast("double").alias("total_balance"),
        )
        .orderBy("segment")
    )
