"""Reference relational-operator queries: staging cleans, anti-join
dedup, unions, denormalizations, watermark incremental loads, surrogate
keys, conditional aggregation, HAVING, top-k windows.

Each maps a SURVEY.md §2 operator ID onto the driver's TPC-H-ish tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.localframe import local_rows
from data_warehouse_project_spark.operators.keys import with_distributed_keys
from data_warehouse_project_spark.plans.queries import (
    _sql_exact_sum,
    exact_sum,
    register,
)


@register(
    "staging_clean_distinct",
    oracle="""
    SELECT DISTINCT
      CAST(p_partkey AS VARCHAR) AS p_partkey,
      CAST(p_brand  AS VARCHAR) AS p_brand,
      CAST(p_type   AS VARCHAR) AS p_type,
      CAST(p_size   AS VARCHAR) AS p_size
    FROM part
    """,
    doc="P1: staging clean — project, cast-all-to-string, DISTINCT "
    "(reference fn_clean_* pattern, load_staging_sales_table.sql:22-33). "
    "DISTINCT is a hash-agg shuffle on all cols; at scale prefer "
    "dropDuplicates on the declared dedup key.",
    tags=("staging",),
)
def staging_clean_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        [F.col(c).cast("string").alias(c) for c in ("p_partkey", "p_brand", "p_type", "p_size")]
    ).distinct()


@register(
    "antijoin_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c.c_custkey
    """,
    doc="P2/J6: NOT EXISTS anti-join — the reference's idempotent-insert "
    "dedup guard (load_staging_sales_table.sql:116-121). left_anti join; "
    "Spark broadcasts the smaller side or SMJs at scale.",
    tags=("join",),
)
def antijoin_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "union_dedup_nations",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey IN (
      SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier
    )
    ORDER BY n_nationkey
    """,
    doc="U1: UNION-with-dedup across two source entities (countries from "
    "customers ∪ stores, load_3nf_ce_countries_table.sql:34). union() + "
    "distinct on a small key set, then a semi-join lookup.",
    tags=("set",),
)
def union_dedup_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    n = table(spark, sf_dir, "nation")
    covered = c.union(s).distinct()
    return (
        n.join(F.broadcast(covered), n.n_nationkey == covered.nk, "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@register(
    "dim_customer_denorm",
    oracle="""
    SELECT c.c_custkey   AS customer_id,
           c.c_name      AS customer_name,
           c.c_mktsegment AS market_segment,
           COALESCE(n.n_name, 'n.a.') AS nation,
           COALESCE(r.r_name, 'n.a.') AS region
    FROM customer c
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY customer_id
    """,
    doc="J7/J1: snowflake→flat denormalization with default-value fill "
    "(DIM_CUSTOMERS, load_dim_customers_dimension_scd_type1.sql:86-95). "
    "The reference's LEFT JOIN ... ON id=-1 default-row idiom becomes "
    "coalesce(col,'n.a.') — same output, no join. Dims broadcast.",
    tags=("dim", "join"),
)
def dim_customer_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
            F.coalesce(F.col("n_name"), F.lit("n.a.")).alias("nation"),
            F.coalesce(F.col("r_name"), F.lit("n.a.")).alias("region"),
        )
        .orderBy("customer_id")
    )


@register(
    "dim_supplier_denorm",
    oracle="""
    SELECT s.s_suppkey AS store_id,
           s.s_name    AS store_name,
           COALESCE(n.n_name, 'n.a.') AS nation,
           COALESCE(r.r_name, 'n.a.') AS region,
           CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS acctbal
    FROM supplier s
      LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY s.s_suppkey, s.s_name, n.n_name, r.r_name
    ORDER BY store_id
    """,
    doc="J7 (stores flavor): DIM_STORES denormalization "
    "(load_dim_stores_dimension.sql:77-84).",
    tags=("dim", "join"),
)
def dim_supplier_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .groupBy(
            F.col("s_suppkey").alias("store_id"),
            F.col("s_name").alias("store_name"),
            F.coalesce(F.col("n_name"), F.lit("n.a.")).alias("nation"),
            F.coalesce(F.col("r_name"), F.lit("n.a.")).alias("region"),
        )
        .agg(exact_sum("s_acctbal").alias("acctbal"))
        .orderBy("store_id")
    )


@register(
    "fact_resolution_defaults",
    oracle=f"""
    SELECT COALESCE(p.p_partkey, -1) AS part_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unresolved,
           {_sql_exact_sum('l.l_extendedprice')} AS revenue
    FROM lineitem l LEFT JOIN part p
      ON l.l_partkey = p.p_partkey AND p.p_size > 10
    GROUP BY COALESCE(p.p_partkey, -1)
    HAVING SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) > 0
    ORDER BY part_id
    """,
    doc="J8/A8: fact-to-dim surrogate resolution with COALESCE(id,-1) "
    "default and unresolved-reference accounting (reference fact load, "
    "load_fct_sales_fact_table_dimensional_layer.sql:120-148 + ref-integrity "
    "stats dw_etl_tests.py:274-281). The p_size>10 join predicate "
    "manufactures unresolved rows deterministically.",
    tags=("fact", "join", "agg"),
)
def fact_resolution_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_size")
    joined = li.join(
        F.broadcast(p),
        (li.l_partkey == p.p_partkey) & (p.p_size > 10),
        "left",
    )
    return (
        joined.groupBy(F.coalesce(p.p_partkey, F.lit(-1)).alias("part_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(p.p_partkey.isNull(), 1).otherwise(0)).alias("unresolved"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .filter(F.col("unresolved") > 0)
        .orderBy("part_id")
    )


@register(
    "watermark_incremental_sales",
    oracle=f"""
    WITH wm AS (
      SELECT MAX(o_orderdate) - INTERVAL 90 DAY AS w FROM orders
    )
    SELECT COUNT(*) AS n_new,
           {_sql_exact_sum('l.l_quantity')} AS sum_qty,
           {_sql_exact_sum('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate > (SELECT w FROM wm)
    """,
    doc="P4/M4/A2: watermark-driven incremental load — watermark = "
    "MAX(update_dt) aggregate, filter source to rows after it "
    "(load_3nf_ce_sales_pre_fact_table.sql:21-23,:94). The watermark agg "
    "is a 1-row broadcast; the filter pushes to the orders scan.",
    tags=("incremental", "agg"),
)
def watermark_incremental_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    wm = o.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")).alias("w")
    )
    new_orders = o.join(F.broadcast(wm)).filter(F.col("o_orderdate") > F.col("w"))
    return li.join(new_orders, li.l_orderkey == new_orders.o_orderkey).agg(
        F.count(F.lit(1)).alias("n_new"),
        exact_sum("l_quantity").alias("sum_qty"),
        exact_sum("l_extendedprice").alias("revenue"),
    )


@register(
    "surrogate_keys_nation",
    oracle="""
    WITH base AS (
      SELECT n_name, n_nationkey,
             CAST(('0x' || substring(md5(n_name), 1, 4)) AS BIGINT) % 8 AS bk
      FROM nation
    ), counts AS (
      SELECT bk, COUNT(*) AS cnt FROM base GROUP BY bk
    ), offs AS (
      SELECT bk, COALESCE(SUM(cnt) OVER (
               ORDER BY bk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS off
      FROM counts
    )
    SELECT CAST(-1 AS BIGINT) AS nation_surr_id, 'n.a.' AS nation_name,
           CAST(-1 AS BIGINT) AS nation_src_id
    UNION ALL
    SELECT CAST(1000 + o.off + ROW_NUMBER() OVER (
             PARTITION BY b.bk ORDER BY b.n_name, b.n_nationkey
           ) AS BIGINT) AS nation_surr_id,
           b.n_name AS nation_name,
           b.n_nationkey AS nation_src_id
    FROM base b JOIN offs o ON b.bk = o.bk
    ORDER BY nation_surr_id
    """,
    doc="W2/P7/F14: deterministic surrogate keys at scale — bucketed "
    "partition-offset assignment (operators/keys.py "
    "with_distributed_keys) replaces NEXTVAL (reference sequences, "
    "create_ddl_objects_3NF_layer.sql:16-25), plus the seeded -1 default "
    "row (load_3nf_ce_continents_table.sql:48-69). No global single-task "
    "row_number: rows hash to md5-prefix buckets (engine-portable, so "
    "the oracle replays the identical assignment), row_number runs "
    "per-bucket in parallel, and dense ids come from exclusive "
    "cumulative bucket counts (O(n_buckets) driver state).",
    tags=("keys",),
)
def surrogate_keys_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    keyed = with_distributed_keys(
        n.select("n_name", F.col("n_nationkey").cast("bigint")),
        "nation_surr_id",
        ["n_name", "n_nationkey"],
        start_at=1001,
        n_buckets=8,
    ).select(
        "nation_surr_id",
        F.col("n_name").alias("nation_name"),
        F.col("n_nationkey").alias("nation_src_id"),
    )
    default_row = local_rows(
        n.sparkSession, [(-1, "n.a.", -1)],
        "nation_surr_id bigint, nation_name string, nation_src_id bigint",
    )
    return default_row.union(keyed).orderBy("nation_surr_id")


@register(
    "conditional_agg_returns",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
           CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
           {_sql_exact_sum('l_extendedprice')} AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY returnflag
    """,
    doc="A8: conditional aggregation (COUNT CASE WHEN — reference "
    "ref-integrity and SCD stats, dw_etl_tests.py:274-281,:321-328).",
    tags=("agg",),
)
def conditional_agg_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "n_discounted"
            ),
            F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_taxfree"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .orderBy("returnflag")
    )


@register(
    "having_frequent_geo",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, c.c_mktsegment
    HAVING COUNT(*) > 10
    ORDER BY n_customers DESC, nation, segment
    """,
    doc="A9: GROUP BY + HAVING count>threshold (geo-combination check, "
    "dw_etl_tests.py:436-447).",
    tags=("agg",),
)
def having_frequent_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") > 10)
        .orderBy(F.desc("n_customers"), "nation", "segment")
    )


@register(
    "topk_parts_per_brand",
    oracle=f"""
    WITH part_rev AS (
      SELECT p.p_brand, l.l_partkey,
             {_sql_exact_sum('l.l_extendedprice')} AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_partkey
    ), ranked AS (
      SELECT p_brand AS brand, l_partkey AS partkey, revenue,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand ORDER BY revenue DESC, l_partkey
             ) AS rank
      FROM part_rev
    )
    SELECT brand, partkey, revenue, CAST(rank AS INT) AS rank FROM ranked
    WHERE rank <= 3
    ORDER BY brand, rank
    """,
    doc="W1/W3 generalization: top-k per group via ranking window with "
    "total tie-break. Aggregate first (shrinks the window input from "
    "fact-size to |group| rows), then window on the small frame.",
    tags=("window", "topk"),
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    part_rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(exact_sum("l_extendedprice").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "l_partkey")
    return (
        part_rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("partkey"),
            "revenue",
            "rank",
        )
        .orderBy("brand", "rank")
    )


@register(
    "count_distinct_profile",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="A10: COUNT DISTINCT + MIN/MAX profile (date-dim completeness "
    "check shape, dw_etl_tests.py:420-428). Exact distinct forces a "
    "two-phase agg; approx_count_distinct is the at-scale alternative.",
    tags=("agg",),
)
def count_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        )
        .orderBy("status")
    )


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           {_sql_exact_sum('l_quantity')} AS sum_qty,
           {_sql_exact_sum('l_extendedprice')} AS sum_base_price,
           {_sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY returnflag, linestatus
    """,
    bench=True,
    doc="TPC-H Q1-shaped pricing summary: scan-heavy multi-aggregate with "
    "a pushed-down date filter — the canonical columnar-throughput probe.",
    tags=("agg", "bench"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(disc).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("returnflag", "linestatus")
    )
