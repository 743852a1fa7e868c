"""Second wave of relational coverage: transitive-bridge joins (J4),
string-function cleansing (F3/F7/F9), calendar rollups, ranking and
cumulative windows — each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.scalars import cents, initcap_pg, split_part
from data_warehouse_project_spark.plans.queries import (
    _sql_exact_sum,
    exact_sum,
    register,
)


@register(
    "bridge_store_region",
    oracle="""
    WITH bridge AS (
      SELECT DISTINCT c.c_nationkey, r.r_name
      FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT COALESCE(b.r_name, 'n.a.') AS region,
           COUNT(*) AS n_stores,
           CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS acctbal_total
    FROM supplier s LEFT JOIN bridge b ON s.s_nationkey = b.c_nationkey
    GROUP BY COALESCE(b.r_name, 'n.a.')
    ORDER BY region
    """,
    doc="J4: transitive-bridge join — stores lack a region, so resolve it "
    "through the *customer* population's observed geography (reference: "
    "stores get their continent by bridging through customers on "
    "country, load_3nf_ce_countries_table.sql:47-51). dropDuplicates on "
    "the bridge side prevents fan-out; missing bridge rows fall back to "
    "the 'n.a.' default.",
    tags=("join", "bridge"),
)
def bridge_store_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    s = table(spark, sf_dir, "supplier")
    bridge = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_nationkey", "r_name")
        .dropDuplicates()
    )
    return (
        s.join(F.broadcast(bridge), s.s_nationkey == bridge.c_nationkey, "left")
        .groupBy(F.coalesce("r_name", F.lit("n.a.")).alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_stores"),
            exact_sum("s_acctbal").alias("acctbal_total"),
        )
        .orderBy("region")
    )


@register(
    "string_cleanse_customers",
    oracle="""
    SELECT c_custkey AS customer_id,
           split_part(c_name, '#', 1) AS name_prefix,
           split_part(c_name, '#', 2) AS name_number,
           split_part(c_name, '#', 3) AS name_missing,
           array_to_string(
             list_transform(
               regexp_extract_all(lower(c_name), '[a-z0-9]+|[^a-z0-9]'),
               t -> upper(t[1]) || t[2:]
             ), '') AS name_initcap,
           c_custkey || '-' || c_nationkey AS natural_key,
           upper(c_mktsegment) AS segment_u
    FROM customer
    ORDER BY customer_id
    """,
    doc="F3/F7/F9 scalar cluster: PG-parity INITCAP (capitalize after any "
    "non-alphanumeric — the oracle reimplements the same tokenization "
    "since DuckDB lacks initcap), split_part with ''-on-missing, "
    "composite natural keys via concat (reference SALE_SRC_ID pattern, "
    "load_3nf_ce_sales_pre_fact_table.sql:47).",
    tags=("functions",),
)
def string_cleanse_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        split_part("c_name", "#", 1).alias("name_prefix"),
        split_part("c_name", "#", 2).alias("name_number"),
        split_part("c_name", "#", 3).alias("name_missing"),
        initcap_pg("c_name").alias("name_initcap"),
        F.concat_ws("-", "c_custkey", "c_nationkey").alias("natural_key"),
        F.upper("c_mktsegment").alias("segment_u"),
    ).orderBy("customer_id")


@register(
    "revenue_by_quarter",
    oracle=f"""
    SELECT year(o.o_orderdate) AS order_year,
           quarter(o.o_orderdate) AS order_quarter,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           {_sql_exact_sum('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY year(o.o_orderdate), quarter(o.o_orderdate)
    ORDER BY order_year, order_quarter
    """,
    doc="A6 x D12/D15: calendar rollup on the fact path — the shape every "
    "BI query against FCT_SALES⋈DIM_DATES takes (readme.md:360-366). "
    "year/quarter are evaluated pre-shuffle; grouping keys are tiny ints.",
    tags=("agg", "dates"),
)
def revenue_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_custkey").alias("n_customers"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .orderBy("order_year", "order_quarter")
    )


@register(
    "customer_rank_in_nation",
    oracle=f"""
    WITH cust_rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             {_sql_exact_sum('l.l_extendedprice')} AS revenue
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ), ranked AS (
      SELECT n.n_name AS nation, cr.o_custkey AS customer_id, cr.revenue,
             ROW_NUMBER() OVER (
               PARTITION BY cr.c_nationkey
               ORDER BY cr.revenue DESC, cr.o_custkey
             ) AS rnk
      FROM cust_rev cr JOIN nation n ON cr.c_nationkey = n.n_nationkey
    )
    SELECT nation, customer_id, revenue, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY nation, rnk
    """,
    doc="W1/W3: top-3 revenue customers per nation — aggregate to "
    "(nation, customer) grain first, then rank the small frame. The "
    "window partitions on the agg's own grouping key: AQE reuses the "
    "same hash partitioning, no second fact shuffle.",
    tags=("window", "topk"),
)
def customer_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(exact_sum("l_extendedprice").alias("revenue"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("revenue"), "o_custkey")
    return (
        cust_rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_custkey").alias("customer_id"),
            "revenue",
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("nation", "rnk")
    )


@register(
    "running_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_day,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      GROUP BY CAST(l_shipdate AS DATE)
    )
    SELECT ship_day,
           CAST(rev_cents / 100.0 AS DOUBLE) AS day_revenue,
           CAST(SUM(rev_cents) OVER (
             ORDER BY ship_day ROWS UNBOUNDED PRECEDING
           ) / 100.0 AS DOUBLE) AS running_revenue
    FROM daily
    ORDER BY ship_day
    """,
    doc="Frame-based cumulative window: daily revenue + running total "
    "(integer-cents cumulative sum → exact at any prefix). Aggregates "
    "first, windows over the small daily frame; the pushed-down date "
    "filter keeps the scan bounded.",
    tags=("window", "agg"),
)
def running_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("ship_day")).agg(
        F.sum(cents("l_extendedprice")).alias(
            "rev_cents"
        )
    )
    # constant-valued partition key: same one-task pass over the bounded
    # day-grain frame, without the global-window warning (prefix.py)
    from data_warehouse_project_spark.operators.prefix import single_group

    w = (
        Window.partitionBy(single_group(F.col("ship_day")))
        .orderBy("ship_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "ship_day",
        (F.col("rev_cents") / 100.0).cast("double").alias("day_revenue"),
        (F.sum("rev_cents").over(w) / 100.0).cast("double").alias("running_revenue"),
    ).orderBy("ship_day")


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(
               list_reduce(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]), (acc, x) -> acc + x)
               / (sqrt(list_reduce(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * a.e[i]), (acc, x) -> acc + x))
                  * sqrt(list_reduce(list_transform(range(1, len(b.e) + 1), i -> b.e[i] * b.e[i]), (acc, x) -> acc + x))),
               6) AS cos_sim
      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.95
    ORDER BY vec_a, vec_b
    """,
    doc="Embedding-cosine near-duplicate pairs (>= 0.95): brute-force "
    "all-pairs — correct at oracle scale; at 100 TB the same predicate "
    "runs over LSH-bucket candidates (operators/similarity.py) instead "
    "of the cross join.",
    tags=("vectors", "dedup"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.functions.vectors import as_double, cos6

    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    a = vecs.alias("a")
    b = vecs.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos6(F.col("a.e"), F.col("b.e")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
        .orderBy("vec_a", "vec_b")
    )


@register(
    "revenue_forecast_filter",
    oracle=f"""
    SELECT {_sql_exact_sum('l_extendedprice * l_discount')} AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    doc="TPC-H Q6 shape: conjunctive range predicates + arithmetic "
    "aggregate. All four predicates push into the parquet scan "
    "(min/max row-group pruning does the heavy lifting at 100 TB); "
    "the aggregate is a single map-side-combining pass.",
    tags=("agg", "pushdown"),
)
def revenue_forecast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_lines,
           {_sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE s.s_nationkey = c.c_nationkey
      AND r.r_name = (SELECT MIN(r_name) FROM region)
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    doc="TPC-H Q5 shape: 6-way join with a local-supplier correlation "
    "(supplier and customer in the same nation) and a scalar-subquery "
    "region filter. Fact-fact join on orderkey is the only big "
    "shuffle; customer/supplier/nation/region broadcast; the "
    "same-nation predicate prunes before aggregation.",
    tags=("join", "agg"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region")
    min_region = r.agg(F.min("r_name").alias("rn"))
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(min_region), F.col("r_name") == F.col("rn"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_sum(rev).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


_ABOVE_AVG_SQL = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_above_avg,
       CAST(MIN(c.c_custkey) AS BIGINT) AS first_customer
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE ROUND(c.c_acctbal * 100) >
      (SELECT SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) * 1.0 / COUNT(*)
       FROM customer c2
       WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY n.n_name
ORDER BY nation
"""


@register(
    "above_avg_customers_sql",
    oracle=_ABOVE_AVG_SQL,
    doc="J5 as literal SQL: correlated scalar subquery (customers above "
    "their nation's average balance) submitted through spark.sql() — "
    "Catalyst decorrelates it into an aggregate + join; the reference "
    "needed hand-written per-row subqueries for this shape "
    "(load_3nf_ce_sales_pre_fact_table.sql:52-75). The average is "
    "exact-integer-cents divided once, so both engines compare "
    "identical doubles.",
    tags=("sql", "join", "subquery"),
)
def above_avg_customers_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_ABOVE_AVG_SQL)


@register(
    "concurrent_open_orders",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS start_day,
             MAX(CAST(l.l_shipdate AS DATE)) AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    deltas AS (
      SELECT start_day AS day, 1 AS delta FROM spans
      UNION ALL
      SELECT end_day + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
      SELECT CAST(day AS DATE) AS day, CAST(SUM(delta) AS BIGINT) AS net_delta
      FROM deltas GROUP BY day
    )
    SELECT day, net_delta,
           CAST(SUM(net_delta) OVER (
             ORDER BY day ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS open_orders
    FROM daily
    ORDER BY day
    """,
    doc="Sweep-line interval counting: how many orders are open "
    "(order date through last line shipment) on each day. Each "
    "interval contributes two endpoint deltas (+1 at start, -1 the day "
    "after end); a day-grain aggregate then one running sum yields the "
    "concurrency curve WITHOUT exploding each interval into its days — "
    "the O(intervals) timeline-aggregation pattern (vs O(interval-"
    "days) explode) that survives multi-year spans at 100 TB. The "
    "running-sum window rides the bounded day-grain frame, same class "
    "as running_daily_revenue.",
    tags=("window", "agg", "timeseries"),
)
def concurrent_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("start_day")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_day"))
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    deltas = spans.select(
        F.col("start_day").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(F.date_add("end_day", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("net_delta")
    )
    # constant-valued partition key over the O(endpoint-days) frame —
    # silences the benign global-window warning (prefix.py single_group)
    from data_warehouse_project_spark.operators.prefix import single_group

    w = (
        Window.partitionBy(single_group(F.col("day")))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "day",
        "net_delta",
        F.sum("net_delta").over(w).cast("bigint").alias("open_orders"),
    ).orderBy("day")
