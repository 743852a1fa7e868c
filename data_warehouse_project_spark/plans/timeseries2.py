"""Time-series completion and analytic-window tranche: date-spine
gap-filling with forward-fill, distribution ranks (percent_rank /
cume_dist), and inter-event gap analysis via lead().

Determinism (plans/queries.py rules): daily totals are carried as
integer micro-units through the forward-fill so the final re-sum is an
integer sum with one closing division; rank functions are pure integer
rational arithmetic; every lead() window orders by a total key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import register


@register(
    "gapfill_user_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS units
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))
                  AS DATE) AS day
      FROM daily GROUP BY user_id
    ),
    filled AS (
      SELECT s.user_id, s.day, d.units,
             last_value(d.units IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS filled_units
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id,
           COUNT(*) AS n_days,
           COUNT(*) - COUNT(units) AS n_gap_days,
           CAST(CAST(SUM(filled_units) AS BIGINT) / 1000000.0 AS DOUBLE)
             AS filled_total
    FROM filled
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Date-spine gap-filling with forward-fill (the warehouse "
    "'complete the calendar' op): per user, build the min..max day "
    "spine with sequence(), left-join observed daily totals, and "
    "carry the last observation forward with last(ignorenulls) — then "
    "profile how many days were gaps and what the filled series sums "
    "to. The spine explode and the fill window both partition on "
    "user_id (high cardinality — no single-task funnel), and daily "
    "totals stay integer micro-units through the fill so the closing "
    "sum is exact on any partitioning. At 100 TB the spine join is a "
    "per-key local op after the daily pre-aggregation shrinks the "
    "fact.",
    tags=("timeseries", "window", "gapfill"),
)
def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.round(F.col("value") * 1000000).cast("bigint").alias("__u"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("__u").alias("units"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
        .select(
            "user_id",
            F.explode(F.sequence("__lo", "__hi")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "units",
        F.last("units", ignorenulls=True).over(w).alias("filled_units"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.count(F.lit(1)) - F.count("units")).alias("n_gap_days"),
            (F.sum("filled_units") / F.lit(1000000.0))
            .cast("double")
            .alias("filled_total"),
        )
        .orderBy("user_id")
    )


@register(
    "balance_percentile_by_segment",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
               AS pct_rank,
             cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
               AS cume
      FROM customer
    )
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           c_acctbal AS acctbal,
           pct_rank, cume
    FROM ranked WHERE pct_rank >= 0.99
    ORDER BY segment, custkey
    """,
    doc="Distribution ranks: percent_rank and cume_dist of account "
    "balance within each market segment, keeping the top percentile "
    "(the 'where does this customer sit in their cohort' shape). Both "
    "functions are rational arithmetic over integer ranks — (rank-1)/"
    "(n-1) and rank/n — so ties collapse identically in both engines "
    "and the doubles compare bit-for-bit. The window partitions on "
    "segment; at higher scale swap the partition key for a composite "
    "(segment, nation) or pre-bucket to keep per-partition sorts "
    "bounded.",
    tags=("window", "rank"),
)
def balance_percentile_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    ranked = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    return ranked.filter(F.col("pct_rank") >= 0.99).orderBy("segment", "custkey")


@register(
    "order_gap_profile",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             CAST(date_diff('day', o_orderdate,
                  lead(o_orderdate) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS gap_days
      FROM orders
    )
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           CAST(CAST(SUM(gap_days) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_gap
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    ORDER BY custkey
    """,
    doc="Inter-event gaps via lead(): days between a customer's "
    "consecutive orders, profiled (min/max/exact-average) for "
    "frequent buyers. The lead window orders by (orderdate, orderkey) "
    "— a total order, so same-day orders pair deterministically. Gaps "
    "are integer day counts; the average is one integer-sum division. "
    "The window partitions on custkey (high cardinality), which is "
    "also the shuffle key of the following aggregation — Spark reuses "
    "the partitioning, so the whole query is one shuffle.",
    tags=("window", "lead", "timeseries"),
)
def order_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(F.lead("od").over(w), F.col("od")).cast("bigint").alias("gap_days"),
    )
    return (
        seq.filter(F.col("gap_days").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").alias("min_gap"),
            F.max("gap_days").alias("max_gap"),
            (F.sum("gap_days").cast("double") / F.count(F.lit(1))).alias("avg_gap"),
        )
        .filter(F.col("n_gaps") >= 12)
        .orderBy("custkey")
    )


@register(
    "customer_spend_trailing_90d",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey,
             o_orderdate,
             epoch_us(o_orderdate) AS us,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_custkey % 100 = 0
    )
    SELECT custkey,
           o_orderdate AS order_ts,
           CAST(SUM(cents) OVER (
             PARTITION BY custkey ORDER BY us
             RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW
           ) / 100.0 AS DOUBLE) AS spend_90d,
           CAST(COUNT(*) OVER (
             PARTITION BY custkey ORDER BY us
             RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_90d
    FROM o
    ORDER BY custkey, order_ts
    """,
    doc="Time-RANGE window frame: each order's trailing-90-day spend and "
    "order count for the same customer — a true RANGE frame over event "
    "time (bigint epoch microseconds), not a row-count frame, so irregular order "
    "spacing is handled exactly. RANGE frames with duplicate ordering "
    "keys include ALL peers of the current row in both engines — "
    "identical peer semantics, and the summed values are integer "
    "cents, so ties cannot diverge. The 1-in-100 customer filter keeps "
    "the oracle frame small; the window partitions on custkey "
    "(high-cardinality — no single-task funnel at any scale).",
    tags=("window", "range-frame", "timeseries"),
)
def customer_spend_trailing_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    base = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("order_ts"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
        cents("o_totalprice").alias("cents"),
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy("us")
        .rangeBetween(-7776000000000, Window.currentRow)
    )
    return base.select(
        "custkey",
        "order_ts",
        (F.sum("cents").over(w) / 100.0).cast("double").alias("spend_90d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("orders_90d"),
    ).orderBy("custkey", "order_ts")


@register(
    "brand_share_within_type",
    oracle="""
    WITH brand_rev AS (
      SELECT p.p_type AS ptype, p.p_brand AS brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, p.p_brand
    )
    SELECT ptype, brand,
           CAST(cents / 100.0 AS DOUBLE) AS revenue,
           CAST(CAST(cents AS DOUBLE) / SUM(cents) OVER (PARTITION BY ptype)
                AS DOUBLE) AS share_of_type
    FROM brand_rev
    ORDER BY ptype, brand
    """,
    doc="Ratio-to-report window: each brand's revenue share within its "
    "part type — the percent-of-parent shape every BI layer ships. The "
    "window SUM runs over the already-aggregated (type, brand) frame "
    "(grain = groups, not fact rows) and both numerator and "
    "denominator are exact integer cents, divided once per row. Plan: "
    "one fact shuffle for the aggregate (part broadcasts into the "
    "scan), then a type-partitioned window on a tiny frame.",
    tags=("window", "share", "agg"),
)
def brand_share_within_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    brand_rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand"))
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("ptype")
    return brand_rev.select(
        "ptype",
        "brand",
        (F.col("cents") / 100.0).cast("double").alias("revenue"),
        (F.col("cents").cast("double") / F.sum("cents").over(w))
        .cast("double")
        .alias("share_of_type"),
    ).orderBy("ptype", "brand")


@register(
    "cumulative_distinct_parts",
    oracle="""
    WITH first_seen AS (
      SELECT o.o_custkey AS custkey,
             l.l_partkey AS partkey,
             MIN(o.o_orderdate) AS first_ts
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % 50 = 0
      GROUP BY o.o_custkey, l.l_partkey
    ),
    daily AS (
      SELECT custkey, first_ts,
             COUNT(*) AS new_parts
      FROM first_seen GROUP BY custkey, first_ts
    )
    SELECT custkey,
           first_ts AS order_ts,
           CAST(new_parts AS BIGINT) AS new_parts,
           CAST(SUM(new_parts) OVER (
             PARTITION BY custkey ORDER BY first_ts
           ) AS BIGINT) AS distinct_parts_so_far
    FROM daily
    ORDER BY custkey, order_ts
    """,
    doc="Running DISTINCT count per customer (purchase-breadth curve): "
    "Spark has no COUNT(DISTINCT) OVER, and at scale you would not "
    "want one — the scale-safe rewrite is the first-seen "
    "decomposition: MIN(date) per (customer, part) marks each part's "
    "first purchase, a per-day count of first-seens, then a plain "
    "cumulative SUM. State per window row is one integer instead of a "
    "distinct-set; every stage partitions on custkey and the same SQL "
    "runs on both engines. This is the standard trick for cumulative "
    "unique users/SKUs/tokens dashboards at warehouse scale.",
    tags=("window", "distinct", "timeseries"),
)
def cumulative_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    first_seen = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey")
        )
        .agg(F.min("o_orderdate").alias("first_ts"))
    )
    daily = first_seen.groupBy("custkey", "first_ts").agg(
        F.count(F.lit(1)).alias("new_parts")
    )
    w = Window.partitionBy("custkey").orderBy("first_ts")
    return daily.select(
        "custkey",
        F.col("first_ts").alias("order_ts"),
        F.col("new_parts").cast("bigint").alias("new_parts"),
        F.sum("new_parts").over(w).cast("bigint").alias("distinct_parts_so_far"),
    ).orderBy("custkey", "order_ts")


@register(
    "revenue_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1
    )
    SELECT ship_year, rev_cents,
           LAG(rev_cents) OVER (ORDER BY ship_year) AS prev_rev_cents,
           (FLOOR(CAST(rev_cents - LAG(rev_cents) OVER (ORDER BY ship_year)
                       AS DOUBLE) * 100.0
                  / LAG(rev_cents) OVER (ORDER BY ship_year)
                  * 1000000.0 + 0.5) / 1000000.0) AS yoy_pct
    FROM yearly
    ORDER BY ship_year
    """,
    doc="Year-over-year growth: yearly integer-cents totals, then "
    "lag() on the bounded years frame (7 rows whatever the SF — "
    "single_group declares the intentional one-task window; the "
    "sf-proportional work is all in the partial-aggregated year "
    "rollup). First year's growth is NULL by definition. The growth "
    "ratio is one subtract + multiply + divide on identical bigint "
    "operands in both engines.",
    tags=("window", "timeseries"),
)
def revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.functions.vectors import round6
    from data_warehouse_project_spark.operators.prefix import single_group

    li = table(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(
        F.sum(cents("l_extendedprice"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.partitionBy(single_group(F.col("ship_year"))).orderBy("ship_year")
    prev = F.lag("rev_cents").over(w)
    return yearly.select(
        "ship_year",
        "rev_cents",
        prev.alias("prev_rev_cents"),
        round6(
            (F.col("rev_cents") - prev).cast("double") * 100.0 / prev
        ).alias("yoy_pct"),
    ).orderBy("ship_year")


@register(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    islands AS (
      SELECT user_id, day,
             (day - DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island,
             COUNT(*) AS len, MIN(day) AS start_day
      FROM islands GROUP BY user_id, island
    ),
    ranked AS (
      SELECT user_id, len, start_day,
             COUNT(*) OVER (PARTITION BY user_id) AS n_streaks,
             CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_active_days,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY len DESC, start_day
             ) AS rk
      FROM streaks
    )
    SELECT user_id, n_active_days, n_streaks,
           CAST(len AS BIGINT) AS longest_streak,
           start_day AS longest_streak_start
    FROM ranked WHERE rk = 1
    ORDER BY user_id
    """,
    doc="Consecutive-day activity streaks (gaps-and-islands on the "
    "date grain): island id = days-since-epoch minus per-user row "
    "number — constant along a run of consecutive days, strictly "
    "decreasing across a gap. Per user: active days, streak count, "
    "and the longest streak with its start date (earliest wins ties). "
    "Every window and aggregate partitions on user_id, so the whole "
    "query is one high-cardinality shuffle — the retention/health "
    "metric shape every product warehouse ships.",
    tags=("window", "timeseries", "events"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    w_seq = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w_seq),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    w_user = Window.partitionBy("user_id")
    w_rank = Window.partitionBy("user_id").orderBy(F.desc("len"), "start_day")
    return (
        streaks.withColumn("n_streaks", F.count(F.lit(1)).over(w_user))
        .withColumn("n_active_days", F.sum("len").over(w_user).cast("bigint"))
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_active_days",
            "n_streaks",
            F.col("len").cast("bigint").alias("longest_streak"),
            F.col("start_day").alias("longest_streak_start"),
        )
        .orderBy("user_id")
    )


@register(
    "rolling_28d_active_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    bounds AS (SELECT MAX(day) AS max_day FROM days),
    contrib AS (
      SELECT d.user_id,
             CAST(u.w AS DATE) AS window_day
      FROM days d,
        unnest(generate_series(d.day, d.day + INTERVAL 27 DAY,
                               INTERVAL 1 DAY)) AS u(w)
    )
    SELECT c.window_day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_users_28d
    FROM contrib c, bounds b
    WHERE c.window_day <= b.max_day
    GROUP BY c.window_day
    ORDER BY c.window_day
    """,
    doc="Rolling 28-day active users: each (user, day) activity "
    "contributes to the 28 window-end days it is visible from, then a "
    "per-day COUNT DISTINCT. Rolling DISTINCT cannot ride a window "
    "frame (state is a set, not a sum), so the explode-by-28 is the "
    "standard exact decomposition: a bounded 28x blowup of the "
    "day-deduped frame — NOT of the raw events — shuffled once on "
    "window_day, with the distinct as a two-stage partial aggregate. "
    "At petabyte scale the same shape holds because the (user, day) "
    "frame is already the compacted grain; approximate alternatives "
    "(HLL sketch per day, merged over 28) trade exactness for a 28x "
    "smaller shuffle and are what approx_distinct_profile models.",
    tags=("timeseries", "distinct", "events"),
)
def rolling_28d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    max_day = days.agg(F.max("day").alias("max_day"))
    contrib = days.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), 27)
            )
        ).alias("window_day"),
    )
    return (
        contrib.join(F.broadcast(max_day))
        .filter(F.col("window_day") <= F.col("max_day"))
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users_28d"))
        .orderBy("window_day")
    )
