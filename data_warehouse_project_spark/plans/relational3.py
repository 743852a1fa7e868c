"""Round-2 analytics widening: semi-joins, CUBE grouping, window
frames, exact percentiles, ordered string aggregation, scale-safe
quantile bucketing, and event-sequence analytics.

These go beyond the reference's operator list (SURVEY.md §2 notes CUBE/
grouping sets/percentiles are "free in Spark if we later want them" —
this is 'later'), but keep its test discipline: every query has a DuckDB
oracle twin and deterministic cross-engine values (integer-unit sums,
total tie-breaks; plans/queries.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import (
    _sql_exact_sum,
    exact_sum,
    register,
)


@register(
    "semijoin_fast_ship_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
    )
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    doc="Left semi-join (TPC-H Q4 shape): orders with at least one line "
    "shipped within 7 days of ordering, counted by priority. The EXISTS "
    "becomes a left_semi join — Spark never materializes the match "
    "multiplicity, so the probe side streams once; at scale this is the "
    "same orderkey-shuffle as any fact⋈fact join, with the semi "
    "short-circuit cutting the build side's output.",
    tags=("join", "semi"),
)
def semijoin_fast_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    fast = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")),
        "left_semi",
    )
    return (
        fast.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


@register(
    "cube_returns_by_status",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n_rows,
           {_sql_exact_sum('l_extendedprice')} AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
    doc="CUBE aggregation over (returnflag, linestatus) with grouping id "
    "— all four grouping sets in ONE pass (Catalyst expands the cube "
    "into a single Expand + partial-agg pipeline, not four scans). "
    "NULL group placeholders are coalesced to 'ALL' so the oracle "
    "comparison has no NULL-vs-NULL ambiguity.",
    tags=("agg", "cube"),
)
def cube_returns_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("gid").cast("bigint").alias("gid"),
            "n_rows",
            "revenue",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


@register(
    "moving_revenue_7d",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_day,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY ship_day
    )
    SELECT ship_day,
           CAST(rev_cents / 100.0 AS DOUBLE) AS day_revenue,
           CAST(SUM(rev_cents) OVER (
             ORDER BY ship_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) / 100.0 AS DOUBLE) AS revenue_7d
    FROM daily
    ORDER BY ship_day
    """,
    doc="Sliding window FRAME (ROWS 6 PRECEDING): 7-day moving revenue "
    "over the daily rollup. The frame runs over the aggregated day-grain "
    "frame (bounded: one row per calendar day), so the global sort is a "
    "few thousand rows regardless of fact size — the heavy lifting is "
    "the partial-agg day rollup, which scales. Sums stay integer-cents "
    "inside the frame for cross-engine exactness.",
    tags=("window", "frame"),
)
def moving_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("ship_day")
    ).agg(
        F.sum(cents("l_extendedprice")).alias(
            "rev_cents"
        )
    )
    # constant-valued partition key over the bounded day-grain frame —
    # same one-task execution, no global-window warning (prefix.py)
    from data_warehouse_project_spark.operators.prefix import single_group

    w = (
        Window.partitionBy(single_group(F.col("ship_day")))
        .orderBy("ship_day")
        .rowsBetween(-6, 0)
    )
    return daily.select(
        "ship_day",
        (F.col("rev_cents") / F.lit(100.0)).cast("double").alias("day_revenue"),
        (F.sum("rev_cents").over(w) / F.lit(100.0))
        .cast("double")
        .alias("revenue_7d"),
    ).orderBy("ship_day")


@register(
    "median_price_by_brand",
    oracle="""
    SELECT p_brand AS brand,
           COUNT(*) AS n_parts,
           CAST(quantile_cont(CAST(ROUND(p_retailprice * 100) AS BIGINT), 0.5)
                AS DOUBLE) AS median_price_cents,
           CAST(quantile_cont(CAST(ROUND(p_retailprice * 100) AS BIGINT), 0.9)
                AS DOUBLE) AS p90_price_cents
    FROM part
    GROUP BY p_brand
    ORDER BY brand
    """,
    doc="Exact percentiles (median + p90) per brand over integer-cents "
    "prices — linear-interpolation quantiles agree bit-for-bit across "
    "engines only on integer inputs (interpolated halves/tenths of ints "
    "are exactly representable doubles). Spark's percentile is a "
    "sort-based exact aggregate; for 100 TB switch to approx_percentile "
    "with an error budget — kept exact here because the oracle is exact.",
    tags=("agg", "percentile"),
)
def median_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    price_cents = cents("p_retailprice")
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.percentile(price_cents, F.lit(0.5)).cast("double").alias(
                "median_price_cents"
            ),
            F.percentile(price_cents, F.lit(0.9)).cast("double").alias(
                "p90_price_cents"
            ),
        )
        .orderBy("brand")
    )


@register(
    "top_parts_csv_per_brand",
    oracle="""
    WITH ranked AS (
      SELECT p_brand, p_partkey,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey
             ) AS rn
      FROM part
    )
    SELECT p_brand AS brand,
           STRING_AGG(CAST(p_partkey AS VARCHAR), ',' ORDER BY rn) AS top3_parts
    FROM ranked WHERE rn <= 3
    GROUP BY p_brand
    ORDER BY brand
    """,
    doc="Ordered string aggregation: the 3 priciest parts per brand as a "
    "CSV in rank order — collect_list carries (rn, key) structs, "
    "sort_array makes the order deterministic (collect_list alone has "
    "no ordering guarantee in a distributed agg), then transform + "
    "array_join emit the string. The window partitions on the "
    "high-cardinality brand key, so no global sort.",
    tags=("agg", "window", "collect"),
)
def top_parts_csv_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    ranked = p.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return (
        ranked.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("rn", "p_partkey"))
                    ),
                    lambda s: s["p_partkey"].cast("string"),
                ),
                ",",
            ).alias("top3_parts")
        )
        .orderBy("brand")
    )


@register(
    "word_topk_documents",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, COUNT(*) AS n_occurrences
    FROM words
    WHERE word <> ''
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT 20
    """,
    doc="Corpus-wide token frequency top-20 (whitespace tokenizer, total "
    "tie-break on the word). explode(split()) stays in the scan stage; "
    "only (word, partial count) pairs shuffle — the word-count shape "
    "that survives any corpus size.",
    tags=("text", "topk"),
)
def word_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(20)
    )


@register(
    "quartile_buckets_acctbal",
    oracle="""
    WITH cents AS (
      SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal FROM customer
    ), q AS (
      SELECT CAST(quantile_cont(bal, 0.25) AS DOUBLE) AS q1,
             CAST(quantile_cont(bal, 0.50) AS DOUBLE) AS q2,
             CAST(quantile_cont(bal, 0.75) AS DOUBLE) AS q3
      FROM cents
    )
    SELECT CAST(1 + CAST(bal > q1 AS INT) + CAST(bal > q2 AS INT)
                  + CAST(bal > q3 AS INT) AS INT) AS quartile,
           COUNT(*) AS n_customers,
           CAST(MIN(bal) AS BIGINT) AS min_bal_cents,
           CAST(MAX(bal) AS BIGINT) AS max_bal_cents
    FROM cents, q
    GROUP BY quartile
    ORDER BY quartile
    """,
    doc="Scale-safe quartile bucketing: NOT ntile() (a global windowless "
    "sort through one task) — instead a two-pass plan: (1) exact "
    "quartile boundaries as a 1-row aggregate, (2) broadcast-cross the "
    "3 boundaries and bucket by comparison, fully parallel. The "
    "boundaries pass is the only serial state and it is O(1). At 100 TB "
    "swap percentile for approx_percentile; the bucketing pass is "
    "unchanged.",
    tags=("agg", "percentile", "window-alternative"),
)
def quartile_buckets_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        cents("c_acctbal").alias("bal")
    )
    q = c.agg(
        F.percentile("bal", F.lit(0.25)).cast("double").alias("q1"),
        F.percentile("bal", F.lit(0.50)).cast("double").alias("q2"),
        F.percentile("bal", F.lit(0.75)).cast("double").alias("q3"),
    )
    bucket = (
        F.lit(1)
        + (F.col("bal") > F.col("q1")).cast("int")
        + (F.col("bal") > F.col("q2")).cast("int")
        + (F.col("bal") > F.col("q3")).cast("int")
    )
    return (
        c.join(F.broadcast(q))
        .groupBy(bucket.cast("int").alias("quartile"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("bal").cast("bigint").alias("min_bal_cents"),
            F.max("bal").cast("bigint").alias("max_bal_cents"),
        )
        .orderBy("quartile")
    )


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           COUNT(*) AS n_lines,
           {_sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation
    ORDER BY volume DESC, supp_nation, cust_nation
    LIMIT 20
    """,
    doc="TPC-H Q7 shape: cross-border trade volume between (supplier "
    "nation, customer nation) pairs. Two independent dimension chains "
    "hang off the fact — customer geography via orders, supplier "
    "geography directly — all broadcast except the one lineitem⋈orders "
    "shuffle; the <> predicate runs post-join on broadcast columns "
    "(nation names), never touching fact bytes.",
    tags=("join", "agg", "topk"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_sum(vol).alias("volume"),
        )
        .orderBy(F.desc("volume"), "supp_nation", "cust_nation")
        .limit(20)
    )


@register(
    "small_qty_revenue",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small_lines,
           {_sql_exact_sum('l.l_extendedprice')} AS total_revenue
    FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
    WHERE 5 * CAST(ROUND(l.l_quantity) AS BIGINT) * p.cnt < p.sum_qty
    """,
    doc="TPC-H Q17 shape: revenue from order lines whose quantity is "
    "below 20% of that part's average quantity. The threshold compare "
    "is rewritten to pure integers — qty < 0.2 * sum/cnt becomes "
    "5*qty*cnt < sum — so no engine-specific double division ever "
    "happens (the oracle-parity trap for any avg-threshold query). "
    "Plan: one partial-agg pass builds per-part (sum, cnt), then a "
    "self-join back on partkey — both sides hash on the same key, one "
    "shuffle each, no broadcast of the unbounded per-part frame.",
    tags=("join", "agg", "subquery"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qty_int = F.round("l_quantity").cast("bigint")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty_int).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    joined = li.join(per_part, "l_partkey").filter(
        F.lit(5) * qty_int * F.col("cnt") < F.col("sum_qty")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        exact_sum("l_extendedprice").alias("total_revenue"),
    )


@register(
    "extreme_parts_by_brand",
    oracle="""
    SELECT p_brand AS brand,
           arg_min(p_partkey,
                   CAST(ROUND(p_retailprice * 100) AS BIGINT) * 10000000000
                     + p_partkey) AS cheapest_part,
           arg_max(p_partkey,
                   CAST(ROUND(p_retailprice * 100) AS BIGINT) * 10000000000
                     + p_partkey) AS priciest_part,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY p_brand
    ORDER BY brand
    """,
    doc="min_by/max_by (SQL arg_min/arg_max): cheapest and priciest part "
    "key per brand in ONE aggregate pass — no window, no self-join, "
    "fully partial-aggregatable (each map task keeps one candidate per "
    "brand). The ordering key packs (price_cents, partkey) into a single "
    "bigint because a bare min_by on price alone is nondeterministic "
    "under ties — and DuckDB 1.0's arg_min can't take a struct key, so "
    "the packed scalar keeps both engines on the identical total order.",
    tags=("agg", "argminmax"),
)
def extreme_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    key = (
        cents("p_retailprice") * F.lit(10_000_000_000)
        + F.col("p_partkey")
    )
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.min_by("p_partkey", key).alias("cheapest_part"),
            F.max_by("p_partkey", key).alias("priciest_part"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("brand")
    )


@register(
    "event_pairs_60s",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id <> a.event_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
    doc="Temporal range self-join, band-bucketed: pairs of same-user "
    "events within 60 s. A naive theta-join is O(n²) per user; instead "
    "each earlier event opens a [ts, ts+60s] interval and the pairing "
    "runs through operators/rangejoin.interval_point_join (60 s "
    "buckets + user_id equi-key) — every true pair lands in exactly "
    "one equi-join bucket pairing, so the plan is a plain hash join on "
    "(user, bucket) with a residual micros filter. The oracle states "
    "the naive theta-join; same pairs. Timestamp arithmetic in unix "
    "micros (bigint) per determinism rule 4; 'strictly later' and "
    "'not self' are residual filters on top of the closed-interval "
    "containment.",
    tags=("join", "range", "events"),
)
def event_pairs_60s(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_join,
    )

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    iv = e.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("type_a"),
        F.col("us").alias("lo"),
        (F.col("us") + 60_000_000).alias("hi"),
    )
    pt = e.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("type_b"),
        F.col("us").alias("b_us"),
    )
    pairs = interval_point_join(
        pt, iv, "b_us", "lo", "hi", bucket_width=60_000_000, keys=["user_id"]
    ).filter((F.col("b_us") > F.col("lo")) & (F.col("b_id") != F.col("a_id")))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


@register(
    "salted_type_revenue",
    oracle=f"""
    SELECT p.p_type AS part_type,
           COUNT(*) AS n_sales,
           {_sql_exact_sum('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    ORDER BY revenue DESC, part_type
    LIMIT 15
    """,
    doc="Skew-resistant salted join, oracle-verified: the lineitem⋈part "
    "equi-join runs through operators/skew.py salted_join (small side "
    "replicated over 8 salt replicas, big side scattered uniformly) and "
    "must produce byte-identical aggregates to the plain-join oracle. "
    "This is the pre-planned fallback for power-law keys that AQE's "
    "runtime skew splitting can't fix; correctness of the rewrite is "
    "exactly what this query's hash gate proves.",
    tags=("join", "skew"),
)
def salted_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = salted_join(li, p, "p_partkey", how="inner", salt=8)
    return (
        joined.groupBy(F.col("p_type").alias("part_type"))
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "part_type")
        .limit(15)
    )


@register(
    "event_transition_counts",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    doc="Event-sequence transition matrix: per-user lag window (one "
    "shuffle on the high-cardinality user key) → (prev, next) pair "
    "counts. The Markov-chain building block for session analytics; "
    "partial aggregation collapses pairs map-side.",
    tags=("window", "events"),
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


_PRIORITY_DAYS = (
    ("1-URGENT", 2),
    ("2-HIGH", 7),
    ("3-MEDIUM", 14),
    ("4-NOT SPECIFIED", 21),
    ("5-LOW", 30),
)


def _priority_days_expr():
    """Priority → open-window days as a Column — ONE definition for
    both range-join queries (and it must track the CASE expressions in
    their SQL oracles; change all together or parity splits)."""
    pdays = F.lit(_PRIORITY_DAYS[-1][1])
    for name, d in _PRIORITY_DAYS[:-1]:
        pdays = F.when(F.col("o_orderpriority") == name, d).otherwise(pdays)
    return pdays


@register(
    "shipments_during_open_orders",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS lo,
             CAST(o_orderdate AS DATE) + CASE o_orderpriority
               WHEN '1-URGENT' THEN 2 WHEN '2-HIGH' THEN 7
               WHEN '3-MEDIUM' THEN 14 WHEN '4-NOT SPECIFIED' THEN 21
               ELSE 30 END AS hi
      FROM orders
    ),
    pt AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_day FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT iv.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT iv.o_orderkey) AS BIGINT) AS n_orders_hit
    FROM pt JOIN iv ON pt.ship_day BETWEEN iv.lo AND iv.hi
    GROUP BY priority
    ORDER BY priority
    """,
    doc="Variable-width interval containment COUNTS — the scale-correct "
    "decomposition. The r7 sf1 scale smoke caught the previous "
    "formulation (materialize every (shipment, open-order) pair via "
    "operators/rangejoin.interval_point_join, then aggregate) running "
    "53.8× the wall at 10× the rows: with 10× density on BOTH sides of "
    "a fixed date range the TRUE pair count grows ~100× (~83M pairs at "
    "sf0.1 → ~8.3B at sf1), so any pair-enumerating plan is Θ(density²) "
    "no matter how good the join strategy. But this query only needs "
    "per-priority COUNT(*) and COUNT(DISTINCT order): pair counts over "
    "containment decompose exactly into a DAY-SPINE PREFIX SUM — "
    "points roll up to per-day counts (≤365 rows, bounded by the date "
    "range, i.e. model state), a cumulative sum C(d) over the spine, "
    "and each interval's pair count is C(hi)-C(lo-1) via two broadcast "
    "joins of the 366-row spine. O(points + intervals), zero pair "
    "rows. The generic pair-materializing range join remains the right "
    "operator when pair-level output IS the deliverable (tests + "
    "overlapping_order_windows); this entry is the pattern for "
    "aggregates over containment.",
    tags=("join", "range"),
    bench=True,
)
def shipments_during_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    pdays = _priority_days_expr()
    lo = F.unix_date(F.to_date("o_orderdate"))
    # only windows intersecting the points' 1995 range can match —
    # pre-filtering the interval side keeps the scan pruned (orders
    # span 1992-1998); the widest window is 30 days, so
    # orderdate >= 1995-01-01 - 30d suffices
    iv = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-12-02 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            lo.alias("lo"),
            (lo + pdays).alias("hi"),
        )
    )
    li = table(spark, sf_dir, "lineitem")
    pt = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select(F.unix_date(F.to_date("l_shipdate")).alias("ship_day"))

    # day spine bounded by the POINTS' static date filter, not by data
    # volume — the operator's single-task cumulative window is over
    # ≤366 rows of model state, the same justification as bucketed key
    # offsets (operators/rangejoin.interval_point_count_join)
    d0 = (_dt.date(1995, 1, 1) - _dt.date(1970, 1, 1)).days
    d1 = (_dt.date(1995, 12, 31) - _dt.date(1970, 1, 1)).days
    counted = interval_point_count_join(
        pt, iv, "ship_day", "lo", "hi", domain=(d0, d1), count_col="n"
    )
    return (
        # n > 0 first: the oracle's inner join omits a priority whose
        # every window contains zero shipments, so the decomposed plan
        # must drop n=0 intervals BEFORE grouping or tiny scale factors
        # emit a (priority, 0, 0) row the oracle lacks
        counted.filter(F.col("n") > 0)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum("n").cast("bigint").alias("n_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders_hit"),
        )
        .orderBy("priority")
    )


@register(
    "shipped_value_during_open_orders",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS lo,
             CAST(o_orderdate AS DATE) + CASE o_orderpriority
               WHEN '1-URGENT' THEN 2 WHEN '2-HIGH' THEN 7
               WHEN '3-MEDIUM' THEN 14 WHEN '4-NOT SPECIFIED' THEN 21
               ELSE 30 END AS hi
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1994-12-02 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    ),
    pt AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_day,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT iv.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(pt.cents) AS BIGINT) AS shipped_cents
    FROM pt JOIN iv ON pt.ship_day BETWEEN iv.lo AND iv.hi
    GROUP BY priority
    ORDER BY priority
    """,
    doc="Weighted aggregate over interval containment: the total "
    "shipped VALUE (exact bigint cents) landing inside each order's "
    "priority-dependent open window, by priority — the sum_cols "
    "extension of interval_point_count_join. The oracle states the "
    "Θ(density²) pair join; the plan computes one extra running sum "
    "over the same ≤366-row day spine and never materializes a pair. "
    "Demonstrates that ANY sum-decomposable measure (revenue, tokens, "
    "bytes) rides the count decomposition for free at 100 TB.",
    tags=("join", "range", "agg"),
)
def shipped_value_during_open_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as _dt

    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    pdays = _priority_days_expr()
    lo = F.unix_date(F.to_date("o_orderdate"))
    iv = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-12-02 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            lo.alias("lo"),
            (lo + pdays).alias("hi"),
        )
    )
    li = table(spark, sf_dir, "lineitem")
    pt = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select(
        F.unix_date(F.to_date("l_shipdate")).alias("ship_day"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    d0 = (_dt.date(1995, 1, 1) - _dt.date(1970, 1, 1)).days
    d1 = (_dt.date(1995, 12, 31) - _dt.date(1970, 1, 1)).days
    counted = interval_point_count_join(
        pt,
        iv,
        "ship_day",
        "lo",
        "hi",
        domain=(d0, d1),
        count_col="n",
        sum_cols={"cents_in_window": "cents"},
    )
    return (
        # same inner-join parity guard as shipments_during_open_orders:
        # the oracle never emits a priority with zero contained points
        counted.filter(F.col("n") > 0)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum("n").cast("bigint").alias("n_pairs"),
            F.sum("cents_in_window").cast("bigint").alias("shipped_cents"),
        )
        .orderBy("priority")
    )


@register(
    "ship_day_coverage_open_orders",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS lo,
             CAST(o_orderdate AS DATE) + CASE o_orderpriority
               WHEN '1-URGENT' THEN 2 WHEN '2-HIGH' THEN 7
               WHEN '3-MEDIUM' THEN 14 WHEN '4-NOT SPECIFIED' THEN 21
               ELSE 30 END AS hi
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1994-12-02 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    ),
    pt AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_day FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    ),
    per_order AS (
      SELECT iv.o_orderkey, iv.o_orderpriority,
             COUNT(DISTINCT pt.ship_day) AS d_days,
             iv.hi - iv.lo + 1 AS window_days
      FROM pt JOIN iv ON pt.ship_day BETWEEN iv.lo AND iv.hi
      GROUP BY iv.o_orderkey, iv.o_orderpriority, iv.hi - iv.lo + 1
    )
    SELECT o_orderpriority AS priority,
           CAST(SUM(d_days) AS BIGINT) AS sum_distinct_days,
           CAST(MAX(d_days) AS BIGINT) AS max_distinct_days,
           CAST(SUM(CASE WHEN d_days = window_days THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fully_covered
    FROM per_order
    GROUP BY priority
    ORDER BY priority
    """,
    doc="COUNT-DISTINCT over interval containment — the measure with "
    "no naive sum-decomposition. Distinct ship DAYS inside each "
    "order's open window (plus how many windows saw shipping on every "
    "single day), by priority. The oracle states the Θ(density²) pair "
    "join + COUNT(DISTINCT); the plan rides the same ≤366-row day "
    "spine as the count query: the per-day rollup has already "
    "collapsed duplicate ship days, so presence (0/1) prefix-sums to "
    "D and each window's distinct count is D(hi)-D(lo-1) exactly "
    "(operators/rangejoin.interval_point_count_join "
    "distinct_count_col). Unlike COUNT/SUM, this works ONLY because "
    "the decomposition is over the ordered value domain — disjoint "
    "range slices partition the distinct values — which is what makes "
    "it safe where generic COUNT DISTINCT re-aggregation is not.",
    tags=("join", "range", "agg"),
)
def ship_day_coverage_open_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as _dt

    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    pdays = _priority_days_expr()
    lo = F.unix_date(F.to_date("o_orderdate"))
    iv = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-12-02 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            lo.alias("lo"),
            (lo + pdays).alias("hi"),
        )
    )
    li = table(spark, sf_dir, "lineitem")
    pt = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select(F.unix_date(F.to_date("l_shipdate")).alias("ship_day"))
    d0 = (_dt.date(1995, 1, 1) - _dt.date(1970, 1, 1)).days
    d1 = (_dt.date(1995, 12, 31) - _dt.date(1970, 1, 1)).days
    counted = interval_point_count_join(
        pt,
        iv,
        "ship_day",
        "lo",
        "hi",
        domain=(d0, d1),
        count_col="n",
        distinct_count_col="d_days",
    )
    return (
        # inner-join parity: the oracle's join omits zero-shipment
        # windows entirely (n > 0 ⟺ d_days > 0 here, but filter on n —
        # the count measure — for symmetry with the sibling queries)
        counted.filter(F.col("n") > 0)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum("d_days").cast("bigint").alias("sum_distinct_days"),
            F.max("d_days").cast("bigint").alias("max_distinct_days"),
            F.sum(
                F.when(
                    F.col("d_days") == F.col("hi") - F.col("lo") + 1, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_fully_covered"),
        )
        .orderBy("priority")
    )


@register(
    "preceding_events_10min_micros",
    oracle="""
    WITH pt AS (
      SELECT epoch_us(ts) AS p,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    iv AS (
      SELECT event_id,
             epoch_us(ts) - 600000000 AS lo,
             epoch_us(ts) AS hi,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ),
    per_iv AS (
      SELECT iv.event_id, iv.day,
             COUNT(*) AS n, SUM(pt.cents) AS c,
             COUNT(DISTINCT pt.p) AS d
      FROM pt JOIN iv ON pt.p BETWEEN iv.lo AND iv.hi
      GROUP BY iv.event_id, iv.day
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(n) AS BIGINT) AS n_pairs,
           CAST(SUM(c) AS BIGINT) AS cents_in_window,
           CAST(MAX(n) AS BIGINT) AS max_in_window,
           CAST(SUM(d) AS BIGINT) AS distinct_ts_pairs
    FROM per_iv GROUP BY day ORDER BY day
    """,
    doc="Aggregate-over-containment at RAW MICROSECOND resolution — "
    "the domain the dense day-spine decomposition cannot touch (a "
    "month of micros is ~2.6e12 values vs the 4M spine bound). For "
    "every purchase event: how many events (and how many value-cents) "
    "landed in the 10 minutes leading up to it, rolled up per day. "
    "The oracle states the pair join; the plan is "
    "operators/rangejoin.interval_point_count_join_sparse — prefix "
    "sums over the DISTINCT PRESENT timestamps (data-proportional, "
    "distributed) instead of a value spine, with a bounded 10-minute "
    "bucket carry spine (4.3k buckets/month, enforced in-plan) and "
    "as-of union lookups for the window endpoints. Zero pair rows at "
    "any density, no pre-bucketing of the timestamp column.",
    tags=("join", "range", "agg", "events"),
    bench=True,
)
def preceding_events_10min_micros(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join_sparse,
    )

    ev = table(spark, sf_dir, "events")
    pt = ev.select(
        F.unix_micros("ts").alias("p"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    iv = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        (F.unix_micros("ts") - F.lit(600_000_000)).alias("lo"),
        F.unix_micros("ts").alias("hi"),
        F.to_date("ts").alias("day"),
    )
    counted = interval_point_count_join_sparse(
        pt,
        iv,
        "p",
        "lo",
        "hi",
        bucket_width=600_000_000,  # 10-min stripes ≈ window span
        count_col="n",
        sum_cols={"c": "cents"},
        # sparse distinct mode on the oracle path: the per-value rollup
        # has already collapsed duplicate timestamps, so presence 0/1
        # prefix-sums ride the same spine — D(hi) − D(lo−1) per window
        distinct_count_col="d",
    )
    return (
        # n ≥ 1 always (each purchase contains itself) but the n > 0
        # inner-join parity guard stays uniform with its siblings
        counted.filter(F.col("n") > 0)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum("n").cast("bigint").alias("n_pairs"),
            F.sum("c").cast("bigint").alias("cents_in_window"),
            F.max("n").cast("bigint").alias("max_in_window"),
            F.sum("d").cast("bigint").alias("distinct_ts_pairs"),
        )
        .orderBy("day")
    )


@register(
    "overlapping_order_windows",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS lo,
             CAST(o_orderdate AS DATE) + CASE o_orderpriority
               WHEN '1-URGENT' THEN 2 WHEN '2-HIGH' THEN 7
               WHEN '3-MEDIUM' THEN 14 WHEN '4-NOT SPECIFIED' THEN 21
               ELSE 30 END AS hi
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
    )
    SELECT a.o_orderpriority AS priority_a,
           b.o_orderpriority AS priority_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM iv a JOIN iv b
      ON a.lo <= b.hi AND b.lo <= a.hi AND a.o_orderkey < b.o_orderkey
    GROUP BY priority_a, priority_b
    ORDER BY priority_a, priority_b
    """,
    doc="Interval OVERLAP self-join (the second canonical range-join "
    "shape, vs containment): which March-1995 order fulfilment windows "
    "were simultaneously open, paired by priority class — the "
    "concurrency-contention matrix. Runs through operators/rangejoin."
    "interval_overlap_join: both sides band into 16-day buckets and "
    "each true pair is claimed by exactly ONE canonical bucket (the "
    "overlap region's left edge), so the plan needs NO pair-level "
    "DISTINCT — dedup by construction where the oracle states the "
    "naive theta self-join. Ordered-pair identity (key_a < key_b) is a "
    "residual, like the overlap test itself.",
    tags=("join", "range"),
)
def overlapping_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    pdays = _priority_days_expr()
    lo = F.unix_date(F.to_date("o_orderdate"))
    base = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-03-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            lo.alias("lo"),
            (lo + pdays).alias("hi"),
        )
    )
    a = base.select(
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderpriority").alias("priority_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = base.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderpriority").alias("priority_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    pairs = interval_overlap_join(
        a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucket_width=16
    ).filter(F.col("key_a") < F.col("key_b"))
    return (
        pairs.groupBy("priority_a", "priority_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("priority_a", "priority_b")
    )
