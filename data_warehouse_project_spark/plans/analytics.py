"""Warehouse-analytics classics: cohort retention, RFM segmentation,
market-basket lift, equi-width histograms.

These are the gold-layer consumer queries a BI user of the reference
warehouse (SURVEY.md §2.9/§6 — the dimensional marts feed ad-hoc
analysis) runs on top of the star schema; here expressed directly over
the raw tables so the driver's DuckDB oracle can cross-check them.

Determinism: counts, integer-cent sums, integer cross-multiplied
ratios (ppm), total tie-breaks — per the plans/queries.py rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.operators.bloom import bloom_build, bloom_probe
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import register


@register(
    "cohort_retention",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey,
             (year(o_orderdate) * 12 + month(o_orderdate)) AS ym
      FROM orders
    ), firsts AS (
      SELECT custkey, MIN(ym) AS cohort_ym FROM o GROUP BY custkey
    ), activity AS (
      SELECT DISTINCT custkey, ym FROM o
    ), cells AS (
      SELECT f.cohort_ym, a.ym - f.cohort_ym AS months_since,
             COUNT(*) AS n_active
      FROM activity a JOIN firsts f ON a.custkey = f.custkey
      GROUP BY f.cohort_ym, months_since
    ), sizes AS (
      SELECT cohort_ym, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_ym
    )
    SELECT CAST((c.cohort_ym - 1) // 12 AS INT) AS cohort_year,
           CAST(((c.cohort_ym - 1) % 12) + 1 AS INT) AS cohort_month,
           CAST(c.months_since AS INT) AS months_since,
           c.n_active,
           s.cohort_size,
           CAST((c.n_active * 1000000) // s.cohort_size AS BIGINT) AS retention_ppm
    FROM cells c JOIN sizes s ON c.cohort_ym = s.cohort_ym
    WHERE c.months_since <= 12
    ORDER BY cohort_year, cohort_month, months_since
    """,
    doc="Monthly acquisition-cohort retention matrix: cohort = month of a "
    "customer's first order; a cohort's month-N retention = fraction of "
    "its customers active N months later (integer ppm — no float "
    "division). Plan: one custkey shuffle computes both first-order "
    "months and distinct activity months (same key), a custkey-keyed "
    "join, then a tiny (cohort, lag) aggregate with the cohort sizes "
    "broadcast back on. At 100 TB the only large exchange is the "
    "custkey one, and it is reused by Catalyst for both aggregates.",
    tags=("analytics", "retention"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
    )
    firsts = o.groupBy("custkey").agg(F.min("ym").alias("cohort_ym"))
    activity = o.distinct()
    cells = (
        activity.join(firsts, "custkey")
        .groupBy(
            "cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("months_since")
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_ym").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "cohort_ym")
        .filter(F.col("months_since") <= 12)
        .select(
            F.expr("(cohort_ym - 1) div 12").cast("int").alias("cohort_year"),
            (((F.col("cohort_ym") - 1) % 12) + 1).cast("int").alias("cohort_month"),
            F.col("months_since").cast("int").alias("months_since"),
            "n_active",
            "cohort_size",
            F.expr("(n_active * 1000000) div cohort_size")
            .cast("bigint")
            .alias("retention_ppm"),
        )
        .orderBy("cohort_year", "cohort_month", "months_since")
    )


@register(
    "rfm_segments",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey,
             (epoch_us(o_orderdate) // 86400000000) AS day,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), per AS (
      SELECT custkey, MAX(day) AS last_day,
             COUNT(*) AS f, SUM(cents) AS m_cents
      FROM o GROUP BY custkey
    ), gmax AS (
      SELECT MAX(last_day) AS global_day FROM per
    ), rfm AS (
      SELECT custkey, (g.global_day - p.last_day) AS r_days,
             p.f, CAST(p.m_cents AS BIGINT) AS m_cents
      FROM per p, gmax g
    ), q AS (
      SELECT CAST(quantile_cont(r_days, 0.25) AS DOUBLE) AS rq1,
             CAST(quantile_cont(r_days, 0.50) AS DOUBLE) AS rq2,
             CAST(quantile_cont(r_days, 0.75) AS DOUBLE) AS rq3,
             CAST(quantile_cont(f, 0.25) AS DOUBLE) AS fq1,
             CAST(quantile_cont(f, 0.50) AS DOUBLE) AS fq2,
             CAST(quantile_cont(f, 0.75) AS DOUBLE) AS fq3,
             CAST(quantile_cont(m_cents, 0.25) AS DOUBLE) AS mq1,
             CAST(quantile_cont(m_cents, 0.50) AS DOUBLE) AS mq2,
             CAST(quantile_cont(m_cents, 0.75) AS DOUBLE) AS mq3
      FROM rfm
    )
    SELECT CAST(1 + CAST(r_days > rq1 AS INT) + CAST(r_days > rq2 AS INT)
                  + CAST(r_days > rq3 AS INT) AS INT) AS r_bucket,
           CAST(1 + CAST(f > fq1 AS INT) + CAST(f > fq2 AS INT)
                  + CAST(f > fq3 AS INT) AS INT) AS f_bucket,
           CAST(1 + CAST(m_cents > mq1 AS INT) + CAST(m_cents > mq2 AS INT)
                  + CAST(m_cents > mq3 AS INT) AS INT) AS m_bucket,
           COUNT(*) AS n_customers,
           CAST(SUM(m_cents) AS BIGINT) AS total_m_cents
    FROM rfm, q
    GROUP BY r_bucket, f_bucket, m_bucket
    ORDER BY r_bucket, f_bucket, m_bucket
    """,
    doc="RFM (recency / frequency / monetary) customer segmentation: "
    "per-customer last-order age in days, order count, and lifetime "
    "cents, each quartile-bucketed by the scale-safe two-pass scheme "
    "(1-row exact-percentile aggregate broadcast back over the rows — "
    "no ntile, no global sort; see quartile_buckets_acctbal). The 64 "
    "possible (r,f,m) cells aggregate customer counts and cents "
    "exactly. At 100 TB: one custkey exchange for the per-customer "
    "rollup, two O(1)-state scalar passes, one 64-cell aggregate.",
    tags=("analytics", "segmentation", "percentile"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").alias(
            "day"
        ),
        cents("o_totalprice").alias("cents"),
    )
    per = o.groupBy("custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("f"),
        F.sum("cents").alias("m_cents"),
    )
    gmax = per.agg(F.max("last_day").alias("global_day"))
    rfm = per.join(F.broadcast(gmax)).select(
        "custkey",
        (F.col("global_day") - F.col("last_day")).alias("r_days"),
        "f",
        F.col("m_cents").cast("bigint").alias("m_cents"),
    )
    q = rfm.agg(
        *[
            F.percentile(m, F.lit(p)).cast("double").alias(f"{m[0]}q{i}")
            for m in ("r_days", "f", "m_cents")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def bucket(col: str, pfx: str):
        return (
            F.lit(1)
            + (F.col(col) > F.col(f"{pfx}q1")).cast("int")
            + (F.col(col) > F.col(f"{pfx}q2")).cast("int")
            + (F.col(col) > F.col(f"{pfx}q3")).cast("int")
        ).cast("int")

    return (
        rfm.join(F.broadcast(q))
        .groupBy(
            bucket("r_days", "r").alias("r_bucket"),
            bucket("f", "f").alias("f_bucket"),
            bucket("m_cents", "m").alias("m_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m_cents").cast("bigint").alias("total_m_cents"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


@register(
    "basket_lift_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT okey) AS n_orders FROM items
    ), cnt AS (
      SELECT pkey, COUNT(*) AS n_with FROM items GROUP BY pkey
    ), pairs AS (
      SELECT a.pkey AS part_a, b.pkey AS part_b, COUNT(*) AS n_both
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY a.pkey, b.pkey
    )
    SELECT p.part_a, p.part_b, p.n_both,
           ca.n_with AS n_a, cb.n_with AS n_b,
           CAST((CAST(p.n_both AS HUGEINT) * n.n_orders * 1000000)
                // (CAST(ca.n_with AS HUGEINT) * cb.n_with)
                AS BIGINT) AS lift_ppm
    FROM pairs p
      JOIN cnt ca ON p.part_a = ca.pkey
      JOIN cnt cb ON p.part_b = cb.pkey
      CROSS JOIN n
    WHERE p.n_both >= 3
    ORDER BY lift_ppm DESC, n_both DESC, part_a, part_b
    LIMIT 25
    """,
    doc="Market-basket association mining: for every pair of parts "
    "co-occurring in >= 3 orders, lift = P(a,b) / (P(a)P(b)) as an "
    "integer-ppm cross-multiply (n_both * N * 1e6) div (n_a * n_b) — "
    "no float division, so the ranking is engine-exact; top 25 with a "
    "total (lift, count, part_a, part_b) tie-break. Plan: the "
    "order-item self-join is co-partitioned on orderkey (the pair "
    "generation never leaves the orderkey exchange), per-part counts "
    "join onto the pair aggregate, and the global order count crosses "
    "in as a 1-row broadcast. Basket-size skew bounds the blow-up: "
    "pairs per order are k(k-1)/2 of its distinct items, and a "
    "pathological mega-basket would be handled by a per-order item "
    "cap upstream.",
    tags=("analytics", "basket"),
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey"))
        .distinct()
    )
    n = items.agg(F.countDistinct("okey").alias("n_orders"))
    cnt = items.groupBy("pkey").agg(F.count(F.lit(1)).alias("n_with"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pkey") < F.col("b.pkey")))
        .groupBy(F.col("a.pkey").alias("part_a"), F.col("b.pkey").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    return (
        pairs.join(ca, F.col("part_a") == F.col("ca.pkey"))
        .join(cb, F.col("part_b") == F.col("cb.pkey"))
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.col("ca.n_with").alias("n_a"),
            F.col("cb.n_with").alias("n_b"),
            # 128-bit intermediates on both engines (decimal(38,0) /
            # HUGEINT): n_both * n_orders * 1e6 exceeds int64 once
            # n_both * n_orders passes ~9.2e12 — reachable at SF1000
            F.expr(
                "(CAST(n_both AS DECIMAL(38,0)) * n_orders * 1000000)"
                " div (CAST(ca.n_with AS DECIMAL(38,0)) * cb.n_with)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(
            F.desc("lift_ppm"), F.desc("n_both"), F.asc("part_a"), F.asc("part_b")
        )
        .limit(25)
    )


_BLOOM_WORDS_SQL = """
    WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1 + 8 * t.i, 8))::BIGINT
               % 2016 AS pos
      FROM keys, (VALUES (0), (1), (2)) t(i)
    ),
    words AS (
      SELECT pos // 63 AS word_idx,
             bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
      FROM bits GROUP BY word_idx
    )
"""


@register(
    "bloom_filter_words",
    oracle=_BLOOM_WORDS_SQL
    + """
    SELECT CAST(word_idx AS BIGINT) AS word_idx,
           CAST(word AS BIGINT) AS word,
           CAST(bit_count(word) AS BIGINT) AS n_bits
    FROM words
    ORDER BY word_idx
    """,
    doc="Bloom filter over the fact side's distinct customer keys "
    "(operators/bloom.py: 2016 bits as 32x63-bit words, k=3 md5-slice "
    "hashes), emitted word-by-word with per-word popcounts. The filter "
    "itself is the deliverable: broadcast it (a few KB) to prune a "
    "probe side without shuffling either input — the storable form of "
    "a runtime bloom join filter. The oracle rebuilds the identical "
    "words in DuckDB, so the driver hash-checks the exact bit pattern "
    "cross-engine. Build plan: scan-stage hashing, one partial agg on "
    "a 32-value key.",
    tags=("bloom", "join-pruning"),
)
def bloom_filter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    words = bloom_build(keys, "o_custkey")
    return words.select(
        F.col("word_idx").cast("bigint").alias("word_idx"),
        F.col("word").cast("bigint").alias("word"),
        F.bit_count("word").cast("bigint").alias("n_bits"),
    ).orderBy("word_idx")


@register(
    "bloom_probe_audit",
    oracle=_BLOOM_WORDS_SQL
    + """
    , probes AS (SELECT c_custkey AS k FROM customer),
    pb AS (
      SELECT p.k,
             ('0x' || substr(md5(CAST(p.k AS VARCHAR)), 1 + 8 * t.i, 8))::BIGINT
               % 2016 AS pos
      FROM probes p, (VALUES (0), (1), (2)) t(i)
    ),
    hits AS (
      SELECT pb.k,
             CASE WHEN (w.word & (1::BIGINT << CAST(pb.pos % 63 AS INT))) != 0
                  THEN 1 ELSE 0 END AS hit
      FROM pb LEFT JOIN words w ON (pb.pos // 63) = w.word_idx
    ),
    per AS (SELECT k, MIN(hit) AS pass FROM hits GROUP BY k),
    truth AS (SELECT DISTINCT o_custkey AS k FROM orders)
    SELECT COUNT(*) AS n_probes,
           CAST(SUM(per.pass) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(SUM(CASE WHEN per.pass = 1 AND t.k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN per.pass = 0 AND t.k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg
    FROM per LEFT JOIN truth t ON per.k = t.k
    """,
    doc="End-to-end bloom semi-join pruning audit: build the filter from "
    "orders' distinct custkeys, probe EVERY customer key through it, "
    "and score against exact membership — probes, passes, true "
    "members, false positives, and false negatives (which the bloom "
    "contract requires to be exactly 0; the oracle enforces it "
    "cross-engine, not just as a test assertion). The pass count tells "
    "you the pruning power a dim-side scan gains before ever touching "
    "the fact. Probe plan: 32-row broadcast of the words, probe rows "
    "never shuffle; the only exchanges are the per-key MIN and the "
    "1-row score.",
    tags=("bloom", "join-pruning"),
)
def bloom_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact_keys = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    words = bloom_build(fact_keys, "o_custkey")
    probes = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    passed = bloom_probe(probes, "k", words)
    truth = fact_keys.select(F.col("o_custkey").alias("k"), F.lit(1).alias("member"))
    scored = passed.join(truth, "k", "left")
    return scored.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("bloom_pass").cast("bigint").alias("n_pass"),
        F.sum(F.when(F.col("member").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
        F.sum(
            F.when((F.col("bloom_pass") == 1) & F.col("member").isNull(), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum(
            F.when(
                (F.col("bloom_pass") == 0) & F.col("member").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_neg"),
    )


@register(
    "order_price_histogram",
    oracle="""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    )
    SELECT CAST(c // 10000000 AS BIGINT) AS bucket_1000s,
           COUNT(*) AS n_orders,
           CAST(MIN(c) AS BIGINT) AS min_cents,
           CAST(MAX(c) AS BIGINT) AS max_cents,
           CAST(SUM(c) AS BIGINT) AS total_cents
    FROM cents
    GROUP BY bucket_1000s
    ORDER BY bucket_1000s
    """,
    doc="Equi-width order-value histogram ($1000 buckets over integer "
    "cents): the profiling primitive behind BI distribution charts and "
    "skew diagnostics. Pure scan-stage arithmetic plus one partial agg "
    "on a few-hundred-value key — the whole query is a single "
    "map-side-combining exchange at any scale.",
    tags=("analytics", "profiling"),
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("c")
    )
    return (
        c.groupBy(F.expr("c div 10000000").cast("bigint").alias("bucket_1000s"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("c").cast("bigint").alias("min_cents"),
            F.max("c").cast("bigint").alias("max_cents"),
            F.sum("c").cast("bigint").alias("total_cents"),
        )
        .orderBy("bucket_1000s")
    )


@register(
    "inventory_clamped_balance",
    oracle="""
    WITH RECURSIVE txn AS (
      SELECT l_partkey AS k,
             CAST(CASE WHEN l_returnflag = 'R' THEN ROUND(l_quantity)
                       ELSE -ROUND(l_quantity) END AS BIGINT) AS d,
             row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ),
    sizes AS (SELECT k, MAX(rn) AS n_txns FROM txn GROUP BY k),
    walk AS (
      SELECT k, rn,
             CAST(GREATEST(d, 0) AS BIGINT) AS bal,
             CAST(CASE WHEN d < 0 THEN 1 ELSE 0 END AS BIGINT) AS clamps
      FROM txn WHERE rn = 1
      UNION ALL
      SELECT t.k, t.rn,
             CAST(GREATEST(w.bal + t.d, 0) AS BIGINT),
             w.clamps + CAST(w.bal + t.d < 0 AS BIGINT)
      FROM walk w JOIN txn t ON t.k = w.k AND t.rn = w.rn + 1
    )
    SELECT w.k AS partkey, s.n_txns,
           w.bal AS balance_final, w.clamps AS n_clamped
    FROM walk w JOIN sizes s ON w.k = s.k AND w.rn = s.n_txns
    ORDER BY partkey
    """,
    doc="Floored running inventory balance per part: returns (+qty) and "
    "shipments (-qty) fold in (shipdate, orderkey, linenumber) order "
    "with the balance clamped at zero — stockouts counted. The clamp "
    "makes the fold NON-associative, so no window frame or aggregate "
    "can express it: this is the applyInPandas case "
    "(operators/running.py — one partkey exchange, C-speed numpy fold "
    "per group), and the oracle is a DuckDB RECURSIVE CTE walking the "
    "same total order — the imperative path still faces the exact "
    "cross-engine gate. At 100 TB the group fold stays task-local; "
    "mega-key skew would move this to the stateful-streaming twin.",
    tags=("analytics", "stateful", "pandas-udf"),
)
def inventory_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.operators.running import (
        clamped_running_balance,
    )

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("bigint").alias("partkey"),
        F.col("l_shipdate").alias("ship"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lno"),
        F.when(F.col("l_returnflag") == "R", F.round("l_quantity"))
        .otherwise(-F.round("l_quantity"))
        .cast("bigint")
        .alias("d"),
    )
    return clamped_running_balance(
        li, "partkey", ["ship", "okey", "lno"], "d"
    ).orderBy("partkey")


_GROUPING_SETS_SQL = """
    SELECT p.p_brand AS brand,
           n.n_name AS nation,
           COUNT(*) AS n_sales,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(GROUPING(p.p_brand) * 2 + GROUPING(n.n_name) AS INT) AS gid
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((p.p_brand), (n.n_name), ())
    ORDER BY gid, brand NULLS FIRST, nation NULLS FIRST
"""


@register(
    "grouping_sets_revenue",
    oracle=_GROUPING_SETS_SQL,
    doc="Explicit GROUPING SETS — the general form behind "
    "rollup_geo_revenue (ROLLUP) and cube_returns_by_status (CUBE): "
    "brand-only totals, nation-only totals, and the grand total in ONE "
    "pass, disambiguated by the GROUPING() bitvector. The SAME SQL "
    "text runs on both engines (ANSI subset); Spark plans it as a "
    "single Expand + partial aggregate — one fact scan for all three "
    "grains instead of three scans unioned, which is the whole point "
    "at 100 TB. Revenue in integer cents keeps the partial aggregation "
    "exact.",
    tags=("sql", "agg", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "abc_classification_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev_cents,
             SUM(rev_cents) OVER (
               ORDER BY rev_cents DESC, l_partkey ROWS UNBOUNDED PRECEDING
             ) AS cum_cents,
             SUM(rev_cents) OVER () AS total_cents
      FROM rev
    ),
    classed AS (
      SELECT l_partkey, rev_cents,
             CASE WHEN cum_cents * 10 <= total_cents * 8 THEN 'A'
                  WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_cents) AS BIGINT) AS class_rev_cents
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    doc="Pareto / ABC inventory classification: parts ranked by revenue, "
    "classified by CUMULATIVE share (A: first 80%, B: to 95%, C: rest). "
    "Thresholds are integer cross-multiplies (cum*10 <= total*8) — no "
    "float ever decides a class — and the rank order carries a total "
    "tie-break (revenue desc, partkey). The cumulative sum rides the "
    "per-part aggregate via operators/prefix.py bucketed_prefix_sum "
    "(fixed-width revenue-range buckets + per-bucket offsets): no "
    "sf-proportional single-partition window anywhere in the plan, so "
    "a billion-part catalog ranks n_buckets-way parallel. Prefix sums "
    "are bucketing-invariant, so the oracle keeps the plain global "
    "window formulation.",
    tags=("agg", "window", "warehouse"),
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "bigint"
            )
        ).alias("rev_cents")
    )
    from data_warehouse_project_spark.operators.prefix import (
        bucketed_prefix_sum,
        range_bucket,
    )

    # $100k-wide revenue bins: monotone along the rev-desc order, a few
    # hundred buckets at any SF (bucket count ~ max part revenue / width)
    ranked = bucketed_prefix_sum(
        rev,
        order_by=[F.desc("rev_cents"), F.asc("l_partkey")],
        val_col="rev_cents",
        out_col="cum_cents",
        bucket=range_bucket(F.col("rev_cents"), 10_000_000, descending=True),
        total_col="total_cents",  # free from the bucket-totals frame
    )
    classed = ranked.withColumn(
        "abc_class",
        F.when(F.col("cum_cents") * 10 <= F.col("total_cents") * 8, "A")
        .when(F.col("cum_cents") * 20 <= F.col("total_cents") * 19, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_cents").cast("bigint").alias("class_rev_cents"),
        )
        .orderBy("abc_class")
    )


# ONE row-hash definition for both fingerprint queries (global +
# bucketed): a field added here changes both digests together, which is
# the point — the bucketed fingerprint localizes diffs in the SAME hash.
_FP_PAYLOAD_SQL = """md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(l_quantity AS VARCHAR) || '|' ||
               CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
             )"""
_FP_ROWHASH_CTE = f"""
    WITH rowhash AS (
      SELECT ('0x' || substr({_FP_PAYLOAD_SQL}, 1, 8))::BIGINT AS h
      FROM lineitem
    )"""


def _fp_rowhash(li):
    """lineitem → one-column frame ``h``: the shared fingerprint hash."""
    from data_warehouse_project_spark.functions.hashing import md5_prefix_int

    payload = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_quantity").cast("string"),
        cents("l_extendedprice").cast("string"),
    )
    return li.select(md5_prefix_int(payload).alias("h"))


@register(
    "table_fingerprint",
    oracle=f"""
    {_FP_ROWHASH_CTE}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS content_sum,
           CAST(MIN(h) AS BIGINT) AS content_min,
           CAST(MAX(h) AS BIGINT) AS content_max
    FROM rowhash
    """,
    doc="Order-insensitive table fingerprint: per-row md5-prefix ints "
    "combined with commutative aggregates (count/sum/min/max) — equal "
    "fingerprints certify equal content regardless of row order, "
    "partitioning, or engine. The cross-replica data-validation "
    "primitive: comparing a 100 TB table between two systems costs one "
    "scan + a 4-number exchange on each side, no data movement. Money "
    "enters the hash as integer cents so float formatting differences "
    "cannot change the digest.",
    tags=("validation", "agg"),
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fp_rowhash(table(spark, sf_dir, "lineitem")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("h").cast("bigint").alias("content_sum"),
        F.min("h").cast("bigint").alias("content_min"),
        F.max("h").cast("bigint").alias("content_max"),
    )


@register(
    "table_fingerprint_buckets",
    oracle=f"""
    {_FP_ROWHASH_CTE}
    SELECT h % 64 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS content_sum
    FROM rowhash GROUP BY h % 64 ORDER BY bucket
    """,
    doc="Bucketed fingerprint for diff LOCALIZATION: the same row hash "
    "as table_fingerprint, folded into 64 hash buckets. When two "
    "replicas' global fingerprints disagree, comparing the 64-row "
    "bucket vectors pinpoints which hash ranges differ — then only "
    "those buckets' rows need a detailed diff. Recursing (re-bucket "
    "within a differing bucket) gives log-depth localization of any "
    "discrepancy in a 100 TB table with scans, never sorts or joins.",
    tags=("validation", "agg"),
)
def table_fingerprint_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _fp_rowhash(table(spark, sf_dir, "lineitem"))
        .groupBy((F.col("h") % 64).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("bigint").alias("content_sum"),
        )
        .orderBy("bucket")
    )


@register(
    "topk_with_ties_suppliers",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT l_suppkey, rev_cents,
             RANK() OVER (ORDER BY rev_cents DESC) AS rnk
      FROM rev
    )
    SELECT l_suppkey, rev_cents, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    ORDER BY rnk, l_suppkey
    """,
    doc="Top-K WITH TIES (RANK, not ROW_NUMBER): every supplier whose "
    "revenue ties a top-5 rank is returned — the 'WITH TIES' semantics "
    "ANSI FETCH FIRST offers and row_number-based top-k silently "
    "violates. Revenue in integer cents makes tie detection exact "
    "(double-summed revenue would produce phantom tie breaks across "
    "engines). Aggregate-then-window: the rank rides |suppliers| rows, "
    "not lineitems.",
    tags=("window", "topk"),
)
def topk_with_ties_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents("l_extendedprice")).alias(
            "rev_cents"
        )
    )
    # constant-valued partition key: the rank rides the |suppliers|
    # aggregate frame in one task either way; this form avoids the
    # benign global-window warning (prefix.py single_group)
    from data_warehouse_project_spark.operators.prefix import single_group

    w = Window.partitionBy(single_group(F.col("rev_cents"))).orderBy(
        F.desc("rev_cents")
    )
    return (
        rev.withColumn("rnk", F.rank().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .orderBy("rnk", "l_suppkey")
    )


@register(
    "price_mad_by_brand",
    oracle="""
    WITH p AS (
      SELECT p_brand, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    med AS (
      SELECT p_brand, CAST(quantile_cont(cents, 0.5) AS DOUBLE) AS med_cents
      FROM p GROUP BY p_brand
    ),
    dev AS (
      SELECT p.p_brand, ABS(p.cents - m.med_cents) AS adev
      FROM p JOIN med m ON p.p_brand = m.p_brand
    )
    SELECT d.p_brand AS brand,
           CAST(m.med_cents AS DOUBLE) AS median_cents,
           CAST(quantile_cont(d.adev, 0.5) AS DOUBLE) AS mad_cents
    FROM dev d JOIN med m ON d.p_brand = m.p_brand
    GROUP BY d.p_brand, m.med_cents
    ORDER BY brand
    """,
    doc="Median absolute deviation per brand — the robust dispersion "
    "statistic (outlier-resistant alternative to stddev) used for "
    "anomaly thresholds on skewed price/quality distributions. Two "
    "exact-percentile passes over integer cents: both engines "
    "interpolate quantiles with the same correctly-rounded IEEE "
    "arithmetic on identical integer operands (the same portability "
    "argument as rfm_segments). Scale shape: per-brand percentile is a "
    "partial-aggregated group pass; the deviation join broadcasts the "
    "|brands|-row median frame.",
    tags=("agg", "stats", "percentile"),
)
def price_mad_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select(
        "p_brand", cents("p_retailprice").alias("cents")
    )
    med = p.groupBy("p_brand").agg(
        F.percentile("cents", F.lit(0.5)).cast("double").alias("med_cents")
    )
    dev = p.join(F.broadcast(med), "p_brand").select(
        "p_brand",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    return (
        dev.groupBy(F.col("p_brand").alias("brand"), F.col("med_cents"))
        .agg(F.percentile("adev", F.lit(0.5)).cast("double").alias("mad_cents"))
        .select(
            "brand",
            F.col("med_cents").cast("double").alias("median_cents"),
            "mad_cents",
        )
        .orderBy("brand")
    )


_CMS_ROWS = 4
_CMS_WIDTH = 256


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH occ AS (SELECT l_partkey FROM lineitem),
    regs AS (
      SELECT j,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                 CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % {_CMS_WIDTH} AS col,
             COUNT(*) AS c
      FROM occ, range({_CMS_ROWS}) t(j)
      GROUP BY j, col
    ),
    truth AS (
      SELECT l_partkey, COUNT(*) AS true_count
      FROM occ GROUP BY l_partkey
      ORDER BY true_count DESC, l_partkey LIMIT 10
    ),
    probes AS (
      SELECT t.l_partkey, t.true_count, r.j, r.c
      FROM truth t
      JOIN regs r
        ON r.col = ('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' ||
                    CAST(t.l_partkey AS VARCHAR)), 1, 8))::BIGINT % {_CMS_WIDTH}
    )
    SELECT l_partkey, CAST(true_count AS BIGINT) AS true_count,
           CAST(MIN(c) AS BIGINT) AS cms_estimate
    FROM probes GROUP BY l_partkey, true_count
    ORDER BY true_count DESC, l_partkey
    """,
    doc="Count-min sketch heavy hitters: a 4x256 register array over "
    "part occurrences (seeded md5 row hashes — deterministic, so both "
    "engines build the IDENTICAL sketch), probed for the true top-10 "
    "parts. cms_estimate >= true_count always (one-sided error); the "
    "register array is 1 KB of state summarizing any number of rows — "
    "the streaming/low-memory answer to heavy-hitter tracking when an "
    "exact groupBy of the full key space is too wide. Scale shape: one "
    "partial-aggregated shuffle of (row, col) cells, sketch size "
    "constant in data volume.",
    tags=("sketch", "agg"),
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey")

    from data_warehouse_project_spark.functions.hashing import md5_prefix_int

    def col_of(j_col, key_col):
        return F.pmod(
            md5_prefix_int(
                F.concat(j_col.cast("string"), F.lit(":"), key_col.cast("string"))
            ),
            F.lit(_CMS_WIDTH),
        )

    occ = li.select(
        "l_partkey", F.explode(F.sequence(F.lit(0), F.lit(_CMS_ROWS - 1))).alias("j")
    )
    regs = (
        occ.select("j", col_of(F.col("j"), F.col("l_partkey")).alias("col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("l_partkey"))
        .limit(10)
    )
    probes = truth.join(
        F.broadcast(regs),
        regs.col == col_of(regs.j, truth.l_partkey),
    )
    return (
        probes.groupBy("l_partkey", "true_count")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
        .select(
            "l_partkey",
            F.col("true_count").cast("bigint").alias("true_count"),
            "cms_estimate",
        )
        .orderBy(F.desc("true_count"), "l_partkey")
    )
