"""Aggregation & text extensions the reference lacks but Spark gives
for free (SURVEY.md §2.5 note): ROLLUP grouping sets, approximate
distinct counts, a BPE-ish regex tokenizer, and rolling-hash document
fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.operators.layout import zvalue_sql
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import (
    _sql_exact_sum,
    exact_sum,
    register,
)


def _inplan_asserts() -> bool:
    """Gate for the lifecycle queries' in-plan exact cross-checks
    (full groupBy().collect() comparisons against the maintained
    state). ON by default — the parity sweep and the driver's
    correctness runs exercise them — but bench.py exports
    SPARK_GRAFT_INPLAN_ASSERTS=0 so the timed number measures the
    OPERATOR, not the assertion harness (r13 verdict item 8: the
    cross-checks dominated topk_approx_heavy_hitters' 15 s bench
    entry). Read at call time, not import time."""
    import os

    return os.environ.get("SPARK_GRAFT_INPLAN_ASSERTS", "1") != "0"


def _overlap(*thunks):
    """Run independent eager steps concurrently (r14; optimization
    guide §2.6: overlap independent jobs so tasks from one back-fill
    executors freed by another's tail). Used by the LIFECYCLE bench
    queries for per-table commit chains that are mutually independent:
    each thunk owns ONE TxTable's chain, per-table commit order is the
    semantic contract and stays intact inside the thunk; cross-table
    interleave is not observable — the view refresh folds the whole
    multi-base window, invariant to it. Delegates to txview._pmap, so
    ``SPARK_GRAFT_NO_OVERLAP=1`` restores the sequential r13 behavior
    (the same-session A/B lever)."""
    from data_warehouse_project_spark.sources.txview import _pmap

    return _pmap(lambda f: f(), list(thunks))


@register(
    "rollup_geo_revenue",
    oracle=f"""
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           COALESCE(n.n_name, 'ALL') AS nation,
           COUNT(*) AS n_sales,
           {_sql_exact_sum('l.l_extendedprice')} AS revenue
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    ORDER BY region, nation
    """,
    doc="ROLLUP grouping sets: region/nation/grand-total in one pass — "
    "subsumes the reference's separate per-level aggregation queries. "
    "Spark expands rollup into a single partial-agg-friendly Expand; "
    "NULL group markers are coalesced to 'ALL' for a stable contract.",
    tags=("agg", "rollup"),
)
def rollup_geo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_sales",
            "revenue",
        )
        .orderBy("region", "nation")
    )


# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs —
# the GPT-2-style contraction-aware split, simplified to RE2-safe
# syntax (no backrefs/lookarounds) so both engines run the same regex.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


@register(
    "token_bpe_stats",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(regexp_extract_all(text, '{BPE_PATTERN}')) AS piece
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS total_pieces,
           COUNT(DISTINCT piece) AS vocab_size,
           CAST(SUM(CASE WHEN piece ~ '^[0-9]+$' THEN 1 ELSE 0 END) AS BIGINT)
             AS numeric_pieces,
           CAST(SUM(length(piece)) AS BIGINT) AS total_chars
    FROM tok GROUP BY lang ORDER BY lang
    """,
    doc="BPE-ish tokenizer stats: regex pre-tokenization (letters / "
    "digits / punctuation runs, RE2-safe so Spark and DuckDB execute "
    "the identical pattern) — the token-counting shape an LLM data "
    "pipeline runs before BPE merges.",
    tags=("text", "tokens"),
)
def token_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
        ).alias("piece"),
    )
    return (
        tok.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_pieces"),
            F.countDistinct("piece").alias("vocab_size"),
            F.sum(
                F.when(F.col("piece").rlike("^[0-9]+$"), 1).otherwise(0)
            ).alias("numeric_pieces"),
            F.sum(F.length("piece")).alias("total_chars"),
        )
        .orderBy("lang")
    )


# Rabin-Karp polynomial rolling hash over the token stream:
# h = (h * B + hash(token)) mod M, with B=257 and M=2^31-1 so every
# intermediate stays far inside a signed 64-bit integer in both engines.
_RH_B = 257
_RH_M = (1 << 31) - 1


@register(
    "doc_rolling_hash",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                   t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)),
               (acc, x) -> (acc * {_RH_B} + x) % {_RH_M}
             ) AS rhash
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT rhash) AS n_distinct_hashes,
           CAST(MIN(rhash) AS BIGINT) AS min_hash,
           CAST(MAX(rhash) AS BIGINT) AS max_hash
    FROM h GROUP BY lang ORDER BY lang
    """,
    doc="Rolling-hash document fingerprint (Rabin-Karp polynomial fold "
    "over token hashes, mod 2^31-1): order-sensitive — permuted docs "
    "get different fingerprints, unlike bag-of-words md5. One "
    "sequential fold per row; identical integer arithmetic on both "
    "engines.",
    tags=("text", "fingerprint"),
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok_hashes = F.transform(
        F.split(F.col("text"), " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint"),
    )
    rhash = F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _RH_B + x) % _RH_M,
    )
    h = d.select("doc_id", "lang", rhash.alias("rhash"))
    return (
        h.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("rhash").alias("n_distinct_hashes"),
            F.min("rhash").cast("bigint").alias("min_hash"),
            F.max("rhash").cast("bigint").alias("max_hash"),
        )
        .orderBy("lang")
    )


@register(
    "approx_distinct_profile",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
           TRUE AS approx_within_5pct
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="approx_count_distinct (HyperLogLog++) per order status — the "
    "at-scale replacement for exact COUNT DISTINCT (no per-key state, "
    "mergeable sketches). The raw sketch estimate is engine-specific, so "
    "it is not emitted directly; instead the oracle checks the exact "
    "COUNT DISTINCT twin plus approx_within_5pct, a boolean the Spark "
    "side computes as |hll - exact| <= 5% * exact and the oracle pins to "
    "TRUE — the error bound is hash-checked, not just asserted in pytest "
    "(HLL++ is deterministic for fixed data, so the flag is stable).",
    tags=("agg", "approx"),
)
def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers_exact"),
            F.approx_count_distinct("o_custkey", 0.02).alias("__approx"),
        )
        .select(
            "status",
            "n_orders",
            "n_customers_exact",
            (
                F.abs(F.col("__approx") - F.col("n_customers_exact"))
                <= 0.05 * F.col("n_customers_exact")
            ).alias("approx_within_5pct"),
        )
        .orderBy("status")
    )


@register(
    "json_props_stats",
    oracle="""
    WITH parsed AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM parsed GROUP BY event_type ORDER BY event_type
    """,
    doc="Semi-structured JSON column: parse events.props with a typed "
    "from_json (Catalyst-visible — the parsed struct prunes and the "
    "parse stays in codegen; never a Python UDF for JSON), then exact "
    "integer aggregates per event type. The oracle parses the same "
    "strings with DuckDB's JSON extension.",
    tags=("json", "agg"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "approx_quantile_check",
    oracle="""
    WITH cents AS (
      SELECT o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price
      FROM orders
    )
    SELECT status,
           COUNT(*) AS n_orders,
           CAST(quantile_cont(price, 0.5) AS DOUBLE) AS exact_median_cents,
           TRUE AS approx_within_1pct
    FROM cents GROUP BY status ORDER BY status
    """,
    doc="approx_percentile accuracy, oracle-pinned (same pattern as "
    "approx_distinct_profile): the t-digest estimate itself is "
    "engine-specific, so the query emits the exact median twin plus a "
    "|approx - exact| <= 1% * exact flag the oracle pins to TRUE. "
    "At 100 TB the exact percentile (sort-based) is what you replace "
    "with the sketch; this query is the acceptance test for that swap.",
    tags=("agg", "approx", "percentile"),
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    price_cents = cents("o_totalprice")
    return (
        o.select(F.col("o_orderstatus").alias("status"), price_cents.alias("price"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.percentile("price", F.lit(0.5)).cast("double").alias(
                "exact_median_cents"
            ),
            F.approx_percentile("price", F.lit(0.5), F.lit(10000)).alias("__approx"),
        )
        .select(
            "status",
            "n_orders",
            "exact_median_cents",
            (
                F.abs(F.col("__approx") - F.col("exact_median_cents"))
                <= 0.01 * F.col("exact_median_cents")
            ).alias("approx_within_1pct"),
        )
        .orderBy("status")
    )


@register(
    "pivot_segment_by_region",
    oracle="""
    SELECT r.r_name AS region,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS AUTOMOBILE,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS BUILDING,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS FURNITURE,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS HOUSEHOLD,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS MACHINERY
    FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
    doc="Pivot: customer counts, market segments as columns per region. "
    "Explicit segment list (the TPC-H vocabulary) so the output schema "
    "is static — dynamic pivot would need a collect to discover values, "
    "which is exactly what a 100 TB plan must not do.",
    tags=("pivot", "agg"),
)
def pivot_segment_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .pivot("c_mktsegment", segs)
        .count()
        .na.fill(0, segs)
        .orderBy("region")
    )


@register(
    "unpivot_order_metrics",
    oracle=f"""
    WITH m AS (
      SELECT o_orderstatus AS status,
             {_sql_exact_sum('o_totalprice')} AS total_price,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY o_orderstatus
    )
    SELECT status, metric, value FROM m
    UNPIVOT (value FOR metric IN (total_price, n_orders, n_customers))
    ORDER BY status, metric
    """,
    doc="Unpivot (wide→long): per-status metrics melted into "
    "(status, metric, value) rows via stack() — the inverse of pivot, "
    "pure projection after the aggregate (no extra shuffle).",
    tags=("pivot", "agg"),
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        exact_sum("o_totalprice").alias("total_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return m.selectExpr(
        "status",
        "stack(3, 'total_price', total_price, 'n_orders', n_orders, "
        "'n_customers', n_customers) AS (metric, value)",
    ).orderBy("status", "metric")


@register(
    "case_insensitive_lang_join",
    oracle="""
    WITH lang_dim AS (
      SELECT DISTINCT upper(lang) AS lang_code FROM documents
    )
    SELECT d.lang_code,
           COUNT(*) AS n_docs,
           CAST(MIN(doc.doc_id) AS BIGINT) AS first_doc
    FROM documents doc
      LEFT JOIN lang_dim d ON upper(doc.lang) = d.lang_code
    GROUP BY d.lang_code
    ORDER BY lang_code
    """,
    doc="J2: case-insensitive dimension lookup join (the reference joins "
    "every geo dim ON UPPER(a)=UPPER(b), load_3nf_ce_countries_table"
    ".sql:31-32). The upper() wrapping keeps the join an equi-join — "
    "hashable/broadcastable, unlike a collation-based comparison.",
    tags=("join", "functions"),
)
def case_insensitive_lang_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents")
    lang_dim = doc.select(F.upper("lang").alias("lang_code")).distinct()
    return (
        doc.join(
            F.broadcast(lang_dim),
            F.upper(doc.lang) == lang_dim.lang_code,
            "left",
        )
        .groupBy("lang_code")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang_code")
    )


@register(
    "except_lapsed_customers",
    oracle="""
    SELECT c_custkey AS customer_id FROM (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) ORDER BY customer_id
    """,
    doc="EXCEPT set op (beyond the reference, which only has UNION/U1): "
    "customers active in 1996 but lapsed in 1997. Spark plans EXCEPT as "
    "a left-anti join on distinct keys — same shape as the engine's "
    "incremental-insert guards.",
    tags=("set",),
)
def except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def active_in(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("customer_id"))
            .distinct()
        )

    # subtract = EXCEPT DISTINCT (the documented intent); exceptAll's
    # multiset semantics only coincide because both inputs are distinct
    return active_in(1996).subtract(active_in(1997)).orderBy("customer_id")


@register(
    "intersect_repeat_customers",
    oracle="""
    SELECT c_custkey AS customer_id FROM (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) ORDER BY customer_id
    """,
    doc="INTERSECT set op: customers active in both 1996 and 1997 "
    "(retention). Planned as a left-semi join on distinct keys.",
    tags=("set",),
)
def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def active_in(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("customer_id"))
            .distinct()
        )

    return active_in(1996).intersect(active_in(1997)).orderBy("customer_id")


@register(
    "zorder_locality_profile",
    oracle=f"""
    WITH coded AS (
      SELECT (o_custkey & 255) AS x,
             ((epoch_us(o_orderdate) // 86400000000) & 255) AS y,
             {zvalue_sql('o_custkey & 255', '(epoch_us(o_orderdate) // 86400000000) & 255')} AS z
      FROM orders
    )
    SELECT CAST(z >> 10 AS BIGINT) AS z_cell,
           COUNT(*) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
    FROM coded
    GROUP BY z_cell
    ORDER BY z_cell
    """,
    doc="Morton-code locality audit for the z-ordered write path "
    "(operators/layout.py): every order mapped to a 16-bit z-value of "
    "(custkey low byte, order-day low byte), rolled up into 64 "
    "z-cells with each cell's extent in BOTH source dimensions — the "
    "min/max spans that parquet footer stats would carry per file, "
    "i.e. the skipping power a two-dimensional filter gets after "
    "OPTIMIZE ZORDER. The bit-interleave expression text is shared "
    "verbatim between Spark and the DuckDB oracle (common ``>> << & "
    "|`` subset), so the mapping itself is what's being "
    "cross-checked. Plan: pure codegen bit arithmetic in the scan "
    "stage, one partial agg on the 64-value cell key.",
    tags=("layout", "diagnostics"),
)
def zorder_locality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    day = "(unix_micros(cast(o_orderdate as timestamp)) div 86400000000)"
    coded = o.select(
        F.expr("o_custkey & 255").alias("x"),
        F.expr(f"{day} & 255").alias("y"),
        F.expr(zvalue_sql("o_custkey & 255", f"{day} & 255")).alias("z"),
    )
    return (
        coded.groupBy(F.expr("z >> 10").cast("bigint").alias("z_cell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
        .orderBy("z_cell")
    )


@register(
    "tx_pruned_snapshot_scan",
    oracle="""
    WITH churned AS (
      SELECT o_orderkey AS k, o_custkey, o_orderstatus FROM orders
      UNION ALL
      SELECT o_orderkey + 1000000 AS k, o_custkey, o_orderstatus
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max
    FROM churned
    WHERE k % 13 <> 0 AND k BETWEEN 5000 AND 60000
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="The transactional snapshot consumed through the NATIVE batch "
    "data source (sources/txbatch.py): orders loaded into a TxTable "
    "keyed on the order key, churned (append of shifted-key clones + a "
    "deletion-vector delete), then read back via "
    "spark.read.format('txtable') with pruneFiles=true — Catalyst "
    "pushes the BETWEEN down and the source skips every file whose "
    "manifest key range misses it before Spark sees a path. The oracle "
    "recomputes the churned logical state in plain SQL, so what's "
    "cross-checked is the whole loop: commit protocol, dv "
    "merge-on-read in the Arrow executor path, manifest stat pruning, "
    "and Spark's re-application of the pushed predicate over "
    "straddling files. Reference analogue: any SQL client reading the "
    "warehouse through the Postgres catalog (readme.md Data Analysis) "
    "— here the catalog is the commit manifest. Scale shape: driver "
    "plans O(live files) from one manifest JSON; a key-range probe on "
    "a 100 TB table opens only intersecting files.",
    tags=("tx", "source", "pruning"),
    eager=True,
    bench=True,
)
def tx_pruned_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txbatch import TxBatchDataSource
    from data_warehouse_project_spark.sources.txtable import TxTable

    try:
        spark.dataSource.register(TxBatchDataSource)
    except Exception:
        pass  # already registered in this session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey", "o_orderstatus"
    )
    tmp = tempfile.mkdtemp(prefix="txbq_")
    try:
        t = TxTable.create(spark, tmp + "/t", o, key="k")
        t.append(
            o.filter(F.col("o_orderstatus") == "F").select(
                (F.col("k") + 1000000).alias("k"), "o_custkey", "o_orderstatus"
            )
        )
        t.delete(F.expr("k % 13 = 0"), mode="dv")
        df = (
            spark.read.format("txtable")
            .option("path", tmp + "/t")
            .option("pruneFiles", "true")
            .load()
        )
        res = (
            df.filter((F.col("k") >= 5000) & (F.col("k") <= 60000))
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_custkey").cast("bigint").alias("cust_sum"),
                F.min("k").cast("bigint").alias("k_min"),
                F.max("k").cast("bigint").alias("k_max"),
            )
            .orderBy("status")
        )
        # eager: the scratch table is deleted on return, so pin the
        # (tiny) result before the finally block tears the files down
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "join_view_brand_rollup",
    oracle="""
    WITH fact AS (
      SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS oid,
             l_partkey AS pk,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS amt
      FROM lineitem
      UNION ALL
      SELECT CAST(l_orderkey * 10 + l_linenumber + 100000000 AS BIGINT),
             l_partkey,
             CAST(2 * ROUND(l_extendedprice * 100) AS BIGINT)
      FROM lineitem WHERE l_partkey % 7 = 0
    ),
    live AS (SELECT * FROM fact WHERE oid % 13 <> 0),
    dim AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 10 = 0 THEN 'MOVED' ELSE p_brand END
               AS brand
      FROM part WHERE p_partkey % 17 <> 0
    )
    SELECT brand,
           COUNT(amt) AS n_items,
           CAST(SUM(amt) AS BIGINT) AS total_cents
    FROM live JOIN dim ON pk = p_partkey
    GROUP BY brand
    ORDER BY brand
    """,
    doc="Incremental JOIN-aggregate view (sources/txjoinview."
    "TxJoinAggView): revenue by product brand — fact ⋈ dim GROUP BY a "
    "DIM attribute — maintained from BOTH change feeds via the "
    "bilinear delta decomposition ΔF⋈D1 + F0⋈ΔD. The churn script "
    "exercises every maintenance shape in ONE refresh window: fact "
    "append (term A), a dim attribute move to brand 'MOVED' that "
    "re-buckets every joined fact row of the key (term B, fact read "
    "stats-pruned on the fk), a dim delete killing its groups' rows, "
    "and a fact dv delete. The oracle recomputes the final join-group "
    "state in plain SQL, so what's cross-checked is the algebra, the "
    "overlap accounting (keys churned on both sides in one window), "
    "and the fenced rewrite. Reference analogue: the gold-layer "
    "brand/geo rollups (dw_etl_tests.py:480-506) the reference "
    "rebuilds wholesale per run — here maintained in O(churn). Scale "
    "shape: refresh is O(fact churn + moved dim keys' fact rows + "
    "touched groups); neither base is ever scanned.",
    tags=("tx", "ivm", "join"),
    eager=True,
    bench=True,
)
def join_view_brand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxTable

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("oid"),
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("amt"),
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    tmp = tempfile.mkdtemp(prefix="jview_")
    try:
        fact, dim = _overlap(
            lambda: TxTable.create(
                spark, tmp + "/fact", li, key="oid", stats_cols=["pk"]
            ),
            lambda: TxTable.create(spark, tmp + "/dim", p, key="p_partkey"),
        )
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim,
            fk="pk", group_expr="brand", group_col="brand",
            measures={
                "total_cents": "amt",
                "n_items": ("count", "amt"),
            },
        )

        # churn BOTH sides — two independent per-table commit chains,
        # overlapped — then one incremental refresh over the window
        def churn_fact():
            fact.append(
                li.filter(F.col("pk") % 7 == 0).select(
                    (F.col("oid") + 100000000).alias("oid"),
                    "pk",
                    (F.col("amt") * 2).alias("amt"),
                )
            )
            fact.delete(F.col("oid") % 13 == 0, mode="dv")

        def churn_dim():
            dim.merge(
                p.filter(F.col("p_partkey") % 10 == 0).withColumn(
                    "brand", F.lit("MOVED")
                )
            )
            dim.delete(F.col("p_partkey") % 17 == 0)

        _overlap(churn_fact, churn_dim)
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        res = view.read().select(
            "brand", "n_items", "total_cents"
        ).orderBy("brand")
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "scd2_cdc_history_profile",
    oracle="""
    WITH hist AS (
      -- interval 1: every order's ORIGINAL row, born at the create (v0),
      -- closed at v1 by the status update (k%10=0) else at v2 by the
      -- delete (k%13=0), else still current
      SELECT o_orderkey AS k, o_orderstatus AS status, o_custkey,
             0 AS start_v,
             CASE WHEN o_orderkey % 10 = 0 THEN 1
                  WHEN o_orderkey % 13 = 0 THEN 2 END AS end_v
      FROM orders
      UNION ALL
      -- interval 2: the updated row (status 'U'), born at v1, closed at
      -- v2 if the key was also deleted
      SELECT o_orderkey AS k, 'U' AS status, o_custkey,
             1 AS start_v,
             CASE WHEN o_orderkey % 13 = 0 THEN 2 END AS end_v
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT status,
           CAST(start_v AS BIGINT) AS start_v,
           CAST(COALESCE(end_v, -1) AS BIGINT) AS end_v,
           COUNT(*) AS n,
           CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
    FROM hist
    GROUP BY status, start_v, end_v
    ORDER BY status, start_v, end_v
    """,
    doc="CDC-driven SCD2 (streaming/txfeed.scd2_apply_changes — the "
    "APPLY CHANGES / expire-and-insert shape of the reference's "
    "load_3nf_ce_products_scd_table_type2.sql:59-248, re-expressed as "
    "a change-feed consumer): orders loaded into a TxTable, churned "
    "with a deterministic script (v1 MERGE flips k%10=0 to status 'U', "
    "v2 deletes k%13=0 via deletion vector), then the history table is "
    "built FROM THE FEED and profiled by validity interval. The oracle "
    "recomputes every interval's (start_v, end_v) assignment in plain "
    "SQL, so what's cross-checked is the event interleave (an update's "
    "preimage closes before its postimage opens), existing-current "
    "closure, and the fenced rewrite — in base-commit coordinates with "
    "SQL-NULL open ends (-1 in the profile). Scale shape: O(churn + "
    "touched history files) per batch, never O(history).",
    tags=("tx", "scd", "cdc"),
    eager=True,
    bench=True,
)
def scd2_cdc_history_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.streaming.txfeed import (
        scd2_apply_changes,
    )

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        "o_custkey",
    )
    tmp = tempfile.mkdtemp(prefix="scd2cdc_")
    try:
        t = TxTable.create(spark, tmp + "/src", o, key="k")
        t.merge(
            o.filter(F.col("k") % 10 == 0).withColumn("status", F.lit("U"))
        )
        t.delete(F.col("k") % 13 == 0, mode="dv")
        scd2_apply_changes(spark, tmp + "/src", tmp + "/hist", "q")
        h = TxTable(spark, tmp + "/hist").read()
        res = (
            h.groupBy(
                "status",
                F.col("_scd_start_v").alias("start_v"),
                F.coalesce(F.col("_scd_end_v"), F.lit(-1)).alias("end_v"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_custkey").cast("bigint").alias("cust_sum"),
            )
            .orderBy("status", "start_v", "end_v")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "join_view_geo_rollup",
    oracle="""
    WITH fact AS (
      SELECT o_orderkey AS ok, o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt
      FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey,
             CAST(2 * ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    live AS (SELECT * FROM fact WHERE ok % 7 <> 0),
    dim AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg,
             CAST(c_nationkey AS BIGINT) AS nk
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT seg, nk,
           COUNT(amt) AS n_orders,
           CAST(SUM(amt) AS BIGINT) AS total_cents,
           CAST(MAX(amt) AS BIGINT) AS max_cents,
           CAST(COUNT(DISTINCT ck) AS BIGINT) AS uniq_buyers
    FROM live JOIN dim ON ck = c_custkey
    GROUP BY seg, nk
    ORDER BY seg, nk
    """,
    doc="COMPOSITE-KEY incremental join-aggregate view (r11, "
    "sources/txjoinview.TxJoinAggView with group_expr/group_col "
    "lists): revenue by the (segment, nation) PAIR from one dim — the "
    "reference's flagship geo rollup shape (dw_etl_tests.py:494-506 "
    "groups by country AND state), previously answerable but not "
    "MAINTAINABLE. The view is physically keyed by __gk, a "
    "prefix-ordered null-distinct encoding of the tuple, so rewrites "
    "range-prune by the first key part; all merge/repair joins match "
    "the real columns null-safely. The churn window exercises term A "
    "(fact append), term B re-bucketing along ONE key part (segment "
    "moves, nation stays), a dim delete killing groups, and a fact dv "
    "delete that kills a group MAX (forcing the dirty-group repair "
    "over the composite key). uniq_buyers is the r11 EXACT distinct "
    "measure — transition-maintained over a per-(group, value) support "
    "TxTable, so the correction deletes fold as occurrence decrements "
    "with no base rescan (the bounded-delete-tax answer to the HLL "
    "sketch's any-delete repair). Oracle recomputes the final "
    "join-group state, including COUNT(DISTINCT), in SQL.",
    tags=("tx", "ivm", "join"),
    eager=True,
)
def join_view_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    tmp = tempfile.mkdtemp(prefix="jvgeo_")
    try:
        fact, dim = _overlap(
            lambda: TxTable.create(
                spark, tmp + "/fact", o, key="ok", stats_cols=["ck"]
            ),
            lambda: TxTable.create(spark, tmp + "/dim", c, key="c_custkey"),
        )
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim,
            fk="ck",
            group_expr=["c_mktsegment", "cast(c_nationkey as bigint)"],
            group_col=["seg", "nk"],
            measures={
                "total_cents": "amt",
                "n_orders": ("count", "amt"),
                "max_cents": ("max", "amt"),
                "uniq_buyers": ("distinct", "ck"),
            },
        )

        # two independent per-table churn chains, overlapped
        def churn_fact():
            fact.append(
                o.filter(F.col("ok") % 5 == 0).select(
                    (F.col("ok") + 100000000).alias("ok"),
                    "ck",
                    (F.col("amt") * 2).alias("amt"),
                )
            )
            fact.delete(F.col("ok") % 7 == 0, mode="dv")

        def churn_dim():
            dim.merge(
                c.filter(F.col("c_custkey") % 11 == 0).withColumn(
                    "c_mktsegment", F.lit("MOVED")
                )
            )
            dim.delete(F.col("c_custkey") % 13 == 0)

        _overlap(churn_fact, churn_dim)
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        res = view.read().select(
            "seg", "nk", "n_orders", "total_cents",
            F.col("max_cents").cast("long").alias("max_cents"),
            F.col("uniq_buyers").cast("long").alias("uniq_buyers"),
        ).orderBy("seg", "nk")
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "join_view_two_dim_rollup",
    oracle="""
    WITH fact AS (
      SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS oid,
             l_partkey AS pk, l_suppkey AS sk,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS amt
      FROM lineitem
      UNION ALL
      SELECT CAST(l_orderkey * 10 + l_linenumber + 100000000 AS BIGINT),
             l_partkey, l_suppkey,
             CAST(2 * ROUND(l_extendedprice * 100) AS BIGINT)
      FROM lineitem WHERE l_partkey % 7 = 0
    ),
    live AS (SELECT * FROM fact WHERE oid % 13 <> 0),
    d1 AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 10 = 0 THEN 'MOVED' ELSE p_brand END
               AS brand
      FROM part WHERE p_partkey % 17 <> 0
    ),
    d2 AS (
      SELECT s_suppkey,
             CAST(CASE WHEN s_suppkey % 6 = 0 THEN -1
                       ELSE s_nationkey END AS BIGINT) AS supp_nation
      FROM supplier WHERE s_suppkey % 9 <> 0
    )
    SELECT brand, supp_nation,
           COUNT(amt) AS n_items,
           CAST(SUM(amt) AS BIGINT) AS total_cents
    FROM live JOIN d1 ON pk = p_partkey JOIN d2 ON sk = s_suppkey
    GROUP BY brand, supp_nation
    ORDER BY brand, supp_nation
    """,
    doc="MULTI-DIM incremental join-aggregate view (r11, "
    "sources/txjoinview.TxJoinAggView with extra_dims): fact ⋈ part ⋈ "
    "supplier grouped by one column from EACH dim, maintained from all "
    "THREE change feeds via the trilinear delta decomposition "
    "ΔF⋈D1'⋈D2' + F0⋈ΔD1⋈D2' + F0⋈D10⋈ΔD2 (earlier relations at old "
    "versions, later at new — one-window churn on every base counts "
    "exactly once). The churn script hits all three terms plus "
    "overlap: fact append + dv delete, a brand move on d1, a nation "
    "move AND a delete on d2. Oracle recomputes the final state in "
    "plain SQL, cross-checking the multi-feed algebra, the composite "
    "(brand, nation) key plumbing, and the fenced vector cursor "
    "(fact<<62|d1<<31|d2). Scale shape: refresh is O(fact churn + "
    "moved dim keys' fact rows + touched groups); no base is ever "
    "scanned (stats-pruned term probes per layout).",
    tags=("tx", "ivm", "join"),
    eager=True,
    bench=True,
)
def join_view_two_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxTable

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("oid"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("amt"),
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    tmp = tempfile.mkdtemp(prefix="jv2d_")
    try:
        # the three base tables are independent — create them
        # concurrently (r14; guide §2.6: independent jobs back-fill
        # each other's scheduling gaps). Per-table commit ORDER is the
        # semantic contract; cross-table order is not (the refresh
        # folds the whole multi-base window, invariant to interleave).
        fact, d1, d2 = _overlap(
            lambda: TxTable.create(
                spark, tmp + "/fact", li, key="oid",
                stats_cols=["pk", "sk"],
            ),
            lambda: TxTable.create(spark, tmp + "/d1", p, key="p_partkey"),
            lambda: TxTable.create(spark, tmp + "/d2", s, key="s_suppkey"),
        )
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, d1,
            fk="pk",
            group_expr=["brand", "cast(s_nationkey as bigint)"],
            group_col=["brand", "supp_nation"],
            measures={
                "total_cents": "amt",
                "n_items": ("count", "amt"),
            },
            extra_dims=[{"dim": d2, "fk": "sk"}],
            group_dims=[0, 1],
        )

        # churn ALL THREE bases — three independent per-table commit
        # chains, overlapped — then one incremental refresh window
        def churn_fact():
            fact.append(
                li.filter(F.col("pk") % 7 == 0).select(
                    (F.col("oid") + 100000000).alias("oid"),
                    "pk", "sk",
                    (F.col("amt") * 2).alias("amt"),
                )
            )
            fact.delete(F.col("oid") % 13 == 0, mode="dv")

        def churn_d1():
            d1.merge(
                p.filter(F.col("p_partkey") % 10 == 0).withColumn(
                    "brand", F.lit("MOVED")
                )
            )
            d1.delete(F.col("p_partkey") % 17 == 0)

        def churn_d2():
            d2.merge(
                s.filter(F.col("s_suppkey") % 6 == 0).withColumn(
                    "s_nationkey",
                    F.lit(-1).cast(dict(s.dtypes)["s_nationkey"]),
                )
            )
            d2.delete(F.col("s_suppkey") % 9 == 0)

        _overlap(churn_fact, churn_d1, churn_d2)
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        res = view.read().select(
            "brand", "supp_nation", "n_items", "total_cents"
        ).orderBy("brand", "supp_nation")
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "agg_view_distinct_rollup",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS ok, o_orderstatus AS status, o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt
      FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, o_orderstatus, o_custkey,
             CAST(2 * ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    live AS (SELECT * FROM base WHERE ok % 7 <> 0)
    SELECT status,
           COUNT(*) AS n_orders,
           CAST(SUM(amt) AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT ck) AS BIGINT) AS uniq_buyers
    FROM live
    GROUP BY status
    ORDER BY status
    """,
    doc="Single-table incremental aggregate view with the r11 EXACT "
    "DISTINCT measure (sources/txview.TxAggView): orders land in a "
    "TxTable, a view groups by status with sum/count/distinct-buyers, "
    "then an append + a dv correction delete fold in ONE incremental "
    "refresh. The distinct count maintains via the dual-level "
    "aggregation's per-(group, value) support table — the delete "
    "decrements occurrence counts (some buyers lose their LAST order "
    "in a status, some don't) with NO base rescan, unlike the HLL "
    "sketch whose any-delete repair rereads the dirty groups. Oracle "
    "recomputes the final GROUP BY, including COUNT(DISTINCT), in "
    "plain SQL. Scale shape: refresh is O(churn + touched groups + "
    "touched support values).",
    tags=("tx", "ivm"),
    eager=True,
)
def agg_view_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    tmp = tempfile.mkdtemp(prefix="aggdv_")
    try:
        base = TxTable.create(spark, tmp + "/t", o, key="ok")
        view = TxAggView.create(
            spark, tmp + "/view", base, group_col="status",
            measures={
                "total_cents": "amt",
                "n_orders": ("count", "amt"),
                "uniq_buyers": ("distinct", "ck"),
            },
        )
        base.append(
            o.filter(F.col("ok") % 5 == 0).select(
                (F.col("ok") + 100000000).alias("ok"),
                "status", "ck",
                (F.col("amt") * 2).alias("amt"),
            )
        )
        base.delete(F.col("ok") % 7 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        res = view.read().select(
            "status",
            F.col("n_rows").alias("n_orders"),
            "total_cents",
            F.col("uniq_buyers").cast("long").alias("uniq_buyers"),
        ).orderBy("status")
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_rollup_navigator",
    oracle="""
    WITH fact AS (
      SELECT o_orderkey AS ok, o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt
      FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey,
             CAST(2 * ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    live AS (SELECT * FROM fact WHERE ok % 7 <> 0),
    dim AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg,
             CAST(c_nationkey AS BIGINT) AS nk
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT seg,
           COUNT(amt) AS n_orders,
           CAST(SUM(amt) AS BIGINT) AS total_cents,
           CAST(MAX(amt) AS BIGINT) AS max_cents,
           CAST(COUNT(DISTINCT ck) AS BIGINT) AS uniq_buyers,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(amt) AS BIGINT) * 1000 // COUNT(amt) AS avg_millicents
    FROM live JOIN dim ON ck = c_custkey
    WHERE seg <> 'MOVED'
    GROUP BY seg
    ORDER BY seg
    """,
    doc="AGGREGATE NAVIGATION (r11, sources/txrouter.AggRouter): the "
    "maintained join view has grain (seg, nk), but the query asks for "
    "seg ALONE — the router answers it by re-aggregating the view's "
    "PHYSICAL state (sum-of-sums, count-of-counts, max-of-maxes, "
    "COUNT(*) from n_rows) and resolves the EXACT uniq_buyers through "
    "the distinct measure's per-(group, value) support table, since "
    "distinct counts do not re-aggregate. The filter is pushed onto "
    "the view's group column (re-aggregation commutes with group-column "
    "filters). avg_millicents is derived from the routed exact "
    "sum/count pair with integer division, proving AVG routes "
    "losslessly (the view stores the pair, never the quotient). The "
    "whole answer is O(view rows): the base fact is NEVER read — the "
    "100 TB dashboard path, vs the reference pointing BI at hand-"
    "picked marts (readme.md Data Analysis). Oracle recomputes from "
    "the base join in SQL. Churn before routing: fact append, segment "
    "moves, a dim delete, and a dv correction delete, folded by one "
    "incremental refresh. Bench note: a LIFECYCLE benchmark (scratch "
    "TxTables + view + churn + refresh + routed read), not a query "
    "latency — compare round-over-round only.",
    tags=("tx", "ivm", "router"),
    bench=True,
    eager=True,
)
def routed_rollup_navigator(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    tmp = tempfile.mkdtemp(prefix="router_")
    try:
        fact, dim = _overlap(
            lambda: TxTable.create(
                spark, tmp + "/fact", o, key="ok", stats_cols=["ck"]
            ),
            lambda: TxTable.create(spark, tmp + "/dim", c, key="c_custkey"),
        )
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim,
            fk="ck",
            group_expr=["seg0", "cast(nk as bigint)"],
            group_col=["seg", "nk"],
            measures={
                "total_cents": "amt",
                "n_orders": ("count", "amt"),
                "max_cents": ("max", "amt"),
                "uniq_buyers": ("distinct", "ck"),
            },
        )

        # two independent per-table churn chains, overlapped
        def churn_fact():
            fact.append(
                o.filter(F.col("ok") % 5 == 0).select(
                    (F.col("ok") + 100000000).alias("ok"),
                    "ck",
                    (F.col("amt") * 2).alias("amt"),
                )
            )
            fact.delete(F.col("ok") % 7 == 0, mode="dv")

        def churn_dim():
            dim.merge(
                c.filter(F.col("c_custkey") % 11 == 0).withColumn(
                    "seg0", F.lit("MOVED")
                )
            )
            dim.delete(F.col("c_custkey") % 13 == 0)

        _overlap(churn_fact, churn_dim)
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        routed, how = AggRouter(spark).register(view).route(
            ["seg"],
            {
                "total_cents": "amt",
                "n_orders": ("count", "amt"),
                "max_cents": ("max", "amt"),
                "uniq_buyers": ("distinct", "ck"),
                "n_live": ("count", "*"),
            },
            where="seg <> 'MOVED'",
            max_lag=0,
        )
        assert not how["exact_grain"] and how["kind"] == "join", how
        assert max(how["lag"].values()) == 0, how
        res = routed.select(
            "seg",
            "n_orders",
            "total_cents",
            F.col("max_cents").cast("long").alias("max_cents"),
            F.col("uniq_buyers").cast("long").alias("uniq_buyers"),
            "n_live",
            # exact integer derivation of the routed AVG from the pair
            F.expr("(total_cents * 1000) div n_orders")
            .alias("avg_millicents"),
        ).orderBy("seg")
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "bloom_point_lookup",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_custkey IN (7, 131)
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="BLOOM-FILTER FILE SKIPPING (r11, sources/txtable bloom "
    "sidecars): orders land in an 8-file TxTable keyed by o_orderkey "
    "with blooms on o_custkey — a column SCATTERED across every file, "
    "so min/max stats can never prune a point lookup on it (and it "
    "carries no range stats at all here). read_for_values probes the "
    "per-file bitmaps (built executor-side at write, one Spark job "
    "over the per-batch sidecar parquet at probe; bits never visit "
    "the driver) and reads only the files that may hold the probed "
    "customers; the query asserts the probe touched STRICTLY fewer "
    "files than the table holds, then filters exactly and aggregates. "
    "At 100 TB this is the needle-in-haystack path: O(matching files) "
    "opened instead of every live file. No false negatives by "
    "construction (build and probe share one position function); the "
    "oracle recomputes from the raw table.",
    tags=("tx", "bloom"),
    bench=True,
    eager=True,
)
def bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txtable import TxTable

    probe = [7, 131]
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).repartition(32)
    tmp = tempfile.mkdtemp(prefix="bloomq_")
    try:
        t = TxTable.create(
            spark, tmp + "/t", o, key="o_orderkey",
            bloom_cols=["o_custkey"],
        )
        n_files = len(t._manifest()["files"])
        touched = t.files_for_values("o_custkey", probe)
        assert 0 < len(touched) < n_files, (
            f"bloom should skip files: {len(touched)}/{n_files}"
        )
        res = (
            t.read_for_values("o_custkey", probe)
            .filter(F.col("o_custkey").isin(probe))
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("total_cents"),
            )
            .orderBy("o_custkey")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_variance_rollup",
    oracle="""
    WITH fact AS (
      SELECT o_orderkey AS ok, o_custkey AS ck,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt
      FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey,
             CAST(2 * ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    live AS (SELECT * FROM fact WHERE ok % 7 <> 0),
    dim AS (
      SELECT c_custkey, c_mktsegment AS seg
      FROM customer WHERE c_custkey % 13 <> 0
    ),
    agg AS (
      SELECT seg,
             COUNT(amt) AS n,
             SUM(amt) AS s,
             SUM(amt * amt) AS qq
      FROM live JOIN dim ON ck = c_custkey
      GROUP BY seg
    )
    SELECT seg,
           CAST(n AS BIGINT) AS n,
           CAST(s AS BIGINT) AS total_cents,
           CAST((n * qq - s * s) * 10000 // (n * (n - 1)) AS BIGINT)
             AS var_e4
    FROM agg
    WHERE n > 1
    ORDER BY seg
    """,
    doc="ROUTED POOLED VARIANCE (r11): the join view maintains "
    "additive second moments ((Σx, Σx², n), squares held EXACTLY in "
    "DECIMAL(38,0) — sources/txview._sq) at grain (seg, nation); the "
    "router pools them to seg alone and the query derives sample "
    "variance scaled to 1e-4 units ENTIRELY in integer arithmetic "
    "((n·Σx² − (Σx)²)·10⁴ div n(n−1)), so Spark and DuckDB agree "
    "bit-for-bit — no floating-point summation-order hazard. Unlike "
    "MIN/MAX or HLL sketches, variance deletes SUBTRACT exactly: the "
    "churn window's dv correction delete folds with no repair read "
    "(the same fold as SUM). The reference has no incremental "
    "statistics at all — its profile queries recompute from the base "
    "each run.",
    tags=("tx", "ivm", "router"),
    eager=True,
)
def routed_variance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    tmp = tempfile.mkdtemp(prefix="varroute_")
    try:
        fact = TxTable.create(spark, tmp + "/fact", o, key="ok")
        dim = TxTable.create(spark, tmp + "/dim", c, key="c_custkey")
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim,
            fk="ck",
            group_expr=["seg0", "cast(nk as bigint)"],
            group_col=["seg", "nk"],
            measures={
                "amt_var": ("var", "amt"),
                "qq": ("sumsq", "amt"),
                "total_cents": "amt",
                "n": ("count", "amt"),
            },
        )
        fact.append(
            o.filter(F.col("ok") % 5 == 0).select(
                (F.col("ok") + 100000000).alias("ok"),
                "ck",
                (F.col("amt") * 2).alias("amt"),
            )
        )
        dim.delete(F.col("c_custkey") % 13 == 0)
        fact.delete(F.col("ok") % 7 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        routed, how = AggRouter(spark).register(view).route(
            ["seg"],
            {
                "total_cents": "amt",
                "n": ("count", "amt"),
                "qq": ("sumsq", "amt"),
                "amt_var": ("var", "amt"),
            },
        )
        assert not how["exact_grain"], how
        res = (
            routed.filter(F.col("n") > 1)
            .select(
                "seg",
                "n",
                "total_cents",
                F.expr(
                    "(n * qq - cast(total_cents as decimal(38,0)) "
                    "* total_cents) * 10000 div (n * (n - 1))"
                ).cast("long").alias("var_e4"),
                # the routed double must agree with the exact integer
                # derivation to fp precision — checked in-plan below
                F.col("amt_var").alias("__v"),
            )
        )
        chk = res.select(
            F.max(
                F.abs(
                    F.col("__v")
                    - F.col("var_e4").cast("double") / 10000.0
                )
                / F.greatest(F.col("__v"), F.lit(1.0))
            ).alias("rel")
        ).first()
        assert chk["rel"] < 1e-9, chk
        return (
            res.drop("__v").orderBy("seg").localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_histogram_rollup",
    oracle="""
    WITH fact AS (
      SELECT o_orderkey AS ok, o_custkey AS ck,
             CAST(ROUND(o_totalprice) AS BIGINT) AS amt
      FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey,
             CAST(2 * ROUND(o_totalprice) AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    live AS (SELECT * FROM fact WHERE ok % 7 <> 0),
    dim AS (
      SELECT c_custkey, c_mktsegment AS seg,
             CAST(c_nationkey AS BIGINT) AS nk
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT seg,
           CAST(LEAST(25, GREATEST(0,
                FLOOR(amt * 24.0 / 600000) + 1)) AS INT) AS bin,
           COUNT(*) AS cnt
    FROM live JOIN dim ON ck = c_custkey
    GROUP BY seg, bin
    HAVING COUNT(*) <> 0
    ORDER BY seg, bin
    """,
    doc="MERGEABLE-HISTOGRAM measure routed to a coarser grain (r11): "
    "the join view at (seg, nation) maintains per-bin order-value "
    "counts ([underflow, 24 bins over [0, 600k), overflow]) as "
    "additive state — a dv correction delete SUBTRACTS from its cells "
    "(no repair read, the property KLL/t-digest sketches lack), and "
    "the router rolls the grid up to seg with an element-wise array "
    "sum. The query explodes the routed arrays to (seg, bin, cnt) "
    "rows for the SQL oracle, and asserts in-plan that the derived "
    "median (functions/histograms.hist_percentile, linear "
    "interpolation) lands within one bin width of the exact "
    "percentile. Reference analogue: its profile/report queries "
    "recompute distribution stats from scratch each run.",
    tags=("tx", "ivm", "router", "hist"),
    eager=True,
)
def routed_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.functions.histograms import (
        hist_percentile,
    )
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable

    LO, HI, BINS = 0, 600_000, 24
    H = {"fn": "hist", "expr": "amt", "lo": LO, "hi": HI, "bins": BINS}
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice")).cast("long").alias("amt"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    tmp = tempfile.mkdtemp(prefix="histroute_")
    try:
        fact = TxTable.create(spark, tmp + "/fact", o, key="ok")
        dim = TxTable.create(spark, tmp + "/dim", c, key="c_custkey")
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim,
            fk="ck",
            group_expr=["seg0", "cast(nk as bigint)"],
            group_col=["seg", "nk"],
            measures={"order_value_hist": H},
        )
        fact.append(
            o.filter(F.col("ok") % 5 == 0).select(
                (F.col("ok") + 100000000).alias("ok"),
                "ck",
                (F.col("amt") * 2).alias("amt"),
            )
        )
        dim.delete(F.col("c_custkey") % 13 == 0)
        fact.delete(F.col("ok") % 7 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        routed, how = AggRouter(spark).register(view).route(
            ["seg"], {"order_value_hist": H}
        )
        assert not how["exact_grain"], how
        # in-plan accuracy check: derived median within one bin width
        # of the exact percentile over the live joined rows
        exact = {
            row["seg"]: row["p50"]
            for row in fact.read()
            .join(dim.read(), F.col("ck") == F.col("c_custkey"))
            .groupBy(F.col("seg0").alias("seg"))
            .agg(F.expr("percentile(amt, 0.5)").alias("p50"))
            .collect()
        }
        width = (HI - LO) / BINS
        for row in routed.select(
            "seg",
            hist_percentile("order_value_hist", 0.5, LO, HI, BINS).alias(
                "p50"
            ),
        ).collect():
            true = min(max(exact[row["seg"]], LO), HI)
            assert abs(row["p50"] - true) <= width, (row, true)
        res = (
            routed.select(
                "seg",
                F.posexplode("order_value_hist").alias("bin", "cnt"),
            )
            .filter(F.col("cnt") != 0)
            .orderBy("seg", "bin")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "streamed_gold_maintenance",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS uniq_buyers
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    doc="STREAMING-MAINTAINED GOLD on the oracle surface (r11, "
    "streaming/txsink.txtable_ingest(maintain=...)): orders arrive as "
    "FOUR separate micro-batches (maxFilesPerTrigger=1 over a 4-file "
    "source) through the exactly-once foreachBatch sink; after each "
    "fenced append the SAME trigger incrementally refreshes a "
    "by-status aggregate view (sum + count + EXACT transition-"
    "maintained distinct buyers). The query asserts one table commit "
    "per micro-batch landed and the view cursor caught the table, "
    "then returns the VIEW state — the oracle recomputes from the raw "
    "orders in SQL, so the whole stream→fence→fold→support pipeline "
    "is value-hashed end-to-end. 100 TB shape: per-trigger cost is "
    "O(batch + touched groups), independent of table history.",
    tags=("tx", "streaming", "ivm"),
    eager=True,
)
def streamed_gold_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView
    from data_warehouse_project_spark.streaming.txsink import txtable_ingest

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="streamgold_")
    try:
        src = tmp + "/src"
        o.repartition(4).write.parquet(src)
        t = TxTable.create(spark, tmp + "/t", o.limit(0), key="ok")
        view = TxAggView.create(
            spark, tmp + "/view", t, group_col="status",
            measures={
                "total_cents": "cents",
                "n_orders": ("count", "ok"),
                "uniq_buyers": ("distinct", "ck"),
            },
        )
        stream = (
            spark.readStream.schema(o.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = txtable_ingest(
            stream, tmp + "/t", tmp + "/ck", maintain=[tmp + "/view"]
        )
        q.awaitTermination(300)
        assert t.latest_version() >= 4, t.history()  # one commit/batch
        assert view.applied_base_version() == t.latest_version()
        res = view.read().select(
            "status",
            F.col("n_rows").alias("n_orders"),
            "total_cents",
            F.col("uniq_buyers").cast("long").alias("uniq_buyers"),
        ).orderBy("status")
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "hist_two_level_shift",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS ok, o_orderstatus AS status,
             CAST(ROUND(o_totalprice) AS BIGINT) AS amt
      FROM orders
    ),
    live AS (
      SELECT status, amt FROM src WHERE ok % 7 <> 0
      UNION ALL
      SELECT status, amt * 16 AS amt FROM src
      WHERE ok % 5 = 0 AND (ok + 100000000) % 7 <> 0
    )
    SELECT status,
           CASE
             WHEN amt >= 5000 THEN 29 + (
               CASE WHEN amt - 5000 < 5000 THEN 1
                    WHEN amt - 5000 < 15000 THEN 2
                    WHEN amt - 5000 < 35000 THEN 3
                    WHEN amt - 5000 < 75000 THEN 4
                    WHEN amt - 5000 < 155000 THEN 5
                    WHEN amt - 5000 < 315000 THEN 6
                    WHEN amt - 5000 < 635000 THEN 7
                    WHEN amt - 5000 < 1275000 THEN 8
                    WHEN amt - 5000 < 2555000 THEN 9
                    ELSE 10 END)
             ELSE 10 + CAST(FLOOR(amt * 20 / 5000.0) AS INT)
           END AS bin,
           COUNT(*) AS cnt
    FROM live
    GROUP BY status, bin
    HAVING COUNT(*) <> 0
    ORDER BY status, bin
    """,
    doc="TWO-LEVEL (auto-ranging) HISTOGRAM measure (r12): the view's "
    "hist grid is [0, 5000) in 20 fine bins plus outer=10 GEOMETRIC "
    "bins per side (bin j spans 5000*2^(j-1)), so a distribution "
    "shift that lands 16x past the original grid — appended AFTER the "
    "view was created — still folds additively (correction deletes "
    "subtract per cell, no repair) and quantiles to the containing "
    "outer bin's width instead of clamping to the grid edge. The "
    "outer mapping is a when-ladder over integer-exact boundaries "
    "(never floor(log2): libm ulps would bin boundary values "
    "differently across engines), which is why the DuckDB oracle can "
    "reproduce every cell bit-for-bit. An in-plan assertion pins the "
    "derived p90 of the shifted data within its containing bin's "
    "width of the exact percentile. Closes r11 verdict item 7.",
    tags=("tx", "ivm", "hist"),
    eager=True,
)
def hist_two_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.functions.histograms import (
        _cell_edges,
        hist_percentile,
    )
    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    LO, HI, BINS, K = 0, 5000, 20, 10
    H = {"fn": "hist", "expr": "amt", "lo": LO, "hi": HI, "bins": BINS,
         "outer": K}
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice")).cast("long").alias("amt"),
    )
    tmp = tempfile.mkdtemp(prefix="hist2l_")
    try:
        base = TxTable.create(spark, tmp + "/t", o, key="ok")
        view = TxAggView.create(
            spark, tmp + "/v", base, group_col="status", measures={"h": H}
        )
        # the shift: every 5th order re-lands at 16x the value —
        # far beyond the original [0, 5000) grid
        base.append(
            o.filter(F.col("ok") % 5 == 0).select(
                (F.col("ok") + 100_000_000).alias("ok"),
                "status",
                (F.col("amt") * 16).alias("amt"),
            )
        )
        base.delete(F.col("ok") % 7 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        # in-plan accuracy: p90 of the SHIFTED distribution within the
        # containing outer bin's width (legacy clamp would pin to 5000)
        exact = {
            row["status"]: row["p"]
            for row in base.read()
            .groupBy("status")
            .agg(F.expr("percentile(amt, 0.9)").alias("p"))
            .collect()
        }
        ncells = BINS + 2 * K
        edges = [_cell_edges(i, LO, HI, BINS, K) for i in range(ncells)]
        for row in view.read().select(
            "status",
            hist_percentile("h", 0.9, LO, HI, BINS, outer=K).alias("p"),
        ).collect():
            true = exact[row["status"]]
            cell = next(
                (i for i, (left, w) in enumerate(edges)
                 if left <= true < left + w),
                ncells - 1,
            )
            assert abs(row["p"] - true) <= edges[cell][1], (row, true)
        res = (
            view.read()
            .select("status", F.posexplode("h").alias("bin", "cnt"))
            .filter(F.col("cnt") != 0)
            .orderBy("status", "bin")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_having_rollup",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS seg FROM customer
    ),
    agg AS (
      SELECT seg,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents,
             COUNT(o_orderkey) AS n_orders,
             MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS min_cents
      FROM orders JOIN dim ON o_custkey = c_custkey
      GROUP BY seg
    )
    SELECT seg, rev_cents, n_orders, min_cents
    FROM agg
    WHERE rev_cents > 1000000000 AND n_orders >= 100
    ORDER BY seg
    """,
    doc="ROUTED HAVING (r12, r11 verdict item 4): a GROUP BY seg query "
    "with a HAVING over AGGREGATED measures (revenue + order count) "
    "routes through the aggregate navigator to the FINER (seg, nation) "
    "join view — min_cents forces the finer candidate — and the HAVING "
    "applies AFTER re-aggregation, which always commutes: the routed "
    "answer equals a direct GROUP BY ... HAVING over the bases. The "
    "plan touches only view rows (no base scan); the decision dict is "
    "asserted in-plan (non-exact grain, the fine view).",
    tags=("tx", "ivm", "router"),
    eager=True,
)
def routed_having_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    tmp = tempfile.mkdtemp(prefix="havroute_")
    try:
        fact = TxTable.create(spark, tmp + "/fact", o, key="ok")
        dim = TxTable.create(spark, tmp + "/dim", c, key="c_custkey")
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim, fk="ck",
            group_expr=["seg0", "cast(nk as bigint)"],
            group_col=["seg", "nk"],
            measures={
                "rev_cents": "cents",
                "n_orders": ("count", "cents"),
                "min_cents": ("min", "cents"),
            },
        )
        routed, how = AggRouter(spark).register(view).route(
            ["seg"],
            {
                "rev_cents": "cents",
                "n_orders": ("count", "cents"),
                "min_cents": ("min", "cents"),
            },
            having="rev_cents > 1000000000 and n_orders >= 100",
        )
        assert not how["exact_grain"], how
        assert how["view"].endswith("view"), how
        return routed.orderBy("seg").localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "topk_heavy_hitters",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS ok, o_orderstatus AS status,
             o_custkey AS ck
      FROM orders
    ),
    live AS (
      SELECT status, ck FROM src WHERE ok % 11 <> 0
      UNION ALL
      SELECT status, ck FROM src
      WHERE ok % 3 = 0 AND (ok + 200000000) % 11 <> 0
    ),
    cnt AS (
      SELECT status, ck, COUNT(*) AS cnt
      FROM live GROUP BY status, ck
    ),
    ranked AS (
      SELECT status, ck, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY status ORDER BY cnt DESC, ck
             ) AS rn
      FROM cnt
    )
    SELECT status, CAST(rn AS INT) AS rank, ck AS buyer,
           CAST(cnt AS BIGINT) AS n_orders
    FROM ranked WHERE rn <= 5
    ORDER BY status, rank
    """,
    doc="EXACT TOP-K (heavy hitters) view measure (r12): per-status "
    "top-5 buyers by order count, maintained INCREMENTALLY — the "
    "measure lives entirely in the per-(group, value) occurrence "
    "support the exact-distinct machinery keeps (additive folds, "
    "deletes subtract, no sketch error, no repair read), and read() "
    "ranks it on demand with deterministic ties (count desc, value "
    "asc). The query churns the base AFTER view create (a 1/3 "
    "re-append + a 1/11 dv correction delete), refreshes, and "
    "explodes the ranked arrays to rows for the SQL oracle. Unlike "
    "SpaceSaving/Misra-Gries sketches this is exact under deletes — "
    "the property that matters for correction-heavy warehouses. "
    "Reference analogue: its reports re-derive top-group rollups "
    "wholesale each run (dw_etl_tests.py:480-506).",
    tags=("tx", "ivm", "topk"),
    eager=True,
)
def topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("ck"),
    )
    tmp = tempfile.mkdtemp(prefix="topk_")
    try:
        base = TxTable.create(spark, tmp + "/t", o, key="ok")
        view = TxAggView.create(
            spark, tmp + "/v", base, group_col="status",
            measures={"top_buyers": {"fn": "topk", "expr": "ck", "k": 5}},
        )
        base.append(
            o.filter(F.col("ok") % 3 == 0).select(
                (F.col("ok") + 200_000_000).alias("ok"), "status", "ck"
            )
        )
        base.delete(F.col("ok") % 11 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        res = (
            view.read()
            .select("status", F.explode("top_buyers").alias("t"))
            .select(
                "status",
                F.col("t.rank").cast("int").alias("rank"),
                F.col("t.value").alias("buyer"),
                F.col("t.cnt").cast("long").alias("n_orders"),
            )
            .orderBy("status", "rank")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_topk_rollup",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS seg FROM customer
    ),
    cnt AS (
      SELECT seg, o_custkey AS ck, COUNT(*) AS cnt
      FROM orders JOIN dim ON o_custkey = c_custkey
      GROUP BY seg, ck
    ),
    ranked AS (
      SELECT seg, ck, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY seg ORDER BY cnt DESC, ck
             ) AS rn
      FROM cnt
    )
    SELECT seg, CAST(rn AS INT) AS rank, ck AS buyer,
           CAST(cnt AS BIGINT) AS n_orders
    FROM ranked WHERE rn <= 3
    ORDER BY seg, rank
    """,
    doc="ROUTED TOP-K (r12): a GROUP BY seg top-3-buyers query answered "
    "by the aggregate navigator from a FINER (seg, nation) join view — "
    "the view's per-(group, value) occurrence support holds FULL "
    "counts, so the router SUMS them to the coarse grain and re-ranks, "
    "exact for ANY requested k (here 3, while the view declared k=5). "
    "The support snapshot is pinned to the view version mid-route "
    "(support_at), so a concurrent refresh can never mix cursors. "
    "Explodes the ranked arrays to rows for the DuckDB ROW_NUMBER "
    "oracle.",
    tags=("tx", "ivm", "router", "topk"),
    eager=True,
)
def routed_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    tmp = tempfile.mkdtemp(prefix="topkroute_")
    try:
        fact = TxTable.create(spark, tmp + "/fact", o, key="ok")
        dim = TxTable.create(spark, tmp + "/dim", c, key="c_custkey")
        view = TxJoinAggView.create(
            spark, tmp + "/view", fact, dim, fk="ck",
            group_expr=["seg0", "cast(nk as bigint)"],
            group_col=["seg", "nk"],
            measures={"top5": {"fn": "topk", "expr": "ck", "k": 5}},
        )
        routed, how = AggRouter(spark).register(view).route(
            ["seg"], {"top3": {"fn": "topk", "expr": "ck", "k": 3}}
        )
        assert not how["exact_grain"], how
        res = (
            routed.select("seg", F.explode("top3").alias("t"))
            .select(
                "seg",
                F.col("t.rank").cast("int").alias("rank"),
                F.col("t.value").alias("buyer"),
                F.col("t.cnt").cast("long").alias("n_orders"),
            )
            .orderBy("seg", "rank")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "topk_approx_heavy_hitters",
    oracle="""
    WITH live AS (
      SELECT o_orderstatus AS status,
             CASE WHEN o_custkey % 4 < 2
                  THEN 'H' || CAST(o_custkey % 2 AS VARCHAR)
                  ELSE 'T' || CAST(o_custkey % 5000 AS VARCHAR) END AS v
      FROM orders WHERE o_orderkey % 977 <> 0
    ),
    counts AS (
      SELECT status, v, COUNT(*) AS c FROM live GROUP BY status, v
    ),
    tot AS (SELECT status, COUNT(*) AS n FROM live GROUP BY status)
    SELECT c.status AS status, c.v AS value
    FROM counts c JOIN tot t ON c.status = t.status
    WHERE c.c * 10 > t.n
    ORDER BY c.status, c.v
    """,
    doc="BOUNDED-STATE heavy hitters (r13): the `topk_approx` measure "
    "carries Misra-Gries registers as ONE map<string,bigint> column "
    "per group plus an exact error counter — m registers total, no "
    "per-(group, value) support table, so the state stays dashboard-"
    "scale even over a 10^8-cardinality value domain where the exact "
    "topk's occurrence support is fact-scale (the r12 verdict's TOP-K "
    "caveat). The fold is pure Column expressions: map_zip_with merges "
    "the window's exact per-value deltas into the registers, then one "
    "compress step (subtract the (m+1)-th largest, drop non-positive, "
    "accumulate into err) — MG invariant true-err <= est <= true, "
    "err <= inserted/(m+1), mergeable across groups (Agarwal et al. "
    "2012). Deletes clamp at 0 (documented drift; exact topk remains "
    "the churn-exact choice). The oracle-matched output is the "
    "DETECTED heavy set at a 10%-of-group threshold: planted heavies "
    "carry ~25% of each group's rows and the tail ~0.01% each, so "
    "with m=64 (err <= 1.6%) detection from the undercounting "
    "estimates equals detection from true counts — which DuckDB "
    "computes exactly. In-plan asserts pin the register count bound, "
    "est <= true, and the drift-adjusted lower bound.",
    tags=("tx", "ivm", "topk", "approx"),
    eager=True,
)
def topk_approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    M = 64
    v_expr = (
        "CASE WHEN o_custkey % 4 < 2 "
        "THEN concat('H', CAST(o_custkey % 2 AS STRING)) "
        "ELSE concat('T', CAST(o_custkey % 5000 AS STRING)) END"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.expr(v_expr).alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="mgtopk_")
    try:
        # lifecycle: half the rows at create, half folded, then a
        # correction delete — the driver checks the FOLDED state
        base = TxTable.create(
            spark, tmp + "/t", o.filter(F.col("ok") % 2 == 0), key="ok"
        )
        view = TxAggView.create(
            spark, tmp + "/v", base, group_col="status",
            measures={
                "top": {"fn": "topk_approx", "expr": "v", "k": 10,
                        "m": M},
                "n": ("count", "ok"),
            },
        )
        base.append(o.filter(F.col("ok") % 2 == 1))
        base.delete(F.col("ok") % 977 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r

        # in-plan accuracy (gated: bench.py turns these exact
        # cross-checks off so the timed number measures the fold, not
        # the assertion harness — parity/driver runs keep them on):
        # every register obeys est <= true and est >= true - err -
        # deleted(v); state bounded by m registers per group
        if _inplan_asserts():
            exact = {
                (row["status"], row["v"]): row["c"]
                for row in base.read().groupBy("status", "v").agg(
                    F.count("*").alias("c")
                ).collect()
            }
            dels = {
                (row["status"], row["v"]): row["c"]
                for row in o.filter(F.col("ok") % 977 == 0)
                .groupBy("status", "v").agg(F.count("*").alias("c"))
                .collect()
            }
            for row in view.table.read().select(
                "status", "__a_top", "__ae_top"
            ).collect():
                regs, err = row["__a_top"], row["__ae_top"]
                assert len(regs) <= M, (row["status"], len(regs))
                for v, est in regs.items():
                    t = exact.get((row["status"], v), 0)
                    assert est <= t, (row["status"], v, est, t)
                    assert est >= t - err - dels.get(
                        (row["status"], v), 0
                    ), (row["status"], v, est, t, err)

        # the oracle-matched DETECTED set: registers whose estimate
        # clears 10% of the group's live rows (est undercounts by
        # <= err ~1.6%, heavies carry ~25%, tail ~0.01% — separation
        # makes approx detection == exact detection)
        res = (
            view.read()
            .select("status", F.col("n"), F.explode("top").alias("t"))
            .filter(F.col("t.cnt") * 10 > F.col("n"))
            .select("status", F.col("t.value").alias("value"))
            .orderBy("status", "value")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_topk_approx_global",
    oracle="""
    WITH src AS (
      SELECT o_orderstatus AS status,
             CASE WHEN o_custkey % 4 < 2
                  THEN 'H' || CAST(o_custkey % 2 AS VARCHAR)
                  ELSE 'T' || CAST(o_custkey % 5000 AS VARCHAR) END AS v
      FROM orders
    ),
    counts AS (SELECT v, COUNT(*) AS c FROM src GROUP BY v),
    tot AS (SELECT COUNT(*) AS n FROM src)
    SELECT c.v AS value, CAST(c.c AS BIGINT) AS exact_cnt
    FROM counts c, tot t
    WHERE c.c * 10 > t.n
    ORDER BY value
    """,
    doc="GLOBAL heavy-hitter rollup through the aggregate navigator "
    "(r13): route([]) — GROUP BY nothing — merges every group cell's "
    "Misra-Gries register map key-wise (the Agarwal et al. 2012 "
    "summary merge as one aggregate expression), adds the cells' err "
    "counters plus the one merge-compress subtraction, and ranks the "
    "merged registers. The router charges the measure zero support "
    "rows (the registers ARE the state — cost model r12 item 6) and "
    "refuses support-backed exact topk/distinct at the global grain "
    "(they would rank the whole support in one partition). Output = "
    "the detected global heavy set at a 10% threshold with EXACT "
    "counts recomputed per detected value (bounded: <= k values), so "
    "the oracle matches bit-for-bit while detection itself came from "
    "the approximate merged registers — asserted in-plan against the "
    "exact global counts.",
    tags=("tx", "ivm", "router", "topk", "approx"),
    eager=True,
)
def routed_topk_approx_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.expr(
            "CASE WHEN o_custkey % 4 < 2 "
            "THEN concat('H', CAST(o_custkey % 2 AS STRING)) "
            "ELSE concat('T', CAST(o_custkey % 5000 AS STRING)) END"
        ).alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="mgroute_")
    try:
        base = TxTable.create(spark, tmp + "/t", o, key="ok")
        view = TxAggView.create(
            spark, tmp + "/v", base, group_col="status",
            measures={
                "top": {"fn": "topk_approx", "expr": "v", "k": 8,
                        "m": 64},
                "n": ("count", "ok"),
            },
        )
        router = AggRouter(spark).register(view)
        routed, how = router.route(
            [], {"top": {"fn": "topk_approx", "expr": "v", "k": 8},
                 "n": ("count", "ok")}
        )
        assert how["support_rows"] == 0 and not how["exact_grain"], how
        row = routed.collect()[0]
        if _inplan_asserts():  # merged-register MG invariant (gated)
            g_exact = {
                r["v"]: r["c"]
                for r in base.read().groupBy("v").agg(
                    F.count("*").alias("c")
                ).collect()
            }
            for e in row["top"]:
                t = g_exact[e["value"]]
                assert t - row["top_err"] <= e["cnt"] <= t, (e, t, row)
        detected = [
            e["value"] for e in row["top"] if e["cnt"] * 10 > row["n"]
        ]
        # exact counts for the detected values only (<= k of them):
        # deterministic output DuckDB reproduces, detection approximate
        res = (
            base.read()
            .filter(F.col("v").isin(detected))
            .groupBy(F.col("v").alias("value"))
            .agg(F.count("*").cast("long").alias("exact_cnt"))
            .orderBy("value")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "routed_topk_global_exact",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS ok,
             'C' || CAST(o_custkey % 500 AS VARCHAR) AS v
      FROM orders
    ),
    live AS (
      SELECT v FROM src WHERE ok % 11 <> 0
      UNION ALL
      SELECT v FROM src
      WHERE ok % 3 = 0 AND (ok + 200000000) % 11 <> 0
    ),
    cnt AS (SELECT v, COUNT(*) AS c FROM live GROUP BY v),
    ranked AS (
      SELECT v, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, v ASC) AS rn
      FROM cnt
    )
    SELECT CAST(rn AS INT) AS rank, v AS value,
           CAST(c AS BIGINT) AS cnt
    FROM ranked WHERE rn <= 10
    ORDER BY rank
    """,
    doc="EXACT GLOBAL TOP-K through the aggregate navigator (r14; "
    "refused through r13): route([]) — GROUP BY nothing — over an "
    "exact topk view measure re-ranks the per-(group, value) "
    "occurrence support in two distributed phases: SUM the support to "
    "per-value global counts (hash shuffle on value), then "
    "orderBy+limit(k), which Spark plans as TakeOrderedAndProject — "
    "each partition keeps only its own top k and the driver merges "
    "<= k x partitions rows — never a single-partition rank over the "
    "whole support (the reason the r13 router refused this grain). "
    "The <= k survivors pack into the ordered display array with "
    "deterministic ties (count desc, value asc), exploded back to "
    "rows for the ROW_NUMBER oracle. Lifecycle: the base churns "
    "(1/3 re-append + a 1/11 correction delete) and the support folds "
    "incrementally before routing. Reference analogue: the geo top-10 "
    "rollup at its coarsest grain (dw_etl_tests.py:494-506).",
    tags=("tx", "ivm", "router", "topk"),
    eager=True,
)
def routed_topk_global_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.concat(
            F.lit("C"), (F.col("o_custkey") % 500).cast("string")
        ).alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="gtopk_")
    try:
        base = TxTable.create(spark, tmp + "/t", o, key="ok")
        view = TxAggView.create(
            spark, tmp + "/v", base, group_col="status",
            measures={"top": {"fn": "topk", "expr": "v", "k": 10}},
        )
        base.append(
            o.filter(F.col("ok") % 3 == 0).select(
                (F.col("ok") + 200_000_000).alias("ok"), "status", "v"
            )
        )
        base.delete(F.col("ok") % 11 == 0, mode="dv")
        r = view.refresh(mode="incremental")
        assert r["mode"] == "incremental" and not r["skipped"], r
        routed, how = AggRouter(spark).register(view).route(
            [], {"top": {"fn": "topk", "expr": "v", "k": 10}}
        )
        assert how["support_rows"] > 0, how  # support reads charged
        res = (
            routed.select(F.explode("top").alias("t"))
            .select(
                F.col("t.rank").cast("int").alias("rank"),
                F.col("t.value").alias("value"),
                F.col("t.cnt").cast("long").alias("cnt"),
            )
            .orderBy("rank")
        )
        return res.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "join_view_topk_approx_heavy_buyers",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS ok, o_custkey AS ck,
             CASE WHEN o_custkey % 4 < 2
                  THEN 'H' || CAST(o_custkey % 2 AS VARCHAR)
                  ELSE 'T' || CAST(o_custkey % 5000 AS VARCHAR) END AS v
      FROM orders
    ),
    live AS (
      SELECT ck, v FROM src WHERE ok % 11 <> 0
      UNION ALL
      SELECT ck, v FROM src
      WHERE ok % 3 = 0 AND (ok + 200000000) % 11 <> 0
    ),
    dim AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 997 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg
      FROM customer
    ),
    joined AS (
      SELECT d.seg, l.v
      FROM live l JOIN dim d ON l.ck = d.c_custkey
    ),
    cnt AS (SELECT seg, v, COUNT(*) AS c FROM joined GROUP BY seg, v),
    tot AS (SELECT seg, COUNT(*) AS n FROM joined GROUP BY seg)
    SELECT cnt.seg AS seg, cnt.v AS value,
           CAST(cnt.c AS BIGINT) AS exact_cnt
    FROM cnt JOIN tot ON cnt.seg = tot.seg
    WHERE cnt.c * 10 > tot.n
    ORDER BY cnt.seg, value
    """,
    doc="Bounded-state heavy hitters on a JOIN view (r14; refused "
    "through r13): topk_approx composes with the trilinear delta "
    "decomposition because the MG fold is measure-local — fact churn "
    "AND dim-churn re-bucketing both land as per-(group, value) net "
    "signed deltas, pre-compressed to <= m registers before the merge "
    "(txview._mg_window_delta). Lifecycle: create over orders ⋈ "
    "customer grouped by market segment, then a 1/3 re-append, a 1/11 "
    "correction delete, AND a dim move (every c_custkey % 997 == 0 "
    "customer re-segmented to 'MOVED' — its order rows re-bucket as "
    "paired −old/+new deltas whose negative side clamps the old "
    "segment's registers, accounted in the __ad drift column). Output "
    "= the per-segment DETECTED heavy set at a 10% threshold with "
    "EXACT counts recomputed per detected value (engineered heavies "
    "carry ~25% of each segment vs err+drift <= ~11%, so approximate "
    "detection == exact detection), exploded for the SQL oracle; the "
    "MG invariant est <= true and the widened delete bound are "
    "asserted in-plan (gated for bench).",
    tags=("tx", "ivm", "join", "topk", "approx"),
    eager=True,
)
def join_view_topk_approx_heavy_buyers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.expr(
            "CASE WHEN o_custkey % 4 < 2 "
            "THEN concat('H', CAST(o_custkey % 2 AS STRING)) "
            "ELSE concat('T', CAST(o_custkey % 5000 AS STRING)) END"
        ).alias("v"),
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
    )
    tmp = tempfile.mkdtemp(prefix="jvmg_")
    try:
        fact = TxTable.create(spark, tmp + "/f", o, key="ok")
        dim = TxTable.create(spark, tmp + "/d", c, key="ck")
        view = TxJoinAggView.create(
            spark, tmp + "/jv", fact, dim, fk="ck",
            group_expr="seg", group_col="seg",
            measures={
                "top": {"fn": "topk_approx", "expr": "v", "k": 8,
                        "m": 64},
                "n": ("count", "ok"),
            },
        )
        # fact churn + correction delete + a dim re-segmentation: all
        # three delta terms of the decomposition fold incrementally
        fact.append(
            o.filter(F.col("ok") % 3 == 0).select(
                (F.col("ok") + 200_000_000).alias("ok"), "ck", "v"
            )
        )
        fact.delete(F.col("ok") % 11 == 0, mode="dv")
        dim.merge(
            c.filter(F.col("ck") % 997 == 0)
            .select("ck", F.lit("MOVED").alias("seg"))
        )
        r = view.refresh(mode="incremental")
        assert not r["skipped"], r
        if _inplan_asserts():  # MG invariant + delete bound (gated)
            exact = {
                (row["seg"], row["v"]): row["c"]
                for row in fact.read()
                .join(dim.read(), "ck")
                .groupBy("seg", "v")
                .agg(F.count("*").alias("c"))
                .collect()
            }
            for row in view.table.read().select(
                "seg", "__a_top", "__ae_top", "__ad_top"
            ).collect():
                assert len(row["__a_top"]) <= 64
                for v, est in row["__a_top"].items():
                    t = exact.get((row["seg"], v), 0)
                    assert est <= t, (row["seg"], v, est, t)
                    assert t <= est + row["__ae_top"] + row["__ad_top"], (
                        row["seg"], v, est, t,
                    )
        res = (
            view.read()
            .select("seg", F.col("n"), F.explode("top").alias("t"))
            .filter(F.col("t.cnt") * 10 > F.col("n"))
            .select("seg", F.col("t.value").alias("value"))
        )
        # exact counts for the detected (seg, value) pairs only
        # (bounded: <= k per segment) — deterministic output DuckDB
        # reproduces while detection itself came from the registers
        joined = (
            fact.read()
            .join(dim.read(), "ck")
            .groupBy("seg", "v")
            .agg(F.count("*").cast("long").alias("exact_cnt"))
        )
        out = (
            joined.alias("j")
            .join(
                res.alias("d"),
                (F.col("j.seg") == F.col("d.seg"))
                & (F.col("j.v") == F.col("d.value")),
                "left_semi",
            )
            .select(
                F.col("seg"), F.col("v").alias("value"), "exact_cnt"
            )
            .orderBy("seg", "value")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
