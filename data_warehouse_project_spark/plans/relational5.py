"""TPC-H-shaped analytics, third tranche: the last canonical
decision-support shapes not yet in the registry — Q2 (correlated
min-cost supplier), Q4 (EXISTS order-priority audit), Q8 (market
share), Q9 (product-type profit), Q11 (group HAVING vs a global
scalar), Q12 (two-bucket conditional classification), Q13
(distribution histogram via left join), Q15 (argmax against a derived
aggregate), Q20 (nested semi-join threshold), Q21 (double-correlated
EXISTS / NOT EXISTS blame assignment) — adapted to the driver's column
subset (no partsupp / shipmode / commitdate: supply cost becomes the
observed min line price, ship-delay predicates replace commit-date
ones, and part-name/priority filters replace the missing columns).

Determinism discipline (plans/queries.py module docstring): every sum
is integer-unit, every threshold comparison happens on exact BIGINTs
(cross-multiplied fractions, never a divided double), every ranking
has a total tie-break, and aliases match the oracle exactly.

Reference parity anchor: the reference's warehouse exposes its gold
layer to plain SQL consumers (dw_etl_tests.py:470-506); these are the
standard shapes such consumers run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.scalars import cents
from data_warehouse_project_spark.plans.queries import register


@register(
    "late_shipment_priorities",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    doc="TPC-H Q4 shape: order-priority audit — how many orders per "
    "priority had at least one line shipped more than 60 days after "
    "the order date (the commit-date lateness predicate adapted to "
    "the available columns). The EXISTS is a left-semi hash join on "
    "orderkey with the date comparison as a residual condition, so "
    "each order is counted once no matter how many late lines it "
    "has. The one-year window sits on the orders scan (parquet "
    "pushdown); the semi-join shuffles both sides on orderkey once "
    "and the 5-row priority aggregate is map-side partial.",
    tags=("join", "semi", "agg"),
)
def late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


@register(
    "returnflag_priority_classes",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY returnflag
    """,
    doc="TPC-H Q12 shape: two-bucket conditional classification — lines "
    "shipped in 1997 grouped by returnflag (standing in for the absent "
    "shipmode), split into urgent/high vs other order priorities with "
    "CASE-sum counters. One orderkey shuffle joins fact to orders; the "
    "3-group aggregate is fully map-side partial; the year filter "
    "prunes the lineitem scan before the join.",
    tags=("join", "agg", "conditional"),
)
def returnflag_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("returnflag")
    )


@register(
    "customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey,
             COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: customer order-count distribution histogram, "
    "including zero-order customers (LEFT JOIN with the exclusion "
    "filter — here priority '5-LOW', standing in for the comment "
    "pattern — inside the join condition so filtered-out customers "
    "still appear with count 0). Two aggregations: the first on "
    "custkey rides the join's own hash partitioning (no extra "
    "shuffle), the second over the tiny histogram domain is map-side "
    "partial. COUNT(col) counts only matched rows — the null-skipping "
    "semantics are identical in both engines.",
    tags=("join", "agg", "histogram"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "significant_nation_value",
    oracle="""
    WITH nv AS (
      SELECT n.n_name AS nation,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT nation,
           CAST(value_cents / 100.0 AS DOUBLE) AS net_value
    FROM nv
    WHERE value_cents * 25 > (SELECT SUM(value_cents) FROM nv)
    ORDER BY net_value DESC, nation
    """,
    doc="TPC-H Q11 shape: supplier nations whose discounted revenue "
    "exceeds 4 percent of the global total (HAVING against a global "
    "scalar subquery). The threshold test is the exact integer "
    "cross-multiplication value_cents * 25 > total_cents — no divided "
    "double ever enters a comparison, so the cut is bit-identical in "
    "both engines. Plan: one partial-agg pass to 25 nation rows "
    "(supplier and nation broadcast into the fact scan), then a 1-row "
    "global sum broadcast-crossed back — the fact is scanned once.",
    tags=("agg", "scalar-subquery"),
)
def significant_nation_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    nv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = nv.agg(F.sum("value_cents").alias("total_cents"))
    return (
        nv.join(F.broadcast(total))
        .filter(F.col("value_cents") * 25 > F.col("total_cents"))
        .select(
            "nation",
            (F.col("value_cents") / 100.0).cast("double").alias("net_value"),
        )
        .orderBy(F.desc("net_value"), "nation")
    )


@register(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey,
           s.s_name AS supplier,
           CAST(r.rev_cents / 100.0 AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON r.suppkey = s.s_suppkey
    WHERE r.rev_cents = (SELECT MAX(rev_cents) FROM rev)
    ORDER BY suppkey
    """,
    doc="TPC-H Q15 shape: the top supplier(s) by one quarter's "
    "discounted revenue — an argmax against a derived aggregate (the "
    "reference view revenue0). The max is taken over exact integer "
    "cents, so ties and the winner are engine-identical; all tied "
    "suppliers are returned, ordered by key. Plan: quarter filter on "
    "the scan, one suppkey partial agg, a 1-row MAX broadcast-crossed "
    "back onto the (small) per-supplier frame, supplier dim joined "
    "after the cut.",
    tags=("agg", "scalar-subquery", "argmax"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-04-01 00:00:00").cast("timestamp"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(cents).alias("rev_cents")
    )
    mx = rev.agg(F.max("rev_cents").alias("max_cents"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "suppkey",
            F.col("s_name").alias("supplier"),
            (F.col("rev_cents") / 100.0).cast("double").alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT))
               AS unit_cents
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey AS partkey,
           p.p_name AS part_name,
           s.s_name AS supplier,
           s.s_acctbal AS supplier_balance,
           CAST(ps.unit_cents / 100.0 AS DOUBLE) AS min_unit_price
    FROM ps
    JOIN part p ON ps.partkey = p.p_partkey
    JOIN supplier s ON ps.suppkey = s.s_suppkey
    WHERE p.p_size <= 5
      AND ps.unit_cents = (
        SELECT MIN(ps2.unit_cents) FROM ps ps2 WHERE ps2.partkey = ps.partkey
      )
    ORDER BY supplier_balance DESC, partkey, supplier
    """,
    doc="TPC-H Q2 shape: for every small part, the supplier(s) who have "
    "offered it at the lowest observed unit price — the correlated "
    "per-part MIN subquery, with the observed lineitem unit price "
    "standing in for the absent ps_supplycost. The unit price is "
    "rounded to integer cents per (part, supplier) before the "
    "correlated MIN, so the per-part minimum and its ties are exact "
    "in both engines (one IEEE divide + round per row, identical "
    "operands). Plan: one (partkey, suppkey) partial agg over the "
    "fact, the correlated MIN decorrelated into a partkey window on "
    "the already-aggregated frame (reuses the agg partitioning for "
    "partkey-prefixed keys), part/supplier dims joined after the "
    "filter cuts the frame to winners only.",
    tags=("agg", "window", "correlated"),
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    unit_cents = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 100
    ).cast("bigint")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(unit_cents).alias("unit_cents"))
    w = Window.partitionBy("partkey")
    winners = ps.withColumn("part_min", F.min("unit_cents").over(w)).filter(
        F.col("unit_cents") == F.col("part_min")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_name"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        winners.join(p, winners.partkey == p.p_partkey)
        .join(F.broadcast(s), winners.suppkey == s.s_suppkey)
        .select(
            "partkey",
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier"),
            F.col("s_acctbal").alias("supplier_balance"),
            (F.col("unit_cents") / 100.0).cast("double").alias("min_unit_price"),
        )
        .orderBy(F.desc("supplier_balance"), "partkey", "supplier")
    )


@register(
    "market_share_by_year",
    oracle="""
    WITH flows AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS cents,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents
                              ELSE 0 END) AS DOUBLE)
                / SUM(cents) AS DOUBLE) AS mkt_share,
           CAST(SUM(cents) AS BIGINT) AS market_cents
    FROM flows
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_7's share of the ASIA customer market "
    "per order year. Both numerator and denominator are exact integer "
    "cents summed per year; the share is one final division of two "
    "BIGINTs — deterministic to the last bit. Plan: the only real "
    "shuffle is lineitem⋈orders on orderkey; customer, both nation "
    "roles, region, and supplier broadcast; the region filter "
    "eliminates non-ASIA customers before the fact join via the "
    "broadcast hash table.",
    tags=("join", "agg", "share"),
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("cents")).otherwise(0))
    tot = F.sum("cents")
    return (
        flows.groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            (nat.cast("double") / tot).cast("double").alias("mkt_share"),
            tot.cast("bigint").alias("market_cents"),
        )
        .orderBy("o_year")
    )


@register(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST((CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT)) AS BIGINT)
                 - CAST(SUM(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                            * CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT))
                / 100.0 AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit on gear parts per supplier nation and "
    "order year — discounted revenue minus acquisition cost, with "
    "p_retailprice × quantity standing in for the absent "
    "ps_supplycost × quantity. Revenue and cost are separate exact "
    "integer-cent sums (quantity is integral in this schema, rounded "
    "to BIGINT before the multiply) subtracted once, divided once. "
    "Plan: the part-name filter broadcasts a reduced part dim into "
    "the fact scan, lineitem⋈orders is the single big shuffle, "
    "supplier/nation broadcast; the 25×7 group aggregate is map-side "
    "partial.",
    tags=("join", "agg"),
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cost_cents = cents("p_retailprice") * F.round(
        F.col("l_quantity")
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                (F.sum(rev_cents) - F.sum(cost_cents)) / 100.0
            ).cast("double").alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "dominant_part_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT partkey, SUM(qty) AS total_qty FROM ps GROUP BY partkey
    )
    SELECT DISTINCT s.s_suppkey AS suppkey, s.s_name AS supplier
    FROM ps
    JOIN tot ON ps.partkey = tot.partkey
    JOIN supplier s ON ps.suppkey = s.s_suppkey
    WHERE ps.qty * 5 > tot.total_qty
    ORDER BY suppkey
    """,
    doc="TPC-H Q20 shape: suppliers who shipped more than 20 percent of "
    "some red part's total volume — the nested semi-join chain "
    "(part-name filter → per-part-supplier quantity → per-part "
    "threshold → supplier list), with the observed shipped share "
    "standing in for the absent availqty half-of-demand test. The "
    "threshold is the exact integer cross-multiplication "
    "qty*5 > total. Plan: the red-part filter broadcasts into the "
    "fact scan as a semi-join, one (partkey, suppkey) partial agg, "
    "the per-part total as a partkey window over the aggregated "
    "frame (no second fact pass), DISTINCT over an already-small "
    "winner set, supplier dim broadcast last.",
    tags=("semi", "agg", "window"),
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    ps = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("qty"))
    )
    w = Window.partitionBy("partkey")
    winners = (
        ps.withColumn("total_qty", F.sum("qty").over(w))
        .filter(F.col("qty") * 5 > F.col("total_qty"))
        .select("suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        winners.join(F.broadcast(s), winners.suppkey == s.s_suppkey)
        .select("suppkey", F.col("s_name").alias("supplier"))
        .orderBy("suppkey")
    )


@register(
    "sole_blame_suppliers",
    oracle="""
    SELECT s.s_name AS supplier,
           COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, supplier
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: sole-blame analysis — returned lines in "
    "multi-supplier orders where no other supplier's line in the same "
    "order was returned (return flag standing in for the "
    "receipt-after-commit lateness). The double-correlated "
    "EXISTS / NOT EXISTS pair becomes a left-semi then left-anti hash "
    "join, both on orderkey with the supplier-inequality residual. "
    "All three lineitem legs shuffle on the same orderkey, so AQE "
    "plans them as one exchange reused three times; the NOT EXISTS "
    "leg is pre-filtered to returned lines only before shuffling. "
    "Top-20 via TakeOrdered on the per-supplier aggregate.",
    tags=("semi", "anti", "agg", "topk"),
)
def sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    blamed = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "supplier")
        .limit(20)
    )


_TOP_ORDERS_LATERAL_SQL = """
SELECT c.c_custkey AS custkey,
       c.c_mktsegment AS segment,
       t.o_orderkey AS orderkey,
       t.o_totalprice AS totalprice
FROM customer c,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 3
) t
WHERE c.c_custkey % 50 = 0
ORDER BY custkey, totalprice DESC, orderkey
"""


@register(
    "top_orders_lateral",
    oracle=_TOP_ORDERS_LATERAL_SQL,
    doc="Correlated LATERAL table subquery as literal SQL: each sampled "
    "customer's top-3 orders by price. The same SQL text runs on both "
    "engines; Catalyst decorrelates the LATERAL LIMIT into a "
    "partitioned rank window (one custkey shuffle, no per-row "
    "re-execution) — the declarative win over the reference's row-wise "
    "subquery loops. Total ORDER BY (price DESC, orderkey) inside the "
    "lateral makes the top-3 ties deterministic in both engines.",
    tags=("sql", "lateral", "topk"),
)
def top_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_TOP_ORDERS_LATERAL_SQL)
