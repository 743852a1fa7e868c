"""Query registry: every operator family from SURVEY.md §2 as a runnable
(spark, sf_dir) -> DataFrame, each paired with an ANSI-SQL oracle string
that DuckDB executes on the same parquet tables.

Cross-engine determinism rules (so the driver's order-insensitive
value-hash matches bit-for-bit):

1.  Never SUM raw doubles — floating-point addition is not associative,
    so a distributed sum's value depends on partitioning. Instead scale
    to integer units first:  SUM(CAST(ROUND(x * 10^s) AS BIGINT)) / 10^s.
    One IEEE multiply + round per row is deterministic across engines;
    integer sums are exact in any order. (Money columns in the test data
    are exactly 2-decimal; s=2 loses nothing. For arbitrary doubles we
    define the metric at s=6.) This also keeps partial (map-side)
    aggregation exact at cluster scale.
2.  MIN/MAX/CONT on any type are order-insensitive — safe everywhere.
3.  Tie-breaks in every top-k / row_number are total (append key cols).
4.  Timestamp arithmetic via unix_micros (bigint) — never double epochs.
5.  Alias every computed column identically in Spark and SQL.

The Spark side is written for 100 TB-scale plans: dimension joins are
broadcast, aggregates are partial-agg friendly (no distinct-on-fact
unless required), filters sit directly on the parquet scan so they push
down, and window functions partition on high-cardinality keys only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    # eager=True: calling fn() RUNS Spark jobs (stateful index admission,
    # localCheckpoint) rather than just building a lazy plan — plan-only
    # tooling (explain audits) must not invoke these per-iteration
    eager: bool = False


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    doc: str = "",
    tags: tuple[str, ...] = (),
    eager: bool = False,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(
            name, fn, oracle, doc or (fn.__doc__ or ""), bench, tags, eager
        )
        return fn

    return deco


def exact_sum(col, scale: int = 2):
    """Deterministic double sum: integer-units partial sum, one divide.

    See module docstring rule 1. Returns a Column (double).
    """
    c = F.col(col) if isinstance(col, str) else col
    unit = 10**scale
    return (
        F.sum(F.round(c * unit).cast("bigint")) / F.lit(float(unit))
    ).cast("double")


def _sql_exact_sum(expr: str, scale: int = 2) -> str:
    unit = 10**scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {unit}) AS BIGINT)) / {unit}.0 AS DOUBLE)"


# ---------------------------------------------------------------------------
# Core analytics — the reference's 3-query benchmark suite mapped onto the
# TPC-H-ish tables (reference queries: /root/reference/python/dw_etl_tests.py
# :470-476, :480-490, :494-506; SURVEY.md §6).
# ---------------------------------------------------------------------------


@register(
    "q1_fact_totals",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {_sql_exact_sum('l_quantity')} AS sum_qty,
           {_sql_exact_sum('l_extendedprice')} AS sum_revenue
    FROM lineitem
    """,
    bench=True,
    doc="A5: ungrouped fact aggregation (COUNT + SUM qty + SUM revenue). "
    "Reference Q1 (dw_etl_tests.py:470-476). Single scan, full partial agg; "
    "at scale this is one map-side-combining stage with a 1-row shuffle.",
    tags=("agg",),
)
def q1_fact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_quantity").alias("sum_qty"),
        exact_sum("l_extendedprice").alias("sum_revenue"),
    )


@register(
    "q2_sales_by_brand",
    oracle=f"""
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_sales,
           {_sql_exact_sum('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY revenue DESC, brand
    """,
    bench=True,
    doc="A6/J3: sales by product brand — fact ⋈ broadcast dim, group, order. "
    "Reference Q2 (dw_etl_tests.py:480-490). part is broadcast so the fact "
    "never shuffles for the join; only the tiny post-agg shuffles.",
    tags=("agg", "join"),
)
def q2_sales_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            exact_sum("l_extendedprice").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "brand")
    )


@register(
    "q3_sales_by_geo",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_sales,
           {_sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY revenue DESC, region, nation
    LIMIT 10
    """,
    bench=True,
    doc="A7/J7/W3: sales by customer geography, multi-key group, top-10. "
    "Reference Q3 (dw_etl_tests.py:494-506). customer/nation/region are "
    "broadcast; lineitem⋈orders is the only real shuffle (co-partitioned "
    "on orderkey at scale). Discounted revenue uses one deterministic "
    "IEEE multiply per row before integer-cents summation.",
    tags=("agg", "join", "topk"),
)
def q3_sales_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            exact_sum(rev).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "region", "nation")
        .limit(10)
    )
