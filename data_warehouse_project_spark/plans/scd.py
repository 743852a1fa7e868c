"""SCD-style queries: current-state (SCD1) and versioned-history (SCD2)
semantics expressed as set-based window programs.

The reference maintains SCDs procedurally (row loops + ON CONFLICT /
expire-and-insert: load_3nf_ce_customers_scd_table_type1.sql:101-144,
load_3nf_ce_products_scd_table_type2.sql:59-248). The batch-engine
equivalents of the *maintenance* operators live in
``operators/scd.py``; the queries here express the same semantics over
the driver's immutable test tables so the DuckDB oracle can check them:
SCD1 == "latest version wins", SCD2 == "contiguous validity intervals".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import register


@register(
    "scd1_current_customer_state",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_versions
      FROM orders
    )
    SELECT o_custkey AS customer_id,
           o_orderstatus AS current_status,
           o_orderpriority AS current_priority,
           CAST(o_orderdate AS DATE) AS last_update,
           n_versions
    FROM ranked WHERE rn = 1
    ORDER BY customer_id
    """,
    doc="M2-as-query (SCD Type 1): latest-version-wins per business key "
    "with a total tie-break — orders replayed as customer state updates. "
    "row_number over (key DESC-date) partitions on the high-cardinality "
    "key, so the window shuffle is the same hash partitioning a MERGE "
    "would need anyway.",
    tags=("scd", "window"),
)
def scd1_current_customer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    wc = Window.partitionBy("o_custkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderstatus").alias("current_status"),
            F.col("o_orderpriority").alias("current_priority"),
            F.col("o_orderdate").cast("date").alias("last_update"),
            "n_versions",
        )
        .orderBy("customer_id")
    )


# ONE gaps-and-islands versioning definition shared (Spark + SQL) by
# all three scd2_* queries — a change to the is_new NULL semantics or
# the (ts, event_id) tie-break must move every SCD2 surface together.
_VERSIONS_CTE = """evts AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                     THEN 1 ELSE 0 END AS is_new
      FROM evts
    ), versioned AS (
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS version_id
      FROM flagged
    ), versions AS (
      SELECT user_id, version_id, event_type,
             MIN(ts) AS start_ts, COUNT(*) AS n_events
      FROM versioned GROUP BY user_id, version_id, event_type
    )"""


def _event_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _VERSIONS_CTE: the (user_id, version_id,
    event_type, start_ts, n_events) versions frame. One user_id
    shuffle; callers' follow-up windows reuse the partitioning."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "prev_type", F.lag("event_type").over(w_seq)
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    versioned = flagged.withColumn(
        "version_id",
        F.sum("is_new").over(w_seq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return versioned.groupBy("user_id", "version_id", "event_type").agg(
        F.min("ts").alias("start_ts"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "scd2_user_state_history",
    oracle=f"""
    WITH {_VERSIONS_CTE}
    SELECT user_id, CAST(version_id AS INT) AS version_id, event_type,
           start_ts,
           COALESCE(strftime(LEAD(start_ts) OVER (
             PARTITION BY user_id ORDER BY version_id
           ), '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS end_ts,
           CASE WHEN LEAD(start_ts) OVER (
             PARTITION BY user_id ORDER BY version_id
           ) IS NULL THEN 'Y' ELSE 'N' END AS is_active,
           CAST(n_events AS BIGINT) AS n_events
    FROM versions
    ORDER BY user_id, version_id
    """,
    doc="M3-as-query (SCD Type 2): gaps-and-islands versioning — collapse "
    "each user's consecutive same-type events into contiguous "
    "[start_ts, end_ts) validity intervals with the reference's "
    "9999-12-31 open-end + IS_ACTIVE flag sentinels "
    "(load_3nf_ce_products_scd_table_type2.sql:86-100). end_ts is carried "
    "as an ISO second-resolution string: the sentinel overflows "
    "datetime64[ns] (pandas caps at 2262), so a TIMESTAMP carrier breaks "
    "every Arrow/pandas consumer downstream. Three windows, all "
    "partitioned by user_id: one shuffle, reused across stages.",
    tags=("scd", "window"),
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    versions = _event_versions(spark, sf_dir)
    w_ver = Window.partitionBy("user_id").orderBy("version_id")
    lead_start = F.lead("start_ts").over(w_ver)
    return versions.select(
        "user_id",
        F.col("version_id").cast("int").alias("version_id"),
        "event_type",
        "start_ts",
        F.coalesce(
            F.date_format(lead_start, "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("end_ts"),
        F.when(lead_start.isNull(), "Y").otherwise("N").alias("is_active"),
        F.col("n_events").cast("bigint").alias("n_events"),
    ).orderBy("user_id", "version_id")


@register(
    "scd2_active_version_counts",
    oracle=f"""
    WITH {_VERSIONS_CTE},
    per_user AS (
      SELECT user_id, COUNT(*) AS n_versions FROM versions GROUP BY user_id
    )
    SELECT CAST(n_versions AS BIGINT) AS n_versions,
           COUNT(*) AS n_users
    FROM per_user GROUP BY n_versions
    ORDER BY n_versions
    """,
    doc="SCD2 structural invariant check as data: version-count histogram "
    "(reference's active/inactive count checks, dw_etl_tests.py:321-328).",
    tags=("scd", "agg"),
)
def scd2_active_version_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = _event_versions(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions")
    )
    return (
        per_user.groupBy(F.col("n_versions").cast("bigint").alias("n_versions"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("n_versions")
    )


_ASOF_TS = "2024-01-15 00:00:00"


@register(
    "scd2_snapshot_asof",
    oracle=f"""
    WITH {_VERSIONS_CTE}, bounded AS (
      SELECT user_id, version_id, event_type, start_ts, n_events,
             LEAD(start_ts) OVER (
               PARTITION BY user_id ORDER BY version_id
             ) AS next_start
      FROM versions
    )
    SELECT user_id, CAST(version_id AS INT) AS version_id,
           event_type AS state_asof, start_ts,
           CAST(n_events AS BIGINT) AS n_events
    FROM bounded
    WHERE start_ts <= TIMESTAMP '{_ASOF_TS}'
      AND (next_start IS NULL OR next_start > TIMESTAMP '{_ASOF_TS}')
    ORDER BY user_id
    """,
    doc="SCD2 time travel: rebuild the versioned dimension "
    "(gaps-and-islands, as scd2_user_state_history) and return each "
    "key's version whose [start, next_start) interval contains a fixed "
    "AS OF timestamp — the point-in-time dimension read the reference "
    "can only approximate by filtering IS_ACTIVE='Y' at load time "
    "(SURVEY §2.3: sale date ∈ [START_DT, END_DT)). Same single "
    "user_id shuffle reused across all three windows; the as-of "
    "predicate is a per-row filter after the lead().",
    tags=("scd", "window"),
)
def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    asof = F.lit(_ASOF_TS).cast("timestamp")
    versions = _event_versions(spark, sf_dir)
    w_ver = Window.partitionBy("user_id").orderBy("version_id")
    bounded = versions.withColumn("next_start", F.lead("start_ts").over(w_ver))
    return (
        bounded.filter(
            (F.col("start_ts") <= asof)
            & (F.col("next_start").isNull() | (F.col("next_start") > asof))
        )
        .select(
            "user_id",
            F.col("version_id").cast("int").alias("version_id"),
            F.col("event_type").alias("state_asof"),
            "start_ts",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )
