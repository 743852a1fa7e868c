"""Event/time-series queries over the ``events`` table: tumbling-window
aggregation, gap-based sessionization, and latest-wins dedup — the batch
twins of the Structured Streaming operators in ``streaming/``.

All timestamp arithmetic uses unix_micros (bigint) so interval math is
exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import _sql_exact_sum, exact_sum, register

SESSION_GAP_MIN = 30


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {_sql_exact_sum('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Tumbling 1-hour window aggregation — batch twin of the streaming "
    "windowed count (streaming/windows.py). date_trunc keys partial-agg "
    "cleanly; `value` is an arbitrary double so the metric is defined at "
    "micro-unit precision (exact integer sum, see queries.exact_sum).",
    tags=("events", "window-agg"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum(F.col("value"), 6).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_us
      FROM events
    ), flagged AS (
      SELECT user_id, ts, us,
             CASE WHEN prev_us IS NULL
                       OR us - prev_us > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS is_new_session,
             event_id
      FROM seq
    ), sess AS (
      SELECT user_id, ts, us,
             SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_seq
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_seq,
             COUNT(*) AS n_events,
             MAX(us) - MIN(us) AS duration_us
      FROM sess GROUP BY user_id, session_seq
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(MAX(duration_us) AS BIGINT) AS max_session_us
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gap-based sessionization (30-min inactivity gap) via "
    "gaps-and-islands windows — batch twin of session_window / "
    "applyInPandasWithState sessionization. Both windows partition on "
    "user_id: one shuffle. Micros as bigint → exact durations.",
    tags=("events", "session"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.unix_micros("ts").alias("us")
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = e.withColumn("prev_us", F.lag("us").over(w_seq)).withColumn(
        "is_new_session",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > gap_us), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w_seq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").cast("bigint").alias("max_session_events"),
            F.max("duration_us").cast("bigint").alias("max_session_us"),
        )
        .orderBy("user_id")
    )


@register(
    "events_dedup_latest",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id, event_type, ts AS latest_ts, event_id AS latest_event_id
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    doc="Latest-wins dedup on a composite key — batch twin of streaming "
    "dropDuplicatesWithinWatermark. row_number beats groupBy+max-struct "
    "only when extra payload columns ride along; key-partitioned window.",
    tags=("events", "dedup"),
)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("event_id").alias("latest_event_id"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "events_sliding_15min",
    oracle="""
    WITH win AS (
      SELECT event_type,
             unnest(list_transform(range(0, 4),
               k -> make_timestamp(
                      (epoch_us(ts) // 900000000) * 900000000 - k * 900000000)
             )) AS window_start
      FROM events
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events
    FROM win
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc="Sliding 1-hour window, 15-min slide (batch twin of "
    "streaming.sliding_counts): each event expands into the 4 window "
    "instances that contain it — Spark's window() does this expansion "
    "natively; the oracle derives the same instance starts by "
    "15-min-bucketing ts shifted k slides back.",
    tags=("events", "window-agg"),
)
def events_sliding_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "rollup_cascade_day",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_ts,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
             AS value_micros
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket_ts, event_type
    """,
    doc="Hypertable-style continuous-aggregate cascade vs the one-shot "
    "oracle: events are fed to operators/incremental.rollup_cascade in "
    "TWO batches (even then odd user_ids — every hour stripe overlaps "
    "both batches, the hard case), maintaining hour- then day-grain "
    "state tables where each grain merges only the FINER grain's "
    "delta; the day table must equal the direct full-history day "
    "rollup. This is the mart-maintenance shape that replaces the "
    "reference's per-run full mart rebuild at scale: per batch the raw "
    "data is scanned once at hour grain, coarser grains read deltas "
    "~1/24th that size, and only touched yyyy-MM partitions are "
    "rewritten. Measures stay integer micro-units end-to-end so "
    "additive merges are exact across any batch boundary.",
    tags=("events", "window-agg", "incremental"),
    eager=True,
)
def rollup_cascade_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.operators.incremental import rollup_cascade

    ev = table(spark, sf_dir, "events")
    measures = {
        "n_events": F.count(F.lit(1)),
        "value_micros": F.sum(
            F.round(F.col("value") * 1_000_000).cast("bigint")
        ),
    }
    tmp = tempfile.mkdtemp(prefix="cagg_")
    try:
        wh = Warehouse(spark, tmp)
        for parity in (0, 1):
            rollup_cascade(
                wh,
                ev.filter(F.col("user_id") % 2 == parity),
                "ts",
                ["event_type"],
                measures,
                grains=("hour", "day"),
            )
        return (
            wh.read("bl_dm", "rollup_day")
            .drop("part_month")
            .select("bucket_ts", "event_type", "n_events", "value_micros")
            .orderBy("bucket_ts", "event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
