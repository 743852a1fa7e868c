"""Stream-stream join: time-bounded self-join of the events stream —
the streaming twin of the batch ``event_pairs_60s`` query.

A stream-stream inner join needs BOTH sides watermarked plus a time
bound in the join condition; together they let Spark expire buffered
rows (state = one watermark-window of events per side, bounded no
matter how long the stream runs). Without the time bound the state
store grows forever — the classic unbounded-join mistake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paired_events_stream(
    events: DataFrame, max_gap: str = "60 seconds", watermark: str = "10 minutes"
) -> DataFrame:
    """(type_a, type_b) rows for same-user event pairs where the second
    event follows the first within ``max_gap``. Works on streaming and
    batch input (unified API); on a stream the watermark bounds both
    join buffers."""
    a = events.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("type_a"),
        F.col("ts").alias("a_ts"),
    ).withWatermark("a_ts", watermark)
    b = events.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("type_b"),
        F.col("ts").alias("b_ts"),
    ).withWatermark("b_ts", watermark)
    return a.join(
        b,
        F.expr(
            f"""
            a_user = b_user AND b_id <> a_id AND
            b_ts > a_ts AND b_ts <= a_ts + interval {max_gap}
            """
        ),
    ).select("type_a", "type_b", "a_id", "b_id")


def enriched_events_stream(events: DataFrame, users: DataFrame) -> DataFrame:
    """Stream-static enrichment join: attach a static dimension to a
    live event stream.

    The canonical "decorate the stream" pattern: the static side is a
    plain batch DataFrame, so Spark broadcasts it into every micro-batch
    — stateless, no watermark needed, and the static side is re-read per
    batch, picking up snapshot refreshes of slowly-changing dims. Left
    join keeps unmatched events (never drop fact rows because a dim
    lagged); missing attributes surface as NULLs for the default-row
    coalesce downstream.

    Works identically on batch input (unified API) — tests drive both
    and compare.
    """
    dim = users.select(
        F.col("user_id").alias("u_id"),
        F.col("user_tier").alias("user_tier"),
    )
    return (
        events.join(dim, events["user_id"] == dim["u_id"], "left")
        .drop("u_id")
        .withColumn("user_tier", F.coalesce(F.col("user_tier"), F.lit("unknown")))
    )
