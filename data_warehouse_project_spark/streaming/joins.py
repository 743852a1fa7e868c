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
