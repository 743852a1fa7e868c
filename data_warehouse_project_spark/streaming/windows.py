"""Structured Streaming operators over the ``events`` stream — the
beyond-reference extension surface (SURVEY.md §2.11: the reference is
batch-only; its "incremental loading" is watermark-filtered batch).

Each operator is a pure transformation on an *unbounded* DataFrame
(works identically on ``readStream`` input and on a batch frame, which
is how the tests verify semantics: run the same transform in a
file-source stream with ``trigger(availableNow=True)`` and in batch,
then compare results — Structured Streaming's unified-API guarantee).

Watermarks bound state: every aggregation here declares how late an
event may arrive; at cluster scale that is what keeps the state store
finite over 100 TB/day streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_project_spark.localframe import local_rows


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count/aggregate per event_type with late-data
    bound. Batch twin: plans/timeseries.events_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias(
                "sum_value_micros"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming native of
    plans/timeseries.sessionize_events. session_window closes a session
    once watermark passes last_event + gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids arriving
    within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark``: with plain
    ``dropDuplicates([\"event_id\"])`` the watermark never evicts dedup
    state unless the event-time column is part of the key, so every
    event_id ever seen would be held forever — unbounded state on a
    24/7 stream. WithinWatermark evicts a key once the watermark passes
    its first occurrence + delay, which is exactly the documented
    contract (duplicates later than the horizon are out-of-contract,
    like any late data). Batch input takes the plain dropDuplicates
    (one batch holds everything, eviction is moot)."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def cascade_ingest(
    stream_events: DataFrame,
    wh,
    checkpoint_dir: str,
    ts_col: str,
    dims,
    measures,
    grains=("hour", "day", "month"),
    prefix: str = "rollup",
    available_now: bool = True,
):
    """Streaming continuous aggregates: ``foreachBatch`` admission into
    ``operators/incremental.rollup_cascade`` — the streaming twin of
    the batch cascade, maintaining the same ``{prefix}_{grain}`` tables
    from a live event stream.

    Delivery contract (STRONGER guard than the row-grain idempotence of
    ``neardup_ingest``, because additive merges are NOT row-idempotent:
    replaying a merged batch double-counts instead of no-opping): a
    BATCH-ID FENCE. Structured Streaming's foreachBatch delivers each
    micro-batch with a monotonically increasing ``batch_id`` and, after
    a crash, replays the last UNcommitted batch with the SAME id;
    admissions record the id after the cascade commits, and any batch
    at or below the fence is skipped wholesale. Batch ids are only
    meaningful RELATIVE TO ONE CHECKPOINT INCARNATION, so the fence
    table is scoped to (prefix, the streaming query id read from the
    checkpoint's own ``metadata`` file) — NOT to the checkpoint path
    string: clearing and recreating the same path mints a new query id
    (fresh fence → full source replay becomes a recompute, never a
    silent drop), a respelled path to the same checkpoint keeps the
    same id (the stale-path-hash failure: a fresh fence there would
    re-admit the replayed batch and double-count), and two cascades
    sharing a warehouse cannot cross-fence. The fence is a single row
    kept by atomic snapshot overwrite — O(1) to read and write per
    trigger, never an append-per-batch file pileup — and the
    metadata-only footer MAX falls back to a real aggregate if a
    writer produced a statistics-less footer, because treating missing
    stats as 'no fence' would re-admit a replay.

    Residual window, stated precisely: the cascade swaps each grain's
    partitions in sequence and the fence lands LAST, so a crash any
    time after the FIRST grain's swap and before the fence write
    replays a batch whose earlier grains already merged — those grains
    double-count the touched stripes. That is the plain-parquet honesty
    tax (same class as neardup_ingest's band-append window); closing it
    needs a transactional table format, not a different algorithm —
    now provided: ``streaming/txsink.txtable_ingest`` closes it for
    single-table sinks (fence and data in ONE atomic manifest commit,
    sources/txtable.py), and ``streaming/txsink.txcascade_ingest`` is
    this cascade's transactional twin (per-grain fenced rewrites +
    one ``TxCatalog`` pin commit making all grains visible together,
    sources/txcatalog.py). This plain-parquet variant remains for
    warehouses that want zero commit-log machinery and accept the
    stated window.

    Scale shape: per trigger, O(micro-batch) aggregation + O(touched
    months) partition rewrites per grain — state tables never rescan.
    """
    import hashlib
    import json
    import os

    from pyspark.sql import functions as SF

    from data_warehouse_project_spark.operators.incremental import rollup_cascade

    _identity: list[str] = []  # resolved once, on the first trigger

    def fence_table() -> str:
        if not _identity:
            # the query id inside <ckpt>/metadata IS the incarnation:
            # written at stream start (before any batch), regenerated
            # when the checkpoint is cleared, identical however the
            # path is spelled. Path-hash fallback only for exotic
            # checkpoint filesystems this local warehouse can't read.
            try:
                with open(os.path.join(checkpoint_dir, "metadata")) as fh:
                    _identity.append(json.loads(fh.read())["id"][:8])
            except (OSError, KeyError, ValueError):
                _identity.append(
                    hashlib.md5(
                        os.path.abspath(checkpoint_dir).encode()
                    ).hexdigest()[:8]
                )
        return f"{prefix}_fence_{_identity[0]}"

    def read_fence() -> int | None:
        if not wh.exists("meta", fence_table()):
            return None
        m = wh.footer_max("meta", fence_table(), "batch_id")
        if m is None:  # footer lacks stats: fall back to a real agg
            m = wh.read("meta", fence_table()).agg(SF.max("batch_id")).first()[0]
        return m

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        fence = read_fence()
        if fence is not None and batch_id <= fence:
            return  # crash-replay of an already-merged batch
        rollup_cascade(wh, batch_df, ts_col, dims, measures, grains, prefix=prefix)
        wh.overwrite(
            local_rows(
                batch_df.sparkSession, [(batch_id,)], "batch_id long"
            ),
            "meta",
            fence_table(),
        )

    writer = (
        stream_events.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
