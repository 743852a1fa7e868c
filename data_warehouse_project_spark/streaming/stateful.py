"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stateful semantics the built-in windowed
aggregations can't express (reference has no streaming at all; this is
the extension surface for per-key running state).

``running_user_totals`` keeps (event count, exact micro-unit value sum)
per user in the state store and emits the updated totals every
micro-batch. State is one fixed-width row per user — bounded, and
Arrow-batched on both sides of the Python boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value_micros bigint"
STATE_SCHEMA = "n bigint, sv bigint"


def _micros_half_up(values: pd.Series) -> int:
    """Exact micro-unit sum matching the batch contract: NULLs skipped
    (like ``F.sum``) and HALF_UP rounding (like ``F.round`` — pandas'
    ``.round()`` is half-EVEN, which would disagree on half-micro
    values), computed row-wise THEN summed so it is the same integer
    the batch plan produces."""
    v = values.dropna().to_numpy(dtype="float64")
    if v.size == 0:
        return 0
    return int((np.sign(v) * np.floor(np.abs(v) * 1_000_000 + 0.5)).sum())


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, sv = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)  # count(*) semantics: null-valued rows still count
        sv += _micros_half_up(pdf["value"])
    state.update((n, sv))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value_micros": [sv]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals. Streaming input: update stream via
    ``applyInPandasWithState``. Batch input: the equivalent final
    aggregate (``applyInPandasWithState`` is streaming-only in Spark,
    so the batch arm of the unified API is the plain groupBy — same
    output for a batch that would have arrived as one micro-batch)."""
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.coalesce(
                F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")),
                F.lit(0),
            ).alias("sum_value_micros"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT = (
    "user_id bigint, prev_type string, next_type string, n_transitions bigint"
)
TRANSITION_STATE = "last_type string"


def _update_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs))
    if pdf.empty:
        return
    pdf = pdf.sort_values(["ts", "event_id"])
    types = pdf["event_type"].tolist()
    seq = ([state.get[0]] if state.exists else []) + types
    state.update((types[-1],))
    counts: dict[tuple[str, str], int] = {}
    for prev, nxt in zip(seq[:-1], seq[1:]):
        counts[(prev, nxt)] = counts.get((prev, nxt), 0) + 1
    if not counts:
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(counts),
            "prev_type": [p for p, _ in counts],
            "next_type": [n for _, n in counts],
            "n_transitions": list(counts.values()),
        }
    )


def transition_counts_stream(events: DataFrame) -> DataFrame:
    """Per-user event-type transition counts as an append stream — the
    streaming twin of the ``event_transition_counts`` batch query.

    State is one row per user (the last event type seen), so the state
    store is bounded by the user population regardless of event volume.
    Events are sorted by (ts, event_id) *within* each micro-batch;
    cross-batch ordering follows micro-batch arrival, the standard
    streaming-lag contract (pair a watermark + within-batch sort for
    bounded disorder). Each batch emits only the transitions it
    completed, so downstream summing over batches reproduces the batch
    query exactly.

    Batch input takes the lag-window equivalent
    (``applyInPandasWithState`` is streaming-only in Spark).
    """
    if not events.isStreaming:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            events.withColumn("prev_type", F.lag("event_type").over(w))
            .filter(F.col("prev_type").isNotNull())
            .groupBy(
                "user_id",
                "prev_type",
                F.col("event_type").alias("next_type"),
            )
            .agg(F.count(F.lit(1)).alias("n_transitions"))
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANSITION_OUTPUT,
        stateStructType=TRANSITION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
