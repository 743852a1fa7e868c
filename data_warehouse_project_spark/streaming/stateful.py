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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value_micros bigint"
STATE_SCHEMA = "n bigint, sv bigint"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, sv = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer micro-units (same contract as exact_sum scale=6)
        sv += int((pdf["value"] * 1_000_000).round().astype("int64").sum())
    state.update((n, sv))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value_micros": [sv]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as an update stream. Works on streaming
    *and* batch input (batch ≡ one micro-batch containing everything)."""
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
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANSITION_OUTPUT,
        stateStructType=TRANSITION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
