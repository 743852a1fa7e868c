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
