"""Clamped (floored) running balance — a genuinely non-SQL-expressible
sequential fold, implemented as a grouped Arrow batch op.

``balance_t = max(floor, balance_{t-1} + delta_t)`` is NOT associative
(the clamp destroys partial-sum reuse), so no window frame or aggregate
expresses it: this is the textbook case for ``applyInPandas`` — group by
the entity key, sort within the group, fold in one Arrow batch. The
inventory query twin (plans/analytics.py ``inventory_clamped_balance``)
cross-checks the fold against a DuckDB *recursive CTE*, so even this
imperative path stays under the driver's exact oracle gate.

Scale shape: one exchange on the group key; each group folds locally in
C-speed numpy. Skewed mega-groups are the hazard (a group must fit one
task) — for billion-row keys, split the fold into per-segment prefix
passes or a stateful-streaming formulation (streaming/stateful.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def clamped_running_balance(
    df: DataFrame,
    key: str,
    order: list[str],
    delta: str,
    floor: int = 0,
) -> DataFrame:
    """Per ``key``: fold rows in ``order``, clamping the running sum at
    ``floor``. Returns one row per key:
    (key, n_txns, balance_final, n_clamped).
    """
    out_schema = f"{key} bigint, n_txns bigint, balance_final bigint, n_clamped bigint"

    def fold(pdf: pd.Series) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        deltas = pdf[delta].to_numpy(dtype=np.int64)
        bal = 0
        clamps = 0
        for d in deltas:
            bal += int(d)
            if bal < floor:
                bal = floor
                clamps += 1
        return pd.DataFrame(
            {
                key: [int(pdf[key].iloc[0])],
                "n_txns": [len(deltas)],
                "balance_final": [bal],
                "n_clamped": [clamps],
            }
        )

    return df.groupBy(key).applyInPandas(fold, out_schema)
