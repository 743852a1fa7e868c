"""Clamped running balance: fold correctness and partitioning invariance."""

from __future__ import annotations

from data_warehouse_project_spark.operators.running import clamped_running_balance


def _df(spark, rows, partitions):
    return spark.createDataFrame(
        rows, "k bigint, seq bigint, d bigint"
    ).repartition(partitions)


def test_fold_matches_reference(spark):
    rows = [
        (1, 1, 5), (1, 2, -8), (1, 3, 2), (1, 4, -1),  # clamp at seq 2
        (2, 1, -3), (2, 2, 10),                        # clamp at seq 1
        (3, 1, 4),
    ]
    out = {
        r["k"]: (r["n_txns"], r["balance_final"], r["n_clamped"])
        for r in clamped_running_balance(
            _df(spark, rows, 4), "k", ["seq"], "d"
        ).collect()
    }
    assert out == {1: (4, 1, 1), 2: (2, 10, 1), 3: (1, 4, 0)}


def test_partitioning_invariant(spark):
    rows = [(k, s, (s * 7919 + k) % 11 - 5) for k in range(20) for s in range(1, 40)]
    a = sorted(
        map(tuple, clamped_running_balance(_df(spark, rows, 1), "k", ["seq"], "d").collect())
    )
    b = sorted(
        map(tuple, clamped_running_balance(_df(spark, rows, 32), "k", ["seq"], "d").collect())
    )
    assert a == b
