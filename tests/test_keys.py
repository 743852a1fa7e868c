"""Surrogate-key operator properties: the distributed (bucketed
partition-offset) assignment must be dense, deterministic, and
independent of the input's physical partitioning — the invariants that
let it replace a global row_number (SURVEY.md §7.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.keys import (
    bucket_of,
    with_distributed_keys,
)
from data_warehouse_project_spark.plans.graph import connected_components


def _ids(df):
    return {r["k"]: r["sk"] for r in df.collect()}


def test_distributed_keys_dense_and_partitioning_invariant(spark):
    base = spark.range(0, 500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    a = _ids(with_distributed_keys(base.repartition(7), "sk", ["k"], start_at=10))
    b = _ids(with_distributed_keys(base.repartition(3), "sk", ["k"], start_at=10))
    assert a == b  # same ids regardless of physical layout
    assert sorted(a.values()) == list(range(10, 510))  # dense, offset respected


def test_distributed_keys_ordered_within_bucket(spark):
    base = spark.range(0, 200).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    keyed = with_distributed_keys(base, "sk", ["k"], n_buckets=16)
    rows = keyed.withColumn("bk", bucket_of(F.col("k"), 16)).collect()
    by_bucket: dict[int, list[tuple[str, int]]] = {}
    for r in rows:
        by_bucket.setdefault(r["bk"], []).append((r["k"], r["sk"]))
    for vals in by_bucket.values():
        vals.sort()
        sks = [sk for _, sk in vals]
        # natural-key order within a bucket => consecutive ids
        assert sks == list(range(min(sks), min(sks) + len(sks)))


def test_connected_components_labels():
    from data_warehouse_project_spark.session import get_spark

    spark = get_spark("cc-test")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)],
        "src bigint, dst bigint",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_dense_keys_guard_raises_over_bound(spark, monkeypatch):
    """The dense single-task path must FAIL (not silently serialize) on
    a data-proportional batch: the guard is embedded in the key
    expression itself, so no extra count job runs."""
    import pytest

    from data_warehouse_project_spark.operators import keys as keys_mod
    from data_warehouse_project_spark.operators.keys import with_surrogate_keys

    base = spark.range(0, 50).select(F.col("id").alias("k"))
    # under the bound: dense ids as before
    ok = with_surrogate_keys(base, "sk", ["k"], start_at=5)
    assert sorted(r["sk"] for r in ok.collect()) == list(range(5, 55))
    # over the bound (lowered so the test stays tiny): raises at action
    monkeypatch.setattr(keys_mod, "DENSE_KEY_MAX_ROWS", 20)
    with pytest.raises(Exception, match="USER_RAISED_EXCEPTION|with_distributed_keys"):
        with_surrogate_keys(base, "sk", ["k"]).collect()
