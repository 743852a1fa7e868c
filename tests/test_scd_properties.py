"""Property-based SCD tests (hypothesis): for ANY sequence of update
batches, the engines must maintain their structural invariants —
the generalization of the reference's fixed-case checks
(dw_etl_tests.py:315-356).

Invariants checked across randomly generated update histories:
  SCD2: exactly one active version per key; versions form a contiguous
        non-overlapping chain; active version equals the latest
        delivered state; replaying any batch is a no-op.
  SCD1: snapshot equals "latest update wins" ground truth.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.scd import OPEN_END, scd1_upsert, scd2_apply

KEYS = [1, 2, 3]
PRICES = [1.0, 2.0, None]

# one batch = mapping key -> price (subset of keys present)
batch_strategy = st.dictionaries(
    st.sampled_from(KEYS), st.sampled_from(PRICES), min_size=1, max_size=3
)
history_strategy = st.lists(batch_strategy, min_size=1, max_size=3)

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


def _mk_batch(spark, batch: dict, seq: int):
    rows = [(k, v, f"name{k}", seq) for k, v in batch.items()]
    return spark.createDataFrame(rows, "k int, price double, name string, seq int")


def _materialize(df):
    """Truncate lineage between batches: chained SCD applications build
    deep plans that make hypothesis examples quadratically slower."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_strategy)
def test_scd2_invariants_hold_for_any_history(history):
    spark = _spark
    dim = None
    t = dt.datetime(2024, 1, 1)
    latest: dict[int, float | None] = {}
    for i, batch in enumerate(history):
        dim = scd2_apply(
            dim,
            _mk_batch(spark, batch, i),
            "k",
            compare=["price"],
            attrs=["name"],
            change_order=["seq"],
            run_ts=t + dt.timedelta(days=i),
        )
        dim = _materialize(dim)
        latest.update(batch)

    rows = dim.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)

    assert set(by_key) == set(latest)
    for k, versions in by_key.items():
        active = [v for v in versions if v["is_active"] == "Y"]
        # exactly one active version, open-ended
        assert len(active) == 1
        assert active[0]["end_dt"] == OPEN_END
        # active state equals last delivered state (null-safe)
        assert active[0]["price"] == latest[k] or (
            active[0]["price"] is None and latest[k] is None
        )
        # chain: sorted by start, non-overlapping, price changes between
        versions.sort(key=lambda v: v["start_dt"])
        for a, b in zip(versions, versions[1:]):
            assert a["end_dt"] < b["start_dt"]
            assert a["is_active"] == "N"
            assert a["price"] != b["price"] or (
                (a["price"] is None) != (b["price"] is None)
            )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_strategy)
def test_scd2_replay_is_noop(history):
    spark = _spark
    dim = None
    t = dt.datetime(2024, 1, 1)
    for i, batch in enumerate(history):
        dim = scd2_apply(
            dim, _mk_batch(spark, batch, i), "k", ["price"], ["name"], ["seq"],
            run_ts=t + dt.timedelta(days=i),
        )
        dim = _materialize(dim)
    snapshot = sorted(map(tuple, dim.collect()), key=repr)
    replay = scd2_apply(
        dim, _mk_batch(spark, history[-1], len(history)), "k", ["price"], ["name"],
        ["seq"], run_ts=t + dt.timedelta(days=len(history)),
    )
    assert sorted(map(tuple, replay.collect()), key=repr) == snapshot


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_strategy)
def test_scd1_snapshot_equals_latest_wins(history):
    spark = _spark
    snap = None
    t = dt.datetime(2024, 1, 1)
    latest: dict[int, float | None] = {}
    for i, batch in enumerate(history):
        snap = scd1_upsert(
            snap,
            _mk_batch(spark, batch, i).withColumnRenamed("price", "acct"),
            "k",
            tracked=["acct", "name"],
            change_order=["seq"],
            run_ts=t + dt.timedelta(days=i),
        )
        snap = _materialize(snap)
        latest.update(batch)
    got = {r["k"]: r["acct"] for r in snap.collect()}
    assert got == latest
