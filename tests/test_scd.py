"""SCD engine invariants (reference Critical/Extended tiers,
dw_etl_tests.py:315-356, :371-406): change detection, history shape,
≤1 active version per key, idempotent re-application."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.scd import (
    OPEN_END,
    scd1_upsert,
    scd2_apply,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def _scd1_rows(df):
    return {
        r["k"]: (r["name"], r["city"], r["insert_dt"], r["update_dt"])
        for r in df.collect()
    }


def test_scd1_insert_update_noop(spark):
    updates0 = spark.createDataFrame(
        [(1, "Ann", "Rome", 1), (2, "Bob", "Oslo", 1)],
        "k int, name string, city string, seq int",
    )
    snap0 = scd1_upsert(None, updates0, "k", ["name", "city"], ["seq"], run_ts=T0)
    assert _scd1_rows(snap0)[1] == ("Ann", "Rome", T0, T0)

    # second run: Ann moves, Bob redelivered unchanged, Cy is new
    updates1 = spark.createDataFrame(
        [(1, "Ann", "Paris", 2), (2, "Bob", "Oslo", 2), (3, "Cy", "Lima", 2)],
        "k int, name string, city string, seq int",
    )
    snap1 = scd1_upsert(snap0, updates1, "k", ["name", "city"], ["seq"], run_ts=T1)
    rows = _scd1_rows(snap1)
    assert rows[1] == ("Ann", "Paris", T0, T1)  # updated, insert_dt kept
    assert rows[2] == ("Bob", "Oslo", T0, T0)  # no-op: update_dt NOT bumped
    assert rows[3] == ("Cy", "Lima", T1, T1)  # new
    assert len(rows) == 3


def test_scd1_collapses_multiple_versions_latest_wins(spark):
    updates = spark.createDataFrame(
        [(1, "Ann", "Rome", 1), (1, "Ann", "Kyiv", 2)],
        "k int, name string, city string, seq int",
    )
    snap = scd1_upsert(None, updates, "k", ["name", "city"], ["seq"], run_ts=T0)
    assert _scd1_rows(snap)[1][1] == "Kyiv"


def test_scd1_idempotent(spark):
    updates = spark.createDataFrame(
        [(1, "Ann", "Rome", 1)], "k int, name string, city string, seq int"
    )
    snap1 = scd1_upsert(None, updates, "k", ["name", "city"], ["seq"], run_ts=T0)
    snap2 = scd1_upsert(snap1, updates, "k", ["name", "city"], ["seq"], run_ts=T1)
    assert _scd1_rows(snap1) == _scd1_rows(snap2)


def _versions(df, k):
    return sorted(
        (
            (r["price"], r["start_dt"], r["end_dt"], r["is_active"])
            for r in df.filter(F.col("k") == k).collect()
        ),
        key=lambda t: t[1],
    )


def test_scd2_versioning_lifecycle(spark):
    schema = "k int, price double, name string, seq int"
    batch0 = spark.createDataFrame([(1, 9.99, "widget", 1), (2, 5.0, "bolt", 1)], schema)
    dim0 = scd2_apply(None, batch0, "k", ["price"], ["name"], ["seq"], run_ts=T0)
    assert _versions(dim0, 1) == [(9.99, T0, OPEN_END, "Y")]

    # re-priced widget, unchanged bolt, new nut
    batch1 = spark.createDataFrame(
        [(1, 12.49, "widget", 2), (2, 5.0, "bolt", 2), (3, 1.0, "nut", 2)], schema
    )
    dim1 = scd2_apply(dim0, batch1, "k", ["price"], ["name"], ["seq"], run_ts=T1)

    v1 = _versions(dim1, 1)
    assert v1 == [
        (9.99, T0, T1 - dt.timedelta(seconds=1), "N"),
        (12.49, T1, OPEN_END, "Y"),
    ]
    assert _versions(dim1, 2) == [(5.0, T0, OPEN_END, "Y")]  # untouched
    assert _versions(dim1, 3) == [(1.0, T1, OPEN_END, "Y")]

    # invariant: exactly one active version per key
    active_counts = (
        dim1.filter(F.col("is_active") == "Y").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in active_counts)


def test_scd2_idempotent_redelivery(spark):
    schema = "k int, price double, name string, seq int"
    batch = spark.createDataFrame([(1, 9.99, "widget", 1)], schema)
    dim1 = scd2_apply(None, batch, "k", ["price"], ["name"], ["seq"], run_ts=T0)
    dim2 = scd2_apply(dim1, batch, "k", ["price"], ["name"], ["seq"], run_ts=T1)
    assert dim2.count() == 1  # unchanged redelivery creates no version
    assert _versions(dim2, 1) == [(9.99, T0, OPEN_END, "Y")]


def test_scd2_multiple_updates_in_one_batch_latest_wins(spark):
    schema = "k int, price double, name string, seq int"
    batch = spark.createDataFrame(
        [(1, 9.99, "widget", 1), (1, 11.99, "widget", 2)], schema
    )
    dim = scd2_apply(None, batch, "k", ["price"], ["name"], ["seq"], run_ts=T0)
    assert _versions(dim, 1) == [(11.99, T0, OPEN_END, "Y")]


def test_scd2_null_safe_change_detection(spark):
    schema = "k int, price double, name string, seq int"
    b0 = spark.createDataFrame([(1, None, "w", 1)], schema)
    dim0 = scd2_apply(None, b0, "k", ["price"], ["name"], ["seq"], run_ts=T0)
    # NULL -> NULL is not a change (IS DISTINCT FROM semantics, F13)
    dim1 = scd2_apply(dim0, b0, "k", ["price"], ["name"], ["seq"], run_ts=T1)
    assert dim1.count() == 1
    # NULL -> value IS a change
    b1 = spark.createDataFrame([(1, 3.0, "w", 2)], schema)
    dim2 = scd2_apply(dim1, b1, "k", ["price"], ["name"], ["seq"], run_ts=T2)
    assert [v[3] for v in _versions(dim2, 1)] == ["N", "Y"]
