"""Schema-drift regression tests for the table catalog.

The driver has regenerated ``events.parquet`` with different physical
timestamp encodings across rounds (parquet TIMESTAMP(NANOS) read as raw
int64 under legacy long mode, vs plain ``timestamp[us]``). ``catalog.table``
must return identical microsecond timestamps for both so a testdata
regeneration can never silently break every events consumer again
(round-3 incident: 15/126 queries + 8 streaming tests red from one
stale-dtype assumption).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_warehouse_project_spark import catalog


def _base_columns():
    ts_us = [
        dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
        dt.datetime(2024, 6, 15, 12, 30, 45, 999999),
        dt.datetime(2025, 12, 31, 23, 59, 59, 1),
    ]
    return ts_us, {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(['{"a":1}', "{}", '{"b":2}']),
    }


def _write_events(path, ts_array):
    ts_us, cols = _base_columns()
    table = pa.table(
        {
            "event_id": cols["event_id"],
            "ts": ts_array,
            "user_id": cols["user_id"],
            "event_type": cols["event_type"],
            "value": cols["value"],
            "props": cols["props"],
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def events_dirs(tmp_path_factory):
    ts_us, _ = _base_columns()

    us_dir = tmp_path_factory.mktemp("events_us")
    _write_events(str(us_dir / "events.parquet"), pa.array(ts_us, pa.timestamp("us")))

    ns_dir = tmp_path_factory.mktemp("events_ns")
    _write_events(str(ns_dir / "events.parquet"), pa.array(ts_us, pa.timestamp("ns")))

    return str(us_dir), str(ns_dir)


def test_events_ts_identical_across_physical_encodings(spark, events_dirs):
    us_dir, ns_dir = events_dirs

    df_us = catalog.table(spark, us_dir, "events")
    df_ns = catalog.table(spark, ns_dir, "events")

    assert str(df_us.schema["ts"].dataType) == str(df_ns.schema["ts"].dataType)

    rows_us = [r.asDict() for r in df_us.orderBy("event_id").collect()]
    rows_ns = [r.asDict() for r in df_ns.orderBy("event_id").collect()]
    assert rows_us == rows_ns

    ts_expected, _ = _base_columns()
    assert [r["ts"] for r in rows_us] == ts_expected


def test_current_testdata_events_readable(spark):
    """Whatever encoding the driver generated *this* round must read clean."""
    from tests.conftest import SF_SMOKE

    df = catalog.table(spark, SF_SMOKE, "events")
    # force analysis + execution of the ts expression
    n = df.filter("ts IS NOT NULL").count()
    assert n > 0
    assert "timestamp" in str(df.schema["ts"].dataType).lower()
