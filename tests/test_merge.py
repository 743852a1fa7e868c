"""Partition-scoped SCD merge (operators/merge.py) — the §7.3 second
path. Two guarantees:

1. EQUIVALENCE: for any update history, the bucketed-merge warehouse
   state equals the full-snapshot path's state row-for-row (same pure
   transforms, bucket-local application is exact).
2. SCOPE: an incremental batch touching <1%% of keys rewrites strictly
   fewer than all buckets, and untouched bucket directories are
   physically unmodified (mtime/file identity).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.operators.merge import (
    BUCKET_COL,
    DEFAULT_BUCKETS,
    read_dimension,
    scd1_merge,
    scd2_merge,
)
from data_warehouse_project_spark.operators.scd import scd1_upsert, scd2_apply

T0 = dt.datetime(2024, 1, 1)


def _mk_updates(spark, pairs, seq):
    rows = [(k, v, f"name{k}", seq) for k, v in pairs]
    return spark.createDataFrame(rows, "k bigint, price double, name string, seq int")


def _sorted_rows(df, cols):
    # repr-keyed sort: None-safe and stable across types
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


# ---------------------------------------------------------------- scope


def test_scd1_incremental_touches_few_buckets(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    base = _mk_updates(spark, [(i, float(i)) for i in range(500)], 1)
    stats0 = scd1_merge(
        wh, "bl_3nf", "dim", base, "k", ["price", "name"], ["seq"], run_ts=T0
    )
    assert stats0["buckets_total"] == DEFAULT_BUCKETS

    # record physical identity of every bucket dir before the increment
    dim_dir = wh.path("bl_3nf", "dim")
    before = {
        d.name: sorted(os.listdir(dim_dir / d.name))
        for d in dim_dir.iterdir()
        if d.name.startswith(f"{BUCKET_COL}=")
    }
    mtimes = {name: (dim_dir / name).stat().st_mtime_ns for name in before}

    # <1% churn: 3 keys out of 500
    inc = _mk_updates(spark, [(1, -1.0), (2, -1.0), (3, -1.0)], 2)
    stats1 = scd1_merge(
        wh, "bl_3nf", "dim", inc, "k", ["price", "name"], ["seq"],
        run_ts=T0 + dt.timedelta(days=1),
    )
    assert 0 < stats1["buckets_touched"] <= 3
    assert stats1["buckets_touched"] < stats1["buckets_total"]

    # untouched bucket dirs are physically identical (same files, same mtime)
    after = {
        d.name: sorted(os.listdir(dim_dir / d.name))
        for d in dim_dir.iterdir()
        if d.name.startswith(f"{BUCKET_COL}=")
    }
    touched_names = set(before) - {
        n for n in before if mtimes[n] == (dim_dir / n).stat().st_mtime_ns
        and before[n] == after.get(n)
    }
    assert len(touched_names) == stats1["buckets_touched"]

    # and the merged state is right: 500 keys, 3 updated
    dim = read_dimension(spark, wh, "bl_3nf", "dim")
    assert dim.count() == 500
    assert dim.filter("price = -1.0").count() == 3


def test_scd2_incremental_touches_few_buckets(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    base = _mk_updates(spark, [(i, float(i)) for i in range(300)], 1)
    scd2_merge(
        wh, "bl_3nf", "dim2", base, "k",
        compare=["price"], attrs=["name"], change_order=["seq"], run_ts=T0,
    )
    inc = _mk_updates(spark, [(7, 777.0)], 2)
    stats = scd2_merge(
        wh, "bl_3nf", "dim2", inc, "k",
        compare=["price"], attrs=["name"], change_order=["seq"],
        run_ts=T0 + dt.timedelta(days=1),
    )
    assert stats["buckets_touched"] == 1

    dim = read_dimension(spark, wh, "bl_3nf", "dim2")
    assert dim.count() == 301  # 300 originals + 1 new version
    k7 = dim.filter("k = 7").orderBy("start_dt").collect()
    assert [r["is_active"] for r in k7] == ["N", "Y"]
    assert k7[1]["price"] == 777.0


# ----------------------------------------------------------- equivalence

history_strategy = st.lists(
    st.dictionaries(
        st.sampled_from([1, 2, 3, 4, 5]),
        st.sampled_from([1.0, 2.0, 3.0, None]),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_strategy)
def test_scd1_merge_equals_snapshot_path(history, spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("m")))
    snapshot = None
    for i, batch in enumerate(history):
        upd = _mk_updates(spark, list(batch.items()), i + 1)
        ts = T0 + dt.timedelta(days=i)
        scd1_merge(
            wh, "bl_3nf", "d", upd, "k", ["price", "name"], ["seq"],
            run_ts=ts, n_buckets=8,
        )
        snapshot = scd1_upsert(
            snapshot, upd, "k", ["price", "name"], ["seq"], run_ts=ts
        )
        snapshot = spark.createDataFrame(snapshot.collect(), snapshot.schema)

    cols = ["k", "price", "name", "insert_dt", "update_dt"]
    merged = read_dimension(spark, wh, "bl_3nf", "d")
    assert _sorted_rows(merged.select(*cols), cols) == _sorted_rows(
        snapshot.select(*cols), cols
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_strategy)
def test_scd2_merge_equals_snapshot_path(history, spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("m2")))
    snapshot = None
    for i, batch in enumerate(history):
        upd = _mk_updates(spark, list(batch.items()), i + 1)
        ts = T0 + dt.timedelta(days=i)
        scd2_merge(
            wh, "bl_3nf", "d2", upd, "k",
            compare=["price"], attrs=["name"], change_order=["seq"],
            run_ts=ts, n_buckets=8,
        )
        snapshot = scd2_apply(
            snapshot, upd, "k",
            compare=["price"], attrs=["name"], change_order=["seq"], run_ts=ts,
        )
        snapshot = spark.createDataFrame(snapshot.collect(), snapshot.schema)

    cols = ["k", "price", "name", "start_dt", "end_dt", "is_active"]
    merged = read_dimension(spark, wh, "bl_3nf", "d2")
    assert _sorted_rows(merged.select(*cols), cols) == _sorted_rows(
        snapshot.select(*cols), cols
    )


def test_merge_empty_batch_is_noop(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    base = _mk_updates(spark, [(1, 1.0), (2, 2.0)], 1)
    scd1_merge(wh, "bl_3nf", "d3", base, "k", ["price", "name"], ["seq"], run_ts=T0)
    empty = _mk_updates(spark, [], 2)
    stats = scd1_merge(
        wh, "bl_3nf", "d3", empty, "k", ["price", "name"], ["seq"],
        run_ts=T0 + dt.timedelta(days=1),
    )
    assert stats == {
        "rows_written": 0,
        "buckets_touched": 0,
        "buckets_total": DEFAULT_BUCKETS,
    }
    assert read_dimension(spark, wh, "bl_3nf", "d3").count() == 2


# ------------------------------------------------- pipeline integration


def test_full_etl_merge_strategy_matches_snapshot(spark, tmp_path):
    """run_full_etl(scd_strategy='merge') must land the same warehouse
    state as the snapshot strategy — same dims (ignoring the internal
    bucket column; surrogate ids identical on a first build because
    both paths mint over the same full row set) and same fact."""
    from data_warehouse_project_spark.etl import Warehouse, run_full_etl
    from tests.conftest import SF_SMOKE

    t0 = dt.datetime(2024, 1, 1)
    root_m = str(tmp_path / "wh_merge")
    root_s = str(tmp_path / "wh_snap")
    run_full_etl(spark, SF_SMOKE, root_m, run_ts=t0, scd_strategy="merge")
    run_full_etl(spark, SF_SMOKE, root_s, run_ts=t0)

    wh_m = Warehouse(spark, root_m)
    wh_s = Warehouse(spark, root_s)
    for layer, name, cols in (
        ("bl_3nf", "ce_customers",
         ["customer_src_id", "customer_id", "customer_name", "acctbal"]),
        ("bl_3nf", "ce_products_scd",
         ["product_src_id", "product_id", "unit_price", "is_active"]),
        ("bl_dm", "fct_sales", None),
        ("bl_dm", "dim_products_scd", None),
    ):
        dm = wh_m.read(layer, name).drop(BUCKET_COL)
        ds = wh_s.read(layer, name).drop(BUCKET_COL)
        use = cols or sorted(set(dm.columns) & set(ds.columns))
        assert sorted(dm.columns) == sorted(ds.columns), f"{name} schema differs"
        assert _sorted_rows(dm.select(*use), use) == _sorted_rows(
            ds.select(*use), use
        ), f"{layer}.{name} differs between merge and snapshot strategies"

    # idempotent merge rerun: same sources again -> dims unchanged
    run_full_etl(spark, SF_SMOKE, root_m,
                 run_ts=t0 + dt.timedelta(days=1), scd_strategy="merge")
    cust2 = wh_m.read("bl_3nf", "ce_customers").drop(BUCKET_COL)
    cols = ["customer_src_id", "customer_id", "customer_name", "update_dt"]
    cust1 = wh_s.read("bl_3nf", "ce_customers")
    assert _sorted_rows(cust2.select(*cols), cols) == _sorted_rows(
        cust1.select(*cols), cols
    )


def test_merge_rejects_drifted_key_dtype(spark, tmp_path):
    """A batch whose key column dtype differs from the stored
    dimension's must fail loudly: dtype drift would break the SCD
    equi-join (5 != '5') and, before bucket_expr normalized its hash
    input, silently scattered a key's versions across two buckets."""
    wh = Warehouse(spark, str(tmp_path))
    base = _mk_updates(spark, [(i, float(i)) for i in range(20)], 1)
    scd1_merge(wh, "bl_3nf", "dim", base, "k", ["price", "name"], ["seq"], run_ts=T0)

    drifted = spark.createDataFrame(
        [("1", -1.0, "name1", 2)], "k string, price double, name string, seq int"
    )
    with pytest.raises(TypeError, match="dtype"):
        scd1_merge(
            wh, "bl_3nf", "dim", drifted, "k", ["price", "name"], ["seq"],
            run_ts=T0 + dt.timedelta(days=1),
        )
    # dimension unchanged
    dim = read_dimension(spark, wh, "bl_3nf", "dim")
    assert dim.count() == 20
    assert dim.filter("price = -1.0").count() == 0


def test_merge_rejects_missing_or_foreign_bucket_layout(spark, tmp_path):
    """A dimension without a bucket-layout marker (pre-versioned or
    foreign layout) must be refused: merging with a different
    key->bucket map would silently duplicate keys across buckets."""
    wh = Warehouse(spark, str(tmp_path))
    base = _mk_updates(spark, [(i, float(i)) for i in range(20)], 1)
    scd1_merge(wh, "bl_3nf", "dim", base, "k", ["price", "name"], ["seq"], run_ts=T0)

    from data_warehouse_project_spark.operators.merge import _LAYOUT_FILE

    marker = wh.path("bl_3nf", "dim") / _LAYOUT_FILE
    assert marker.exists()

    inc = _mk_updates(spark, [(1, -1.0)], 2)
    # foreign n_buckets
    marker.write_text('{"scheme": "xxhash64-str-v2", "n_buckets": 8}')
    with pytest.raises(ValueError, match="bucket layout"):
        scd1_merge(
            wh, "bl_3nf", "dim", inc, "k", ["price", "name"], ["seq"],
            run_ts=T0 + dt.timedelta(days=1),
        )
    # missing marker (pre-versioned layout)
    marker.unlink()
    with pytest.raises(ValueError, match="no bucket-layout marker"):
        scd1_merge(
            wh, "bl_3nf", "dim", inc, "k", ["price", "name"], ["seq"],
            run_ts=T0 + dt.timedelta(days=1),
        )
