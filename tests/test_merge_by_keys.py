"""Merge-on-read key-confined apply (``TxTable.merge_by_keys``) — the
r15 O(churn) view-refresh write path — plus the bounded-driver dv
sidecar merge. Pins: state equivalence vs ``rewrite_by_keys`` (same
transform contract), files-written ∝ churn (touched data files are
CARRIED, not rewritten), the fused single-commit crash/fence contract,
the restricted-slice contract, dense-vector fold in the same commit,
and the distributed sidecar-merge fallback producing byte-equivalent
state to the driver loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources import txtable as txt
from data_warehouse_project_spark.sources.txtable import TxTable


def _mk(spark, root, rows, files=4):
    df = spark.createDataFrame(rows, "id long, v long").repartition(files)
    return TxTable.create(spark, root, df, key="id")


def _snap(t, version=None):
    return {(r["id"]): r["v"] for r in t.read(version).collect()}


def _bump(keys_df, delta=100):
    """A key-confined additive transform: +delta to the keys' rows,
    dropping a KEYS' row whose v hits 0 (update + delete in one
    apply); every non-key row passes through untouched, whatever its
    value — the rewrite_by_keys/merge_by_keys confinement contract."""

    def xform(slice_df):
        changed = (
            slice_df.alias("s")
            .join(
                F.broadcast(keys_df.alias("k")),
                F.col("s.id").eqNullSafe(F.col("k.id")),
                "left",
            )
            .select(
                F.col("s.id").alias("id"),
                F.when(
                    F.col("k.id").isNotNull(), F.col("s.v") + delta
                )
                .otherwise(F.col("s.v"))
                .alias("v"),
                F.col("k.id").isNotNull().alias("__hit"),
            )
        )
        return changed.filter(
            ~F.col("__hit") | (F.col("v") != 0)
        ).drop("__hit")

    return xform


def test_merge_by_keys_state_equals_rewrite_by_keys(spark, tmp_path):
    rows = [(i, i % 7 - 3) for i in range(200)]
    a = _mk(spark, tmp_path / "cow", rows)
    b = _mk(spark, tmp_path / "mor", rows)
    keys = spark.createDataFrame([(i,) for i in range(0, 200, 3)], "id long")
    # delta=3 drives keys' rows with v=-3 (i % 21 == 0) to 0 → deleted
    a.rewrite_by_keys(keys, _bump(keys, 3), txn=("app", 1))
    b.merge_by_keys(keys, _bump(keys, 3), txn=("app", 1))
    assert _snap(a) == _snap(b)
    assert a.row_count() == b.row_count()
    # a second window composes on top of the dv-carrying table
    keys2 = spark.createDataFrame([(i,) for i in range(0, 200, 5)], "id long")
    a.rewrite_by_keys(keys2, _bump(keys2, -50), txn=("app", 2))
    b.merge_by_keys(keys2, _bump(keys2, -50), txn=("app", 2))
    assert _snap(a) == _snap(b)


def test_merge_by_keys_writes_churn_not_table(spark, tmp_path):
    # keys hash-spread across every file: rewrite_by_keys would rewrite
    # ALL files; merge_by_keys must carry every data file unchanged
    t = _mk(spark, tmp_path / "t", [(i, 1) for i in range(1000)], files=8)
    before = {f["path"] for f in t._manifest()["files"]}
    keys = spark.createDataFrame([(i,) for i in range(0, 1000, 125)], "id long")
    r = t.merge_by_keys(keys, _bump(keys), txn=("app", 1))
    assert r["files_rewritten"] == 0
    m = t._manifest()
    carried = {f["path"] for f in m["files"]} & before
    assert carried == before  # no touched file rewritten
    new = [f for f in m["files"] if f["path"] not in before]
    assert sum(f["rows"] for f in new) == 8  # the churn, not the table
    assert t.row_count() == 1000
    assert {r["id"]: r["v"] for r in t.read().filter("v != 1").collect()} == {
        i: 101 for i in range(0, 1000, 125)
    }


def test_merge_by_keys_fused_commit_and_fence(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", [(i, 1) for i in range(100)])
    v0 = t.latest_version()
    keys = spark.createDataFrame([(7,), (50,)], "id long")
    r = t.merge_by_keys(keys, _bump(keys), txn=("app", 5))
    # ONE commit: dv growth + appended rows + fence land atomically
    assert t.latest_version() == v0 + 1 and r["version"] == v0 + 1
    assert _snap(t, v0) == {i: 1 for i in range(100)}  # old snapshot intact
    assert _snap(t)[7] == 101 and _snap(t)[50] == 101
    # replay (crash after commit, rerun) skips on the fence
    r2 = t.merge_by_keys(keys, _bump(keys), txn=("app", 5))
    assert r2.get("skipped") and t.latest_version() == v0 + 1
    assert _snap(t)[7] == 101  # the NON-idempotent delta applied once


def test_merge_by_keys_transform_sees_only_keys_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", [(i, 1) for i in range(100)], files=2)
    keys = spark.createDataFrame([(3,), (4,), (98,)], "id long")
    seen = {}

    def xform(slice_df):
        seen["ids"] = sorted(r["id"] for r in slice_df.collect())
        return slice_df.select("id", (F.col("v") + 1).alias("v"))

    t.merge_by_keys(keys, xform, txn=("app", 1))
    assert seen["ids"] == [3, 4, 98]
    assert _snap(t) == {i: (2 if i in (3, 4, 98) else 1) for i in range(100)}


def test_merge_by_keys_null_key_and_new_key(spark, tmp_path):
    rows = [(i, 1) for i in range(20)] + [(None, 1)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(2)
    t = TxTable.create(spark, tmp_path / "t", df, key="id")
    keys = spark.createDataFrame([(None,), (999,)], "id long")

    def xform(slice_df):
        # NULL group bumps; new key 999 inserts
        bumped = slice_df.select("id", (F.col("v") + 10).alias("v"))
        ins = spark.createDataFrame([(999, 42)], "id long, v long")
        return bumped.unionByName(ins)

    t.merge_by_keys(keys, xform, txn=("app", 1))
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[None] == 11 and got[999] == 42 and got[5] == 1
    assert t.row_count() == 22


def test_merge_by_keys_dense_fold_in_same_commit(spark, tmp_path):
    # every row of the single file churns: the dv reaches 100% of the
    # file and _fold_dense_dvs drops it INSIDE the same commit
    df = spark.createDataFrame([(i, 1) for i in range(50)], "id long, v long")
    t = TxTable.create(spark, tmp_path / "t", df.coalesce(1), key="id")
    keys = t.read().select("id")
    r = t.merge_by_keys(keys, _bump(keys), txn=("app", 1))
    assert r["files_folded"] >= 1
    m = t._manifest()
    assert not any("dv" in f for f in m["files"])
    assert t.row_count() == 50 and _snap(t)[0] == 101


def test_merge_by_keys_requires_key(spark, tmp_path):
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    t = TxTable.create(spark, tmp_path / "t", df)  # no key
    with pytest.raises(txt.TxError, match="merge_by_keys"):
        t.merge_by_keys(df.select("id"), lambda d: d)


def test_dv_distributed_merge_matches_driver_loop(spark, tmp_path, monkeypatch):
    """The bounded-driver fallback (> DV_DRIVER_MERGE_MAX touched
    files): same visible state, same per-file vector row counts as the
    driver loop, including old-vector folding on a second delete."""
    rows = [(i, f"v{i}") for i in range(400)]

    def build(root):
        df = spark.createDataFrame(rows, "id long, v string").repartition(8)
        return TxTable.create(spark, root, df, key="id")

    a = build(tmp_path / "driver")
    b = build(tmp_path / "dist")
    monkeypatch.setattr(txt, "DV_DRIVER_MERGE_MAX", 10**9)
    a.delete(F.col("id") % 10 == 0, mode="dv")
    a.delete(F.col("id") % 10 == 1, mode="dv")  # old-vector merge path
    monkeypatch.setattr(txt, "DV_DRIVER_MERGE_MAX", 0)
    b.delete(F.col("id") % 10 == 0, mode="dv")
    b.delete(F.col("id") % 10 == 1, mode="dv")
    assert a.row_count() == b.row_count() == 320
    assert {r["id"] for r in a.read().collect()} == {
        r["id"] for r in b.read().collect()
    }
    dv_a = sorted(
        f["dv"]["rows"] for f in a._manifest()["files"] if "dv" in f
    )
    dv_b = sorted(
        f["dv"]["rows"] for f in b._manifest()["files"] if "dv" in f
    )
    assert dv_a == dv_b and sum(dv_a) == 80
