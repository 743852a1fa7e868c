"""scd2_apply_changes: a Type-2 history table maintained from the
change feed (the APPLY CHANGES / DLT-SCD2 shape). Oracle: for EVERY
base version v, the rows valid at v reproduce source.read(version=v)
exactly — the history table is a self-contained time-travel index."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.streaming.txfeed import scd2_apply_changes

APP = "scd2"


def _churny(spark, root):
    t = TxTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, f"v{i}", i * 10) for i in range(12)],
            "id long, v string, amt long",
        ),
        key="id",
    )
    t.append(spark.createDataFrame(
        [(100, "new", 0), (101, "new", 1)], "id long, v string, amt long"))
    t.merge(spark.createDataFrame(
        [(3, "M3", 333), (200, "M", 2)], "id long, v string, amt long"))
    t.delete(F.col("id") % 7 == 1)            # cow: ids 1, 8, signal 99?
    t.delete(F.col("id") == 4, mode="dv")     # deletion vector
    t.compact(target_files=2)                 # no logical change
    t.merge(spark.createDataFrame(
        [(3, "M3b", 334), (100, "upd", 9)], "id long, v string, amt long"))
    t.append(spark.createDataFrame(
        [(1, "reborn", 7)], "id long, v string, amt long"))  # key resurrection
    return t


def _bag(df, cols):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def _asof_invariant(spark, src, hist, cols):
    for v in range(src.latest_version() + 1):
        valid = hist.read().filter(
            (F.col("_scd_start_v") <= v)
            & (F.col("_scd_end_v").isNull() | (F.col("_scd_end_v") > v))
        )
        assert _bag(valid, cols) == _bag(src.read(version=v), cols), (
            f"history != source at base version {v}"
        )


def test_history_reproduces_every_base_version(spark, tmp_path):
    src = _churny(spark, tmp_path / "src")
    r = scd2_apply_changes(spark, str(src.root), str(tmp_path / "hist"), APP)
    assert r["batches"] >= 1 and r["pending"] == 0
    hist = TxTable(spark, tmp_path / "hist")
    cols = ["id", "v", "amt"]
    _asof_invariant(spark, src, hist, cols)

    h = hist.read()
    # at most one CURRENT row per key, and the current slice == snapshot
    cur = h.filter(F.col("_scd_end_v").isNull())
    assert cur.groupBy("id").count().filter("count > 1").count() == 0
    assert _bag(cur, cols) == _bag(src.read(), cols)
    # intervals are well-formed and attributed: key 3 has three
    # versions (create, M3, M3b), each closed by the next's start
    k3 = sorted(
        (r["_scd_start_v"], r["_scd_end_v"], r["v"])
        for r in h.filter(F.col("id") == 3).collect()
    )
    assert [x[2] for x in k3] == ["v3", "M3", "M3b"]
    assert k3[0][1] == k3[1][0] and k3[1][1] == k3[2][0]
    assert k3[2][1] is None
    # the resurrected key 1 has a gap: closed by the cow delete, new
    # interval born at the final append
    k1 = sorted(
        (r["_scd_start_v"], r["_scd_end_v"]) for r in
        h.filter(F.col("id") == 1).collect()
    )
    assert len(k1) == 2 and k1[0][1] is not None and k1[0][1] < k1[1][0]
    assert k1[1][1] is None
    # no timestamp sentinel anywhere: open ends are SQL NULL
    assert h.filter(F.col("_scd_end_ts") > F.lit("9000-01-01")).count() == 0


def test_rate_limited_batches_land_identical_history(spark, tmp_path):
    src = _churny(spark, tmp_path / "src")
    scd2_apply_changes(spark, str(src.root), str(tmp_path / "one"), APP)
    r = scd2_apply_changes(
        spark, str(src.root), str(tmp_path / "drip"), APP,
        max_versions_per_batch=1,
    )
    assert r["batches"] > 1
    one = TxTable(spark, tmp_path / "one").read()
    drip = TxTable(spark, tmp_path / "drip").read()
    cols = one.columns
    # version coordinates AND payloads identical batch-size-independent
    assert _bag(one, cols) == _bag(drip, cols)


def test_crash_resume_and_replay_are_exactly_once(spark, tmp_path):
    src = _churny(spark, tmp_path / "src")
    hroot = str(tmp_path / "hist")
    r1 = scd2_apply_changes(
        spark, str(src.root), hroot, APP,
        max_versions_per_batch=2, max_batches=1,
    )
    assert r1["pending"] > 0  # mid-stream "crash"
    r2 = scd2_apply_changes(spark, str(src.root), hroot, APP,
                            max_versions_per_batch=2)
    assert r2["pending"] == 0
    hist = TxTable(spark, tmp_path / "hist")
    _asof_invariant(spark, src, hist, ["id", "v", "amt"])
    v_done = hist.latest_version()
    # replay with nothing pending: fenced no-op
    r3 = scd2_apply_changes(spark, str(src.root), hroot, APP)
    assert hist.latest_version() == v_done
    # new source churn resumes incrementally
    src.merge(spark.createDataFrame(
        [(5, "late", 555)], "id long, v string, amt long"))
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    _asof_invariant(spark, src, hist, ["id", "v", "amt"])


def test_requires_keyed_source(spark, tmp_path):
    t = TxTable.create(
        spark, tmp_path / "nk",
        spark.createDataFrame([(1,)], "a long"),
    )
    with pytest.raises(Exception, match="key"):
        scd2_apply_changes(spark, str(t.root), str(tmp_path / "h"), APP)


def test_randomized_oplog_history_matches_every_version(spark, tmp_path):
    """Randomized op sequence (appends of new keys, merge updates,
    cow + dv deletes, compaction), refreshed every few commits so
    multi-version batches are the norm — the as-of invariant must hold
    at every base version regardless of the op interleaving."""
    import random

    rng = random.Random(47)
    src = TxTable.create(
        spark, tmp_path / "src",
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(15)], "id long, v string"),
        key="id",
    )
    hroot = str(tmp_path / "hist")
    live = set(range(15))
    next_id = 100
    for step in range(10):
        op = rng.choice(["append", "update", "del", "del_dv", "compact"])
        if op == "append":
            n = rng.randint(1, 3)
            rows = [(next_id + i, f"n{step}") for i in range(n)]
            live |= {next_id + i for i in range(n)}
            next_id += n
            src.append(spark.createDataFrame(rows, "id long, v string"))
        elif op == "update" and live:
            ks = rng.sample(sorted(live), min(2, len(live)))
            src.merge(spark.createDataFrame(
                [(k, f"u{step}") for k in ks], "id long, v string"))
        elif op == "del" and live:
            k = rng.choice(sorted(live))
            src.delete(F.col("id") == k)
            live.discard(k)
        elif op == "del_dv" and live:
            k = rng.choice(sorted(live))
            src.delete(F.col("id") == k, mode="dv")
            live.discard(k)
        else:
            src.compact(target_files=2)
        if step % 3 == 2:
            scd2_apply_changes(spark, str(src.root), hroot, APP,
                               max_versions_per_batch=rng.choice([1, 2, None]))
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    hist = TxTable(spark, tmp_path / "hist")
    _asof_invariant(spark, src, hist, ["id", "v"])
    cur = hist.read().filter(F.col("_scd_end_v").isNull())
    assert cur.groupBy("id").count().filter("count > 1").count() == 0


def test_duplicate_key_appends_stay_parallel_current(spark, tmp_path):
    # r10 ADVICE pin: two inserts for one key with NO close between
    # must leave BOTH rows current ("parallel current rows", mirroring
    # the duplicate the base itself carries) — an open is only ever
    # closed by the key's next CLOSE event, never by a later open.
    src = TxTable.create(
        spark, tmp_path / "src",
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        key="id",
    )
    src.append(spark.createDataFrame([(1, "a2")], "id long, v string"))
    hroot = str(tmp_path / "hist")
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    hist = TxTable(spark, tmp_path / "hist")
    cur = hist.read().filter(F.col("_scd_end_v").isNull())
    assert _bag(cur, ["id", "v"]) == Counter(
        {(1, "a"): 1, (1, "a2"): 1, (2, "b"): 1}
    )
    _asof_invariant(spark, src, hist, ["id", "v"])
    # a delete of the key then closes BOTH parallel rows at its version
    src.delete(F.col("id") == 1)
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    hist = TxTable(spark, tmp_path / "hist")
    k1 = hist.read().filter(F.col("id") == 1)
    assert k1.filter(F.col("_scd_end_v").isNull()).count() == 0
    assert {r["_scd_end_v"] for r in k1.collect()} == {2}
    _asof_invariant(spark, src, hist, ["id", "v"])


def test_duplicate_key_append_split_across_batches(spark, tmp_path):
    # same shape but the duplicate insert arrives in a LATER batch than
    # the first: the sink's existing current row must survive (only
    # close events expire history rows across batch boundaries)
    src = TxTable.create(
        spark, tmp_path / "src",
        spark.createDataFrame([(1, "a")], "id long, v string"),
        key="id",
    )
    hroot = str(tmp_path / "hist")
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    src.append(spark.createDataFrame([(1, "a2")], "id long, v string"))
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    hist = TxTable(spark, tmp_path / "hist")
    cur = hist.read().filter(F.col("_scd_end_v").isNull())
    assert _bag(cur, ["id", "v"]) == Counter({(1, "a"): 1, (1, "a2"): 1})
    _asof_invariant(spark, src, hist, ["id", "v"])


def test_duplicate_key_partial_delete_closes_one_copy(spark, tmp_path):
    # r11 (review finding): with two parallel current rows for one key,
    # a delete matching only ONE copy (distinguishable by a non-key
    # column) must close exactly that copy — closes pair with opens on
    # the full row tuple, not the key alone.
    src = TxTable.create(
        spark, tmp_path / "src",
        spark.createDataFrame([(1, "a")], "id long, v string"),
        key="id",
    )
    src.append(spark.createDataFrame([(1, "a2")], "id long, v string"))
    src.delete((F.col("id") == 1) & (F.col("v") == "a"), mode="dv")
    hroot = str(tmp_path / "hist")
    scd2_apply_changes(spark, str(src.root), hroot, APP)
    hist = TxTable(spark, tmp_path / "hist")
    rows = {(r["v"], r["_scd_end_v"]) for r in hist.read().collect()}
    assert rows == {("a", 2), ("a2", None)}
    _asof_invariant(spark, src, hist, ["id", "v"])

    # the same shape split ACROSS batches: the sink's parallel current
    # rows must also pair per-tuple, not per-key
    src2 = TxTable.create(
        spark, tmp_path / "src2",
        spark.createDataFrame([(1, "a")], "id long, v string"),
        key="id",
    )
    src2.append(spark.createDataFrame([(1, "a2")], "id long, v string"))
    h2 = str(tmp_path / "hist2")
    scd2_apply_changes(spark, str(src2.root), h2, APP)
    src2.delete((F.col("id") == 1) & (F.col("v") == "a2"))
    scd2_apply_changes(spark, str(src2.root), h2, APP)
    hist2 = TxTable(spark, tmp_path / "hist2")
    rows2 = {(r["v"], r["_scd_end_v"]) for r in hist2.read().collect()}
    assert rows2 == {("a", None), ("a2", 2)}
    _asof_invariant(spark, src2, hist2, ["id", "v"])
