"""Transactional parquet table (sources/txtable.py): commit-log ACID
semantics the reference gets from Postgres transactions — atomic
commits, snapshot isolation, time travel, optimistic concurrency,
file-level copy-on-write MERGE/DELETE/UPDATE with footer-stats pruning,
vacuum. The model-based Hypothesis sweep drives random op sequences
against a plain-Python dict model."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import (
    TxConflictError,
    TxError,
    TxTable,
    TxVacuumedError,
)


def _mk(spark, tmp_path, rows, key="id", name="t"):
    df = spark.createDataFrame(rows, "id long, v string")
    return TxTable.create(spark, tmp_path / name, df, key=key)


def _snap(t, version=None):
    return {r["id"]: r["v"] for r in t.read(version).collect()}


# ------------------------------------------------------------ basics


def test_create_read_append_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    assert _snap(t) == {1: "a", 2: "b"}
    assert t.row_count() == 2
    r = t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert r["version"] == 1 and r["rows_appended"] == 1
    assert _snap(t) == {1: "a", 2: "b", 3: "c"}
    # time travel: v0 unchanged; fresh handle sees the same log
    assert _snap(t, 0) == {1: "a", 2: "b"}
    t2 = TxTable(spark, t.root)
    assert t2.latest_version() == 1 and _snap(t2) == _snap(t)
    ops = [h["op"] for h in t.history()]
    assert ops == ["create", "append"]
    # row_count is manifest metadata — exact at every version
    assert t.row_count(0) == 2 and t.row_count(1) == 3


def test_append_schema_mismatch_and_empty_batch(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(TxError, match="schema mismatch"):
        t.append(spark.createDataFrame([(1, 2)], "id long, v long"))
    r = t.append(spark.createDataFrame([], "id long, v string"))
    assert r["rows_appended"] == 0
    assert t.latest_version() == 0  # empty append is commit-free


def test_overwrite_and_schema_change(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.overwrite(spark.createDataFrame([(9, "z", 1.5)], "id long, v string, w double"))
    assert [r for r in t.read().collect()] == [Row(id=9, v="z", w=1.5)]
    assert _snap(t, 0) == {1: "a"}  # old version still reads old schema
    with pytest.raises(TxError, match="not in dataframe"):
        t.overwrite(spark.createDataFrame([("x",)], "v string"), key="id")


def test_not_a_table_and_double_create(spark, tmp_path):
    with pytest.raises(TxError, match="not a transactional table"):
        TxTable(spark, tmp_path / "nope")
    t = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(TxError, match="already"):
        TxTable.create(spark, t.root, t.read(), key="id")


# ------------------------------------------------------------- merge


def test_merge_upsert_and_metrics(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    src = spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string")
    r = t.merge(src)
    assert _snap(t) == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert r["rows_delta"] == 1 and r["version"] == 1
    # matched-delete mode
    t.merge(
        spark.createDataFrame([(1, "x")], "id long, v string"),
        when_matched="delete",
        when_not_matched=None,
    )
    assert _snap(t) == {2: "B", 3: "c", 4: "d"}
    # conditional update: only rows whose value actually changed
    r = t.merge(
        spark.createDataFrame([(2, "B"), (3, "C")], "id long, v string"),
        matched_condition=F.col("s.v") != F.col("t.v"),
    )
    assert _snap(t) == {2: "B", 3: "C", 4: "d"}


def test_merge_source_contract(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "id long, v string")
    with pytest.raises(Exception, match="duplicate keys"):
        t.merge(dup)
    nul = spark.createDataFrame([(None, "x")], "id long, v string")
    with pytest.raises(Exception, match="NULL key"):
        t.merge(nul)
    with pytest.raises(TxError, match="columns"):
        t.merge(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(TxError, match="dtype mismatch"):
        t.merge(spark.createDataFrame([(1, "x")], "id int, v string"))
    nokey = TxTable.create(
        spark, tmp_path / "nk", spark.createDataFrame([(1, "a")], "id long, v string")
    )
    with pytest.raises(TxError, match="requires a table created with key"):
        nokey.merge(spark.createDataFrame([(1, "b")], "id long, v string"))


def test_merge_prunes_untouched_files(spark, tmp_path):
    """Copy-on-write pruning is observable in the manifest: two appends
    with disjoint key ranges land in different files; a merge touching
    only the low range must carry the high-range file over BY PATH."""
    t = _mk(spark, tmp_path, [(i, "lo") for i in range(100)])
    t.append(
        spark.createDataFrame(
            [(i, "hi") for i in range(1000, 1100)], "id long, v string"
        )
    )
    files = t._manifest()["files"]
    expect_touched = {
        f["path"] for f in files if f["kmin"] <= 5 <= f["kmax"]
        or f["kmin"] <= 6 <= f["kmax"]
    }
    expect_kept = {f["path"] for f in files} - expect_touched
    assert expect_touched and expect_kept
    r = t.merge(spark.createDataFrame([(5, "LO"), (6, "LO")], "id long, v string"))
    after = {f["path"] for f in t._manifest()["files"]}
    assert expect_kept <= after, "range-excluded files must survive as-is"
    assert not (expect_touched & after), "touched files must be rewritten"
    assert r["files_rewritten"] == len(expect_touched)
    got = _snap(t)
    assert got[5] == "LO" and got[6] == "LO" and got[50] == "lo" and got[1050] == "hi"


def test_merge_string_key_no_stats_still_correct(spark, tmp_path):
    """String keys carry no footer stats (truncation hazard) — pruning
    degrades to rewrite-everything but semantics are unchanged."""
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long")
    t = TxTable.create(spark, tmp_path / "s", df, key="k")
    assert all("kmin" not in f for f in t._manifest()["files"])
    t.merge(spark.createDataFrame([("b", 20), ("c", 3)], "k string, n long"))
    assert {r["k"]: r["n"] for r in t.read().collect()} == {"a": 1, "b": 20, "c": 3}


# ---------------------------------------------------- delete / update


def test_delete_and_update_touch_only_matching_files(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, "lo") for i in range(50)])
    t.append(
        spark.createDataFrame(
            [(i, "hi") for i in range(1000, 1050)], "id long, v string"
        )
    )
    hi_files = {f["path"] for f in t._manifest()["files"] if f.get("kmin", 0) >= 1000}
    r = t.delete(F.col("id") < 10)
    assert r["rows_deleted"] == 10 and r["files_rewritten"] >= 1
    assert hi_files <= {f["path"] for f in t._manifest()["files"]}
    assert t.row_count() == 90
    r = t.delete(F.col("id") < 0)  # no matches → no commit
    assert r["files_rewritten"] == 0 and t.latest_version() == 2
    lo_files = {f["path"] for f in t._manifest()["files"]} - hi_files
    t.update(F.col("id") == 1000, {"v": F.upper("v")})
    got = _snap(t)
    assert got[1000] == "HI" and got[1001] == "hi" and got[10] == "lo"
    # this time the LOW files were the untouched ones
    assert lo_files <= {f["path"] for f in t._manifest()["files"]}
    with pytest.raises(TxError, match="unknown column"):
        t.update(F.lit(True), {"zz": F.lit(1)})


# ------------------------------------------- concurrency + crash holes


def test_optimistic_conflict_and_append_retry(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    h2 = TxTable(spark, t.root)
    # writer 2 sneaks a commit in between writer 1's snapshot and commit
    m = t._manifest()
    h2.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    with pytest.raises(TxConflictError, match="re-run"):
        t._commit(m["version"] + 1, "merge", m["files"], m["schema"], m["key"])
    # the table is untouched by the failed attempt
    assert _snap(t) == {1: "a", 2: "b"}
    # appends auto-retry onto the next version: interleave two handles
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    h2.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    assert _snap(t) == {1: "a", 2: "b", 3: "c", 4: "d"}
    assert [h["op"] for h in t.history()] == ["create"] + ["append"] * 3


def test_crash_leftovers_are_invisible_and_vacuumable(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    # orphan data file (writer died before commit), dangling tmp
    # manifest, stale staging dir — all invisible to readers
    orphan = t.data_dir / "deadbeef.parquet"
    t.read().write.mode("overwrite").parquet(str(tmp_path / "x"))
    src = next(p for p in (tmp_path / "x").iterdir() if p.suffix == ".parquet")
    os.replace(src, orphan)
    (t.log_dir / ".tmp-dead.json").write_text("{}")
    (t.root / "_staging-dead").mkdir()
    assert _snap(t) == {1: "a"}
    r = t.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    assert r["dropped_files"] == 1
    assert not orphan.exists() and not (t.root / "_staging-dead").exists()
    assert _snap(t) == {1: "a"}


def test_vacuum_retention_and_time_travel_horizon(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    t.overwrite(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert _snap(t, 0) == {1: "a"}
    r = t.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    assert r["dropped_manifests"] == 2 and r["dropped_files"] == 2
    assert _snap(t) == {3: "c"}
    with pytest.raises(TxVacuumedError):
        t.read(0)
    with pytest.raises(TxError, match="retain_versions"):
        t.vacuum(retain_versions=0)


def test_compact_defragments(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    for i in range(2, 8):
        t.append(spark.createDataFrame([(i, "x")], "id long, v string"))
    assert len(t._manifest()["files"]) >= 7
    t.compact(target_files=2)
    assert len(t._manifest()["files"]) <= 2
    assert t.row_count() == 7 and len(_snap(t)) == 7


def test_manifest_records_footer_key_stats(spark, tmp_path):
    t = _mk(spark, tmp_path, [(5, "a"), (17, "b")])
    # the on-disk manifest is plain JSON — readable by any tool
    m = json.loads((t.log_dir / sorted(
        p.name for p in t.log_dir.iterdir())[-1]).read_text())
    assert min(f["kmin"] for f in m["files"]) == 5
    assert max(f["kmax"] for f in m["files"]) == 17
    assert sum(f["rows"] for f in m["files"]) == 2
    assert m["key"] == "id" and m["op"] == "create"


# ------------------------------------------------- SCD1 equivalence


def test_merge_is_scd1_maintenance(spark, tmp_path):
    """MERGE(update+insert) folded over batches IS SCD1 update-in-place
    maintenance (operators/scd.py's semantics minus audit columns):
    last write per key wins, absent keys survive, new keys appear."""
    dims = "id long, city string, tier string"
    t = TxTable.create(
        spark,
        tmp_path / "dim",
        spark.createDataFrame(
            [(1, "Rome", "gold"), (2, "Oslo", "base"), (3, "Lima", "base")], dims
        ),
        key="id",
    )
    batches = [
        [(2, "Oslo", "gold"), (4, "Kyiv", "base")],
        [(1, "Roma", "gold"), (4, "Kyiv", "gold"), (5, "Pune", "base")],
    ]
    model = {1: ("Rome", "gold"), 2: ("Oslo", "base"), 3: ("Lima", "base")}
    for b in batches:
        t.merge(spark.createDataFrame(b, dims))
        model.update({k: (c, g) for k, c, g in b})
    got = {r["id"]: (r["city"], r["tier"]) for r in t.read().collect()}
    assert got == model


# --------------------------------------------- model-based hypothesis


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    init=st.dictionaries(st.integers(0, 30), st.integers(0, 99), max_size=12),
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("merge"),
                st.dictionaries(
                    st.integers(0, 30), st.integers(0, 99), min_size=1, max_size=6
                ),
            ),
            st.tuples(st.just("delete_lt"), st.integers(0, 31)),
            st.tuples(st.just("append_shifted"), st.integers(100, 130)),
            st.tuples(
                st.just("delete_dv_mod"), st.integers(2, 7), st.integers(0, 6)
            ),
        ),
        max_size=5,
    ),
)
def test_hypothesis_oplog_matches_dict_model(spark, tmp_path_factory, init, ops):
    """Random op sequences vs a plain-dict model, checked after EVERY
    commit, plus a final time-travel replay of every retained version
    and the change-feed replay invariant over the whole history."""
    root = tmp_path_factory.mktemp("tx")
    df = spark.createDataFrame(
        [(k, v) for k, v in init.items()], "id long, n long"
    )
    t = TxTable.create(spark, root / "t", df, key="id")
    model = dict(init)
    snaps = {0: dict(model)}
    for op in ops:
        if op[0] == "merge":
            t.merge(
                spark.createDataFrame(
                    [(k, v) for k, v in op[1].items()], "id long, n long"
                )
            )
            model.update(op[1])
        elif op[0] == "delete_lt":
            t.delete(F.col("id") < op[1])
            model = {k: v for k, v in model.items() if k >= op[1]}
        elif op[0] == "delete_dv_mod":
            mod, rem = op[1], op[2]
            before = t.latest_version()
            t.delete(F.col("id") % mod == rem, mode="dv")
            survivors = {k: v for k, v in model.items() if k % mod != rem}
            if survivors == model:
                assert t.latest_version() == before  # no-match = no commit
            model = survivors
        else:
            if op[1] in model:  # appends don't upsert — keep ids unique
                continue
            t.append(
                spark.createDataFrame([(op[1], -1)], "id long, n long")
            )
            model[op[1]] = -1
        snaps[t.latest_version()] = dict(model)
        got = {r["id"]: r["n"] for r in t.read().collect()}
        assert got == model
        assert t.row_count() == len(model)
    for v, want in snaps.items():
        got = {r["id"]: r["n"] for r in t.read(v).collect()}
        assert got == want, f"time travel to v{v}"
    # change-feed replay invariant: snapshot(-1) + full feed == latest
    from collections import Counter

    acc: Counter = Counter()
    for r in t.read_changes(0).collect():
        sign = 1 if r["_change_type"] in ("insert", "update_postimage") else -1
        acc[(r["id"], r["n"])] += sign
    assert +acc == Counter((k, v) for k, v in model.items())


# --------------------------------- SCD on a file slice (rewrite_by_keys)


def _collect_scd2(df):
    return {
        (r["id"], str(r["start_dt"])): (r["city"], str(r["end_dt"]), r["is_active"])
        for r in df.collect()
    }


def test_scd2_apply_on_touched_slice_equals_whole_table(spark, tmp_path):
    """The managed-format upgrade promised in operators/merge.py: the
    UNCHANGED pure scd2_apply runs on only the key-pruned file slice via
    rewrite_by_keys and must produce the same table as running it over
    the whole dimension — while provably not rewriting files whose key
    range excludes every update."""
    import datetime as dt

    from data_warehouse_project_spark.operators.scd import scd2_apply

    cols = "id long, city string, note string, seq long"
    t0 = dt.datetime(2024, 1, 1)
    base = spark.createDataFrame(
        [(i, f"c{i}", "init", 0) for i in range(40)]
        + [(i, f"c{i}", "init", 0) for i in range(1000, 1040)],
        cols,
    ).drop("seq")
    kw = dict(key="id", compare=["city"], attrs=["note"], change_order=["seq"])
    snapshot = scd2_apply(None, base.withColumn("seq", F.lit(0)), run_ts=t0, **kw)
    t = TxTable.create(spark, tmp_path / "d", snapshot, key="id")

    batches = [
        ([(3, "X3", "b1", 1), (1005, "Y", "b1", 1)], dt.datetime(2024, 2, 1)),
        ([(3, "X3b", "b2", 2), (7, "Z", "b2", 2), (41, "NEW", "b2", 2)],
         dt.datetime(2024, 3, 1)),
    ]
    whole = snapshot
    for rows, ts in batches:
        upd = spark.createDataFrame(rows, cols)
        whole = scd2_apply(whole, upd, run_ts=ts, **kw).localCheckpoint()
        files_before = {
            f["path"]: f for f in t._manifest()["files"] if "kmin" in f
        }
        upd_keys = [r[0] for r in rows]
        expect_kept = {
            p for p, f in files_before.items()
            if not any(f["kmin"] <= k <= f["kmax"] for k in upd_keys)
        }
        t.rewrite_by_keys(
            upd.select("id"),
            lambda cur, u=upd, ts=ts: scd2_apply(cur, u, run_ts=ts, **kw),
        )
        after = {f["path"] for f in t._manifest()["files"]}
        assert expect_kept <= after, "range-excluded files must carry over"
    assert _collect_scd2(t.read()) == _collect_scd2(whole)
    # version history invariant on the tx side: one active row per key
    active = t.read().filter(F.col("is_active") == "Y").groupBy("id").count()
    assert active.filter(F.col("count") > 1).count() == 0


def test_scd1_upsert_on_touched_slice_equals_whole_table(spark, tmp_path):
    import datetime as dt

    from data_warehouse_project_spark.operators.scd import scd1_upsert

    cols = "id long, tier string, seq long"
    t0 = dt.datetime(2024, 1, 1)
    kw = dict(key="id", tracked=["tier"], change_order=["seq"])
    b0 = spark.createDataFrame([(i, "base", 0) for i in range(30)], cols)
    whole = scd1_upsert(None, b0, run_ts=t0, **kw)
    t = TxTable.create(spark, tmp_path / "d1", whole, key="id")
    for rows, ts in [
        ([(2, "gold", 1), (31, "base", 1)], dt.datetime(2024, 2, 1)),
        ([(2, "gold", 2), (5, "gold", 2)], dt.datetime(2024, 3, 1)),  # no-op on 2
    ]:
        upd = spark.createDataFrame(rows, cols)
        whole = scd1_upsert(whole, upd, run_ts=ts, **kw).localCheckpoint()
        t.rewrite_by_keys(
            upd.select("id"),
            lambda cur, u=upd, ts=ts: scd1_upsert(cur, u, run_ts=ts, **kw),
        )
    want = {(r["id"]): (r["tier"], str(r["insert_dt"]), str(r["update_dt"]))
            for r in whole.collect()}
    got = {(r["id"]): (r["tier"], str(r["insert_dt"]), str(r["update_dt"]))
           for r in t.read().collect()}
    assert got == want
    assert t.read().count() == 31


def test_rewrite_by_keys_requires_key(spark, tmp_path):
    t = TxTable.create(
        spark, tmp_path / "nk2",
        spark.createDataFrame([(1, "a")], "id long, v string"),
    )
    with pytest.raises(TxError, match="requires a table created with key"):
        t.rewrite_by_keys(t.read().select("id"), lambda df: df)


# ------------------------------ schema evolution + CHECK constraints


def test_merge_schema_append_widens_nullable(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(TxError, match="schema mismatch"):
        t.append(spark.createDataFrame([(2, "b", 5)], "id long, v string, w long"))
    t.append(
        spark.createDataFrame([(2, "b", 5)], "id long, v string, w long"),
        merge_schema=True,
    )
    got = {r["id"]: (r["v"], r["w"]) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 5)}  # old file reads NULL w
    # plain appends must now carry the widened schema
    t.append(spark.createDataFrame([(3, "c", None)], "id long, v string, w long"))
    assert t.row_count() == 3
    # time travel to v0 keeps the narrow schema
    assert t.read(0).columns == ["id", "v"]
    # type change and column drop both refuse
    with pytest.raises(TxError, match="cannot change column"):
        t.append(
            spark.createDataFrame([(4, "d", "x")], "id long, v string, w string"),
            merge_schema=True,
        )
    with pytest.raises(TxError, match="every existing column"):
        t.append(spark.createDataFrame([(4, "d")], "id long, v string"),
                 merge_schema=True)


def test_check_constraints_enforced_in_plan(spark, tmp_path):
    from data_warehouse_project_spark.sources.txtable import TxTable as TT

    t = TT.create(
        spark, tmp_path / "c",
        spark.createDataFrame([(1, 10)], "id long, v long"),
        key="id", checks={"v_pos": "v > 0"},
    )
    # violating create refuses too
    with pytest.raises(Exception, match="v_pos"):
        TT.create(
            spark, tmp_path / "c2",
            spark.createDataFrame([(1, -1)], "id long, v long"),
            checks={"v_pos": "v > 0"},
        )
    # violating append commits NOTHING (atomic: raise inside the write)
    with pytest.raises(Exception, match="v_pos"):
        t.append(spark.createDataFrame([(2, 5), (3, -1)], "id long, v long"))
    assert t.row_count() == 1 and t.latest_version() == 0
    # NULL passes (SQL CHECK semantics); merge path enforces as well
    t.append(spark.createDataFrame([(2, None)], "id long, v long"))
    with pytest.raises(Exception, match="v_pos"):
        t.merge(spark.createDataFrame([(1, -5)], "id long, v long"))
    assert _v(t) == {1: 10, 2: None}


def _v(t):
    return {r["id"]: r["v"] for r in t.read().collect()}


def test_add_constraint_validates_existing_then_enforces(spark, tmp_path):
    from data_warehouse_project_spark.sources.txtable import TxTable as TT

    t = TT.create(
        spark, tmp_path / "ac",
        spark.createDataFrame([(1, 10), (2, -3)], "id long, v long"),
        key="id",
    )
    with pytest.raises(TxError, match="existing"):
        t.add_constraint("v_pos", "v > 0")
    t.delete(F.col("v") < 0)
    t.add_constraint("v_pos", "v > 0")
    with pytest.raises(TxError, match="already exists"):
        t.add_constraint("v_pos", "v > 0")
    with pytest.raises(Exception, match="v_pos"):
        t.append(spark.createDataFrame([(9, 0)], "id long, v long"))
    t.drop_constraint("v_pos")
    t.append(spark.createDataFrame([(9, 0)], "id long, v long"))
    assert _v(t) == {1: 10, 9: 0}
    with pytest.raises(TxError, match="no such"):
        t.drop_constraint("zzz")


def test_read_key_between_prunes_files_exactly(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, "lo") for i in range(100)])
    t.append(spark.createDataFrame(
        [(i, "hi") for i in range(1000, 1100)], "id long, v string"))
    full = t.read(key_between=(0, 2000))
    assert full.count() == 200
    pruned = t.read(key_between=(1000, 1100))
    # every high-range row survives; at least the low files are gone
    ids = {r["id"] for r in pruned.filter(F.col("id") >= 1000).collect()}
    assert ids == set(range(1000, 1100))
    n_in = len(pruned.inputFiles())
    assert n_in < len(full.inputFiles())
    # exact semantics by composing with a filter
    assert pruned.filter("id between 1000 and 1100").count() == 100
    with pytest.raises(TxError, match="requires a table"):
        TxTable.create(
            spark, tmp_path / "nk3",
            spark.createDataFrame([(1, "a")], "id long, v string"),
        ).read(key_between=(0, 1))


def test_stats_cols_data_skipping(spark, tmp_path):
    """Declared stats columns prune reads independent of the merge key
    (Delta data skipping), and the stats survive copy-on-write."""
    df = spark.createDataFrame(
        [(i, 10, "a") for i in range(100)], "id long, d long, v string"
    )
    t = TxTable.create(spark, tmp_path / "t", df, key="id", stats_cols=["d"])
    t.append(spark.createDataFrame(
        [(i, 99, "b") for i in range(100, 200)], "id long, d long, v string"))
    full = t.read()
    pruned = t.read(prune={"d": (90, 100)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert pruned.filter("d = 99").count() == 100
    # pruning on the merge key through the same surface
    assert t.read(prune={"id": (0, 50)}).filter("id <= 50").count() == 51
    # undeclared column refuses instead of silently scanning everything
    with pytest.raises(TxError, match="stats_cols"):
        t.read(prune={"v": (0, 1)})
    # copy-on-write rewrites re-record the stats on their new files
    t.merge(spark.createDataFrame([(5, 10, "A")], "id long, d long, v string"))
    m = t._manifest()
    assert all("cs" in f and "d" in f["cs"] for f in m["files"])
    assert t.read(prune={"d": (90, 100)}).filter("d = 99").count() == 100


def test_zorder_compact_skips_in_every_dimension(spark, tmp_path):
    """After OPTIMIZE ZORDER BY (x, y), narrow reads on EITHER column
    touch a fraction of the files — the multi-dimension layout win a
    single-key sort cannot give."""
    grid = spark.createDataFrame(
        [(x * 64 + y, x, y) for x in range(64) for y in range(64)],
        "id long, x long, y long",
    )
    t = TxTable.create(
        spark, tmp_path / "z", grid, key="id", stats_cols=["x", "y"]
    )
    t.compact(target_files=16, zorder=["x", "y"])
    total = len(t.read().inputFiles())
    nx = len(t.read(prune={"x": (0, 7)}).inputFiles())
    ny = len(t.read(prune={"y": (0, 7)}).inputFiles())
    assert nx <= total // 2 and ny <= total // 2
    # correctness: pruned + filter == exact slice, full grid intact
    assert t.read(prune={"x": (0, 7)}).filter("x < 8").count() == 8 * 64
    assert t.read(prune={"y": (0, 7)}).filter("y < 8").count() == 8 * 64
    assert t.read().count() == 64 * 64
    with pytest.raises(TxError, match="exclusive"):
        t.compact(cluster=True, zorder=["x"])
    with pytest.raises(TxError, match="not in table"):
        t.compact(zorder=["nope"])


def test_dv_delete_rewrites_nothing(spark, tmp_path):
    """Deletion-vector delete: same data files before and after, a
    small position sidecar per touched file, exact row accounting,
    and time travel to the pre-delete snapshot."""
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(100)])
    paths_before = sorted(f["path"] for f in t._manifest()["files"])
    r = t.delete(F.col("id") % 10 == 0, mode="dv")
    assert r["rows_deleted"] == 10 and r["files_rewritten"] == 0
    m = t._manifest()
    assert sorted(f["path"] for f in m["files"]) == paths_before
    assert any("dv" in f for f in m["files"])
    assert t.row_count() == 90 and t.read().count() == 90
    assert t.read().filter("id % 10 = 0").count() == 0
    assert t.read(0).count() == 100  # time travel past the vector
    # second dv delete merges vectors per file
    r2 = t.delete(F.col("id") % 10 == 1, mode="dv")
    assert r2["rows_deleted"] == 10
    assert t.row_count() == 80
    assert {r["id"] % 10 for r in t.read().collect()} == set(range(2, 10))
    # deleting already-deleted rows is a no-op (positions are live-only)
    r3 = t.delete(F.col("id") % 10 == 0, mode="dv")
    assert r3["rows_deleted"] == 0 and t.latest_version() == 2
    with pytest.raises(TxError, match="delete mode"):
        t.delete(F.lit(True), mode="nope")


def test_dv_interacts_with_cow_and_compact(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, "x") for i in range(50)])
    t.delete(F.col("id") < 10, mode="dv")
    # merge re-inserting a dv-deleted key: it's absent, so insert
    t.merge(spark.createDataFrame([(3, "back")], "id long, v string"))
    assert _snap(t)[3] == "back" and t.row_count() == 41
    # update on a dv-carrying file materializes the vector away
    t.update(F.col("id") == 20, {"v": F.lit("U")})
    assert _snap(t)[20] == "U"
    assert {r["id"] for r in t.read().collect()} == {3} | set(range(10, 50))
    # compact drops every remaining vector
    t.compact(target_files=2)
    assert not any("dv" in f for f in t._manifest()["files"])
    assert t.row_count() == 41
    # vacuum after compaction reaps the orphaned dv sidecars
    import os
    t.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    left = os.listdir(t.data_dir)
    assert not any(".dv." in n for n in left)


def test_dv_update_merge_on_read(spark, tmp_path):
    """update/merge in dv mode: pre-images vectored, post-images
    appended, no original data file rewritten."""
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(100)])
    orig = {f["path"] for f in t._manifest()["files"]}
    r = t.update(F.col("id") == 5, {"v": F.lit("U")}, mode="dv")
    assert r["rows_updated"] == 1 and r["files_rewritten"] == 0
    m = t._manifest()
    assert orig <= {f["path"] for f in m["files"]}  # originals all kept
    assert _snap(t)[5] == "U" and t.row_count() == 100
    # merge-on-read upsert: update one key, insert one, delete one
    r = t.merge(
        spark.createDataFrame([(7, "M"), (500, "new")], "id long, v string"),
        mode="dv",
    )
    assert r["rows_delta"] == 1 and r["files_rewritten"] == 0
    snap = _snap(t)
    assert snap[7] == "M" and snap[500] == "new" and t.row_count() == 101
    r = t.merge(
        spark.createDataFrame([(8, "x")], "id long, v string"),
        when_matched="delete", when_not_matched=None, mode="dv",
    )
    assert r["rows_delta"] == -1 and t.row_count() == 100
    assert 8 not in _snap(t)
    # fence: replayed dv merge is skipped
    t.merge(spark.createDataFrame([(9, "F")], "id long, v string"),
            txn=("app", 1), mode="dv")
    r = t.merge(spark.createDataFrame([(9, "F2")], "id long, v string"),
                txn=("app", 1), mode="dv")
    assert r.get("skipped") and _snap(t)[9] == "F"
    # compaction materializes everything; contents unchanged
    want = _snap(t)
    t.compact(target_files=2)
    assert _snap(t) == want and t.row_count() == 100
    with pytest.raises(TxError, match="merge mode"):
        t.merge(spark.createDataFrame([(1, "z")], "id long, v string"),
                mode="zzz")
    with pytest.raises(TxError, match="update mode"):
        t.update(F.lit(True), {"v": F.lit("")}, mode="zzz")


def test_dv_row_count_metadata_and_history(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, "x") for i in range(30)])
    t.delete(F.col("id") >= 20, mode="dv")
    assert t.row_count() == 20 and t.row_count(0) == 30
    hist = t.history()
    assert hist[-1]["op"] == "delete" and hist[-1]["n_rows"] == 20
    assert hist[-1]["metrics"]["dv"] is True


def test_restore_rewinds_data_not_fences(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"),
             txn=("s", 3))
    t.overwrite(spark.createDataFrame([(9, "z")], "id long, v string"))
    r = t.restore(1)
    assert r == {"version": 3, "restored_from": 1}
    assert _snap(t) == {1: "a", 2: "b"}
    assert [h["op"] for h in t.history()] == [
        "create", "append", "overwrite", "restore"]
    # delivery state survives the rewind: the fenced batch stays fenced
    assert t._manifest()["txns"] == {"s": 3}
    rr = t.append(spark.createDataFrame([(2, "b")], "id long, v string"),
                  txn=("s", 3))
    assert rr.get("skipped") is True
    # restored files survive vacuum (they are referenced by the tip)
    t.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    assert _snap(t) == {1: "a", 2: "b"}


def test_vacuum_floor_requires_force(spark, tmp_path):
    """min_age_s below the safety floor is refused without force=True:
    a concurrent writer's staged-but-uncommitted data files would be
    reaped as orphans (data loss if that writer then wins the claim)."""
    t = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(TxError, match="safety floor"):
        t.vacuum(retain_versions=1, min_age_s=0.0)
    with pytest.raises(TxError, match="safety floor"):
        t.vacuum(retain_versions=1, min_age_s=59.0)
    # the default window keeps young unreferenced files alive
    orphan = t.data_dir / "orphan.parquet"
    t.read().write.mode("overwrite").parquet(str(tmp_path / "x"))
    src = next(p for p in (tmp_path / "x").iterdir() if p.suffix == ".parquet")
    import os as _os
    _os.replace(src, orphan)
    r = t.vacuum(retain_versions=1)
    assert r["dropped_files"] == 0 and orphan.exists()
    r = t.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    assert r["dropped_files"] == 1 and not orphan.exists()


def test_dv_auto_fold_bounds_read_side(spark, tmp_path):
    """Trickle-CDC loop: repeated dv merges never let any file's
    deletion vector reach the fold threshold's worth of its rows —
    dense vectors fold into rewrites inside the same commit, without
    an explicit compact()."""
    rows = [(i, 0) for i in range(120)]
    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame(rows, "id long, n long"),
        key="id",
    )
    model = {i: 0 for i in range(120)}
    rounds = 14
    for step in range(1, rounds + 1):
        # each batch updates a clustered run of keys — the worst case
        # for per-file vector density
        lo = (step * 17) % 100
        batch = [(k, step) for k in range(lo, lo + 12)]
        t.merge(
            spark.createDataFrame(batch, "id long, n long"), mode="dv"
        )
        for k, v in batch:
            model[k] = v
        m = t._manifest()
        for f in m["files"]:
            dv = f.get("dv", {}).get("rows", 0)
            assert dv < t.dv_fold_threshold * f["rows"], (
                f"file {f['path']} dv density {dv}/{f['rows']} "
                f"escaped the fold threshold at step {step}"
            )
        got = {r["id"]: r["n"] for r in t.read().collect()}
        assert got == model, f"content diverged at step {step}"
    # at least one fold actually happened over the run
    assert any(
        h["metrics"].get("files_folded", 0) > 0 for h in t.history()
    ), "trickle loop never exercised the fold path"


def test_delete_dv_full_file_folds_away(spark, tmp_path):
    """A dv delete wiping >= threshold of a file's rows rewrites the
    file (or drops it at 100%) in the same commit — no vector lands."""
    t = _mk(spark, tmp_path, [(i, "x") for i in range(40)])
    r = t.delete(F.col("id") >= 0, mode="dv")  # 100% of every file
    assert r["rows_deleted"] == 40 and r["files_folded"] > 0
    m = t._manifest()
    assert m["files"] == [] and t.row_count() == 0
    assert t.read().count() == 0
    assert t.read(0).count() == 40  # time travel intact


def test_rewrite_by_keys_touches_null_key_file(spark, tmp_path):
    """Footer key ranges only describe non-null values; a NULL probe
    key must touch the files whose recorded null count is nonzero, or
    a key-confined transform silently misses the NULL-key rows."""
    df = spark.createDataFrame(
        [(None, "nullrow"), (1, "a"), (2, "b")],
        "id long, v string",
    ).coalesce(1)
    t = TxTable.create(spark, tmp_path / "t", df, key="id")
    t.append(
        spark.createDataFrame([(500, "z")], "id long, v string").coalesce(1)
    )
    # knulls recorded at write time
    assert any(f.get("knulls", 0) > 0 for f in t._manifest()["files"])
    keys = spark.createDataFrame([(None,)], "id long")
    r = t.rewrite_by_keys(
        keys, lambda s: s.filter(F.col("id").isNotNull())
    )
    assert r["files_rewritten"] >= 1
    got = {(r["id"], r["v"]) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b"), (500, "z")}
    # and a non-null probe still prunes: files holding only 500 stay
    # untouched when rewriting key 1
    m = t._manifest()
    touched = t._touched_by_keys(m, spark.createDataFrame([(1,)], "id long"))
    holds_500 = [
        f["path"] for f in m["files"]
        if f.get("kmin") == 500 and f.get("kmax") == 500
    ]
    assert holds_500 and not set(holds_500) & set(touched)


def test_compact_small_is_incremental(spark, tmp_path):
    """Bin-packing compaction rewrites ONLY the small/dv-carrying
    files; large clean files keep their physical identity, logical
    content and time travel are unchanged, and the change feed sees
    nothing."""
    big = spark.range(20_000).selectExpr("id", "cast(id % 7 as long) as n")
    t = TxTable.create(spark, tmp_path / "t", big.coalesce(2), key="id")
    big_paths = {f["path"] for f in t._manifest()["files"]}
    for b in range(4):  # four tiny appends -> four small file-sets
        t.append(
            spark.createDataFrame(
                [(100_000 + b * 10 + i, -1) for i in range(3)],
                "id long, n long",
            ).coalesce(1)
        )
    t.delete(F.col("id") == 100_001, mode="dv")
    before_rows = t.row_count()
    v = t.latest_version()
    r = t.compact_small(min_rows=10_000, target_files=1)
    assert r["files_rewritten"] >= 4
    m = t._manifest()
    assert big_paths <= {f["path"] for f in m["files"]}, "big files untouched"
    assert not any("dv" in f for f in m["files"]), "vectors materialized"
    small_after = [f for f in m["files"] if f["path"] not in big_paths]
    assert len(small_after) == 1, "small files packed into one"
    assert t.row_count() == before_rows
    assert t.read(v).count() == before_rows  # time travel intact
    # CDF: compaction is logically invisible
    assert t.read_changes(v + 1, v + 1).count() == 0
    # idempotent: nothing small remains (the one packed file is alone)
    assert t.compact_small(min_rows=10_000)["files_rewritten"] == 0


def test_tx_id_offset_falls_back_on_dv(spark, tmp_path):
    """The zero-job manifest-stats id offset refuses when a deletion
    vector makes footer stats inexact and falls back to the exact
    aggregate."""
    from data_warehouse_project_spark.etl.pipeline import _tx_id_offset

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, i + 500) for i in range(20)],
                              "k long, the_id long"),
        key="k",
        stats_cols=["the_id"],
    )
    assert _tx_id_offset(t, "the_id") == 520  # metadata-only path
    t.delete(F.col("the_id") == 519, mode="dv")  # dv'd maximum
    assert _tx_id_offset(t, "the_id") == 519  # exact fallback


def test_timestamp_as_of_read(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    ts0 = t._manifest(0)["ts"]
    import time as _time
    _time.sleep(1.1)  # manifest stamps have 1s resolution
    t.overwrite(spark.createDataFrame([(2, "b")], "id long, v string"))
    ts1 = t._manifest(1)["ts"]
    assert _snap(t, version=None) == {2: "b"}
    assert {r["id"] for r in t.read(as_of=ts0).collect()} == {1}
    assert {r["id"] for r in t.read(as_of=ts1).collect()} == {2}
    assert {r["id"] for r in t.read(as_of="2999-01-01T00:00:00Z").collect()} == {2}
    with pytest.raises(TxError, match="at or before"):
        t.read(as_of="1999-01-01T00:00:00Z")
    with pytest.raises(TxError, match="not both"):
        t.read(version=0, as_of=ts0)


def test_merge_schema_evolution(spark, tmp_path):
    """Delta's automatic schema evolution in MERGE: the source carries
    a new column; the table widens, unmatched rows and old files read
    it back NULL, and both write modes (COW and dv) evolve."""
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(6)])
    src = spark.createDataFrame(
        [(2, "M", 7), (100, "new", 8)], "id long, v string, extra long"
    )
    with pytest.raises(TxError, match="source columns"):
        t.merge(src)  # without opt-in, column drift still refuses
    r = t.merge(src, merge_schema=True)
    assert r["rows_delta"] == 1
    got = {x["id"]: (x["v"], x["extra"]) for x in t.read().collect()}
    assert got[2] == ("M", 7) and got[100] == ("new", 8)
    assert got[3] == ("v3", None), "unmatched rows NULL-fill the new column"
    # dv-mode merge can evolve again
    src2 = spark.createDataFrame(
        [(3, "D", 9, "x")], "id long, v string, extra long, tag string"
    )
    t.merge(src2, merge_schema=True, mode="dv")
    got = {x["id"]: (x["v"], x["extra"], x["tag"]) for x in t.read().collect()}
    assert got[3] == ("D", 9, "x") and got[2] == ("M", 7, None)
    assert got[0] == ("v0", None, None)
    # type drift on an existing column still refuses
    bad = spark.createDataFrame([(1, 1, 1, "y")],
                                "id long, v long, extra long, tag string")
    with pytest.raises(TxError, match="cannot change column"):
        t.merge(bad, merge_schema=True)
    # time travel reads the PRE-evolution schema
    assert "extra" not in t.read(0).columns
