"""Change data feed (TxTable.read_changes) and incremental aggregate
views (sources/txview.TxAggView).

The CDF is computed from manifest diffs — nothing is stored — so the
core invariant is replayability: snapshot(start-1) ⊎ inserts+postimages
∖ deletes+preimages == snapshot(end), as a multiset, for ANY op
sequence. The view tests pin incremental maintenance equal to a full
GROUP BY recompute after every refresh, including group birth/death and
crash-replay fencing."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxError, TxTable
from data_warehouse_project_spark.sources.txview import TxAggView


def _mk(spark, tmp_path, rows, name="t"):
    df = spark.createDataFrame(rows, "id long, v string")
    return TxTable.create(spark, tmp_path / name, df, key="id")


def _feed(t, lo, hi=None):
    return [
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in t.read_changes(lo, hi).collect()
    ]


def _replay(t, lo, hi, data_cols):
    """Apply the feed to snapshot(lo-1); must equal snapshot(hi)."""
    start = Counter(
        tuple(r[c] for c in data_cols)
        for r in t.read(lo - 1).collect()
    ) if lo > 0 else Counter()
    for r in t.read_changes(lo, hi).collect():
        row = tuple(r[c] for c in data_cols)
        if r["_change_type"] in ("insert", "update_postimage"):
            start[row] += 1
        else:
            start[row] -= 1
    end = Counter(tuple(r[c] for c in data_cols) for r in t.read(hi).collect())
    assert +start == end


# --------------------------------------------------------------- feed


def test_cdf_append_is_inserts_with_version(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.append(spark.createDataFrame([(2, "b"), (3, "c")], "id long, v string"))
    assert sorted(_feed(t, 0)) == [
        (1, "a", "insert", 0),
        (2, "b", "insert", 1),
        (3, "c", "insert", 1),
    ]
    # range selection: version 1 only
    assert sorted(_feed(t, 1)) == [(2, "b", "insert", 1), (3, "c", "insert", 1)]
    ts = t.read_changes(0).select("_commit_ts").first()["_commit_ts"]
    assert ts is not None


def test_cdf_merge_pairs_updates_and_skips_carried_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    t.merge(spark.createDataFrame([(2, "B"), (9, "z")], "id long, v string"))
    got = sorted(_feed(t, 1))
    # rows 1 and 3 were carried through the rewrite (or never touched)
    # and must NOT appear; id=2 is a paired update, id=9 an insert
    assert got == [
        (2, "B", "update_postimage", 1),
        (2, "b", "update_preimage", 1),
        (9, "z", "insert", 1),
    ]


def test_cdf_delete_and_update(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    t.delete(F.col("id") == 2)
    t.update(F.col("id") == 3, {"v": F.lit("C")})
    assert sorted(_feed(t, 1, 1)) == [(2, "b", "delete", 1)]
    assert sorted(_feed(t, 2, 2)) == [
        (3, "C", "update_postimage", 2),
        (3, "c", "update_preimage", 2),
    ]


def test_cdf_noop_commits_emit_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, "x") for i in range(50)])
    t.compact(target_files=2)
    t.add_constraint("pos", "id >= 0")
    assert _feed(t, 1) == []
    # an update that changes no byte also emits nothing (rows cancel)
    t.update(F.col("id") == 7, {"v": F.lit("x")})
    assert _feed(t, 1) == []


def test_cdf_overwrite_restore_surface_full_swap(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    got = sorted(_feed(t, 1, 1))
    # id=1 rewrote identically: overwrite physically swaps every file,
    # but the multiset diff cancels the identical row
    assert got == [(2, "b", "insert", 1)]
    t.restore(0)
    assert sorted(_feed(t, 2, 2)) == [(2, "b", "delete", 2)]
    _replay(t, 1, 2, ["id", "v"])


def test_cdf_duplicate_keys_degrade_to_delete_insert(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.append(spark.createDataFrame([(1, "a2")], "id long, v string"))
    # two live rows for id=1; a rewrite replacing both cannot pair
    t.rewrite_by_keys(
        spark.createDataFrame([(1,)], "id long"),
        lambda s: s.select("id", F.lit("A").alias("v")).limit(1),
    )
    types = sorted(ct for (_, _, ct, _) in _feed(t, 2, 2))
    assert types == ["delete", "delete", "insert"]
    _replay(t, 1, 2, ["id", "v"])


def test_cdf_schema_evolution_null_fills_old_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    t.append(
        spark.createDataFrame([(2, "b", 10)], "id long, v string, w long"),
        merge_schema=True,
    )
    t.delete(F.col("id") == 1)
    rows = {
        (r["id"], r["v"], r["w"], r["_change_type"])
        for r in t.read_changes(0).collect()
    }
    assert rows == {
        (1, "a", None, "insert"),
        (2, "b", 10, "insert"),
        (1, "a", None, "delete"),
    }


def test_cdf_bad_range_and_vacuumed(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(TxError, match="bad change range"):
        t.read_changes(2, 1)
    for i in range(4):
        t.append(spark.createDataFrame([(10 + i, "x")], "id long, v string"))
    t.vacuum(retain_versions=2)
    from data_warehouse_project_spark.sources.txtable import TxVacuumedError

    with pytest.raises(TxVacuumedError):
        t.read_changes(0).collect()
    assert len(_feed(t, 4)) == 1  # retained range still consumable


def test_cdf_replay_invariant_random_ops(spark, tmp_path):
    """Mixed op sequence; the feed replays every intermediate range."""
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(10)])
    t.append(spark.createDataFrame([(i, f"n{i}") for i in range(10, 15)],
                                   "id long, v string"))
    t.merge(spark.createDataFrame([(3, "M"), (20, "M")], "id long, v string"))
    t.delete(F.col("id") < 2)
    t.compact(target_files=1)
    t.update(F.col("id") % 5 == 0, {"v": F.concat(F.col("v"), F.lit("!"))})
    hi = t.latest_version()
    for lo in range(0, hi + 1):
        _replay(t, lo, hi, ["id", "v"])


def test_cdf_dv_delete_emits_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(10)])
    t.delete(F.col("id") < 3, mode="dv")
    assert sorted(_feed(t, 1, 1)) == [
        (0, "v0", "delete", 1),
        (1, "v1", "delete", 1),
        (2, "v2", "delete", 1),
    ]
    # second vector on the same file emits only the NEW positions
    t.delete(F.col("id") == 5, mode="dv")
    assert sorted(_feed(t, 2, 2)) == [(5, "v5", "delete", 2)]
    _replay(t, 1, 2, ["id", "v"])


def test_cdf_restore_across_dv_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    t.delete(F.col("id") == 1, mode="dv")
    t.restore(0)  # the vector rewinds: id=1 comes back
    assert sorted(_feed(t, 2, 2)) == [(1, "a", "insert", 2)]
    _replay(t, 1, 2, ["id", "v"])


def test_cdf_replay_invariant_with_dv_ops(spark, tmp_path):
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(20)])
    t.delete(F.col("id") % 3 == 0, mode="dv")
    t.merge(spark.createDataFrame([(3, "M"), (50, "M")], "id long, v string"))
    t.delete(F.col("id") % 5 == 1, mode="dv")
    t.update(F.col("id") == 4, {"v": F.lit("U")}, mode="dv")
    t.merge(spark.createDataFrame([(4, "M2"), (60, "M2")], "id long, v string"),
            mode="dv")
    t.compact(target_files=1)
    t.append(spark.createDataFrame([(99, "z")], "id long, v string"))
    hi = t.latest_version()
    for lo in range(0, hi + 1):
        _replay(t, lo, hi, ["id", "v"])


def test_view_absorbs_dv_deletes(spark, tmp_path):
    df = spark.range(12).select(
        "id", (F.col("id") % 3).alias("g"), (F.col("id") + 1).alias("amt")
    )
    base = TxTable.create(spark, tmp_path / "base", df, key="id")
    view = TxAggView.create(spark, tmp_path / "view", base,
                            group_col="g", measures={"total": "amt"})
    base.delete(F.col("g") == 1, mode="dv")  # whole group via vector
    base.delete(F.col("id") == 0, mode="dv")
    view.refresh()
    got = {(r["g"], r["total"], r["n_rows"]) for r in view.read().collect()}
    want = {
        (r["g"], r["total"], r["n"])
        for r in base.read().groupBy("g")
        .agg(F.sum("amt").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert view.read().filter("g = 1").count() == 0


# --------------------------------------------------------------- view


def test_view_lifecycle(spark, tmp_path):
    df = (
        spark.range(20)
        .select(
            F.col("id"),
            (F.col("id") % 4).alias("g"),
            (F.col("id") * 100).alias("amt"),
        )
    )
    base = TxTable.create(spark, tmp_path / "base", df, key="id")
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"total": "amt"},
    )

    def check():
        got = {(r["g"], r["total"], r["n_rows"]) for r in view.read().collect()}
        want = {
            (r["g"], r["total"], r["n"])
            for r in base.read()
            .groupBy("g")
            .agg(F.sum("amt").alias("total"), F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want

    check()
    # no-op refresh: base unmoved
    r = view.refresh()
    assert r["skipped"] and view.table.latest_version() == 0

    # appends touch two groups
    base.append(
        spark.createDataFrame([(100, 0, 7), (101, 1, 9)],
                              "id long, g long, amt long")
    )
    r = view.refresh()
    assert not r["skipped"] and r["groups_touched"] == 2
    check()

    # update moves a row BETWEEN groups (pre leaves g=2, post enters g=3)
    base.update(F.col("id") == 2, {"g": F.lit(3), "amt": F.lit(5)})
    view.refresh()
    check()

    # delete an entire group: its view row must disappear
    base.delete(F.col("g") == 0)
    view.refresh()
    check()
    assert view.read().filter(F.col("g") == 0).count() == 0

    # brand-new group is born
    base.append(spark.createDataFrame([(200, 9, 1)], "id long, g long, amt long"))
    view.refresh()
    check()
    assert view.applied_base_version() == base.latest_version()


def test_view_refresh_replay_is_fenced(spark, tmp_path):
    df = spark.range(10).select(
        "id", (F.col("id") % 2).alias("g"), F.lit(1).cast("long").alias("amt")
    )
    base = TxTable.create(spark, tmp_path / "base", df, key="id")
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"total": "amt"},
    )
    base.append(spark.createDataFrame([(50, 0, 1)], "id long, g long, amt long"))
    view.refresh()
    v_after = view.table.latest_version()
    total = {r["g"]: r["total"] for r in view.read().collect()}
    # crash-replay: re-apply the same delta with the same fence directly
    target = base.latest_version()
    delta = view.table.read()  # any frame with the key col works for keys=
    r = view.table.rewrite_by_keys(
        delta.select("g"), lambda s: s, txn=(TxAggView.APP, target)
    )
    assert r["skipped"]
    assert view.table.latest_version() == v_after
    assert {r["g"]: r["total"] for r in view.read().collect()} == total
    # and a second refresh() is a clean no-op
    assert view.refresh()["skipped"]


def test_view_guards(spark, tmp_path):
    df = spark.range(4).select("id", (F.col("id") % 2).alias("g"),
                               F.lit(1).cast("long").alias("amt"))
    base = TxTable.create(spark, tmp_path / "base", df, key="id")
    with pytest.raises(TxError, match="reserved"):
        TxAggView.create(spark, tmp_path / "v1", base, "g",
                         {"n_rows": "amt"})
    TxAggView.create(spark, tmp_path / "v2", base, "g", {"total": "amt"})
    with pytest.raises(TxError, match="already"):
        TxAggView.create(spark, tmp_path / "v2", base, "g", {"total": "amt"})
    with pytest.raises(TxError, match="not a TxAggView"):
        TxAggView(spark, tmp_path / "nope")


def test_cdf_dv_update_merge_pairs_like_cow(spark, tmp_path):
    """Merge-on-read UPDATE/MERGE commits label update pre/post image
    pairs exactly like the copy-on-write path (write-mode-agnostic
    change types)."""
    t = _mk(spark, tmp_path, [(i, f"v{i}") for i in range(8)])
    t.update(F.col("id") == 3, {"v": F.lit("U")}, mode="dv")
    assert sorted(_feed(t, 1, 1)) == [
        (3, "U", "update_postimage", 1),
        (3, "v3", "update_preimage", 1),
    ]
    t.merge(
        spark.createDataFrame([(4, "M"), (100, "new")], "id long, v string"),
        mode="dv",
    )
    assert sorted(_feed(t, 2, 2)) == [
        (4, "M", "update_postimage", 2),
        (4, "v4", "update_preimage", 2),
        (100, "new", "insert", 2),
    ]
    # dv-mode delete stays a plain delete (no added post-image)
    t.merge(
        spark.createDataFrame([(5, "x")], "id long, v string"),
        when_matched="delete", when_not_matched=None, mode="dv",
    )
    assert sorted(_feed(t, 3, 3)) == [(5, "v5", "delete", 3)]
    _replay(t, 1, 3, ["id", "v"])


# ----------------------------------------------------- view: semantics


def _view_equals_recompute(view, base, agg_exprs):
    got = {
        tuple(r[c] for c in view.read().columns)
        for r in view.read().collect()
    }
    want_df = base.read().groupBy(view.spec["group_col"]).agg(*agg_exprs)
    want = {tuple(r[c] for c in want_df.columns) for r in want_df.collect()}
    assert got == want, f"\nview: {sorted(got, key=str)}\noracle: {sorted(want, key=str)}"


def test_view_null_groups_and_all_null_measures(spark, tmp_path):
    """SQL NULL is one group (refresh must not duplicate its row), and
    a group whose measure values are all NULL reads back SUM=NULL (not
    0) — both pinned equal to a full recompute."""
    df = spark.createDataFrame(
        [(0, None, 10), (1, None, None), (2, 7, None), (3, 8, 5)],
        "id long, g long, amt long",
    )
    base = TxTable.create(spark, tmp_path / "base", df, key="id")
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"total": "amt"},
    )
    oracle = [F.sum("amt").alias("total"), F.count(F.lit(1)).alias("n_rows")]
    _view_equals_recompute(view, base, oracle)
    # touch the NULL group twice across two refreshes: no duplicates
    base.append(spark.createDataFrame([(10, None, 3)], "id long, g long, amt long"))
    view.refresh()
    _view_equals_recompute(view, base, oracle)
    assert view.read().filter(F.col("g").isNull()).count() == 1
    base.append(spark.createDataFrame([(11, None, None)], "id long, g long, amt long"))
    base.delete(F.col("id") == 0)  # NULL group's only non-null amt dies
    view.refresh()
    _view_equals_recompute(view, base, oracle)
    assert view.read().filter(F.col("g").isNull()).count() == 1
    # g=2's sole row has amt NULL after id=3's group-mate never existed:
    # make an all-NULL-measure group explicitly and check SUM -> NULL
    row = view.read().filter(F.col("g") == 7).collect()
    assert row and row[0]["total"] is None and row[0]["n_rows"] == 1


def test_view_avg_min_max_with_extremal_deletes(spark, tmp_path):
    """AVG derives from (sum, count); MIN/MAX survive deletes of the
    extremal row via the dirty-group repair path — all pinned equal to
    a full recompute after a randomized op-log."""
    import random

    rng = random.Random(93)
    rows = [(i, i % 5, (i * 37) % 100) for i in range(60)]
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame(rows, "id long, g long, amt long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={
            "total": ("sum", "amt"),
            "n_amt": ("count", "amt"),
            "mean": ("avg", "amt"),
            "lo": ("min", "amt"),
            "hi": ("max", "amt"),
            # r11: the exact transition-maintained distinct rides the
            # same randomized op-log (deletes of extremal rows are also
            # often last-occurrence deletes of their value)
            "uniq": ("distinct", "amt"),
        },
    )
    oracle = [
        F.sum("amt").alias("total"),
        F.count("amt").alias("n_amt"),
        F.avg("amt").alias("mean"),
        F.min("amt").alias("lo"),
        F.max("amt").alias("hi"),
        F.count_distinct(F.col("amt")).alias("uniq"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    _view_equals_recompute(view, base, oracle)
    model = {i: (i % 5, (i * 37) % 100) for i in range(60)}
    next_id = 1000
    for step in range(8):
        op = rng.choice(["del_max", "del_min", "append", "update", "del_group"])
        if op == "del_max" and model:
            # delete THE extremal row of some group (forces repair)
            g0 = rng.choice(sorted({v[0] for v in model.values()}))
            members = {k: v[1] for k, v in model.items() if v[0] == g0 and v[1] is not None}
            if members:
                victim = max(members, key=lambda k: members[k])
                base.delete(F.col("id") == victim)
                del model[victim]
        elif op == "del_min" and model:
            g0 = rng.choice(sorted({v[0] for v in model.values()}))
            members = {k: v[1] for k, v in model.items() if v[0] == g0 and v[1] is not None}
            if members:
                victim = min(members, key=lambda k: members[k])
                base.delete(F.col("id") == victim, mode="dv")
                del model[victim]
        elif op == "append":
            batch = []
            for _ in range(rng.randint(1, 4)):
                amt = rng.choice([None, rng.randint(-50, 150)])
                batch.append((next_id, rng.randint(0, 6), amt))
                model[next_id] = (batch[-1][1], amt)
                next_id += 1
            base.append(spark.createDataFrame(batch, "id long, g long, amt long"))
        elif op == "update" and model:
            victim = rng.choice(sorted(model))
            new_amt = rng.randint(-50, 150)
            base.update(F.col("id") == victim, {"amt": F.lit(new_amt).cast("long")})
            model[victim] = (model[victim][0], new_amt)
        elif op == "del_group" and model:
            g0 = rng.choice(sorted({v[0] for v in model.values()}))
            base.delete(F.col("g") == g0)
            model = {k: v for k, v in model.items() if v[0] != g0}
        view.refresh()
        _view_equals_recompute(view, base, oracle)


def test_view_minmax_new_group_born_and_pruned_in_one_range(spark, tmp_path):
    """A group NEW to the view whose refresh range both inserts and
    deletes its extremal row must repair from the base: folding the
    range's inserts alone would keep the deleted value (insert 3,
    insert 5, delete 3 folded in ONE refresh used to read back min=3).
    Same for a group whose stored extremum is NULL."""
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame([(0, 0, 1)], "id long, g long, amt long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"lo": ("min", "amt"), "hi": ("max", "amt")},
    )
    oracle = [
        F.min("amt").alias("lo"),
        F.max("amt").alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    # group 1 is born AND loses its min inside one unconsumed range
    base.append(spark.createDataFrame([(1, 1, 3)], "id long, g long, amt long"))
    base.append(spark.createDataFrame([(2, 1, 5)], "id long, g long, amt long"))
    base.delete(F.col("id") == 1)
    view.refresh()
    _view_equals_recompute(view, base, oracle)
    row = view.read().filter(F.col("g") == 1).collect()[0]
    assert row["lo"] == 5 and row["hi"] == 5
    # and the max-side twin: born, then loses its max, one refresh
    base.append(spark.createDataFrame([(3, 2, 9)], "id long, g long, amt long"))
    base.append(spark.createDataFrame([(4, 2, 7)], "id long, g long, amt long"))
    base.delete(F.col("id") == 3, mode="dv")
    view.refresh()
    _view_equals_recompute(view, base, oracle)
    row = view.read().filter(F.col("g") == 2).collect()[0]
    assert row["lo"] == 7 and row["hi"] == 7


def test_view_minmax_steady_state_never_reads_base(spark, tmp_path):
    """Insert-only churn on a MIN/MAX view must refresh WITHOUT
    touching the base table at all (the dirty-group set is empty, so
    the repair join — an O(base) scan — is skipped, keeping refresh
    O(churn + touched groups))."""
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame([(0, 0, 1)], "id long, g long, amt long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"lo": ("min", "amt"), "total": ("sum", "amt")},
    )
    base.append(spark.createDataFrame(
        [(1, 0, -4), (2, 3, 8)], "id long, g long, amt long"))

    real_read = view.base.read

    def guarded_read(*a, **kw):
        raise AssertionError(
            "steady-state refresh read the base table (repair join "
            "built with an empty dirty set)"
        )

    view.base.read = guarded_read
    try:
        r = view.refresh()
    finally:
        view.base.read = real_read
    assert r["groups_touched"] == 2
    oracle = [
        F.min("amt").alias("lo"),
        F.sum("amt").alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    _view_equals_recompute(view, base, oracle)


def test_view_equals_recompute_with_multi_commit_refresh_ranges(spark, tmp_path):
    """Randomized op-log refreshing only every few commits: every
    refresh folds a MULTI-commit range (the shape that exposed the
    new-group extremum bug) and must still equal a full recompute."""
    import random

    rng = random.Random(77)
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame([(0, 0, 10)], "id long, g long, amt long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"lo": ("min", "amt"), "hi": ("max", "amt"),
                  "total": ("sum", "amt")},
    )
    oracle = [
        F.min("amt").alias("lo"),
        F.max("amt").alias("hi"),
        F.sum("amt").alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    model = {0: (0, 10)}
    next_id = 100
    ops_since_refresh = 0
    for step in range(12):
        op = rng.choice(["append_new_group", "append", "del_extreme", "del_row"])
        if op == "append_new_group":
            g0 = 50 + step  # a group the view has never seen
            rows = [(next_id + i, g0, rng.randint(-20, 20)) for i in range(3)]
            for r in rows:
                model[r[0]] = (r[1], r[2])
            next_id += 3
            base.append(spark.createDataFrame(rows, "id long, g long, amt long"))
        elif op == "append":
            rows = [(next_id, rng.randint(0, 3), rng.randint(-20, 20))]
            model[next_id] = (rows[0][1], rows[0][2])
            next_id += 1
            base.append(spark.createDataFrame(rows, "id long, g long, amt long"))
        elif op == "del_extreme" and model:
            g0 = rng.choice(sorted({v[0] for v in model.values()}))
            members = {k: v[1] for k, v in model.items() if v[0] == g0}
            victim = (max if rng.random() < 0.5 else min)(
                members, key=lambda k: members[k]
            )
            base.delete(F.col("id") == victim,
                        mode=rng.choice(["rewrite", "dv"]))
            del model[victim]
        elif op == "del_row" and model:
            victim = rng.choice(sorted(model))
            base.delete(F.col("id") == victim)
            del model[victim]
        ops_since_refresh += 1
        if ops_since_refresh >= rng.randint(2, 3):
            view.refresh()
            _view_equals_recompute(view, base, oracle)
            ops_since_refresh = 0
    view.refresh()
    _view_equals_recompute(view, base, oracle)


def test_view_auto_mode_picks_the_measured_side(spark, tmp_path, monkeypatch):
    """refresh(mode='auto') chooses from manifest metadata alone:
    recompute below the measured row-count crossover (or when churn is
    a large base fraction), incremental above it — and both paths land
    the identical, fenced view state."""
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame(
            [(i, i % 4, i * 3) for i in range(40)], "id long, g long, amt long"
        ),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"total": ("sum", "amt"), "lo": ("min", "amt")},
    )
    oracle = [
        F.sum("amt").alias("total"),
        F.min("amt").alias("lo"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    # below the ~10M floor: auto -> recompute (an 'overwrite' commit)
    base.append(spark.createDataFrame([(100, 1, 7)], "id long, g long, amt long"))
    r = view.refresh(mode="auto")
    assert r["mode"] == "recompute"
    assert view.table.history()[-1]["op"] == "overwrite"
    _view_equals_recompute(view, base, oracle)
    # replay fence: same base version -> skip, either mode
    assert view.refresh(mode="auto")["skipped"]

    # force the crossover the other way: tiny floor, huge churn bar
    monkeypatch.setattr(TxAggView, "RECOMPUTE_FLOOR_ROWS", 1)
    monkeypatch.setattr(TxAggView, "RECOMPUTE_CHURN_FRACTION", 1000.0)
    base.append(spark.createDataFrame([(101, 2, -9)], "id long, g long, amt long"))
    r = view.refresh(mode="auto")
    assert r["mode"] == "incremental" and r["groups_touched"] == 1
    assert view.table.history()[-1]["op"] == "rewrite"
    _view_equals_recompute(view, base, oracle)

    # churn dominating the base flips auto back to recompute even
    # above the row floor
    monkeypatch.setattr(TxAggView, "RECOMPUTE_CHURN_FRACTION", 0.0)
    base.append(spark.createDataFrame([(102, 3, 5)], "id long, g long, amt long"))
    r = view.refresh(mode="auto")
    assert r["mode"] == "recompute"
    _view_equals_recompute(view, base, oracle)
    with pytest.raises(TxError, match="refresh mode"):
        view.refresh(mode="bogus")


def test_view_approx_distinct_small_cardinality_is_exact(spark, tmp_path):
    """APPROX_DISTINCT via HLL sketches: at small per-group cardinality
    the DataSketches HLL is exact (LIST/SET promotion modes), so every
    maintenance path — insert fold (union), duplicate re-inserts,
    delete repair (cow AND dv), NULL values, NULL group, group born
    and killed — pins EXACTLY to COUNT(DISTINCT) of a recompute."""
    rows = [(i, i % 3, (i * 7) % 11) for i in range(30)] + [
        (100, None, 5),     # NULL group
        (101, 9, None),     # all-NULL-value group -> nd = 0
        (102, 9, None),
    ]
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame(rows, "id long, g long, v long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"nd": ("approx_distinct", "v"), "n_v": ("count", "v")},
    )
    oracle = [
        F.countDistinct("v").alias("nd"),
        F.count("v").alias("n_v"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    _view_equals_recompute(view, base, oracle)

    # insert fold: duplicates must not inflate the distinct count
    base.append(spark.createDataFrame(
        [(200, 0, 0), (201, 0, 0), (202, 0, 999), (203, None, 5)],
        "id long, g long, v long"))
    view.refresh()
    _view_equals_recompute(view, base, oracle)

    # deletes dirty the group -> base repair (both delete mechanisms);
    # the duplicate value 0 must SURVIVE one copy's deletion
    base.delete(F.col("id") == 200)               # copy-on-write
    base.delete(F.col("id") == 202, mode="dv")    # deletion vector
    view.refresh()
    _view_equals_recompute(view, base, oracle)

    # group killed entirely leaves the view; born-and-churned in one
    # multi-commit range folds correctly
    base.delete(F.col("g") == 1)
    base.append(spark.createDataFrame(
        [(300, 50, 1), (301, 50, 1), (302, 50, 2)], "id long, g long, v long"))
    base.delete(F.col("id") == 301)
    view.refresh()  # one range: delete + births + delete
    _view_equals_recompute(view, base, oracle)


def test_view_approx_distinct_insert_only_never_reads_base(spark, tmp_path):
    """Append-only churn on an APPROX_DISTINCT view folds sketches
    without touching the base (deletes are what dirty a group), so the
    common fact workload keeps the O(churn) refresh shape."""
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame([(0, 0, 1)], "id long, g long, v long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"nd": ("approx_distinct", "v")},
    )
    base.append(spark.createDataFrame(
        [(1, 0, 1), (2, 0, 2), (3, 5, 9)], "id long, g long, v long"))

    real_read = view.base.read

    def guarded_read(*a, **kw):
        raise AssertionError(
            "insert-only approx_distinct refresh read the base table"
        )

    view.base.read = guarded_read
    try:
        r = view.refresh()
    finally:
        view.base.read = real_read
    assert r["groups_touched"] == 2
    oracle = [
        F.countDistinct("v").alias("nd"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    _view_equals_recompute(view, base, oracle)


def test_view_approx_distinct_envelope_and_determinism_at_scale(spark, tmp_path):
    """Past the sketch's exact regime the contract is ε-approximation:
    estimates stay within 5% of the exact distinct count (default
    lgK=12 gives ~1.6% typical), the incremental fold lands within the
    same envelope as a recompute refresh, and rebuilding the identical
    view is bit-deterministic."""
    big = spark.range(0, 60000).select(
        F.col("id").alias("id"),
        (F.col("id") % 3).alias("g"),
        # ~20k distinct values per group, with collisions
        ((F.col("id") * 2654435761) % 20011).alias("v"),
    )
    base = TxTable.create(spark, tmp_path / "base", big, key="id")
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"nd": ("approx_distinct", "v")},
    )
    base.append(
        spark.range(60000, 90000).select(
            F.col("id").alias("id"),
            (F.col("id") % 3).alias("g"),
            ((F.col("id") * 1099511628211) % 40009).alias("v"),
        )
    )
    view.refresh()  # pure-insert union fold
    got = {r["g"]: r["nd"] for r in view.read().collect()}
    exact = {
        r["g"]: r["x"]
        for r in base.read().groupBy("g").agg(F.countDistinct("v").alias("x")).collect()
    }
    for g in exact:
        assert abs(got[g] - exact[g]) <= 0.05 * exact[g], (g, got[g], exact[g])

    # determinism: same base history + same refresh schedule -> same estimates
    base2 = TxTable.create(spark, tmp_path / "base2", big, key="id")
    view2 = TxAggView.create(
        spark, tmp_path / "view2", base2, group_col="g",
        measures={"nd": ("approx_distinct", "v")},
    )
    base2.append(
        spark.range(60000, 90000).select(
            F.col("id").alias("id"),
            (F.col("id") % 3).alias("g"),
            ((F.col("id") * 1099511628211) % 40009).alias("v"),
        )
    )
    view2.refresh()
    assert {r["g"]: r["nd"] for r in view2.read().collect()} == got

    # a recompute refresh lands in the same envelope (estimates may
    # differ from the fold by sketch-merge order, never by much)
    base.delete(F.col("id") % 1000 == 7, mode="dv")
    r = view.refresh(mode="recompute")
    assert r["mode"] == "recompute"
    exact2 = {
        r["g"]: r["x"]
        for r in base.read().groupBy("g").agg(F.countDistinct("v").alias("x")).collect()
    }
    got_rc = {r["g"]: r["nd"] for r in view.read().collect()}
    for g in exact2:
        assert abs(got_rc[g] - exact2[g]) <= 0.05 * exact2[g]


def test_view_distinct_never_reads_base(spark, tmp_path):
    """The exact distinct measure folds EVERY churn shape — including
    last-occurrence deletes — without reading the base: occurrence
    counts live in the support table, transitions move the count."""
    base = TxTable.create(
        spark, tmp_path / "base",
        spark.createDataFrame(
            [(1, 0, 5), (2, 0, 5), (3, 0, 7), (4, 1, 5)],
            "id long, g long, amt long",
        ),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"total": ("sum", "amt"), "uniq": ("distinct", "amt")},
    )
    base.append(spark.createDataFrame(
        [(5, 0, 9), (6, 1, None)], "id long, g long, amt long"))
    base.delete(F.col("id") == 1, mode="dv")  # amt 5: NOT last in g=0
    base.delete(F.col("id") == 3)             # amt 7: last in g=0

    def boom(*a, **k):
        raise AssertionError("base scanned during a distinct-only fold")

    view.base.read = boom
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    got = {r0["g"]: (r0["total"], r0["uniq"], r0["n_rows"])
           for r0 in view.read().collect()}
    assert got == {0: (14, 2, 2), 1: (5, 1, 2)}


def test_view_distinct_support_crash_and_vacuum_heal(spark, tmp_path):
    """Crash between the view and support commits, then retention reaps
    the window's manifests: the next refresh rebuilds the support
    wholesale at the view's cursor and later churn folds exactly."""
    base = TxTable.create(
        spark, tmp_path / "base",
        spark.createDataFrame([(1, 0, 5), (2, 1, 7)],
                              "id long, g long, amt long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"uniq": ("distinct", "amt")},
    )
    base.append(spark.createDataFrame([(3, 0, 9)],
                                      "id long, g long, amt long"))
    orig = TxAggView._apply_support
    TxAggView._apply_support = lambda self, sup, dv, fence: None
    try:
        view.refresh()
    finally:
        TxAggView._apply_support = orig
    base.vacuum(retain_versions=1, min_age_s=0, force=True)
    v2 = TxAggView(spark, tmp_path / "view")
    assert v2.refresh()["skipped"]  # catch-up rebuilt, then fenced skip
    got_s = sorted((r["g"], r["__val"], r["__cnt"])
                   for r in v2._support("uniq").read().collect())
    assert got_s == [(0, 5, 1), (0, 9, 1), (1, 7, 1)]
    # a missing support (crash inside create) heals the same way
    import shutil as _shutil

    _shutil.rmtree(tmp_path / "view" / "_vals_uniq")
    base.append(spark.createDataFrame([(4, 1, 7)],
                                      "id long, g long, amt long"))
    base.delete(F.col("id") == 2)  # amt 7 now NOT last in g=1
    v3 = TxAggView(spark, tmp_path / "view")
    v3.refresh()
    got = {r["g"]: r["uniq"] for r in v3.read().collect()}
    assert got == {0: 2, 1: 1}
