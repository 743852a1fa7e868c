"""Incremental JOIN-aggregate views (sources/txjoinview.TxJoinAggView).

Core invariant: after every refresh, ``read()`` equals a full
``fact JOIN dim GROUP BY group_expr`` recompute — under fact churn
(append / merge / dv + cow deletes), dim churn (attribute updates that
MOVE fact rows between groups, late-arriving dim keys, dim deletes),
NULL foreign keys, NULL measure values, group birth and death, and any
interleaving of the two feeds between refreshes. Plus the O-shape
pins: the dim is never scanned, the fact's term-B read is pruned per
layout, and a crash-replayed refresh is a fenced skip.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txtable import TxError, TxTable

FACT_SCHEMA = "oid long, cust long, amt long"
DIM_SCHEMA = "cust long, seg string"


def _mk_fact(spark, path, rows):
    return TxTable.create(
        spark, path, spark.createDataFrame(rows, FACT_SCHEMA), key="oid"
    )


def _mk_dim(spark, path, rows):
    return TxTable.create(
        spark, path, spark.createDataFrame(rows, DIM_SCHEMA), key="cust"
    )


def _mk_view(spark, path, fact, dim):
    return TxJoinAggView.create(
        spark, path, fact, dim,
        fk="cust", group_expr="seg", group_col="seg",
        measures={"total": "amt", "n_amt": ("count", "amt"),
                  "mean_amt": ("avg", "amt"),
                  "lo_amt": ("min", "amt"), "hi_amt": ("max", "amt"),
                  # tiny cardinality -> the HLL sketch is in its exact
                  # LIST/SET regime, so equality to COUNT(DISTINCT) holds
                  "uniq_amt": ("approx_distinct", "amt"),
                  # the EXACT transition-maintained twin (r11): same
                  # answer, no delete repair, support-table backed
                  "uniq_exact": ("distinct", "amt")},
    )


def _expected(fact_rows, dim_attr):
    """Python oracle: INNER join + GROUP BY with SQL NULL semantics.
    fact_rows: iterable of (cust, amt); dim_attr: {cust: seg}."""
    agg: dict = {}
    for cust, amt in fact_rows:
        if cust is None or cust not in dim_attr:
            continue
        g = dim_attr[cust]
        a = agg.setdefault(g, [0, 0, 0, []])  # sum, nn count, n_rows, vals
        if amt is not None:
            a[0] += amt
            a[1] += 1
            a[3].append(amt)
        a[2] += 1
    return {
        g: (
            s if c > 0 else None,
            c,
            n,
            min(vals) if vals else None,
            max(vals) if vals else None,
            len(set(vals)),
            len(set(vals)),
        )
        for g, (s, c, n, vals) in agg.items()
    }


def _actual(view):
    return {
        r["seg"]: (r["total"], r["n_amt"], r["n_rows"],
                   r["lo_amt"], r["hi_amt"], r["uniq_amt"],
                   r["uniq_exact"])
        for r in view.read().collect()
    }


def _model_fact_rows(fact_model):
    return [(c, a) for (c, a) in fact_model.values()]


def test_joinview_lifecycle(spark, tmp_path):
    """Create, then one refresh per churn shape, equal to the Python
    join-group oracle after each: fact append (incl. a NULL fk and a
    fk with no dim row), dim attribute move, late-arriving dim key,
    fact dv delete, dim delete killing a group."""
    fact = _mk_fact(spark, tmp_path / "f", [
        (1, 10, 5), (2, 10, None), (3, 20, 7), (4, 30, 1),
    ])
    dim = _mk_dim(spark, tmp_path / "d", [
        (10, "a"), (20, "b"), (30, "a"),
    ])
    view = _mk_view(spark, tmp_path / "v", fact, dim)

    model_f = {1: (10, 5), 2: (10, None), 3: (20, 7), 4: (30, 1)}
    model_d = {10: "a", 20: "b", 30: "a"}
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)
    # avg derives from the physical sum/count
    avgs = {r["seg"]: r["mean_amt"] for r in view.read().collect()}
    assert avgs == {"a": 3.0, "b": 7.0}

    # fact churn only: new rows — one NULL fk, one fk (99) with no dim
    fact.append(spark.createDataFrame(
        [(5, 20, 100), (6, None, 9), (7, 99, 9)], FACT_SCHEMA))
    model_f.update({5: (20, 100), 6: (None, 9), 7: (99, 9)})
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)

    # dim churn only: cust 10 moves a -> b (BOTH its fact rows move,
    # including the NULL-amt one)
    dim.merge(spark.createDataFrame([(10, "b")], DIM_SCHEMA))
    model_d[10] = "b"
    view.refresh()
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)

    # late-arriving dim key: 99 appears, its EXISTING fact row joins in
    dim.merge(spark.createDataFrame([(99, "c")], DIM_SCHEMA))
    model_d[99] = "c"
    view.refresh()
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)
    assert _actual(view)["c"] == (9, 1, 1, 9, 9, 1, 1)

    # both feeds in one refresh window: fact dv delete + dim delete
    fact.delete(F.col("oid").isin([3, 5]), mode="dv")
    del model_f[3], model_f[5]
    dim.delete(F.col("cust") == 99)
    del model_d[99]
    view.refresh()
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)
    assert "c" not in _actual(view)  # group died with its dim key

    # recompute mode lands the identical state (same fence machinery)
    fact.append(spark.createDataFrame([(8, 20, 2)], FACT_SCHEMA))
    model_f[8] = (20, 2)
    r = view.refresh(mode="recompute")
    assert r["mode"] == "recompute" and not r["skipped"]
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)


def test_joinview_equals_recompute_random_ops(spark, tmp_path):
    """Randomized op-log over BOTH tables, refresh every 2-3 ops:
    incremental read() must equal the Python oracle at every refresh,
    and a final recompute must change nothing."""
    rng = random.Random(20260815)
    fact = _mk_fact(spark, tmp_path / "f", [
        (i, rng.choice([10, 20, 30, 40, None]), rng.choice([None, 1, 5]))
        for i in range(40)
    ])
    # dim starts WITHOUT key 40 (late-arriving later); NULL group for 30
    dim = _mk_dim(spark, tmp_path / "d", [
        (10, "a"), (20, "b"), (30, None),
    ])
    model_f = {
        r["oid"]: (r["cust"], r["amt"]) for r in fact.read().collect()
    }
    model_d = {r["cust"]: r["seg"] for r in dim.read().collect()}
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    next_oid = 1000

    def op_fact_append():
        nonlocal next_oid
        rows = [
            (next_oid + j,
             rng.choice([10, 20, 30, 40, 50, None]),
             rng.choice([None, 2, 9]))
            for j in range(rng.randint(1, 5))
        ]
        next_oid += len(rows)
        fact.append(spark.createDataFrame(rows, FACT_SCHEMA))
        model_f.update({o: (c, a) for o, c, a in rows})

    def op_fact_update():
        ids = rng.sample(sorted(model_f), min(3, len(model_f)))
        rows = [(o, model_f[o][0], rng.choice([None, 4, 11])) for o in ids]
        fact.merge(spark.createDataFrame(rows, FACT_SCHEMA))
        model_f.update({o: (c, a) for o, c, a in rows})

    def op_fact_delete():
        ids = rng.sample(sorted(model_f), min(2, len(model_f)))
        fact.delete(F.col("oid").isin(ids), mode=rng.choice(["dv", "rewrite"]))
        for o in ids:
            del model_f[o]

    def op_dim_move():
        if not model_d:
            return
        k = rng.choice(sorted(model_d, key=str))
        seg = rng.choice(["a", "b", "c", None])
        dim.merge(spark.createDataFrame([(k, seg)], DIM_SCHEMA))
        model_d[k] = seg

    def op_dim_insert():
        k = rng.choice([40, 50, 60])
        if k in model_d:
            return
        dim.merge(spark.createDataFrame([(k, rng.choice(["a", "c"]))],
                                        DIM_SCHEMA))
        model_d[k] = dim.read().filter(F.col("cust") == k).first()["seg"]

    def op_dim_delete():
        if len(model_d) <= 1:
            return
        k = rng.choice(sorted(model_d, key=str))
        dim.delete(F.col("cust") == k)
        del model_d[k]

    ops = [op_fact_append, op_fact_update, op_fact_delete,
           op_dim_move, op_dim_insert, op_dim_delete]
    done = 0
    while done < 24:
        for _ in range(rng.randint(2, 3)):
            rng.choice(ops)()
            done += 1
        view.refresh()
        assert _actual(view) == _expected(
            _model_fact_rows(model_f), model_d
        ), f"diverged after {done} ops"
    view.refresh(mode="recompute")
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)


def test_joinview_replay_is_fenced_and_versions_tracked(spark, tmp_path):
    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a")])
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    assert view.applied_versions() == (0, 0)

    fact.append(spark.createDataFrame([(2, 10, 7)], FACT_SCHEMA))
    dim.merge(spark.createDataFrame([(10, "b")], DIM_SCHEMA))
    r = view.refresh()
    assert r["refreshed_to"] == (1, 1) and not r["skipped"]
    assert view.applied_versions() == (1, 1)
    state = _actual(view)

    # crash replay: a second refresh over the same range is a fenced
    # skip and the double-apply never happens
    r2 = view.refresh()
    assert r2["skipped"]
    assert _actual(view) == state == {"b": (12, 2, 2, 5, 7, 2, 2)}

    # a reconstructed handle recovers its cursors from the fence
    again = TxJoinAggView(spark, tmp_path / "v")
    assert again.applied_versions() == (1, 1)


def test_joinview_dim_is_never_scanned(spark, tmp_path):
    """Term A reads the dim ONLY through key-pruned point reads, and
    insert-only churn (no dead extremes) never triggers the min/max
    repair — neither base is scanned in the steady state."""
    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b")])
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    fact.append(spark.createDataFrame([(2, 20, 3)], FACT_SCHEMA))

    def boom(*a, **k):
        raise AssertionError("full read during an insert-only refresh")

    view.dim.read = boom  # read_for_keys goes through _read_files, not read
    view.fact.read = boom  # min/max repair would need it — must not fire
    view.refresh()
    assert _actual(view) == {"a": (5, 1, 1, 5, 5, 1, 1),
                             "b": (3, 1, 1, 3, 3, 1, 1)}


def test_joinview_term_b_pruned_reads_by_fact_layout(
    spark, tmp_path, monkeypatch
):
    """Fact keyed BY the fk -> read_for_keys (fact.read never called);
    fk in stats_cols -> read(prune={fk: range}); neither -> full read.
    The r14 prune-probe floor is pinned to 0: this test checks the
    pruning MACHINERY, which the floor (a cost-model bypass for bases
    too small for the probe job to pay off) deliberately skips at this
    scale — the floor itself is covered in
    test_prune_probe_floor_reads_whole_below_threshold."""
    from data_warehouse_project_spark.sources import txjoinview

    monkeypatch.setattr(txjoinview, "PRUNE_PROBE_FLOOR_ROWS", 0)
    # layout 1: fact keyed by the fk itself
    f1 = TxTable.create(
        spark, tmp_path / "f1",
        spark.createDataFrame([(10, 5), (20, 7)], "cust long, amt long"),
        key="cust",
    )
    d1 = _mk_dim(spark, tmp_path / "d1", [(10, "a"), (20, "b")])
    v1 = TxJoinAggView.create(
        spark, tmp_path / "v1", f1, d1, fk="cust",
        group_expr="seg", group_col="seg", measures={"total": "amt"},
    )
    d1.merge(spark.createDataFrame([(10, "b")], DIM_SCHEMA))

    def boom(*a, **k):
        raise AssertionError("fact.read() called — term B must key-prune")

    v1.fact.read = boom
    v1.refresh()
    assert {r["seg"]: r["total"] for r in v1.read().collect()} == {"b": 12}

    # layout 2: fk declared in stats_cols -> prune= reaches the read
    f2 = TxTable.create(
        spark, tmp_path / "f2",
        spark.createDataFrame([(1, 10, 5), (2, 20, 7)], FACT_SCHEMA),
        key="oid", stats_cols=["cust"],
    )
    d2 = _mk_dim(spark, tmp_path / "d2", [(10, "a"), (20, "b")])
    v2 = _mk_view(spark, tmp_path / "v2", f2, d2)
    d2.merge(spark.createDataFrame([(20, "a")], DIM_SCHEMA))
    seen: dict = {}
    orig = v2.fact.read

    def spy(*a, **k):
        seen.update(k)
        return orig(*a, **k)

    v2.fact.read = spy
    v2.refresh()
    assert seen.get("prune") == {"cust": (20, 20)}
    assert _actual(v2) == {"a": (12, 2, 2, 5, 7, 2, 2)}


def test_prune_probe_floor_reads_whole_below_threshold(spark, tmp_path):
    """r14: bases whose manifest-live row count sits under
    PRUNE_PROBE_FLOOR_ROWS skip the prune-probe JOB entirely — the
    term read comes straight from _read_files (no .read, no
    .read_for_keys) — and the refresh still lands the exact state,
    because the caller's join supplies exactness over the superset."""
    f = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame([(1, 10, 5), (2, 20, 7)], FACT_SCHEMA),
        key="oid", stats_cols=["cust"],
    )
    d = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b")])
    v = _mk_view(spark, tmp_path / "v", f, d)
    d.merge(spark.createDataFrame([(20, "a")], DIM_SCHEMA))

    def boom(*a, **k):
        raise AssertionError(
            "prune-probe path used below the floor — the probe job "
            "costs more than the whole-slice read here"
        )

    # default floor (2M) is far above this table: neither the pruned
    # read() nor read_for_keys() may fire for the term-B fact slice
    v.fact.read = boom
    v.fact.read_for_keys = boom
    v.refresh()
    assert _actual(v) == {"a": (12, 2, 2, 5, 7, 2, 2)}


def test_joinview_guards(spark, tmp_path):
    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a")])
    with pytest.raises(TxError, match="unsupported fn"):
        TxJoinAggView.create(
            spark, tmp_path / "v", fact, dim, fk="cust",
            group_expr="seg", group_col="seg",
            measures={"worst": ("median", "amt")},
        )
    nokey = TxTable.create(
        spark, tmp_path / "nk",
        spark.createDataFrame([(10, "a")], DIM_SCHEMA),
    )
    with pytest.raises(TxError, match="keyed"):
        TxJoinAggView.create(
            spark, tmp_path / "v2", fact, nokey, fk="cust",
            group_expr="seg", group_col="seg", measures={"total": "amt"},
        )
    with pytest.raises(TxError, match="reserved"):
        TxJoinAggView.create(
            spark, tmp_path / "v3", fact, dim, fk="cust",
            group_expr="seg", group_col="seg", measures={"n_rows": "amt"},
        )
    with pytest.raises(TxError, match="not a TxJoinAggView"):
        TxJoinAggView(spark, tmp_path / "missing")


def test_joinview_auto_mode(spark, tmp_path, monkeypatch):
    """auto picks recompute below the row floor and incremental above
    (thresholds monkeypatched down); both land the same state."""
    fact = _mk_fact(spark, tmp_path / "f",
                    [(i, 10 + 10 * (i % 3), i) for i in range(60)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b"), (30, "c")])
    view = _mk_view(spark, tmp_path / "v", fact, dim)

    fact.append(spark.createDataFrame([(100, 10, 1)], FACT_SCHEMA))
    r = view.refresh(mode="auto")  # 61 rows << floor -> recompute
    assert r["mode"] == "recompute"

    monkeypatch.setattr(TxJoinAggView, "RECOMPUTE_FLOOR_ROWS", 10)
    fact.append(spark.createDataFrame([(101, 20, 2)], FACT_SCHEMA))
    r = view.refresh(mode="auto")  # small churn over the floor -> fold
    assert r["mode"] == "incremental"

    # heavy DIM churn (2 of 3 keys move) trips the dim fraction
    dim.merge(spark.createDataFrame([(10, "c"), (20, "c")], DIM_SCHEMA))
    r = view.refresh(mode="auto")
    assert r["mode"] == "recompute"
    model_f = {r["oid"]: (r["cust"], r["amt"]) for r in fact.read().collect()}
    model_d = {r["cust"]: r["seg"] for r in dim.read().collect()}
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)


def test_joinview_concurrent_refreshes_fold_exactly_once(spark, tmp_path):
    """Three handles refreshing the SAME join view over the same churn
    window (fact append + dim move): the packed (fact, dim) fence +
    commit rebase ensure the combined delta folds exactly once."""
    import threading

    fact = _mk_fact(spark, tmp_path / "f",
                    [(i, 10 + 10 * (i % 3), i % 7) for i in range(40)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b"), (30, "c")])
    _mk_view(spark, tmp_path / "v", fact, dim)
    fact.append(spark.createDataFrame([(100, 10, 3)], FACT_SCHEMA))
    dim.merge(spark.createDataFrame([(20, "a")], DIM_SCHEMA))
    errors = []

    def refresher():
        try:
            TxJoinAggView(spark, tmp_path / "v").refresh()
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    ths = [threading.Thread(target=refresher) for _ in range(3)]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=300)
    assert not errors, errors
    model_f = {r["oid"]: (r["cust"], r["amt"]) for r in fact.read().collect()}
    model_d = {r["cust"]: r["seg"] for r in dim.read().collect()}
    view = TxJoinAggView(spark, tmp_path / "v")
    assert _actual(view) == _expected(_model_fact_rows(model_f), model_d)


def test_joinview_refresh_with_no_joining_churn_still_advances(spark, tmp_path):
    """A window whose churn joins nothing (NULL fks / keys with no dim
    row) produces an EMPTY delta — the fenced commit must still land so
    the cursors advance and the range is never re-read."""
    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a")])
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    fact.append(spark.createDataFrame([(2, None, 7), (3, 999, 8)],
                                      FACT_SCHEMA))
    r = view.refresh()
    assert r["mode"] == "incremental" and r["groups_touched"] == 0
    assert view.applied_versions() == (1, 0)
    assert view.refresh()["skipped"]  # cursors moved — nothing re-read
    assert _actual(view) == {"a": (5, 1, 1, 5, 5, 1, 1)}


# ------------------------- r11: composite group keys + multiple dims


def _expected2(fact_rows, d1, d2):
    """Python oracle for fact ⋈ d1 ⋈ d2 GROUP BY (attr1, attr2) with
    INNER-join + SQL NULL semantics. fact_rows: (k1, k2, amt);
    d1/d2: {key: attr}."""
    agg: dict = {}
    for k1, k2, amt in fact_rows:
        if k1 is None or k1 not in d1 or k2 is None or k2 not in d2:
            continue
        g = (d1[k1], d2[k2])
        a = agg.setdefault(g, [0, 0, 0, []])
        if amt is not None:
            a[0] += amt
            a[1] += 1
            a[3].append(amt)
        a[2] += 1
    return {
        g: (
            s if c > 0 else None, c, n,
            min(vals) if vals else None,
            max(vals) if vals else None,
            len(set(vals)),
            len(set(vals)),
        )
        for g, (s, c, n, vals) in agg.items()
    }


F2_SCHEMA = "oid long, cust long, prod long, amt long"


def _mk_view2(spark, path, fact, d1, d2):
    return TxJoinAggView.create(
        spark, path, fact, d1,
        fk="cust", group_expr=["seg", "upper(cat)"],
        group_col=["seg", "cat_u"], measures={
            "total": "amt", "n_amt": ("count", "amt"),
            "lo_amt": ("min", "amt"), "hi_amt": ("max", "amt"),
            "uniq_amt": ("approx_distinct", "amt"),
            "uniq_exact": ("distinct", "amt"),
        },
        extra_dims=[{"dim": d2, "fk": "prod"}],
        group_dims=[0, 1],
    )


def _actual2(view):
    return {
        (r["seg"], r["cat_u"]): (r["total"], r["n_amt"], r["n_rows"],
                                 r["lo_amt"], r["hi_amt"], r["uniq_amt"],
                                 r["uniq_exact"])
        for r in view.read().collect()
    }


def test_joinview_composite_group_single_dim(spark, tmp_path):
    """Two group columns from ONE dim (the reference's (country, state)
    geo shape, dw_etl_tests.py:494-506): lifecycle equality to a plain
    recompute through fact churn, a group MOVE along one of the two
    key parts, and a dim delete — plus the fenced replay skip."""
    fact = _mk_fact(spark, tmp_path / "f", [
        (1, 10, 5), (2, 10, None), (3, 20, 7), (4, 30, 1),
    ])
    d = TxTable.create(
        spark, tmp_path / "d",
        spark.createDataFrame(
            [(10, "EU", "de"), (20, "EU", "fr"), (30, "NA", "us")],
            "cust long, region string, nation string",
        ),
        key="cust",
    )
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, d,
        fk="cust", group_expr=["region", "nation"],
        group_col=["region", "nation"],
        measures={"total": "amt", "n_amt": ("count", "amt"),
                  "lo_amt": ("min", "amt"), "hi_amt": ("max", "amt")},
    )

    def actual():
        return {
            (r["region"], r["nation"]):
                (r["total"], r["n_amt"], r["n_rows"], r["lo_amt"],
                 r["hi_amt"])
            for r in view.read().collect()
        }

    def recomputed():
        j = fact.read().alias("f").join(
            d.read().alias("d"), F.col("f.cust") == F.col("d.cust"))
        return {
            (r["region"], r["nation"]):
                (r["total"], r["n_amt"], r["n_rows"], r["lo_amt"],
                 r["hi_amt"])
            for r in j.groupBy("region", "nation").agg(
                F.sum("amt").alias("total"),
                F.count("amt").alias("n_amt"),
                F.count(F.lit(1)).alias("n_rows"),
                F.min("amt").alias("lo_amt"),
                F.max("amt").alias("hi_amt"),
            ).collect()
        }

    assert actual() == recomputed()
    assert ("EU", "de") in actual()
    # the physical view is keyed by the composite encoding, but the
    # logical read never exposes it
    assert "__gk" not in view.read().columns
    assert view.table._manifest()["key"] == "__gk"

    # fact churn + a nation move WITHIN a region (second key part only)
    fact.append(spark.createDataFrame([(5, 20, 100), (6, 30, 2)],
                                      FACT_SCHEMA.replace("cust", "cust")))
    d.merge(spark.createDataFrame([(20, "EU", "de")],
                                  "cust long, region string, nation string"))
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    assert actual() == recomputed()

    # region move (first key part), max death forces the dirty repair
    d.merge(spark.createDataFrame([(10, "NA", "mx")],
                                  "cust long, region string, nation string"))
    fact.delete(F.col("oid") == 5, mode="dv")  # kills (EU, de) max=100
    view.refresh()
    assert actual() == recomputed()

    # dim delete removes its groups; NULL group values stay distinct
    d.delete(F.col("cust") == 30)
    d.merge(spark.createDataFrame([(40, None, "xx")],
                                  "cust long, region string, nation string"))
    fact.append(spark.createDataFrame([(7, 40, 9)], FACT_SCHEMA))
    view.refresh()
    assert actual() == recomputed()
    assert (None, "xx") in actual()

    # replay is a fenced skip; recompute lands the identical state
    assert view.refresh()["skipped"]
    state = actual()
    view.refresh(mode="recompute")
    assert actual() == state == recomputed()


def test_joinview_two_dims_lifecycle(spark, tmp_path):
    """fact ⋈ d1 ⋈ d2 with one group column from EACH dim: the
    trilinear expansion (term A + one term per dim, earlier dims at
    old versions, later at new) under every churn shape including
    same-window churn on all three bases."""
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(
            [(1, 10, 7, 5), (2, 10, 8, None), (3, 20, 7, 7), (4, 30, 8, 1)],
            F2_SCHEMA,
        ),
        key="oid", stats_cols=["cust", "prod"],
    )
    d1 = _mk_dim(spark, tmp_path / "d1", [(10, "a"), (20, "b"), (30, "a")])
    d2 = TxTable.create(
        spark, tmp_path / "d2",
        spark.createDataFrame([(7, "x"), (8, "y")], "prod long, cat string"),
        key="prod",
    )
    view = _mk_view2(spark, tmp_path / "v", fact, d1, d2)

    model_f = {1: (10, 7, 5), 2: (10, 8, None), 3: (20, 7, 7),
               4: (30, 8, 1)}
    model_d1 = {10: "a", 20: "b", 30: "a"}
    model_d2 = {7: "X", 8: "Y"}
    assert _actual2(view) == _expected2(model_f.values(), model_d1, model_d2)
    assert view.applied_versions() == (0, 0, 0)

    # fact-only churn (term A joins BOTH dims at new versions)
    fact.append(spark.createDataFrame(
        [(5, 20, 8, 100), (6, None, 7, 9), (7, 10, None, 3), (8, 99, 7, 2)],
        F2_SCHEMA))
    model_f.update({5: (20, 8, 100), 6: (None, 7, 9), 7: (10, None, 3),
                    8: (99, 7, 2)})
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    assert _actual2(view) == _expected2(model_f.values(), model_d1, model_d2)

    # d1-only churn: a segment move re-buckets the first key part
    d1.merge(spark.createDataFrame([(10, "b")], DIM_SCHEMA))
    model_d1[10] = "b"
    view.refresh()
    assert _actual2(view) == _expected2(model_f.values(), model_d1, model_d2)

    # d2-only churn: category move re-buckets the second key part
    d2.merge(spark.createDataFrame([(7, "z")], "prod long, cat string"))
    model_d2[7] = "Z"
    view.refresh()
    assert _actual2(view) == _expected2(model_f.values(), model_d1, model_d2)

    # ALL THREE bases churn in one refresh window, with overlap: the
    # moved dim keys also gain/lose fact rows
    fact.append(spark.createDataFrame([(9, 20, 7, 11)], F2_SCHEMA))
    model_f[9] = (20, 7, 11)
    fact.delete(F.col("oid") == 5, mode="dv")   # kills the (b,Y) max
    del model_f[5]
    d1.merge(spark.createDataFrame([(20, "c"), (99, "d")], DIM_SCHEMA))
    model_d1[20] = "c"
    model_d1[99] = "d"                          # late-arriving d1 key
    d2.delete(F.col("prod") == 8)               # kills every *,Y group
    del model_d2[8]
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    assert view.applied_versions() == (
        fact.latest_version(), d1.latest_version(), d2.latest_version())
    assert _actual2(view) == _expected2(model_f.values(), model_d1, model_d2)

    # replay fenced; a reconstructed handle recovers the full vector
    assert view.refresh()["skipped"]
    again = TxJoinAggView(spark, tmp_path / "v")
    assert again.applied_versions() == view.applied_versions()
    assert again.base_roots() == [
        str(fact.root), str(d1.root), str(d2.root)]
    # recompute mode lands the identical state over the same fence
    fact.append(spark.createDataFrame([(10, 10, 7, 4)], F2_SCHEMA))
    model_f[10] = (10, 7, 4)
    view.refresh(mode="recompute")
    assert _actual2(view) == _expected2(model_f.values(), model_d1, model_d2)


def test_joinview_two_dims_equals_oracle_random_ops(spark, tmp_path):
    """Randomized op-log across ALL THREE bases, refresh every 2-3 ops:
    the incremental view equals the Python oracle at every refresh and
    a final recompute changes nothing."""
    rng = random.Random(20260815)
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(
            [(i, rng.choice([10, 20, 30, None]),
              rng.choice([7, 8, 9, None]),
              rng.choice([None, 1, 5]))
             for i in range(40)],
            F2_SCHEMA,
        ),
        key="oid", stats_cols=["cust", "prod"],
    )
    d1 = _mk_dim(spark, tmp_path / "d1", [(10, "a"), (20, "b"), (30, None)])
    d2 = TxTable.create(
        spark, tmp_path / "d2",
        spark.createDataFrame([(7, "x"), (8, None)], "prod long, cat string"),
        key="prod",
    )
    model_f = {r["oid"]: (r["cust"], r["prod"], r["amt"])
               for r in fact.read().collect()}
    model_d1 = {r["cust"]: r["seg"] for r in d1.read().collect()}
    model_d2 = {r["prod"]: (r["cat"].upper() if r["cat"] is not None
                            else None)
                for r in d2.read().collect()}
    view = _mk_view2(spark, tmp_path / "v", fact, d1, d2)
    next_oid = 1000

    def op_fact_append():
        nonlocal next_oid
        rows = [(next_oid + j,
                 rng.choice([10, 20, 30, 40, None]),
                 rng.choice([7, 8, 9, None]),
                 rng.choice([None, 2, 9, 11]))
                for j in range(rng.randint(1, 5))]
        next_oid += len(rows)
        fact.append(spark.createDataFrame(rows, F2_SCHEMA))
        model_f.update({o: (c, p, a) for o, c, p, a in rows})

    def op_fact_delete():
        if not model_f:
            return
        ids = rng.sample(sorted(model_f), min(2, len(model_f)))
        fact.delete(F.col("oid").isin(ids),
                    mode=rng.choice(["dv", "rewrite"]))
        for o in ids:
            del model_f[o]

    def op_d1_move():
        if not model_d1:
            return
        k = rng.choice(sorted(model_d1, key=str))
        seg = rng.choice(["a", "b", "c", None])
        d1.merge(spark.createDataFrame([(k, seg)], DIM_SCHEMA))
        model_d1[k] = seg

    def op_d1_insert_delete():
        k = rng.choice([40, 50])
        if k in model_d1:
            d1.delete(F.col("cust") == k)
            del model_d1[k]
        else:
            d1.merge(spark.createDataFrame([(k, "e")], DIM_SCHEMA))
            model_d1[k] = "e"

    def op_d2_move():
        if not model_d2:
            return
        k = rng.choice(sorted(model_d2))
        cat = rng.choice(["x", "y", "z", None])
        d2.merge(spark.createDataFrame([(k, cat)], "prod long, cat string"))
        model_d2[k] = cat.upper() if cat is not None else None

    def op_d2_insert_delete():
        k = rng.choice([9, 11])
        if k in model_d2:
            d2.delete(F.col("prod") == k)
            del model_d2[k]
        else:
            d2.merge(spark.createDataFrame([(k, "w")],
                                           "prod long, cat string"))
            model_d2[k] = "W"

    ops = [op_fact_append, op_fact_delete, op_d1_move,
           op_d1_insert_delete, op_d2_move, op_d2_insert_delete]
    done = 0
    while done < 24:
        for _ in range(rng.randint(2, 3)):
            rng.choice(ops)()
            done += 1
        view.refresh()
        assert _actual2(view) == _expected2(
            model_f.values(), model_d1, model_d2
        ), f"diverged after {done} ops"
    view.refresh(mode="recompute")
    assert _actual2(view) == _expected2(
        model_f.values(), model_d1, model_d2)


def test_joinview_legacy_sidecar_loads(spark, tmp_path):
    """A pre-r11 single-dim sidecar (scalar group_expr/group_col,
    fact/dim version pair) must load, decode its fence, and refresh."""
    import json as _json

    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a")])
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    # rewrite the sidecar in the legacy format
    legacy = {
        "fact_root": view.spec["fact_root"],
        "dim_root": view.spec["dims"][0]["root"],
        "fk": "cust",
        "dim_key": "cust",
        "group_expr": "seg",
        "group_col": "seg",
        "measures": {k: (m["fn"], m["expr"])
                     for k, m in view.spec["measures"].items()},
        "fact_version_at_create": 0,
        "dim_version_at_create": 0,
    }
    with open(tmp_path / "v" / "_joinview.json", "w") as fh:
        _json.dump(legacy, fh)
    old = TxJoinAggView(spark, tmp_path / "v")
    assert old.applied_versions() == (0, 0)
    fact.append(spark.createDataFrame([(2, 10, 7)], FACT_SCHEMA))
    old.refresh()
    assert _actual(old) == {"a": (12, 2, 2, 5, 7, 2, 2)}


def test_joinview_two_dims_never_scan_on_insert_only(spark, tmp_path):
    """Insert-only fact churn: BOTH dims are read only through pruned
    point reads and the min/max repair never fires — no base scan."""
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame([(1, 10, 7, 5)], F2_SCHEMA),
        key="oid", stats_cols=["cust", "prod"],
    )
    d1 = _mk_dim(spark, tmp_path / "d1", [(10, "a"), (20, "b")])
    d2 = TxTable.create(
        spark, tmp_path / "d2",
        spark.createDataFrame([(7, "x"), (8, "y")], "prod long, cat string"),
        key="prod",
    )
    view = _mk_view2(spark, tmp_path / "v", fact, d1, d2)
    fact.append(spark.createDataFrame([(2, 20, 8, 3)], F2_SCHEMA))

    def boom(*a, **k):
        raise AssertionError("base scanned during an insert-only refresh")

    view.fact.read = boom
    for d in view.dims:
        d.read = boom
    view.refresh()
    assert _actual2(view) == {("a", "X"): (5, 1, 1, 5, 5, 1, 1),
                              ("b", "Y"): (3, 1, 1, 3, 3, 1, 1)}


def test_joinview_group_guards(spark, tmp_path):
    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a")])
    with pytest.raises(TxError, match="duplicate group"):
        TxJoinAggView.create(
            spark, tmp_path / "v", fact, dim, fk="cust",
            group_expr=["seg", "seg"], group_col=["s", "s"],
            measures={"total": "amt"},
        )
    with pytest.raises(TxError, match="group_dims"):
        TxJoinAggView.create(
            spark, tmp_path / "v", fact, dim, fk="cust",
            group_expr=["seg"], group_col=["s"], group_dims=[3],
            measures={"total": "amt"},
        )
    with pytest.raises(TxError, match="reserved"):
        TxJoinAggView.create(
            spark, tmp_path / "v", fact, dim, fk="cust",
            group_expr=["seg", "seg || 'x'"], group_col=["s", "__bad"],
            measures={"total": "amt"},
        )


def test_joinview_distinct_delete_never_repairs(spark, tmp_path):
    """The r10 judge item: a correction delete must NOT force a
    base-pair repair for the exact distinct measure — deletes fold as
    occurrence-count decrements, and only a last-occurrence departure
    moves the count. Pinned by making every base read raise: a
    delete-only refresh over a (sum, count, distinct)-measure view
    completes without touching either base."""
    fact = _mk_fact(spark, tmp_path / "f", [
        (1, 10, 5), (2, 10, 5), (3, 10, 7), (4, 20, 5),
    ])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b")])
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim,
        fk="cust", group_expr="seg", group_col="seg",
        measures={"total": "amt", "n_amt": ("count", "amt"),
                  "uniq": ("distinct", "amt")},
    )
    # oid 1: amt 5 has ANOTHER occurrence in group a -> uniq unchanged;
    # oid 3: amt 7's LAST occurrence -> uniq drops
    fact.delete(F.col("oid").isin([1, 3]), mode="dv")

    def boom(*a, **k):
        raise AssertionError("base scanned during a delete-only refresh")

    view.fact.read = boom
    view.dim.read = boom
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    got = {r0["seg"]: (r0["total"], r0["uniq"], r0["n_rows"])
           for r0 in view.read().collect()}
    assert got == {"a": (5, 1, 1), "b": (5, 1, 1)}


def test_joinview_distinct_support_crash_catchup(spark, tmp_path):
    """Crash between the view commit and the support commit: the next
    refresh re-derives the missed window from the feeds before folding
    new churn — state equals the oracle, and the support equals a
    fresh recompute of the per-(group, value) counts."""
    fact = _mk_fact(spark, tmp_path / "f", [
        (1, 10, 5), (2, 10, 7), (3, 20, 5),
    ])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b")])
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim,
        fk="cust", group_expr="seg", group_col="seg",
        measures={"total": "amt", "uniq": ("distinct", "amt")},
    )
    model_f = {1: (10, 5), 2: (10, 7), 3: (20, 5)}
    model_d = {10: "a", 20: "b"}

    def expected():
        agg = {}
        for c, a in model_f.values():
            if c in model_d:
                g = agg.setdefault(model_d[c], [0, set()])
                g[0] += a
                g[1].add(a)
        return {g: (s, len(vals)) for g, (s, vals) in agg.items()}

    def actual():
        return {r["seg"]: (r["total"], r["uniq"])
                for r in view.read().collect()}

    # window 1: churn, then CRASH after the view commit (support fold
    # suppressed)
    fact.append(spark.createDataFrame([(4, 10, 5), (5, 20, 9)],
                                      FACT_SCHEMA))
    model_f.update({4: (10, 5), 5: (20, 9)})
    orig = TxJoinAggView._apply_support
    import pytest as _pytest  # noqa: F401

    TxJoinAggView._apply_support = lambda self, sup, dv, fence: None
    try:
        view.refresh()
    finally:
        TxJoinAggView._apply_support = orig
    assert actual() == expected()  # view itself already folded
    sup = view._support("uniq")
    assert view._support_vec(sup) < list(view.applied_versions())

    # window 2 on a fresh handle: catch-up converges the support, then
    # the new churn folds — a last-occurrence delete must see the
    # caught-up counts (amt 5 in group a now has TWO occurrences)
    fact.delete(F.col("oid") == 1, mode="dv")     # amt 5, NOT last
    del model_f[1]
    fact.delete(F.col("oid") == 2)                # amt 7, last
    del model_f[2]
    v2 = TxJoinAggView(spark, tmp_path / "v")
    v2.refresh()
    assert {r["seg"]: (r["total"], r["uniq"])
            for r in v2.read().collect()} == expected()
    # support equals a fresh per-(group, value) recompute
    want = (
        fact.read().alias("f")
        .join(dim.read().alias("d"), F.col("f.cust") == F.col("d.cust"))
        .groupBy("seg", F.col("amt").alias("__val"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    got_s = sorted(
        (r["seg"], r["__val"], r["__cnt"])
        for r in v2._support("uniq").read().collect()
    )
    assert got_s == sorted(
        (r["seg"], r["__val"], r["__cnt"]) for r in want.collect()
    )
    # replay of everything is fenced on both tables
    assert v2.refresh()["skipped"]
    assert v2._support_vec(v2._support("uniq")) == list(
        v2.applied_versions()
    )


def test_joinview_distinct_support_create_crash_heals(spark, tmp_path):
    """Crash INSIDE create(), after the view's v0 commit but before the
    support table lands: the view must not be stranded — the next
    refresh rebuilds the missing support at the view's cursor and
    converges (create-if-absent in _support)."""
    import shutil as _shutil

    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5), (2, 20, 7)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b")])
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim,
        fk="cust", group_expr="seg", group_col="seg",
        measures={"total": "amt", "uniq": ("distinct", "amt")},
    )
    _shutil.rmtree(tmp_path / "v" / "_vals_uniq")  # the simulated crash

    fact.append(spark.createDataFrame([(3, 10, 5), (4, 10, 9)],
                                      FACT_SCHEMA))
    fact.delete(F.col("oid") == 1, mode="dv")  # amt 5 NOT last in 'a'
    v2 = TxJoinAggView(spark, tmp_path / "v")
    v2.refresh()
    got = {r["seg"]: (r["total"], r["uniq"])
           for r in v2.read().collect()}
    assert got == {"a": (14, 2), "b": (7, 1)}
    # the healed support equals a fresh per-(group, value) recompute
    got_s = sorted((r["seg"], r["__val"], r["__cnt"])
                   for r in v2._support("uniq").read().collect())
    assert got_s == [("a", 5, 1), ("a", 9, 1), ("b", 7, 1)]
    assert v2._support_vec(v2._support("uniq")) == list(
        v2.applied_versions())


def test_joinview_distinct_vacuumed_window_rebuilds(spark, tmp_path):
    """Support lagging behind the view across a window whose change
    feeds were VACUUMED (crash after a big jump, then retention): the
    catch-up cannot replay the feeds, so it rebuilds the support
    wholesale at the view's cursor — the view is never trapped behind
    a gone feed, and refresh(mode=\"recompute\") also heals."""
    fact = _mk_fact(spark, tmp_path / "f", [(1, 10, 5), (2, 20, 7)])
    dim = _mk_dim(spark, tmp_path / "d", [(10, "a"), (20, "b")])
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim,
        fk="cust", group_expr="seg", group_col="seg",
        measures={"total": "amt", "uniq": ("distinct", "amt")},
    )
    fact.append(spark.createDataFrame([(3, 10, 9)], FACT_SCHEMA))
    orig = TxJoinAggView._apply_support
    TxJoinAggView._apply_support = lambda self, sup, dv, fence: None
    try:
        view.refresh()  # view folds; support commit "crashes"
    finally:
        TxJoinAggView._apply_support = orig
    # retention reaps the window's manifests: the feed replay is gone
    fact.vacuum(retain_versions=1, min_age_s=0, force=True)
    v2 = TxJoinAggView(spark, tmp_path / "v")
    r = v2.refresh()  # no new movement: catch-up rebuilds, then skips
    assert r["skipped"]
    got_s = sorted((r0["seg"], r0["__val"], r0["__cnt"])
                   for r0 in v2._support("uniq").read().collect())
    assert got_s == [("a", 5, 1), ("a", 9, 1), ("b", 7, 1)]
    # and further churn folds incrementally on the healed support
    fact.append(spark.createDataFrame([(4, 20, 7)], FACT_SCHEMA))
    fact.delete(F.col("oid") == 3)  # amt 9, last occurrence in 'a'
    v2.refresh()
    got = {r0["seg"]: (r0["total"], r0["uniq"])
           for r0 in v2.read().collect()}
    assert got == {"a": (5, 1), "b": (14, 1)}


def test_joinview_three_dims_generalizes(spark, tmp_path):
    """The telescoping expansion is k-ary by construction — pin it at
    THREE dims with churn on all four bases in one refresh window,
    against a Python oracle."""
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(
            [(1, 10, 7, 3, 5), (2, 20, 8, 4, 7), (3, 10, 8, 3, 2),
             (4, 30, 7, 4, None)],
            "oid long, a long, b long, c long, amt long",
        ),
        key="oid", stats_cols=["a", "b", "c"],
    )
    d1 = TxTable.create(spark, tmp_path / "d1", spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "x")], "a long, va string"), key="a")
    d2 = TxTable.create(spark, tmp_path / "d2", spark.createDataFrame(
        [(7, "p"), (8, "q")], "b long, vb string"), key="b")
    d3 = TxTable.create(spark, tmp_path / "d3", spark.createDataFrame(
        [(3, "m"), (4, "n")], "c long, vc string"), key="c")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, d1,
        fk="a", group_expr=["va", "vb", "vc"],
        group_col=["va", "vb", "vc"],
        measures={"total": "amt", "n_amt": ("count", "amt"),
                  "uniq": ("distinct", "amt")},
        extra_dims=[{"dim": d2, "fk": "b"}, {"dim": d3, "fk": "c"}],
        group_dims=[0, 1, 2],
    )
    model_f = {1: (10, 7, 3, 5), 2: (20, 8, 4, 7), 3: (10, 8, 3, 2),
               4: (30, 7, 4, None)}
    m1 = {10: "x", 20: "y", 30: "x"}
    m2 = {7: "p", 8: "q"}
    m3 = {3: "m", 4: "n"}

    def expected():
        agg = {}
        for a, b, c, amt in model_f.values():
            if a in m1 and b in m2 and c in m3:
                g = agg.setdefault((m1[a], m2[b], m3[c]), [0, 0, set()])
                g[1] += 1
                if amt is not None:
                    g[0] += amt
                    g[2].add(amt)
        return {k: (s if vals else None, n, len(vals))
                for k, (s, n, vals) in agg.items()}

    def actual():
        return {(r["va"], r["vb"], r["vc"]):
                (r["total"], r["n_rows"], r["uniq"])
                for r in view.read().collect()}

    assert actual() == expected()
    assert view.applied_versions() == (0, 0, 0, 0)

    # churn ALL FOUR bases in one window
    fact.append(spark.createDataFrame(
        [(5, 20, 7, 3, 9), (6, 10, 8, 4, 5)],
        "oid long, a long, b long, c long, amt long"))
    model_f[5] = (20, 7, 3, 9)
    model_f[6] = (10, 8, 4, 5)
    fact.delete(F.col("oid") == 2, mode="dv")
    del model_f[2]
    d1.merge(spark.createDataFrame([(10, "z")], "a long, va string"))
    m1[10] = "z"
    d2.delete(F.col("b") == 7)
    del m2[7]
    d3.merge(spark.createDataFrame([(4, "o")], "c long, vc string"))
    m3[4] = "o"
    r = view.refresh()
    assert r["mode"] == "incremental" and not r["skipped"]
    assert actual() == expected()
    assert view.applied_versions() == (2, 1, 1, 1)
    # fenced replay, then recompute lands the identical state
    assert view.refresh()["skipped"]
    state = actual()
    view.refresh(mode="recompute")
    assert actual() == state == expected()


def _live_fact_files(fact):
    return {f["path"] for f in fact._manifest()["files"]}


def _fparts_files(view):
    return {
        r["__f"]
        for r in view._fparts().read().select("__f").distinct().collect()
    }


def _recompute_rows(fact, dim):
    return (
        fact.read().alias("f")
        .join(dim.read().alias("d"), F.col("f.cust") == F.col("d.cust"))
        .groupBy("seg")
        .agg(
            F.sum("amt").alias("total"),
            F.count("amt").alias("n_amt"),
            F.avg("amt").alias("mean_amt"),
            F.min("amt").alias("lo_amt"),
            F.max("amt").alias("hi_amt"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uniq_amt"),
            F.count_distinct("amt").alias("uniq_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _assert_view_equals(view, fact, dim):
    got = {
        tuple(r[c] for c in view.read().columns)
        for r in view.read().collect()
    }
    want_df = _recompute_rows(fact, dim)
    want = {tuple(r[c] for c in want_df.columns) for r in want_df.collect()}
    assert got == want, f"\nview: {sorted(got)}\nwant: {sorted(want)}"


def test_joinview_fact_delete_repairs_without_fact_read(spark, tmp_path):
    """A fact correction delete at a group's extremum must repair from
    the per-file partials support — the refresh never calls the fact's
    full-table reader (the feed and the partials' file reads are the
    only fact IO)."""
    fact = _mk_fact(
        spark, tmp_path / "f",
        [(i, i % 4, (i * 37) % 100) for i in range(40)],
    )
    dim = _mk_dim(
        spark, tmp_path / "d", [(c, f"seg{c % 3}") for c in range(4)]
    )
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    top = (
        fact.read().orderBy(F.col("amt").desc()).first()
    )
    fact.delete(F.col("oid") == top["oid"])

    def boom(*a, **kw):
        raise AssertionError("repair read the fact table")

    view.fact.read = boom
    r = view.refresh()
    assert not r["skipped"]
    view.fact = TxTable(spark, view.fact.root)
    _assert_view_equals(view, fact, dim)
    assert _fparts_files(view) == _live_fact_files(fact)


def test_joinview_dim_move_repairs_from_partials(spark, tmp_path):
    """A dim attribute update moves a customer's rows between groups —
    the group that LOST its extremum repairs from re-partialed files
    (the files holding the moved key were re-aggregated under the new
    dim state)."""
    fact = _mk_fact(
        spark, tmp_path / "f",
        [(i, i % 4, (i * 37) % 100) for i in range(40)],
    )
    dim = _mk_dim(
        spark, tmp_path / "d", [(c, f"seg{c % 2}") for c in range(4)]
    )
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    # find the customer holding the global max and move their segment
    top = (
        fact.read().alias("f")
        .join(dim.read().alias("d"), F.col("f.cust") == F.col("d.cust"))
        .orderBy(F.col("amt").desc())
        .first()
    )
    dim.update(
        F.col("cust") == top["cust"], {"seg": F.lit("segX")}
    )
    view.refresh()
    _assert_view_equals(view, fact, dim)
    assert _fparts_files(view) == _live_fact_files(fact)
    # and a follow-up fact delete in the NEW group still repairs right
    fact.delete(F.col("oid") == top["oid"])
    view.refresh()
    _assert_view_equals(view, fact, dim)


def test_joinview_fparts_crash_and_vacuum_heal(spark, tmp_path):
    """Crash between the view and _fparts commits + vacuumed window:
    catch-up rebuilds the partials wholesale at the view's cursor and
    later repairs stay exact."""
    fact = _mk_fact(
        spark, tmp_path / "f",
        [(i, i % 3, (i * 11) % 60) for i in range(30)],
    )
    dim = _mk_dim(
        spark, tmp_path / "d", [(c, f"seg{c}") for c in range(3)]
    )
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    fact.append(
        spark.createDataFrame([(500, 1, 999)], FACT_SCHEMA)
    )
    orig = TxJoinAggView._apply_fparts
    TxJoinAggView._apply_fparts = lambda self, *a, **k: None
    try:
        view.refresh()
    finally:
        TxJoinAggView._apply_fparts = orig
    fact.vacuum(retain_versions=1, min_age_s=0, force=True)
    v2 = TxJoinAggView(spark, tmp_path / "v")
    assert v2.refresh()["skipped"]  # catch-up healed, fenced skip
    assert _fparts_files(v2) == _live_fact_files(fact)
    # the healed partials repair the next extremal delete correctly
    fact.delete(F.col("oid") == 500)
    v2.refresh()
    _assert_view_equals(v2, fact, dim)


def test_joinview_fparts_random_oplog_equals_recompute(spark, tmp_path):
    """Mixed fact deletes (cow + dv), appends, dim moves and dim
    deletes: view equals recompute after every refresh and the
    partials track the live fact files throughout."""
    rng = random.Random(777)
    fact = _mk_fact(
        spark, tmp_path / "f",
        [(i, i % 5, (i * 37) % 100) for i in range(50)],
    )
    dim = _mk_dim(
        spark, tmp_path / "d", [(c, f"seg{c % 3}") for c in range(5)]
    )
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    next_id = 9000
    for step in range(5):
        op = rng.choice(
            ["append", "del_top", "del_dv", "dim_move", "dim_del"]
        )
        if op == "append":
            rows = [
                (next_id + j, rng.randint(0, 5), rng.randint(-20, 120))
                for j in range(rng.randint(1, 3))
            ]
            next_id += 10
            fact.append(spark.createDataFrame(rows, FACT_SCHEMA))
        elif op == "del_top":
            top = fact.read().orderBy(F.col("amt").desc()).first()
            if top:
                fact.delete(F.col("oid") == top["oid"])
        elif op == "del_dv":
            row = fact.read().orderBy("oid").first()
            if row:
                fact.delete(F.col("oid") == row["oid"], mode="dv")
        elif op == "dim_move":
            c = rng.randint(0, 4)
            dim.update(
                F.col("cust") == c,
                {"seg": F.lit(f"seg{rng.randint(0, 4)}")},
            )
        else:
            c = rng.randint(0, 4)
            dim.delete(F.col("cust") == c)
        view.refresh()
        _assert_view_equals(view, fact, dim)
        assert _fparts_files(view) == _live_fact_files(fact)


def test_skewed_delta_join_salts_and_matches_recompute(
    spark, tmp_path, monkeypatch
):
    """A power-law fk in a large fact delta trips the skew diagnostic:
    the ΔF ⋈ dim term salts that dim's join (hot key spread over the
    salt space — balanced task inputs), the refresh reports which dims
    salted, and the folded view state is UNCHANGED vs a recompute."""
    monkeypatch.setattr(TxJoinAggView, "SKEW_PROBE_FLOOR_ROWS", 100)
    fact = _mk_fact(
        spark, tmp_path / "f",
        [(i, i % 5, (i * 37) % 100) for i in range(20)],
    )
    dim = _mk_dim(
        spark, tmp_path / "d", [(c, f"seg{c % 3}") for c in range(5)]
    )
    view = _mk_view(spark, tmp_path / "v", fact, dim)
    # the hot delta: 90% of 4000 appended rows share cust=1
    hot = spark.range(1000, 5000, 1, 8).select(
        F.col("id").alias("oid"),
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id") % 5)
        .alias("cust"),
        (F.col("id") % 97).alias("amt"),
    )
    fact.append(hot)
    r = view.refresh()
    assert r["skew_salted_dims"] == (0,), r
    # view state identical to a full joined recompute
    got = {
        tuple(x)
        for x in view.read().collect()
    }
    want_df = (
        fact.read().alias("f")
        .join(dim.read().alias("d"), F.col("f.cust") == F.col("d.cust"))
        .groupBy("seg")
        .agg(
            F.sum("amt").alias("total"),
            F.count("amt").alias("n_amt"),
            F.avg("amt").alias("mean_amt"),
            F.min("amt").alias("lo_amt"),
            F.max("amt").alias("hi_amt"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias(
                "uniq_amt"
            ),
            F.count_distinct("amt").alias("uniq_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    want = {tuple(x) for x in want_df.collect()}
    assert got == want
    # balance: the salted join spreads the hot key across the salt
    # space — no single shuffle partition holds more than ~2x its
    # fair share of the delta (unsalted, one reducer would hold 90%)
    from data_warehouse_project_spark.operators.skew import salted_join

    churn = hot.select(F.col("cust").alias("__jk0"), "amt")
    small = dim.read().select(F.col("cust").alias("__jk0"), "seg")
    sizes = [
        r["n"]
        for r in salted_join(churn, small, "__jk0",
                             salt=TxJoinAggView.SKEW_SALT)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes)), sizes
    # a quiet follow-up delta does NOT probe or salt (below the floor)
    monkeypatch.setattr(TxJoinAggView, "SKEW_PROBE_FLOOR_ROWS", 10**6)
    fact.append(
        spark.createDataFrame([(99999, 2, 7)], FACT_SCHEMA)
    )
    r2 = view.refresh()
    assert r2["skew_salted_dims"] == ()
