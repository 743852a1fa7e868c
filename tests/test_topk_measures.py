"""Exact TOP-K (heavy hitters) view measure: per-group top-k values by
occurrence count, ranked at read time from the same per-(group, value)
occurrence support the exact-distinct measure maintains — additively
folded (deletes subtract, no repair read, no sketch error), ties broken
deterministically (count desc, value asc).

Reference parity: the reference's rollup reports pick top groups by
re-deriving whole aggregates each run (dw_etl_tests.py:480-506); the
topk measure keeps the answer maintained under churn at O(churn).
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txtable import TxError, TxTable
from data_warehouse_project_spark.sources.txview import TxAggView


def _py_topk(rows, k):
    """Python oracle: rows = iterable of (g, v)."""
    cnt = collections.defaultdict(collections.Counter)
    for g, v in rows:
        if v is not None:
            cnt[g][v] += 1
    out = {}
    for g, c in cnt.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[g] = [(i + 1, v, n) for i, (v, n) in enumerate(ranked)]
    return out


def _got_topk(view, col="top"):
    return {
        r["g"]: [(x["rank"], x["value"], x["cnt"]) for x in (r[col] or [])]
        for r in view.read().collect()
    }


def test_topk_random_oplog_equals_oracle(spark, tmp_path):
    """Seeded op-log (appends, cow + dv deletes, value updates): after
    every refresh the ranked arrays equal the Python oracle, and the
    all-null group reads NULL (COUNT-family semantics)."""
    import random

    rng = random.Random(1212)
    rows = [(i, i % 4, (i * 13) % 9) for i in range(80)]
    base = TxTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame(rows, "k long, g long, v long"),
        key="k",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"top": {"fn": "topk", "expr": "v", "k": 3},
                  "uniq": ("distinct", "v")},
    )
    model = {i: (i % 4, (i * 13) % 9) for i in range(80)}
    next_id = 9000
    for step in range(6):
        op = rng.choice(["append", "del", "del_dv", "update", "null_in"])
        if op == "append":
            batch = [
                (next_id + j, rng.randint(0, 4), rng.randint(0, 10))
                for j in range(rng.randint(1, 5))
            ]
            next_id += 10
            for r in batch:
                model[r[0]] = (r[1], r[2])
            base.append(
                spark.createDataFrame(batch, "k long, g long, v long")
            )
        elif op in ("del", "del_dv") and model:
            victim = rng.choice(sorted(model))
            base.delete(
                F.col("k") == victim,
                mode="dv" if op == "del_dv" else "rewrite",
            )
            del model[victim]
        elif op == "update" and model:
            victim = rng.choice(sorted(model))
            nv = rng.randint(0, 10)
            base.update(F.col("k") == victim, {"v": F.lit(nv).cast("long")})
            model[victim] = (model[victim][0], nv)
        else:
            base.append(
                spark.createDataFrame(
                    [(next_id, 9, None)], "k long, g long, v long"
                )
            )
            model[next_id] = (9, None)
            next_id += 1
        view.refresh()
        got = _got_topk(view)
        want = _py_topk(model.values(), 3)
        groups = {g for g, _ in model.values()}
        for g in groups:
            assert got.get(g, []) == want.get(g, []), (step, g)
        # distinct rides the same support family unharmed
        uniq = {r["g"]: r["uniq"] for r in view.read().collect()}
        for g in groups:
            want_u = len({v for gg, v in model.values()
                          if gg == g and v is not None})
            assert uniq[g] == want_u, (step, g)


def test_topk_lagging_support_read_refuses_then_heals(spark, tmp_path):
    """A crash between the view and support commits leaves the support
    lagging: read() REFUSES the mismatched pair loudly; the next
    refresh's catch-up heals it and read() ranks correctly."""
    base = TxTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame(
            [(i, i % 2, i % 3) for i in range(30)], "k long, g long, v long"
        ),
        key="k",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"top": {"fn": "topk", "expr": "v", "k": 2}},
    )
    base.append(
        spark.createDataFrame([(100, 0, 2), (101, 0, 2)],
                              "k long, g long, v long")
    )
    orig = TxAggView._apply_support
    TxAggView._apply_support = lambda self, sup, dv, fence: None
    try:
        view.refresh()
    finally:
        TxAggView._apply_support = orig
    with pytest.raises(TxError, match="support cursor"):
        view.read().collect()
    v2 = TxAggView(spark, tmp_path / "v")
    assert v2.refresh()["skipped"]  # catch-up heals, then fenced skip
    rows = base.read().select("g", "v").collect()
    want = _py_topk([(r["g"], r["v"]) for r in rows], 2)
    assert _got_topk(v2) == want


def test_topk_joinview_across_dim_moves(spark, tmp_path):
    """Join-view topk: a dim move re-attributes a customer's rows to a
    new group; the support folds BOTH feeds and read() ranks the new
    grouping exactly."""
    f = spark.createDataFrame(
        [(i, i % 3, (i * 7) % 5) for i in range(60)],
        "k long, fk long, v long",
    )
    d = spark.createDataFrame(
        [(c, f"g{c % 2}") for c in range(3)], "dk long, g string"
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr="g", group_col="g",
        measures={"top": {"fn": "topk", "expr": "v", "k": 2}},
    )
    dim.update(F.col("dk") == 0, {"g": F.lit("gMOVED")})
    fact.delete(F.col("k") % 5 == 0, mode="dv")
    view.refresh()
    dmap = {r["dk"]: r["g"] for r in dim.read().collect()}
    rows = [
        (dmap[r["fk"]], r["v"])
        for r in fact.read().collect()
        if r["fk"] in dmap
    ]
    assert _got_topk(view) == _py_topk(rows, 2)


def test_topk_validation_and_router_refusal(spark, tmp_path):
    base = TxTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0, 1)], "k long, g long, v long"),
        key="k",
    )
    for bad, msg in [
        ({"fn": "topk", "expr": "v"}, "needs integer k"),
        ({"fn": "topk", "expr": "v", "k": 0}, "k must be"),
        ({"fn": "topk", "expr": "v", "k": 5000}, "k must be"),
    ]:
        with pytest.raises(TxError, match=msg):
            TxAggView.create(
                spark, tmp_path / f"v{bad.get('k', 'x')}", base,
                group_col="g", measures={"top": bad},
            )
    # topk routes through the support — at the exact grain too
    from data_warehouse_project_spark.sources.txrouter import AggRouter

    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"top": {"fn": "topk", "expr": "v", "k": 2}},
    )
    routed, how = AggRouter(spark).register(view).route(
        ["g"], {"top": {"fn": "topk", "expr": "v", "k": 2}}
    )
    assert routed.collect()[0]["top"] == [(1, 1, 1)]


def test_routed_topk_rolls_up_support_counts(spark, tmp_path):
    """Coarse topk through the navigator: the support's full
    per-(group, value) counts SUM to the coarse grain and re-rank —
    exact for ANY requested k (the view stores no topk column), pinned
    equal to a direct base derivation; a torn support falls back /
    refuses like distinct."""
    f = spark.createDataFrame(
        [(i, i % 6, (i * 7) % 5) for i in range(90)],
        "k long, fk long, v long",
    )
    d = spark.createDataFrame(
        [(c, f"g{c % 2}", c % 3) for c in range(6)],
        "dk long, g string, sub long",
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr=["g", "cast(sub as bigint)"], group_col=["g", "sub"],
        measures={"top": {"fn": "topk", "expr": "v", "k": 4}},
    )
    fact.delete(F.col("k") % 7 == 0, mode="dv")
    view.refresh()
    from data_warehouse_project_spark.sources.txrouter import AggRouter

    # coarse grain AND a different k than the view's
    routed, how = AggRouter(spark).register(view).route(
        ["g"], {"top": {"fn": "topk", "expr": "v", "k": 2}}
    )
    assert not how["exact_grain"]
    got = {
        r["g"]: [(x["rank"], x["value"], x["cnt"]) for x in (r["top"] or [])]
        for r in routed.collect()
    }
    dmap = {r["dk"]: r["g"] for r in dim.read().collect()}
    rows = [
        (dmap[r["fk"]], r["v"])
        for r in fact.read().collect()
        if r["fk"] in dmap and r["v"] is not None
    ]
    want = _py_topk(rows, 2)
    assert got == want, (got, want)
