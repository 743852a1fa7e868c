"""Bounded-state heavy hitters (``topk_approx``, r12 verdict item 4):
Misra-Gries registers carried as ONE map column per group (plus an
exact error counter) — no support table, so state is m registers per
group regardless of the value domain. Contract (insert-side):

    true(v) - err_g <= est(v) <= true(v)     (est 0 if absent)
    any value with true(v) > err_g is IN the registers
    err_g <= inserted_weight(g) / (m + 1)

Folds are pure Column expressions (map_zip_with merge + one compress);
summaries MERGE across groups (Agarwal et al. 2012), which the router
uses for coarser/global grains. Correction deletes clamp registers at
0 and may drift below the bound (documented); exact `topk` remains the
churn-exact choice.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txrouter import AggRouter, NoRouteError
from data_warehouse_project_spark.sources.txtable import TxError, TxTable
from data_warehouse_project_spark.sources.txview import TxAggView

SCHEMA = "oid long, g long, v string"


def _skewed(base_oid, groups=3, heavies=5, heavy_n=80, tail=150):
    rows, oid = [], base_oid
    for g in range(groups):
        for h in range(heavies):
            for _ in range(heavy_n + 10 * h):
                rows.append((oid, g, f"h{h}"))
                oid += 1
        for t in range(tail):
            rows.append((oid, g, f"t{t:04d}"))
            oid += 1
    return rows


def _exact(fact):
    return {
        (r["g"], r["v"]): r["c"]
        for r in fact.read()
        .groupBy("g", "v")
        .agg(F.count("*").alias("c"))
        .collect()
    }


def _check_bounds(view, fact, n="top"):
    """The MG invariant on every register, plus the guarantee that
    every value with true > err appears among the registers (checked
    through the raw map column, not just the top-k display)."""
    exact = _exact(fact)
    regs_rows = view.table.read().select(
        "g", F.col(f"__a_{n}").alias("regs"), F.col(f"__ae_{n}").alias("err")
    ).collect()
    by_g = {r["g"]: (r["regs"], r["err"]) for r in regs_rows}
    for (g, v), true in exact.items():
        regs, err = by_g[g]
        est = regs.get(v, 0)
        assert est <= true, (g, v, est, true)
        if v in regs:
            assert true - err <= est, (g, v, est, true, err)
        else:
            assert true <= err, f"heavy value missing: {(g, v, true, err)}"
    return by_g


def test_create_fold_bounds_and_state_size(spark, tmp_path):
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(_skewed(0), SCHEMA), key="oid",
    )
    M = 32
    view = TxAggView.create(
        spark, tmp_path / "v", fact, group_col="g",
        measures={"top": {"fn": "topk_approx", "expr": "v", "k": 5,
                          "m": M}},
    )
    by_g = _check_bounds(view, fact)
    # STATE SIZE PIN: never more than m registers per group, however
    # many distinct values flowed through (the whole point vs `topk`)
    assert all(len(regs) <= M for regs, _ in by_g.values())
    assert not (tmp_path / "v" / "_vals_top").exists()  # no support

    # fold a second wave (new heavy h9 + more weight on h1)
    wave = [(10**6 + i, i % 3, "h9") for i in range(900)] + [
        (2 * 10**6 + i, i % 3, "h1") for i in range(450)
    ]
    fact.append(spark.createDataFrame(wave, SCHEMA))
    r = view.refresh(mode="incremental")
    assert r["mode"] == "incremental" and not r["skipped"], r
    by_g = _check_bounds(view, fact)
    assert all(len(regs) <= M for regs, _ in by_g.values())
    # err stays under inserted_weight/(m+1) per group
    ins = {
        r["g"]: r["c"]
        for r in fact.read().groupBy("g").agg(
            F.count("*").alias("c")
        ).collect()
    }
    for g, (_, err) in by_g.items():
        assert err <= ins[g] / (M + 1), (g, err, ins[g])
    # display: rank/value/cnt struct array, top-k by est desc
    row = view.read().filter(F.col("g") == 0).first()
    assert [e["rank"] for e in row["top"]] == [1, 2, 3, 4, 5]
    assert row["top"][0]["value"] in ("h9", "h1")  # the new heavies
    assert row["top_err"] == by_g[0][1]


def test_deletes_clamp_and_never_crash(spark, tmp_path):
    """Correction deletes subtract from matching registers (clamped at
    0). The insert-side invariant est <= true can drift only BELOW —
    never over-counting a value — and the fold stays green."""
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(_skewed(0), SCHEMA), key="oid",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", fact, group_col="g",
        measures={"top": {"fn": "topk_approx", "expr": "v", "k": 5,
                          "m": 32}},
    )
    fact.delete(F.col("v") == "h0", mode="dv")  # kill a heavy entirely
    fact.delete(F.col("v") == "h1", mode="dv")
    assert not view.refresh(mode="incremental")["skipped"]
    exact = _exact(fact)
    for r in view.table.read().select(
        "g", F.col("__a_top").alias("regs")
    ).collect():
        for v, est in r["regs"].items():
            assert est <= exact.get((r["g"], v), 0), (r["g"], v, est)
        assert "h0" not in r["regs"] and "h1" not in r["regs"]
    # recompute converges to the exact-snapshot MG state
    view.refresh(mode="recompute")
    _check_bounds(view, fact)


def test_fold_intermediates_bounded_high_cardinality(spark, tmp_path):
    """r14 (r13 verdict item 1): the incremental fold's merge operands
    stay <= m-entry maps even when ONE group's churn window carries
    1e5 distinct values — the regime the measure exists for. The old
    fold packed the window's exact per-value deltas into one map cell
    per group (O(window distinct values) in a single row); the r14
    fold pre-compresses inserts to <= m registers (shed weight charged
    to err) and restricts deletes to registered values, so the delta
    map is <= 2m entries by construction. Checked white-box on the
    actual operand frame the refresh folds, then the MG invariants on
    the refreshed state."""
    from data_warehouse_project_spark.sources.txview import _signed

    M = 16
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(_skewed(0, groups=1), SCHEMA), key="oid",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", fact, group_col="g",
        measures={"top": {"fn": "topk_approx", "expr": "v", "k": 5,
                          "m": M}},
    )
    # churn window: 100_000 distinct singleton values + 2 heavies, all
    # in group 0 (spark.range — no driver-side row materialization)
    n_distinct = 100_000
    wave = spark.range(n_distinct).select(
        (F.col("id") + 10**7).alias("oid"),
        F.lit(0).cast("long").alias("g"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("v"),
    )
    heavy = spark.range(3000).select(
        (F.col("id") + 2 * 10**7).alias("oid"),
        F.lit(0).cast("long").alias("g"),
        F.concat(F.lit("H"), (F.col("id") % 2).cast("string")).alias("v"),
    )
    fact.append(wave.unionByName(heavy))
    # WHITE-BOX PIN: the bounded operand frame this refresh will fold
    churn = _signed(
        fact.read_changes(
            view.applied_base_version() + 1, fact.latest_version()
        )
    )
    dmf = view._mg_delta_frame(churn, "top")
    mx = dmf.agg(F.max(F.size("__dm")).alias("mx")).first()["mx"]
    assert mx is not None and mx <= 2 * M, mx
    r = view.refresh(mode="incremental")
    assert r["mode"] == "incremental" and not r["skipped"], r
    by_g = _check_bounds(view, fact)  # full per-value MG invariant
    assert all(len(regs) <= M for regs, _ in by_g.values())
    # the two heavies (1500 inserts each) must be registered: their
    # true count dwarfs err (<= inserted_weight / (m+1))
    regs, err = by_g[0]
    assert "H0" in regs and "H1" in regs, (sorted(regs)[:5], err)
    ins = fact.read().filter(F.col("g") == 0).count()
    assert err <= ins / (M + 1), (err, ins)


def test_delete_drift_surfaced_at_read(spark, tmp_path):
    """r14 (r13 verdict item 5): a delete-heavy op-log makes the
    ``{n}_deleted`` drift column nonzero and the widened bound
    true ∈ [est, est + err + deleted] still contains the exact count
    for every registered value — ``{n}_err`` alone only bounds the
    insert-side undercount."""
    M = 8
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(_skewed(0, groups=2), SCHEMA), key="oid",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", fact, group_col="g",
        measures={"top": {"fn": "topk_approx", "expr": "v", "k": 5,
                          "m": M}},
    )
    # default read shape unchanged; include_error adds the drift twin
    assert "top_deleted" not in view.read().columns
    assert view.read(include_error=True).columns == [
        "g", "top", "top_err", "top_deleted", "n_rows"
    ]
    assert all(
        r["top_deleted"] == 0
        for r in view.read(include_error=True).collect()
    )
    # delete-heavy churn: kill one heavy outright, halve another
    fact.delete(F.col("v") == "h0", mode="dv")
    fact.delete((F.col("v") == "h1") & (F.col("oid") % 2 == 0), mode="dv")
    assert not view.refresh(mode="incremental")["skipped"]
    exact = _exact(fact)
    rows = view.table.read().select(
        "g", "__a_top", "__ae_top", "__ad_top"
    ).collect()
    for row in rows:
        assert row["__ad_top"] > 0, row  # the drift column moved
        for v, est in row["__a_top"].items():
            t = exact.get((row["g"], v), 0)
            assert est <= t, (row["g"], v, est, t)
            assert t <= est + row["__ae_top"] + row["__ad_top"], (
                row["g"], v, est, t, row["__ae_top"], row["__ad_top"],
            )
    # recompute resets the drift accumulator (fresh exact state) — move
    # the base first, else the fenced recompute is a replay skip
    fact.append(
        spark.createDataFrame([(10**9, 0, "h2"), (10**9 + 1, 1, "h2")],
                              SCHEMA)
    )
    assert not view.refresh(mode="recompute")["skipped"]
    assert all(
        r["top_deleted"] == 0
        for r in view.read(include_error=True).collect()
    )


def test_reserved_err_name_collision(spark, tmp_path):
    """r13 ADVICE: a sibling measure (or the group column) literally
    named '{n}_err' / '{n}_deleted' of a topk_approx measure would
    produce duplicate output columns at read/route time — rejected at
    create."""
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame([(0, 0, "a")], SCHEMA), key="oid",
    )
    with pytest.raises(TxError, match="collide"):
        TxAggView.create(
            spark, tmp_path / "v", fact, group_col="g",
            measures={
                "top": {"fn": "topk_approx", "expr": "v", "k": 3},
                "top_err": ("count", "oid"),
            },
        )
    with pytest.raises(TxError, match="collide"):
        TxAggView.create(
            spark, tmp_path / "v2", fact, group_col="top_deleted",
            measures={"top": {"fn": "topk_approx", "expr": "v", "k": 3}},
        )


def test_join_view_topk_approx(spark, tmp_path):
    """r14 (r13 verdict item 4): topk_approx on a JOIN view — the MG
    fold is measure-local, so every delta term of the trilinear
    decomposition (fact churn AND a dim change re-bucketing a key's
    fact rows between groups) lands as the same per-(group, value)
    net signed deltas. Checked against a joined exact recompute after
    every fold; the dim-move drift rides the __ad accumulator."""
    M = 32
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(_skewed(0, groups=4), SCHEMA), key="oid",
    )
    dim = TxTable.create(
        spark, tmp_path / "d",
        spark.createDataFrame(
            [(0, "A"), (1, "A"), (2, "B"), (3, "B")],
            "g long, seg string",
        ),
        key="g",
    )
    view = TxJoinAggView.create(
        spark, tmp_path / "jv", fact, dim, fk="g",
        group_expr="seg", group_col="seg",
        measures={
            "top": {"fn": "topk_approx", "expr": "v", "k": 5, "m": M},
            "n": ("count", "oid"),
        },
    )

    def exact():
        return {
            (r["seg"], r["v"]): r["c"]
            for r in fact.read()
            .join(dim.read(), "g")
            .groupBy("seg", "v")
            .agg(F.count("*").alias("c"))
            .collect()
        }

    def check(insert_only: bool):
        ex = exact()
        rows = view.table.read().select(
            "seg", "__a_top", "__ae_top", "__ad_top"
        ).collect()
        for r in rows:
            assert len(r["__a_top"]) <= M
            for v, est in r["__a_top"].items():
                t = ex.get((r["seg"], v), 0)
                assert est <= t, (r["seg"], v, est, t)
                bound = r["__ae_top"] + (
                    0 if insert_only else r["__ad_top"]
                )
                assert t - bound <= est, (r["seg"], v, est, t, bound)
        return {r["seg"]: r for r in rows}

    check(insert_only=True)
    # fact churn: a new joint heavy across both segments
    fact.append(
        spark.createDataFrame(
            [(10**6 + i, i % 4, "J0") for i in range(400)], SCHEMA
        )
    )
    assert not view.refresh(mode="incremental")["skipped"]
    by_seg = check(insert_only=True)
    assert "J0" in by_seg["A"]["__a_top"]
    # display surface: err + (include_error) deleted ride along
    out = view.read(include_error=True)
    assert out.columns == [
        "seg", "top", "top_err", "top_deleted", "n", "n_rows"
    ]
    # dim churn: move g=1 from A to B — the re-bucketing term's
    # negative side clamps A's registers; drift lands in __ad
    dim.merge(spark.createDataFrame([(1, "B")], "g long, seg string"))
    assert not view.refresh(mode="incremental")["skipped"]
    by_seg = check(insert_only=False)
    assert by_seg["A"]["__ad_top"] > 0  # the move was accounted
    # routed through the navigator: join-view MG measures merge at any
    # grain (exact + global), and include_error carries the merged
    # delete-side weight so the widened bound survives re-aggregation
    router = AggRouter(spark).register(view)
    ex = exact()
    rout, how = router.route(
        ["seg"], {"top": {"fn": "topk_approx", "expr": "v", "k": 5}},
        include_error=True,
    )
    assert how["kind"] == "join" and how["support_rows"] == 0, how
    for r in rout.collect():
        assert r["top_deleted"] >= 0
        for e in r["top"]:
            t = ex.get((r["seg"], e["value"]), 0)
            assert e["cnt"] <= t
            assert t <= e["cnt"] + r["top_err"] + r["top_deleted"]
    g_ex = {}
    for (seg, v), c in ex.items():
        g_ex[v] = g_ex.get(v, 0) + c
    grow = router.route(
        [], {"top": {"fn": "topk_approx", "expr": "v", "k": 4}},
        include_error=True,
    )[0].collect()[0]
    for e in grow["top"]:
        t = g_ex.get(e["value"], 0)
        assert e["cnt"] <= t
        assert t <= e["cnt"] + grow["top_err"] + grow["top_deleted"]
    # global heavies: h4 (120x4), h3 (110x4), J0 (400) lead the merge
    assert {"h4", "h3", "J0"} <= {e["value"] for e in grow["top"]}
    # recompute converges to the exact-snapshot MG state (and the
    # incremental state equals a recompute for the display top-k)
    fact.append(spark.createDataFrame([(2 * 10**6, 0, "J0")], SCHEMA))
    assert not view.refresh(mode="recompute")["skipped"]
    check(insert_only=True)


def test_router_exact_global_and_refusals(spark, tmp_path):
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame(_skewed(0, groups=6), SCHEMA), key="oid",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", fact, group_col="g",
        measures={
            "top": {"fn": "topk_approx", "expr": "v", "k": 5, "m": 32},
            "n": ("count", "oid"),
        },
    )
    router = AggRouter(spark).register(view)
    # exact grain: registers pass through (any k <= m)
    out, how = router.route(
        ["g"], {"top": {"fn": "topk_approx", "expr": "v", "k": 3}}
    )
    assert how["support_rows"] == 0  # bounded state: nothing extra
    exact = _exact(fact)
    for r in out.collect():
        err = r["top_err"]
        for e in r["top"]:
            t = exact[(r["g"], e["value"])]
            assert t - err <= e["cnt"] <= t
    # GLOBAL rollup: the multi-cell register merge (6 cells -> 1),
    # err = sum of cell errs + the merge compress subtraction
    gout, ghow = router.route(
        [], {"top": {"fn": "topk_approx", "expr": "v", "k": 4},
             "n": ("count", "oid")}
    )
    grow = gout.collect()[0]
    g_exact = {
        r["v"]: r["c"]
        for r in fact.read().groupBy("v").agg(
            F.count("*").alias("c")
        ).collect()
    }
    for e in grow["top"]:
        t = g_exact[e["value"]]
        assert t - grow["top_err"] <= e["cnt"] <= t
    assert grow["n"] == fact.row_count()
    # k beyond the view's registers: refuse with a named reason
    with pytest.raises(NoRouteError):
        router.route(
            ["g"], {"top": {"fn": "topk_approx", "expr": "v", "k": 64,
                            "m": 64}}
        )
    # GLOBAL grain over SUPPORT-backED measures (r14; refused through
    # r13): exact topk re-ranks the support in two phases (per-value
    # counts shuffled on value, then TakeOrderedAndProject head) and
    # exact distinct is a two-phase global count_distinct — both
    # distributed, both charged support rows by the cost model
    view2 = TxAggView.create(
        spark, tmp_path / "v2", fact, group_col="g",
        measures={
            "top": {"fn": "topk", "expr": "v", "k": 5},
            "nv": ("distinct", "v"),
        },
    )
    r2 = AggRouter(spark).register(view2)
    g2out, g2how = r2.route(
        [], {"top": {"fn": "topk", "expr": "v", "k": 5},
             "nv": ("distinct", "v")}
    )
    assert g2how["support_rows"] > 0  # support reads are charged
    g2row = g2out.collect()[0]
    expected = sorted(g_exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(e["value"], e["cnt"]) for e in g2row["top"]] == expected
    assert [e["rank"] for e in g2row["top"]] == [1, 2, 3, 4, 5]
    assert g2row["nv"] == len(g_exact)


def test_param_validation(spark, tmp_path):
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame([(0, 0, "a")], SCHEMA), key="oid",
    )
    with pytest.raises(TxError, match="needs integer k"):
        TxAggView.create(
            spark, tmp_path / "v", fact, group_col="g",
            measures={"t": {"fn": "topk_approx", "expr": "v"}},
        )
    with pytest.raises(TxError, match="registers"):
        TxAggView.create(
            spark, tmp_path / "v", fact, group_col="g",
            measures={"t": {"fn": "topk_approx", "expr": "v", "k": 10,
                            "m": 5}},
        )
