"""Mergeable-histogram measures (``hist``): additive per-bin counts
([underflow, bin1..binN, overflow] over [lo, hi)) maintained by both
view classes — deletes SUBTRACT (no repair read, like SUM), rollups
are array sums, quantiles derive at read via functions/histograms.
The fixed-bin grid is chosen over KLL/t-digest precisely because it is
the only quantile summary that both merges and subtracts exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.functions.histograms import (
    hist_percentile,
    hist_total,
)
from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txrouter import AggRouter, NoRouteError
from data_warehouse_project_spark.sources.txtable import TxError, TxTable
from data_warehouse_project_spark.sources.txview import TxAggView

LO, HI, BINS = 0, 1000, 20
H = {"fn": "hist", "expr": "amt", "lo": LO, "hi": HI, "bins": BINS}


def _df(spark, n=600, extra=0):
    return spark.range(extra, n + extra, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        # values straddle the grid: some below LO, some above HI
        ((F.col("id") * 53) % 1400 - 200).alias("amt"),
    )


def _expected(df):
    idx = F.least(
        F.lit(BINS + 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("amt") - LO) * BINS / (HI - LO)) + 1,
        ),
    ).cast("int")
    return (
        df.filter(F.col("amt").isNotNull())
        .groupBy("g", idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _explode(view_df, col="h"):
    return view_df.select(
        "g", F.posexplode(F.col(col)).alias("bin", "cnt")
    ).filter(F.col("cnt") != 0)


def test_aggview_hist_folds_churn_without_repair(spark, tmp_path):
    base = TxTable.create(spark, tmp_path / "t", _df(spark), key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g", measures={"h": H}
    )
    base.append(_df(spark, n=200, extra=5000))
    base.merge(
        _df(spark).filter(F.col("k") % 9 == 0).withColumn(
            "amt", F.col("amt") + 333
        )
    )
    base.delete(F.col("k") % 7 == 0, mode="dv")
    r = view.refresh(mode="incremental")
    assert not r["skipped"]
    got = sorted(tuple(x) for x in _explode(view.read()).collect())
    want = sorted(tuple(x) for x in _expected(base.read()).collect())
    assert got == want
    # byte-identical to a from-scratch view
    fresh = TxAggView.create(
        spark, tmp_path / "v2", base, group_col="g", measures={"h": H}
    )
    assert got == sorted(
        tuple(x) for x in _explode(fresh.read()).collect()
    )


def test_joinview_hist_across_dim_moves(spark, tmp_path):
    f = _df(spark).withColumnRenamed("g", "fk")
    d = spark.range(0, 5).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("s"), F.col("id") % 2).alias("g"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr="g", group_col="g", measures={"h": H},
    )
    fact.append(_df(spark, n=150, extra=9000).withColumnRenamed("g", "fk"))
    dim.merge(
        d.filter(F.col("dk") % 2 == 0).withColumn("g", F.lit("s-MOVED"))
    )
    fact.delete(F.col("k") % 11 == 0, mode="dv")
    r = view.refresh(mode="incremental")
    assert not r["skipped"] and r["mode"] == "incremental"
    joined = fact.read().join(dim.read(), F.col("fk") == F.col("dk"))
    got = sorted(tuple(x) for x in _explode(view.read()).collect())
    want = sorted(tuple(x) for x in _expected(joined).collect())
    assert got == want


def test_hist_percentiles_and_router_rollup(spark, tmp_path):
    f = _df(spark, n=800).withColumnRenamed("g", "fk")
    d = spark.range(0, 5).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("a"), F.col("id") % 2).alias("a"),
        F.concat(F.lit("b"), F.col("id") % 3).alias("b"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr=["a", "b"], group_col=["a", "b"],
        measures={"h": H, "n": ("count", "amt")},
    )
    router = AggRouter(spark).register(view)
    got, how = router.route(["a"], {"h": H, "n": ("count", "amt")})
    assert not how["exact_grain"]
    joined = fact.read().join(dim.read(), F.col("fk") == F.col("dk"))
    want_bins = sorted(
        tuple(x)
        for x in joined.filter(F.col("amt").isNotNull())
        .groupBy(
            "a",
            F.least(
                F.lit(BINS + 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("amt") - LO) * BINS / (HI - LO)) + 1,
                ),
            ).cast("int").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    got_bins = sorted(
        tuple(x)
        for x in got.select(
            "a", F.posexplode("h").alias("bin", "cnt")
        ).filter(F.col("cnt") != 0).collect()
    )
    assert got_bins == want_bins
    # quantiles: exact to bin resolution against percentile_approx
    q = got.select(
        "a",
        hist_percentile("h", 0.5, LO, HI, BINS).alias("p50"),
        hist_total("h").alias("n2"),
        "n",
    ).collect()
    exact = {
        r["a"]: r["p50"]
        for r in joined.groupBy("a")
        .agg(F.expr("percentile(amt, 0.5)").alias("p50"))
        .collect()
    }
    width = (HI - LO) / BINS
    for r in q:
        assert r["n2"] == r["n"]
        true = min(max(exact[r["a"]], LO), HI)  # clamped like the grid
        assert abs(r["p50"] - true) <= width, (r["a"], r["p50"], true)
    # a DIFFERENT grid must refuse, not silently mix bins
    with pytest.raises(NoRouteError, match="no measure derives"):
        router.route(["a"], {"h": {**H, "bins": 10}})


def test_hist_validation_and_reader_edges(spark, tmp_path):
    base = TxTable.create(
        spark, tmp_path / "t", _df(spark, n=50), key="k"
    )
    for bad, msg in [
        ({"fn": "hist", "expr": "amt"}, "lo/hi/bins"),
        ({**H, "lo": 5, "hi": 5}, "lo < hi"),
        ({**H, "bins": 1}, "bins must be"),
        ({**H, "bins": 4096}, "bins must be"),
    ]:
        with pytest.raises(TxError, match=msg):
            TxAggView.create(
                spark, tmp_path / f"v_{msg[:2]}", base,
                group_col="g", measures={"h": bad},
            )
    with pytest.raises(ValueError, match="p must be"):
        hist_percentile("h", 0.0, LO, HI, BINS)
    # empty histogram -> NULL percentile, zero total
    df = spark.createDataFrame(
        [([0] * (BINS + 2),)], f"h array<long>"
    )
    r = df.select(
        hist_percentile("h", 0.5, LO, HI, BINS).alias("p"),
        hist_total("h").alias("t"),
    ).first()
    assert r["p"] is None and r["t"] == 0


def test_hist_random_oplog_equals_recompute(spark, tmp_path):
    """Seeded random op-log (appends, value-moving merges, dv and cow
    deletes), incremental refresh every 2 ops: the hist arrays equal a
    fresh recompute at every refresh, and a final recompute-mode
    refresh changes nothing."""
    import random

    rng = random.Random(20260816)
    rows = [
        (i, rng.randrange(4), rng.choice([None, rng.randrange(-300, 1400)]))
        for i in range(120)
    ]
    schema = "k long, g long, amt long"
    base = TxTable.create(
        spark, tmp_path / "t", spark.createDataFrame(rows, schema), key="k"
    )
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g", measures={"h": H}
    )
    model = {k: (g, a) for k, g, a in rows}
    nxt = 10_000

    def check():
        got = sorted(tuple(x) for x in _explode(view.read()).collect())
        want = sorted(
            tuple(x)
            for x in _expected(base.read()).collect()
        )
        assert got == want

    for step in range(10):
        op = rng.choice(["append", "merge", "delete"])
        if op == "append" or not model:
            nonlocal_rows = [
                (nxt + j, rng.randrange(4),
                 rng.choice([None, rng.randrange(-300, 1400)]))
                for j in range(rng.randint(1, 6))
            ]
            nxt += len(nonlocal_rows)
            base.append(spark.createDataFrame(nonlocal_rows, schema))
            model.update({k: (g, a) for k, g, a in nonlocal_rows})
        elif op == "merge":
            ids = rng.sample(sorted(model), min(4, len(model)))
            upd = [
                (k, model[k][0],
                 rng.choice([None, rng.randrange(-300, 1400)]))
                for k in ids
            ]
            base.merge(spark.createDataFrame(upd, schema))
            model.update({k: (g, a) for k, g, a in upd})
        else:
            ids = rng.sample(sorted(model), min(3, len(model)))
            base.delete(
                F.col("k").isin(ids), mode=rng.choice(["dv", "rewrite"])
            )
            for k in ids:
                del model[k]
        if step % 2 == 1:
            r = view.refresh(mode="incremental")
            assert not r.get("skipped"), r
            check()
    view.refresh(mode="incremental")
    check()
    r = view.refresh(mode="recompute")
    check()


# ------------------------------------------------ two-level (outer) grid

H2 = {"fn": "hist", "expr": "amt", "lo": LO, "hi": HI, "bins": BINS,
      "outer": 6}


def test_two_level_grid_survives_distribution_shift(spark, tmp_path):
    """outer=K geometric bins: data that OVERFLOWS the original
    [lo, hi) grid after view create still folds additively (incl.
    correction-delete subtraction) and quantiles to the containing
    outer bin's width — the view stays useful without a rebuild."""
    from data_warehouse_project_spark.sources.txview import (
        _hist_cells,
        _hist_ncells,
        _hist_outer,
    )

    base = TxTable.create(spark, tmp_path / "t", _df(spark), key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g", measures={"h": H2}
    )
    norm = view.spec["measures"]["h"]
    assert _hist_outer(norm) == 6 and _hist_ncells(norm) == BINS + 12
    # the distribution shifts: new values land 8-30x past the grid
    shifted = spark.range(20000, 20400, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        ((F.col("id") * 53) % 22000 + 8000).alias("amt"),
    )
    base.append(shifted)
    base.delete(F.col("k") % 11 == 0, mode="dv")  # incl. shifted rows
    r = view.refresh(mode="incremental")
    assert not r["skipped"]
    # folded state equals a recompute through the SAME cell mapping
    got = sorted(tuple(x) for x in _explode(view.read()).collect())
    want = sorted(
        tuple(x)
        for x in base.read()
        .filter(F.col("amt").isNotNull())
        .groupBy("g")
        .agg(F.array(*_hist_cells(F.col("amt"), norm, F.lit(1))).alias("h"))
        .select("g", F.posexplode("h").alias("bin", "cnt"))
        .filter(F.col("cnt") != 0)
        .collect()
    )
    assert got == want
    # p90 of the shifted distribution: within the containing outer
    # bin's width of the exact percentile (legacy clamp would pin it
    # to hi=1000 — orders of magnitude off)
    from data_warehouse_project_spark.functions.histograms import (
        _cell_edges,
    )

    exact = {
        row["g"]: row["p"]
        for row in base.read()
        .groupBy("g")
        .agg(F.expr("percentile(amt, 0.9)").alias("p"))
        .collect()
    }
    got_p = view.read().select(
        "g",
        hist_percentile("h", 0.9, LO, HI, BINS, outer=6).alias("p"),
    ).collect()
    ncells = BINS + 12
    for row in got_p:
        true = exact[row["g"]]
        assert true > HI, "test data must overflow the grid"
        # containing cell's width bounds the error
        widths = [
            _cell_edges(i, LO, HI, BINS, 6) for i in range(ncells)
        ]
        cell = next(
            (i for i, (left, w) in enumerate(widths)
             if left <= true < left + w),
            ncells - 1,
        )
        assert abs(row["p"] - true) <= widths[cell][1], (row, true)


def test_two_level_router_rollup_and_param_match(spark, tmp_path):
    """The router rolls two-level grids up like any hist (element-wise
    array sum) and refuses a query whose outer differs from the
    view's — silently mixing layouts would mis-bin every cell."""
    f = _df(spark).withColumnRenamed("g", "fk")
    d = spark.range(0, 5).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("s"), F.col("id") % 2).alias("seg"),
        F.col("id").alias("sub"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr=["seg", "cast(sub as bigint)"],
        group_col=["seg", "sub"], measures={"h": H2},
    )
    fact.append(
        spark.range(50000, 50200, 1, 2).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("fk"),
            ((F.col("id") * 7) % 50000).alias("amt"),  # overflows grid
        )
    )
    view.refresh()
    router = AggRouter(spark).register(view)
    routed, how = router.route(["seg"], {"h": H2})
    assert not how["exact_grain"]
    want = (
        fact.read().join(dim.read(), F.col("fk") == F.col("dk"))
        .filter(F.col("amt").isNotNull())
        .groupBy("seg")
    )
    from data_warehouse_project_spark.sources.txview import _hist_cells

    norm = view.spec["measures"]["h"]
    want = want.agg(
        F.array(*_hist_cells(F.col("amt"), norm, F.lit(1))).alias("h")
    )
    got = sorted(
        tuple(x)
        for x in routed.select(
            "seg", F.posexplode("h").alias("b", "c")
        ).collect()
    )
    exp = sorted(
        tuple(x)
        for x in want.select(
            "seg", F.posexplode("h").alias("b", "c")
        ).collect()
    )
    assert got == exp
    with pytest.raises(NoRouteError):
        router.route(["seg"], {"h": H})  # outer mismatch: refuse


def test_hist_outer_validation(spark, tmp_path):
    base = TxTable.create(spark, tmp_path / "t", _df(spark, n=50), key="k")
    with pytest.raises(TxError, match="outer"):
        TxAggView.create(
            spark, tmp_path / "v", base, group_col="g",
            measures={"h": {**H, "outer": 0}},
        )
    with pytest.raises(TxError, match="outer"):
        TxAggView.create(
            spark, tmp_path / "v2", base, group_col="g",
            measures={"h": {**H, "outer": 99}},
        )


def test_auto_grid_bounds_from_footer_stats(spark, tmp_path):
    """lo/hi='auto' (r12): grid bounds derive from the base manifest's
    footer stats at view create — zero-job for the key or a declared
    stats column, one agg otherwise — padded 25% each side, and the
    resolved ints persist in the sidecar."""
    from data_warehouse_project_spark.sources.txview import TxAggView

    df = spark.range(0, 400, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 800 + 100).alias("amt"),  # amt in [100, 499]
    )
    base = TxTable.create(
        spark, tmp_path / "t", df, key="k", stats_cols=["amt"]
    )
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"h": {"fn": "hist", "expr": "amt", "lo": "auto",
                        "hi": "auto", "bins": 20, "outer": 4}},
    )
    m = view.spec["measures"]["h"]
    # padded bounds contain the data with ~25% headroom each side
    assert m["lo"] < 100 and m["hi"] > 499, m
    assert m["lo"] >= 100 - 100 - 1 and m["hi"] <= 499 + 100 + 2, m
    # reload from the sidecar: resolved ints persisted
    again = TxAggView(spark, tmp_path / "v")
    assert again.spec["measures"]["h"]["lo"] == m["lo"]
    # the view folds churn and matches a recompute through its grid
    from data_warehouse_project_spark.sources.txview import _hist_cells

    base.append(df.select((F.col("k") + 1000).alias("k"), "g",
                          (F.col("amt") + 50).alias("amt")))
    base.delete(F.col("k") % 9 == 0, mode="dv")
    view.refresh()
    got = sorted(tuple(x) for x in _explode(view.read()).collect())
    want = sorted(
        tuple(x)
        for x in base.read()
        .filter(F.col("amt").isNotNull())
        .groupBy("g")
        .agg(F.array(*_hist_cells(F.col("amt"), m, F.lit(1))).alias("h"))
        .select("g", F.posexplode("h").alias("bin", "cnt"))
        .filter(F.col("cnt") != 0)
        .collect()
    )
    assert got == want
    # a non-stats expression falls back to one MIN/MAX agg
    view2 = TxAggView.create(
        spark, tmp_path / "v2", base, group_col="g",
        measures={"h": {"fn": "hist", "expr": "amt * 2", "lo": "auto",
                        "hi": "auto", "bins": 10}},
    )
    m2 = view2.spec["measures"]["h"]
    assert m2["lo"] < 200 and m2["hi"] > 1098, m2  # amt*2 max ~1098
    # empty base: refuse loudly rather than invent a grid
    empty = TxTable.create(
        spark, tmp_path / "e",
        spark.createDataFrame([], "k long, g long, amt long"), key="k",
    )
    with pytest.raises(TxError, match="auto bounds"):
        TxAggView.create(
            spark, tmp_path / "v3", empty, group_col="g",
            measures={"h": {"fn": "hist", "expr": "amt", "lo": "auto",
                            "hi": "auto", "bins": 10}},
        )


def test_underflow_ladder_matches_cell_edges(spark):
    """Boundary rows on the UNDERFLOW side bin into the cell whose
    _cell_edges range contains them (half-open [left, left+width) in
    value space, like the fine grid and the overflow side) — the r12
    ADVICE enumeration: lo=0, hi=100, bins=10, outer=4 puts -100,
    -300, -700 exactly on cell edges."""
    from data_warehouse_project_spark.functions.histograms import (
        _cell_edges,
    )
    from data_warehouse_project_spark.sources.txview import (
        _hist_idx,
        _norm_measures,
    )

    lo, hi, bins, k = 0, 100, 10, 4
    m = _norm_measures(
        {"h": {"fn": "hist", "expr": "v", "lo": lo, "hi": hi,
               "bins": bins, "outer": k}}
    )["h"]
    ncells = bins + 2 * k
    edges = [_cell_edges(i, lo, hi, bins, k) for i in range(ncells)]
    # every edge value (both sides), plus one-off neighbours and the
    # beyond-the-ladder extremes that land in the catch-all cells
    vals = sorted(
        {int(left) for left, _ in edges}
        | {int(left) - 1 for left, _ in edges}
        | {int(left + w) - 1 for left, w in edges}
        | {-10_000, 10_000, -100, -300, -700}
    )
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", _hist_idx(F.col("v"), m).alias("i"))
        .collect()
    )
    for r in rows:
        v, i = r["v"], r["i"]
        left, w = edges[i]
        if i == 0:  # farthest underflow cell is the catch-all
            assert v < left + w, (v, i, edges[i])
        elif i == ncells - 1:  # farthest overflow cell: catch-all
            assert v >= left, (v, i, edges[i])
        else:
            assert left <= v < left + w, (v, i, edges[i])
