"""Aggregate navigation (sources/txrouter.AggRouter): routed answers
must equal a direct base recompute at every grain, and every unsound
route must be refused with a named reason.

Reference parity: the reference's BI layer reads hand-picked gold
rollups (readme.md Data Analysis; dw_etl_tests.py:470-506); the router
automates the choice and adds sound roll-up compensation.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txrouter import AggRouter, NoRouteError
from data_warehouse_project_spark.sources.txtable import TxError, TxTable
from data_warehouse_project_spark.sources.txview import TxAggView

from tests.conftest import SF_SMOKE


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


@pytest.fixture(scope="module")
def star(spark):
    """A fact ⋈ dim star over sf0.001 orders/customer with CHURN
    already applied (append + dim move + deletes), one join view at
    grain (seg, nk), one at grain (seg), and one single-table agg view
    — the candidate pool every test routes against."""
    tmp = tempfile.mkdtemp(prefix="router_")
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
        )
    )
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    fact = TxTable.create(spark, tmp + "/fact", o, key="ok", stats_cols=["ck"])
    dim = TxTable.create(spark, tmp + "/dim", c, key="c_custkey")
    measures = {
        "rev": "amt",
        "n": ("count", "amt"),
        "avg_amt": ("avg", "amt"),
        "min_amt": ("min", "amt"),
        "max_amt": ("max", "amt"),
        "buyers": ("distinct", "ck"),
        "approx_buyers": ("approx_distinct", "ck"),
    }
    fine = TxJoinAggView.create(
        spark, tmp + "/fine", fact, dim, fk="ck",
        group_expr=["seg0", "nk"], group_col=["seg", "nk"],
        measures=measures,
    )
    coarse = TxJoinAggView.create(
        spark, tmp + "/coarse", fact, dim, fk="ck",
        group_expr="seg0", group_col="seg",
        measures={"rev": "amt", "n": ("count", "amt")},
    )
    by_cust = TxAggView.create(
        spark, tmp + "/by_cust", fact, group_col="ck",
        measures={
            "rev": "amt",
            "n": ("count", "amt"),
            "avg_amt": ("avg", "amt"),
            "orders": ("distinct", "ok"),
        },
    )
    # churn: late append, a segment move, a dim delete, a fact dv
    # delete killing extrema — then refresh everything incrementally
    fact.append(
        o.filter(F.col("ok") % 5 == 0).select(
            (F.col("ok") + 10_000_000).alias("ok"), "ck",
            (F.col("amt") * 2).alias("amt"),
        )
    )
    dim.merge(
        c.filter(F.col("c_custkey") % 11 == 0).withColumn(
            "seg0", F.lit("MOVED")
        )
    )
    dim.delete(F.col("c_custkey") % 13 == 0)
    fact.delete(F.col("ok") % 7 == 0, mode="dv")
    for v in (fine, coarse, by_cust):
        v.refresh(mode="incremental")
    # frames pinned at the refreshed state (read() resolves the
    # manifest NOW, so later fixture-mutating tests don't shift them)
    base = {
        "fact_df": fact.read(),
        "dim_df": dim.read(),
        "joined": fact.read().join(
            dim.read(), F.col("ck") == F.col("c_custkey")
        ),
    }
    yield {
        "spark": spark, "tmp": tmp, "fact": fact, "dim": dim,
        "fine": fine, "coarse": coarse, "by_cust": by_cust, **base,
    }
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture()
def router(star):
    return (
        AggRouter(star["spark"])
        .register(star["fine"])
        .register(star["coarse"])
        .register(star["by_cust"])
    )


def test_exact_grain_matches_recompute(star, router):
    df, how = router.route(
        ["seg", "nk"],
        {"rev": "amt", "n": ("count", "amt"), "buyers": ("distinct", "ck")},
    )
    assert how["exact_grain"] and how["view"].endswith("fine")
    want = star["joined"].groupBy(
        F.col("seg0").alias("seg"), "nk"
    ).agg(
        F.sum("amt").alias("rev"),
        F.count("amt").alias("n"),
        F.count_distinct("ck").alias("buyers"),
    )
    assert _rows(df, "seg", "nk") == _rows(want, "seg", "nk")


def test_rollup_all_fns_match_recompute(star, router):
    """Coarser grain (seg from (seg, nk)): every re-aggregable fn."""
    df, how = router.route(
        ["seg"],
        {
            "rev": "amt",
            "n": ("count", "amt"),
            "avg_amt": ("avg", "amt"),
            "min_amt": ("min", "amt"),
            "max_amt": ("max", "amt"),
            "rows": ("count", "*"),
        },
    )
    # both the fine view (rolled up) and the coarse view qualify for
    # sum/count, but only fine carries avg/min/max — decision must name
    # a view that actually derives everything
    assert how["view"].endswith("fine") and not how["exact_grain"]
    want = star["joined"].groupBy(F.col("seg0").alias("seg")).agg(
        F.sum("amt").alias("rev"),
        F.count("amt").alias("n"),
        F.avg("amt").alias("avg_amt"),
        F.min("amt").alias("min_amt"),
        F.max("amt").alias("max_amt"),
        F.count(F.lit(1)).alias("rows"),
    )
    got, exp = _rows(df, "seg"), _rows(want, "seg")
    assert [r[:3] + r[4:] for r in got] == [r[:3] + r[4:] for r in exp]
    for g, e in zip(got, exp):  # avg (index 3): float compare
        assert g[3] == pytest.approx(e[3], rel=1e-12)


def test_rollup_exact_distinct_via_support(star, router):
    df, _ = router.route(["seg"], {"buyers": ("distinct", "ck")})
    want = star["joined"].groupBy(F.col("seg0").alias("seg")).agg(
        F.count_distinct("ck").alias("buyers")
    )
    assert _rows(df, "seg") == _rows(want, "seg")


def test_rollup_approx_distinct_sketch_union(star, router):
    df, _ = router.route(["seg"], {"ab": ("approx_distinct", "ck")})
    want = star["joined"].groupBy(F.col("seg0").alias("seg")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("ck")).alias("ab")
    )
    # register-wise max union == direct sketch of the same rows
    assert _rows(df, "seg") == _rows(want, "seg")


def test_where_on_group_cols_pushes_and_matches(star, router):
    df, _ = router.route(
        ["seg"],
        {"rev": "amt", "buyers": ("distinct", "ck")},
        where="seg <> 'MOVED' and seg like '%A%'",
    )
    want = (
        star["joined"]
        .filter((F.col("seg0") != "MOVED") & F.col("seg0").like("%A%"))
        .groupBy(F.col("seg0").alias("seg"))
        .agg(
            F.sum("amt").alias("rev"),
            F.count_distinct("ck").alias("buyers"),
        )
    )
    assert _rows(df, "seg") == _rows(want, "seg")


def test_cheapest_candidate_wins(star, router):
    """seg-only sum/count is answerable by BOTH join views; the coarse
    one has fewer materialized rows and must win."""
    _, how = router.route(["seg"], {"rev": "amt", "n": ("count", "amt")})
    assert how["view"].endswith("coarse")
    assert how["exact_grain"]
    n_fine = star["fine"].table.row_count()
    assert how["view_rows"] <= n_fine


def test_single_table_view_routes(star, router):
    df, how = router.route(
        ["ck"], {"orders": ("distinct", "ok"), "rev": "amt"},
        where="ck % 10 = 3",
    )
    assert how["kind"] == "agg"
    want = (
        star["fact_df"]
        .filter(F.col("ck") % 10 == 3)
        .groupBy("ck")
        .agg(
            F.count_distinct("ok").alias("orders"),
            F.sum("amt").alias("rev"),
        )
    )
    assert _rows(df, "ck") == _rows(want, "ck")


def test_refusals_name_reasons(router):
    # unknown grain
    with pytest.raises(NoRouteError, match="group column"):
        router.route(["warehouse"], {"rev": "amt"})
    # measure expression no view carries
    with pytest.raises(NoRouteError, match="no measure derives"):
        router.route(["seg"], {"x": ("sum", "amt * 3")})
    # min is not derivable from a sum-only view, nor carried coarsely
    with pytest.raises(NoRouteError) as ei:
        router.route(["nk"], {"m": ("min", "ck")})
    assert "no measure derives" in str(ei.value)
    # filter touching a non-group column
    with pytest.raises(NoRouteError, match="filter not expressible"):
        router.route(["seg"], {"rev": "amt"}, where="amt > 100")


def test_distinct_and_approx_are_not_interchangeable(star, router):
    """Exact distinct must never be derived from an approx sketch and
    vice versa: the coarse view (no distinct measures at all) and a
    fine view carrying approx-only for a given expr both refuse."""
    with pytest.raises(NoRouteError, match="no measure derives"):
        router.route(["seg"], {"b": ("distinct", "amt")})
    only_approx = AggRouter(star["spark"]).register(star["coarse"])
    with pytest.raises(NoRouteError, match="no measure derives"):
        only_approx.route(["seg"], {"b": ("distinct", "ck")})
    with pytest.raises(NoRouteError, match="no measure derives"):
        only_approx.route(["seg"], {"b": ("approx_distinct", "ck")})


def test_staleness_refused_then_refreshed(star):
    spark = star["spark"]
    router = AggRouter(spark).register(star["coarse"])
    star["fact"].append(
        star["fact"].read().limit(5).select(
            (F.col("ok") + 77_000_000).alias("ok"), "ck", "amt"
        )
    )
    with pytest.raises(NoRouteError, match="stale"):
        router.route(["seg"], {"rev": "amt"}, max_lag=0)
    # allow staleness: routes, reports the lag honestly
    _, how = router.route(["seg"], {"rev": "amt"})
    assert max(how["lag"].values()) >= 1
    # refresh_stale folds the lag away and routes fresh
    df, how = router.route(
        ["seg"], {"rev": "amt"}, max_lag=0, refresh_stale=True
    )
    assert max(how["lag"].values()) == 0
    want = (
        star["fact"].read()
        .join(star["dim"].read(), F.col("ck") == F.col("c_custkey"))
        .groupBy(F.col("seg0").alias("seg"))
        .agg(F.sum("amt").alias("rev"))
    )
    assert _rows(df, "seg") == _rows(want, "seg")


def test_base_root_restriction(star, router):
    with pytest.raises(NoRouteError, match="different base"):
        router.route(
            ["seg"], {"rev": "amt"}, base_root=star["tmp"] + "/nowhere"
        )
    _, how = router.route(
        ["seg"], {"rev": "amt"}, base_root=star["fact"].root
    )
    assert how["view"].endswith("coarse")


def test_torn_support_is_refused(star, router, monkeypatch):
    """A support cursor behind the view cursor (crashed refresh window)
    must refuse the coarse distinct route, not mix versions."""
    monkeypatch.setattr(
        TxJoinAggView, "_support_vec", lambda self, sup: [-1, -1]
    )
    with pytest.raises(NoRouteError, match="mid-repair"):
        router.route(["seg"], {"buyers": ("distinct", "ck")})
    # exact grain still routes: it reads the view's own __d column
    df, how = router.route(["seg", "nk"], {"buyers": ("distinct", "ck")})
    assert how["exact_grain"]
    df.collect()


def test_reserved_and_colliding_names(router):
    with pytest.raises(TxError, match="reserved"):
        router.route(["seg"], {"n_rows": "amt"})
    with pytest.raises(TxError, match="collide"):
        router.route(["seg"], {"seg": "amt"})
    with pytest.raises(TxError, match="unsupported fn"):
        router.route(["seg"], {"x": ("median", "amt")})
    with pytest.raises(TxError, match="only with count"):
        router.route(["seg"], {"x": ("sum", "*")})


def test_register_rejects_non_views(spark):
    with pytest.raises(TxError, match="not a routable view"):
        AggRouter(spark).register(object())


def test_every_grain_subset_every_fn_matches_recompute(spark, tmp_path):
    """Combinatorial soundness: a 3-column-grain join view answers all
    7 non-empty grain subsets, for every re-aggregable fn at once —
    each routed answer equal to a direct base recompute (variance via
    the view's exact formula; HLL via a direct sketch of the rows)."""
    import itertools

    f = spark.range(0, 900, 1, 4).select(
        F.col("id").alias("k"),
        (F.col("id") % 11).alias("fk"),
        ((F.col("id") * 37) % 500 - 100).alias("amt"),
        (F.col("id") % 13).alias("who"),
    )
    d = spark.range(0, 11).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("a"), F.col("id") % 2).alias("a"),
        F.concat(F.lit("b"), F.col("id") % 3).alias("b"),
        F.concat(F.lit("c"), F.col("id") % 4).alias("c"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr=["a", "b", "c"], group_col=["a", "b", "c"],
        measures={
            "s": "amt",
            "n": ("count", "amt"),
            "av": ("avg", "amt"),
            "mn": ("min", "amt"),
            "mx": ("max", "amt"),
            "vr": ("var", "amt"),
            "uq": ("distinct", "who"),
            "aq": ("approx_distinct", "who"),
        },
    )
    # churn so folded state (not just the create) is what routes
    fact.append(
        f.filter(F.col("k") % 3 == 0).select(
            (F.col("k") + 10000).alias("k"), "fk",
            (F.col("amt") * 2).alias("amt"), "who",
        )
    )
    fact.delete(F.col("k") % 7 == 0, mode="dv")
    view.refresh(mode="incremental")
    router = AggRouter(spark).register(view)
    joined = fact.read().join(dim.read(), F.col("fk") == F.col("dk"))
    dec = F.col("amt").cast("decimal(19,0)")
    for r in range(1, 4):
        for gcols in itertools.combinations(["a", "b", "c"], r):
            got, how = router.route(
                list(gcols),
                {
                    "s": "amt", "n": ("count", "amt"),
                    "av": ("avg", "amt"), "mn": ("min", "amt"),
                    "mx": ("max", "amt"), "vr": ("var", "amt"),
                    "uq": ("distinct", "who"),
                    "aq": ("approx_distinct", "who"),
                    "rows": ("count", "*"),
                },
            )
            assert how["exact_grain"] == (r == 3)
            q = F.sum((dec * dec).cast("decimal(38,0)")).cast("double")
            s = F.sum("amt").cast("double")
            c = F.count("amt")
            want = joined.groupBy(*gcols).agg(
                F.sum("amt").alias("s"),
                F.count("amt").alias("n"),
                F.avg("amt").alias("av"),
                F.min("amt").alias("mn"),
                F.max("amt").alias("mx"),
                F.when(c > 1, (q - s * s / c) / (c - 1)).alias("vr"),
                F.count_distinct("who").alias("uq"),
                F.hll_sketch_estimate(F.hll_sketch_agg("who")).alias("aq"),
                F.count(F.lit(1)).alias("rows"),
            )
            g = [tuple(x) for x in got.orderBy(*gcols).collect()]
            w = [tuple(x) for x in want.orderBy(*gcols).collect()]
            for gr, wr in zip(g, w):
                assert gr[: r] == wr[: r], (gcols, gr, wr)
                for i, (x, y) in enumerate(zip(gr[r:], wr[r:])):
                    if isinstance(x, float) and isinstance(y, float):
                        assert x == pytest.approx(y, rel=1e-9), (gcols, i)
                    else:
                        assert x == y, (gcols, i, gr, wr)
            assert len(g) == len(w), gcols


def test_support_pinned_to_view_snapshot_across_refreshes(spark, tmp_path):
    """support_at: every RETAINED view version resolves the support
    version whose fence matches it exactly — the mechanism that keeps
    a routed distinct snapshot-consistent when a refresh lands
    mid-route. Derived distinct at each historical pair equals a
    recompute against the base AT that pair's applied version."""
    from data_warehouse_project_spark.sources.txrouter import _Adapted

    df = spark.range(0, 300, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 23).alias("who"),
    )
    base = TxTable.create(spark, tmp_path / "t", df, key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"uq": ("distinct", "who")},
    )
    snapshots = [(view.table.latest_version(), base.latest_version())]
    for round_ in range(2):
        base.append(
            df.filter(F.col("k") % 3 == round_).select(
                (F.col("k") + 1000 * (round_ + 1)).alias("k"),
                "g",
                (F.col("who") + 40 * (round_ + 1)).alias("who"),
            )
        )
        base.delete(F.col("k") % (7 + round_) == 0, mode="dv")
        view.refresh(mode="incremental")
        snapshots.append(
            (view.table.latest_version(), base.latest_version())
        )
    a = _Adapted(view)
    for view_v, base_v in snapshots:
        pinned = a.support_at("uq", view_v)
        assert pinned is not None, view_v
        sup, sup_v = pinned
        got = sorted(
            tuple(r)
            for r in sup.read(sup_v)
            .filter(F.col("__cnt") > 0)
            .groupBy("g")
            .agg(F.count_distinct("__val").alias("uq"))
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in base.read(base_v)
            .filter(F.col("who").isNotNull())
            .groupBy("g")
            .agg(F.count_distinct("who").alias("uq"))
            .collect()
        )
        assert got == want, (view_v, base_v)


def test_rebuilt_support_never_masquerades_as_create_state(spark, tmp_path):
    """A support rebuilt AFTER refreshes (crash between view create and
    support create, repaired later) holds post-refresh state at its v0
    with the true cursor in v1's empty fenced append — support_at must
    map v0 to THAT cursor, not the sidecar's create version."""
    import shutil as _sh

    from data_warehouse_project_spark.sources.txrouter import _Adapted

    df = spark.range(0, 200, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 17).alias("who"),
    )
    base = TxTable.create(spark, tmp_path / "t", df, key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"uq": ("distinct", "who")},
    )
    v0 = view.table.latest_version()
    base.append(
        df.select((F.col("k") + 1000).alias("k"), "g",
                  (F.col("who") + 20).alias("who"))
    )
    view.refresh(mode="incremental")
    v1 = view.table.latest_version()
    # destroy the support and let create-if-absent rebuild it at the
    # CURRENT applied state (the crash-repair path)
    _sh.rmtree(tmp_path / "v" / "_vals_uq")
    a = _Adapted(view)
    sup = view._support("uq")  # rebuilt: v0 = post-refresh state
    assert view._support_ver(sup) == view.applied_base_version()
    # the post-refresh view version matches the rebuilt support
    assert a.support_at("uq", v1) is not None
    # the CREATE-version view must NOT match the rebuilt v0 (its state
    # is newer than the create cursor) — refuse rather than lie
    assert a.support_at("uq", v0) is None


def test_torn_support_falls_back_to_next_cheapest(spark, tmp_path):
    """route(): a candidate whose distinct support loses its matching
    snapshot between _match and _plan (concurrent refresh + vacuum)
    must FALL BACK to the next cheapest matching view, not fail the
    whole route; only when every match is torn does NoRouteError
    surface."""
    f = spark.range(0, 400, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("fk"),
        ((F.col("id") * 13) % 90).alias("amt"),
        (F.col("id") % 19).alias("who"),
    )
    d = spark.range(0, 7).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("a"), F.col("id") % 2).alias("a"),
        F.concat(F.lit("b"), F.col("id") % 3).alias("b"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    mk = lambda p: TxJoinAggView.create(
        spark, tmp_path / p, fact, dim, fk="fk",
        group_expr=["a", "b"], group_col=["a", "b"],
        measures={"uq": ("distinct", "who")},
    )
    v1, v2 = mk("v1"), mk("v2")
    router = AggRouter(spark).register(v1).register(v2)
    cheap = min(router._views, key=lambda a: a.view.table.row_count())
    other = [a for a in router._views if a is not cheap][0]
    # tear only the cheapest candidate's support resolution
    cheap.support_at = lambda *a, **k: None
    got, how = router.route(["a"], {"uq": ("distinct", "who")})
    assert how["view"] == str(other.view.root)
    want = (
        fact.read().join(dim.read(), F.col("fk") == F.col("dk"))
        .groupBy("a").agg(F.count_distinct("who").alias("uq"))
    )
    assert _rows(got, "a") == _rows(want, "a")
    # both torn: the route finally fails, naming the torn-support cause
    other.support_at = lambda *a, **k: None
    with pytest.raises(NoRouteError, match="lost its distinct-support"):
        router.route(["a"], {"uq": ("distinct", "who")})


def test_refresh_stale_rechecks_lag_after_refresh(spark, tmp_path, monkeypatch):
    """route(refresh_stale=True) must re-verify lag <= max_lag AFTER
    the refresh: an auto-refresh that skips (or a base committing
    concurrently) may leave the candidate still stale — refuse it
    rather than passing the freshness gate on faith."""
    df = spark.range(0, 100, 1, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 9).alias("amt"),
    )
    base = TxTable.create(spark, tmp_path / "t", df, key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"rev": "amt"},
    )
    base.append(df.select((F.col("k") + 500).alias("k"), "g", "amt"))
    router = AggRouter(spark).register(view)
    monkeypatch.setattr(
        TxAggView, "refresh", lambda self, mode="auto": None
    )
    with pytest.raises(NoRouteError, match="still stale"):
        router.route(
            ["g"], {"rev": "amt"}, max_lag=0, refresh_stale=True
        )


def test_base_root_matches_up_to_path_normalization(star, router):
    """base_root is compared path-normalized: trailing slashes and
    Path-vs-str spellings must not silently exclude candidates."""
    from pathlib import Path as _P

    root = str(star["fact"].root)
    for spelling in (root + "/", _P(root), root + "/./"):
        _, how = router.route(["seg"], {"rev": "amt"}, base_root=spelling)
        assert how["view"].endswith("coarse"), spelling


def test_having_on_aggregated_measures_matches_recompute(star, router):
    """HAVING over the re-aggregated output commutes with routing: a
    coarse rollup with a measure-level HAVING equals the direct
    GROUP BY ... HAVING, answered from the finer view."""
    # earlier tests churn the shared fact without refreshing the views
    star["fine"].refresh()
    df, how = router.route(
        ["seg"],
        {"rev": "amt", "n": ("count", "amt"), "min_amt": ("min", "amt")},
        having="rev > 1000000 and n >= 3",
    )
    # min_amt lives only on the finer (seg, nk) view: rolled up from it
    assert not how["exact_grain"] and how["view"].endswith("fine")
    want = (
        star["fact"].read()
        .join(star["dim"].read(), F.col("ck") == F.col("c_custkey"))
        .groupBy(F.col("seg0").alias("seg"))
        .agg(
            F.sum("amt").alias("rev"),
            F.count("amt").alias("n"),
            F.min("amt").alias("min_amt"),
        )
        .filter("rev > 1000000 and n >= 3")
    )
    assert _rows(df, "seg") == _rows(want, "seg")
    # HAVING over a distinct measure routed through the support
    df2, _ = router.route(
        ["seg"], {"buyers": ("distinct", "ck")}, having="buyers > 1"
    )
    want2 = (
        star["fact"].read()
        .join(star["dim"].read(), F.col("ck") == F.col("c_custkey"))
        .groupBy(F.col("seg0").alias("seg"))
        .agg(F.count_distinct("ck").alias("buyers"))
        .filter("buyers > 1")
    )
    assert _rows(df2, "seg") == _rows(want2, "seg")


def test_having_referencing_unknown_columns_refuses(star, router):
    with pytest.raises(TxError, match="having predicate"):
        router.route(["seg"], {"rev": "amt"}, having="no_such_col > 0")


def test_auto_staleness_weighs_churn_rows_not_versions(spark, tmp_path):
    """max_lag='auto': many tiny commits stay routable (churn fraction
    under the bar) while one big correction batch trips staleness —
    version counts alone would refuse both."""
    df = spark.range(0, 4000, 1, 4).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 97).alias("amt"),
    )
    base = TxTable.create(spark, tmp_path / "t", df, key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g",
        measures={"rev": "amt"},
    )
    router = AggRouter(spark).register(view)
    # 3 tiny commits: 3 versions of lag, but ~0.2% churn — fresh enough
    for j in range(3):
        base.append(
            spark.createDataFrame(
                [(100000 + j, j % 5, 7)], "k long, g long, amt long"
            )
        )
    _, how = router.route(["g"], {"rev": "amt"}, max_lag="auto")
    assert max(how["lag"].values()) == 3  # versions lag, still routed
    # one big correction: >1% of rows — now stale under the advisor bar
    base.delete(F.col("k") % 13 == 0)
    with pytest.raises(NoRouteError, match="unconsumed churn"):
        router.route(["g"], {"rev": "amt"}, max_lag="auto")
    # refresh_stale folds it away and re-checks
    got, how = router.route(
        ["g"], {"rev": "amt"}, max_lag="auto", refresh_stale=True
    )
    want = base.read().groupBy("g").agg(F.sum("amt").alias("rev"))
    assert _rows(got, "g") == _rows(want, "g")


def test_support_rows_charge_routes_the_truly_cheaper_view(
    spark, tmp_path
):
    """r12 verdict item 6: candidate choice must weigh the SUPPORT a
    support-backed measure will scan, not just view rows. Constructed
    inversion: view A (36 rows, grain seg x month) carries a
    near-fact-scale distinct support (every (seg, month, bucket)
    triple); view B (~6k rows) keys its grain on the distinct expr
    itself, so its support collapses to view-scale. The old
    view-rows-only model picked A; charging view_rows + support_rows
    routes B — genuinely fewer rows scanned — and the routed answer
    still equals the base recompute."""
    n = 20_000
    # month is BLOCK-wise (oid // 2000) so every (seg, month, bucket)
    # triple is distinct (a_sup == n) while (seg, bkt) collapses to
    # lcm(3, 2000) = 6000 pairs — the inversion shape
    fact_df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("oid"),
        (F.col("id") % 2000).alias("bucket"),
        ((F.col("id") * 13) % 1000).alias("amt"),
    )
    dim_df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("oid"),
        (F.col("id") % 3).alias("seg"),
        ((F.col("id") / 2000).cast("long") % 12).alias("month"),
        (F.col("id") % 2000).alias("bkt"),
    )
    fact = TxTable.create(spark, tmp_path / "f", fact_df, key="oid")
    dim = TxTable.create(spark, tmp_path / "d", dim_df, key="oid")
    va = TxJoinAggView.create(
        spark, tmp_path / "va", fact, dim, fk="oid",
        group_expr=["seg", "month"], group_col=["seg", "month"],
        measures={"nb": ("distinct", "bucket")},
    )
    vb = TxJoinAggView.create(
        spark, tmp_path / "vb", fact, dim, fk="oid",
        group_expr=["seg", "bkt"], group_col=["seg", "bkt"],
        measures={"nb": ("distinct", "bucket")},
    )
    router = AggRouter(spark).register(va).register(vb)
    a_rows, b_rows = va.table.row_count(), vb.table.row_count()
    assert a_rows < b_rows  # the OLD model would have picked A
    a_sup = TxTable(spark, tmp_path / "va" / "_vals_nb").row_count()
    b_sup = TxTable(spark, tmp_path / "vb" / "_vals_nb").row_count()
    assert a_rows + a_sup > b_rows + b_sup  # B is genuinely cheaper
    routed, how = router.route(["seg"], {"nb": ("distinct", "bucket")})
    assert how["view"].endswith("vb"), how
    assert how["route_cost"] == b_rows + b_sup, how
    assert how["support_rows"] == b_sup, how
    want = sorted(
        tuple(r)
        for r in fact.read().join(dim.read(), "oid")
        .groupBy("seg")
        .agg(F.count_distinct("bucket").alias("nb"))
        .collect()
    )
    assert sorted(tuple(r) for r in routed.collect()) == want
    # a measure answered from the VIEW column (exact grain) charges no
    # support: same pool, exact-grain query routes by view rows alone
    routed2, how2 = router.route(
        ["seg", "month"], {"nb": ("distinct", "bucket")}
    )
    assert how2["view"].endswith("va") and how2["support_rows"] == 0, how2


def test_global_grain_empty_view_edges(spark, tmp_path):
    """r14: GLOBAL routing over an EMPTY view matches direct global
    aggregation — counts coalesce to 0 (r13 ADVICE: SUM over no rows
    is NULL), exact distinct answers 0, exact topk answers NULL, and
    the support-only anchor is still exactly one row."""
    fact = TxTable.create(
        spark, tmp_path / "f",
        spark.createDataFrame([], "oid long, g long, v string"),
        key="oid",
    )
    view = TxAggView.create(
        spark, tmp_path / "v", fact, group_col="g",
        measures={
            "top": {"fn": "topk", "expr": "v", "k": 3},
            "nv": ("distinct", "v"),
            "n": ("count", "oid"),
        },
    )
    router = AggRouter(spark).register(view)
    rows = router.route(
        [], {"top": {"fn": "topk", "expr": "v", "k": 3},
             "nv": ("distinct", "v")}
    )[0].collect()
    assert len(rows) == 1
    assert rows[0]["nv"] == 0 and rows[0]["top"] is None
    r2 = router.route(
        [], {"n": ("count", "oid"), "nstar": ("count", "*")}
    )[0].collect()[0]
    assert r2["n"] == 0 and r2["nstar"] == 0
