"""Per-sweep shared churn reads (txview.ChurnCache): when several
views over the same base refresh in one pass (refresh_gold_views), the
unconsumed change-feed window and the churned-file re-partial read
materialize ONCE and every view folds from the cached blocks — the r12
verdict's top perf item. Correctness must never depend on a hit: every
folded state equals a recompute, cache or no cache, and a view whose
cursor lags the sweep window simply keys its own window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.sources.txview import ChurnCache, TxAggView

FACT = "oid long, cust long, amt long"
DIM = "cust long, seg string"


def _rows(lo, hi):
    return [(i, i % 7, (i * 13) % 100) for i in range(lo, hi)]


def _state(df):
    return sorted(tuple(r) for r in df.collect())


def test_shared_cache_lands_identical_state(spark, tmp_path):
    """Three views (two grains of TxAggView + a TxJoinAggView, with
    MIN so the _fparts re-partial path runs) fold one churn window
    through a single ChurnCache: every state equals a recompute, and
    the cache holds exactly ONE signed entry for the fact window —
    proof all three folds shared the read."""
    fact = TxTable.create(
        spark, tmp_path / "f", spark.createDataFrame(_rows(0, 400), FACT),
        key="oid",
    )
    dim = TxTable.create(
        spark, tmp_path / "d",
        spark.createDataFrame([(c, f"s{c % 3}") for c in range(7)], DIM),
        key="cust",
    )
    v1 = TxAggView.create(
        spark, tmp_path / "v1", fact, group_col="cust",
        measures={"rev": ("sum", "amt"), "lo": ("min", "amt")},
    )
    v2 = TxAggView.create(
        spark, tmp_path / "v2", fact, group_col="cust",
        measures={"n": ("count", "oid")},
    )
    jv = TxJoinAggView.create(
        spark, tmp_path / "jv", fact, dim, fk="cust",
        group_expr=["seg"], group_col=["seg"],
        measures={"rev": ("sum", "amt"), "n": ("count", "oid")},
    )
    # one churn window: appends + a correction dv delete that kills
    # minima (exercises the fparts repair read through the cache)
    fact.append(spark.createDataFrame(_rows(400, 520), FACT))
    fact.delete(F.col("amt") < 5, mode="dv")

    cache = ChurnCache()
    for v in (v1, v2, jv):
        r = v.refresh(mode="incremental", cache=cache)
        assert not r["skipped"], r
    signed_keys = [k for k in cache._frames if k[0] == "signed"]
    fact_keys = [k for k in signed_keys if k[1] == str(fact.root)]
    assert len(fact_keys) == 1, (
        "all three folds must share ONE signed read of the fact window",
        signed_keys,
    )

    live = fact.read()
    want_v1 = _state(
        live.groupBy("cust").agg(
            F.sum("amt").alias("rev"), F.min("amt").alias("lo")
        )
    )
    assert _state(v1.read().select("cust", "rev", "lo")) == want_v1
    want_v2 = _state(live.groupBy("cust").agg(F.count("oid").alias("n")))
    assert _state(v2.read().select("cust", "n")) == want_v2
    want_jv = _state(
        live.join(dim.read(), "cust")
        .groupBy("seg")
        .agg(F.sum("amt").alias("rev"), F.count("oid").alias("n"))
    )
    assert _state(jv.read().select("seg", "rev", "n")) == want_jv


def test_lagging_view_misses_cache_and_stays_exact(spark, tmp_path):
    """A view whose cursor lags the sweep (created later, so its
    unconsumed window differs) keys its OWN window — a second cache
    entry, never a wrong reuse of the other view's frame."""
    fact = TxTable.create(
        spark, tmp_path / "f", spark.createDataFrame(_rows(0, 200), FACT),
        key="oid",
    )
    early = TxAggView.create(
        spark, tmp_path / "e", fact, group_col="cust",
        measures={"rev": ("sum", "amt")},
    )
    fact.append(spark.createDataFrame(_rows(200, 300), FACT))
    late = TxAggView.create(
        spark, tmp_path / "l", fact, group_col="cust",
        measures={"rev": ("sum", "amt")},
    )
    fact.append(spark.createDataFrame(_rows(300, 350), FACT))

    cache = ChurnCache()
    assert not early.refresh(mode="incremental", cache=cache)["skipped"]
    assert not late.refresh(mode="incremental", cache=cache)["skipped"]
    windows = sorted(
        (k[2], k[3]) for k in cache._frames if k[0] == "signed"
    )
    assert windows == [(1, 2), (2, 2)], windows  # distinct windows
    want = _state(
        fact.read().groupBy("cust").agg(F.sum("amt").alias("rev"))
    )
    assert _state(early.read().select("cust", "rev")) == want
    assert _state(late.read().select("cust", "rev")) == want


def test_dim_churn_flows_through_cache(spark, tmp_path):
    """Dim-feed reads (the join view's term-B path AND the moved-key
    probe in _affected_files) share the cache too; a segment move
    lands exactly."""
    fact = TxTable.create(
        spark, tmp_path / "f", spark.createDataFrame(_rows(0, 300), FACT),
        key="oid",
    )
    dim = TxTable.create(
        spark, tmp_path / "d",
        spark.createDataFrame([(c, f"s{c % 3}") for c in range(7)], DIM),
        key="cust",
    )
    jv = TxJoinAggView.create(
        spark, tmp_path / "jv", fact, dim, fk="cust",
        group_expr=["seg"], group_col=["seg"],
        measures={"rev": ("sum", "amt"), "lo": ("min", "amt")},
    )
    dim.merge(
        spark.createDataFrame([(3, "s9")], DIM)
    )  # cust 3 moves to a NEW segment (merge key = table key)
    cache = ChurnCache()
    r = jv.refresh(mode="incremental", cache=cache)
    assert not r["skipped"], r
    dim_signed = [
        k for k in cache._frames
        if k[0] == "signed" and k[1] == str(dim.root)
    ]
    assert len(dim_signed) == 1, dim_signed
    want = _state(
        fact.read().join(dim.read(), "cust").groupBy("seg").agg(
            F.sum("amt").alias("rev"), F.min("amt").alias("lo")
        )
    )
    assert _state(jv.read().select("seg", "rev", "lo")) == want


def test_shared_src_create_lands_identical_state(spark, tmp_path):
    """r14 (r13 verdict item 6): creates fed a shared caller-pinned
    checkpoint of base.read() land identical view state to independent
    creates — including a distinct measure's support table, which also
    builds from the shared frame instead of re-reading the base."""
    fact = TxTable.create(
        spark, tmp_path / "f", spark.createDataFrame(_rows(0, 400), FACT),
        key="oid",
    )
    dim = TxTable.create(
        spark, tmp_path / "d",
        spark.createDataFrame([(c, f"s{c % 3}") for c in range(7)], DIM),
        key="cust",
    )
    shared = fact.read(fact.latest_version()).localCheckpoint(eager=True)
    a_shared = TxAggView.create(
        spark, tmp_path / "as", fact, group_col="cust",
        measures={"rev": ("sum", "amt"), "vals": ("distinct", "amt")},
        src=shared,
    )
    a_plain = TxAggView.create(
        spark, tmp_path / "ap", fact, group_col="cust",
        measures={"rev": ("sum", "amt"), "vals": ("distinct", "amt")},
    )
    assert _state(a_shared.read()) == _state(a_plain.read())
    j_shared = TxJoinAggView.create(
        spark, tmp_path / "js", fact, dim, fk="cust",
        group_expr=["seg"], group_col=["seg"],
        measures={"rev": ("sum", "amt"), "n": ("count", "oid")},
        src=shared,
    )
    j_plain = TxJoinAggView.create(
        spark, tmp_path / "jp", fact, dim, fk="cust",
        group_expr=["seg"], group_col=["seg"],
        measures={"rev": ("sum", "amt"), "n": ("count", "oid")},
    )
    assert _state(j_shared.read()) == _state(j_plain.read())
    # the created cursor is live: later churn folds incrementally and
    # both twins stay equal (the shared read pinned the right version)
    fact.append(spark.createDataFrame(_rows(400, 450), FACT))
    fact.delete(F.col("amt") > 95, mode="dv")
    for v in (a_shared, a_plain, j_shared, j_plain):
        assert not v.refresh(mode="incremental")["skipped"]
    assert _state(a_shared.read()) == _state(a_plain.read())
    assert _state(j_shared.read()) == _state(j_plain.read())
