"""Variance / stddev / sumsq measures: additively-maintained second
moments ((Σx, Σx², n) in exact DECIMAL(38,0) squares) for TxAggView
and TxJoinAggView, derived to VAR_SAMP/STDDEV_SAMP at read time, and
re-aggregable by the router at coarser grains (pooled moments).

The fold NEVER repairs: deletes subtract from every component exactly,
so incremental refresh must equal a from-scratch recompute state
byte-for-byte (both derive the logical value from identical physical
state) — pinned here through churn containing appends, merges, dv
deletes, and (for the join view) dimension moves.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
from data_warehouse_project_spark.sources.txrouter import AggRouter
from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.sources.txview import TxAggView

MEASURES = {
    "v_amt": ("var", "amt"),
    "sd_amt": ("stddev", "amt"),
    "qq": ("sumsq", "amt"),
    "s": "amt",
    "n": ("count", "amt"),
}


def _rows(df, *order):
    out = []
    for r in df.orderBy(*order).collect():
        out.append(
            tuple(
                round(x, 6) if isinstance(x, float) else x for x in r
            )
        )
    return out


def _base_df(spark, n=400, parts=4, extra=0):
    return spark.range(extra, n + extra, 1, parts).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 37) % 1000 - 250).alias("amt"),
    )


def _expected_agg(df):
    """The exact same derivation the views use, straight off the base."""
    return df.groupBy("g").agg(
        F.var_samp("amt").alias("v_amt"),
        F.stddev_samp("amt").alias("sd_amt"),
        F.sum(
            (F.col("amt").cast("decimal(19,0)") ** 2).cast("decimal(38,0)")
        ).alias("qq"),
        F.sum("amt").alias("s"),
        F.count("amt").alias("n"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def test_aggview_variance_tracks_churn_exactly(spark, tmp_path):
    base = TxTable.create(spark, tmp_path / "t", _base_df(spark), key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g", measures=MEASURES
    )
    # churn: append, update via merge (moves values), dv delete
    base.append(_base_df(spark, n=150, extra=1000))
    base.merge(
        _base_df(spark).filter(F.col("k") % 11 == 0).withColumn(
            "amt", F.col("amt") * 3 + 1
        )
    )
    base.delete(F.col("k") % 13 == 0, mode="dv")
    r = view.refresh(mode="incremental")
    assert not r["skipped"]
    got = _rows(view.read(), "g")
    want = _rows(_expected_agg(base.read()), "g")
    assert got == want
    # and byte-identical to a from-scratch view over the same state
    fresh = TxAggView.create(
        spark, tmp_path / "v2", base, group_col="g", measures=MEASURES
    )
    assert got == _rows(fresh.read(), "g")


def test_variance_null_and_tiny_groups(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 5), (4, "c", None)],
        "k long, g string, amt long",
    )
    base = TxTable.create(spark, tmp_path / "t", df, key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base, group_col="g", measures=MEASURES
    )
    rows = {r["g"]: r for r in view.read().collect()}
    assert rows["a"]["v_amt"] is None and rows["a"]["qq"] == 100
    assert rows["b"]["v_amt"] is None and rows["b"]["qq"] is None
    assert rows["c"]["v_amt"] is None and rows["c"]["n"] == 1
    # a second value arrives: variance becomes real, incrementally
    base.append(
        spark.createDataFrame([(9, "c", 15)], "k long, g string, amt long")
    )
    view.refresh(mode="incremental")
    rows = {r["g"]: r for r in view.read().collect()}
    assert rows["c"]["v_amt"] == pytest.approx(50.0)  # var([5, 15])
    assert rows["c"]["sd_amt"] == pytest.approx(50.0 ** 0.5)


def test_joinview_variance_across_both_feeds(spark, tmp_path):
    f = _base_df(spark).withColumnRenamed("g", "fk")
    d = spark.range(0, 7).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("seg-"), F.col("id") % 3).alias("seg"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr="seg", group_col="seg",
        measures={"v_amt": ("var", "amt"), "qq": ("sumsq", "amt"),
                  "s": "amt", "n": ("count", "amt")},
    )
    # fact churn + a dim MOVE (rows change groups: variance of both
    # the source and destination group must re-derive exactly)
    fact.append(_base_df(spark, n=100, extra=2000).withColumnRenamed("g", "fk"))
    dim.merge(
        d.filter(F.col("dk") % 2 == 0).withColumn("seg", F.lit("seg-MOVED"))
    )
    fact.delete(F.col("k") % 9 == 0, mode="dv")
    r = view.refresh(mode="incremental")
    assert not r["skipped"] and r["mode"] == "incremental"
    want = (
        fact.read()
        .join(dim.read(), F.col("fk") == F.col("dk"))
        .groupBy("seg")
        .agg(
            F.var_samp("amt").alias("v_amt"),
            F.sum(
                (F.col("amt").cast("decimal(19,0)") ** 2)
                .cast("decimal(38,0)")
            ).alias("qq"),
            F.sum("amt").alias("s"),
            F.count("amt").alias("n"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    assert _rows(view.read(), "seg") == _rows(want, "seg")


def test_router_pools_variance_at_coarser_grain(spark, tmp_path):
    base = TxTable.create(spark, tmp_path / "t", _base_df(spark, n=500),
                          key="k")
    # fine view: grain (g) — route the GLOBAL variance by grouping on a
    # constant? No: grain subset must be non-empty, so use a two-level
    # group instead
    df2 = _base_df(spark, n=500).withColumn("g2", F.col("k") % 2)
    base2 = TxTable.create(spark, tmp_path / "t2", df2, key="k")
    view = TxAggView.create(
        spark, tmp_path / "v", base2, group_col="g",
        measures=MEASURES,
    )
    # sanity: exact grain routes var/stddev/sumsq and the derived
    # sum/count come from the SAME physical state
    router = AggRouter(spark).register(view)
    got, how = router.route(
        ["g"],
        {"v_amt": ("var", "amt"), "sd_amt": ("stddev", "amt"),
         "qq": ("sumsq", "amt"), "s": ("sum", "amt"),
         "n": ("count", "amt")},
    )
    assert how["exact_grain"]
    want = base2.read().groupBy("g").agg(
        F.var_samp("amt").alias("v_amt"),
        F.stddev_samp("amt").alias("sd_amt"),
        F.sum(
            (F.col("amt").cast("decimal(19,0)") ** 2).cast("decimal(38,0)")
        ).alias("qq"),
        F.sum("amt").alias("s"),
        F.count("amt").alias("n"),
    )
    assert _rows(got, "g") == _rows(want, "g")


def test_router_pools_variance_from_composite_join_view(spark, tmp_path):
    """(seg, region) join view → seg-only variance: pooled moments,
    equal to computing variance over the base rows directly."""
    f = _base_df(spark, n=600).withColumnRenamed("g", "fk")
    d = spark.range(0, 7).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("s"), F.col("id") % 3).alias("seg"),
        F.concat(F.lit("r"), F.col("id") % 2).alias("region"),
    )
    fact = TxTable.create(spark, tmp_path / "f", f, key="k")
    dim = TxTable.create(spark, tmp_path / "d", d, key="dk")
    view = TxJoinAggView.create(
        spark, tmp_path / "v", fact, dim, fk="fk",
        group_expr=["seg", "region"], group_col=["seg", "region"],
        measures={"v_amt": ("var", "amt"), "n": ("count", "amt")},
    )
    got, how = router_route = AggRouter(spark).register(view).route(
        ["seg"], {"v_amt": ("var", "amt"), "n": ("count", "amt")}
    )
    assert not how["exact_grain"]
    want = (
        fact.read()
        .join(dim.read(), F.col("fk") == F.col("dk"))
        .groupBy("seg")
        .agg(F.var_samp("amt").alias("v_amt"),
             F.count("amt").alias("n"))
    )
    assert _rows(got, "seg") == _rows(want, "seg")
