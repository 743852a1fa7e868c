"""Support-table hygiene (r12 verdict item 3): the views' auxiliary
TxTables — occurrence supports ``_vals_*`` and repair partials
``_fparts`` — churn by key-pruned rewrite every refresh, so their DEAD
FILES and manifests grow monotonically unless the warehouse janitor
sweeps them too. Logical rows are already shed eagerly (zero-count
rows drop inside _apply_support; removed files' partials drop in
_apply_fparts) — pinned here — so physical reclaim is the whole job:
maintain_tx compacts fragmented supports, vacuum_tx reaps their aged
versions, and view reads + routed answers are bit-identical after.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.sources.txrouter import AggRouter
from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.sources.txview import TxAggView

FACT = "oid long, g long, v long, amt long"


def _rows(lo, hi):
    return [(i, i % 3, i % 10, (i * 7) % 100) for i in range(lo, hi)]


def _state(df):
    return sorted(tuple(r) for r in df.collect())


def test_support_tables_shed_dead_state_under_janitor(spark, tmp_path):
    root = tmp_path / "wh"
    (root / "bl_3nf").mkdir(parents=True)
    fact = TxTable.create(
        spark, root / "bl_3nf" / "ce_sales",
        spark.createDataFrame(_rows(0, 300), FACT), key="oid",
    )
    view = TxAggView.create(
        spark, root / "gold_views" / "seg_rollup", fact, group_col="g",
        measures={
            "rev": ("sum", "amt"),
            "buyers": ("distinct", "v"),
            "hi": ("max", "amt"),
            "top": {"fn": "topk", "expr": "v", "k": 3},
        },
    )
    # churn loop: every cycle rewrites slices of _vals_* and _fparts,
    # stranding the supports' previous files + manifests
    for c in range(5):
        fact.append(
            spark.createDataFrame(_rows(300 + 60 * c, 360 + 60 * c), FACT)
        )
        fact.delete(F.col("oid") % 17 == c, mode="dv")
        assert not view.refresh(mode="incremental")["skipped"]

    # logical hygiene is ALREADY eager (stronger than the r12 verdict
    # assumed): no zero-count occurrence rows, no dead-file partials
    sup = view._support("buyers")
    assert sup.read().filter(F.col("__cnt") <= 0).count() == 0
    fsup = view._fparts()
    live = {f["path"] for f in fact._manifest()["files"]}
    stranded = set(
        r["__f"] for r in fsup.read().select("__f").distinct().collect()
    ) - live
    assert not stranded, stranded

    # physical dead state HAS accumulated in the nested supports
    plan_before = sup.maintenance_plan()
    assert plan_before["stats"]["reclaimable_bytes"] > 0
    assert plan_before["stats"]["retained_versions"] > 4

    before = _state(view.read().select("g", "rev", "buyers", "hi"))
    wh = Warehouse(spark, str(root))
    router = AggRouter(spark).register(view)
    routed_before = _state(
        router.route(["g"], {"rev": ("sum", "amt")})[0]
    )

    # the janitor sweep now reaches the nested aux tables
    m = wh.maintain_tx(execute=False)
    aux = [k for k in m if "/_vals_" in k or k.endswith("/_fparts")]
    assert aux, sorted(m)
    wh.maintain_tx(execute=True)
    v = wh.vacuum_tx(min_age_s=0, force=True)
    aux_v = [k for k in v if "/_vals_" in k or k.endswith("/_fparts")]
    assert aux_v, sorted(v)

    plan_after = view._support("buyers").maintenance_plan()
    assert plan_after["stats"]["retained_versions"] <= 2
    assert (
        plan_after["stats"]["reclaimable_bytes"]
        < plan_before["stats"]["reclaimable_bytes"]
    )

    # reads and routed answers bit-identical after the sweep, and the
    # NEXT refresh still folds incrementally (cursor untouched)
    assert _state(view.read().select("g", "rev", "buyers", "hi")) == before
    router2 = AggRouter(spark).register(
        TxAggView(spark, root / "gold_views" / "seg_rollup")
    )
    assert _state(
        router2.route(["g"], {"rev": ("sum", "amt")})[0]
    ) == routed_before
    fact.append(spark.createDataFrame(_rows(900, 930), FACT))
    r = view.refresh(mode="incremental")
    assert r["mode"] == "incremental" and not r["skipped"], r
    want = _state(
        fact.read().groupBy("g").agg(
            F.sum("amt").alias("rev"),
            F.count_distinct("v").alias("buyers"),
            F.max("amt").alias("hi"),
        )
    )
    assert _state(view.read().select("g", "rev", "buyers", "hi")) == want
