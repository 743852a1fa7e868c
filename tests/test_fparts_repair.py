"""Per-file repair partials (txview ``_fparts``): MIN/MAX and
APPROX_DISTINCT correction deletes must repair from the per-file
partials support — NEVER a base rescan — with the support surviving
crashes, vacuumed feed windows, compaction, and restores.

Reference parity: the reference recomputes its rollups wholesale each
load (dw_etl_tests.py:470-506); at 100 TB a correction delete must
cost O(the files that lost rows), not O(the dirty group's base rows) —
the r11 repair semi-join was the last base-touching maintenance path.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.sources.txview import TxAggView


def _mk(spark, tmp_path, measures, n=80, groups=5):
    rows = [(i, i % groups, (i * 37) % 100) for i in range(n)]
    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame(rows, "id long, g long, amt long"),
        key="id",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g", measures=measures
    )
    return base, view


def _equal(view, base, aggs):
    df = view.read()
    cols = df.columns  # hoisted: view.read() per ROW was a py4j storm
    got = {tuple(r[c] for c in cols) for r in df.collect()}
    want_df = base.read().groupBy("g").agg(*aggs)
    wcols = want_df.columns
    want = {tuple(r[c] for c in wcols) for r in want_df.collect()}
    assert got == want, f"\nview: {sorted(got)[:5]}\nwant: {sorted(want)[:5]}"


def _no_base_read(view):
    """Patch the base's full-table read to fail loudly — repairs must
    come from the _fparts support, not a base scan."""

    def boom(*a, **kw):
        raise AssertionError(
            "refresh read the base table — repair must aggregate the "
            "per-file partials support"
        )

    view.base.read = boom


def test_extremal_delete_repairs_without_base_read(spark, tmp_path):
    base, view = _mk(
        spark, tmp_path,
        {"lo": ("min", "amt"), "hi": ("max", "amt"),
         "uq": ("approx_distinct", "amt")},
    )
    # kill each group's maximum (forces every group dirty)
    tops = (
        base.read().groupBy("g").agg(F.max("amt").alias("m")).collect()
    )
    for r in tops:
        base.delete((F.col("g") == r["g"]) & (F.col("amt") == r["m"]))
    _no_base_read(view)
    r = view.refresh()
    assert not r["skipped"]
    view.base = TxTable(spark, view.base.root)  # restore real reader
    _equal(
        view, base,
        [
            F.min("amt").alias("lo"),
            F.max("amt").alias("hi"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uq"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )


def test_dv_delete_repairs_only_from_partials(spark, tmp_path):
    """Deletion-vector deletes reshape no files — the snapshot diff
    re-partials exactly the dv-grown files and the repair still never
    reads the base."""
    base, view = _mk(spark, tmp_path, {"hi": ("max", "amt")})
    top = base.read().orderBy(F.col("amt").desc()).first()
    base.delete(F.col("id") == top["id"], mode="dv")
    _no_base_read(view)
    view.refresh()
    view.base = TxTable(spark, view.base.root)
    _equal(
        view, base,
        [F.max("amt").alias("hi"), F.count(F.lit(1)).alias("n_rows")],
    )


def test_fparts_rows_track_live_files(spark, tmp_path):
    """Invariant: after every refresh the support holds rows for
    exactly the base's live files (induction base of the repair's
    correctness)."""
    base, view = _mk(spark, tmp_path, {"lo": ("min", "amt")})
    for step in range(3):
        base.append(
            spark.createDataFrame(
                [(1000 + step * 10 + j, j % 5, 50 + j) for j in range(4)],
                "id long, g long, amt long",
            )
        )
        base.delete(F.col("id") == step * 7)
        view.refresh()
        live = {f["path"] for f in base._manifest()["files"]}
        sup = {
            r["__f"]
            for r in view._fparts().read().select("__f").distinct().collect()
        }
        assert sup == live, (step, sup ^ live)


def test_compaction_and_restore_keep_partials_consistent(spark, tmp_path):
    """compact() emits NO change-feed rows but reshapes files; restore
    rewinds wholesale — the state-based diff must track both, and a
    post-compaction extremal delete still repairs without a base read."""
    base, view = _mk(spark, tmp_path, {"hi": ("max", "amt"),
                                       "uq": ("approx_distinct", "amt")})
    base.append(
        spark.createDataFrame(
            [(900 + j, j % 5, 200 + j) for j in range(6)],
            "id long, g long, amt long",
        )
    )
    view.refresh()
    base.compact()
    view.refresh()  # feed sees nothing; partials must re-home anyway
    live = {f["path"] for f in base._manifest()["files"]}
    sup = {
        r["__f"]
        for r in view._fparts().read().select("__f").distinct().collect()
    }
    assert sup == live
    # the new global maximum dies — repair from post-compaction partials
    top = base.read().orderBy(F.col("amt").desc()).first()
    base.delete(F.col("id") == top["id"])
    _no_base_read(view)
    view.refresh()
    view.base = TxTable(spark, view.base.root)
    _equal(
        view, base,
        [
            F.max("amt").alias("hi"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uq"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )
    # restore the base two versions back: partials follow the rewind
    base.restore(base.latest_version() - 2)
    view.refresh()
    live = {f["path"] for f in base._manifest()["files"]}
    sup = {
        r["__f"]
        for r in view._fparts().read().select("__f").distinct().collect()
    }
    assert sup == live


def test_fparts_crash_and_vacuum_heal(spark, tmp_path):
    """Crash between the view and _fparts commits, then retention
    reaps the manifests: catch-up rebuilds wholesale; a deleted
    support dir is re-created create-if-absent."""
    base, view = _mk(spark, tmp_path, {"hi": ("max", "amt")})
    base.append(
        spark.createDataFrame([(2000, 1, 999)], "id long, g long, amt long")
    )
    orig = TxAggView._apply_fparts
    TxAggView._apply_fparts = lambda self, *a, **k: None
    try:
        view.refresh()
    finally:
        TxAggView._apply_fparts = orig
    base.vacuum(retain_versions=1, min_age_s=0, force=True)
    v2 = TxAggView(spark, tmp_path / "view")
    assert v2.refresh()["skipped"]  # catch-up healed, then fenced skip
    live = {f["path"] for f in base._manifest()["files"]}
    sup = {
        r["__f"]
        for r in v2._fparts().read().select("__f").distinct().collect()
    }
    assert sup == live
    # missing support dir (crash inside create) heals the same way,
    # and the next extremal delete repairs correctly from the rebuild
    shutil.rmtree(tmp_path / "view" / "_fparts")
    base.delete(F.col("id") == 2000)  # the stored maximum dies
    v3 = TxAggView(spark, tmp_path / "view")
    v3.refresh()
    _equal(
        v3, base,
        [F.max("amt").alias("hi"), F.count(F.lit(1)).alias("n_rows")],
    )


def test_repair_matches_recompute_on_random_oplog(spark, tmp_path):
    """Randomized append/cow-delete/dv-delete/update/compact op-log
    with the base reader disabled during every refresh: the view
    still equals a recompute at each step — the repair path is fully
    support-fed."""
    import random

    rng = random.Random(4242)
    base, view = _mk(
        spark, tmp_path,
        {"lo": ("min", "amt"), "hi": ("max", "amt"),
         "uq": ("approx_distinct", "amt")},
        n=60, groups=4,
    )
    model = {i: (i % 4, (i * 37) % 100) for i in range(60)}
    next_id = 5000
    aggs = [
        F.min("amt").alias("lo"),
        F.max("amt").alias("hi"),
        F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uq"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    for step in range(6):
        op = rng.choice(["append", "del_top", "del_dv", "update", "compact"])
        if op == "append":
            batch = [
                (next_id + j, rng.randint(0, 4), rng.randint(-50, 150))
                for j in range(rng.randint(1, 3))
            ]
            for r in batch:
                model[r[0]] = (r[1], r[2])
            next_id += 10
            base.append(
                spark.createDataFrame(batch, "id long, g long, amt long")
            )
        elif op == "del_top" and model:
            g0 = rng.choice(sorted({v[0] for v in model.values()}))
            members = {
                k: v[1] for k, v in model.items() if v[0] == g0
            }
            victim = max(members, key=lambda k: members[k])
            base.delete(F.col("id") == victim)
            del model[victim]
        elif op == "del_dv" and model:
            victim = rng.choice(sorted(model))
            base.delete(F.col("id") == victim, mode="dv")
            del model[victim]
        elif op == "update" and model:
            victim = rng.choice(sorted(model))
            amt = rng.randint(-50, 150)
            base.update(
                F.col("id") == victim, {"amt": F.lit(amt).cast("long")}
            )
            model[victim] = (model[victim][0], amt)
        else:
            base.compact()
        _no_base_read(view)
        view.refresh()
        view.base = TxTable(spark, view.base.root)
        _equal(view, base, aggs)


def test_high_cardinality_grain_skips_fparts_and_prunes_repair(
    spark, tmp_path, monkeypatch
):
    """Grains above FPARTS_MAX_GROUPS keep the dirty-group repair —
    no per-file support is materialized (state would be fact-scale) —
    and the repair read is point-pruned on the group column when the
    base declares it (here: group IS the base key → read_for_keys)."""
    monkeypatch.setattr(TxAggView, "FPARTS_MAX_GROUPS", 8)
    rows = [(i, i, (i * 37) % 100) for i in range(60)]  # grain == key
    base = TxTable.create(
        spark, tmp_path / "base",
        spark.createDataFrame(rows, "id long, g long, amt long"),
        key="g",
    )
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"hi": ("max", "amt"), "uq": ("approx_distinct", "amt")},
    )
    assert not (tmp_path / "view" / "_fparts").exists()
    top = base.read().orderBy(F.col("amt").desc()).first()
    base.delete(F.col("g") == top["g"], mode="dv")
    view.refresh()
    assert not (tmp_path / "view" / "_fparts").exists()
    _equal(
        view, base,
        [
            F.max("amt").alias("hi"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uq"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )


def test_mid_cardinality_scattered_delete_repairs_from_support(
    spark, tmp_path
):
    """r12 verdict item 2 (the mid-cardinality gap): a ~50k-group
    grain — far past the old 8192-group fparts cap, far below the
    point-prunable per-row regime — used to fall back to dirty-group
    base reads that approach O(base) when the delete scatters across
    every file. The raised cap keeps such grains on the per-file
    partials: an every-file correction delete (5k group maxima spread
    over all 8 files) repairs with the base read FORBIDDEN, through
    the bucket-pre-filtered support scan, and lands the exact
    recompute state; subsequent churn keeps folding equal."""
    n, G = 100_000, 50_000
    df = spark.range(0, n, 1, 8).select(
        F.col("id"),
        (F.col("id") % G).alias("g"),
        # each group has two rows in two different files; the MAX row
        # sits in the LOW file for even groups, HIGH file for odd —
        # so extremal deletes touch every file
        F.when(
            (F.col("id") < G) == (F.col("id") % 2 == 0),
            F.lit(100) + F.col("id") % 7,
        )
        .otherwise(F.col("id") % 50)
        .alias("amt"),
    )
    base = TxTable.create(spark, tmp_path / "base", df, key="id")
    view = TxAggView.create(
        spark, tmp_path / "view", base, group_col="g",
        measures={"hi": ("max", "amt"), "lo": ("min", "amt"),
                  "uq": ("approx_distinct", "amt")},
    )
    assert view.table.row_count() == G > 8192
    assert view._use_fparts(), "mid-cardinality grain must keep fparts"
    # every-file correction delete: the max row of every 10th group
    base.delete((F.col("amt") >= 100) & (F.col("g") % 10 == 3),
                mode="dv")
    _no_base_read(view)
    r = view.refresh(mode="incremental")
    assert r["mode"] == "incremental" and not r["skipped"], r
    view.base = TxTable(spark, view.base.root)
    _equal(
        view, base,
        [
            F.max("amt").alias("hi"),
            F.min("amt").alias("lo"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uq"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )
    # keep churning: append new maxima + another scattered delete —
    # the fold stays equal to recompute (base read again forbidden)
    base.append(
        spark.range(n, n + 4000, 1, 4).select(
            F.col("id"),
            (F.col("id") % G).alias("g"),
            (F.lit(200) + F.col("id") % 5).alias("amt"),
        )
    )
    base.delete((F.col("amt") >= 200) & (F.col("g") % 7 == 2), mode="dv")
    _no_base_read(view)
    assert not view.refresh(mode="incremental")["skipped"]
    view.base = TxTable(spark, view.base.root)
    _equal(
        view, base,
        [
            F.max("amt").alias("hi"),
            F.min("amt").alias("lo"),
            F.hll_sketch_estimate(F.hll_sketch_agg("amt")).alias("uq"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )
