"""Chaos tests for the footer-stats surrogate-key path: the rerun
contract of ``_insert_only_dim`` is that surrogate ids stay collision-
free and strictly monotone across reruns NO MATTER what state a
mid-write crash left behind — a stale append scratch dir, parquet
files written without column statistics (footer_max → None → Spark-agg
fallback), or a truncated footer (must fail LOUDLY, never mint from a
partial max)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from data_warehouse_project_spark.etl.pipeline import _insert_only_dim
from data_warehouse_project_spark.etl.warehouse import Warehouse


def _dim(spark, wh, names, dense):
    batch = spark.createDataFrame([(n,) for n in names], "nm string")
    return _insert_only_dim(
        wh, batch, "dim_t", "nm", "t_id", source_entity="t", dense_keys=dense
    )


def _ids(wh):
    return {r["nm"]: r["t_id"] for r in wh.read("bl_3nf", "dim_t").collect()}


def _data_files(wh, name="dim_t"):
    return sorted(wh.path("bl_3nf", name).rglob("part-*"))


@pytest.mark.parametrize("dense", [False, True])
def test_rerun_with_stale_append_scratch_dir(spark, tmp_path, dense):
    """A crash between the scratch write and the merge leaves a
    `.dim_t.append-*` dir next to the table. The rerun must neither
    read it nor collide with it: admission sees only merged files."""
    wh = Warehouse(spark, str(tmp_path))
    _dim(spark, wh, ["alpha", "beta"], dense)
    before = _ids(wh)
    # fake the crash artifact: a scratch dir holding rows that never
    # made it into the table (ids that WOULD collide if it were read)
    scratch = wh.path("bl_3nf", "dim_t").parent / ".dim_t.append-deadbeef"
    scratch.mkdir(parents=True)
    ghost = spark.createDataFrame([(99, "ghost")], "t_id long, nm string")
    ghost.toPandas().to_parquet(scratch / "part-ghost.parquet")

    _dim(spark, wh, ["beta", "gamma"], dense)
    after = _ids(wh)
    assert "ghost" not in after  # scratch dir is invisible to reads
    assert after["alpha"] == before["alpha"]  # rerun is incremental
    assert after["gamma"] > max(before.values())  # monotone, no reuse
    assert len(set(after.values())) == len(after)  # no collisions


@pytest.mark.parametrize("dense", [False, True])
def test_statless_footer_falls_back_to_spark_max(spark, tmp_path, dense):
    """Rewrite the dim's parquet without column statistics: footer_max
    must return None and the Spark MAX-aggregate fallback must mint the
    next batch strictly above the existing ids."""
    wh = Warehouse(spark, str(tmp_path))
    _dim(spark, wh, ["alpha", "beta"], dense)
    before = _ids(wh)
    for f in _data_files(wh):
        t = pq.read_table(str(f))
        pq.write_table(t, str(f), write_statistics=False)
    assert wh.footer_max("bl_3nf", "dim_t", "t_id") is None

    _dim(spark, wh, ["gamma", "delta"], dense)
    after = _ids(wh)
    assert after["alpha"] == before["alpha"]
    new_ids = {after["gamma"], after["delta"]}
    assert min(new_ids) > max(before.values())
    assert len(set(after.values())) == len(after)


def test_truncated_footer_fails_loudly(spark, tmp_path):
    """A truncated parquet footer must abort the rerun (pyarrow raises
    through footer_max) — silently minting keys from a partial max
    would collide with rows in the unreadable tail."""
    wh = Warehouse(spark, str(tmp_path))
    _dim(spark, wh, ["alpha", "beta"], False)
    f = _data_files(wh)[0]
    raw = f.read_bytes()
    f.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        _dim(spark, wh, ["gamma"], False)


def test_footer_max_refuses_non_integral_columns(spark, tmp_path):
    """String footer stats may be truncated upper bounds on some
    writers — footer_max must return None (int-only contract), not a
    possibly-too-small max."""
    wh = Warehouse(spark, str(tmp_path))
    _dim(spark, wh, ["alpha", "beta"], False)
    assert wh.footer_max("bl_3nf", "dim_t", "nm") is None
    assert wh.footer_max("bl_3nf", "dim_t", "t_id") is not None


def test_footer_min_max_dates_and_fallback(spark, tmp_path):
    """footer_min_max: exact logical DATE endpoints from footer stats
    (the auto-ranged date dim's metadata path), int support, the same
    None contracts as footer_max (missing table / string column /
    statless files), and zero-row part files skipped not fatal."""
    import datetime as dt

    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(1, dt.date(1995, 3, 7), "a"), (2, dt.date(1993, 1, 2), "b"),
         (3, dt.date(1998, 11, 30), "c")],
        "k long, d date, nm string",
    )
    wh.append(df.repartition(3), "bl_3nf", "t")
    assert wh.footer_min_max("bl_3nf", "t", "d") == (
        dt.date(1993, 1, 2), dt.date(1998, 11, 30))
    assert wh.footer_min_max("bl_3nf", "t", "k") == (1, 3)
    assert wh.footer_min_max("bl_3nf", "t", "nm") is None   # string stats
    assert wh.footer_min_max("bl_3nf", "t", "zz") is None   # absent column
    assert wh.footer_min_max("bl_3nf", "none", "d") is None  # missing table
    # a zero-row part file must be skipped, not poison the contract
    empty = spark.createDataFrame([], "k long, d date, nm string")
    empty.coalesce(1).write.mode("append").parquet(str(wh.path("bl_3nf", "t")))
    assert wh.footer_min_max("bl_3nf", "t", "d") == (
        dt.date(1993, 1, 2), dt.date(1998, 11, 30))
    # statless rewrite → None (Spark-agg fallback territory)
    for f in _data_files(wh, "t"):
        t = pq.read_table(str(f))
        pq.write_table(t, str(f), write_statistics=False)
    assert wh.footer_min_max("bl_3nf", "t", "d") is None


def test_dim_dates_footer_path_equals_agg_path(spark, tmp_path):
    """load_dim_dates through footer endpoints must emit exactly the
    rows the full-scan agg path emits — strip the stats and rerun to
    force the fallback, then compare."""
    from data_warehouse_project_spark.etl.pipeline import load_dim_dates

    import datetime as dt

    rows = [(i, dt.date(1995, 1, 1) + dt.timedelta(days=37 * i))
            for i in range(9)]
    for mode in ("footer", "agg"):
        wh = Warehouse(spark, str(tmp_path / mode))
        sales = spark.createDataFrame(rows, "sale_id long, order_dt date")
        wh.append(sales, "bl_3nf", "ce_sales")
        if mode == "agg":
            for f in _data_files(wh, "ce_sales"):
                t = pq.read_table(str(f))
                pq.write_table(t, str(f), write_statistics=False)
            assert wh.footer_min_max("bl_3nf", "ce_sales", "order_dt") is None
        else:
            assert wh.footer_min_max("bl_3nf", "ce_sales", "order_dt") is not None
        load_dim_dates(spark, wh)
        got = sorted(
            r["date_id"] for r in
            wh.read("bl_dm", "dim_dates").select("date_id").collect()
        )
        if mode == "footer":
            want = got
    assert got == want and len(want) > 300
