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


def _data_files(wh):
    return sorted(wh.path("bl_3nf", "dim_t").rglob("part-*"))


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
