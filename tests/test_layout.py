"""Z-order write path: schema round-trip, and the locality claim —
per-file min/max extents are bounded in BOTH dimensions, unlike a
single-column sort (whose second dimension spans the full domain in
every file). Per-file extents are exactly what parquet footer stats
expose to the scan's file/row-group pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.layout import write_zordered


def _per_file_extents(spark, path, xcol, ycol):
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    rows = (
        df.groupBy("__f")
        .agg(
            (F.max(xcol) - F.min(xcol)).alias("x_span"),
            (F.max(ycol) - F.min(ycol)).alias("y_span"),
        )
        .collect()
    )
    n = len(rows)
    return (
        sum(r.x_span for r in rows) / n,
        sum(r.y_span for r in rows) / n,
        n,
    )


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    # 64x64 grid, one row per cell — uniform in both dims.
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )

    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "xsort")
    write_zordered(grid, z_path, "x", "y", bits=6, n_files=16)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    # Schema and contents survive the layout unchanged.
    back = spark.read.parquet(z_path)
    assert back.columns == ["x", "y"]
    assert back.count() == 64 * 64
    assert back.agg(F.sum("x")).first()[0] == grid.agg(F.sum("x")).first()[0]

    zx, zy, zn = _per_file_extents(spark, z_path, "x", "y")
    sx, sy, sn = _per_file_extents(spark, s_path, "x", "y")
    assert zn >= 8 and sn >= 8

    # x-sorted layout: near-perfect on x, useless on y (full 0..63 span).
    assert sy > 60
    # z-order: BOTH spans well under the full domain — each file covers
    # a contiguous z-range ≈ a few quadrants, not a full-domain stripe.
    assert zx < 40 and zy < 40
    # and the sum of spans (total pruning power over both dims) beats
    # the single-column sort decisively.
    assert zx + zy < (sx + sy) * 0.75


def test_warehouse_optimize_zorder_roundtrip(spark, tmp_path):
    """OPTIMIZE ZORDER on a warehouse table: same rows, atomic swap,
    per-file extents bounded in both dimensions afterwards."""
    from data_warehouse_project_spark.etl.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )
    wh.overwrite(grid.orderBy("x"), "bl_dm", "grid")
    n = wh.optimize_zorder("bl_dm", "grid", "x", "y", bits=6, n_files=16)
    assert n == 64 * 64
    back = wh.read("bl_dm", "grid")
    assert back.count() == 64 * 64
    assert sorted(back.columns) == ["x", "y"]
    zx, zy, zn = _per_file_extents(spark, str(wh.path("bl_dm", "grid")), "x", "y")
    assert zn >= 8
    assert zx < 40 and zy < 40
