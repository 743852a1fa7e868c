"""Schema evolution: appending batches with added columns must stay
readable — union schema with NULL backfill via merge_schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.etl.warehouse import Warehouse


def test_added_column_merges_with_null_backfill(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    wh.append(v1, "staging", "t")
    v2 = spark.createDataFrame(
        [(3, "c", "en")], "id bigint, name string, lang string"
    )
    wh.append(v2, "staging", "t")

    merged = wh.read("staging", "t", merge_schema=True)
    assert set(merged.columns) == {"id", "name", "lang"}
    rows = {r["id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}


def test_default_read_is_cheap_and_stable(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    v1 = spark.createDataFrame([(1, "a")], "id bigint, name string")
    wh.append(v1, "staging", "t")
    assert wh.read("staging", "t").count() == 1


def test_evolved_fact_aggregates_treat_missing_as_null(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    old = spark.createDataFrame([(1, 100)], "id bigint, cents bigint")
    new = spark.createDataFrame(
        [(2, 200, "promo")], "id bigint, cents bigint, channel string"
    )
    wh.append(old, "bl_dm", "f")
    wh.append(new, "bl_dm", "f")
    got = (
        wh.read("bl_dm", "f", merge_schema=True)
        .groupBy(F.coalesce(F.col("channel"), F.lit("unknown")).alias("channel"))
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    assert {r["channel"]: r["cents"] for r in got} == {"unknown": 100, "promo": 200}
