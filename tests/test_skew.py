"""Salted-join correctness: identical results to a plain join on a
power-law-skewed key, with the hot key scattered across the salt space."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 10k rows, 90% on one hot key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(100)], "k long, dim_val string"
    )
    plain = big.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(big, small, "k").select("k", "payload", "dim_val")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    out = salted_join(big, small, "k", how="left").orderBy("k")
    rows = [(r["k"], r["v"], r["w"]) for r in out.collect()]
    assert rows == [(1, "a", "x"), (2, "b", None), (99, "c", None)]


def test_hot_key_spreads_over_salt_space(spark):
    big = spark.range(5_000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    salted = big.withColumn(
        "__salt",
        (F.abs(F.hash(F.col("k"), F.monotonically_increasing_id())) % 8),
    )
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts == 8  # the single hot key occupies all 8 salt buckets
