"""r14: `local_rows` — single-partition driver-local DataFrames.

A list-backed ``spark.createDataFrame`` slices the rows into
``defaultParallelism`` Python-RDD partitions, so every action touching
the frame launches one Python worker per slice (~5 s of fixed latency
per action at local[32] for a ONE-ROW frame). `local_rows` keeps the
stock row→schema conversion but lands the rows in exactly one slice
(zero for an empty frame). These tests pin the partitioning contract
and value/schema equivalence with the stock path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_warehouse_project_spark.localframe import local_rows

TS_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("msg", StringType()),
        StructField("n", LongType()),
    ]
)


def test_single_partition_and_values(spark):
    rows = [("a", 1), ("b", 2), ("c", None)]
    df = local_rows(spark, rows, "k string, v long")
    assert df.rdd.getNumPartitions() == 1
    ref = spark.createDataFrame(rows, "k string, v long")
    assert df.schema == ref.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))


def test_empty_frame_zero_partitions(spark):
    df = local_rows(spark, [], TS_SCHEMA)
    assert df.rdd.getNumPartitions() == 0
    assert df.count() == 0
    assert df.schema == TS_SCHEMA
    # empty frames must still union/append cleanly
    one = local_rows(
        spark, [(dt.datetime(2026, 1, 1), "x", 5)], TS_SCHEMA
    )
    assert df.unionByName(one).count() == 1


def test_struct_schema_with_nulls_and_timestamps(spark):
    df = local_rows(spark, [(dt.datetime(2026, 1, 1, 12), None, 7)], TS_SCHEMA)
    r = df.collect()[0]
    assert r.ts == dt.datetime(2026, 1, 1, 12)
    assert r.msg is None and r.n == 7


def test_generator_input(spark):
    df = local_rows(spark, ((i,) for i in range(5)), "i long")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 5
