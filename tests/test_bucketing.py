"""Bucketed co-located joins: persisting both fact tables bucketed on
the join key removes the per-query shuffle entirely — the physical plan
for lineitem⋈orders must contain no Exchange. This is the 100 TB
answer for a join that runs hundreds of times a day: pay the shuffle
once at write time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    # warehouse.dir is static config — give the database its own LOCATION
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{wh}'")
    li = table(spark, SF_SMOKE, "lineitem")
    o = table(spark, SF_SMOKE, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketdemo.lineitem_b")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketdemo.orders_b")
    )
    yield "bucketdemo.lineitem_b", "bucketdemo.orders_b"
    spark.sql("DROP TABLE IF EXISTS bucketdemo.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bucketdemo.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bucketdemo")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    # force the non-broadcast path: at real fact-fact scale neither side
    # broadcasts, which is exactly when bucketing pays off
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_b)
            .join(spark.table(o_b), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must not exchange either bucketed side; only the tiny
        # post-join aggregation may shuffle
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    li = table(spark, SF_SMOKE, "lineitem")
    o = table(spark, SF_SMOKE, "orders")
    want = {
        r["o_orderstatus"]: r["n"]
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
