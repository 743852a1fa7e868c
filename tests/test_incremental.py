"""Incremental aggregate maintenance: merging per-batch partial
aggregates must equal the full recompute, for any batch split."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.operators.incremental import merge_additive
from tests.conftest import SF_SMOKE

KEYS = ["order_year", "order_quarter"]


def _partial(df):
    """Quarter-grain partial aggregate with exact integer units and
    mergeable min/max."""
    return df.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_batchwise_merge_equals_full_recompute(spark):
    orders = table(spark, SF_SMOKE, "orders")
    full = _partial(orders)

    state = None
    # three uneven arrival batches, split by custkey (not by time, so
    # batches overlap every quarter — the hard case for incrementality)
    for lo, hi in ((0, 40), (40, 41), (41, 10_000_000)):
        batch = orders.filter(
            (F.col("o_custkey") % 100 >= lo) & (F.col("o_custkey") % 100 < hi)
        )
        state = merge_additive(
            state,
            _partial(batch),
            KEYS,
            sum_cols=["n_orders", "revenue_cents"],
            min_cols=["first_order"],
            max_cols=["last_order"],
        )
    assert _rows(state) == _rows(full)


def test_empty_delta_is_identity(spark):
    orders = table(spark, SF_SMOKE, "orders")
    state = _partial(orders)
    empty = _partial(orders.filter(F.lit(False)))
    merged = merge_additive(
        state,
        empty,
        KEYS,
        sum_cols=["n_orders", "revenue_cents"],
        min_cols=["first_order"],
        max_cols=["last_order"],
    )
    assert _rows(merged) == _rows(state)


def test_new_group_passes_through(spark):
    orders = table(spark, SF_SMOKE, "orders")
    y2000 = _partial(orders.filter(F.year("o_orderdate") == 2000))
    y2001 = _partial(orders.filter(F.year("o_orderdate") == 2001))
    merged = merge_additive(
        y2000,
        y2001,
        KEYS,
        sum_cols=["n_orders", "revenue_cents"],
        min_cols=["first_order"],
        max_cols=["last_order"],
    )
    want = _partial(orders.filter(F.year("o_orderdate").isin(2000, 2001)))
    assert _rows(merged) == _rows(want)


def test_rollup_cascade_equals_direct_at_every_grain(spark, tmp_path):
    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.operators.incremental import rollup_cascade

    ev = table(spark, SF_SMOKE, "events")
    measures = {
        "n_events": F.count(F.lit(1)),
        "value_micros": F.sum(
            F.round(F.col("value") * 1_000_000).cast("bigint")
        ),
    }
    wh = Warehouse(spark, str(tmp_path / "cagg"))
    # three batches split by user (every hour overlaps batches), the
    # third is "late data" for hours the first two already rolled up
    for lo, hi in ((0, 3), (3, 7), (7, 100)):
        batch = ev.filter(
            (F.col("user_id") % 10 >= lo) & (F.col("user_id") % 10 < hi)
        )
        rollup_cascade(
            wh, batch, "ts", ["event_type"], measures,
            grains=("hour", "day", "month"),
        )

    for grain in ("hour", "day", "month"):
        direct = _rows(
            ev.groupBy(
                F.date_trunc(grain, F.col("ts")).alias("bucket_ts"),
                "event_type",
            ).agg(*[expr.alias(n) for n, expr in measures.items()])
        )
        stored = _rows(
            wh.read("bl_dm", f"rollup_{grain}").drop("part_month").select(
                "bucket_ts", "event_type", "n_events", "value_micros"
            )
        )
        assert stored == direct, f"grain {grain} diverged from direct rollup"


def test_underscore_partition_columns_survive_append(spark, tmp_path):
    """'_col=value' partition dirs look like writer metadata (_SUCCESS)
    to a naive name filter; Spark's reader exempts names containing '='
    and the warehouse file movers must too — a mismatch silently loses
    every appended row (the regression that motivated this test: the
    SCD merge path partitions by '__bucket')."""
    from data_warehouse_project_spark.etl.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, _hidden string")
    n = wh.append(df, "bl", "t", partition_by=["_hidden"])
    assert n == 2
    n2 = wh.append(
        spark.createDataFrame([(3, "a")], "id long, _hidden string"),
        "bl",
        "t",
        partition_by=["_hidden"],
    )
    assert n2 == 1
    back = sorted((r["id"], r["_hidden"]) for r in wh.read("bl", "t").collect())
    assert back == [(1, "a"), (2, "b"), (3, "a")]


def test_rollup_cascade_property_random_splits(spark, tmp_path):
    """For ANY partition of rows into arrival batches (including rows
    arriving 'late' relative to others in their hour), every grain of
    the cascade equals the direct rollup — the batch-invariance
    property the operator's contract claims."""
    import datetime as dt
    import random

    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.operators.incremental import rollup_cascade

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 30, 20, 0, 0)  # spans a month boundary
    rows = [
        (
            i,
            base + dt.timedelta(minutes=rng.randint(0, 5000)),
            rng.choice(["a", "b"]),
            rng.randint(-50, 50),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, kind string, v long")
    measures = {"n": F.count(F.lit(1)), "sv": F.sum("v")}

    for trial in range(3):
        wh = Warehouse(spark, str(tmp_path / f"t{trial}"))
        assign = [rng.randint(0, 3) for _ in rows]
        for b in range(4):
            ids = [r[0] for r, a in zip(rows, assign) if a == b]
            batch = df.filter(F.col("id").isin(ids))
            if not ids:
                continue
            rollup_cascade(
                wh, batch, "ts", ["kind"], measures, grains=("hour", "day", "month")
            )
        for grain in ("hour", "day", "month"):
            direct = _rows(
                df.groupBy(
                    F.date_trunc(grain, "ts").alias("bucket_ts"), "kind"
                ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            )
            stored = _rows(
                wh.read("bl_dm", f"rollup_{grain}")
                .select("bucket_ts", "kind", "n", "sv")
            )
            assert stored == direct, f"trial {trial} grain {grain}"


def test_rollup_cascade_null_ts_and_null_dim(spark, tmp_path):
    """NULL ts rows are excluded by contract (no time stripe); NULL dim
    VALUES are legitimate SQL groups and must merge null-safely across
    batches instead of duplicating per batch."""
    import datetime as dt

    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.operators.incremental import rollup_cascade

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, "a", 10),
        (2, t0, None, 5),   # NULL dim, batch 1
        (3, None, "a", 99),  # NULL ts: excluded
        (4, t0, None, 7),   # NULL dim, batch 2 — must merge with row 2
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, kind string, v long")
    wh = Warehouse(spark, str(tmp_path / "nulls"))
    m = {"n": F.count(F.lit(1)), "sv": F.sum("v")}
    rollup_cascade(wh, df.filter("id <= 3"), "ts", ["kind"], m, grains=("hour", "day"))
    rollup_cascade(wh, df.filter("id = 4"), "ts", ["kind"], m, grains=("hour", "day"))
    got = {
        tuple(r)
        for r in wh.read("bl_dm", "rollup_day").select("kind", "n", "sv").collect()
    }
    assert got == {("a", 1, 10), (None, 2, 12)}
