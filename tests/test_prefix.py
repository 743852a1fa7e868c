"""bucketed_prefix_sum (operators/prefix.py): exact equivalence with a
global ordered window — the property that lets sf-proportional
cumulative queries drop their single-partition window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.prefix import (
    bucketed_prefix_sum,
    range_bucket,
    single_group,
)


def _global_reference(df, order_by, val_col):
    w = (
        Window.partitionBy(single_group(F.col(val_col)))
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("want", F.sum(val_col).over(w))


def _check(spark, rows, width, descending):
    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(8)
    order = [F.desc("v") if descending else F.asc("v"), F.asc("k")]
    got = bucketed_prefix_sum(
        df,
        order_by=order,
        val_col="v",
        out_col="cum",
        bucket=range_bucket(F.col("v"), width, descending=descending),
        total_col="tot",
    )
    want = _global_reference(df, order, "v")
    joined = got.join(want, ["k", "v"]).collect()
    assert len(joined) == len(rows)
    total = sum(v for _, v in rows)
    for r in joined:
        assert r["cum"] == r["want"], (r["k"], r["v"], r["cum"], r["want"])
        assert r["tot"] == total


def test_matches_global_window_asc_and_desc(spark):
    rows = [(i, (i * 37) % 100) for i in range(500)]
    _check(spark, rows, width=10, descending=False)
    _check(spark, rows, width=10, descending=True)


def test_duplicates_negatives_and_tiny_width(spark):
    # heavy ties (all values from a 5-element set, incl. negatives) and
    # width=1 → one bucket per distinct value; ties break by k
    rows = [(i, [-7, 0, 3, 3, 11][i % 5]) for i in range(200)]
    _check(spark, rows, width=1, descending=False)
    _check(spark, rows, width=1, descending=True)


def test_null_order_keys_are_kept(spark):
    """NULL leading keys must survive (sentinel bucket at the position
    Spark's default NULL ordering gives them), not silently drop out of
    the offset equi-join."""
    rows = [(1, 5), (2, None), (3, 9), (4, None), (5, 1)]
    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(4)
    for descending in (False, True):
        order = [F.desc("v") if descending else F.asc("v"), F.asc("k")]
        got = bucketed_prefix_sum(
            df, order, "v", "cum",
            range_bucket(F.col("v"), 3, descending=descending),
        )
        want = _global_reference(df, order, "v")
        joined = got.join(want, ["k"], "full").collect()
        assert len(joined) == len(rows)  # nothing dropped
        for r in joined:
            assert r["cum"] == r["want"], (descending, r)


def test_single_bucket_degenerate(spark):
    # width larger than the whole range → one bucket: degrades to the
    # plain global window, still exact
    rows = [(i, (i * 13) % 50) for i in range(100)]
    _check(spark, rows, width=10_000, descending=True)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=60,
    ),
    width=st.sampled_from([1, 3, 17, 1000]),
    descending=st.booleans(),
)
def test_property_matches_global_window(spark, vals, width, descending):
    """Random values (with NULLs and heavy ties), random bucket widths,
    both directions: bucketed == global, row for row."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(4)
    order = [F.desc("v") if descending else F.asc("v"), F.asc("k")]
    got = bucketed_prefix_sum(
        df, order, "v", "cum",
        range_bucket(F.col("v"), width, descending=descending),
    )
    want = _global_reference(df, order, "v")
    joined = got.join(want, ["k"], "full").collect()
    assert len(joined) == len(rows)
    for r in joined:
        assert r["cum"] == r["want"], (descending, width, r)


def test_no_sf_proportional_single_partition(spark):
    """The executed plan's only constant-key exchanges carry the
    bounded bucket-totals frame, never the data: every window in the
    plan is partitioned (by __pb or by the non-foldable constant over
    the totals frame)."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    out = bucketed_prefix_sum(
        df, [F.asc("v"), F.asc("k")], "v", "cum",
        range_bucket(F.col("v"), 10),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" in line:
            assert "windowspecdefinition(" in line
            spec = line.split("windowspecdefinition(")[1]
            # partition spec is non-empty: first element before the
            # ORDER BY direction marker must reference a column
            assert spec.split(",")[0].strip() != ""
    assert "Exchange SinglePartition" not in plan


def test_grouped_matches_per_group_window(spark):
    rows = [(i, f"g{i % 3}", (i * 37) % 100) for i in range(300)]
    df = spark.createDataFrame(rows, "k bigint, g string, v bigint").repartition(8)
    order = [F.desc("v"), F.asc("k")]
    got = bucketed_prefix_sum(
        df,
        order_by=order,
        val_col="v",
        out_col="cum",
        bucket=range_bucket(F.col("v"), 10, descending=True),
        total_col="tot",
        group_cols=["g"],
    )
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("want", F.sum("v").over(w))
    joined = got.join(want, ["k", "g", "v"]).collect()
    assert len(joined) == len(rows)
    totals = {}
    for _, g, v in rows:
        totals[g] = totals.get(g, 0) + v
    for r in joined:
        assert r["cum"] == r["want"], (r["k"], r["g"], r["cum"], r["want"])
        assert r["tot"] == totals[r["g"]]


def test_grouped_keeps_null_group_rows(spark):
    """NULL is a real PARTITION BY value: rows whose group column is
    NULL must get their own running sum, not vanish in the offset
    join (regression: name-based equi-join dropped them)."""
    rows = [(1, "a", 10), (2, None, 20), (3, "a", 5), (4, None, 7)]
    df = spark.createDataFrame(rows, "k bigint, g string, v bigint")
    got = bucketed_prefix_sum(
        df,
        order_by=[F.asc("v"), F.asc("k")],
        val_col="v",
        out_col="cum",
        bucket=range_bucket(F.col("v"), 8),
        total_col="tot",
        group_cols=["g"],
    )
    out = {r["k"]: (r["cum"], r["tot"]) for r in got.collect()}
    assert out == {1: (15, 15), 3: (5, 15), 2: (27, 27), 4: (7, 27)}


def test_prefix_sum_property_random(spark):
    """Property (hypothesis): for ANY row set — negative values, NULL
    group keys, duplicate order keys, any bucket width — the grouped
    bucketed prefix sum equals the per-group SQL window."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.integers(min_value=0, max_value=40),          # k (dedup below)
        st.sampled_from(["a", "b", None]),               # group
        st.integers(min_value=-50, max_value=50),        # v
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows=st.lists(row, min_size=1, max_size=30),
        width=st.sampled_from([1, 7, 1000]),
    )
    def check(rows, width):
        uniq = {}
        for k, g, v in rows:
            uniq[k] = (k, g, v)
        rows = list(uniq.values())
        df = spark.createDataFrame(rows, "k bigint, g string, v bigint")
        order = [F.asc("v"), F.asc("k")]
        got = bucketed_prefix_sum(
            df,
            order_by=order,
            val_col="v",
            out_col="cum",
            bucket=range_bucket(F.col("v"), width),
            group_cols=["g"],
        )
        w = (
            Window.partitionBy("g")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = df.withColumn("want", F.sum("v").over(w))
        # compare by key in Python: a DataFrame join on g would be
        # null-UNsafe and silently split the NULL-group rows
        got_map = {r["k"]: r["cum"] for r in got.collect()}
        want_map = {r["k"]: r["want"] for r in want.collect()}
        assert got_map == want_map

    check()
