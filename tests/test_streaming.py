"""Structured Streaming operators: run each transform as a real file
stream (trigger availableNow → memory sink) and check it against the
identical transform applied in batch — the unified-API equivalence that
Structured Streaming guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.streaming import (
    sessionized_counts,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """Events re-staged as micro-precision parquet (streamable)."""
    path = str(tmp_path_factory.mktemp("events_src"))
    batch = table(spark, SF_SMOKE, "events")
    batch.write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path)


def _run_stream(spark, stream_df, name: str, mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_counts_stream_equals_batch(spark, event_source):
    path, batch = event_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got = _run_stream(spark, tumbling_counts(stream), "t_tumbling", "complete")
    want = tumbling_counts(batch)
    cols = ["window_start", "event_type", "n_events", "sum_value_micros"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_sessionized_counts_stream_equals_batch(spark, event_source):
    path, batch = event_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got = _run_stream(spark, sessionized_counts(stream), "t_sessions", "complete")
    want = sessionized_counts(batch)
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_streaming_dedup_drops_duplicates(spark, event_source):
    path, batch = event_source
    # duplicate the whole source: stream must emit each event_id once
    dup = batch.union(batch)
    dup_path = path + "_dup"
    dup.write.mode("overwrite").parquet(dup_path)
    stream = spark.readStream.schema(batch.schema).parquet(dup_path)
    got = _run_stream(spark, streaming_dedup(stream), "t_dedup", "append")
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_watermark_bounds_state(spark, event_source):
    path, batch = event_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        tumbling_counts(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_wm")
        .outputMode("append")  # append emits only watermark-finalized windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    finalized = spark.table("t_wm")
    total = tumbling_counts(batch).count()
    # all but the last open windows are finalized
    assert 0 < finalized.count() <= total


def test_stream_stream_join_equals_batch(spark, event_source):
    """Time-bounded stream-stream self-join must emit exactly the pairs
    the batch event_pairs_60s query finds."""
    from data_warehouse_project_spark.plans import QUERIES
    from data_warehouse_project_spark.streaming import paired_events_stream

    path, batch = event_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got_df = _run_stream(
        spark, paired_events_stream(stream), "t_sjoin", "append"
    )
    got = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in got_df.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["type_a"], r["type_b"]): r["n_pairs"]
        for r in QUERIES["event_pairs_60s"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0


class _FakeState:
    """Minimal GroupState stand-in for driver-side unit tests."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_transition_state_carries_across_batches():
    """_update_transitions must stitch the last type of batch N to the
    first type of batch N+1 (the whole point of keyed state)."""
    import pandas as pd

    from data_warehouse_project_spark.streaming.stateful import _update_transitions

    def mk(rows):
        return pd.DataFrame(rows, columns=["ts", "event_id", "event_type"])

    state = _FakeState()
    b1 = list(_update_transitions((7,), iter([mk([(1, 1, "a"), (2, 2, "b")])]), state))
    b2 = list(_update_transitions((7,), iter([mk([(3, 3, "b"), (4, 4, "c")])]), state))
    got = {}
    for frame in b1 + b2:
        for r in frame.itertuples():
            got[(r.prev_type, r.next_type)] = (
                got.get((r.prev_type, r.next_type), 0) + r.n_transitions
            )
    # a->b within batch 1; b->b across the batch boundary; b->c in batch 2
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1}
    assert state.get == ("c",)


def test_stateful_transitions_stream_equals_batch(spark, event_source):
    """Summing the transition stream's per-batch emissions reproduces the
    batch lag-window transition matrix."""
    from data_warehouse_project_spark.plans import QUERIES
    from data_warehouse_project_spark.streaming.stateful import (
        transition_counts_stream,
    )

    path, batch = event_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got_df = _run_stream(
        spark, transition_counts_stream(stream), "t_transitions", "append"
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in got_df.groupBy("prev_type", "next_type")
        .agg(F.sum("n_transitions").alias("n"))
        .collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in QUERIES["event_transition_counts"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_running_totals(spark, event_source):
    """applyInPandasWithState: final per-user state equals the batch
    aggregate (exact integer micro-units)."""
    from data_warehouse_project_spark.streaming.stateful import running_user_totals

    path, batch = event_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_df = spark.table("t_state")
    # update mode may emit several rows per user; counts are monotone →
    # the final state is the row with the max n_events
    got = {
        r["user_id"]: (r["n_events"], r["sum_value_micros"])
        for r in got_df.orderBy("n_events").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["sv"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("sv"),
        )
        .collect()
    }
    assert got == want


def test_stream_static_enrichment_equals_batch(spark, event_source):
    """Stream-static join must decorate exactly like the batch join,
    keep unmatched events, and default missing tiers."""
    from data_warehouse_project_spark.streaming import enriched_events_stream

    path, batch = event_source
    # Static dim covering only even user_ids so the left-join NULL path
    # is exercised.
    users = (
        batch.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn(
            "user_tier",
            F.when(F.col("user_id") % 4 == 0, "gold").otherwise("silver"),
        )
    )
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got_df = _run_stream(
        spark, enriched_events_stream(stream, users), "t_enrich", "append"
    )
    want_df = enriched_events_stream(batch, users)
    cols = ["event_id", "user_id", "user_tier"]
    assert _rows(got_df.select(*cols), cols) == _rows(want_df.select(*cols), cols)
    tiers = {r["user_tier"] for r in got_df.select("user_tier").distinct().collect()}
    assert "unknown" in tiers and ("gold" in tiers or "silver" in tiers)


def test_fct_events_mart_equals_streaming_rollup(spark, tmp_path):
    """Stream-batch unification at the mart level: the warehouse's
    hourly events fact (load_fct_events) carries exactly the (hour,
    type, n_events) cells the streaming tumbling window produces over
    the same source — one grain, two execution modes."""
    from data_warehouse_project_spark.catalog import table as cat_table
    from data_warehouse_project_spark.etl import Warehouse
    from data_warehouse_project_spark.etl.pipeline import load_fct_events
    from tests.conftest import SF_SMOKE

    wh = Warehouse(spark, str(tmp_path))
    load_fct_events(spark, wh, SF_SMOKE)
    mart = wh.read("bl_dm", "fct_events").select(
        F.col("event_hour"), "event_type", "n_events"
    )

    batch = cat_table(spark, SF_SMOKE, "events")
    rolled = tumbling_counts(batch).select(
        F.col("window_start").alias("event_hour"), "event_type", "n_events"
    )

    got = sorted(map(tuple, mart.collect()))
    want = sorted(map(tuple, rolled.collect()))
    assert got == want


def test_stateful_batch_arms_and_rounding_contract(spark):
    """running_user_totals / transition_counts_stream accept BATCH
    input (applyInPandasWithState is streaming-only, so the unified API
    needs an explicit batch arm), nulls don't crash, and rounding is
    HALF_UP like F.round — not pandas' half-even."""
    import datetime as dtm

    import pandas as pd

    from data_warehouse_project_spark.streaming.stateful import (
        _micros_half_up,
        running_user_totals,
        transition_counts_stream,
    )

    # helper: HALF_UP on half-micro values, nulls skipped
    s = pd.Series([0.0000005, None, -0.0000005, 1.0])
    assert _micros_half_up(s) == 1 - 1 + 1_000_000
    assert _micros_half_up(pd.Series([None], dtype="float64")) == 0

    df = spark.createDataFrame(
        [(1, 0.5), (1, None), (2, 0.0000005)],
        "user_id bigint, value double",
    )
    rows = {r["user_id"]: r for r in running_user_totals(df).collect()}
    assert rows[1]["n_events"] == 2  # null-valued row still counts
    assert rows[1]["sum_value_micros"] == 500_000
    assert rows[2]["sum_value_micros"] == 1  # HALF_UP

    t0 = dtm.datetime(2025, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0, 10, "view"),
            (2, t0 + dtm.timedelta(minutes=1), 10, "click"),
            (3, t0 + dtm.timedelta(minutes=2), 10, "view"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    trans = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in transition_counts_stream(ev).collect()
    }
    assert trans == {("view", "click"): 1, ("click", "view"): 1}


def test_streaming_dedup_batch_arm(spark):
    import datetime as dtm

    from data_warehouse_project_spark.streaming.windows import streaming_dedup

    t0 = dtm.datetime(2025, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 1), (1, t0, 1), (2, t0, 2)],
        "event_id bigint, ts timestamp, user_id bigint",
    )
    assert streaming_dedup(ev).count() == 2
