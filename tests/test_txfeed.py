"""Change-feed incremental source (streaming/txfeed.py): a tx → tx → tx
cascade driven purely by CDF consumption, exactly-once across
mid-stream restarts, rate-limited per micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxError, TxTable
from data_warehouse_project_spark.streaming.txfeed import (
    _plan_batches,
    replicate_changes,
)


def _snap(t, cols=("id", "v")):
    return sorted(tuple(r[c] for c in cols) for r in t.read().collect())


def test_plan_batches_rate_limit():
    assert _plan_batches(-1, 5, 2) == [(0, 1), (2, 3), (4, 5)]
    assert _plan_batches(3, 3, 2) == []
    assert _plan_batches(-1, 0, None) == [(0, 0)]


def test_two_hop_cascade_stream_equals_batch(spark, tmp_path):
    """A (raw) → B (filtered replica via A's feed) → C (replica of B
    via B's feed): the cascade consumes ONLY change feeds, survives a
    mid-stream crash (partial consumption + rerun), skips replays, and
    ends exactly equal to the batch recompute."""
    a_root, b_root, c_root = (
        str(tmp_path / n) for n in ("a", "b", "c")
    )
    a = TxTable.create(
        spark,
        a_root,
        spark.createDataFrame(
            [(i, f"v{i}", i % 3) for i in range(30)], "id long, v string, g long"
        ),
        key="id",
    )
    # a little history: appends, an update-shaped merge, deletes (cow+dv)
    a.append(spark.createDataFrame([(100 + i, "new", i % 3) for i in range(5)],
                                   "id long, v string, g long"))
    a.merge(spark.createDataFrame([(3, "M", 0), (200, "M", 1)],
                                  "id long, v string, g long"))
    a.delete(F.col("id") % 7 == 1)
    a.delete(F.col("id") == 12, mode="dv")

    # hop 1, mid-stream crash: consume only 2 of the 5 source versions
    r = replicate_changes(
        spark, a_root, b_root, app="b", where="g != 2",
        max_versions_per_batch=1, max_batches=2,
    )
    assert r["batches"] == 2 and r["consumed_to"] == 1 and r["pending"] == 3
    # restart: picks up at the fence, drains the rest
    r = replicate_changes(
        spark, a_root, b_root, app="b", where="g != 2",
        max_versions_per_batch=1,
    )
    assert r["consumed_to"] == a.latest_version() and r["pending"] == 0
    b = TxTable(spark, b_root)
    want_b = sorted(
        tuple(r0) for r0 in a.read().filter("g != 2").collect()
    )
    assert _snap(b, ("id", "v", "g")) == want_b

    # hop 2 consumes B's OWN commit log (b gained one version per batch)
    assert b.latest_version() >= 5
    r = replicate_changes(spark, b_root, c_root, app="c",
                          columns=["id", "v"])
    assert r["pending"] == 0
    c = TxTable(spark, c_root)
    assert _snap(c) == sorted(
        (t[0], t[1]) for t in want_b
    ), "two-hop cascade must equal the batch recompute"

    # replay: nothing pending, fence skips, no new sink versions
    vb, vc = b.latest_version(), c.latest_version()
    replicate_changes(spark, a_root, b_root, app="b", where="g != 2")
    replicate_changes(spark, b_root, c_root, app="c", columns=["id", "v"])
    assert (b.latest_version(), c.latest_version()) == (vb, vc)

    # new source churn flows through incrementally
    a.merge(spark.createDataFrame([(3, "M2", 0), (301, "x", 2)],
                                  "id long, v string, g long"))
    replicate_changes(spark, a_root, b_root, app="b", where="g != 2")
    replicate_changes(spark, b_root, c_root, app="c", columns=["id", "v"])
    got = dict(_snap(TxTable(spark, c_root)))
    assert got[3] == "M2" and 301 not in got


def test_replicate_guards(spark, tmp_path):
    t = TxTable.create(
        spark, tmp_path / "nk",
        spark.createDataFrame([(1, "a")], "id long, v string"),
    )
    with pytest.raises(TxError, match="key"):
        replicate_changes(spark, str(tmp_path / "nk"), str(tmp_path / "s"),
                          app="x")
    t2 = TxTable.create(
        spark, tmp_path / "k",
        spark.createDataFrame([(1, "a")], "id long, v string"), key="id",
    )
    assert t2 is not None
    with pytest.raises(TxError, match="keep the source key"):
        replicate_changes(spark, str(tmp_path / "k"), str(tmp_path / "s2"),
                          app="x", columns=["v"])


# --------------------------------------------- model-based hypothesis

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("merge"),
                st.dictionaries(
                    st.integers(0, 25), st.integers(0, 99), min_size=1,
                    max_size=5,
                ),
            ),
            st.tuples(st.just("delete_mod"), st.integers(2, 5),
                      st.integers(0, 4)),
            st.tuples(st.just("append"), st.integers(100, 140)),
        ),
        min_size=1,
        max_size=6,
    ),
    rate=st.one_of(st.none(), st.integers(1, 3)),
    crash_after=st.integers(0, 4),
)
def test_replicate_matches_filtered_source_random_ops(
    spark, tmp_path_factory, ops, rate, crash_after
):
    """Random source op-log × random batch rate × a mid-stream crash:
    after catch-up the replica always equals the filtered source, and
    a replayed consumption changes nothing."""
    tmp = tmp_path_factory.mktemp("feed")
    a_root, b_root = str(tmp / "a"), str(tmp / "b")
    a = TxTable.create(
        spark,
        a_root,
        spark.createDataFrame(
            [(i, i % 10) for i in range(26)], "id long, n long"
        ),
        key="id",
    )
    model = {i: i % 10 for i in range(26)}
    for op in ops:
        if op[0] == "merge":
            a.merge(spark.createDataFrame(
                sorted(op[1].items()), "id long, n long"))
            model.update(op[1])
        elif op[0] == "delete_mod":
            _, mod, rem = op
            before = a.latest_version()
            a.delete(F.col("id") % mod == rem,
                     mode="dv" if (mod + rem) % 2 else "rewrite")
            model = {k: v for k, v in model.items() if k % mod != rem}
            if a.latest_version() == before:
                continue  # no-match delete committed nothing
        else:
            if op[1] in model:
                continue
            a.append(spark.createDataFrame([(op[1], -1)], "id long, n long"))
            model[op[1]] = -1

    kw = dict(where="n != 3", max_versions_per_batch=rate)
    replicate_changes(spark, a_root, b_root, app="r", max_batches=crash_after,
                      **kw)
    replicate_changes(spark, a_root, b_root, app="r", **kw)  # catch up
    b = TxTable(spark, b_root)
    want = sorted((k, v) for k, v in model.items() if v != 3)
    got = sorted((r["id"], r["n"]) for r in b.read().collect())
    assert got == want
    vb = b.latest_version()
    replicate_changes(spark, a_root, b_root, app="r", **kw)  # replay
    assert b.latest_version() == vb
