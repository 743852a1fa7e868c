"""Multi-table atomic commits (sources/txcatalog.py) and the
transactional rollup cascade (streaming/txsink.txcascade_ingest):
catalog pins give consistent cross-table snapshots; per-table txn
fences + the catalog fence give exactly-once across crash replays of a
PARTIALLY-landed multi-table transaction — the residual window the
plain-parquet cascade documents, now closed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txcatalog import TxCatalog
from data_warehouse_project_spark.sources.txtable import (
    TxError,
    TxTable,
)


def _df(spark, rows, schema="id long, v long"):
    return spark.createDataFrame(rows, schema)


def _d(t):
    return {r["id"]: r["v"] for r in t.collect()}


def test_catalog_create_transaction_snapshot(spark, tmp_path):
    cat = TxCatalog.create(spark, tmp_path / "cat")
    with cat.transaction() as tx:
        tx.append("a", _df(spark, [(1, 10)]), key="id")
        tx.append("b", _df(spark, [(2, 20)]), key="id")
    # each table: v0 = empty create, v1 = the fenced append
    assert cat.snapshot() == {"a": 1, "b": 1}
    assert _d(cat.read("a")) == {1: 10} and _d(cat.read("b")) == {2: 20}
    with pytest.raises(TxError, match="not in catalog"):
        cat.read("zzz")
    with pytest.raises(TxError, match="not a transactional catalog"):
        TxCatalog(spark, tmp_path / "nope")
    with pytest.raises(TxError, match="already"):
        TxCatalog.create(spark, tmp_path / "cat")


def test_partial_transaction_invisible_until_pinned(spark, tmp_path):
    """Crash simulation: table commits land, catalog pin doesn't. A
    catalog reader must still see the OLD consistent pair."""
    cat = TxCatalog.create(spark, tmp_path / "cat")
    with cat.transaction() as tx:
        tx.append("a", _df(spark, [(1, 1)]), key="id")
        tx.append("b", _df(spark, [(1, 1)]), key="id")
    # start a transaction, advance table 'a' only, DON'T commit
    tx2 = cat.transaction()
    tx2.__enter__()
    tx2.append("a", _df(spark, [(2, 2)]))
    # direct (unpinned) handle sees the new data; catalog reads do not
    assert _d(cat.table("a").read()) == {1: 1, 2: 2}
    assert _d(cat.read("a")) == {1: 1}, "catalog must pin the old version"
    assert _d(cat.read("b")) == {1: 1}
    # completing the transaction publishes both at once
    tx2.append("b", _df(spark, [(2, 2)]))
    tx2.commit()
    assert _d(cat.read("a")) == {1: 1, 2: 2}
    assert _d(cat.read("b")) == {1: 1, 2: 2}
    # catalog time travel: version 1 still reads the old pair
    assert _d(cat.read("a", version=1)) == {1: 1}


def test_replayed_transaction_is_exactly_once(spark, tmp_path):
    """Replay a transaction whose FIRST table op landed but whose
    second (and the catalog pin) did not — the classic partial crash.
    The replay must skip the landed op, run the missing one, and pin
    once; totals come out exactly-once on both tables."""
    cat = TxCatalog.create(spark, tmp_path / "cat")
    with cat.transaction(txn=("app", 0)) as tx:
        tx.append("a", _df(spark, [(1, 1)]), key="id")
        tx.append("b", _df(spark, [(1, 1)]), key="id")

    class Boom(RuntimeError):
        pass

    with pytest.raises(Boom):
        with cat.transaction(txn=("app", 1)) as tx:
            tx.append("a", _df(spark, [(2, 2)]))
            raise Boom()  # crash before table b / catalog pin
    assert _d(cat.read("a")) == {1: 1}  # unpinned, invisible
    # replay of batch 1 (foreachBatch redelivery)
    with cat.transaction(txn=("app", 1)) as tx:
        r1 = tx.append("a", _df(spark, [(2, 2)]))
        r2 = tx.append("b", _df(spark, [(2, 2)]))
    assert r1.get("skipped") is True, "landed op must fence-skip on replay"
    assert "skipped" not in r2
    assert _d(cat.read("a")) == {1: 1, 2: 2}
    assert _d(cat.read("b")) == {1: 1, 2: 2}
    # a SECOND full replay (fence already at 1) is a wholesale no-op
    v = cat.latest_version()
    with cat.transaction(txn=("app", 1)) as tx:
        assert tx.append("a", _df(spark, [(9, 9)])).get("skipped") is True
    assert cat.latest_version() == v
    assert _d(cat.read("a")) == {1: 1, 2: 2}


def test_fenced_rewrite_is_exactly_once_for_additive_deltas(spark, tmp_path):
    """rewrite_by_keys with txn: the NON-idempotent additive transform
    must apply once even when replayed."""
    cat = TxCatalog.create(spark, tmp_path / "cat")
    base = _df(spark, [(1, 100), (2, 200)])
    with cat.transaction(txn=("s", 0)) as tx:
        tx.append("t", base, key="id")
    delta = _df(spark, [(1, 5), (3, 7)])

    def add(cur):
        return cur.unionByName(delta).groupBy("id").agg(
            F.sum("v").alias("v")
        )

    for _ in range(3):  # original + two replays
        with cat.transaction(txn=("s", 1)) as tx:
            tx.rewrite_by_keys("t", delta.select("id"), add)
    assert _d(cat.read("t")) == {1: 105, 2: 200, 3: 7}


def test_catalog_vacuum_keeps_pinned_versions(spark, tmp_path):
    cat = TxCatalog.create(spark, tmp_path / "cat")
    for i in range(4):
        with cat.transaction() as tx:
            tx.append("a", _df(spark, [(i, i)]), key="id")
    assert cat.latest_version() == 4
    r = cat.vacuum(retain_versions=2, min_age_s=0.0, force=True)
    assert set(r) == {"a"}
    # retained catalog versions still resolve
    assert len(_d(cat.read("a"))) == 4
    assert len(_d(cat.read("a", version=cat.latest_version() - 1))) == 3
    # pre-horizon catalog version is gone
    with pytest.raises(Exception, match="not on disk"):
        cat.read("a", version=0)


# ------------------------------------------------ transactional cascade


@pytest.fixture()
def event_batch(spark):
    rows = [
        (1, "click", "2024-03-01 10:05:00", 3),
        (2, "click", "2024-03-01 10:45:00", 4),
        (3, "view", "2024-03-01 11:05:00", 5),
        (4, "click", "2024-03-02 09:00:00", 7),
        (5, "view", "2024-04-01 00:00:30", 11),
        (6, "click", None, 99),  # NULL ts excluded by contract
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string, n long"
    ).select("event_id", "event_type", F.to_timestamp("ts_s").alias("ts"), "n")


def _grain_truth(df, grain, dims, names):
    out = df.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc(grain, "ts").alias("bucket_ts"), *dims
    )
    return {
        tuple(str(r[c]) for c in ("bucket_ts", *dims)): tuple(r[n] for n in names)
        for r in out.agg(
            F.sum("n").alias("sum_n"), F.count(F.lit(1)).alias("n_rows")
        ).collect()
    }


def _grain_got(cat, grain, dims, names):
    df = cat.read(f"rollup_{grain}")
    return {
        tuple(str(r[c]) for c in ("bucket_ts", *dims)): tuple(r[n] for n in names)
        for r in df.collect()
    }


def test_txcascade_stream_equals_batch_and_survives_replay(spark, tmp_path):
    from data_warehouse_project_spark.streaming import txcascade_ingest

    src = tmp_path / "src"
    rows1 = [
        (1, "click", "2024-03-01 10:05:00", 3),
        (2, "view", "2024-03-01 10:45:00", 4),
        (3, "click", None, 99),
    ]
    spark.createDataFrame(
        rows1, "event_id long, event_type string, ts_s string, n long"
    ).select(
        "event_id", "event_type", F.to_timestamp("ts_s").alias("ts"), "n"
    ).coalesce(1).write.mode("append").parquet(str(src))

    kw = dict(
        ts_col="ts",
        dims=["event_type"],
        measures={"sum_n": F.sum("n"), "n_rows": F.count(F.lit(1))},
        grains=("hour", "day", "month"),
    )
    cat_root, ckpt = tmp_path / "cat", tmp_path / "ck"

    def run():
        stream = spark.readStream.schema(
            "event_id long, event_type string, ts timestamp, n long"
        ).parquet(str(src))
        q = txcascade_ingest(stream, str(cat_root), str(ckpt), **kw)
        q.awaitTermination(180)

    run()
    cat = TxCatalog(spark, cat_root)
    batch_all = spark.read.parquet(str(src))
    names = ["sum_n", "n_rows"]
    for g in ("hour", "day", "month"):
        assert _grain_got(cat, g, ["event_type"], names) == _grain_truth(
            batch_all, g, ["event_type"], names
        ), g
    # restart with no new data: nothing double-applies
    v = cat.latest_version()
    run()
    assert cat.latest_version() == v
    # incremental batch, including a LATE row into an existing stripe
    rows2 = [
        (4, "click", "2024-03-01 10:59:00", 10),  # late, same hour as row 1
        (5, "view", "2024-05-02 08:00:00", 6),
    ]
    spark.createDataFrame(
        rows2, "event_id long, event_type string, ts_s string, n long"
    ).select(
        "event_id", "event_type", F.to_timestamp("ts_s").alias("ts"), "n"
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()
    batch_all = spark.read.parquet(str(src))
    for g in ("hour", "day", "month"):
        assert _grain_got(cat, g, ["event_type"], names) == _grain_truth(
            batch_all, g, ["event_type"], names
        ), f"{g} after increment"
    # all three grains pinned at one catalog version — consistent totals
    snap = cat.snapshot()
    totals = {
        g: cat.read(f"rollup_{g}").agg(F.sum("sum_n")).first()[0]
        for g in ("hour", "day", "month")
    }
    assert len(set(totals.values())) == 1, f"grains diverge: {totals} @ {snap}"


def test_txcascade_replayed_batch_never_double_counts(spark, tmp_path, event_batch):
    """Drive admit() directly (no stream) and redeliver the same batch
    id — the additive merges must fence-skip at every grain."""
    from data_warehouse_project_spark.sources.txcatalog import TxCatalog as TC
    from data_warehouse_project_spark.streaming.txsink import txcascade_ingest  # noqa: F401

    cat = TxCatalog.create(spark, tmp_path / "cat")
    names = ["sum_n", "n_rows"]
    delta = (
        event_batch.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type")
        .agg(F.sum("n").alias("sum_n"), F.count(F.lit(1)).alias("n_rows"))
        .withColumn("bucket_us", F.unix_micros("bucket_ts"))
    )

    def add(cur):
        return cur.unionByName(delta.select(*cur.columns)).groupBy(
            "bucket_us", "bucket_ts", "event_type"
        ).agg(*[F.sum(n).alias(n) for n in names])

    for _ in range(3):  # deliver + two replays
        with cat.transaction(txn=("c", 7)) as tx:
            tx.rewrite_by_keys(
                "rollup_hour", delta.select("bucket_us"), add,
                like=delta, key="bucket_us",
            )
    got = _grain_got(cat, "hour", ["event_type"], names)
    want = _grain_truth(event_batch, "hour", ["event_type"], names)
    assert got == want


def test_transaction_pins_own_commit_not_foreign(spark, tmp_path):
    """A concurrent writer landing between a transaction's ops must not
    get its (unrelated) commit pinned as part of this transaction's
    snapshot — each op pins the version IT committed."""
    from data_warehouse_project_spark.sources.txcatalog import TxCatalog
    from data_warehouse_project_spark.sources.txtable import TxTable

    cat = TxCatalog.create(spark, tmp_path / "cat")
    with cat.transaction(txn=("app", 1)) as tx:
        tx.append("t", spark.createDataFrame([(1, 10)], "k long, v long"),
                  key="k")
    with cat.transaction(txn=("app", 2)) as tx:
        tx.append("t", spark.createDataFrame([(2, 20)], "k long, v long"))
        pinned_mid = tx._pins["t"]
        # foreign writer commits directly to the member table
        TxTable(spark, cat.tables_dir / "t").append(
            spark.createDataFrame([(99, 990)], "k long, v long")
        )
        assert tx._pins["t"] == pinned_mid  # unchanged by the foreigner
    pins = cat.snapshot()
    t = cat.table("t")
    assert pins["t"] == pinned_mid
    assert pinned_mid < t.latest_version()  # foreign commit is ahead
    # catalog-resolved read shows the transaction's snapshot, without
    # the foreign rows; the direct handle sees them
    got = {r["k"] for r in cat.read("t").collect()}
    assert got == {1, 2}
    assert {r["k"] for r in t.read().collect()} == {1, 2, 99}


def test_catalog_restore_rewinds_cross_table_snapshot(spark, tmp_path):
    from data_warehouse_project_spark.sources.txcatalog import TxCatalog

    cat = TxCatalog.create(spark, tmp_path / "cat")
    with cat.transaction(txn=("app", 1)) as tx:
        tx.append("a", spark.createDataFrame([(1, 1)], "k long, v long"),
                  key="k")
        tx.append("b", spark.createDataFrame([(1, 10)], "k long, v long"),
                  key="k")
    v_before = cat.latest_version()
    with cat.transaction(txn=("app", 2)) as tx:
        tx.merge("a", spark.createDataFrame([(1, 2)], "k long, v long"))
        tx.merge("b", spark.createDataFrame([(1, 20)], "k long, v long"))
    assert {r["v"] for r in cat.read("a").collect()} == {2}
    r = cat.restore(v_before)
    assert r["restored_from"] == v_before
    # BOTH tables rewound together at the catalog level...
    assert {r0["v"] for r0 in cat.read("a").collect()} == {1}
    assert {r0["v"] for r0 in cat.read("b").collect()} == {10}
    # ...while the member tables' own logs keep the later versions
    assert {r0["v"] for r0 in cat.table("a").read().collect()} == {2}
    # fences survive: a replay of txn 2 is still a no-op
    with cat.transaction(txn=("app", 2)) as tx:
        assert tx.append(
            "a", spark.createDataFrame([(9, 9)], "k long, v long")
        ).get("skipped")


def test_concurrent_view_refreshes_fold_exactly_once(spark, tmp_path):
    """Two handles refreshing the SAME view over the same base churn:
    the fence + commit rebase ensure the delta folds exactly once."""
    import threading

    from data_warehouse_project_spark.sources.txtable import TxTable
    from data_warehouse_project_spark.sources.txview import TxAggView

    base = TxTable.create(
        spark,
        tmp_path / "base",
        spark.createDataFrame(
            [(i, i % 4, 10) for i in range(40)], "id long, g long, amt long"
        ),
        key="id",
    )
    TxAggView.create(spark, tmp_path / "view", base, group_col="g",
                     measures={"total": "amt"})
    base.append(spark.createDataFrame([(100, 0, 7)], "id long, g long, amt long"))
    errors = []

    def refresher():
        try:
            TxAggView(spark, tmp_path / "view").refresh()
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    ths = [threading.Thread(target=refresher) for _ in range(3)]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=300)
    assert not errors, errors
    view = TxAggView(spark, tmp_path / "view")
    got = {(r["g"], r["total"], r["n_rows"]) for r in view.read().collect()}
    want = {
        (r["g"], r["t"], r["n"])
        for r in base.read().groupBy("g").agg(
            F.sum("amt").alias("t"), F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == want, "delta must fold exactly once across racers"


def test_replayed_skip_pins_fence_commit_not_foreign_latest(spark, tmp_path):
    """A REPLAYED transaction whose per-table ops are fenced skips must
    pin the version the fence originally committed at — not the latest
    table version at skip time, which can be a foreign writer's later
    commit (the exact leak the own-commit pin rule exists to prevent)."""
    cat = TxCatalog.create(spark, tmp_path / "cat")
    with cat.transaction(txn=("app", 1)) as tx:
        tx.append("t", _df(spark, [(1, 10)]), key="id")
    committed_pin = cat.snapshot()["t"]

    # a foreign writer lands AFTER the transaction committed
    TxTable(spark, cat.tables_dir / "t").append(_df(spark, [(99, 990)]))

    # crash-replay of the SAME transaction, but with the catalog fence
    # stripped (simulating a crash after table commits, before the
    # catalog pin) so the per-table skip path actually runs
    m = cat._manifest()
    cat._commit(m["version"] + 1, dict(m["tables"]), {})
    with cat.transaction(txn=("app", 1)) as tx:
        r = tx.append("t", _df(spark, [(1, 10)]), key="id")
        assert r.get("skipped")
        assert tx._pins["t"] == committed_pin  # NOT the foreign latest
    assert cat.snapshot()["t"] == committed_pin
    assert {r["id"] for r in cat.read("t").collect()} == {1}
    assert {r["id"] for r in cat.table("t").read().collect()} == {1, 99}
