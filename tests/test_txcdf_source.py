"""txcdf: the change feed as a native Structured Streaming source
(Python Data Source API). Multiset replay invariant, rate limiting,
checkpointed restart resume."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txcdf import TxCdfDataSource
from data_warehouse_project_spark.sources.txtable import TxTable


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TxCdfDataSource)
    return spark


def _churny_table(spark, root):
    t = TxTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "id long, v string"
        ),
        key="id",
    )
    t.append(spark.createDataFrame([(100, "new"), (101, "new")],
                                   "id long, v string"))
    t.merge(spark.createDataFrame([(3, "M"), (200, "M")], "id long, v string"))
    t.delete(F.col("id") % 7 == 1)            # copy-on-write
    t.delete(F.col("id") == 12, mode="dv")    # deletion vector
    t.compact(target_files=2)                 # must emit NOTHING
    t.append(spark.createDataFrame([(300, "z")], "id long, v string"))
    return t


def _replay(rows, data_cols=("id", "v")):
    acc: Counter = Counter()
    for r in rows:
        key = tuple(r[c] for c in data_cols)
        acc[key] += 1 if r["_change_type"] == "insert" else -1
    return {k for k, n in (+acc).items() if n}


def test_stream_feed_replays_to_snapshot(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    q = (
        spark.readStream.format("txcdf")
        .option("path", str(t.root))
        .load()
        .writeStream.format("memory")
        .queryName("cdf_all")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from cdf_all").collect()
    want = {(r["id"], r["v"]) for r in t.read().collect()}
    assert _replay(rows) == want, "multiset replay must equal the snapshot"
    # compact emitted nothing: no rows carry its commit version
    compact_v = [h["version"] for h in t.history() if h["op"] == "compact"]
    assert compact_v and not [
        r for r in rows if r["_commit_version"] in compact_v
    ]
    # dv delete surfaced exactly the vectored row as a delete
    dv_dels = [r for r in rows
               if r["_change_type"] == "delete" and r["id"] == 12]
    assert len(dv_dels) == 1


def test_rate_limit_and_checkpoint_restart(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        # file sink: supports checkpoint RECOVERY (memory sink doesn't)
        q = (
            spark.readStream.format("txcdf")
            .option("path", str(t.root))
            .option("maxVersionsPerBatch", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    rows1 = spark.read.parquet(out).collect()
    assert _replay(rows1) == {(r["id"], r["v"]) for r in t.read().collect()}
    # rate limit at the reader protocol level (availableNow falls back
    # to one batch for Python sources, so drive the offset cycle
    # directly): each trigger advances at most maxVersionsPerBatch
    from data_warehouse_project_spark.sources.txcdf import TxCdfStreamReader

    reader = TxCdfStreamReader(
        {"path": str(t.root), "maxVersionsPerBatch": "1"}
    )
    off = reader.initialOffset()
    seen = []
    for _ in range(t.latest_version() + 2):
        nxt = reader.latestOffset()
        if nxt["version"] <= off["version"]:
            break
        assert nxt["version"] == off["version"] + 1, "rate must cap at 1"
        reader.partitions(off, nxt)
        reader.commit(nxt)
        seen.append(nxt["version"])
        off = nxt
    assert seen == list(range(t.latest_version() + 1))

    # restart with NEW churn: only the delta arrives (exactly once)
    t.merge(spark.createDataFrame([(3, "M2"), (400, "x")],
                                  "id long, v string"))
    run_once()
    rows_all = spark.read.parquet(out).collect()
    rows2 = [r for r in rows_all
             if r["_commit_version"] > max(x["_commit_version"] for x in rows1)]
    assert len(rows_all) == len(rows1) + len(rows2), "no version re-emitted"
    assert rows2, "the new merge's changes must arrive"
    net = _replay(rows_all)
    assert net == {(r["id"], r["v"]) for r in t.read().collect()}
    assert ("M2" in {v for _, v in net}) and (400, "x") in net



def test_native_streaming_cdc_pipeline_tx_to_tx(registered, tmp_path):
    """The whole CDC triangle through NATIVE APIs: a churning source
    table → readStream.format("txcdf") → foreachBatch fenced upsert
    into a sink TxTable. The sink converges to the source snapshot
    (last-write-wins per key inside a batch), exactly-once across a
    second availableNow pass."""
    spark = registered
    src = _churny_table(spark, tmp_path / "src")
    sink_root = str(tmp_path / "sink")
    TxTable.create(
        spark,
        sink_root,
        spark.createDataFrame([], "id long, v string"),
        key="id",
    )

    def upsert(batch_df, batch_id):
        t = TxTable(batch_df.sparkSession, sink_root)
        # collapse the batch per key: latest change wins; a key whose
        # final change is a delete leaves the sink
        w = F.struct("_commit_version", "_change_type")
        last = (
            batch_df.groupBy("id")
            .agg(F.max_by(F.struct("v", "_change_type"), w).alias("fin"))
            .select("id", F.col("fin.v").alias("v"),
                    F.col("fin._change_type").alias("ct"))
        )
        ups = last.filter(F.col("ct") == "insert").drop("ct")
        dels = last.filter(F.col("ct") == "delete").drop("ct")
        t.merge(ups, txn=("cdc", 2 * batch_id))
        if dels.take(1):
            t.merge(dels, when_matched="delete", when_not_matched=None,
                    txn=("cdc", 2 * batch_id + 1))

    def run():
        q = (
            spark.readStream.format("txcdf")
            .option("path", str(src.root))
            .load()
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    sink = TxTable(spark, sink_root)
    want = {(r["id"], r["v"]) for r in src.read().collect()}
    got = {(r["id"], r["v"]) for r in sink.read().collect()}
    assert got == want, "sink must converge to the source snapshot"
    # new churn + a second pass: delta only, still converged
    src.merge(spark.createDataFrame([(3, "M3"), (777, "w")],
                                    "id long, v string"))
    src.delete(F.col("id") == 300)
    run()
    got = {(r["id"], r["v"]) for r in TxTable(spark, sink_root).read().collect()}
    want = {(r["id"], r["v"]) for r in src.read().collect()}
    assert got == want


def test_skip_change_commits_streams_appends_only(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    q = (
        spark.readStream.format("txcdf")
        .option("path", str(t.root))
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_appends")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from cdf_appends").collect()
    assert rows and all(r["_change_type"] == "insert" for r in rows)
    # exactly the append commits' rows: create(20) + append(2) + append(1);
    # the merge (rewrites + inserts), deletes and compact are skipped
    assert len(rows) == 23
    versions = {r["_commit_version"] for r in rows}
    append_vs = {h["version"] for h in t.history()
                 if h["op"] in ("create", "append")}
    assert versions <= append_vs


def test_starting_timestamp_resolves_to_version(registered, tmp_path):
    import time as _time

    from data_warehouse_project_spark.sources.txcdf import TxCdfStreamReader
    from data_warehouse_project_spark.sources.txtable import TxError

    t = TxTable.create(
        registered, tmp_path / "t",
        registered.createDataFrame([(1, "a")], "id long, v string"),
        key="id",
    )
    _time.sleep(1.1)
    cut = t._manifest(0)["ts"]  # strictly before the next commit's stamp
    t.append(registered.createDataFrame([(2, "b")], "id long, v string"))
    r = TxCdfStreamReader({"path": str(t.root), "startingTimestamp": cut})
    assert r.initialOffset() == {"version": -1}  # v0 stamped AT cut
    later = t._manifest(1)["ts"]
    r2 = TxCdfStreamReader({"path": str(t.root), "startingTimestamp": later})
    assert r2.initialOffset() == {"version": 0}  # starts at v1
    r3 = TxCdfStreamReader(
        {"path": str(t.root), "startingTimestamp": "2999-01-01T00:00:00Z"}
    )
    assert r3.initialOffset()["version"] == t.latest_version()  # only new
    with pytest.raises(TxError, match="OR startingTimestamp"):
        TxCdfStreamReader({"path": str(t.root), "startingVersion": "0",
                           "startingTimestamp": cut})


def test_rate_limit_applies_after_restart(registered, tmp_path):
    """maxVersionsPerBatch must survive a checkpoint restart: a fresh
    reader (as the engine builds on restart) has no commit() history,
    so the cap base is seeded from the replayed batch's start offset
    (partitions) or the last offset this reader returned — one trigger
    must never consume the whole backlog after the first."""
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    latest = t.latest_version()
    assert latest >= 4, "need a backlog for the test to mean anything"
    from data_warehouse_project_spark.sources.txcdf import TxCdfStreamReader

    # case 1: restart with an uncommitted batch — the engine re-plans
    # it via partitions(start, end), commits it, THEN asks for a new
    # offset: the new offset must advance by at most the rate
    r1 = TxCdfStreamReader({"path": str(t.root), "maxVersionsPerBatch": "1"})
    r1.partitions({"version": 0}, {"version": 1})  # replayed batch
    assert r1.latestOffset()["version"] <= 2, "capped even before commit"
    r1.commit({"version": 1})
    nxt = r1.latestOffset()
    assert nxt["version"] == 2, "first post-restart batch must be capped"

    # case 2: clean restart — the first latestOffset has no base (the
    # API exposes none) but every subsequent one caps against it
    r2 = TxCdfStreamReader({"path": str(t.root), "maxVersionsPerBatch": "1"})
    first = r2.latestOffset()["version"]
    t.append(spark.createDataFrame([(900, "z")], "id long, v string"))
    t.append(spark.createDataFrame([(901, "z")], "id long, v string"))
    assert r2.latestOffset()["version"] <= first + 1, (
        "second batch after a clean restart must be rate-capped"
    )
