"""Streaming corpus ingestion: the curation transforms must produce
identical results on a file stream (availableNow) and in batch — and
the dedup must keep exactly one document per normalization
fingerprint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.streaming import (
    curated_documents,
    source_ingest_stats,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def doc_source(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs_src"))
    batch = table(spark, SF_SMOKE, "documents")
    # several files so the stream sees multiple input splits
    batch.repartition(4).write.mode("overwrite").parquet(path)
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


def test_curated_stream_equals_batch(spark, doc_source):
    path, batch = doc_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = _run_stream(spark, curated_documents(stream), "curated_docs", "append")
    got = out.select("norm_fp", "n_tokens").collect()
    want = curated_documents(batch).select("norm_fp", "n_tokens").collect()
    # which duplicate survives is arrival-order-dependent; the fingerprint
    # SET and the per-fp token count are the deterministic contract
    assert sorted((r["norm_fp"], r["n_tokens"]) for r in got) == sorted(
        (r["norm_fp"], r["n_tokens"]) for r in want
    )
    assert out.count() == out.select("norm_fp").distinct().count()


def test_curated_drops_injected_duplicate(spark, doc_source):
    path, batch = doc_source
    one = batch.limit(1)
    # same text with different whitespace/case → same fingerprint
    dup = one.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.concat(F.lit("  "), F.upper(F.col("text")), F.lit(" "))
    )
    curated = curated_documents(batch.union(dup))
    fp = curated_documents(one).select("norm_fp").first()["norm_fp"]
    assert curated.filter(F.col("norm_fp") == fp).count() == 1


def test_ingest_stats_stream_equals_batch(spark, doc_source):
    path, batch = doc_source
    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = _run_stream(
        spark, source_ingest_stats(stream), "ingest_stats", "complete"
    )
    cols = ["source", "n_docs", "n_quality", "n_tokens"]
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    want = sorted(
        tuple(r[c] for c in cols) for r in source_ingest_stats(batch).collect()
    )
    assert got == want


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpoint recovery: run an aggregating stream with availableNow
    + checkpoint to a parquet sink, stop it, land MORE source files,
    restart with the SAME checkpoint — the sink must contain each input
    row's contribution exactly once (no loss, no double-processing of
    the first batch). This is the production restart discipline every
    long-running ingestion relies on."""
    from data_warehouse_project_spark.catalog import table as cat_table
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs = cat_table(spark, SF_SMOKE, "documents")
    first = docs.filter("doc_id % 2 = 0")
    second = docs.filter("doc_id % 2 = 1")
    first.repartition(2).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            stream.select("doc_id", "source", "n_chars")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()

    # land the second half as NEW files (append), restart from checkpoint
    second.repartition(2).write.mode("append").parquet(src)
    run_once()

    out = spark.read.parquet(sink)
    assert out.count() == docs.count(), "restart lost or duplicated rows"
    assert out.select("doc_id").distinct().count() == docs.count()


def test_neardup_ingest_stream_equals_one_shot(spark, tmp_path):
    """Micro-batched foreachBatch admission into the MinHash index must
    accumulate exactly the pair set the one-shot pass finds on the
    union, with the injected duplicate crossing the batch boundary."""
    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.operators.dedup_index import MinHashIndex
    from data_warehouse_project_spark.streaming import neardup_ingest

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    dup = docs.filter("doc_id = 0").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = docs.unionByName(dup).localCheckpoint()

    src = str(tmp_path / "src")
    # two files + maxFilesPerTrigger=1 → two micro-batches; the
    # duplicate of doc 0 arrives in the SECOND one
    corpus.filter("doc_id < 250").coalesce(1).write.mode("append").parquet(src)
    corpus.filter("doc_id >= 250").coalesce(1).write.mode("append").parquet(src)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = neardup_ingest(stream, wh, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    def _pairs(df):
        return sorted(
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in df.collect()
        )

    got = _pairs(wh.read("bl_cl", "neardup_pairs"))
    one_shot = MinHashIndex(Warehouse(spark, str(tmp_path / "oneshot")))
    want = _pairs(one_shot.add_documents(corpus, corpus))
    assert got == want
    assert any(a == 0 and b == 1_000_000 for a, b, _ in got)
    assert wh.read("bl_cl", "corpus_docs").count() == corpus.count()

    # restart on the same checkpoint with no new files: a no-op — the
    # row-grain idempotence plus the checkpoint replay add nothing
    q2 = neardup_ingest(stream, wh, str(tmp_path / "ckpt"))
    q2.awaitTermination(180)
    assert _pairs(wh.read("bl_cl", "neardup_pairs")) == got
    assert wh.read("bl_cl", "corpus_docs").count() == corpus.count()


def test_neardup_ingest_dedups_within_batch(spark, tmp_path):
    """A doc_id repeated INSIDE one micro-batch (at-least-once
    upstream) must be admitted once — corpus_docs keeps doc_id unique."""
    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.streaming import neardup_ingest

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(50)
    doubled = docs.unionByName(docs)
    src = str(tmp_path / "src")
    doubled.coalesce(1).write.parquet(src)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = neardup_ingest(
        spark.readStream.schema(doubled.schema).parquet(src),
        wh,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    stored = wh.read("bl_cl", "corpus_docs")
    assert stored.count() == 50
    assert stored.select("doc_id").distinct().count() == 50


def test_cascade_ingest_restart_is_exactly_once(spark, tmp_path):
    """Streaming rollup cascade under the batch-id fence: run with
    availableNow + checkpoint, stop, land MORE events, restart on the
    SAME checkpoint — every grain table must equal the direct rollup of
    everything landed, exactly once. Additive merges double-count on
    naive replay, so this is the test that the fence actually fences."""
    from pyspark.sql import functions as F

    from data_warehouse_project_spark.catalog import table as cat_table
    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.streaming import cascade_ingest
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = cat_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    first = ev.filter("event_id % 2 = 0")
    second = ev.filter("event_id % 2 = 1")
    measures = {
        "n_events": F.count(F.lit(1)),
        "value_cents": F.sum(F.round(F.col("value") * 100).cast("bigint")),
    }

    def run_once():
        stream = spark.readStream.schema(first.schema).parquet(src)
        q = cascade_ingest(
            stream, wh, ckpt, "ts", ["event_type"], measures,
            grains=("hour", "day"),
        )
        q.awaitTermination(180)

    def grain_rows(grain):
        return sorted(
            tuple(r)
            for r in wh.read("bl_dm", f"rollup_{grain}")
            .select("bucket_ts", "event_type", "n_events", "value_cents")
            .collect()
        )

    def direct(df, grain):
        return sorted(
            tuple(r)
            for r in df.groupBy(
                F.date_trunc(grain, "ts").alias("bucket_ts"), "event_type"
            )
            .agg(*[e.alias(n) for n, e in measures.items()])
            .collect()
        )

    first.repartition(2).write.mode("overwrite").parquet(src)
    run_once()
    assert grain_rows("day") == direct(first, "day")

    # SIMULATE A CRASH: a graceful availableNow stop commits its last
    # batch, and Structured Streaming never replays a committed batch —
    # so to exercise the fence we delete the newest commit-log entry.
    # The restart then re-delivers that batch (same id, same data); the
    # cascade already merged it, and without the fence every touched
    # stripe would double-count.
    import os

    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # hadoop checksum twin blocks the re-commit
        os.remove(crc)
    second.repartition(2).write.mode("append").parquet(src)
    run_once()
    for grain in ("hour", "day"):
        assert grain_rows(grain) == direct(ev, grain), f"grain {grain}"

    # a third restart with nothing new must be a pure no-op
    run_once()
    assert grain_rows("day") == direct(ev, "day")


def test_cascade_ingest_two_streams_do_not_cross_fence(spark, tmp_path):
    """Two cascades sharing one warehouse (different prefixes, different
    checkpoints) must fence independently — a global fence would let the
    first stream's batch ids swallow the second stream's batches."""
    from pyspark.sql import functions as F

    from data_warehouse_project_spark.catalog import table as cat_table
    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.streaming import cascade_ingest
    from tests.conftest import SF_SMOKE

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = cat_table(spark, SF_SMOKE, "events").select("event_id", "ts", "event_type", "value")
    src = str(tmp_path / "src")
    ev.repartition(2).write.mode("overwrite").parquet(src)
    m = {"n": F.count(F.lit(1))}

    for prefix in ("ra", "rb"):
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = cascade_ingest(
            stream, wh, str(tmp_path / f"ckpt_{prefix}"), "ts",
            ["event_type"], m, grains=("day",), prefix=prefix,
        )
        q.awaitTermination(120)

    want = sorted(
        tuple(r)
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("bucket_ts"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for prefix in ("ra", "rb"):
        got = sorted(
            tuple(r)
            for r in wh.read("bl_dm", f"{prefix}_day")
            .select("bucket_ts", "event_type", "n")
            .collect()
        )
        assert got == want, f"stream {prefix} was cross-fenced or diverged"
