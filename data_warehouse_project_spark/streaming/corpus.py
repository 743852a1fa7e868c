"""Streaming corpus ingestion: the continuous version of the batch
curation pipeline (plans/text.py, plans/corpus.py) — documents arrive
as files, get normalized, quality-filtered, fingerprinted, and
exact-deduplicated before landing in the training corpus.

Every function is a pure transformation on an unbounded DataFrame
(the Structured Streaming unified API), so the identical code runs in
batch — which is how the tests verify semantics (stream == batch via
``trigger(availableNow=True)``).

Scale notes for a 100 TB/day ingest: the dedup state keeps only the
32-byte fingerprint per document (never the text — the fingerprint is
computed in the scan stage and text is carried alongside, not keyed
on); quality filtering happens BEFORE dedup so rejected docs never
enter the state store. For an unbounded 24/7 stream, pair the dedup
with periodic state TTL (e.g. re-key by (fp, ingest_day) or use
``dropDuplicatesWithinWatermark`` on an ingest-time column) — exact
forever-dedup over an infinite stream is a batch reconciliation job,
not stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_TOKENS = 5


def normalized_text(col):
    """Whitespace-collapsed, lower-cased text: the normalization used
    for exact dedup (same chain as the batch normalized_dedup_profile
    query, so stream and batch agree on what counts as a duplicate)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def curated_documents(docs: DataFrame, min_tokens: int = MIN_TOKENS) -> DataFrame:
    """Quality-filter + normalize + fingerprint + exact-dedup.

    Keeps documents with at least ``min_tokens`` whitespace tokens,
    computes the normalization fingerprint, and drops later arrivals
    with an already-seen fingerprint. Works identically on a stream
    (stateful dropDuplicates) and a batch frame.
    """
    norm = normalized_text(F.col("text"))
    return (
        docs.withColumn("n_tokens", F.size(F.split(norm, " ")))
        .filter(F.col("n_tokens") >= min_tokens)
        .withColumn("norm_fp", F.md5(norm))
        .dropDuplicates(["norm_fp"])
    )


def source_ingest_stats(docs: DataFrame, min_tokens: int = MIN_TOKENS) -> DataFrame:
    """Per-source ingest accounting: docs seen, docs passing the
    quality bar, exact token totals — the live dashboard counters a
    corpus ingest reports. Integer sums only (order-insensitive), so
    stream (complete mode) and batch agree exactly."""
    n_tokens = F.size(F.split(normalized_text(F.col("text")), " "))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(n_tokens >= min_tokens, 1).otherwise(0))
        .cast("bigint")
        .alias("n_quality"),
        F.sum(n_tokens.cast("bigint")).cast("bigint").alias("n_tokens"),
    )


def neardup_ingest(
    stream_docs: DataFrame,
    wh,
    checkpoint_dir: str,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Continuous near-duplicate detection: admit each micro-batch into
    the incremental MinHash/LSH index (operators/dedup_index.py) via
    ``foreachBatch``, maintaining three warehouse tables —
    ``bl_cl.corpus_docs`` (indexed texts), ``bl_cl.minhash_bands`` (the
    index), ``bl_cl.neardup_pairs`` (verified pairs, doc_a < doc_b,
    jaccard >= threshold).

    This is the streaming twin of the batch-at-a-time
    ``MinHashIndex`` loop (same invariant: pairs accumulated over
    micro-batches == the one-shot LSH pass over the union — proven in
    tests/test_streaming_corpus.py). Signature work per trigger is
    O(micro-batch), probes are band-bucketed equi-joins against the
    stored index, exactly the rolling-ingest shape a 100 TB/day corpus
    needs.

    Delivery contract: Structured Streaming replays a micro-batch
    after a crash, so admission is made idempotent at ROW grain, not
    by epoch markers — the batch is anti-joined against already-
    indexed doc_ids, and new pairs against already-recorded pairs,
    so a replay re-admits only what the crash lost. The one non-
    idempotent window is a crash after the index's internal band
    append but before the corpus append: the replay then re-appends
    the same band rows. Duplicate band rows cannot change the pair
    set (candidates are DISTINCT and verification is exact) — they
    only cost probe work until the next index compaction.
    """
    from data_warehouse_project_spark.operators.dedup_index import MinHashIndex

    idx = MinHashIndex(wh, threshold=threshold)

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        # in-batch key dedup first: an at-least-once upstream can repeat
        # a doc_id WITHIN one trigger, and the stored-ids anti-join
        # below only guards against docs from earlier triggers
        batch = (
            batch_df.select("doc_id", "text")
            .dropDuplicates(["doc_id"])
            .localCheckpoint()
        )
        stored = wh.read_or_none("bl_cl", "corpus_docs")
        if stored is not None:
            batch = batch.join(
                stored.select("doc_id"), "doc_id", "left_anti"
            ).localCheckpoint()
        if batch.isEmpty():
            return
        corpus = batch if stored is None else batch.unionByName(stored)
        pairs = idx.add_documents(batch, corpus)
        known = wh.read_or_none("bl_cl", "neardup_pairs")
        if known is not None:
            pairs = pairs.join(known, ["doc_a", "doc_b"], "left_anti")
        wh.append(pairs, "bl_cl", "neardup_pairs")
        wh.append(batch, "bl_cl", "corpus_docs")

    writer = (
        stream_docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
