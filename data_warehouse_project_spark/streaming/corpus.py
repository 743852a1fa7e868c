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
