"""Incremental MinHash/LSH near-dup index — the production shape of
corpus dedup at 100 TB.

``plans/text.dedup_minhash_lsh`` recomputes signatures for the WHOLE
corpus per run; correct for a static table, a non-starter for a corpus
that grows by batches (recomputing 100 TB of shingles to admit 1 GB of
new documents). The index maintains a warehouse-backed band-signature
table — ``(band_id, band_sig, doc_id)``, the same banding scheme and
seeded-md5 min-hashes as the batch query — and admits each new batch
with:

1. signature computation over the NEW batch only (O(batch));
2. candidate generation = equi-join of the batch's band rows against
   the stored band table on (band_id, band_sig) — partition-pruned by
   band_id, and skew-bounded because equal band signatures imply
   near-identical documents;
3. exact shingle-Jaccard verification of candidates only, joining back
   to the caller-supplied corpus for the matched docs' texts;
4. append of the batch's band rows into the store.

Invariant (tested): running batches B1, B2, ... through the index
yields exactly the pair set the one-shot batch query finds on
B1 ∪ B2 ∪ ... — incremental admission loses nothing and invents
nothing.

At scale the store is parquet partitioned by ``band_id`` (a handful of
directories, each hash-bucketed on band_sig by the shuffle); per batch
only O(batch + candidates) rows move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_project_spark.etl.warehouse import Warehouse

MINHASH_K = 8
BANDS = ((0, 1), (2, 3), (4, 5), (6, 7))


def shingles_of(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, shingle) distinct 3-word shingles of an arbitrary frame
    with a ``text`` column — THE canonical shingle construction, shared
    by the batch queries (plans/text.py delegates here) and the index.
    The token array is materialized in its own projection first: an
    inline ``split(text)`` gets re-evaluated by Catalyst's
    project-collapsing for every element_at — O(tokens²) per document
    (measured 13x slower at sf0.1)."""
    toks = docs.select(
        key, F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 3)
    t = F.col("t")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(t) - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i + 1), F.element_at(t, i + 2), F.element_at(t, i + 3)
        ),
    )
    return toks.select(key, F.explode(sh).alias("shingle")).distinct()


def minhash_cols(k: int) -> list:
    """k seeded-md5 min-hash aggregate columns (h0..h{k-1}) over a
    ``shingle`` column — the one signature scheme every minhash user
    (LSH query, source-overlap signatures, this index) must share, or
    their signatures stop being comparable."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]


def band_rows(shingles: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_sig): seeded-md5 min-hash signature rows,
    banded — identical scheme to dedup_minhash_lsh so index results are
    comparable to the batch query's."""
    mh = shingles.groupBy("doc_id").agg(*minhash_cols(MINHASH_K))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.md5(F.concat(F.col(f"h{a}"), F.col(f"h{b}"))).alias("band_sig"),
            )
            for bi, (a, b) in enumerate(BANDS)
        ]
    )
    return mh.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_sig").alias("band_sig"),
    )


class MinHashIndex:
    """Warehouse-backed incremental LSH index over a documents corpus."""

    def __init__(
        self,
        wh: Warehouse,
        layer: str = "bl_cl",
        name: str = "minhash_bands",
        threshold: float = 0.5,
    ):
        self.wh = wh
        self.layer = layer
        self.name = name
        self.threshold = threshold

    def add_documents(self, batch: DataFrame, corpus: DataFrame) -> DataFrame:
        """Admit ``batch`` (doc_id, text, ...) into the index and return
        the verified near-dup pairs it creates — (doc_a, doc_b, jaccard)
        with doc_a < doc_b — against everything already indexed AND
        within the batch itself. ``corpus`` must contain the text of
        every already-indexed doc_id plus the batch (it is only read for
        candidate verification — O(candidates), not O(corpus)).
        """
        # bands_batch is read three times (probe join, candidate join,
        # store append) — cache it; the shingle frame feeds ONLY the
        # band aggregation, so caching it would pay a memory-write for
        # a single consumer
        sh_batch = shingles_of(batch)
        bands_batch = band_rows(sh_batch).cache()

        stored = self.wh.read_or_none(self.layer, self.name)
        if stored is not None:
            probe = bands_batch.unionByName(stored)
        else:
            probe = bands_batch
        # candidates where at least one side is from the new batch:
        # batch rows probe the union (old + new), old-old pairs are
        # already known from previous calls
        a = bands_batch.alias("a")
        b = probe.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            )
            .distinct()
        )

        # exact verification joins the corpus texts of candidates only.
        # (A/B'd r5: routing the batch side through a cached copy of
        # sh_batch instead of recomputing measured SLOWER — 6.5s -> 8.3s
        # at sf0.1 — because candidates are few, so shingling them afresh
        # is cheaper than semi/anti-joins against the large shingle set;
        # a second A/B then dropped sh_batch's own cache too, 6.3->5.7s.)
        cand_ids = cand.select(F.col("doc_a").alias("doc_id")).unionByName(
            cand.select(F.col("doc_b").alias("doc_id"))
        ).distinct()
        sh_cand = shingles_of(
            corpus.join(cand_ids, "doc_id", "left_semi")
        ).cache()
        sizes = sh_cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        x = sh_cand.alias("x")
        y = sh_cand.alias("y")
        shared = (
            cand.join(x, F.col("doc_a") == F.col("x.doc_id"))
            .join(
                y,
                (F.col("doc_b") == F.col("y.doc_id"))
                & (F.col("y.shingle") == F.col("x.shingle")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        sa = sizes.alias("sa")
        sb = sizes.alias("sb")
        jac = F.col("n_shared").cast("double") / (
            F.col("sa.n") + F.col("sb.n") - F.col("n_shared")
        )
        pairs = (
            shared.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
            .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
        )
        result = pairs.orderBy("doc_a", "doc_b").localCheckpoint()

        self.wh.append(bands_batch, self.layer, self.name)
        bands_batch.unpersist()
        sh_cand.unpersist()
        return result
