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


def band_rows_narrow(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, band_id, band_sig) computed PER ROW in codegen — zero
    shuffles — by folding the shingle array into the 8 min-hashes with
    ``F.aggregate`` instead of exploding + distinct + groupBy. Exactly
    the scheme of ``band_rows(shingles_of(docs))`` (tested equal):
    MIN is duplicate-insensitive, so skipping the shingle ``distinct``
    changes nothing, and ``least`` over md5 hex strings is the same
    binary ordering as the MIN aggregate. This is the admission path's
    signature computation — the two corpus-sized shuffles the
    explode/groupBy formulation pays per batch (measured: they were
    most of a 3x admission-vs-one-shot gap at sf0.1) become none; the
    only shuffle left in an admission is the band-table probe join
    itself. Each chained select keeps its alias referenced more than
    once, so CollapseProject leaves the non-cheap array expressions
    evaluated once per row."""
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
    shs = toks.select(key, sh.alias("sh"))
    init = F.array(*[F.lit(None).cast("string") for _ in range(MINHASH_K)])
    sig = F.aggregate(
        F.col("sh"),
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(
                *[
                    F.md5(F.concat(F.lit(f"{i}:"), s))
                    for i in range(MINHASH_K)
                ]
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    mh = shs.select(key, sig.alias("hs"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.md5(
                    F.concat(
                        F.element_at(F.col("hs"), a + 1),
                        F.element_at(F.col("hs"), b + 1),
                    )
                ).alias("band_sig"),
            )
            for bi, (a, b) in enumerate(BANDS)
        ]
    )
    return mh.select(key, F.explode(band_structs).alias("b")).select(
        key,
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_sig").alias("band_sig"),
    )


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Lazy (doc_a, doc_b) candidate pairs from a band-row frame — the
    band-signature self-join at the heart of one-shot LSH dedup.
    Returned UNCHECKPOINTED so explain-only consumers stay job-free
    (tools/explain_audit.py budgets exactly this plan); execution-path
    callers localCheckpoint the result before handing it to
    ``verify_pairs_exact``, which consumes it twice."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verify_pairs_exact(
    corpus: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-Jaccard verification of a candidate pair frame
    (doc_a, doc_b) against ``corpus`` (doc_id, text) — candidates ONLY
    ever touch the corpus through one semi-joined scan. Shared by the
    incremental index's admission and the one-shot LSH query so the
    two paths cannot drift.

    ``cand`` must be small and cheap to re-read (callers pass a
    localCheckpoint-ed frame — it is consumed twice here). Shingle
    SETS are built per candidate row in codegen (array_distinct of the
    canonical 3-word shingle transform), checkpointed once, then each
    pair intersects two arrays — no exploded shingle shuffle. Candidate
    COUNT is LSH-output-bounded, but the per-doc shingle-set arrays
    scale with document length, so the x/y join strategy is left to
    AQE — a deliberate, MEASURED choice (r8): at sf0.1 AQE's executed
    plan picks BroadcastHashJoin with the small side as build (verified
    via executedPlan()); forcing F.broadcast on the array-bearing x/y
    sides is ~0.2-0.4 s SLOWER (AQE prefers broadcasting the tiny pair
    frame over collecting shingle arrays — the better build side), and
    hinting the cand side wins nothing outside host noise (interleaved
    min-of-4 A/B, all three variants within ±0.1 s). The r7 bench
    drift on the two minhash entries is AQE's decide-after-exchange-
    write cost — the pinned price of size-safety: a forced broadcast
    here was O(candidate_docs × doc_length) driver pressure at the
    100 TB design point."""
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).unionByName(
        cand.select(F.col("doc_b").alias("doc_id"))
    )
    # no distinct on cand_ids: a semi join ignores right-side dups,
    # and the union of two projections of a checkpointed frame is
    # narrow — a distinct would add a shuffle for nothing
    toks = (
        corpus.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .filter(F.size("t") >= 3)
    )
    t = F.col("t")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(t) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
            F.element_at(t, i + 3),
        ),
    )
    cd = (
        toks.select("doc_id", F.array_distinct(sh).alias("shset"))
        .select("doc_id", "shset", F.size("shset").alias("n"))
        .localCheckpoint()
    )
    x = cd.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shset").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    y = cd.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shset").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    shared = (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_shared"),
        )
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return shared.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def admission_candidates(bands_batch: DataFrame, probe: DataFrame) -> DataFrame:
    """Lazy candidate pairs for one index admission: the batch's band
    rows probe ``probe`` (stored ∪ batch band rows) on (band_id,
    band_sig); pairs are canonicalized (least/greatest) and
    deduplicated. Returned UNCHECKPOINTED — ``add_documents``
    localCheckpoints it (two consumers), while tools/explain_audit.py
    budgets exactly this lazy plan, so a shuffle regression in the
    admission's only corpus-sized join is caught without running an
    admission."""
    a = bands_batch.alias("a")
    b = probe.alias("b")
    return (
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
        # bands_batch is read three times (probe a-side, probe b-side
        # via the union, store append) — cache it. The NARROW per-row
        # formulation (band_rows_narrow) computes signatures with zero
        # shuffles, so an admission's only corpus-sized shuffle is the
        # probe join below — the r4 explode/distinct/groupBy path cost
        # two extra shuffles of the full shingle set per batch, and the
        # whole admission ran 28 Spark jobs / ~2x this version's wall
        # (sf0.1 A/B: 6.4s -> 3.3s for the two-batch bench query).
        bands_batch = band_rows_narrow(batch).cache()

        stored = self.wh.read_or_none(self.layer, self.name)
        if stored is not None:
            probe = bands_batch.unionByName(stored)
        else:
            probe = bands_batch
        # candidates where at least one side is from the new batch:
        # batch rows probe the union (old + new), old-old pairs are
        # already known from previous calls. localCheckpoint: the pair
        # frame is tiny (LSH-bounded) and has TWO consumers (candidate
        # ids, verification join) — lazy it would run the probe join
        # twice; checkpointed it also gives the planner exact (small)
        # size stats for the joins below.
        cand = admission_candidates(bands_batch, probe).localCheckpoint()

        # exact verification touches candidate documents ONLY — the
        # shared array-intersect verifier (the r5 exploded x/y shingle
        # formulation ran 17 Spark jobs for this phase; verify_pairs_
        # exact runs ~4). No orderBy before the checkpoint: a global
        # sort costs a range-boundary sampling job per admission, and
        # every caller that needs order sorts the (tiny) pair output.
        result = verify_pairs_exact(corpus, cand, self.threshold).localCheckpoint()

        self.wh.append(bands_batch, self.layer, self.name)
        bands_batch.unpersist()
        return result
