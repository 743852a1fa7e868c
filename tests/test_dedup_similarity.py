"""Quality checks for the approximate operators: LSH-ANN recall vs the
brute-force baseline, SimHash agreement with exact Jaccard near-dups."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_lsh_ann_recall_vs_brute_force(spark):
    brute = QUERIES["ann_cosine_topk"].fn(spark, SF_SMOKE)
    lsh = QUERIES["ann_lsh_topk"].fn(spark, SF_SMOKE)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
    assert truth, "brute force returned nothing"
    recall = len(truth & got) / len(truth)
    # banded random-hyperplane LSH on 64-d data: recall is approximate by
    # design but must clearly beat chance (500 vectors, top-5)
    assert recall >= 0.4, f"LSH recall {recall:.2f} too low"
    # every LSH hit must carry the exact cosine of the brute-force run
    b_sims = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute.collect()
    }
    for r in lsh.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in b_sims:
            assert r["cos_sim"] == b_sims[key]


def test_simhash_detects_exact_jaccard_near_dups(spark):
    jac = QUERIES["dedup_ngram_jaccard"].fn(spark, SF_SMOKE)
    strong = _pairs(jac.filter(F.col("jaccard") >= 0.95))
    sim = _pairs(QUERIES["dedup_simhash"].fn(spark, SF_SMOKE))
    assert strong, "fixture should contain >=0.95-jaccard near-dup pairs"
    found = len(strong & sim) / len(strong)
    assert found >= 0.8, f"simhash found only {found:.0%} of strong near-dups"


def test_minhash_equals_exact_jaccard_above_threshold(spark):
    exact = QUERIES["dedup_ngram_jaccard"].fn(spark, SF_SMOKE)
    mh = QUERIES["dedup_minhash_lsh"].fn(spark, SF_SMOKE)
    exact_pairs = _pairs(exact)
    mh_pairs = _pairs(mh)
    # minhash-verified pairs are a subset of the exact >=0.5 pairs, and
    # with 4 bands x 2 rows virtually all 0.9+ pairs are caught
    assert mh_pairs <= exact_pairs
    strong = _pairs(exact.filter(F.col("jaccard") >= 0.9))
    if strong:
        assert len(strong & mh_pairs) / len(strong) >= 0.9


def test_ivf_ann_recall_vs_brute_force(spark):
    brute = QUERIES["ann_cosine_topk"].fn(spark, SF_SMOKE)
    ivf = QUERIES["ann_ivf_topk"].fn(spark, SF_SMOKE)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    # 4 of 16 cells probed: recall is bounded but must clearly beat chance
    assert recall >= 0.4, f"IVF recall {recall:.2f} too low"


def test_simhash_signature_implementations_agree(spark):
    """The per-row array-fold signature (simhash_signature) and the
    columnar conditional-sum path used by simhash_near_dup_pairs must
    produce identical bits for the same feature sets."""
    from data_warehouse_project_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_signature,
        token_hash,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"), (3, "x")],
        "doc_id int, text string",
    )
    fold = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", simhash_signature(F.split("text", " ")).alias("sig")
        ).collect()
    }
    feats = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("feature")
    ).select("doc_id", token_hash(F.col("feature")).alias("h"))
    votes = feats.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    columnar = {
        r["doc_id"]: r["sig"]
        for r in votes.select(
            "doc_id",
            F.concat(
                *[
                    F.when(F.col(f"b{i}") > 0, "1").otherwise("0")
                    for i in range(SIMHASH_BITS)
                ]
            ).alias("sig"),
        ).collect()
    }
    assert fold == columnar
