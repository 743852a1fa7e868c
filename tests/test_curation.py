"""Curation tranche (plans/curation.py): SemDeDup cluster-pruned
semantic dedup, token-budget selection, and the Python-UDTF trigram
surface. Oracle equality is covered by test_queries_oracle; these pin
the operator-level semantics the oracle can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def test_semdedup_prunes_brute_force_pairs(spark):
    """Every SemDeDup drop must be witnessed by a same-cluster
    brute-force pair above the threshold, and every same-cluster
    brute-force pair must drop its larger id — i.e. the cluster
    pruning loses exactly the cross-cluster pairs, nothing else."""
    from data_warehouse_project_spark.functions.vectors import as_double, cosine
    from data_warehouse_project_spark.plans.curation import _SEM_THRESHOLD

    sem = QUERIES["dedup_semantic_clusters"].fn(spark, SF_SMOKE)
    rows = sem.collect()
    assert len(rows) == 500
    dropped = {r["vec_id"] for r in rows if r["keep"] == 0}
    cluster = {r["vec_id"]: r["cent_id"] for r in rows}
    assert dropped, "threshold should exercise the drop branch"

    vecs = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", as_double(F.col("embedding")).alias("e"))
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") > F.col("b.vec_id"))
        .filter(
            F.round(cosine(F.col("a.e"), F.col("b.e")), 6) >= F.lit(_SEM_THRESHOLD)
        )
        .select(
            F.col("a.vec_id").alias("hi"), F.col("b.vec_id").alias("lo")
        )
        .collect()
    )
    same_cluster_his = {
        p["hi"] for p in pairs if cluster[p["hi"]] == cluster[p["lo"]]
    }
    assert dropped == same_cluster_his


def test_token_budget_never_exceeded_and_greedy(spark):
    df = QUERIES["token_budget_pack_by_source"].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    from data_warehouse_project_spark.plans.curation import _PACK_BUDGET

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .collect()
    )
    all_by_source: dict[str, list] = {}
    for d in docs:
        all_by_source.setdefault(d["source"], []).append(d)
    for src, sel in by_source.items():
        assert sel[-1]["cum_tokens"] <= _PACK_BUDGET
        # greedy longest-first: the selection is exactly the maximal
        # prefix of the (tokens DESC, doc_id) order within budget
        ranked = sorted(
            all_by_source[src], key=lambda d: (-d["n_tokens"], d["doc_id"])
        )
        cum, want = 0, []
        for d in ranked:
            cum += d["n_tokens"]
            if cum > _PACK_BUDGET:
                break
            want.append(d["doc_id"])
        assert [r["doc_id"] for r in sel] == want


def test_udtf_matches_builtin_explode(spark):
    """The Python UDTF path must agree with the pure-codegen trigram
    pipeline (the production path it demonstrates an alternative to)."""
    udtf_rows = QUERIES["udtf_trigram_topk"].fn(spark, SF_SMOKE).collect()
    assert len(udtf_rows) == 10
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = F.split("text", " ")
    tg = (
        d.select(
            "doc_id",
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 3), "
                "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
            ).alias("tgs"),
        )
        .filter(F.size(toks) >= 3)
        .select("doc_id", F.explode("tgs").alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(10)
        .collect()
    )
    assert [tuple(r) for r in udtf_rows] == [tuple(r) for r in tg]
