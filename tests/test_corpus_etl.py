"""Corpus ETL: conservation, dedup invariants, split partitioning,
and agreement with the oracle-checked split-assignment query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.etl.corpus_pipeline import run_corpus_etl
from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def corpus_wh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_wh"))
    timings = run_corpus_etl(spark, SF_SMOKE, root)
    return Warehouse(spark, root), timings


def test_stages_ran_and_logged(spark, corpus_wh):
    wh, timings = corpus_wh
    assert set(timings) == {"staging", "curated", "ingest_stats", "split_stats"}
    logged = {r["procedure_name"] for r in wh.read_log().collect()}
    assert "corpus_curated" in logged and "run_corpus_etl" in logged


def test_curated_invariants(spark, corpus_wh):
    wh, _ = corpus_wh
    raw = wh.read("staging", "documents_raw")
    cur = wh.read("bl_cl", "documents_curated")
    # dedup: fingerprints unique; no doc invented; quality bar enforced
    assert cur.count() == cur.select("norm_fp").distinct().count()
    assert cur.count() <= raw.count()
    assert cur.filter(F.col("n_tokens") < 5).count() == 0
    # split is directory-partitioned (prunable) and complete
    assert set(wh.partitions("bl_cl", "documents_curated", "split")) <= {
        "train",
        "val",
        "test",
    }
    assert cur.filter(F.col("split").isNull()).count() == 0


def test_split_stats_match_oracle_query(spark, corpus_wh):
    wh, _ = corpus_wh
    # the mart must agree with the oracle-checked corpus_split_assignment
    # on every (split, lang) the curated subset retains: curation only
    # REMOVES docs, so each mart group must be <= the full-corpus group
    mart = {
        (r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
        for r in wh.read("bl_cl", "corpus_split_stats").collect()
    }
    full = {
        (r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
        for r in QUERIES["corpus_split_assignment"].fn(spark, SF_SMOKE).collect()
    }
    assert set(mart) <= set(full)
    for key, (n_docs, n_tokens) in mart.items():
        assert n_docs <= full[key][0]
        assert n_tokens <= full[key][1]


def test_idempotent_rerun(spark, corpus_wh, tmp_path_factory):
    wh, _ = corpus_wh
    before = wh.read("bl_cl", "documents_curated").count()
    run_corpus_etl(spark, SF_SMOKE, str(wh.root))
    after = wh.read("bl_cl", "documents_curated").count()
    assert before == after
