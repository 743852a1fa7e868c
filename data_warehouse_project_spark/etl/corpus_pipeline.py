"""Corpus ETL: raw documents → curated training corpus + audit marts.

The batch formulation of the streaming ingest (streaming/corpus.py),
run with the same warehouse machinery as the retail pipeline (atomic
overwrite swaps, structured run log, row accounting — O1-O4 parity):

  staging.documents_raw     verbatim snapshot of the source table
  bl_cl.documents_curated   normalized + quality-filtered + deduped,
                            split-assigned, PARTITIONED BY (split) so
                            train/val/test reads prune at the
                            directory level
  bl_cl.corpus_ingest_stats per-source docs/quality/token counters
  bl_cl.corpus_split_stats  per-(split, lang) docs/token counters

At 100 TB: every stage is a scan-stage expression (normalize,
fingerprint, hash-split) plus one exact-dedup exchange on the 32-byte
fingerprint; the curated write redistributes by split only. No
collect, no global window, no Python in the hot path.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.plans.corpus import (
    _hash_unit_spark,
)
from data_warehouse_project_spark.streaming.corpus import (
    curated_documents,
    source_ingest_stats,
)


def split_assignment(col) -> F.Column:
    """md5-mod-100 90/5/5 split — identical to the oracle-checked
    corpus_split_assignment query."""
    bucket = _hash_unit_spark(col) % 100
    return (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )


def run_corpus_etl(
    spark: SparkSession, src_dir: str, warehouse_root: str
) -> dict[str, float]:
    """Execute the corpus pipeline; returns stage -> seconds."""
    wh = Warehouse(spark, warehouse_root)
    timings: dict[str, float] = {}

    def stage(name: str, fn) -> None:
        # O2 parity with run_full_etl's _run_stage: trap, log the
        # failure, flush the buffered log, re-raise — a mid-pipeline
        # crash must not discard the run's log rows or leave no record
        # of which stage failed
        t0 = time.perf_counter()
        try:
            n = fn()
        except Exception as e:  # noqa: BLE001
            timings[name] = round(time.perf_counter() - t0, 3)
            wh.log(f"corpus_{name}", "stage FAILED", 0, error=str(e)[:500])
            wh.flush_log()
            raise
        timings[name] = round(time.perf_counter() - t0, 3)
        wh.log(f"corpus_{name}", "stage complete", n)

    raw = spark.read.parquet(f"{src_dir}/documents.parquet")

    def load_staging() -> int:
        return wh.overwrite(raw, "staging", "documents_raw")

    def load_curated() -> int:
        curated = curated_documents(wh.read("staging", "documents_raw"))
        out = curated.withColumn("split", split_assignment(F.col("doc_id")))
        return wh.overwrite(out, "bl_cl", "documents_curated", ["split"])

    def load_ingest_stats() -> int:
        stats = source_ingest_stats(wh.read("staging", "documents_raw"))
        return wh.overwrite(stats.orderBy("source"), "bl_cl", "corpus_ingest_stats")

    def load_split_stats() -> int:
        cur = wh.read("bl_cl", "documents_curated")
        stats = (
            cur.groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            .orderBy("split", "lang")
        )
        return wh.overwrite(stats, "bl_cl", "corpus_split_stats")

    stage("staging", load_staging)
    stage("curated", load_curated)
    stage("ingest_stats", load_ingest_stats)
    stage("split_stats", load_split_stats)
    wh.log("run_corpus_etl", "pipeline complete", 0)
    wh.flush_log()
    return timings


def curated_counts(wh: Warehouse) -> DataFrame:
    """Quick conservation check frame: curated docs per split."""
    return (
        wh.read("bl_cl", "documents_curated")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )
