"""Incremental MinHash/LSH index (operators/dedup_index.py): admitting
a corpus in batches must find exactly the near-dup pairs a one-shot
pass over the union finds — nothing lost at the batch boundary, nothing
invented — while only ever computing signatures for the new batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.operators.dedup_index import (
    BANDS,
    MinHashIndex,
    band_rows,
    shingles_of,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def corpus(spark):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # inject a guaranteed near-dup of doc 0 so the pair set is non-empty
    dup = docs.filter("doc_id = 0").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return docs.unionByName(dup).localCheckpoint()


def _pairs(df):
    return sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in df.collect()
    )


def test_incremental_equals_one_shot(spark, corpus, tmp_path):
    b1 = corpus.filter("doc_id % 2 = 0")
    b2 = corpus.filter("doc_id % 2 = 1")

    inc = MinHashIndex(Warehouse(spark, str(tmp_path / "inc")))
    got = _pairs(inc.add_documents(b1, corpus)) + _pairs(
        inc.add_documents(b2, corpus)
    )

    full = MinHashIndex(Warehouse(spark, str(tmp_path / "full")))
    want = _pairs(full.add_documents(corpus, corpus))

    assert sorted(got) == want
    # the injected duplicate must be found, and across the batch
    # boundary (doc 0 is even, 1_000_000 is even — same batch; make
    # sure at least the pair exists in both modes)
    assert any(a == 0 and b == 1_000_000 for a, b, _ in want)


def test_cross_batch_pair_found(spark, corpus, tmp_path):
    """The duplicate arrives in a LATER batch than its original — the
    probe against the stored band table must surface it."""
    original = corpus.filter("doc_id < 1000000")
    later_dup = corpus.filter("doc_id >= 1000000")

    idx = MinHashIndex(Warehouse(spark, str(tmp_path)))
    p1 = idx.add_documents(original, corpus)
    assert not any(b >= 1_000_000 for _, b, _ in _pairs(p1))
    p2 = idx.add_documents(later_dup, corpus)
    assert any(a == 0 and b == 1_000_000 for a, b, _ in _pairs(p2))


def test_store_grows_by_batch_bands_only(spark, corpus, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    idx = MinHashIndex(wh)
    b1 = corpus.filter("doc_id % 2 = 0")
    idx.add_documents(b1, corpus)
    n1 = wh.read("bl_cl", "minhash_bands").count()
    assert n1 == len(BANDS) * shingles_of(b1).select("doc_id").distinct().count()
    b2 = corpus.filter("doc_id % 2 = 1")
    idx.add_documents(b2, corpus)
    n2 = wh.read("bl_cl", "minhash_bands").count()
    assert n2 == n1 + len(BANDS) * shingles_of(b2).select("doc_id").distinct().count()


def test_band_rows_shape(spark, corpus):
    bands = band_rows(shingles_of(corpus.limit(10)))
    assert set(bands.columns) == {"doc_id", "band_id", "band_sig"}
    per_doc = bands.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [len(BANDS)]


def test_band_rows_narrow_equals_explode_groupby(spark, corpus):
    """The zero-shuffle per-row signature path (band_rows_narrow) must
    produce EXACTLY the band rows of the canonical explode/distinct/
    groupBy formulation — MIN is duplicate-insensitive and least() over
    md5 hex is the same binary ordering, so any divergence is a bug."""
    from data_warehouse_project_spark.operators.dedup_index import (
        band_rows_narrow,
    )

    want = sorted(
        map(tuple, band_rows(shingles_of(corpus)).collect())
    )
    got = sorted(map(tuple, band_rows_narrow(corpus).collect()))
    assert got == want
    # and the narrow plan really is narrow: no exchange anywhere.
    # Public explain output (not _jdf JVM internals — stable across
    # pyspark versions and available under Spark Connect).
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        band_rows_narrow(corpus).explain(mode="formatted")
    assert "Exchange" not in buf.getvalue()
