"""VectorLSHIndex invariants: admission-order invariance, equality
with the one-shot LSH query, and read-your-writes probing — the
``bands=`` fast path (probing the frames returned by
``add_vectors(return_frame=True)``) must return bit-for-bit what a
store re-read returns, or the fused bench query silently drifts from
the path real consumers use."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.operators.similarity import (
    VectorLSHIndex,
    lsh_ann_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return table(spark, SF_DIR, "embeddings")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _with_index(spark):
    tmp = tempfile.mkdtemp(prefix="annidx_test_")
    return VectorLSHIndex(Warehouse(spark, tmp)), tmp


def test_incremental_equals_one_shot_any_split(spark, emb):
    want = _rows(lsh_ann_topk(emb, query_ids_below=3, top_k=4))
    for splits in (
        ("vec_id % 2 = 0", "vec_id % 2 = 1"),
        ("vec_id % 3 != 1", "vec_id % 3 = 1"),
    ):
        idx, tmp = _with_index(spark)
        try:
            for pred in splits:
                idx.add_vectors(emb.filter(pred))
            got = _rows(idx.topk(emb, query_ids_below=3, top_k=4))
            assert got == want, f"split {splits} diverged from one-shot"
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def test_admission_order_invariant(spark, emb):
    a, tmp_a = _with_index(spark)
    b, tmp_b = _with_index(spark)
    try:
        a.add_vectors(emb.filter("vec_id % 2 = 0"))
        a.add_vectors(emb.filter("vec_id % 2 = 1"))
        b.add_vectors(emb.filter("vec_id % 2 = 1"))
        b.add_vectors(emb.filter("vec_id % 2 = 0"))
        assert _rows(a.topk(emb, query_ids_below=3, top_k=4)) == _rows(
            b.topk(emb, query_ids_below=3, top_k=4)
        )
    finally:
        shutil.rmtree(tmp_a, ignore_errors=True)
        shutil.rmtree(tmp_b, ignore_errors=True)


def test_return_frame_probe_equals_store_read(spark, emb):
    """The fused path (probe the returned band frames) and the durable
    path (probe the store parquet) must agree — and the returned frames
    must be exactly what landed in the store."""
    idx, tmp = _with_index(spark)
    try:
        b1 = idx.add_vectors(emb.filter("vec_id % 2 = 0"), return_frame=True)
        b2 = idx.add_vectors(emb.filter("vec_id % 2 = 1"), return_frame=True)
        fused = _rows(idx.topk(emb, query_ids_below=3, top_k=4, bands=b1.unionByName(b2)))
        durable = _rows(idx.topk(emb, query_ids_below=3, top_k=4))
        assert fused == durable
        stored = sorted(_rows(idx.wh.read(idx.layer, idx.name)))
        returned = sorted(_rows(b1.unionByName(b2)))
        assert stored == returned
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_probe_with_unadmitted_query_vectors(spark, emb):
    """Query vectors that were NEVER admitted to the index must still
    probe the store (band rows derived from the corpus, not filtered
    out of the stored frame) — the r7 from-store derivation silently
    returned zero candidates here."""
    idx, tmp = _with_index(spark)
    try:
        idx.add_vectors(emb.filter("vec_id >= 3"))  # queries 0-2 absent
        got = _rows(idx.topk(emb, query_ids_below=3, top_k=4))
        assert len(got) > 0, "unadmitted queries probed nothing"
        # equal to the one-shot run on the same (store ∪ query) universe
        # restricted to stored neighbors: every neighbor must be ≥ 3
        assert all(r[2] >= 3 for r in got)
        # and each query that has any banded bucket overlap appears
        qs = {r[0] for r in got}
        assert qs <= {0, 1, 2} and qs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
