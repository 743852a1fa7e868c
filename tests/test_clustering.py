"""Iterative spherical k-means: deterministic seeding, improving
objective, stable model shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.functions.vectors import as_double
from data_warehouse_project_spark.operators.clustering import kmeans_fit
from tests.conftest import SF_SMOKE


def _vecs(spark):
    return table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )


def test_kmeans_objective_improves(spark):
    cents, objectives = kmeans_fit(spark, _vecs(spark), k=8, iters=4)
    assert len(objectives) == 4
    # spherical updates: mean best-cosine must not decrease
    for a, b in zip(objectives, objectives[1:]):
        assert b >= a - 1e-9, objectives
    # and training must actually move the needle from the naive seed
    assert objectives[-1] > objectives[0]


def test_kmeans_model_shape_and_determinism(spark):
    vecs = _vecs(spark)
    c1, o1 = kmeans_fit(spark, vecs, k=8, iters=2)
    c2, o2 = kmeans_fit(spark, vecs, k=8, iters=2)
    assert o1 == o2  # bit-identical objectives on identical input
    rows1 = {r["cent_id"]: r["ce"] for r in c1.collect()}
    rows2 = {r["cent_id"]: r["ce"] for r in c2.collect()}
    assert rows1.keys() == rows2.keys() and len(rows1) == 8
    dim = len(next(iter(rows1.values())))
    assert all(len(v) == dim for v in rows1.values())
    assert rows1 == rows2


def test_kmeans_keeps_empty_clusters(spark):
    """A centroid that wins no assignments keeps its previous position
    instead of silently shrinking the model below k."""
    # 6 vectors in 2 tight groups; k=4 seeds include duplicates, whose
    # members all tie-break to the lower cent_id → 2 centroids go empty
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
        (3, [0.0, 1.0]), (4, [1.0, 0.0]), (5, [0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id bigint, e array<double>")
    cents, objs = kmeans_fit(spark, vecs, k=4, iters=3)
    assert cents.count() == 4  # model never shrinks
    assert len(objs) == 3
