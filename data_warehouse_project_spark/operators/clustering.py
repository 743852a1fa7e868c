"""Iterative spherical k-means over embedding columns.

The per-iteration dataflow is the oracle-checked ``kmeans_update_step``
query (plans/vectors.py): broadcast the k centroids against the corpus,
assign each vector by cosine (6-decimal round + centroid-id tie-break,
so assignment is deterministic), recompute each centroid as the exact
per-dimension member mean, then L2-normalize (spherical k-means — the
normalization is what makes the cosine objective non-decreasing).

Model-state pattern: centroids are k×d doubles — driver-side state,
exactly like MLlib's implementation. Each iteration collects only the
k×d centroid matrix (tiny), and re-enters it as a literal frame, so
the lineage never grows with iteration count and nothing needs
checkpointing. The corpus is scanned once per iteration with no
shuffle for assignment (centroids broadcast); the (cell, dim)
aggregation tree is the only exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.functions.vectors import cos6, cosine
from data_warehouse_project_spark.localframe import local_rows


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, e) × (cent_id, ce) → (vec_id, e, cent_id, sim): each
    vector's best centroid, deterministic tie-break."""
    sim = cos6(F.col("e"), F.col("ce"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cent_id")
    return (
        vecs.join(F.broadcast(cents))
        .withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", "cent_id", "sim")
    )


def kmeans_fit(
    spark: SparkSession,
    vecs: DataFrame,
    k: int = 16,
    iters: int = 5,
) -> tuple[DataFrame, list[float]]:
    """Fit spherical k-means; ``vecs`` must have (vec_id, e: array<double>).

    Returns (centroids DataFrame (cent_id, ce), per-iteration objective
    values — mean best-cosine, non-decreasing for spherical updates).
    Seeding is deterministic: the k lowest-id vectors.
    """
    cents = vecs.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
    )
    objectives: list[float] = []
    for _ in range(iters):
        assigned = _assign(vecs, cents)
        # exact per-dimension member means (integer-micro sums), then
        # spherical normalization of each new centroid
        exploded = assigned.select(
            "cent_id", F.posexplode("e").alias("dim", "val")
        ).select(
            "cent_id",
            "dim",
            F.round(F.col("val") * 1000000).cast("bigint").alias("micro"),
        )
        coords = (
            exploded.groupBy("cent_id", "dim")
            .agg(
                (F.sum("micro").cast("double") / (F.count(F.lit(1)) * 1e6)).alias(
                    "coord"
                )
            )
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "coord"))),
                    lambda s: s.coord,
                ).alias("ce")
            )
        )
        # objective BEFORE the update, then pull the tiny model state
        obj = assigned.agg(F.avg("sim").alias("o")).collect()[0]["o"]
        objectives.append(float(obj))
        rows = coords.collect()  # k rows of k×d model state — driver-side

        def norm(v: list[float]) -> list[float]:
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v] if n > 0 else v

        # a centroid that won no assignments produces no coords rows;
        # keep its previous position instead of silently shrinking the
        # model below k (standard empty-cluster handling)
        prev = {
            r["cent_id"]: list(r["ce"]) for r in cents.collect()
        }
        updated = {r["cent_id"]: norm(list(r["ce"])) for r in rows}
        model = [(cid, updated.get(cid, prev[cid])) for cid in sorted(prev)]
        cents = local_rows(
            spark, model, "cent_id bigint, ce array<double>"
        )
    return cents, objectives
