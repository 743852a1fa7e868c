"""Duplicate-cluster resolution: connected components over the near-dup
pair graph (the step after pairwise dedup — minhash/jaccard emit PAIRS,
but a pipeline needs per-document cluster labels to pick one canonical
representative per group).

Spark has no recursive SQL, so components are computed with iterative
min-label propagation — the standard distributed CC algorithm (each node
repeatedly adopts the smallest label among itself and its neighbors
until fixpoint; iterations ≤ graph diameter, and near-dup clusters are
shallow). Every iteration is one join + one aggregate, both partitioned
on the node key; nothing global, nothing driver-side except the
converged? counter. The DuckDB oracle states the same result as a
recursive-CTE transitive closure — intentionally different formulations,
identical clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.plans.queries import register
from data_warehouse_project_spark.plans.text import _SHINGLES_SQL, _shingles

_MAX_CC_ITERS = 20


def connected_components(edges: DataFrame, max_iters: int = _MAX_CC_ITERS) -> DataFrame:
    """(node, component) labels for an undirected edge list
    (``src``/``dst`` columns); component = smallest node id reachable.

    Min-label propagation: O(diameter) rounds of
    label[n] = min(label[n], min over neighbors m of label[m]).
    Each round shuffles only (node, label) pairs hashed on node — the
    same partitioning every round, so at scale the labels frame stays
    co-located and only the first join re-shuffles the edges.
    """
    sym = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        neighbor = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # truncate the per-iteration lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    overlap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM doc_shingles a JOIN doc_shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT o.doc_a, o.doc_b
      FROM overlap o
        JOIN sizes sa ON sa.doc_id = o.doc_a
        JOIN sizes sb ON sb.doc_id = o.doc_b
      WHERE CAST(o.n_shared AS DOUBLE) / (sa.n + sb.n - o.n_shared) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    closure AS (
      SELECT src, dst FROM reach
      UNION SELECT DISTINCT src, src FROM edges
    ),
    labels AS (
      SELECT src AS doc_id, MIN(dst) AS component FROM closure GROUP BY src
    )
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
    FROM labels
    GROUP BY component
    ORDER BY component
    """,
    doc="Near-dup cluster resolution: exact-Jaccard (>= 0.5 on 3-word "
    "shingles) pair graph → connected components → one row per cluster "
    "with its canonical representative (min doc_id), size, and sorted "
    "member list. Spark side is iterative min-label propagation "
    "(distributed, O(diameter) rounds); the oracle is a recursive-CTE "
    "transitive closure — different algorithms, hash-identical output.",
    tags=("text", "dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = _shingles(spark, sf_dir).cache()
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = ds.alias("a"), ds.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_shared")
    )
    pairs = (
        overlap.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .orderBy("component")
    )
