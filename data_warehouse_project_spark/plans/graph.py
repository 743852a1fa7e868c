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

from data_warehouse_project_spark.catalog import table
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
    # materialize the (possibly expensive) edge pipeline ONCE — every
    # iteration joins against sym, and without this each round would
    # re-execute the full upstream plan (for dedup_clusters: the whole
    # shingle self-join + Jaccard verification, per round)
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .localCheckpoint()
    )
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
    else:
        # returning the partial labels would silently split true
        # clusters (and diverge from the transitive-closure oracle)
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations — a component's diameter exceeds the cap; raise "
            "max_iters (rounds needed = graph diameter)"
        )
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
    # building this plan RUNS jobs (per-iteration localCheckpoint +
    # convergence count) — plan-only tooling must skip it
    eager=True,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.plans.text import jaccard_pairs

    ds = _shingles(spark, sf_dir).cache()
    pairs = jaccard_pairs(ds, 0.5).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
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


@register(
    "pagerank_update_step",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    n AS (
      SELECT (SELECT COUNT(DISTINCT src) FROM edges)
           + (SELECT COUNT(DISTINCT dst) FROM edges) AS n_nodes
    ),
    outdeg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ),
    contrib AS (
      SELECT e.dst,
             COUNT(*) AS in_deg,
             SUM((1000000000 // n.n_nodes) // o.outdeg) AS sum_contrib_ppb
      FROM edges e JOIN outdeg o ON e.src = o.src, n
      GROUP BY e.dst
    )
    SELECT c.dst AS suppkey,
           CAST(c.in_deg AS BIGINT) AS in_deg,
           CAST(c.sum_contrib_ppb AS BIGINT) AS sum_contrib_ppb,
           CAST((150 * (1000000000 // n.n_nodes)) // 1000
              + (850 * c.sum_contrib_ppb) // 1000 AS BIGINT) AS new_rank_ppb
    FROM contrib c, n
    ORDER BY new_rank_ppb DESC, suppkey
    """,
    doc="One PageRank power-iteration step (damping 0.85) over the "
    "customer→supplier purchase graph — the building block of "
    "link-analysis quality scoring for web-crawl corpora (rank sources "
    "by who links to them). Ranks are integer parts-per-billion: the "
    "uniform start 1e9 div N, per-edge contribution rank div outdeg, "
    "and the damped update (150·base + 850·Σcontrib) div 1000 are all "
    "exact integer arithmetic, so the distributed sum is "
    "order-insensitive and both engines agree bit-for-bit (floating "
    "PageRank would drift per partitioning). Plan: the distinct edge "
    "list shuffles once on (src,dst); outdeg is a partial agg on src "
    "joined back on the same key (co-located); the contribution sum "
    "partial-aggs on dst; N is a 1-row broadcast cross. Iterating = "
    "re-running this step with the previous ranks joined in place of "
    "the uniform base, localCheckpoint per round like "
    "connected_components.",
    tags=("graph", "corpus"),
)
def pagerank_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey").alias("src")
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("src", "dst")
        .distinct()
    )
    n_src = edges.agg(F.countDistinct("src").alias("ns"))
    n_dst = edges.agg(F.countDistinct("dst").alias("nd"))
    n = n_src.join(F.broadcast(n_dst)).select(
        (F.col("ns") + F.col("nd")).alias("n_nodes")
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib = (
        edges.join(outdeg, "src")
        .join(F.broadcast(n))
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("in_deg"),
            F.sum(F.expr("(1000000000 div n_nodes) div outdeg")).alias(
                "sum_contrib_ppb"
            ),
        )
    )
    return (
        contrib.join(F.broadcast(n))
        .select(
            F.col("dst").alias("suppkey"),
            F.col("in_deg").cast("bigint").alias("in_deg"),
            F.col("sum_contrib_ppb").cast("bigint").alias("sum_contrib_ppb"),
            F.expr(
                "(150 * (1000000000 div n_nodes)) div 1000"
                " + (850 * sum_contrib_ppb) div 1000"
            ).cast("bigint").alias("new_rank_ppb"),
        )
        .orderBy(F.desc("new_rank_ppb"), "suppkey")
    )


def pagerank(edges: DataFrame, n_iters: int = 5) -> DataFrame:
    """Iterative PageRank (damping 0.85) over a directed edge list
    (``src``/``dst`` columns) → (node, rank_ppb).

    The multi-step driver behind the ``pagerank_update_step`` query:
    ranks are integer parts-per-billion (init 1e9 div N, contribution
    rank div outdeg, damped update (150·base + 850·Σ) div 1000), so
    every distributed sum is exact and the fixpoint is bit-identical
    on any partitioning. Dangling nodes (no out-edges) keep their base
    rank and contribute nothing — the no-redistribution variant, fine
    for quality scoring where only relative order matters.

    Each iteration is two co-partitioned joins on ``src`` plus one
    partial agg on ``dst``; ``localCheckpoint`` truncates the lineage
    so plans stay flat (same pattern as :func:`connected_components`).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    base = 1_000_000_000 // n_nodes
    damped_base = (150 * base) // 1000
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank_ppb", F.lit(base).cast("bigint"))
    for _ in range(n_iters):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("rank_ppb div outdeg")).alias("in_ppb"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"{damped_base}"
                    " + (850 * coalesce(in_ppb, CAST(0 AS BIGINT))) div 1000"
                ).cast("bigint").alias("rank_ppb"),
            )
            .localCheckpoint()
        )
    return ranks


@register(
    "copurchase_triangles",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT a.p AS pa, b.p AS pb
      FROM items a JOIN items b ON a.k = b.k AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT p, COUNT(*) AS d FROM (
        SELECT pa AS p FROM e UNION ALL SELECT pb AS p FROM e
      ) GROUP BY p
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT MAX(d) FROM deg) AS max_degree,
           (SELECT COUNT(*)
            FROM e ab JOIN e bc ON ab.pb = bc.pa
                      JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb) AS n_triangles
    """,
    doc="Triangle census of the part co-purchase graph (edge = two parts "
    "bought together in >= 2 orders): node/edge/degree stats plus the "
    "exact triangle count via the oriented wedge-closing join — each "
    "edge stored once as (lo, hi), wedges a<b<c closed by an (a,c) "
    "edge probe, so every triangle counts exactly once and no "
    "direction blow-up. Community density in the product graph; the "
    "same census over the doc near-dup graph grades cluster quality. "
    "Plan: pair-generation co-partitioned on orderkey, then two "
    "equi-joins on node keys; at scale, orient edges by "
    "degree (low->high) so wedge fan-out is bounded by arboricity, "
    "and the heaviest hubs salt.",
    tags=("graph",),
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    e = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
        .cache()
    )
    deg = (
        e.select(F.col("pa").alias("p"))
        .unionAll(e.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.pb") == F.col("bc.pa"))
        .join(
            ac,
            (F.col("ac.pa") == F.col("ab.pa")) & (F.col("ac.pb") == F.col("bc.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        stats.join(F.broadcast(n_edges))
        .join(F.broadcast(tri))
        .select("n_nodes", "n_edges", "max_degree", "n_triangles")
    )
