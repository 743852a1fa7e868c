"""Vector / embedding queries over ``embeddings`` (array<float>, 64-d):
brute-force cosine top-k (the ANN baseline) and norm profiling.

Cross-engine determinism: both engines compute the *same sequential
left-fold* over the array (Spark ``aggregate`` ≡ DuckDB ``list_reduce``)
on float→double-cast elements, so dot products are bit-identical; the
cosine is still rounded to 6 decimals as a belt-and-braces margin before
ranking, with vec_id tie-breaks.

The scale path (LSH-bucketed ANN, random-hyperplane signatures) lives in
operators/similarity.py; brute-force here is the exactness oracle for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import register

from data_warehouse_project_spark.functions.vectors import (
    DOT_SQL as _DOT_SQL,
    as_double,
    cos6,
    cos6_sql as _cos6_sql,
    cos_sql as _cos_sql,
    cosine,
    round6,
    round6_sql as _round6_sql,
    sq_norm,
)

N_QUERY_VECS = 5
TOP_K = 5


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    qs AS (SELECT vec_id AS q_id, e AS qe FROM vecs WHERE vec_id < {N_QUERY_VECS}),
    sims AS (
      SELECT q.q_id, v.vec_id, v.label,
             {_cos6_sql('q.qe', 'v.e')} AS cos_sim
      FROM qs q JOIN vecs v ON v.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos_sim DESC, vec_id
             ) AS rank
      FROM sims
    )
    SELECT q_id AS query_id, CAST(rank AS INT) AS rank,
           vec_id AS neighbor_id, label AS neighbor_label, cos_sim
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
    bench=True,
    doc="Brute-force cosine top-k ANN baseline: broadcast the query "
    "vectors against the corpus (no shuffle of the big side), per-row "
    "fold dot products inside codegen, then a per-query top-k window on "
    "the small similarity frame. At 100 TB the corpus side streams; "
    "queries stay broadcast. The LSH/IVF variant prunes candidates first.",
    tags=("vectors", "ann"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    )
    qs = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    sims = (
        vecs.join(F.broadcast(qs), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            cos6(F.col("qe"), F.col("e")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            "cos_sim",
        )
        .orderBy("query_id", "rank")
    )


@register(
    "embedding_norm_profile",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id, label,
             {_round6_sql("sqrt(" + _DOT_SQL.format(a="(embedding::DOUBLE[])", b="(embedding::DOUBLE[])") + ")")} AS norm
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           MIN(norm) AS min_norm,
           MAX(norm) AS max_norm,
           MIN(vec_id) AS first_vec_id
    FROM vecs GROUP BY label ORDER BY label
    """,
    doc="Per-label embedding norm profile: per-row deterministic fold, "
    "order-insensitive MIN/MAX aggregates only (no double sums).",
    tags=("vectors",),
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        round6(F.sqrt(sq_norm(as_double(F.col("embedding"))))).alias("norm"),
    )
    return (
        vecs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
            F.min("vec_id").alias("first_vec_id"),
        )
        .orderBy("label")
    )


@register(
    "embedding_quantization_profile",
    oracle="""
    WITH q AS (
      SELECT label,
             len(embedding) AS dims,
             list_transform(embedding::DOUBLE[],
               x -> GREATEST(-127, LEAST(127,
                      CAST(FLOOR(x * 64 + 0.5) AS BIGINT)))) AS qv
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(dims) AS BIGINT) AS total_dims,
           CAST(SUM(list_sum(qv)) AS BIGINT) AS sum_q,
           CAST(SUM(len(list_filter(qv, v -> v = 127 OR v = -127)))
                AS BIGINT) AS n_saturated,
           CAST(SUM(len(list_filter(qv, v -> v = 0))) AS BIGINT) AS n_zero
    FROM q GROUP BY label ORDER BY label
    """,
    doc="int8-style embedding quantization census per label: each "
    "component maps to clamp(floor(x*64 + 0.5), -127, 127) — "
    "floor(x+0.5) instead of round() because Spark rounds HALF_UP while "
    "DuckDB rounds half-away-from-zero, and the floor form is identical "
    "in both engines. All outputs are integer totals (exact in any "
    "aggregation order), so the quantizer a serving pipeline would ship "
    "is verified cross-engine bit-for-bit. Per-row array fold stays in "
    "codegen; only (label, partial sums) shuffle.",
    tags=("vectors", "quantization"),
)
def embedding_quantization_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    qv = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x * 64 + 0.5).cast("bigint")),
        ),
    )
    q = e.select(
        "label",
        F.size("embedding").alias("dims"),
        qv.alias("qv"),
    )
    n_sat = F.size(F.filter(F.col("qv"), lambda v: (v == 127) | (v == -127)))
    n_zero = F.size(F.filter(F.col("qv"), lambda v: v == 0))
    agg_sum = F.aggregate(
        F.col("qv"), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    return (
        q.select(
            "label",
            "dims",
            agg_sum.alias("row_sum"),
            n_sat.alias("row_sat"),
            n_zero.alias("row_zero"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("dims").cast("bigint").alias("total_dims"),
            F.sum("row_sum").cast("bigint").alias("sum_q"),
            F.sum("row_sat").cast("bigint").alias("n_saturated"),
            F.sum("row_zero").cast("bigint").alias("n_zero"),
        )
        .orderBy("label")
    )


def _planes_sql() -> str:
    """The deterministic hyperplanes as a DuckDB nested-list literal."""
    from data_warehouse_project_spark.operators.similarity import HYPERPLANES

    rows = ", ".join("[" + ", ".join(repr(v) for v in row) + "]" for row in HYPERPLANES)
    return f"[{rows}]"


def _register_lsh_ann() -> None:
    from data_warehouse_project_spark.operators.similarity import (
        N_BANDS,
        N_PLANES,
        lsh_ann_topk,
    )

    band_len = N_PLANES // N_BANDS
    oracle = f"""
    WITH planes AS (SELECT {_planes_sql()} AS p),
    vecs AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, label, e,
             array_to_string(list_transform(range(1, {N_PLANES} + 1), k ->
               CASE WHEN list_reduce(
                      list_transform(range(1, {DIM_SQL} + 1), i -> e[i] * p[k][i]),
                      (acc, x) -> acc + x) >= 0
                    THEN '1' ELSE '0' END), '') AS sig
      FROM vecs, planes
    ),
    bands AS (
      {" UNION ALL ".join(f"SELECT vec_id, {i} AS band_id, substr(sig, {i * band_len + 1}, {band_len}) AS band_sig FROM sigs" for i in range(N_BANDS))}
    ),
    qb AS (SELECT vec_id AS q_id, band_id, band_sig FROM bands WHERE vec_id < {N_QUERY_VECS}),
    cand AS (
      SELECT DISTINCT qb.q_id, b.vec_id
      FROM bands b JOIN qb ON b.band_id = qb.band_id AND b.band_sig = qb.band_sig
      WHERE b.vec_id <> qb.q_id
    ),
    qs AS (SELECT vec_id AS q_id, e AS qe FROM vecs WHERE vec_id < {N_QUERY_VECS}),
    sims AS (
      SELECT c.q_id, c.vec_id, v.label,
             {_cos6_sql('q.qe', 'v.e')} AS cos_sim
      FROM cand c
        JOIN vecs v ON v.vec_id = c.vec_id
        JOIN qs q ON q.q_id = c.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos_sim DESC, vec_id
             ) AS rank
      FROM sims
    )
    SELECT q_id AS query_id, CAST(rank AS INT) AS rank,
           vec_id AS neighbor_id, label AS neighbor_label, cos_sim
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """

    def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        return lsh_ann_topk(
            table(spark, sf_dir, "embeddings"),
            query_ids_below=N_QUERY_VECS,
            top_k=TOP_K,
        )

    register(
        "ann_lsh_topk",
        oracle=oracle,
        bench=True,
        doc="LSH-bucketed ANN (random-hyperplane signatures, 4 bands x 4 "
        "bits) with exact-cosine rerank of candidates only — the 100 TB "
        "scale path; the brute-force query is its recall baseline. The "
        "oracle runs the identical deterministic algorithm in DuckDB.",
        tags=("vectors", "ann", "lsh"),
    )(ann_lsh_topk)

    def ann_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        import shutil
        import tempfile

        from data_warehouse_project_spark.etl.warehouse import Warehouse
        from data_warehouse_project_spark.operators.similarity import (
            VectorLSHIndex,
        )

        emb = table(spark, sf_dir, "embeddings")
        # fused admission→probe (the r6 dedup-index treatment): each
        # admission checkpoints its band rows once (return_frame) —
        # the store append reads the checkpoint, and the probe reads
        # the UNION of the returned frames instead of re-reading the
        # just-written parquet, so signatures are computed exactly once
        # per vector and the probe plan touches `embeddings` only for
        # candidate payloads. The result plan is localCheckpoint-ed so
        # it survives the scratch store's cleanup.
        tmp = tempfile.mkdtemp(prefix="annidx_")
        try:
            idx = VectorLSHIndex(Warehouse(spark, tmp))
            b1 = idx.add_vectors(emb.filter("vec_id % 2 = 0"), return_frame=True)
            b2 = idx.add_vectors(emb.filter("vec_id % 2 = 1"), return_frame=True)
            u = b1.unionByName(b2)
            return idx.topk(
                emb,
                query_ids_below=N_QUERY_VECS,
                top_k=TOP_K,
                bands=u,
                # the admission frames already hold the queries' band
                # rows — reuse them instead of re-entering the ~1 s
                # lsh_signature expression (see topk's docstring A/B)
                query_bands=u,
            ).localCheckpoint()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    register(
        "ann_lsh_incremental",
        oracle=oracle,
        eager=True,
        bench=True,
        doc="Incremental ANN admission vs the one-shot oracle: vectors "
        "are fed to operators/similarity.VectorLSHIndex in two batches "
        "(even then odd vec_ids), then the SAME top-k probe runs against "
        "the stored band table. The stored band set is admission-order-"
        "invariant (deterministic hyperplanes), so the result must equal "
        "the one-shot LSH query bit-for-bit — checked by sharing its "
        "DuckDB oracle. This is the growing-corpus shape: signatures for "
        "new vectors only, O(4 rows)/vector of persistent state.",
        tags=("vectors", "ann", "lsh", "incremental"),
    )(ann_lsh_incremental)


# fold length of the oracle's dot products — MUST be the hyperplane
# dimensionality, or the DuckDB signatures silently truncate
from data_warehouse_project_spark.operators.similarity import DIM as DIM_SQL
_register_lsh_ann()


def _register_ivf_ann() -> None:
    """IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    around coarse centroids, search only the query's nearest cells.

    Deterministic stand-in for k-means training: centroids are the 16
    lowest-id vectors (training is an offline concern; the *search*
    dataflow — assignment lists, multi-probe, rerank — is what must
    scale). At 100 TB the assignment table is the partitioning key:
    each cell's vectors are co-located, and a query touches n_probe
    cells instead of the corpus.
    """
    n_centroids, n_probe = 16, 4

    oracle = f"""
    WITH vecs AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cent_id, e AS ce FROM vecs WHERE vec_id < {n_centroids}
    ),
    assign_sims AS (
      SELECT v.vec_id, v.label, v.e, c.cent_id,
             {_cos6_sql('v.e', 'c.ce')} AS sim,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id ORDER BY {_cos6_sql('v.e', 'c.ce')} DESC, c.cent_id
             ) AS rn
      FROM vecs v, cents c
    ),
    assigned AS (
      SELECT vec_id, label, e, cent_id FROM assign_sims WHERE rn = 1
    ),
    qs AS (SELECT vec_id AS q_id, e AS qe FROM vecs WHERE vec_id < {N_QUERY_VECS}),
    probe_sims AS (
      SELECT q.q_id, q.qe, c.cent_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_id ORDER BY {_cos6_sql('q.qe', 'c.ce')} DESC, c.cent_id
             ) AS rn
      FROM qs q, cents c
    ),
    probes AS (SELECT q_id, qe, cent_id FROM probe_sims WHERE rn <= {n_probe}),
    cand_sims AS (
      SELECT p.q_id, a.vec_id, a.label,
             {_cos6_sql('p.qe', 'a.e')} AS cos_sim
      FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
      WHERE a.vec_id <> p.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos_sim DESC, vec_id
             ) AS rank
      FROM cand_sims
    )
    SELECT q_id AS query_id, CAST(rank AS INT) AS rank,
           vec_id AS neighbor_id, label AS neighbor_label, cos_sim
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """

    def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        vecs = table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", as_double(F.col("embedding")).alias("e")
        )
        cents = vecs.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
        )
        sim = cos6(F.col("e"), F.col("ce"))
        w_assign = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cent_id")
        assigned = (
            vecs.join(F.broadcast(cents))
            .withColumn("sim", sim)
            .withColumn("rn", F.row_number().over(w_assign))
            .filter(F.col("rn") == 1)
            .select("vec_id", "label", "e", "cent_id")
        )
        qs = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
            F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
        )
        q_sim = cos6(F.col("qe"), F.col("ce"))
        w_probe = Window.partitionBy("q_id").orderBy(F.desc("qsim"), "cent_id")
        probes = (
            qs.join(F.broadcast(cents))
            .withColumn("qsim", q_sim)
            .withColumn("rn", F.row_number().over(w_probe))
            .filter(F.col("rn") <= n_probe)
            .select("q_id", "qe", "cent_id")
        )
        cand = (
            probes.join(assigned, "cent_id")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                "label",
                cos6(F.col("qe"), F.col("e")).alias("cos_sim"),
            )
        )
        w_rank = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
        return (
            cand.withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= TOP_K)
            .select(
                F.col("q_id").alias("query_id"),
                F.col("rank").cast("int").alias("rank"),
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("neighbor_label"),
                "cos_sim",
            )
            .orderBy("query_id", "rank")
        )

    register(
        "ann_ivf_topk",
        oracle=oracle,
        doc="IVF-style ANN: Voronoi-cell assignment to 16 deterministic "
        "coarse centroids, 4-probe search, exact-cosine rerank of the "
        "probed cells only. The assignment table doubles as the "
        "co-location partitioning key at scale.",
        tags=("vectors", "ann", "ivf"),
    )(ann_ivf_topk)


_register_ivf_ann()


def _register_kmeans_step() -> None:
    """One k-means (spherical, cosine-assignment) update iteration as a
    dataflow: assign every vector to its nearest of 16 deterministic
    centroids, then recompute each centroid coordinate as the exact
    per-dimension member mean. This is the building block of iterative
    training loops (k-means, IVF codebook learning): the driver runs N
    iterations by feeding each round's output back as centroids; the
    per-iteration dataflow is what must scale, and it is one broadcast
    join + one (cell, dim) partial aggregation — no global state.
    """
    n_centroids = 16

    oracle = f"""
    WITH vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cent_id, e AS ce FROM vecs WHERE vec_id < {n_centroids}
    ),
    assign_sims AS (
      SELECT v.vec_id, v.e, c.cent_id,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_cos6_sql('v.e', 'c.ce')} DESC, c.cent_id
             ) AS rn
      FROM vecs v, cents c
    ),
    assigned AS (
      SELECT vec_id, e, cent_id FROM assign_sims WHERE rn = 1
    ),
    exploded AS (
      SELECT a.cent_id, CAST(t.i AS INT) AS dim,
             CAST(ROUND(a.e[t.i] * 1000000) AS BIGINT) AS val_micro
      FROM assigned a, unnest(range(1, len(a.e) + 1)) AS t(i)
    )
    SELECT cent_id,
           dim,
           COUNT(*) AS n_members,
           CAST(CAST(SUM(val_micro) AS DOUBLE) / (COUNT(*) * 1000000.0)
                AS DOUBLE) AS new_coord
    FROM exploded
    GROUP BY cent_id, dim
    ORDER BY cent_id, dim
    """

    def kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
        vecs = table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double(F.col("embedding")).alias("e")
        )
        cents = vecs.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
        )
        sim = cos6(F.col("e"), F.col("ce"))
        w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cent_id")
        assigned = (
            vecs.join(F.broadcast(cents))
            .withColumn("sim", sim)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cent_id", "e")
        )
        exploded = assigned.select(
            "cent_id", F.posexplode("e").alias("dim0", "val")
        ).select(
            "cent_id",
            (F.col("dim0") + 1).cast("int").alias("dim"),
            F.round(F.col("val") * 1000000).cast("bigint").alias("val_micro"),
        )
        return (
            exploded.groupBy("cent_id", "dim")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                (
                    F.sum("val_micro").cast("double")
                    / (F.count(F.lit(1)) * 1000000.0)
                ).cast("double").alias("new_coord"),
            )
            .orderBy("cent_id", "dim")
        )

    register(
        "kmeans_update_step",
        oracle=oracle,
        doc=_register_kmeans_step.__doc__
        + " Determinism: assignment reuses the IVF cosine (sequential "
        "fold, 6-decimal round, cent_id tie-break); the mean is an exact "
        "integer-micro sum divided once. Scale: centroids broadcast "
        "(16×64 doubles), the corpus never shuffles for assignment; the "
        "(cell, dim) aggregation is 1024 groups with map-side partials — "
        "the classic mergeable-statistics tree. Payload vectors leave "
        "the scan stage only as exploded (cell, dim, micro) triples.",
        tags=("vectors", "kmeans", "iterative"),
    )(kmeans_update_step)


_register_kmeans_step()
