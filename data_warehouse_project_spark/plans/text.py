"""Text-analysis and document-dedup queries over ``documents`` — the
training-data-pipeline extension surface (beyond the reference, which is
batch-relational only; SURVEY.md §7 step 9).

Determinism notes: all ratios are computed from integer totals with a
single final division (never averaged doubles); shingle/minhash
signatures are md5 hex strings compared lexicographically, which is
engine-portable (no integer-hash semantics to match).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import register

# Marker stopwords per language for the n-gram/stopword heuristic. The
# test corpus is synthetic word soup, so these act as a deterministic
# scoring function, not a real classifier.
_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "fr": ("table", "column", "join"),
    "de": ("row", "key", "hash"),
}


def _tokens(col):
    return F.split(col, " ")


@register(
    "text_quality_profile",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tokens,
             n_chars,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a'))) AS n_stop
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
           CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS stopword_ratio
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Quality scoring: token counts, char totals, stopword ratio per "
    "language — integer totals with one final division (deterministic). "
    "Per-doc metrics stay inside codegen (split/filter/size on the scan).",
    tags=("text",),
)
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    per_doc = d.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        "n_chars",
        F.size(F.filter(toks, lambda t: t.isin("the", "a"))).alias("n_stop"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens_per_doc"
            ),
            (F.sum("n_stop").cast("double") / F.sum("n_tokens")).alias(
                "stopword_ratio"
            ),
        )
        .orderBy("lang")
    )


_LANG_ID_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text,' '), t -> t IN ('the','a','fast','slow'))) AS s_en,
         len(list_filter(string_split(text,' '), t -> t IN ('table','column','join'))) AS s_fr,
         len(list_filter(string_split(text,' '), t -> t IN ('row','key','hash'))) AS s_de
  FROM documents
), guessed AS (
  SELECT doc_id, lang,
         CASE WHEN s_en >= s_fr AND s_en >= s_de THEN 'en'
              WHEN s_fr >= s_de THEN 'fr'
              ELSE 'de' END AS guessed_lang
  FROM scored
)
SELECT lang, guessed_lang, COUNT(*) AS n_docs
FROM guessed
GROUP BY lang, guessed_lang
ORDER BY lang, guessed_lang
"""


@register(
    "lang_id_heuristic",
    oracle=_LANG_ID_ORACLE,
    doc="Language-ID heuristic: marker-word scores with a deterministic "
    "argmax (ties broken by fixed precedence en>fr>de), cross-tabbed "
    "against the labeled lang. The heuristic is a per-row expression — "
    "no shuffle until the final tiny cross-tab.",
    tags=("text",),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def score(words: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scored = d.select(
        "doc_id",
        "lang",
        score(_MARKERS["en"]).alias("s_en"),
        score(_MARKERS["fr"]).alias("s_fr"),
        score(_MARKERS["de"]).alias("s_de"),
    )
    guessed = scored.withColumn(
        "guessed_lang",
        F.when(
            (F.col("s_en") >= F.col("s_fr")) & (F.col("s_en") >= F.col("s_de")), "en"
        )
        .when(F.col("s_fr") >= F.col("s_de"), "fr")
        .otherwise("de"),
    )
    return (
        guessed.groupBy("lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "guessed_lang")
    )


@register(
    "doc_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT lang, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT fingerprint) AS BIGINT) AS n_dup_docs
    FROM fp GROUP BY lang ORDER BY lang
    """,
    doc="Document fingerprinting: md5 of whitespace-normalized lowercased "
    "text (the rolling-hash fingerprint's exact-match core), rolled up "
    "to a dup census per language.",
    tags=("text", "dedup"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
    return (
        d.select("lang", fp.alias("fingerprint"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fingerprint")).alias("n_dup_docs"),
        )
        .orderBy("lang")
    )


@register(
    "dedup_exact_docs",
    oracle="""
    WITH fp AS (SELECT doc_id, md5(text) AS fingerprint FROM documents),
    groups AS (
      SELECT fingerprint, COUNT(*) AS group_size, MIN(doc_id) AS keeper_doc_id
      FROM fp GROUP BY fingerprint
    )
    SELECT COUNT(*) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(SUM(group_size) - COUNT(*) AS BIGINT) AS n_removable,
           MAX(group_size) AS max_group_size
    FROM groups
    """,
    doc="Exact dedup census: hash-groupBy on md5(text), keep min(doc_id) "
    "per group. The at-scale pattern: fingerprint is computed on the "
    "scan, the groupBy shuffles only (hash, doc_id) pairs — never text.",
    tags=("text", "dedup"),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    groups = (
        d.select("doc_id", F.md5(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("group_size"), F.min("doc_id").alias("keeper_doc_id"))
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("group_size").alias("n_docs"),
        F.sum(F.when(F.col("group_size") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        (F.sum("group_size") - F.count(F.lit(1))).alias("n_removable"),
        F.max("group_size").alias("max_group_size"),
    )


# Shared shingle CTE text for the oracle (3-word shingles, distinct per doc).
_SHINGLES_SQL = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
  sh AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks WHERE len(t) >= 3
  ),
  doc_shingles AS (SELECT DISTINCT doc_id, shingle FROM sh),
  sizes AS (SELECT doc_id, COUNT(*) AS n FROM doc_shingles GROUP BY doc_id)
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct 3-word shingles — Spark twin of
    _SHINGLES_SQL, delegating to the one canonical construction
    (operators/dedup_index.shingles_of, which also documents the
    Catalyst re-split perf trap)."""
    from data_warehouse_project_spark.operators.dedup_index import shingles_of

    return shingles_of(table(spark, sf_dir, "documents"))


def jaccard_pairs(shingles: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b, n_shared, jaccard): doc pairs with exact
    shingle-Jaccard >= threshold (doc_a < doc_b) — the one pair
    pipeline shared by the exact dedup query and the near-dup cluster
    graph (plans/graph.py), so a threshold/verification change moves
    both. Callers should .cache() the shingles frame (read twice)."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_shared")
    )
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "n_shared", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM doc_shingles a JOIN doc_shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b, p.n_shared,
           CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared) AS jaccard
    FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    doc="N-gram (3-word shingle) Jaccard near-dup detection: shingle "
    "self-join → shared counts → exact Jaccard ≥ 0.5. The self-join on "
    "shingle is the scale risk (hot shingles fan out); the production "
    "path is dedup_minhash_lsh which bounds candidates via banding — "
    "this exact variant doubles as its verifier.",
    tags=("text", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = _shingles(spark, sf_dir).cache()
    return jaccard_pairs(ds, 0.5).orderBy("doc_a", "doc_b")


_MINHASH_K = 8  # 4 bands x 2 rows
_MINHASH_BANDS = ((0, 1), (2, 3), (4, 5), (6, 7))


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    mh AS (
      SELECT doc_id,
             {", ".join(f"MIN(md5('{k}:' || shingle)) AS h{k}" for k in range(_MINHASH_K))}
      FROM doc_shingles GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_id, md5(h{a} || h{b}) AS band_sig FROM mh"
        for bi, (a, b) in enumerate(_MINHASH_BANDS)
      )}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
      FROM cand c
        JOIN doc_shingles x ON x.doc_id = c.doc_a
        JOIN doc_shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT v.doc_a, v.doc_b,
           CAST(v.n_shared AS DOUBLE) / (sa.n + sb.n - v.n_shared) AS jaccard
    FROM verified v
      JOIN sizes sa ON sa.doc_id = v.doc_a
      JOIN sizes sb ON sb.doc_id = v.doc_b
    WHERE CAST(v.n_shared AS DOUBLE) / (sa.n + sb.n - v.n_shared) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    bench=True,
    doc="MinHash+LSH near-dup pipeline: shingle → 8 minhashes (string-min "
    "of seeded md5, engine-portable) → 4 bands of 2 → bucket self-join on "
    "band signature → exact-Jaccard verification of candidates only. "
    "At 100 TB the band join shuffles only (band_sig, doc_id) pairs and "
    "candidate verification touches a tiny fraction of the corpus; "
    "band-bucket skew is bounded because identical band_sig implies "
    "near-identical docs.",
    tags=("text", "dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.operators.dedup_index import (
        band_rows_narrow,
        candidate_pairs,
        verify_pairs_exact,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # band rows computed per-row in codegen (zero shuffles — MIN over
    # the shingle array is duplicate-insensitive, so no explode/
    # distinct/groupBy; tested equal to the canonical formulation in
    # tests/test_dedup_index.py); cached because the self-join reads
    # them twice. candidate_pairs is the shared LAZY self-join
    # (explain_audit budgets its exchanges pre-checkpoint — the
    # checkpoint below would otherwise hide the heavy stage from the
    # audit); the checkpointed candidate frame then feeds the SAME
    # exact-Jaccard verifier the incremental index uses — one
    # semi-joined corpus scan, array-intersect per candidate pair.
    bands = band_rows_narrow(docs).cache()
    cand = candidate_pairs(bands).localCheckpoint()
    bands.unpersist()
    return verify_pairs_exact(docs, cand, 0.5).orderBy("doc_a", "doc_b")


@register(
    "token_stats_by_source",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT source,
           COUNT(*) AS total_tokens,
           COUNT(DISTINCT token) AS vocab_size,
           MIN(token) AS first_token_alpha,
           MAX(token) AS last_token_alpha
    FROM tok GROUP BY source ORDER BY source
    """,
    doc="Token counting + vocabulary stats per source (whitespace "
    "tokenizer). explode stays in the same stage as the scan; only "
    "(source, token) pairs shuffle for the distinct.",
    tags=("text",),
)
def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(_tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.countDistinct("token").alias("vocab_size"),
            F.min("token").alias("first_token_alpha"),
            F.max("token").alias("last_token_alpha"),
        )
        .orderBy("source")
    )


def _register_simhash() -> None:
    from data_warehouse_project_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_near_dup_pairs,
    )

    # 6 bands x 10 bits: pigeonhole-complete for hamming <= 5 — a
    # 0.95-jaccard pair flips ~5% of feature votes ≈ 4-6 bits of 60.
    n_bands, max_ham = 6, 5
    band_len = SIMHASH_BITS // n_bands
    oracle = f"""
    WITH {_SHINGLES_SQL},
    feats AS (
      SELECT doc_id,
             list(('0x' || substr(md5(shingle), 1, 15))::BIGINT) AS hs,
             COUNT(*) AS n
      FROM doc_shingles GROUP BY doc_id
    ),
    sigs AS (
      SELECT doc_id,
             array_to_string(list_transform(range(0, {SIMHASH_BITS}), b ->
               CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > n
                    THEN '1' ELSE '0' END), '') AS sig
      FROM feats
    ),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {i} AS band_id, substr(sig, {i * band_len + 1}, {band_len}) AS band_sig FROM sigs" for i in range(n_bands))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    dist AS (
      SELECT c.doc_a, c.doc_b,
             len(list_filter(range(1, {SIMHASH_BITS} + 1),
                 i -> substr(sa.sig, i, 1) <> substr(sb.sig, i, 1))) AS hamming
      FROM cand c
        JOIN sigs sa ON sa.doc_id = c.doc_a
        JOIN sigs sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
    FROM dist WHERE hamming <= {max_ham}
    ORDER BY doc_a, doc_b
    """

    def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
        feats = _shingles(spark, sf_dir).withColumnRenamed("shingle", "feature")
        pairs = simhash_near_dup_pairs(
            feats,
            max_hamming=max_ham,
            n_bands=n_bands,
        )
        return pairs.select(
            "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
        )

    register(
        "dedup_simhash",
        oracle=oracle,
        doc="SimHash near-dup pairs: 60-bit shingle-vote signatures (md5 "
        "bit votes, engine-portable), 6-band x 10-bit LSH candidate "
        "join, exact Hamming verification <= 5 (pigeonhole-complete: "
        "max_hamming < n_bands). Signatures are computed as one "
        "columnar conditional-sum pass over exploded shingles; only "
        "(band_sig, id) pairs shuffle.",
        tags=("text", "dedup", "simhash"),
    )(dedup_simhash)


_register_simhash()


@register(
    "pandas_udf_token_stats",
    oracle="""
    WITH t AS (
      SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY lang ORDER BY lang
    """,
    doc="The sanctioned Python escape hatch, demonstrated and verified: "
    "an Arrow-vectorized @pandas_udf tokenizes whole columnar batches "
    "(pandas str.split per series — one Python call per batch, never "
    "per row) and its integer outputs hash-match the pure-SQL oracle. "
    "Exists to prove the UDF boundary contract (SURVEY.md §2.10); the "
    "native-function twin is token_stats_by_source — at 100 TB prefer "
    "that (codegen beats Arrow transfer when a builtin exists).",
    tags=("text", "pandas-udf"),
)
def pandas_udf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int64")

    d = table(spark, sf_dir, "documents")
    return (
        d.select("lang", n_tokens("text").alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .orderBy("lang")
    )


_OOV_VOCAB_K = 16


@register(
    "oov_rate_by_source",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS n FROM tok GROUP BY token
        ORDER BY n DESC, token LIMIT {_OOV_VOCAB_K}
      )
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS oov_ppm
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.source ORDER BY t.source
    """,
    doc="Out-of-vocabulary rate per source: fraction of tokens outside "
    "the top-16 corpus vocabulary (count-desc, token-asc tie-break — a "
    "deterministic total order), as exact ppm integers. The classic "
    "rare-token quality filter for pretraining corpora: a source whose "
    "OOV rate spikes is boilerplate, another language, or junk. "
    "Scale shape: vocabulary via partial-agg + global top-K (tiny), "
    "broadcast back for the membership probe — token traffic shuffles "
    "once for the vocab count; the probe join is map-side.",
    tags=("text", "quality"),
)
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(_tokens(F.col("text"))).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(_OOV_VOCAB_K)
        .select("token", F.lit(1).alias("__known"))
    )
    probed = tok.join(F.broadcast(vocab), "token", "left")
    oov = F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0))
    agg = probed.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        oov.cast("bigint").alias("oov_tokens"),
    )
    # one definition of "OOV": ppm derives from the aggregated counts
    return agg.select(
        "source",
        "total_tokens",
        "oov_tokens",
        F.expr("CAST(oov_tokens * 1000000 div total_tokens AS BIGINT)").alias(
            "oov_ppm"
        ),
    ).orderBy("source")


_OVERLAP_K = 8  # minhash signature length per source


@register(
    "source_overlap_minhash",
    oracle=f"""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT source,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3
    ),
    src_shingles AS (SELECT DISTINCT source, shingle FROM sh),
    mh AS (
      SELECT source,
             {", ".join(f"MIN(md5('{k}:' || shingle)) AS h{k}" for k in range(_OVERLAP_K))}
      FROM src_shingles GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST({" + ".join(f"(CASE WHEN a.h{k} = b.h{k} THEN 1 ELSE 0 END)" for k in range(_OVERLAP_K))}
             AS BIGINT) AS n_matches,
           CAST(({" + ".join(f"(CASE WHEN a.h{k} = b.h{k} THEN 1 ELSE 0 END)" for k in range(_OVERLAP_K))})
             * 1000000 // {_OVERLAP_K} AS BIGINT) AS est_jaccard_ppm
    FROM mh a JOIN mh b ON a.source < b.source
    ORDER BY source_a, source_b
    """,
    doc="Dataset-level overlap diagnostics: one 8-slot minhash signature "
    "per SOURCE over its distinct 3-shingle set (seeded md5 string-min, "
    "engine-portable), pairwise estimated Jaccard = matching slots / 8 "
    "as exact ppm. This is the corpus-mixture dedup question ('how much "
    "of source A is also in source B?') answered without any pairwise "
    "shingle join. Scale shape: signatures are one partial-aggregated "
    "groupBy over (source, shingle); the pairwise compare is a "
    "|sources|-row cross — model state, not data.",
    tags=("text", "dedup"),
)
def source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_project_spark.operators.dedup_index import (
        minhash_cols,
        shingles_of,
    )

    src_shingles = shingles_of(table(spark, sf_dir, "documents"), key="source")
    mh = src_shingles.groupBy("source").agg(*minhash_cols(_OVERLAP_K))
    a, b = mh.alias("a"), mh.alias("b")
    n_matches = sum(
        F.when(F.col(f"a.h{k}") == F.col(f"b.h{k}"), 1).otherwise(0)
        for k in range(_OVERLAP_K)
    )
    return (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            n_matches.cast("bigint").alias("n_matches"),
            (n_matches * 1000000 / F.lit(_OVERLAP_K))
            .cast("bigint")
            .alias("est_jaccard_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    mh AS (
      SELECT doc_id,
             {", ".join(f"MIN(md5('{k}:' || shingle)) AS h{k}" for k in range(_MINHASH_K))}
      FROM doc_shingles GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_id, md5(h{a} || h{b}) AS band_sig FROM mh"
        for bi, (a, b) in enumerate(_MINHASH_BANDS)
      )}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
      FROM cand c
        JOIN doc_shingles x ON x.doc_id = c.doc_a
        JOIN doc_shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT v.doc_a, v.doc_b,
           CAST(v.n_shared AS DOUBLE) / (sa.n + sb.n - v.n_shared) AS jaccard
    FROM verified v
      JOIN sizes sa ON sa.doc_id = v.doc_a
      JOIN sizes sb ON sb.doc_id = v.doc_b
    WHERE CAST(v.n_shared AS DOUBLE) / (sa.n + sb.n - v.n_shared) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    doc="Incremental LSH admission vs the one-shot oracle: the corpus "
    "is fed to operators/dedup_index.MinHashIndex in TWO batches (even "
    "then odd doc_ids); the union of per-batch pair outputs must equal "
    "the full-corpus MinHash+LSH result — proving batch-boundary "
    "losslessness under the driver's value-hash gate, not just in unit "
    "tests. This is the only dedup shape that scales to a growing "
    "corpus: signatures are computed for new documents only, existing "
    "ones are probed via the stored band table.",
    tags=("text", "dedup", "lsh", "incremental"),
    eager=True,
    bench=True,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.operators.dedup_index import MinHashIndex

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # the admissions are eager (localCheckpoint), so the returned frame
    # no longer depends on the scratch band store — always clean it up
    tmp = tempfile.mkdtemp(prefix="mhidx_")
    try:
        idx = MinHashIndex(Warehouse(spark, tmp))
        p1 = idx.add_documents(docs.filter("doc_id % 2 = 0"), docs)
        p2 = idx.add_documents(docs.filter("doc_id % 2 = 1"), docs)
        return p1.unionByName(p2).orderBy("doc_a", "doc_b")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_FH_DIM = 64


@register(
    "doc_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(token), 1, 8))::BIGINT % {_FH_DIM} AS dim,
             CASE WHEN ('0x' || substr(md5('s:' || token), 1, 8))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok
    )
    SELECT doc_id, CAST(dim AS INT) AS dim,
           CAST(SUM(sgn) AS BIGINT) AS weight
    FROM hashed GROUP BY doc_id, dim
    HAVING SUM(sgn) <> 0
    ORDER BY doc_id, dim
    """,
    doc="Feature hashing (the 'hashing trick'): tokens map to one of 64 "
    "dimensions by md5, with a second independent hash choosing a +/-1 "
    "sign so collisions cancel in expectation — the classical "
    "vocabulary-free text vectorizer that feeds linear models and the "
    "ANN stack without a fitted vocabulary (no training pass, no "
    "dictionary to ship). Output is the exploded sparse vector "
    "(doc_id, dim, integer weight), zero entries dropped — exact "
    "integers, no float in the contract. Scale shape: pure per-row "
    "expressions then one (doc_id, dim) partial-aggregated shuffle; "
    "dimensionality is a constant, vocabulary growth costs nothing.",
    tags=("text", "vectorize"),
)
def doc_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    dim = F.pmod(
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint"),
        F.lit(_FH_DIM),
    )
    sgn = F.when(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("s:"), F.col("token"))), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(2),
        )
        == 0,
        1,
    ).otherwise(-1)
    return (
        tok.select("doc_id", dim.cast("int").alias("dim"), sgn.alias("sgn"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
        .orderBy("doc_id", "dim")
    )
