"""Corpus-curation operators for a training-data pipeline: deterministic
sampling (stratified rate + fixed quota), normalization-aware
fingerprinting, regex redaction accounting, edit-distance near-dup
pairs, and cross-source contamination detection.

These extend the reference's surface the way a 100 TB pretraining
pipeline would use it — every operator here is a standard curation
step (downsample dominant languages, dedup after normalization, scrub
identifiers, find benchmark leakage across sources) expressed as pure
DataFrame plans with DuckDB oracle twins.

Determinism notes (plans/queries.py rules): sampling decisions hash
md5 hex → first 8 hex digits → bigint, identical in both engines; all
rankings carry total tie-breaks; levenshtein is the standard DP edit
distance with identical semantics in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import register

# Keep-rate per language tier: downsample the dominant language, keep
# the tail. Applied via a deterministic per-doc hash draw, so the same
# doc_id always makes the same decision on any cluster layout.
_EN_RATE = 0.35
_OTHER_RATE = 0.80
_HASH_SPAN = float(1 << 32)


def _hash_unit_spark(col):
    """md5(doc_id) → uniform bigint in [0, 2^32): the sampling draw
    (the shared functions/hashing.py unit over the stringified key)."""
    from data_warehouse_project_spark.functions.hashing import md5_prefix_int

    return md5_prefix_int(col.cast("string"))


def _hash_unit_sql(expr: str) -> str:
    from data_warehouse_project_spark.functions.hashing import md5_prefix_int_sql

    return md5_prefix_int_sql(f"CAST({expr} AS VARCHAR)")


@register(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_hash_unit_sql('doc_id')}
          < CAST(ROUND(CASE WHEN lang = 'en' THEN {_EN_RATE} ELSE {_OTHER_RATE} END
                       * {_HASH_SPAN}) AS BIGINT)
    ORDER BY doc_id
    """,
    doc="Stratified deterministic sampling: keep 35% of English docs and "
    "80% of everything else (the classic downsample-the-dominant-"
    "language curation step). The draw is md5(doc_id) — a pure per-row "
    "expression, no RNG state, so the sample is reproducible on any "
    "partitioning and any cluster size, and the filter pushes into the "
    "scan stage (no shuffle at all). Membership is verified row-by-row "
    "against the oracle, not just counted.",
    tags=("corpus", "sampling"),
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(_EN_RATE)).otherwise(F.lit(_OTHER_RATE))
    cut = F.round(rate * F.lit(_HASH_SPAN)).cast("bigint")
    return (
        d.filter(_hash_unit_spark(F.col("doc_id")) < cut)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "quota_sample_per_source",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY source, rk
    """,
    doc="Fixed-quota sampling: exactly 5 docs per source, chosen by "
    "hash order (a deterministic stand-in for random-without-"
    "replacement). The window partitions on source — high cardinality "
    "at corpus scale, so no single-task funnel — and the md5 sort key "
    "with doc_id tie-break is total, giving identical quotas on both "
    "engines regardless of physical row order. This is the per-domain "
    "quota shape used to cap any one crawl domain's contribution.",
    tags=("corpus", "sampling", "window"),
)
def quota_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .orderBy("source", "rk")
    )


@register(
    "normalized_dedup_profile",
    oracle="""
    WITH norm AS (
      SELECT source,
             md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               '  +', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_unique_norm
    FROM norm GROUP BY source ORDER BY source
    """,
    doc="Normalization-aware dedup profile: docs per source vs distinct "
    "md5 fingerprints of the *normalized* text (lowercase, strip "
    "non-alphanumerics, collapse runs of spaces). Catches duplicates "
    "that exact-hash dedup misses because of case/punctuation drift — "
    "the standard first pass before MinHash. The normalization chain "
    "is three codegen string ops in the scan stage; only the 32-byte "
    "fingerprint shuffles for the distinct, never the text.",
    tags=("corpus", "dedup"),
)
def normalized_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
                "  +",
                " ",
            )
        )
    )
    return (
        d.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique_norm"),
        )
        .orderBy("source")
    )


@register(
    "redaction_stats_by_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
             AS n_digit_runs,
           COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))
             AS n_masked_forms
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Regex redaction accounting (the PII-scrub shape): per event "
    "type, how many digit runs would be masked and how many distinct "
    "masked payload templates remain. A real pipeline swaps the digit "
    "pattern for email/phone/SSN patterns; the plan is identical — "
    "regexp_count + global regexp_replace in whole-stage codegen, "
    "aggregated by a low-cardinality key with map-side partials. "
    "Counting masked *templates* is the standard audit that redaction "
    "collapsed payloads into a bounded schema set.",
    tags=("corpus", "redaction"),
)
def redaction_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.regexp_count(F.col("props"), F.lit("[0-9]+")).alias("__runs"),
            F.regexp_replace(F.col("props"), "[0-9]+", "#").alias("__masked"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("__runs").cast("bigint")).alias("n_digit_runs"),
            F.countDistinct("__masked").alias("n_masked_forms"),
        )
        .orderBy("event_type")
    )


@register(
    "levenshtein_neardup_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source, substr(text, 1, 40) AS p
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.source AS source,
           CAST(levenshtein(a.p, b.p) AS INTEGER) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.p, b.p) <= 24
    ORDER BY doc_a, doc_b
    """,
    doc="Edit-distance near-dup candidates: within (lang, source) "
    "blocks, pairs whose 40-char prefixes are within levenshtein 24. "
    "Blocking is what makes this scale — the equi-join on the block "
    "key shuffles each block to one place and the quadratic comparison "
    "runs only inside blocks (the all-pairs version is O(n²) and never "
    "acceptable); a production variant adds a length-bucket to the "
    "block key to cap block size. Spark and DuckDB both implement the "
    "standard Wagner-Fischer distance, so the survivors and distances "
    "match exactly.",
    tags=("corpus", "dedup", "join"),
)
def levenshtein_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.substring("text", 1, 40).alias("p")
    )
    a = d.alias("a")
    b = d.alias("b")
    dist = F.levenshtein(F.col("a.p"), F.col("b.p"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= 24)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.source").alias("source"),
            dist.cast("int").alias("edit_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "cross_source_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT source,
             unnest(list_transform(range(1, len(t) - 3),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                         || t[i+3] || ' ' || t[i+4])) AS shingle
      FROM toks WHERE len(t) >= 5
    ),
    ds AS (SELECT DISTINCT source, shingle FROM sh)
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS shared_shingles
    FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY shared_shingles DESC, source_a, source_b
    LIMIT 50
    """,
    doc="Cross-source contamination (benchmark-decontamination shape): "
    "count distinct 5-word shingles shared between every pair of "
    "sources. In production one side is the eval-benchmark corpus and "
    "a hit means a training doc leaks test data. The plan dedups "
    "shingles per source *before* the join (so the join moves "
    "|distinct shingles|, not |tokens|), equi-joins on the shingle "
    "itself — at 100 TB you'd join on md5(shingle) to shrink shuffle "
    "width — and aggregates pair counts with map-side partials. The "
    "token array is materialized before the transform (Catalyst "
    "project-collapse would otherwise re-split per element).",
    tags=("corpus", "contamination", "join"),
)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.split(F.col("text"), " ").alias("t")).filter(
        F.size("t") >= 5
    )
    t = F.col("t")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(t) - 5),
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
            F.element_at(t, i + 3),
            F.element_at(t, i + 4),
            F.element_at(t, i + 5),
        ),
    )
    ds = (
        toks.select("source", F.explode(shingles).alias("shingle"))
        .distinct()
    )
    a = ds.alias("a")
    b = ds.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .orderBy(F.desc("shared_shingles"), "source_a", "source_b")
        .limit(50)
    )


CHUNK_TOKENS = 32
PACK_BUDGET = 256


@register(
    "chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(len(t) / {CHUNK_TOKENS}.0) AS BIGINT)))
               AS chunk_id,
             t
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(list_slice(t, chunk_id * {CHUNK_TOKENS} + 1,
                               chunk_id * {CHUNK_TOKENS} + {CHUNK_TOKENS}))
                AS INTEGER) AS n_tokens,
           md5(array_to_string(
                 list_slice(t, chunk_id * {CHUNK_TOKENS} + 1,
                            chunk_id * {CHUNK_TOKENS} + {CHUNK_TOKENS}), ' '))
             AS chunk_fp
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
    doc=f"Document chunking: split each doc into {CHUNK_TOKENS}-token "
    "windows (the tokenize-and-chunk step before embedding or training "
    "ingestion). The token array is materialized once per doc, chunk "
    "ids come from a sequence-explode, and each chunk is a slice() — "
    "all codegen array ops, no Python. Only the 32-byte chunk "
    "fingerprint and token count leave the scan stage, never the "
    "chunk text itself; at 100 TB the output is written "
    "partition-parallel with no shuffle at all (narrow lineage "
    "end-to-end). Verified chunk-by-chunk via md5 against the oracle.",
    tags=("corpus", "chunking"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t")).filter(
        F.size("t") > 0
    )
    n_chunks = F.ceil(F.size("t") / F.lit(float(CHUNK_TOKENS))).cast("bigint")
    chunks = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_id"
        ),
        "t",
    )
    piece = F.slice(
        F.col("t"),
        (F.col("chunk_id") * CHUNK_TOKENS + 1).cast("int"),
        CHUNK_TOKENS,
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "pack_documents_stream",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    offs AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS start_off
      FROM toks
    )
    SELECT source,
           CAST(COALESCE(start_off, 0) // {PACK_BUDGET} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_started
    FROM offs
    GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
    doc="Concat-stream packing accounting: documents are concatenated "
    f"per source in doc_id order and sliced into {PACK_BUDGET}-token "
    "context windows — each doc's start offset is a running-sum window "
    "(exclusive frame), its bin is offset // budget. This is exactly "
    "how pretraining packs sequences (concatenate, then slice), so "
    "the per-bin doc counts and token totals are the packing audit a "
    "data pipeline reports. The window partitions on source (high "
    "cardinality at corpus scale) and carries integer token counts "
    "only; the aggregation reuses the same partitioning — one "
    "shuffle total.",
    tags=("corpus", "packing", "window"),
)
def pack_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_off"),
    )
    return (
        offs.groupBy(
            "source",
            # exact integer floor-division (start_off >= 0 so trunc ==
            # floor) — a double divide would wobble above 2^53 offsets
            F.expr(f"start_off div {PACK_BUDGET}").cast("bigint").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_started"),
        )
        .orderBy("source", "bin_id")
    )


# ONE bigram definition for both term-statistics queries — a
# tokenization change must move bigram_df_topk and repetition_profile
# together or the two corpus-quality metrics silently disagree about
# what an n-gram is.
_BIGRAMS_CTE_SQL = """toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2
    )"""


def _bigrams(d: DataFrame) -> DataFrame:
    """documents → exploded (doc_id, lang, bigram) word bigrams."""
    toks = d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("t")).filter(
        F.size("t") >= 2
    )
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - 2),
        lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
    )
    return toks.select("doc_id", "lang", F.explode(grams).alias("bigram"))


@register(
    "bigram_df_topk",
    oracle=f"""
    WITH {_BIGRAMS_CTE_SQL},
    tf AS (
      SELECT lang, bigram, COUNT(*) AS tf
      FROM bg GROUP BY lang, bigram
    ),
    df AS (
      SELECT bigram, COUNT(DISTINCT doc_id) AS df FROM bg GROUP BY bigram
    ),
    total AS (SELECT COUNT(*) AS n FROM documents),
    ranked AS (
      SELECT tf.lang, tf.bigram, tf.tf, df.df,
             CAST(tf.tf * total.n AS DOUBLE) / df.df AS rarity_score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.lang
               ORDER BY CAST(tf.tf * total.n AS DOUBLE) / df.df DESC,
                        tf.bigram
             ) AS rk
      FROM tf JOIN df USING (bigram), total
    )
    SELECT lang, bigram, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           rarity_score, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY lang, rk
    """,
    doc="Term statistics (tf-idf shape without the log): per-language "
    "bigram frequency joined with corpus-wide document frequency, top "
    "5 per language by tf·N/df. The score stays a single rational "
    "division of exact integers — no ln(), whose last-ulp rounding "
    "differs across engines — so the ranking is bit-identical. Plan: "
    "two partial-agg trees over one bigram explode (Spark reuses the "
    "exploded frame), a broadcast of the tiny df/total sides at this "
    "vocabulary, an equi-join at scale. The ranking window partitions "
    "on language with a total tie-break.",
    tags=("corpus", "tfidf", "window"),
)
def bigram_df_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bg = _bigrams(d)
    tf = bg.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("tf"))
    df = bg.groupBy("bigram").agg(F.countDistinct("doc_id").alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    score = (F.col("tf") * F.col("n")).cast("double") / F.col("df")
    w = Window.partitionBy("lang").orderBy(F.desc("rarity_score"), "bigram")
    ranked = (
        tf.join(df, "bigram")
        .join(F.broadcast(total))
        .select(
            "lang",
            "bigram",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            score.alias("rarity_score"),
        )
        .withColumn("rk", F.row_number().over(w))
    )
    return ranked.filter(F.col("rk") <= 5).orderBy("lang", "rk")


@register(
    "repetition_profile",
    oracle=f"""
    WITH {_BIGRAMS_CTE_SQL},
    per_bigram AS (
      SELECT doc_id, lang, bigram, COUNT(*) AS cnt
      FROM bg GROUP BY doc_id, lang, bigram
    ),
    per_doc AS (
      SELECT doc_id, lang,
             CAST(SUM(cnt) AS BIGINT) AS n_bg,
             COUNT(*) AS n_distinct,
             CAST(MAX(cnt) AS BIGINT) AS top_cnt
      FROM per_bigram GROUP BY doc_id, lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN top_cnt * 5 > n_bg THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repetitive,
           CAST(SUM(CAST(ROUND((n_bg - n_distinct) * 1000000.0 / n_bg)
                         AS BIGINT)) AS BIGINT) AS dup_ppm_total,
           CAST(SUM(CAST(ROUND(top_cnt * 1000000.0 / n_bg) AS BIGINT))
                AS BIGINT) AS top_ppm_total
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Repetition quality signals (the Gopher/C4 duplicate-n-gram "
    "filters): per document, the duplicate-bigram fraction "
    "(1 - distinct/total) and the top-bigram fraction (most frequent "
    "bigram's share), rolled up per language as flagged-doc counts "
    "(top bigram > 20% of the doc, tested as the exact integer "
    "cross-multiply top*5 > n) and ppm totals (each doc's fraction "
    "rounded to integer ppm BEFORE summing, so the sum is exact in "
    "any order). Plan: one bigram explode in the scan stage, a "
    "(doc, bigram) partial agg, a doc-level agg that rides the same "
    "hash partitioning (doc_id prefix), and a tiny per-language "
    "rollup. Nothing but counts shuffles; at 100 TB this is the "
    "standard two-level aggregation tree.",
    tags=("corpus", "quality"),
)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    bg = _bigrams(table(spark, sf_dir, "documents"))
    per_bigram = bg.groupBy("doc_id", "lang", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = per_bigram.groupBy("doc_id", "lang").agg(
        F.sum("cnt").cast("bigint").alias("n_bg"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").cast("bigint").alias("top_cnt"),
    )
    dup_ppm = F.round(
        (F.col("n_bg") - F.col("n_distinct")) * 1000000.0 / F.col("n_bg")
    ).cast("bigint")
    top_ppm = F.round(F.col("top_cnt") * 1000000.0 / F.col("n_bg")).cast("bigint")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("top_cnt") * 5 > F.col("n_bg"), 1).otherwise(0)
            ).cast("bigint").alias("n_repetitive"),
            F.sum(dup_ppm).cast("bigint").alias("dup_ppm_total"),
            F.sum(top_ppm).cast("bigint").alias("top_ppm_total"),
        )
        .orderBy("lang")
    )


@register(
    "corpus_split_assignment",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {_hash_unit_sql('doc_id')} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="Deterministic train/val/test assignment: md5(doc_id) mod 100 "
    "buckets 90/5/5 — the standard leakage-safe holdout split (the "
    "same document lands in the same split on any cluster, any run, "
    "any partitioning; no RNG state, no shuffle for the assignment "
    "itself). The audit reports docs and token totals per split and "
    "language — the table you check before training that the holdout "
    "is actually 5% and has every language in it. One scan, one "
    "small-domain aggregate.",
    tags=("corpus", "sampling"),
)
def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = _hash_unit_spark(F.col("doc_id")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"),
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("split", "lang")
    )


@register(
    "mixture_resample_audit",
    oracle="""
    WITH src AS (
      SELECT source,
             CASE WHEN length(source) <= 4 THEN 1 ELSE 2 END AS weight,
             CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                  AS BIGINT) AS tokens
      FROM documents
      GROUP BY source
    ),
    w AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w FROM src),
    feas AS (
      SELECT MIN(tokens * total_w // weight) AS feasible
      FROM src, w
    ),
    kept AS (
      SELECT source, weight, tokens,
             weight * feasible // total_w AS kept_tokens
      FROM src, w, feas
    )
    SELECT source,
           CAST(weight AS BIGINT) AS weight,
           tokens,
           CAST(kept_tokens AS BIGINT) AS kept_tokens,
           CAST(kept_tokens * 1000000 // tokens AS BIGINT) AS keep_rate_ppm
    FROM kept
    ORDER BY source
    """,
    doc="Mixture-weight resampling audit: given integer target weights "
    "per source (here 2x for long-named sources — the upweight-the-"
    "good-sources step), compute the largest total token budget that "
    "respects every source's supply without replacement "
    "(feasible = MIN over sources of tokens x W / weight), then each "
    "source's kept-token allocation and effective keep rate. Every "
    "step is exact integer arithmetic (DIV, cross-multiplies) — no "
    "float ever enters a decision, so the plan is bit-identical on "
    "both engines and at any scale. Plan: a 20-row per-source "
    "aggregate, two 1-row broadcast crosses (total weight, feasible "
    "min) — the fact is scanned once.",
    tags=("corpus", "sampling"),
)
def mixture_resample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    weight = F.when(F.length("source") <= 4, 1).otherwise(2)
    src = d.groupBy("source").agg(
        F.first(weight).alias("weight"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint"))
        .cast("bigint")
        .alias("tokens"),
    )
    # weight is a pure function of source, so first() is deterministic
    w = src.agg(F.sum("weight").cast("bigint").alias("total_w"))
    with_w = src.join(F.broadcast(w))
    feas = with_w.agg(
        F.min(F.expr("tokens * total_w div weight")).alias("feasible")
    )
    kept = with_w.join(F.broadcast(feas)).withColumn(
        "kept_tokens", F.expr("weight * feasible div total_w")
    )
    return kept.select(
        "source",
        F.col("weight").cast("bigint").alias("weight"),
        "tokens",
        F.col("kept_tokens").cast("bigint").alias("kept_tokens"),
        F.expr("kept_tokens * 1000000 div tokens").cast("bigint").alias(
            "keep_rate_ppm"
        ),
    ).orderBy("source")


@register(
    "tfidf_top_terms_per_doc",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    total AS (SELECT COUNT(*) AS n FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
             CAST(tf.tf * total.n AS DOUBLE) / df.df AS tfidf_score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf * total.n AS DOUBLE) / df.df DESC, tf.term
             ) AS rk
      FROM tf JOIN df USING (term), total
    )
    SELECT doc_id, term, tf, df, tfidf_score, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
    doc="Per-document TF-IDF signature terms: the 3 most characteristic "
    "unigrams per document by tf·N/df (the tf-idf ordering without the "
    "log — a single rational division of exact integers, so the ranking "
    "is bit-identical across engines; ln() last-ulp rounding is not). "
    "This is the per-doc counterpart of bigram_df_topk and the standard "
    "keyword-extraction / topic-tagging step of a corpus pipeline. "
    "Plan: one token explode feeding two partial-agg trees (per-doc tf; "
    "corpus df); the df/total sides are vocabulary-sized, so they "
    "broadcast into the tf frame; the ranking window partitions on "
    "doc_id — maximal parallelism, no global sort before the final "
    "presentation ORDER BY. At 100 TB the explode stays in the scan "
    "stage (map-side combine shrinks it before any shuffle).",
    tags=("corpus", "tfidf", "window"),
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    score = (F.col("tf") * F.col("n")).cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_score"), "term")
    ranked = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            score.alias("tfidf_score"),
        )
        .withColumn("rk", F.row_number().over(w))
    )
    return ranked.filter(F.col("rk") <= 3).orderBy("doc_id", "rk")


_SPANS8_SQL = """
    toks8 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    spans8 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                         || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' '
                         || t[i+6] || ' ' || t[i+7])) AS shingle
      FROM toks8 WHERE len(t) >= 8
    )
"""


def _spans8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle): one row per 8-gram START POSITION (not distinct
    — span coverage needs position multiplicity). Token array is
    materialized before the transform (Catalyst project-collapse would
    re-split per element otherwise)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t")).filter(
        F.size("t") >= 8
    )
    t = F.col("t")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(t) - 8),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(1, 9)]
        ),
    )
    return toks.select("doc_id", F.explode(shingles).alias("shingle"))


@register(
    "duplicate_span_profile",
    oracle=f"""
    WITH {_SPANS8_SQL},
    per_pair AS (
      SELECT doc_id, shingle, COUNT(*) AS n_pos
      FROM spans8 GROUP BY doc_id, shingle
    ),
    docs_per AS (
      SELECT shingle, COUNT(*) AS n_docs FROM per_pair GROUP BY shingle
    )
    SELECT p.doc_id,
           CAST(SUM(p.n_pos) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN d.n_docs >= 2 THEN p.n_pos ELSE 0 END) AS BIGINT)
             AS dup_spans,
           CAST((SUM(CASE WHEN d.n_docs >= 2 THEN p.n_pos ELSE 0 END) * 1000000)
                // SUM(p.n_pos) AS BIGINT) AS dup_ppm
    FROM per_pair p JOIN docs_per d ON p.shingle = d.shingle
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
    doc="Cross-document duplicated-span coverage (the substring-dedup "
    "diagnostic of Lee et al.'s 'Deduplicating Training Data' recipe): "
    "for every doc, the fraction of its 8-gram start positions whose "
    "span also occurs in at least one OTHER document — integer ppm. "
    "Docs with high dup_ppm are boilerplate/mirror candidates that "
    "MinHash (whole-doc grain) under-flags. Plan: spans collapse to "
    "(doc, shingle, n_pos) in one shingle-keyed exchange, the "
    "doc-frequency rollup reuses that partitioning, and the final "
    "per-doc aggregate moves counts only — raw text never shuffles "
    "twice; at 100 TB the join key becomes md5(shingle) to shrink "
    "shuffle width.",
    tags=("corpus", "dedup"),
)
def duplicate_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_pair = (
        _spans8(spark, sf_dir)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("n_pos"))
    )
    docs_per = per_pair.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.when(F.col("n_docs") >= 2, F.col("n_pos")).otherwise(F.lit(0))
    return (
        per_pair.join(docs_per, "shingle")
        .groupBy("doc_id")
        .agg(
            F.sum("n_pos").cast("bigint").alias("n_spans"),
            F.sum(dup).cast("bigint").alias("dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            F.expr("(dup_spans * 1000000) div n_spans")
            .cast("bigint")
            .alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


@register(
    "benchmark_decontamination",
    oracle=f"""
    WITH {_SPANS8_SQL},
    pair8 AS (SELECT DISTINCT doc_id, shingle FROM spans8),
    bench AS (
      SELECT DISTINCT shingle FROM pair8
      WHERE {_hash_unit_sql('doc_id')} % 25 = 0
    ),
    train AS (
      SELECT doc_id, shingle FROM pair8
      WHERE {_hash_unit_sql('doc_id')} % 25 != 0
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id
    ),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_shared
      FROM train t JOIN bench b ON t.shingle = b.shingle
      GROUP BY t.doc_id
    )
    SELECT h.doc_id, s.n_shingles, h.n_shared,
           CAST((h.n_shared * 1000000) // s.n_shingles AS BIGINT) AS leak_ppm
    FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    ORDER BY h.doc_id
    """,
    doc="Benchmark decontamination: a held-out 'benchmark' slice (4% of "
    "docs by md5 draw — stand-in for an eval suite) donates its "
    "distinct 8-gram spans; every TRAINING doc sharing at least one "
    "span is flagged with its shared-span count and leak fraction "
    "(ppm). This is the pre-training hygiene step that removes eval "
    "leakage before it inflates benchmark scores. Plan: the benchmark "
    "span set is tiny and BROADCAST, so the corpus-side scan is "
    "embarrassingly parallel — the only exchanges are the per-doc "
    "count rollups; corpus text never moves.",
    tags=("corpus", "contamination"),
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair8 = _spans8(spark, sf_dir).distinct()
    is_bench = (_hash_unit_spark(F.col("doc_id")) % 25) == 0
    bench = pair8.filter(is_bench).select("shingle").distinct()
    train = pair8.filter(~is_bench)
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.expr("(n_shared * 1000000) div n_shingles")
            .cast("bigint")
            .alias("leak_ppm"),
        )
        .orderBy("doc_id")
    )


_WEIGHTED_K = 64


@register(
    "weighted_sample_docs",
    oracle=f"""
    WITH prio AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  AS DOUBLE) / n_chars AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars
    FROM prio
    ORDER BY priority, doc_id
    LIMIT {_WEIGHTED_K}
    """,
    doc="Size-biased sampling: bottom-K by priority = hash_unit(doc_id) "
    "/ n_chars, so selection probability grows with document length — "
    "the deterministic analogue of weighted reservoir sampling "
    "(Efraimidis-Spirakis keys u^(1/w) need pow(), whose libm rounding "
    "differs across engines; the hash/w ratio keeps the draw monotone "
    "in w with ONE correctly-rounded IEEE division that both engines "
    "compute identically, and doc_id breaks any tie totally). Used to "
    "overweight long documents in a corpus mixture. Scale shape: "
    "per-row expression + TakeOrdered(K) — no shuffle beyond the "
    "top-K reduction.",
    tags=("corpus", "sampling"),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    priority = _hash_unit_spark(F.col("doc_id")).cast("double") / F.col("n_chars")
    return (
        d.select("doc_id", "source", "n_chars", priority.alias("__p"))
        .orderBy("__p", "doc_id")
        .limit(_WEIGHTED_K)
        .select("doc_id", "source", "n_chars")
    )


# outlier = per-doc mean bigram frequency below NUM/DEN of the corpus
# mean — relative, so the flag means the same thing at every corpus size
_FAM_NUM, _FAM_DEN = 19, 20


@register(
    "familiarity_outliers_by_source",
    oracle=f"""
    WITH {_BIGRAMS_CTE_SQL},
    gc AS (SELECT bigram, COUNT(*) AS gcount FROM bg GROUP BY bigram),
    per_doc AS (
      SELECT b.doc_id, COUNT(*) AS n_bg,
             CAST(SUM(gcount) AS BIGINT) AS fam
      FROM bg b JOIN gc USING (bigram)
      GROUP BY b.doc_id
    ),
    tot AS (
      SELECT CAST(SUM(fam) AS HUGEINT) AS tot_fam,
             CAST(SUM(n_bg) AS HUGEINT) AS tot_bg
      FROM per_doc
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN fam * tot_bg * {_FAM_DEN}
                           < tot_fam * n_bg * {_FAM_NUM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(fam) AS BIGINT) AS sum_familiarity,
           CAST(SUM(n_bg) AS BIGINT) AS sum_bigrams
    FROM per_doc p JOIN documents d USING (doc_id) CROSS JOIN tot
    GROUP BY d.source
    ORDER BY d.source
    """,
    doc="N-gram familiarity outlier detection — the log-free integer "
    "formulation of perplexity-style quality filtering (CCNet-shape): "
    "a document whose word bigrams are globally RARE (mean corpus "
    "frequency well below the corpus mean) is likely gibberish, "
    "boilerplate, or wrong-language — flag it. Two passes over the "
    "shared bigram definition: global bigram counts, then a "
    "bigram-keyed join back to per-doc sums; the corpus mean is a "
    "1-row broadcast. The threshold is RELATIVE (doc mean < 19/20 of "
    "corpus mean) so the flag is scale-invariant, and the comparison "
    "is an exact integer cross-multiply in decimal(38)/HUGEINT — a "
    "float log-prob or divided mean would hash-diverge across engines "
    "in the last ulp; the wide-integer compare cannot, up to the "
    "decimal(38,0) product bound (fam*tot_bg*20 < 1e38 — i.e. corpora "
    "to ~1e15 total bigrams with per-doc fam to ~1e18; beyond that "
    "non-ANSI Spark NULLs the product while DuckDB's HUGEINT keeps "
    "going, so the two engines would diverge — far past any real "
    "corpus, but a bound, not 'never'). Docs under 2 tokens carry no "
    "signal and are excluded by "
    "construction in both engines. Scale: two bigram-keyed partial-agg "
    "shuffles; no all-pairs anything.",
    tags=("text", "quality"),
    bench=True,
)
def familiarity_outliers_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bg = _bigrams(d)
    gc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("gcount"))
    per_doc = (
        bg.join(gc, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bg"),
            F.sum("gcount").alias("fam"),
        )
    )
    dec = "decimal(38,0)"
    tot = per_doc.agg(
        F.sum("fam").cast(dec).alias("tot_fam"),
        F.sum("n_bg").cast(dec).alias("tot_bg"),
    )
    is_out = (
        F.col("fam").cast(dec) * F.col("tot_bg") * _FAM_DEN
        < F.col("tot_fam") * F.col("n_bg").cast(dec) * _FAM_NUM
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(is_out.cast("bigint")).alias("n_outliers"),
            F.sum("fam").alias("sum_familiarity"),
            F.sum("n_bg").cast("bigint").alias("sum_bigrams"),
        )
        .orderBy("source")
    )
