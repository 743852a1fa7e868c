"""JSONL (JSON-lines) corpus ingestion — the de-facto interchange
format for training-data pipelines (one document object per line).

Spark's native JSON reader is already line-oriented, distributed, and
schema-pruning; what a curation pipeline adds on top is (a) an explicit
schema so a single malformed producer can't silently widen columns to
string, (b) PERMISSIVE corrupt-record capture so bad lines are
quarantined instead of killing a 100 TB backfill, and (c) a normalized
landing projection matching the warehouse ``documents`` shape.

At scale: JSONL splits by newline, so a directory of .jsonl files
parallelizes like any text source; the explicit schema keeps Jackson
from double-scanning for inference (inference reads EVERY byte twice).
Compressed inputs (.gz) are fine but non-splittable — one task per
file — so the loader accepts many small files rather than one giant
archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document corpus → (clean, quarantined) frames.

    Clean rows get the warehouse ``documents`` projection with a
    computed ``n_chars``. The quarantine frame carries (raw_line,
    reason) and catches BOTH failure classes: lines Jackson couldn't
    parse (reason ``parse``, raw line preserved verbatim) and
    well-formed objects violating the document contract — null/missing
    doc_id or text (reason ``contract``, the parsed fields re-serialized
    for replay). Without the second class a producer that stops
    emitting doc_id would lose its whole output with no accounting.
    The split is one pass: Spark populates ``_corrupt_record`` only
    for bad lines, so the routing is null checks, not a re-parse.
    """
    raw = (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    contract_ok = F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    clean = (
        raw.filter(F.col(CORRUPT_COL).isNull())
        .drop(CORRUPT_COL)
        .filter(contract_ok)
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    # One quarantine scan for both failure classes. The coalesce's
    # second branch references real data columns, which (verified on
    # Spark 4.1) lifts the corrupt-column-only query restriction
    # (SPARK-21610) — so no .cache() pinning the raw input for the
    # session lifetime; at backfill scale a second scan of the files
    # beats caching them.
    quarantined = raw.filter(
        F.col(CORRUPT_COL).isNotNull() | ~contract_ok
    ).select(
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct("doc_id", "text", "lang", "source")),
        ).alias("raw_line"),
        F.when(F.col(CORRUPT_COL).isNotNull(), "parse")
        .otherwise("contract")
        .alias("reason"),
    )
    return clean, quarantined


def write_documents_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a documents frame back out as JSONL (one object per line,
    one file per partition) — the export half of the interchange."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
