"""CSV ingestion with encoding fallback (reference S1:
read_csv_with_multiple_encodings, /root/reference/python/import_data.py:8-21).

The reference tries utf-8 → latin1 → ISO-8859-1 → cp1252 with pandas.
Spark's CSV reader takes one encoding per read; the fallback loop lives
in the driver (cheap: a failed decode surfaces on the first action over
a small sample). All-string schema-on-read matches the reference's
staging semantics (every staging column VARCHAR, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_ENCODINGS = ("UTF-8", "latin1", "ISO-8859-1", "cp1252")


def read_csv_with_encodings(
    spark: SparkSession,
    path: str,
    encodings: tuple[str, ...] = DEFAULT_ENCODINGS,
    header: bool = True,
) -> DataFrame:
    """Read a CSV trying each encoding until one decodes cleanly.

    A decode failure with the wrong charset shows up as U+FFFD
    replacement chars (Spark substitutes rather than throwing), so we
    probe a sample for them and fall through to the next encoding.
    """
    last_err: Exception | None = None
    for enc in encodings:
        try:
            df = (
                spark.read.option("header", str(header).lower())
                .option("encoding", enc)
                .option("inferSchema", "false")
                .csv(path)
            )
            # one Spark job per encoding attempt: a single aggregate over
            # an OR of per-column contains() checks (vs the old
            # count-per-column loop = up to |cols| jobs)
            any_bad = F.lit(False)
            for c in df.columns:
                any_bad = any_bad | F.coalesce(
                    F.col(c).contains("�"), F.lit(False)
                )
            bad = (
                df.limit(1000)
                .select(F.max(any_bad.cast("int")).alias("bad"))
                .collect()[0]["bad"]
            )
            if not bad:
                return df
            last_err = UnicodeDecodeError(
                enc, b"", 0, 1, "replacement characters in decoded sample"
            )
        except Exception as e:  # noqa: BLE001 — try next encoding
            last_err = e
    raise ValueError(f"no encoding of {encodings} decodes {path}") from last_err
