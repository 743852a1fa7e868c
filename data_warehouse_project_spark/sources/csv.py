"""CSV ingestion with encoding fallback (reference S1:
read_csv_with_multiple_encodings, /root/reference/python/import_data.py:8-21).

The reference tries utf-8 → latin1 → ISO-8859-1 → cp1252 with pandas.
Spark 4's CSV reader WHITELISTS charsets (iso-8859-1, us-ascii,
utf-8/16/32 only — "latin1" and "cp1252" are rejected outright), so the
same candidate set needs engine work, not just a loop:

- "latin1" is the same charset as ISO-8859-1 → one attempt;
- cp1252 is decoded by reading ISO-8859-1 (a byte-preserving 1:1 map
  into U+0000-U+00FF) and then transcoding the 0x80-0x9F range — the
  only place cp1252 differs — with a per-character ``translate``.
  cp1252's five undefined bytes map to U+FFFD, which the probe already
  treats as a decode failure.

cp1252 is tried BEFORE ISO-8859-1: latin1 accepts every byte (it can
never fail the probe), so anything after it is unreachable, and a
genuine cp1252 file (smart quotes, em-dashes in 0x80-0x9F) would be
silently mis-decoded into C1 control characters. cp1252 is a strict
superset of latin1's printable range, so trying it first loses nothing.

All-string schema-on-read matches the reference's staging semantics
(every staging column VARCHAR, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_ENCODINGS = ("UTF-8", "cp1252", "ISO-8859-1")

# the 32 code points where cp1252 differs from latin1: ISO-8859-1 maps
# bytes 0x80-0x9F to C1 controls; cp1252 maps them to glyphs (euro,
# smart quotes, dashes, ...) with five positions undefined (→ U+FFFD)
_C1_FROM = "".join(chr(i) for i in range(0x80, 0xA0))
_CP1252_TO = bytes(range(0x80, 0xA0)).decode("cp1252", errors="replace")


def _canonical(enc: str) -> str:
    e = enc.strip().lower().replace("_", "-")
    if e in ("latin1", "latin-1", "iso-8859-1", "iso8859-1"):
        return "ISO-8859-1"
    if e in ("cp1252", "windows-1252", "cp-1252"):
        return "cp1252"
    return enc


def _quoted(c: str) -> str:
    # a raw header like "price.usd" would otherwise parse as a
    # nested-field reference and make a valid file unreadable
    return f"`{c.replace('`', '``')}`"


def _read_one(spark: SparkSession, path: str, enc: str, header: bool) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "false")
    )
    if enc == "cp1252":
        df = reader.option("encoding", "ISO-8859-1").csv(path)
        # transcode latin1's C1 range to the cp1252 glyphs cell-wise.
        # (Header NAMES keep the byte-preserving latin1 form — renaming
        # columns per-file would make downstream schemas input-dependent.)
        return df.select(
            [
                F.translate(F.col(_quoted(c)), _C1_FROM, _CP1252_TO).alias(c)
                for c in df.columns
            ]
        )
    return reader.option("encoding", enc).csv(path)


def read_csv_with_encodings(
    spark: SparkSession,
    path: str,
    encodings: tuple[str, ...] = DEFAULT_ENCODINGS,
    header: bool = True,
) -> DataFrame:
    """Read a CSV trying each encoding until one decodes cleanly.

    A decode failure shows up as U+FFFD replacement chars (Spark
    substitutes rather than throwing; the cp1252 transcode maps its
    undefined bytes to U+FFFD the same way), so we probe a sample for
    them and fall through to the next encoding.
    """
    tried: list[str] = []
    last_err: Exception | None = None
    for enc in dict.fromkeys(_canonical(e) for e in encodings):
        tried.append(enc)
        try:
            df = _read_one(spark, path, enc, header)
            # one Spark job per encoding attempt: a single aggregate over
            # an OR of per-column contains() checks (vs the old
            # count-per-column loop = up to |cols| jobs)
            any_bad = F.lit(False)
            for c in df.columns:
                any_bad = any_bad | F.coalesce(
                    F.col(_quoted(c)).contains("�"), F.lit(False)
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
    raise ValueError(f"no encoding of {tuple(tried)} decodes {path}") from last_err
