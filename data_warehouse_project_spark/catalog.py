"""Table catalog for the driver-provided TPC-H-ish parquet test tables.

The engine treats a scale-factor directory as a database: each table is
one parquet file (TESTDATA.md). Reads go through here so every query
benefits from a single place to attach schema expectations, and so a
future move to a real catalog (Hive metastore / Delta / Iceberg) is a
one-file change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Parquet scan → column pruning + predicate
    pushdown are automatic once the caller selects/filters.

    ``events.ts`` has shipped in two physical formats across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader surfaces as raw nanos under legacy long mode) and plain
    ``timestamp[us]``. We branch on the dtype actually read: a LongType
    column is nanos and gets converted to a microsecond timestamp
    (floor division — matches DuckDB's ns→us truncation); a native
    timestamp column passes through untouched.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # ENGINE CONTRACT: the session timezone is pinned to UTC on first
    # table read. This is load-bearing for cross-engine determinism —
    # every timestamp→date cast in the query surface must agree with
    # the timezone-naive DuckDB oracle, in FOREIGN sessions too (the
    # correctness driver builds its own default-config session). A
    # caller needing a different session TZ must not share a session
    # with this engine. Preset in session.get_spark, so for engine
    # sessions this check-then-set is a read-only no-op (safe under
    # concurrency); it fires once for foreign sessions.
    # (no string default here: Spark 4 validates conf.get's default as a
    # timezone; timeZone always has a session value to read)
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # nanosAsLong is scoped to the one table that needs it (legacy
        # TIMESTAMP(NANOS) testdata) instead of being flipped for every
        # read — foreign sessions' other parquet sources keep their
        # native nanos handling.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Legacy testdata: TIMESTAMP(NANOS) read as raw int64 nanos.
            # FLOOR division in exact integer arithmetic: `div` alone
            # truncates toward zero (pre-epoch nanos would land 1us
            # high), and a double-precision divide would wobble at
            # int64 magnitudes (~1.7e18 > 2^53) — so floor the
            # remainder first, then exact integer-divide.
            return df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr("(ts - pmod(ts, 1000)) div 1000")
                ),
            )
        if isinstance(ts_type, TimestampNTZType):
            # timestamp[us] without timezone → normalize to TimestampType
            # so every consumer sees one dtype across testdata
            # generations. Session TZ is UTC, so this is a pure
            # wall-clock reinterpretation (value-identical to the
            # legacy nanos path).
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so ``spark.sql`` works directly."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
