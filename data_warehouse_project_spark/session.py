"""SparkSession factory with scale-appropriate defaults.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real
cluster the same code runs unchanged — only master/deploy config moves
to ``spark-submit``. Every setting below is chosen for the 100 TB /
1000-executor target and merely *also* works locally:

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast conversion replace hand-tuned
  partition counts at scale.
- UTC session timezone: deterministic date/time semantics across
  engines (the DuckDB correctness oracle runs timezone-naive).
- Arrow enabled: any Pandas-UDF path moves columnar batches, not
  pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dwp-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # shuffle partitions: sized to cores locally; AQE coalesces down,
        # and at cluster scale this is overridden to ~2-3x total cores.
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Some testdata generations ship events.parquet as TIMESTAMP(NANOS),
        # which the vectorized reader rejects; read nanos as long
        # session-wide (harmless for timestamp[us] data — catalog.table
        # branches on the dtype actually read). Set once here so table()
        # stays read-only on session state (safe under concurrency).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python data sources (sources/txbatch.py) prune files against
        # manifest stats from Catalyst's pushed filters; off by default
        # in Spark 4.1. Runtime-settable, so sessions built elsewhere
        # (the correctness driver's plain session) can enable it late.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # keep order_month=yyyyMM partition values as strings on read:
        # type inference would flip them to INT and break the (stringly
        # monotonic) watermark comparisons against date_format output
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # container niceties: avoid slow reverse-DNS + blocking entropy reads
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.security.egd=file:/dev/./urandom",
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
