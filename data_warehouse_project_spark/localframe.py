"""Single-partition driver-local DataFrames (r14, optimization guide
§4.4/§2.1 — don't pay a Python-worker fan-out for driver-side rows).

``SparkSession.createDataFrame(<list>)`` parallelizes the rows into
``defaultParallelism`` Python-RDD slices, so EVERY action that touches
the frame (a write, a broadcast build, a collect — including actions on
frames merely derived from it) launches one Python worker per slice.
At ``local[32]`` that is ~5 s of fixed latency per action for a
one-row frame; the same rows in exactly one slice cost ~0.3 s
(measured, r14). Engine-local rows are always tiny — default rows,
probe keys, manifest ranges, buffered log lines — so one partition is
categorically right, and empty frames need zero partitions (no tasks,
no workers at all).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_rows(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the Python
    fan-out: the rows land in ONE RDD slice (or an empty,
    zero-partition RDD), so an action touching the frame pays for at
    most one Python worker instead of ``defaultParallelism``. Row →
    schema conversion is the stock createDataFrame path; only the
    slicing changes."""
    rows = rows if isinstance(rows, list) else list(rows)
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not rows:
        return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
