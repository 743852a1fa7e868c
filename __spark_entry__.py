"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions) as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-executable ANSI-SQL twin for each.
Implementations live in ``data_warehouse_project_spark/plans/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:  # tolerate any driver cwd
    sys.path.insert(0, _REPO)

from data_warehouse_project_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: sales by product brand
    (fact ⋈ broadcast dim → group → order)."""
    return QUERIES["q2_sales_by_brand"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
