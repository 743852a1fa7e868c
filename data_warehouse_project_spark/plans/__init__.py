"""Query plans: the engine's analytics surface.

Importing this package populates ``QUERIES`` — each entry is a Spark
DataFrame program plus (usually) a DuckDB-executable ANSI-SQL oracle.
"""

from data_warehouse_project_spark.plans.queries import QUERIES, Query  # noqa: F401

# Submodules self-register into QUERIES on import.
from data_warehouse_project_spark.plans import (  # noqa: F401,E402
    analytics,
    asof,
    corpus,
    curation,
    dates,
    extensions,
    graph,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    scd,
    stats,
    text,
    timeseries,
    timeseries2,
    vectors,
)
