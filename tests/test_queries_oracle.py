"""Every registered query must match its DuckDB oracle at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from data_warehouse_project_spark.plans import QUERIES
from tests.conftest import SF_SMOKE
from tools.parity import compare, df_rows_duck


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_SMOKE)
    if q.oracle is None:
        assert sdf.count() >= 0  # rows-only check (driver does the same)
        return
    cur = duck.execute(q.oracle)
    cols = [d[0] for d in cur.description]
    problems = compare(sdf, cols, df_rows_duck(cur))
    assert not problems, f"{name}: " + "; ".join(problems[:5])


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["brand", "n_sales", "revenue"]
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30


def test_approx_distinct_within_error(spark):
    """approx_count_distinct (rsd=2%) must land within 5% of exact — the
    query emits the bound as the oracle-pinned approx_within_5pct flag."""
    rows = QUERIES["approx_distinct_profile"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["approx_within_5pct"] is True, r
        assert r["n_customers_exact"] > 0
