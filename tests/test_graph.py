"""PageRank driver: determinism, mass conservation, hub ordering, and
single-step consistency with the oracle-checked ``pagerank_update_step``
query."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.plans.graph import pagerank
from data_warehouse_project_spark.plans.queries import QUERIES
from tests.conftest import SF_SMOKE

# Star-plus-chain graph: node 1 is a hub (3 in-links), 5 is mid, 6 leaf.
EDGES = [(2, 1), (3, 1), (4, 1), (2, 5), (5, 6)]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src bigint, dst bigint")


def test_pagerank_hub_ranks_highest(spark):
    ranks = {
        r.node: r.rank_ppb
        for r in pagerank(_edges_df(spark), n_iters=5).collect()
    }
    assert len(ranks) == 6
    # hub > mid-chain > dangling-with-no-inlinks
    assert ranks[1] > ranks[5] > ranks[2]
    # total mass never exceeds 1e9 (integer truncation only leaks down)
    assert sum(ranks.values()) <= 1_000_000_000


def test_pagerank_bit_identical_reruns(spark):
    a = sorted(map(tuple, pagerank(_edges_df(spark), n_iters=4).collect()))
    b = sorted(
        map(
            tuple,
            pagerank(
                _edges_df(spark).repartition(7), n_iters=4
            ).collect(),
        )
    )
    assert a == b


def test_pagerank_single_step_matches_query(spark):
    """pagerank(n_iters=1) on the purchase graph must agree with the
    oracle-checked single-step query for every supplier node."""
    q = QUERIES["pagerank_update_step"].fn(spark, SF_SMOKE)
    expected = {r.suppkey: r.new_rank_ppb for r in q.collect()}

    # Namespace the ids: custkeys and suppkeys overlap numerically but
    # are distinct nodes of the bipartite graph.
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", F.concat(F.lit("c"), F.col("o_custkey")).alias("src")
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey).select("src", "dst").distinct()
    )
    got = {
        r.node: r.rank_ppb for r in pagerank(edges, n_iters=1).collect()
    }
    for suppkey, rank in expected.items():
        assert got[f"s{suppkey}"] == rank


def test_connected_components_raises_on_iteration_cap(spark):
    """A chain longer than max_iters must raise, not silently return
    split clusters."""
    import pytest
    from data_warehouse_project_spark.plans.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)
    # and with enough rounds the same chain converges to one component
    comps = connected_components(edges, max_iters=10)
    assert comps.select("component").distinct().count() == 1
