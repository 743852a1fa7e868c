"""Property-based Misra-Gries fold tests (hypothesis): for ANY op-log
of insert/delete batches over a skewed value domain, the maintained
topk_approx state must keep its invariants after every incremental
fold (r14 — the bounded-operand fold of txview._mg_window_delta):

  never over-count:      est(v) <= true(v) for every register
  widened delete bound:  true(v) <= est(v) + err_g + deleted_g
  bounded state:         <= m registers per group
  bounded err:           err_g <= inserted_weight(g) / (m + 1)
  drift accounting:      deleted_g == non-null delete weight applied

The generators bias toward the hard regimes: value domains larger
than m (forcing window pre-compression), repeated heavy values, and
delete batches that clamp registers (including full kills).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.sources.txview import TxAggView

M = 4  # tiny register budget: every example exercises compression
SCHEMA = "oid long, g long, v string"

# a batch is either an insert wave (list of (value, count)) or a
# delete predicate choice; values from a domain of 12 >> m = 4
VALUES = [f"v{i}" for i in range(12)]
insert_batch = st.lists(
    st.tuples(st.sampled_from(VALUES), st.integers(1, 6)),
    min_size=1, max_size=5,
).map(lambda counts: ("ins", counts))
delete_batch = st.sampled_from(VALUES).map(lambda v: ("del", v))
oplog_strategy = st.lists(
    st.one_of(insert_batch, insert_batch, delete_batch),
    min_size=2, max_size=5,
)

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(oplog=oplog_strategy)
def test_mg_invariants_hold_for_any_oplog(tmp_path_factory, oplog):
    spark = _spark
    tmp = tmp_path_factory.mktemp("mgprop")
    fact = TxTable.create(
        spark, tmp / "f",
        spark.createDataFrame([(0, 0, "v0"), (1, 0, "v1")], SCHEMA),
        key="oid",
    )
    view = TxAggView.create(
        spark, tmp / "v", fact, group_col="g",
        measures={"top": {"fn": "topk_approx", "expr": "v", "k": 2,
                          "m": M}},
    )
    oid = 100
    inserted = 2
    deleted_true = 0
    live: dict[str, int] = {"v0": 1, "v1": 1}
    for kind, payload in oplog:
        if kind == "ins":
            rows = []
            for v, c in payload:
                for _ in range(c):
                    rows.append((oid, 0, v))
                    oid += 1
                live[v] = live.get(v, 0) + c
                inserted += c
            fact.append(spark.createDataFrame(rows, SCHEMA))
        else:
            gone = live.pop(payload, 0)
            if gone == 0:
                continue  # delete matches nothing: no commit
            deleted_true += gone
            fact.delete(F.col("v") == payload, mode="dv")
        r = view.refresh(mode="incremental")
        assert not r["skipped"], r
        row = view.table.read().select(
            "__a_top", "__ae_top", "__ad_top"
        ).first()
        regs, err, dele = row["__a_top"], row["__ae_top"], row["__ad_top"]
        assert len(regs) <= M
        assert err <= inserted / (M + 1), (err, inserted)
        assert dele == deleted_true, (dele, deleted_true)
        for v, est in regs.items():
            t = live.get(v, 0)
            assert est <= t, (v, est, t)
            assert t <= est + err + dele, (v, est, t, err, dele)
        # every value heavier than the full bound must be registered
        for v, t in live.items():
            if t > err + dele:
                assert v in regs, (v, t, err, dele, dict(regs))
