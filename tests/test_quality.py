"""Declarative data-quality checks: every rule kind, the single-pass
plan property for row-local rules, and bounded violation samples."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.operators.quality import (
    Rule,
    run_checks,
    violation_sample,
)
from tests.conftest import SF_SMOKE


def _by_name(df):
    return {r["rule_name"]: r["n_violations"] for r in df.collect()}


def test_clean_table_passes_all(spark):
    nation = table(spark, SF_SMOKE, "nation")
    region = table(spark, SF_SMOKE, "region")
    got = _by_name(
        run_checks(
            nation,
            [
                Rule("name_not_null", "not_null", column="n_name"),
                Rule("key_unique", "unique", columns=("n_nationkey",)),
                Rule(
                    "region_fk",
                    "fk",
                    columns=("n_regionkey",),
                    ref=region,
                    ref_columns=("r_regionkey",),
                ),
                Rule("key_nonneg", "expression", expr="n_nationkey >= 0"),
            ],
        )
    )
    assert got == {
        "name_not_null": 0,
        "key_unique": 0,
        "region_fk": 0,
        "key_nonneg": 0,
    }


def test_violations_are_counted_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "b", -5),
            (2, None, 3),
            (3, "zz", None),
            (3, "a", 7),
            (3, "a", 8),
        ],
        "id int, code string, val int",
    )
    ref = spark.createDataFrame([(1,), (2,)], "id int")
    got = _by_name(
        run_checks(
            df,
            [
                Rule("code_not_null", "not_null", column="code"),
                Rule(
                    "code_accepted", "accepted_values", column="code", values=("a", "b")
                ),
                Rule("val_positive", "expression", expr="val > 0"),
                Rule("id_unique", "unique", columns=("id",)),
                Rule("id_fk", "fk", columns=("id",), ref=ref, ref_columns=("id",)),
            ],
        )
    )
    assert got["code_not_null"] == 1
    assert got["code_accepted"] == 1  # 'zz' (null ignored)
    assert got["val_positive"] == 2  # -5 and the NULL
    assert got["id_unique"] == 3  # one extra id=1 row + two extra id=3 rows
    assert got["id_fk"] == 3  # the three id=3 rows


def test_row_local_rules_are_one_scan(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    checks = run_checks(
        li,
        [
            Rule("qty_not_null", "not_null", column="l_quantity"),
            Rule(
                "flag_accepted",
                "accepted_values",
                column="l_returnflag",
                values=("A", "N", "R"),
            ),
            Rule("price_positive", "expression", expr="l_extendedprice > 0"),
        ],
    )
    plan = checks._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert _by_name(checks)["qty_not_null"] == 0


def test_violation_sample_is_bounded(spark):
    df = spark.createDataFrame([(i, None) for i in range(100)], "id int, code string")
    rule = Rule("code_not_null", "not_null", column="code")
    assert violation_sample(df, rule, limit=7).count() == 7


def test_null_fk_keys_pass(spark):
    df = spark.createDataFrame([(None,), (1,), (9,)], "rid int")
    ref = spark.createDataFrame([(1,), (2,)], "rid int")
    got = _by_name(
        run_checks(
            df, [Rule("rid_fk", "fk", columns=("rid",), ref=ref, ref_columns=("rid",))]
        )
    )
    assert got["rid_fk"] == 1  # only the 9; NULL passes per SQL semantics


def test_accepted_values_null_handling_both_modes(spark):
    df = spark.createDataFrame(
        [("A",), ("B",), (None,), ("X",)], "status string"
    )
    lenient = Rule("vals", "accepted_values", column="status", values=("A", "B"))
    strict = Rule(
        "vals", "accepted_values", column="status", values=("A", "B"),
        ignore_nulls=False,
    )
    assert run_checks(df, [lenient]).first()["n_violations"] == 1  # just X
    # NULL is outside any accepted set when ignore_nulls=False
    assert run_checks(df, [strict]).first()["n_violations"] == 2


def test_unknown_kind_raises_and_empty_rules_ok(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError, match="unknown kind"):
        run_checks(df, [Rule("pk", "uniqueness", columns=("id",))])
    out = run_checks(df, [])
    assert out.count() == 0
    assert out.columns == ["rule_name", "kind", "n_violations"]


def test_rule_names_with_spaces_and_quotes(spark):
    df = spark.createDataFrame([(1,), (None,)], "id bigint")
    rules = [
        Rule("not null check", "not_null", column="id"),
        Rule("bob's rule", "not_null", column="id"),
    ]
    got = {r["rule_name"]: r["n_violations"] for r in run_checks(df, rules).collect()}
    assert got == {"not null check": 1, "bob's rule": 1}
