"""Declarative data-quality checks (the dbt-tests / Great-Expectations
shape) compiled to minimal Spark plans.

Row-local rules (not_null, accepted_values, expression) compile into a
SINGLE conditional-aggregation pass over the table — one scan, one
1-row result, regardless of how many rules there are. Set rules cost
what they must: ``unique`` is one groupBy on the key, ``fk`` is one
left-anti against the referenced keys (broadcast when small). Nothing
collects rows to the driver; violation SAMPLES are a separate bounded
query (``violation_sample``) you run only on rules that failed.

The reference hand-rolls these checks in its test harness
(dw_etl_tests.py: row-count / default-row / orphan-key assertions);
this operator is that harness as a reusable, composable surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_warehouse_project_spark.localframe import local_rows


@dataclass(frozen=True)
class Rule:
    """One check. ``kind`` ∈ {not_null, accepted_values, expression,
    unique, fk}. Row-local kinds use ``column``/``values``/``expr``;
    ``unique`` uses ``columns``; ``fk`` uses ``columns`` + ``ref`` (a
    DataFrame) + ``ref_columns``."""

    name: str
    kind: str
    column: str | None = None
    values: tuple = ()
    expr: str | None = None
    columns: tuple = ()
    ref: DataFrame | None = None
    ref_columns: tuple = ()
    ignore_nulls: bool = field(default=True)


def _violation_cond(rule: Rule) -> Column:
    if rule.kind == "not_null":
        return F.col(rule.column).isNull()
    if rule.kind == "accepted_values":
        bad = ~F.col(rule.column).isin(*rule.values)
        if rule.ignore_nulls:
            return F.col(rule.column).isNotNull() & bad
        # NULL is outside any accepted set: count it explicitly — a bare
        # ~isin() is NULL for NULL input and the aggregation's when()
        # would silently treat it as a pass
        return F.col(rule.column).isNull() | bad
    if rule.kind == "expression":
        # rule passes when expr is true; null counts as a violation
        return ~F.coalesce(F.expr(rule.expr), F.lit(False))
    raise ValueError(f"{rule.kind} is not a row-local rule")


_KNOWN_KINDS = ("not_null", "accepted_values", "expression", "unique", "fk")


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule_name, kind, n_violations).

    Unknown kinds raise immediately (a typo'd rule must not silently
    count as passed); an empty rule list returns an empty result frame
    with the output schema."""
    spark = df.sparkSession
    for r in rules:
        if r.kind not in _KNOWN_KINDS:
            raise ValueError(f"rule {r.name!r}: unknown kind {r.kind!r}; "
                             f"expected one of {_KNOWN_KINDS}")
    if not rules:
        return local_rows(
            spark, [], "rule_name string, kind string, n_violations bigint"
        )
    row_local = [r for r in rules if r.kind in ("not_null", "accepted_values", "expression")]
    results: list[DataFrame] = []

    if row_local:
        aggs = [
            F.sum(F.when(_violation_cond(r), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__q{i}")
            for i, r in enumerate(row_local)
        ]
        wide = df.agg(*aggs)
        # unpivot the 1-row frame: n_rules columns → n_rules rows. Rule
        # names/kinds enter stack() as escaped string literals and the
        # value refs are the internal __qN aliases — a rule name with
        # spaces, quotes, or backticks cannot break the SQL
        def _lit(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        stack = ", ".join(
            f"{_lit(r.name)}, {_lit(r.kind)}, __q{i}"
            for i, r in enumerate(row_local)
        )
        results.append(
            wide.selectExpr(
                f"stack({len(row_local)}, {stack}) "
                "AS (rule_name, kind, n_violations)"
            )
        )

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.columns)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations")
                )
            )
            results.append(
                dup.select(
                    F.lit(r.name).alias("rule_name"),
                    F.lit("unique").alias("kind"),
                    "n_violations",
                )
            )
        elif r.kind == "fk":
            # SQL FK semantics: rows with any NULL key column pass
            cond = F.lit(True)
            for c in r.columns:
                cond = cond & F.col(c).isNotNull()
            keys = df.select(*r.columns).filter(cond)
            ref = r.ref.select(
                *[F.col(rc).alias(c) for c, rc in zip(r.columns, r.ref_columns)]
            ).distinct()
            # no forced broadcast: referenced key sets scale with the data,
            # AQE converts the anti-join when the distinct keys are small
            orphans = keys.join(ref, on=list(r.columns), how="left_anti")
            results.append(
                orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
                    F.lit(r.name).alias("rule_name"),
                    F.lit("fk").alias("kind"),
                    "n_violations",
                )
            )

    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out


def violation_sample(df: DataFrame, rule: Rule, limit: int = 10) -> DataFrame:
    """Up to ``limit`` offending rows for a row-local rule — run only
    after ``run_checks`` reports a failure (bounded output)."""
    return df.filter(_violation_cond(rule)).limit(limit)
