"""Unit tests for PG-parity scalar helpers (SURVEY.md §2.7 gaps F3/F7/F8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.functions import (
    cents,
    currency_to_decimal,
    initcap_pg,
    money,
    split_part,
    to_date_mdy,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_initcap_pg_word_boundaries(spark):
    # PG INITCAP capitalizes after ANY non-alphanumeric; Spark's builtin
    # only after whitespace. The reference relies on PG semantics (F3).
    df = spark.createDataFrame(
        [("o'brien",), ("new york",), ("SAN-FRANCISCO",), ("éa b",), ("a1b c",)],
        ["s"],
    )
    got = [r["out"] for r in df.select(initcap_pg("s").alias("out")).collect()]
    assert got[0] == "O'Brien"
    assert got[1] == "New York"
    assert got[2] == "San-Francisco"
    # non-ascii letters pass through the [a-z0-9] tokenizer as separators
    assert got[4] == "A1b C"


def test_split_part_missing_returns_empty(spark):
    df = spark.createDataFrame([("John Smith",), ("Cher",), ("A B C",)], ["name"])
    out = df.select(
        split_part("name", " ", 1).alias("first"),
        split_part("name", " ", 2).alias("last"),
    ).collect()
    assert (out[0]["first"], out[0]["last"]) == ("John", "Smith")
    assert (out[1]["first"], out[1]["last"]) == ("Cher", "")  # PG: '' not NULL
    assert (out[2]["first"], out[2]["last"]) == ("A", "B")


def test_to_date_mdy_tolerates_one_digit(spark):
    df = spark.createDataFrame([("1/7/2020",), ("12/31/1999",)], ["d"])
    out = [str(r["out"]) for r in df.select(to_date_mdy("d").alias("out")).collect()]
    assert out == ["2020-01-07", "1999-12-31"]


def test_currency_to_decimal(spark):
    df = spark.createDataFrame([("$1,234.50",), ("$6.62 ",), ("7.00",)], ["p"])
    out = [r["out"] for r in df.select(currency_to_decimal("p").alias("out")).collect()]
    assert [str(v) for v in out] == ["1234.50", "6.62", "7.00"]


def test_cents_money_roundtrip(spark):
    df = spark.createDataFrame([(68423.46,), (0.01,), (19389415.25,)], ["x"])
    out = df.select(money(cents("x")).alias("out")).collect()
    assert [r["out"] for r in out] == [68423.46, 0.01, 19389415.25]


def test_round6_bit_identical_across_engines(spark):
    """functions.vectors.round6 vs its SQL twin on adversarial doubles
    sitting within 1 ulp of .5e-6 rounding boundaries — the exact class
    where engine-native ROUND(x, 6) disagrees between Spark and DuckDB
    (measured 249/20000). round6 must match bitwise on every input."""
    import math
    import duckdb

    from data_warehouse_project_spark.functions.vectors import round6, round6_sql

    vals = []
    for k in range(-50, 51):
        center = (k + 0.5) / 1e6
        for delta in (-2, -1, 0, 1, 2):
            v = center
            for _ in range(abs(delta)):
                v = math.nextafter(v, math.copysign(math.inf, delta))
            vals.append(v)
    vals += [0.0, -0.9999995, 0.1234565, -1.0, 1.0, 0.13285349999999999]

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["y"] for r in df.select(round6(F.col("x")).alias("y")).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = [r[0] for r in con.execute(
        f"SELECT {round6_sql('x')} FROM t"
    ).fetchall()]

    assert len(got) == len(want) == len(vals)
    for v, g, w in zip(vals, got, want):
        assert g == w and math.copysign(1, g) == math.copysign(1, w), (
            v, g.hex(), w.hex()
        )
