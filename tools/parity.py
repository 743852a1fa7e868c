"""Spark-vs-DuckDB parity checker — a local replica of the driver's
correctness gate (row count + schema + order-insensitive value compare),
usable standalone:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
import sys

_REPO = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:  # tolerate any caller cwd (gates must not
    sys.path.insert(0, _REPO)  # silently run against a stale install)
from collections import Counter

import duckdb


def _canon(v):
    """Canonicalize a cell as a (type-tag, value) pair.

    The tag keeps the comparison dtype-sensitive the way the driver's
    hash is: BIGINT 1 vs VARCHAR '1' (or SQL NULL vs the string
    'NULL') must NOT compare equal here and then diverge in the
    driver. Tags are strings and compare before values, so sorting
    stays total even when a column mixes NULLs with values."""
    if v is None:
        return ("null", "")
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", repr(v))  # full precision
    if isinstance(v, _dt.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, _decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon(x) for x in v))
    return (type(v).__name__, str(v))


def df_rows_spark(df):
    return [[_canon(v) for v in row] for row in df.collect()]


def df_rows_duck(cur):
    return [[_canon(v) for v in row] for row in cur.fetchall()]


def compare(spark_df, duck_cols, duck_rows) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems = []
    s_cols = list(spark_df.columns)
    # duplicate names would silently map every copy to the first
    # occurrence in the reorder below — refuse instead of mis-comparing
    for side, cols in (("spark", s_cols), ("duck", duck_cols)):
        if len(set(cols)) != len(cols):
            problems.append(f"duplicate column names on {side} side: {cols}")
            return problems
    if sorted(s_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(duck_cols)}")
        return problems
    s_rows = df_rows_spark(spark_df)
    # reorder duck columns to spark order
    idx = [duck_cols.index(c) for c in s_cols]
    d_rows = [[r[i] for i in idx] for r in duck_rows]
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sc = Counter(map(tuple, s_rows))
    dc = Counter(map(tuple, d_rows))
    if sc != dc:
        only_s = list((sc - dc).elements())
        only_d = list((dc - sc).elements())
        # multiset diff, not positional zip of sorted lists: one
        # inserted row must read as one difference, not shift-misalign
        # every later pair
        problems.append(
            f"value mismatch: {len(only_s)} rows only in spark, "
            f"{len(only_d)} only in duck"
        )
        for r in only_s[:3]:
            problems.append(f"  spark-only: {r}")
        for r in only_d[:3]:
            problems.append(f"  duck-only:  {r}")
    return problems


# DuckDB output types the driver's dtype-sensitive hash can never match,
# because Spark has no equivalent arrow dtype: int128 (DuckDB promotes
# SUM(BIGINT) to HUGEINT) and the unsigned family (Spark is signed-only;
# uint64 vs int64 hash-diverges even when values agree).  This is exactly
# the class of bug value-based parity cannot catch — r4's one red driver
# row (topk_with_ties_suppliers) was a HUGEINT artifact with byte-identical
# values at every scale.
_BANNED_DUCK_TYPES = (
    "HUGEINT",
    "UHUGEINT",
    "INT128",
    "UINT128",
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
)


def lint_oracles(con, queries) -> list[str]:
    """DESCRIBE every registered oracle through DuckDB and return
    "name: column TYPE" strings for any output column whose dtype Spark
    cannot emit.  Pure metadata — no query execution."""
    problems = []
    for name, q in queries.items():
        if q.oracle is None:
            continue
        try:
            rows = con.execute(f"DESCRIBE {q.oracle}").fetchall()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, ctype, *_ in rows:
            up = str(ctype).upper()
            if any(b in up for b in _BANNED_DUCK_TYPES):
                problems.append(f"{name}: column {col} has dtype {ctype}")
    return problems


def run(sf_dir: str, names: list[str] | None = None, plain: bool = False) -> int:
    from data_warehouse_project_spark.plans import QUERIES

    if plain:
        # driver-realistic mode: a bare default-config session (the
        # correctness driver builds its own SparkSession; engine code
        # must not depend on get_spark()'s tuning)
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("parity-plain")
            .config("spark.driver.host", "127.0.0.1")
            .config("spark.driver.bindAddress", "127.0.0.1")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from data_warehouse_project_spark.session import get_spark

        spark = get_spark("parity")
    con = duckdb.connect()
    from data_warehouse_project_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    selected = names or list(QUERIES)
    unknown = [n for n in selected if n not in QUERIES]
    if unknown:
        print(f"unknown query names: {unknown}")
        print(f"(registry has {len(QUERIES)} queries; run with no names to list)")
        return len(unknown)
    lint = lint_oracles(con, {n: QUERIES[n] for n in selected})
    failures = 0
    lint_failures = len(lint)
    if lint:
        print("oracle dtype lint FAILURES (Spark cannot emit these dtypes):")
        for p in lint:
            print(f"  ✗ {p}")
    for name in selected:
        q = QUERIES[name]
        try:
            sdf = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = sdf.count()
                print(f"  ~ {name}: no oracle, rows={n}")
                continue
            cur = con.execute(q.oracle)
            duck_cols = [d[0] for d in cur.description]
            duck_rows = df_rows_duck(cur)
            problems = compare(sdf, duck_cols, duck_rows)
        except Exception as e:  # noqa: BLE001
            print(f"  ✗ {name}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if problems:
            print(f"  ✗ {name}:")
            for p in problems:
                print(f"      {p}")
            failures += 1
        else:
            print(f"  ✓ {name} ({len(duck_rows)} rows)")
    print(f"{len(selected) - failures}/{len(selected)} queries match")
    if lint_failures:
        print(f"+ {lint_failures} oracle dtype lint failures")
    return failures + lint_failures


def lint_only(sf_dir: str) -> int:
    """Lint every registered oracle's output dtypes — no Spark session."""
    from data_warehouse_project_spark.plans import QUERIES
    from data_warehouse_project_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    problems = lint_oracles(con, QUERIES)
    for p in problems:
        print(f"  ✗ {p}")
    n_oracles = sum(1 for q in QUERIES.values() if q.oracle is not None)
    print(f"dtype lint: {n_oracles - len(problems)}/{n_oracles} oracles clean")
    return len(problems)


if __name__ == "__main__":
    args = sys.argv[1:]
    plain = "--plain" in args
    lint_flag = "--lint" in args
    args = [a for a in args if a not in ("--plain", "--lint")]
    # a directory arg (any position) selects the SF; everything else is
    # a query name — unknown names error in run() instead of KeyError
    sf_dir = "/root/testdata/sf0.01"
    names = []
    for a in args:
        if os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)
    names = names or None
    if lint_flag:
        sys.exit(1 if lint_only(sf_dir) else 0)
    sys.exit(1 if run(sf_dir, names, plain=plain) else 0)
