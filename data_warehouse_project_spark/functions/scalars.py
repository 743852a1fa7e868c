"""Scalar expression helpers (reference parity + exact-money arithmetic).

The reference's scalar surface (SURVEY.md §2.7, /root/reference/sql/*)
is plain built-in composition; only a handful of PostgreSQL behaviors
diverge from Spark's builtins, wrapped here as pure Column expressions
(no UDFs — everything stays inside Catalyst / whole-stage codegen):

- ``initcap_pg``   — F3: PG INITCAP capitalizes after ANY non-alnum
  (``o'brien`` → ``O'Brien``), Spark only after whitespace.
- ``split_part``   — F7: PG returns '' for a missing part, Spark
  ``getItem`` returns NULL.
- ``to_date_mdy``  — F8: PG ``MM/DD/YYYY`` tolerates 1-digit month/day;
  Spark needs the lenient ``M/d/yyyy`` pattern.
- ``currency_to_decimal`` — F6: strip ``$``/``,``, trim, cast.
- ``cents`` / ``money`` — exact money aggregation on double columns that
  carry 2-decimal values: scale to integer cents (BIGINT) so SUMs are
  exact and reproducible across engines and row orders, then divide by
  100.0 once at the end. At 100 TB this also halves the shuffle width of
  money aggregations (8-byte long vs 8-byte double but no decimal
  overhead) and keeps partial aggregation associative-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def initcap_pg(col: Column | str) -> Column:
    """PostgreSQL-semantics INITCAP: uppercase every letter that follows a
    non-alphanumeric, lowercase the rest.

    Parity target: /root/reference/sql/3nf/load_3nf_ce_continents_table.sql:19.
    Pure expression (no UDF): tokenize into alphanumeric runs and single
    separator chars, capitalize each run's first letter, rejoin.
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+|[^a-z0-9]"), 0)
    capped = F.transform(
        tokens,
        lambda t: F.concat(
            F.upper(t.substr(F.lit(1), F.lit(1))), t.substr(F.lit(2), F.length(t))
        ),
    )
    return F.array_join(capped, "")


def split_part(col: Column | str, delim: str, part: int) -> Column:
    """PG split_part: 1-based, returns '' (not NULL) when part is missing.

    Parity: /root/reference/sql/3nf/load_3nf_ce_customers_scd_table_type1.sql:24-25.
    """
    c = F.col(col) if isinstance(col, str) else col
    # F.get (not getItem): ANSI mode throws on out-of-bounds indexes.
    got = F.get(F.split(c, delim), part - 1)
    return F.coalesce(got, F.lit(""))


def to_date_mdy(col: Column | str) -> Column:
    """PG TO_DATE(x,'MM/DD/YYYY') tolerant of 1-digit month/day.

    Parity: /root/reference/sql/3nf/load_3nf_ce_sales_pre_fact_table.sql:49.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "M/d/yyyy")


def currency_to_decimal(col: Column | str, precision: int = 7, scale: int = 2) -> Column:
    """Strip '$' and ',' + TRIM + cast, e.g. '"$1,234.50 "' → 1234.50.

    Parity: /root/reference/sql/3nf/load_3nf_ce_products_scd_table_type2.sql:29.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(c, r"[$,]", ""))
    return cleaned.cast(f"decimal({precision},{scale})")


def cents(col: Column | str) -> Column:
    """2-decimal double → exact integer cents (BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def money(cents_col: Column | str) -> Column:
    """Integer cents → double dollars (exact: bigint/100.0)."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return (c / F.lit(100.0)).cast("double")
