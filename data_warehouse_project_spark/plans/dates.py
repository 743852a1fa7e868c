"""Generated date dimension — the reference's densest scalar cluster
(D1-D17, /root/reference/sql/dimensional/load_dim_dates_dimension.sql:28-74).

The PL/pgSQL original generates dates with WITH RECURSIVE and computes 17
attributes per day; we generate the same frame with one
``sequence() + explode`` (no recursion, no loop) over the fact's
[min-1mo, max+1mo] range (auto-range wrapper, :233-237).

Intentional parity quirks preserved from the reference:
- days_in_quarter is the hardcoded 90/91/92/92 CASE (:57-62) — Q1 is
  actually 91 days in leap years; we reproduce the constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.plans.queries import register

_DIM_DATES_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) - INTERVAL 1 MONTH AS start_d,
         CAST(MAX(o_orderdate) AS DATE) + INTERVAL 1 MONTH AS end_d
  FROM orders
), days AS (
  SELECT CAST(unnest(generate_series(start_d, end_d, INTERVAL 1 DAY)) AS DATE)
         AS date_id
  FROM bounds
)
SELECT
  date_id,
  strftime(date_id, '%A')                             AS day_name,
  CAST(isodow(date_id) AS INT)                        AS day_of_week,
  CAST(day(date_id) AS INT)                           AS day_of_month,
  CAST(week(date_id) AS INT)                          AS iso_week_number,
  CASE WHEN isodow(date_id) IN (6,7) THEN 1 ELSE 0 END AS weekend_flag,
  date_id + CAST(7 - isodow(date_id) AS INT)          AS week_ending_day,
  CAST(month(date_id) AS INT)                         AS month_number,
  CAST(day(last_day(date_id)) AS INT)                 AS days_in_month,
  last_day(date_id)                                   AS end_of_month,
  strftime(date_id, '%B')                             AS month_name,
  CAST(quarter(date_id) AS INT)                       AS quarter_number,
  CASE quarter(date_id) WHEN 1 THEN 90 WHEN 2 THEN 91
       WHEN 3 THEN 92 ELSE 92 END                     AS days_in_quarter,
  CAST(date_trunc('quarter', date_id) + INTERVAL 3 MONTH - INTERVAL 1 DAY
       AS DATE)                                       AS end_of_quarter,
  CAST(year(date_id) AS INT)                          AS date_year,
  CASE WHEN (year(date_id) % 4 = 0 AND year(date_id) % 100 <> 0)
            OR year(date_id) % 400 = 0
       THEN 366 ELSE 365 END                          AS days_in_year,
  CAST(date_trunc('year', date_id) + INTERVAL 12 MONTH - INTERVAL 1 DAY
       AS DATE)                                       AS end_of_year
FROM days
ORDER BY date_id
"""


def date_attributes(days: DataFrame) -> DataFrame:
    """D2-D17 projection: the full 17-attribute date dimension over a
    frame with a ``date_id`` DATE column. Shared by the oracle-checked
    ``dim_dates`` query and the ETL's ``load_dim_dates`` so both emit
    the identical schema (load_dim_dates_dimension.sql:28-74)."""
    d = F.col("date_id")
    iso_dow = F.weekday(d) + F.lit(1)  # Mon=1..Sun=7 (PG EXTRACT(ISODOW))
    yr = F.year(d)
    return days.select(
        d,
        F.date_format(d, "EEEE").alias("day_name"),
        iso_dow.cast("int").alias("day_of_week"),
        F.dayofmonth(d).cast("int").alias("day_of_month"),
        F.weekofyear(d).cast("int").alias("iso_week_number"),
        F.when(iso_dow.isin(6, 7), 1).otherwise(0).alias("weekend_flag"),
        F.date_add(d, (F.lit(7) - iso_dow).cast("int")).alias("week_ending_day"),
        F.month(d).cast("int").alias("month_number"),
        F.dayofmonth(F.last_day(d)).cast("int").alias("days_in_month"),
        F.last_day(d).alias("end_of_month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.quarter(d).cast("int").alias("quarter_number"),
        # reference hardcodes 90/91/92/92 (load_dim_dates_dimension.sql:57-62)
        F.when(F.quarter(d) == 1, 90)
        .when(F.quarter(d) == 2, 91)
        .otherwise(92)
        .alias("days_in_quarter"),
        F.date_sub(F.add_months(F.trunc(d, "quarter"), 3), 1).alias("end_of_quarter"),
        yr.cast("int").alias("date_year"),
        F.when(
            ((yr % 4 == 0) & (yr % 100 != 0)) | (yr % 400 == 0), 366
        )
        .otherwise(365)
        .alias("days_in_year"),
        F.date_sub(F.add_months(F.trunc(d, "year"), 12), 1).alias("end_of_year"),
    )


@register(
    "dim_dates",
    oracle=_DIM_DATES_ORACLE,
    doc="M5/D1-D17: auto-ranged generated date dimension, 17 attributes "
    "per day. sequence()+explode generates the calendar in one task — "
    "a date dim is tiny at any warehouse scale and is broadcast to "
    "every fact join.",
    tags=("dim", "generator"),
)
def dim_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(F.col("o_orderdate").cast("date").alias("d"))
    bounds = o.agg(
        F.add_months(F.min("d"), -1).alias("start_d"),
        F.add_months(F.max("d"), 1).alias("end_d"),
    )
    days = bounds.select(
        F.explode(F.sequence("start_d", "end_d")).alias("date_id")
    )
    return date_attributes(days).orderBy("date_id")
