"""Partition-scoped (bucketed) SCD merge — the second SCD maintenance
path promised by SURVEY.md §7.3 ("keep both paths").

The snapshot path (``operators/scd.py`` + ``Warehouse.overwrite``)
recomputes and rewrites the WHOLE dimension each batch — correct, but at
a 100 TB dimension (billions of slowly changing rows, <1%% churn per
batch) the full rewrite dominates the pipeline. The reference avoids
this with in-place transactional updates (``ON CONFLICT ... DO UPDATE``,
load_3nf_ce_customers_scd_table_type1.sql:101-144; SCD2 expire+insert,
load_3nf_ce_products_scd_table_type2.sql:120-172). The distributed
equivalent on plain parquet is a *bucketed merge*:

1. the dimension is laid out partitioned by ``__bucket =
   pmod(xxhash64(key), n_buckets)`` — a stable hash, so a key lives in
   the same bucket forever;
2. an incremental batch first computes the DISTINCT buckets its keys
   touch (a bounded ``collect`` — at most ``n_buckets`` values, model
   state not data);
3. only those partitions are read back (``__bucket IN (...)`` prunes at
   the parquet scan), the pure SCD transform runs on that slice joined
   with the batch, and ``Warehouse.overwrite_partitions`` atomically
   swaps just the touched directories.

IO per batch is O(touched buckets), not O(dimension) — but hash
bucketing spreads churn UNIFORMLY, so the expected touched fraction for
a k-key batch is 1-(1-1/n)^k ~= k/n (k << n_buckets). The win therefore
requires n_buckets >> churn keys per batch. Measured at sf0.1 (15k-row
customers dim, 32 buckets): a 3-key batch rewrites 1,387/15,000 rows
(9%%); a 50-key batch touches ~30/32 buckets — at that point the
snapshot overwrite is cheaper and is the right choice. Size n_buckets
to the expected batch key count (thousands for a billion-row dim), or,
when churn is key-correlated (recent keys change most), bucket by key
RANGE instead of hash so churn clusters into few buckets. Delta/Iceberg
MERGE INTO is the managed-format upgrade with file-level granularity
and data-clustered layout — this module keeps the same call shape so
swapping it in is local.

Semantics are identical to the snapshot path by construction: the same
pure functions ``scd1_upsert`` / ``scd2_apply`` run per bucket-slice,
and SCD state for a key is fully contained in its bucket (hash of the
business key), so bucket-local application is exact, not approximate.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.operators.scd import scd1_upsert, scd2_apply

BUCKET_COL = "__bucket"
DEFAULT_BUCKETS = 32

# Layout contract: a bucketed dimension is only mergeable by code that
# computes the SAME key->bucket map it was written with. The marker file
# (underscore-prefixed: invisible to _data_files and Spark) records the
# hash scheme + bucket count; scd*_merge refuses a dimension whose
# marker is absent (pre-versioned layout) or different — without this,
# a scheme change (e.g. r5's dtype-normalizing string-hash) would read
# the wrong buckets and silently duplicate keys across bucket dirs.
_LAYOUT_FILE = "_bucket_layout.json"
_LAYOUT_SCHEME = "xxhash64-str-v2"


def _write_layout(wh: Warehouse, layer: str, name: str, n_buckets: int) -> None:
    import json

    (wh.path(layer, name) / _LAYOUT_FILE).write_text(
        json.dumps({"scheme": _LAYOUT_SCHEME, "n_buckets": n_buckets})
    )


def _check_layout(wh: Warehouse, layer: str, name: str, n_buckets: int) -> None:
    import json

    p = wh.path(layer, name) / _LAYOUT_FILE
    if not p.exists():
        raise ValueError(
            f"{layer}.{name} carries no bucket-layout marker — it was "
            "written under a pre-versioned or foreign bucketing scheme; "
            "rebuild it via the snapshot path (full overwrite) before "
            "partition-scoped merging"
        )
    meta = json.loads(p.read_text())
    if meta.get("scheme") != _LAYOUT_SCHEME or meta.get("n_buckets") != n_buckets:
        raise ValueError(
            f"{layer}.{name} bucket layout {meta} != current "
            f"({_LAYOUT_SCHEME}, n_buckets={n_buckets}); rebuild via the "
            "snapshot path before merging"
        )


def bucket_expr(key: str, n_buckets: int) -> Column:
    """Stable key→bucket assignment. xxhash64 is deterministic across
    sessions/partitions, so a key's bucket never moves. The key is
    normalized to its string form BEFORE hashing: xxhash64 is
    dtype-sensitive (bigint 5 and varchar '5' hash differently), so a
    batch arriving with a drifted key dtype would otherwise compute
    different buckets than the stored layout and scatter a key's
    versions across two buckets — silent duplicates. The outer cast to
    string is for partition values, which round-trip as strings (the
    session disables partition-column type inference)."""
    return F.pmod(
        F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)
    ).cast("string")


def _check_key_dtype(cur: DataFrame, updates: DataFrame, key: str) -> None:
    """Fail loudly when a batch's key dtype drifts from the stored
    dimension's: even with string-normalized bucketing, a bigint-vs-
    string key would still break the SCD join semantics downstream
    (5 != '5' in an equi-join), so this is a load-time contract."""
    cur_t, upd_t = dict(cur.dtypes).get(key), dict(updates.dtypes).get(key)
    if cur_t is not None and upd_t is not None and cur_t != upd_t:
        raise TypeError(
            f"batch key {key!r} dtype {upd_t} != stored dimension's {cur_t}"
        )


def _touched_buckets(updates: DataFrame, key: str, n_buckets: int) -> list[str]:
    """DISTINCT buckets of the batch's keys. Driver-side but bounded by
    n_buckets (model state, not data) — the same justified-collect shape
    as k-means centroids."""
    rows = (
        updates.select(bucket_expr(key, n_buckets).alias(BUCKET_COL))
        .distinct()
        .collect()
    )
    return sorted(r[BUCKET_COL] for r in rows)


def _read_buckets(
    wh: Warehouse, layer: str, name: str, buckets: list[str]
) -> DataFrame:
    """Read only the touched partitions. The IN-filter on the partition
    column prunes directories at planning time — IO is O(touched)."""
    df = wh.read(layer, name)
    return df.filter(F.col(BUCKET_COL).isin(buckets))


def scd1_merge(
    wh: Warehouse,
    layer: str,
    name: str,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    change_order: list[str],
    run_ts: dt.datetime | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """SCD1 upsert that rewrites only the buckets containing batch keys.

    Returns ``{"rows_written": n, "buckets_touched": k,
    "buckets_total": n_buckets}`` for O3-style accounting.
    """
    if not wh.exists(layer, name):
        snap = scd1_upsert(None, updates, key, tracked, change_order, run_ts=run_ts)
        snap = snap.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
        n = wh.overwrite(snap, layer, name, partition_by=[BUCKET_COL])
        _write_layout(wh, layer, name, n_buckets)
        return {
            "rows_written": n,
            "buckets_touched": n_buckets,
            "buckets_total": n_buckets,
        }

    _check_layout(wh, layer, name, n_buckets)
    _check_key_dtype(wh.read(layer, name), updates, key)
    touched = _touched_buckets(updates, key, n_buckets)
    if not touched:
        return {"rows_written": 0, "buckets_touched": 0, "buckets_total": n_buckets}
    cur = _read_buckets(wh, layer, name, touched).drop(BUCKET_COL)
    nxt = scd1_upsert(cur, updates, key, tracked, change_order, run_ts=run_ts)
    nxt = nxt.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
    n = wh.overwrite_partitions(nxt, layer, name, BUCKET_COL, touched)
    return {
        "rows_written": n,
        "buckets_touched": len(touched),
        "buckets_total": n_buckets,
    }


def scd2_merge(
    wh: Warehouse,
    layer: str,
    name: str,
    updates: DataFrame,
    key: str,
    compare: list[str],
    attrs: list[str],
    change_order: list[str],
    run_ts: dt.datetime | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """SCD2 expire-and-version rewriting only touched buckets. All
    versions of a key share its bucket (hash of the business key), so
    expire+insert is bucket-local and exact."""
    if not wh.exists(layer, name):
        dim = scd2_apply(
            None, updates, key, compare, attrs, change_order, run_ts=run_ts
        )
        dim = dim.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
        n = wh.overwrite(dim, layer, name, partition_by=[BUCKET_COL])
        _write_layout(wh, layer, name, n_buckets)
        return {
            "rows_written": n,
            "buckets_touched": n_buckets,
            "buckets_total": n_buckets,
        }

    _check_layout(wh, layer, name, n_buckets)
    _check_key_dtype(wh.read(layer, name), updates, key)
    touched = _touched_buckets(updates, key, n_buckets)
    if not touched:
        return {"rows_written": 0, "buckets_touched": 0, "buckets_total": n_buckets}
    cur = _read_buckets(wh, layer, name, touched).drop(BUCKET_COL)
    nxt = scd2_apply(cur, updates, key, compare, attrs, change_order, run_ts=run_ts)
    nxt = nxt.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
    n = wh.overwrite_partitions(nxt, layer, name, BUCKET_COL, touched)
    return {
        "rows_written": n,
        "buckets_touched": len(touched),
        "buckets_total": n_buckets,
    }


def read_dimension(
    spark: SparkSession, wh: Warehouse, layer: str, name: str
) -> DataFrame:
    """Read a bucketed dimension without the internal bucket column."""
    df = wh.read(layer, name)
    return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df
