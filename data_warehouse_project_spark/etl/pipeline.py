"""Full medallion ETL pipeline (reference O1: sp_run_full_etl,
/root/reference/sql/utils/run_full_etl_process.sql:36-104), re-expressed
as chained batch DataFrame jobs over the driver's TPC-H-ish source
tables:

  source parquet           reference analogue
  ----------------         -----------------------------
  customer⋈nation⋈region → customers CSV (geo as text)
  supplier⋈nation⋈region → stores CSV
  part                   → products CSV (SCD2 on price)
  lineitem⋈orders        → sales CSV

Layer flow (same topology as the reference):
  staging (all-string, dedup-key append)            [P1 P2 S6]
  → 3NF: 4-level geo chain region→nation→state→city (M1/J2;
         state/city are synthetic: nation×mktsegment and
         state×phone-area-code — TPC-H has no sub-nation geo),
         product hierarchy category(p_mfgr)→subcategory(p_brand)
         (M1/J3), SCD1 customers→city FK (M2),
         SCD2 products→subcategory FK (M3), stores (M1),
         watermark-incremental pre-fact sales (M4)  [W2 P7 J2 J3 J5 J6]
  → DM: generated 17-attribute date dim (M5), dims denormalized
        by walking the full snowflake (J7), month-partitioned fact
        (S7, J8)
with per-stage logging and row accounting             [O2 O3 O4]

Every loader is set-based: the reference's FOR-loops with per-row
guarded INSERTs (load_3nf_ce_continents_table.sql:75-106) become one
anti-join + append per stage; per-row NEXTVAL becomes row_number over a
stable order + MAX(existing) offset.
"""

from __future__ import annotations

import datetime as dt
import time
import traceback
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.catalog import table
from data_warehouse_project_spark.etl.warehouse import Warehouse
from data_warehouse_project_spark.functions.scalars import initcap_pg
from data_warehouse_project_spark.localframe import local_rows
from data_warehouse_project_spark.operators.keys import (
    next_key_offset,
    with_distributed_keys,
    with_surrogate_keys,
)
from data_warehouse_project_spark.operators.scd import scd1_upsert, scd2_apply
from data_warehouse_project_spark.plans.dates import date_attributes

DEFAULT_ID = -1
NA = "n.a."
# audit sentinels for seeded default rows (reference
# load_3nf_ce_countries_table.sql:85-92: '1900-01-01' / 'MANUAL')
AUDIT_EPOCH = dt.date(1900, 1, 1)
MANUAL = "MANUAL"


def _with_audit(
    df: DataFrame,
    source_system: str,
    source_entity: str,
    run_ts: dt.datetime | None,
    overwrite: bool = False,
) -> DataFrame:
    """Reference audit columns on every warehouse table (SURVEY §1.3;
    create_ddl_objects_3NF_layer.sql:36-39): INSERT_DT / UPDATE_DT
    stamped with the run date, SOURCE_SYSTEM / SOURCE_ENTITY naming the
    upstream. ``overwrite=True`` restamps rows that already carry audit
    columns from a previous layer (the DM loads, which re-audit like the
    reference's DM procedures do)."""
    d = F.lit((run_ts or dt.datetime.now()).date())
    out = df
    for c in ("insert_dt", "update_dt"):
        if overwrite or c not in df.columns:
            out = out.withColumn(c, d)
    return out.withColumn("source_system", F.lit(source_system)).withColumn(
        "source_entity", F.lit(source_entity)
    )


# --------------------------------------------------------------------------
# staging: cast-all-to-string clean + dedup-key append  [P1 P2 S6 O3]
# --------------------------------------------------------------------------


def _to_strings(df: DataFrame) -> DataFrame:
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])


def _staging_append(wh: Warehouse, batch: DataFrame, name: str, keys: list[str]) -> int:
    """Idempotent staging load: dedup the clean batch, insert only rows
    whose dedup key is absent from the target (reference
    load_staging_sales_table.sql:94-121).

    Dedup is on the declared key, not full-row DISTINCT: the reference's
    P1 DISTINCT is subsumed by its own P2 key-dedup (final state is
    identical for key-unique sources), and a key dedup shuffles only the
    key columns' width — the difference between a survivable and an
    impossible shuffle at 100 TB.

    Inserted rows are stamped with ``staged_seq`` (one value per load,
    epoch micros): when a table's dedup key includes mutable attributes
    (customers, products), staging legitimately accumulates several
    versions of one business key across runs, and downstream SCD loads
    order versions by this stamp. The reference has no such column and
    upserts staged versions in arbitrary loop order
    (load_3nf_ce_customers_scd_table_type1.sql:99-131) — the stamp makes
    our end state the deterministic latest-version pick instead."""
    batch = batch.dropDuplicates(keys)
    target = wh.read_or_none("staging", name)
    if target is not None:
        batch = batch.join(target.select(keys).distinct(), on=keys, how="left_anti")
    batch = batch.withColumn(
        "staged_seq", F.lit(int(dt.datetime.now().timestamp() * 1_000_000))
    )
    return wh.append(batch, "staging", name)


def _source_reader(spark: SparkSession, src_dir: str, src_format: str):
    """Return a name -> DataFrame reader for the source directory.

    ``parquet`` (default) goes through catalog.table. ``csv`` is the
    runnable twin of the reference's S3 entry point (pandas
    read_csv-with-encoding-fallback → staging,
    /root/reference/python/import_data.py:92): each table is
    ``<src_dir>/<name>.csv`` read all-string via the S1 encoding
    fallback — schema-on-read matches staging's all-VARCHAR semantics,
    so the rest of the pipeline is format-agnostic.
    """
    if src_format == "parquet":
        return lambda name: table(spark, src_dir, name)
    if src_format == "csv":
        from data_warehouse_project_spark.sources.csv import read_csv_with_encodings

        return lambda name: read_csv_with_encodings(spark, f"{src_dir}/{name}.csv")
    raise ValueError(f"unknown src_format {src_format!r}; use 'parquet' or 'csv'")


def load_staging(
    spark: SparkSession,
    wh: Warehouse,
    src_dir: str,
    src_format: str = "parquet",
) -> None:
    read = _source_reader(spark, src_dir, src_format)
    c = read("customer")
    n = read("nation")
    r = read("region")
    s = read("supplier")
    p = read("part")
    li = read("lineitem")
    o = read("orders")

    customers_src = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "n_name", "r_name")
    )
    stores_src = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name", "r_name")
    )
    sales_src = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "o_custkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "o_orderdate",
    )

    # the four staging tables are independent — submit their jobs
    # concurrently so the cluster (or local thread pool) isn't idle
    # while one small table's write round-trips the scheduler
    def _load_one(name: str, df: DataFrame, keys: list[str]) -> None:
        rows = _staging_append(wh, df, name, keys)
        wh.log(f"load_staging_{name}", "staging load ok", rows)

    targets = (
        # customers dedup on key + SCD1-tracked attributes, mirroring the
        # reference's anti-join on CustomerKey + Name/City/State/Country/
        # Continent (load_staging_customers_table.sql:119-128): a
        # re-delivered key with CHANGED attributes must re-enter staging
        # or the SCD1 update path downstream can never fire. Stores are
        # key-only like the reference (insert-only dim); products carry
        # price in the key so SCD2 versions flow.
        (
            "customers",
            _to_strings(customers_src),
            ["c_custkey", "c_name", "c_mktsegment", "c_acctbal", "n_name"],
        ),
        ("stores", _to_strings(stores_src), ["s_suppkey"]),
        ("products", _to_strings(p), ["p_partkey", "p_retailprice"]),
        ("sales", _to_strings(sales_src), ["l_orderkey", "l_linenumber"]),
    )
    with ThreadPoolExecutor(max_workers=len(targets)) as pool:
        futures = [pool.submit(_load_one, *t) for t in targets]
        for f in futures:
            f.result()  # surface the first failure


# --------------------------------------------------------------------------
# 3NF: insert-only geo dims  [M1 W2 P7 J2 U1]
# --------------------------------------------------------------------------


def _insert_only_dim(
    wh: Warehouse,
    batch: DataFrame,
    name: str,
    src_col: str,
    id_col: str,
    extra_defaults: dict[str, object] | None = None,
    source_entity: str = "",
    run_ts: dt.datetime | None = None,
    return_frame: bool = False,
    dense_keys: bool = False,
    write_pool=None,
) -> int | tuple[int, DataFrame]:
    """M1: seed default row, anti-join on the natural key, assign
    surrogate ids above MAX(existing), stamp audit columns, append.

    ``return_frame=True`` additionally returns the full post-append
    dimension as a lazy DataFrame — chained loaders (the geo
    hierarchy) join the child level against it directly instead of
    re-reading the parquet just written, which saves a scan +
    broadcast-build job per level. ``dense_keys=True`` mints ids with
    the single-task dense window instead of bucketed offsets — ONLY
    valid for dims whose cardinality is bounded by a constant
    independent of data volume (the geo chain: distinct world regions
    x nations x segments x 10 districts), where it deletes the
    per-level offset-frame broadcast job; everything data-proportional
    keeps ``with_distributed_keys``.

    ``write_pool`` (r14, guide §2.6): the chained loaders' levels only
    need the PARENT'S IN-MEMORY keyed frame for their FK lookup, never
    the parquet it lands in — so with a pool the final frame is pinned
    with ``localCheckpoint`` (a sub-second job on these few-hundred-row
    dims), the parquet append is submitted to the pool, and the method
    returns ``(future_rowcount, frame)`` immediately. The child level's
    compute then overlaps the parent's write job (the chain's write
    latency was the critical path: ~1-1.3 s fixed job cost per level,
    strictly serialized). Callers must resolve every future before the
    stage returns — the stage boundary is the durability fence, exactly
    as it was when the writes were inline."""
    target = wh.read_or_none("bl_3nf", name)
    if target is not None:
        batch = batch.join(
            target.select(src_col), on=src_col, how="left_anti"
        )
        # sequence emulation from parquet footer statistics (no Spark
        # job); falls back to a MAX aggregate when stats are missing
        fmax = wh.footer_max("bl_3nf", name, id_col)
        offset = (
            int(fmax) + 1 if fmax is not None else next_key_offset(target, id_col)
        )
    else:
        offset = 1
    if dense_keys:
        # bounded-cardinality dim: one-task dense ids, zero extra jobs
        keyed = with_surrogate_keys(batch, id_col, [src_col], start_at=offset)
    else:
        # scale-safe key minting: bucketed partition-offset assignment,
        # never a global single-task row_number (these dim snapshots
        # grow with the data)
        keyed = with_distributed_keys(batch, id_col, [src_col], start_at=offset)
    keyed = _with_audit(keyed, "staging", source_entity or name, run_ts)
    if target is None:
        # P7: the -1 / 'n.a.' / 1900-01-01 / MANUAL sentinel row, seeded once
        defaults = {
            id_col: DEFAULT_ID,
            src_col: NA,
            "insert_dt": AUDIT_EPOCH,
            "update_dt": AUDIT_EPOCH,
            "source_system": MANUAL,
            "source_entity": MANUAL,
            **(extra_defaults or {}),
        }
        spark = batch.sparkSession
        default_df = local_rows(
            spark, [tuple(defaults.get(c) for c in keyed.columns)],
            keyed.schema,
        )
        keyed = default_df.unionByName(keyed)
    if write_pool is not None:
        # pin the final frame (truncates the lazy-plan chain that
        # multiplied AQE stage-jobs down the levels — measured
        # 3/6/8/10 jobs for the four geo levels when reused lazily),
        # then ship the write off-thread and return at once
        keyed = keyed.localCheckpoint()
        fut = write_pool.submit(wh.append, keyed, "bl_3nf", name)
        return (fut, keyed) if return_frame else (fut, None)
    n = wh.append(keyed, "bl_3nf", name)
    if return_frame:
        # the write just materialized the batch — hand back the
        # freshly-written parquet (tiny: one file) rather than the lazy
        # keyed plan (see the write_pool note above for why lazy reuse
        # is the wrong default), sparing a checkpoint job.
        return n, wh.read("bl_3nf", name)
    return n


def load_3nf_geo(
    spark: SparkSession, wh: Warehouse, run_ts: dt.datetime | None = None
) -> None:
    # The four-level chain's per-level ORDERING (region→nation→state→
    # city FKs) is inherent, but each level's data needs are tiny: the
    # distinct (nation, region, segment, district) tuples. So the stage
    # scans each staging table ONCE, dedups to that tuple set, and
    # pins it with localCheckpoint — every level then derives from the
    # in-memory tuple frame (r5 measured ~35 AQE stage-jobs here, one
    # staging scan + distinct shuffle PER LEVEL; this shape runs one
    # scan per source and level-local work on a few-hundred-row frame).
    # Parent lookups join the frame _insert_only_dim hands back
    # (return_frame=True) instead of re-reading the parquet it just
    # wrote, and key offsets on reruns come from parquet footer stats.
    cust = wh.read("staging", "customers")
    store = wh.read("staging", "stores")

    geo = (
        cust.select(
            F.lit("c").alias("src"),
            initcap_pg("n_name").alias("nation_name"),
            F.col("r_name"),
            F.upper(F.col("c_mktsegment")).alias("segment"),
            F.pmod(F.col("c_custkey").cast("bigint"), F.lit(10))
            .cast("string")
            .alias("district"),
        )
        .unionByName(
            store.select(
                F.lit("s").alias("src"),
                initcap_pg("n_name").alias("nation_name"),
                F.col("r_name"),
                F.lit(None).cast("string").alias("segment"),
                F.lit(None).cast("string").alias("district"),
            )
        )
        .dropDuplicates(["src", "nation_name", "r_name", "segment", "district"])
        .localCheckpoint()
    )
    geo_c = geo.filter(F.col("src") == "c").drop("src")
    geo_s = geo.filter(F.col("src") == "s").select("nation_name", "r_name")

    # U1: regions observed in either source entity, normalized (F3)
    regions = (
        geo_c.select(initcap_pg("r_name").alias("region_name"))
        .union(geo_s.select(initcap_pg("r_name").alias("region_name")))
        .filter(F.col("region_name").isNotNull() & (F.col("region_name") != ""))
        .distinct()
    )
    # the levels' WRITES overlap the chain (write_pool): each child
    # joins its parent's in-memory keyed frame, so only the per-level
    # key assignment is sequential — the four ~1 s parquet appends run
    # behind it and are fenced before the stage returns (guide §2.6)
    pool = ThreadPoolExecutor(max_workers=2)
    futs: list[tuple[str, object]] = []
    try:
        fut, reg = _insert_only_dim(
            wh, regions, "ce_regions", "region_name", "region_id",
            source_entity="customers,stores", run_ts=run_ts,
            return_frame=True, dense_keys=True, write_pool=pool,
        )
        futs.append(("load_3nf_ce_regions", fut))

        # nations with case-insensitive FK lookup to regions (J2)
        nations = (
            geo_c.select("nation_name", "r_name")
            .union(geo_s.select("nation_name", "r_name"))
            .filter(
                F.col("nation_name").isNotNull()
                & (F.col("nation_name") != "")
            )
            .dropDuplicates(["nation_name"])
        )
        nations = nations.join(
            F.broadcast(reg.select("region_name", "region_id")),
            F.upper(initcap_pg(nations.r_name))
            == F.upper(F.col("region_name")),
            "left",
        ).select(
            "nation_name",
            F.coalesce(F.col("region_id"), F.lit(DEFAULT_ID))
            .alias("region_id"),
        )
        fut, nat = _insert_only_dim(
            wh, nations, "ce_nations", "nation_name", "nation_id",
            extra_defaults={"region_id": DEFAULT_ID},
            source_entity="customers,stores", run_ts=run_ts,
            return_frame=True, dense_keys=True, write_pool=pool,
        )
        futs.append(("load_3nf_ce_nations", fut))

        # Levels 3-4 of the reference's continent→country→state→city
        # chain (create_ddl_objects_3NF_layer.sql:32-85). The TPC-H-ish
        # sources have no state/city, so the lower levels are synthetic
        # with a documented mapping: state := (nation, market segment),
        # city := (state, district — customer key mod 10). Same M1/J2
        # load shape as the real thing: natural-key dedup,
        # case-insensitive FK lookup to the parent, default row,
        # chained 4 deep.
        states_src = (
            geo_c.select(
                F.col("nation_name").alias("nation_name_src"),
                "segment",
            )
            .filter(F.col("segment").isNotNull() & (F.col("segment") != ""))
            .dropDuplicates(["nation_name_src", "segment"])
            .withColumn(
                "state_src_id",
                F.concat_ws("-", "nation_name_src", "segment"),
            )
        )
        states = states_src.join(
            F.broadcast(nat.select("nation_name", "nation_id")),
            F.upper(states_src.nation_name_src)
            == F.upper(F.col("nation_name")),
            "left",
        ).select(
            "state_src_id",
            "segment",
            F.coalesce(F.col("nation_id"), F.lit(DEFAULT_ID))
            .alias("nation_id"),
        )
        fut, st = _insert_only_dim(
            wh, states, "ce_states", "state_src_id", "state_id",
            extra_defaults={"segment": NA, "nation_id": DEFAULT_ID},
            source_entity="customers", run_ts=run_ts,
            return_frame=True, dense_keys=True, write_pool=pool,
        )
        futs.append(("load_3nf_ce_states", fut))

        cities_src = (
            geo_c.select(
                F.concat_ws("-", "nation_name", "segment")
                .alias("state_src_id"),
                "district",
            )
            .filter(F.col("district").isNotNull() & (F.col("district") != ""))
            .dropDuplicates(["state_src_id", "district"])
            .withColumn(
                "city_src_id", F.concat_ws("-", "state_src_id", "district")
            )
        )
        cities = cities_src.join(
            F.broadcast(st.select("state_src_id", "state_id")),
            "state_src_id", "left",
        ).select(
            "city_src_id",
            "district",
            F.coalesce(F.col("state_id"), F.lit(DEFAULT_ID))
            .alias("state_id"),
        )
        fut, _ = _insert_only_dim(
            wh, cities, "ce_cities", "city_src_id", "city_id",
            extra_defaults={"district": NA, "state_id": DEFAULT_ID},
            source_entity="customers", run_ts=run_ts, dense_keys=True,
            write_pool=pool,
        )
        futs.append(("load_3nf_ce_cities", fut))

        # durability fence: every deferred write lands before the stage
        # returns; logs keep the reference's per-level order and counts
        for stage_name, f in futs:
            wh.log(stage_name, "insert-only dim ok", f.result())
    finally:
        pool.shutdown(wait=True)


# --------------------------------------------------------------------------
# 3NF: product category → subcategory hierarchy  [M1 J3]
# --------------------------------------------------------------------------


def load_3nf_product_hierarchy(
    spark: SparkSession, wh: Warehouse, run_ts: dt.datetime | None = None
) -> None:
    """Reference category→subcategory chain
    (create_ddl_objects_3NF_layer.sql:106-129;
    load_3nf_ce_subcategories_table.sql:29-30): subcategory := p_brand,
    category := the brand's manufacturer prefix — TPC-H brands
    'Brand#ij' genuinely nest under manufacturer i, so
    substring(p_brand, 1, 7) = 'Brand#i' is the parent level (the test
    part table carries no explicit p_mfgr column). Resolved with a J3
    key-equality lookup."""
    prod = wh.read("staging", "products")
    # the geo-chain treatment (load_3nf_geo): scan staging ONCE, dedup
    # to the distinct (brand → category-prefix) tuple set, pin it with
    # localCheckpoint, and derive BOTH levels from the in-memory tuple
    # frame — instead of one staging scan + distinct shuffle per level.
    # min() is a deterministic parent pick if a source ever violated
    # the brand→mfgr functional dependency.
    brands = (
        prod.select(
            F.col("p_brand").alias("subcategory_src_id"),
            F.substring("p_brand", 1, 7).alias("category_src_id"),
        )
        .filter(
            F.col("subcategory_src_id").isNotNull()
            & (F.col("subcategory_src_id") != "")
        )
        .groupBy("subcategory_src_id")
        .agg(F.min("category_src_id").alias("category_src_id"))
        .localCheckpoint()
    )
    # dense_keys: TPC-H brands are 'Brand#ij' (i,j ∈ 1..5) — 25
    # subcategories under 5 manufacturer categories, bounded by the
    # spec independent of scale factor (and runtime-guarded by
    # DENSE_KEY_MAX_ROWS if a source ever breaks that shape)
    cats = brands.select("category_src_id").distinct()
    # same deferred-write chain as load_3nf_geo: the subcategory level
    # joins the category level's in-memory frame, so the parent's
    # parquet append overlaps the child's compute (guide §2.6)
    pool = ThreadPoolExecutor(max_workers=2)
    try:
        fut_cat, cat = _insert_only_dim(
            wh, cats, "ce_categories", "category_src_id", "category_id",
            source_entity="products", run_ts=run_ts, return_frame=True,
            dense_keys=True, write_pool=pool,
        )

        subs = brands.join(
            F.broadcast(cat.select("category_src_id", "category_id")),
            "category_src_id",
            "left",
        ).select(
            "subcategory_src_id",
            F.coalesce(F.col("category_id"), F.lit(DEFAULT_ID))
            .alias("category_id"),
        )
        fut_sub, _ = _insert_only_dim(
            wh, subs, "ce_subcategories", "subcategory_src_id",
            "subcategory_id",
            extra_defaults={"category_id": DEFAULT_ID},
            source_entity="products", run_ts=run_ts, dense_keys=True,
            write_pool=pool,
        )
        wh.log("load_3nf_ce_categories", "insert-only dim ok",
               fut_cat.result())
        wh.log("load_3nf_ce_subcategories", "insert-only dim ok",
               fut_sub.result())
    finally:
        pool.shutdown(wait=True)


# --------------------------------------------------------------------------
# 3NF: SCD1 customers  [M2]
# --------------------------------------------------------------------------


def _merge_scd_dim(
    wh: Warehouse,
    name: str,
    updates: DataFrame,
    key: str,
    id_col: str,
    next_fn,
) -> int:
    """Bucketed-merge write path shared by the SCD1/SCD2 loaders:
    rewrite only the hash buckets containing batch keys. ``next_fn(cur,
    offset)`` is the loader's pure next-state function applied to the
    touched-bucket slice; the id offset comes from parquet footer MAX
    statistics (metadata-only) with a Spark-agg fallback."""
    from data_warehouse_project_spark.operators.merge import (
        BUCKET_COL,
        DEFAULT_BUCKETS,
        _check_layout,
        _read_buckets,
        _touched_buckets,
        _write_layout,
        bucket_expr,
    )

    if not wh.exists("bl_3nf", name):
        nxt = next_fn(None, 1).withColumn(
            BUCKET_COL, bucket_expr(key, DEFAULT_BUCKETS)
        )
        n = wh.overwrite(nxt, "bl_3nf", name, partition_by=[BUCKET_COL])
        _write_layout(wh, "bl_3nf", name, DEFAULT_BUCKETS)
        return n
    # refuse a dimension bucketed under a different key->bucket map —
    # merging it would silently duplicate keys across bucket dirs
    _check_layout(wh, "bl_3nf", name, DEFAULT_BUCKETS)
    touched = _touched_buckets(updates, key, DEFAULT_BUCKETS)
    if not touched:
        return 0
    cur = _read_buckets(wh, "bl_3nf", name, touched).drop(BUCKET_COL)
    mx = wh.footer_max("bl_3nf", name, id_col)
    offset = (
        int(mx) + 1
        if mx is not None
        else next_key_offset(wh.read("bl_3nf", name), id_col)
    )
    nxt = next_fn(cur, offset).withColumn(
        BUCKET_COL, bucket_expr(key, DEFAULT_BUCKETS)
    )
    return wh.overwrite_partitions(nxt, "bl_3nf", name, BUCKET_COL, touched)


def _tx_id_offset(t, id_col: str) -> int:
    """Next surrogate-id offset for a transactional dimension, from the
    manifest's data-skipping stats (``stats_cols=[id_col]`` recorded at
    write time) — zero Spark jobs. A deletion vector or a stats-less
    file makes the metadata answer inexact, so fall back to the exact
    aggregate. A dv'd maximum only ever OVER-estimates (ids stay
    unique), but the cheap path simply refuses rather than reason about
    it."""
    m = t._manifest()
    his = []
    for f in m["files"]:
        if "dv" in f or id_col not in f.get("cs", {}):
            return next_key_offset(t.read(), id_col)
        his.append(f["cs"][id_col][1])
    return (max(his) + 1) if his else 1


def _tx_scd1_merge(
    wh: Warehouse,
    name: str,
    updates: DataFrame,
    key: str,
    id_col: str,
    tracked: list[str],
    run_ts: dt.datetime,
    source_entity: str,
    next_fn=None,
) -> int:
    """SCD1 through ``TxTable.merge`` — the closest execution model to
    the reference's transactional ON CONFLICT upsert
    (load_3nf_ce_customers_scd_table_type1.sql:101-144): one atomic
    manifest commit, only the data files whose footer key range
    intersects a batch key are read or rewritten, and unchanged matched
    rows are left alone via ``matched_condition`` (so UPDATE_DT
    semantics match the reference's changed-only bump).

    Source build is one column-pruned scan of the dimension (existing
    ids + insert_dt recovered by key) plus dense id minting for new
    keys from the manifest's id stats — at 100 TB the merge itself
    stays O(touched files)."""
    from data_warehouse_project_spark.operators.scd import (
        _any_changed,
        _latest_per_key,
    )
    from data_warehouse_project_spark.sources.txtable import TxError, TxTable

    root = wh.path("bl_3nf", name)
    try:
        t = TxTable(wh.spark, root)
    except TxError:
        if wh.exists("bl_3nf", name):
            raise ValueError(
                f"bl_3nf/{name} exists but is not transactional — it was "
                "built by another scd_strategy; refusing to shadow it"
            ) from None
        # first build: the SAME pure next-state function the snapshot
        # path uses — contents (including surrogate ids) come out
        # identical across strategies on a first run
        t = TxTable.create(
            wh.spark, root, next_fn(None, 1), key=key, stats_cols=[id_col]
        )
        wh.record_tx_pin("bl_3nf", name, 0)
        return t.row_count()

    latest = _latest_per_key(updates, key, ["change_seq"]).select(key, *tracked)
    # recover ids/insert_dt for matched keys from ONLY the files whose
    # key range intersects the batch — O(touched files), not O(dim)
    cur_ids = t.read_for_keys(latest.select(key)).select(key, id_col, "insert_dt")
    ts = F.lit(run_ts)
    src = (
        latest.join(cur_ids, key, "left")
        .withColumn("insert_dt", F.coalesce(F.col("insert_dt"), ts))
        .withColumn("update_dt", ts)
    )
    offset = _tx_id_offset(t, id_col)
    src = with_distributed_keys(src, "__cand", [key], start_at=offset)
    src = src.withColumn(id_col, F.coalesce(F.col(id_col), F.col("__cand"))).drop(
        "__cand"
    )
    src = src.withColumn("source_system", F.lit("staging")).withColumn(
        "source_entity", F.lit(source_entity)
    ).select(*t.columns())
    r = t.merge(
        src,
        when_matched="update",
        when_not_matched="insert",
        # changed-only: a no-op redelivery must keep the target row
        # (its original update_dt) untouched, like the snapshot path
        matched_condition=_any_changed("t", "s", tracked),
    )
    wh.record_tx_pin("bl_3nf", name, int(r["version"]))
    return int(abs(r.get("rows_delta", 0)))


def _tx_scd2_rewrite(
    wh: Warehouse,
    name: str,
    updates: DataFrame,
    key: str,
    id_col: str,
    next_fn,
) -> int:
    """SCD2 through one transactional copy-on-write commit: the expire
    (end_dt/is_active flip) and the new-version insert land together in
    a single manifest — the atomicity the reference gets from wrapping
    its expire-then-insert loops in one transaction
    (load_3nf_ce_products_scd_table_type2.sql:59-248). Only files whose
    footer key range intersects a batch key are read or rewritten
    (``rewrite_by_keys``); the next-state function is the same pure
    transform the snapshot and bucketed-merge paths use."""
    from data_warehouse_project_spark.sources.txtable import TxError, TxTable

    root = wh.path("bl_3nf", name)
    try:
        t = TxTable(wh.spark, root)
    except TxError:
        if wh.exists("bl_3nf", name):
            raise ValueError(
                f"bl_3nf/{name} exists but is not transactional — it was "
                "built by another scd_strategy; refusing to shadow it"
            ) from None
        t = TxTable.create(
            wh.spark, root, next_fn(None, 1), key=key, stats_cols=[id_col]
        )
        wh.record_tx_pin("bl_3nf", name, 0)
        return t.row_count()
    offset = _tx_id_offset(t, id_col)
    r = t.rewrite_by_keys(
        updates.select(key).distinct(),
        lambda cur: next_fn(cur, offset),
    )
    wh.record_tx_pin("bl_3nf", name, int(r["version"]))
    return int(r.get("files_rewritten", 0))


def _next_scd1_customers(
    cur: DataFrame | None,
    updates: DataFrame,
    run_ts: dt.datetime,
    offset: int,
) -> DataFrame:
    """Pure next-state for the customers SCD1 dim INCLUDING surrogate
    ids: apply the upsert, keep ids of surviving keys, mint dense new
    ids from ``offset``. Shared by the snapshot path (cur = whole dim)
    and the bucketed merge path (cur = touched-bucket slice)."""
    tracked = ["customer_name", "market_segment", "city_id", "acctbal"]
    cur_state = cur.drop("customer_id") if cur is not None else None
    snap = scd1_upsert(
        cur_state, updates, "customer_src_id", tracked, ["change_seq"], run_ts=run_ts
    )
    if cur is not None:
        mapping = cur.select("customer_src_id", "customer_id")
        snap = snap.join(mapping, on="customer_src_id", how="left")
    else:
        snap = snap.withColumn("customer_id", F.lit(None).cast("bigint"))
    snap = with_distributed_keys(
        snap, "candidate_id", ["customer_src_id"], start_at=offset
    )
    snap = snap.withColumn(
        "customer_id", F.coalesce(F.col("customer_id"), F.col("candidate_id"))
    ).drop("candidate_id")
    # audit lineage (insert_dt/update_dt are the SCD1 engine's own
    # timestamps; only the source columns are stamped here)
    return snap.withColumn("source_system", F.lit("staging")).withColumn(
        "source_entity", F.lit("customers")
    )


def load_3nf_customers(
    spark: SparkSession,
    wh: Warehouse,
    run_ts: dt.datetime,
    scd_strategy: str = "snapshot",
) -> None:
    """SCD1 customers anchored to the BOTTOM of the geo chain (city_id),
    like the reference's CE_CUSTOMERS → CE_CITIES FK
    (create_ddl_objects_3NF_layer.sql:88-103); nation/region names are
    recovered in the DM layer by walking city→state→nation→region.

    ``scd_strategy="merge"`` maintains the dim via the §7.3 bucketed
    merge: only the hash buckets containing batch keys are read and
    rewritten (O(touched), not O(dimension)) — the distributed twin of
    the reference's in-place ON CONFLICT update."""
    cust = wh.read("staging", "customers")
    cities = wh.read("bl_3nf", "ce_cities").select("city_src_id", "city_id")
    keyed = cust.withColumn(
        "city_src_id",
        F.concat_ws(
            "-",
            initcap_pg("n_name"),
            F.upper(F.col("c_mktsegment")),
            F.pmod(F.col("c_custkey").cast("bigint"), F.lit(10)).cast("string"),
        ),
    )
    updates = (
        keyed.join(F.broadcast(cities), "city_src_id", "left")
        .select(
            F.col("c_custkey").cast("bigint").alias("customer_src_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
            F.coalesce(F.col("city_id"), F.lit(DEFAULT_ID)).alias("city_id"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            # versions of one key (staging accumulates them now that the
            # dedup key includes tracked attributes) order by load stamp
            F.col("staged_seq").cast("bigint").alias("change_seq"),
        )
    )
    if scd_strategy == "merge":
        n = _merge_scd_dim(
            wh, "ce_customers", updates, "customer_src_id", "customer_id",
            lambda cur, off: _next_scd1_customers(cur, updates, run_ts, off),
        )
        wh.log("load_3nf_ce_customers_scd1", "SCD1 bucketed merge ok", n)
        return
    if scd_strategy == "tx":
        n = _tx_scd1_merge(
            wh, "ce_customers", updates, "customer_src_id", "customer_id",
            ["customer_name", "market_segment", "city_id", "acctbal"],
            run_ts, "customers",
            next_fn=lambda cur, off: _next_scd1_customers(
                cur, updates, run_ts, off
            ),
        )
        wh.log("load_3nf_ce_customers_scd1", "SCD1 transactional merge ok", n)
        return
    cur = wh.read_or_none("bl_3nf", "ce_customers")
    offset = next_key_offset(cur, "customer_id") if cur is not None else 1
    snap = _next_scd1_customers(cur, updates, run_ts, offset)
    n = wh.overwrite(snap, "bl_3nf", "ce_customers")
    wh.log("load_3nf_ce_customers_scd1", "SCD1 snapshot ok", n)


# --------------------------------------------------------------------------
# 3NF: SCD2 products  [M3]
# --------------------------------------------------------------------------


def _next_scd2_products(
    cur: DataFrame | None,
    updates: DataFrame,
    run_ts: dt.datetime,
    offset: int,
) -> DataFrame:
    """Pure next-state for the products SCD2 dim including per-VERSION
    surrogate ids (reference PRODUCT_ID): survivors keep theirs, new
    versions mint from ``offset``. Shared by snapshot and merge paths."""
    cur_state = cur.drop("product_id") if cur is not None else None
    dim = scd2_apply(
        cur_state,
        updates,
        "product_src_id",
        compare=["unit_price"],
        attrs=["product_name", "brand", "product_type", "subcategory_id"],
        change_order=["change_seq"],
        run_ts=run_ts,
    )
    if cur is not None:
        mapping = cur.select("product_src_id", "start_dt", "product_id")
        dim = dim.join(mapping, on=["product_src_id", "start_dt"], how="left")
    else:
        dim = dim.withColumn("product_id", F.lit(None).cast("bigint"))
    dim = with_distributed_keys(
        dim, "candidate_id", ["product_src_id", "start_dt"], start_at=offset
    )
    dim = dim.withColumn(
        "product_id", F.coalesce(F.col("product_id"), F.col("candidate_id"))
    ).drop("candidate_id")
    # audit from the validity interval: a version is inserted at
    # start_dt and last updated when expired (end_dt + the 1s F12
    # offset); active versions have update = insert
    return (
        dim.withColumn("insert_dt", F.col("start_dt").cast("date"))
        .withColumn(
            "update_dt",
            F.when(
                F.col("is_active") == "Y", F.col("start_dt")
            ).otherwise(F.expr("end_dt + INTERVAL 1 SECOND")).cast("date"),
        )
        .withColumn("source_system", F.lit("staging"))
        .withColumn("source_entity", F.lit("products"))
    )


def load_3nf_products(
    spark: SparkSession,
    wh: Warehouse,
    run_ts: dt.datetime,
    scd_strategy: str = "snapshot",
) -> None:
    prod = wh.read("staging", "products")
    subs = wh.read("bl_3nf", "ce_subcategories").select(
        F.col("subcategory_src_id"), "subcategory_id"
    )
    updates = (
        prod.join(
            F.broadcast(subs),
            prod.p_brand == subs.subcategory_src_id,
            "left",
        )
        .select(
            F.col("p_partkey").cast("bigint").alias("product_src_id"),
            F.col("p_retailprice").cast("double").alias("unit_price"),
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("product_type"),
            F.coalesce(F.col("subcategory_id"), F.lit(DEFAULT_ID)).alias(
                "subcategory_id"
            ),
            # price versions of one part order by load stamp (staging
            # keeps one row per (partkey, price))
            F.col("staged_seq").cast("bigint").alias("change_seq"),
        )
    )
    if scd_strategy == "merge":
        n = _merge_scd_dim(
            wh, "ce_products_scd", updates, "product_src_id", "product_id",
            lambda cur, off: _next_scd2_products(cur, updates, run_ts, off),
        )
        wh.log("load_3nf_ce_products_scd2", "SCD2 bucketed merge ok", n)
        return
    if scd_strategy == "tx":
        n = _tx_scd2_rewrite(
            wh, "ce_products_scd", updates, "product_src_id", "product_id",
            lambda cur, off: _next_scd2_products(cur, updates, run_ts, off),
        )
        wh.log("load_3nf_ce_products_scd2", "SCD2 transactional rewrite ok", n)
        return
    cur = wh.read_or_none("bl_3nf", "ce_products_scd")
    offset = next_key_offset(cur, "product_id") if cur is not None else 1
    dim = _next_scd2_products(cur, updates, run_ts, offset)
    n = wh.overwrite(dim, "bl_3nf", "ce_products_scd")
    wh.log("load_3nf_ce_products_scd2", "SCD2 snapshot ok", n)


# --------------------------------------------------------------------------
# 3NF: stores (M1) + watermark-incremental pre-fact sales (M4)
# --------------------------------------------------------------------------


def load_3nf_stores(
    spark: SparkSession, wh: Warehouse, run_ts: dt.datetime | None = None
) -> None:
    store = wh.read("staging", "stores")
    nat = wh.read("bl_3nf", "ce_nations")
    batch = (
        store.join(
            F.broadcast(nat),
            F.upper(initcap_pg(store.n_name)) == F.upper(nat.nation_name),
            "left",
        )
        .select(
            F.col("s_suppkey").cast("bigint").alias("store_src_id"),
            F.col("s_name").alias("store_name"),
            F.coalesce(F.col("nation_id"), F.lit(DEFAULT_ID)).alias("nation_id"),
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
        .dropDuplicates(["store_src_id"])
    )
    target = wh.read_or_none("bl_3nf", "ce_stores")
    if target is not None:
        batch = batch.join(target.select("store_src_id"), "store_src_id", "left_anti")
    offset = next_key_offset(target, "store_id") if target is not None else 1
    keyed = with_distributed_keys(batch, "store_id", ["store_src_id"], start_at=offset)
    keyed = _with_audit(keyed, "staging", "stores", run_ts)
    n = wh.append(keyed, "bl_3nf", "ce_stores")
    wh.log("load_3nf_ce_stores", "insert-only dim ok", n)


def _run_stamp(run_ts: dt.datetime) -> int:
    """Run-identity stamp: MICROSECOND-resolution epoch integer.
    Second-granularity stamps (the original ``%Y%m%d%H%M%S``) made two
    DISTINCT incremental runs launched within the same wall-clock
    second indistinguishable from a crash replay — the fence silently
    dropped the second batch. At microseconds a collision requires two
    runs constructed in the same microsecond, which run_full_etl's own
    setup work makes unreachable."""
    return int(run_ts.timestamp() * 1_000_000)


def _run_fence(app: str, run_ts: dt.datetime) -> tuple[str, int]:
    """Idempotence fence for one pipeline run: the run identity lives
    in the fence APP NAME (``<app>@<microsecond stamp>``) and the
    version is the constant 1. A crash replay (same run_ts) hits the
    same app at version 1 and is a fenced skip; ANY distinct run is a
    new app and lands — including a run whose wall clock stepped
    BACKWARDS across runs, the r10 residual hazard: under one shared
    app with a monotonic stamp version, an earlier-stamped new run was
    silently aliased to a replay. Ordering never mattered to the fence
    (append order is commit order; catalog pins merge monotonically on
    their own), so moving identity out of the version column removes
    the hazard at the root. Cost: one ~40-byte ``txns`` entry per run
    carried in the manifest — at daily loads that is ~15 KB/decade; a
    fence-retention sweep (Delta's setTransactionRetentionDuration
    analogue) is the upgrade if per-minute schedules ever matter."""
    return (f"{app}@{_run_stamp(run_ts)}", 1)


def _tx_fact_append(
    wh: Warehouse, name: str, batch: DataFrame, run_ts: dt.datetime
) -> int:
    """Fenced transactional fact ingest: the batch appends to a
    commit-log table with a run-stamped idempotence fence
    (Delta txnAppId/txnVersion), so a crash-replayed run at the same
    run_ts lands exactly once WITHOUT re-running the anti-join — and
    readers only ever see whole commits (the atomicity the reference
    gets from loading facts inside a transaction,
    run_full_etl_process.sql). Appends are O(batch); the upstream
    anti-join still dedups across DIFFERENT runs."""
    from data_warehouse_project_spark.sources.txtable import TxError, TxTable

    root = wh.path("bl_3nf", name)
    try:
        t = TxTable(wh.spark, root)
    except TxError:
        if wh.exists("bl_3nf", name):
            raise ValueError(
                f"bl_3nf/{name} exists but is not transactional — it was "
                "built by another scd_strategy; refusing to shadow it"
            ) from None
        # bootstrap as empty-create + fenced append so even the FIRST
        # batch is covered by the replay fence. customer_id in
        # stats_cols gives the join gold view's term-B probe (and any
        # per-customer point query) manifest file skipping instead of a
        # full fact scan — tight after clustering, conservative before
        stats = [
            c for c in ("customer_id", "product_id") if c in batch.columns
        ]
        t = TxTable.create(
            wh.spark, root, batch.limit(0), stats_cols=stats or None
        )
    app, ver = _run_fence(f"etl_{name}", run_ts)
    r = t.append(batch, txn=(app, ver))
    # pin for the end-of-run catalog publish: on a fenced skip the
    # returned version is the LATEST at skip time (possibly a foreign
    # commit) — resolve the version the fence actually committed at
    if r.get("skipped"):
        v = t.txn_commit_version(app, ver)
    else:
        v = int(r["version"])
    wh.record_tx_pin("bl_3nf", name, v)
    return int(r.get("rows_appended", 0))


# incremental gold layer over the transactional fact: output column →
# (fn, integer-exact measure expression). The reference re-derives its
# gold aggregates wholesale every load (dw_etl_tests.py:470-506
# recomputes them to check); these maintain themselves from the fact's
# change feed at O(churn + touched groups).
GOLD_VIEWS: dict[str, tuple[str, dict]] = {
    "sales_by_customer": (
        "customer_id",
        {
            "revenue_cents": ("sum", "cast(round(extended_price * 100) as bigint)"),
            "n_sales": ("count", "sale_src_id"),
            "avg_qty": ("avg", "cast(quantity as bigint)"),
            # incremental statistics (r11): exact second moments fold
            # additively — deletes subtract, never a base repair
            "qty_var": ("var", "cast(quantity as bigint)"),
            "first_order_dt": ("min", "order_dt"),
            "last_order_dt": ("max", "order_dt"),
        },
    ),
    "sales_by_month": (
        "order_month",
        {
            "revenue_cents": ("sum", "cast(round(extended_price * 100) as bigint)"),
            "n_sales": ("count", "sale_src_id"),
            # distinct buyers per month, incrementally maintained as an
            # HLL sketch: appends FOLD (union), deletes dirty-repair —
            # the one ε-approximate gold measure (see txview docstring)
            "approx_buyers": ("approx_distinct", "customer_id"),
            # mergeable histogram (r11): per-month sale-value
            # distribution, deletes subtract per cell — quantiles via
            # functions/histograms.hist_percentile
            "value_hist": {
                "fn": "hist",
                "expr": "cast(round(extended_price) as bigint)",
                "lo": 0, "hi": 120_000, "bins": 24,
            },
        },
    ),
}

# join gold views: fact ⋈ dim GROUP BY a DIM attribute, maintained from
# BOTH change feeds (sources/txjoinview.TxJoinAggView — the bilinear
# delta decomposition). An SCD1 segment change on one customer moves
# exactly that customer's fact rows between groups — CURRENT-state
# reporting, the semantics the reference's brand/geo rollups recompute
# wholesale each run (dw_etl_tests.py:480-506). The dim side joins on
# the surrogate id the fact carries, which ce_customers declares in
# stats_cols, so term-B fact probes AND term-A dim probes both prune.
GOLD_JOIN_VIEWS: dict[str, dict] = {
    "sales_by_segment": {
        "dim": "ce_customers",
        "fk": "customer_id",
        "dim_on": "customer_id",
        "group_expr": "market_segment",
        "group_col": "market_segment",
        "measures": {
            "revenue_cents": ("sum", "cast(round(extended_price * 100) as bigint)"),
            "n_sales": ("count", "sale_src_id"),
            "avg_qty": ("avg", "cast(quantity as bigint)"),
            # extremal measure: rides the dirty-group repair when a
            # correction delete (or a segment move) kills a maximum
            "max_sale_cents": ("max", "cast(round(extended_price * 100) as bigint)"),
            # incremental statistics (r11): per-segment sale-value
            # spread, maintained from BOTH feeds with no repair path
            "sale_cents_var": ("var", "cast(round(extended_price * 100) as bigint)"),
            # distinct buyers per segment — EXACT, transition-maintained
            # (r11): a correction delete decrements occurrence counts
            # and never rescans the bases. (Since r12 the HLL sketch's
            # delete repair is also base-free — per-file partial
            # sketches in the _fparts support — but exact still wins
            # here: buyer-per-segment support state is customer-scale,
            # while the sketch stays the right choice for fact-unique
            # ids like sales_by_month's approx_buyers.)
            "distinct_buyers": ("distinct", "customer_id"),
        },
    },
    # composite group key from ONE dim — the reference's geo-rollup
    # SHAPE (dw_etl_tests.py:494-506 groups by the (country, state)
    # pair): revenue by (brand, product_type) as sold, maintained
    # incrementally. The dim is the SCD2 product table joined on its
    # per-version surrogate, so each sale's brand is the brand AT SALE
    # TIME — versions are unique per product_id, satisfying the
    # no-fanout contract without an is_active filter.
    "sales_by_product_line": {
        "dim": "ce_products_scd",
        "fk": "product_id",
        "dim_on": "product_id",
        "group_expr": ["brand", "product_type"],
        "group_col": ["brand", "product_type"],
        "measures": {
            "revenue_cents": ("sum", "cast(round(extended_price * 100) as bigint)"),
            "n_sales": ("count", "sale_src_id"),
        },
    },
    # TWO dims (fact ⋈ products ⋈ customers), one group column from
    # EACH — the trilinear delta decomposition (txjoinview docstring):
    # a segment move on one customer re-buckets exactly that
    # customer's rows; a brand change exactly that product's.
    "sales_by_brand_segment": {
        "dim": "ce_products_scd",
        "fk": "product_id",
        "dim_on": "product_id",
        "extra_dims": [
            {"dim": "ce_customers", "fk": "customer_id",
             "dim_on": "customer_id"},
        ],
        "group_expr": ["brand", "market_segment"],
        "group_col": ["brand", "market_segment"],
        "group_dims": [0, 1],
        "measures": {
            "revenue_cents": ("sum", "cast(round(extended_price * 100) as bigint)"),
            "n_sales": ("count", "sale_src_id"),
        },
    },
}


class GoldRefreshError(RuntimeError):
    """One or more gold-view creates/refreshes failed. Raised AFTER
    the whole sweep drained and publish ran (r13 ADVICE: the old
    pooled ``ex.map`` let the first failure propagate mid-iteration,
    discarding completed views' results and silently skipping
    publish). ``failures`` maps view name -> error string;
    ``results`` holds the full per-view outcome map, completed
    refreshes included."""

    def __init__(self, failures: dict[str, str], results: dict):
        super().__init__(
            "gold view sweep: "
            + "; ".join(f"{k}: {v}" for k, v in failures.items())
        )
        self.failures = failures
        self.results = results


def refresh_gold_views(
    wh: Warehouse,
    mode: str = "auto",
    publish: dict | None = None,
    max_parallel: int | None = None,
) -> dict[str, dict]:
    """Maintain the incremental gold aggregates over the transactional
    fact (requires ``scd_strategy="tx"`` — ce_sales must be a TxTable).
    First call full-computes each view at the fact's current version;
    later calls fold ONLY the unconsumed change-feed range into the
    touched groups, exactly-once under crash replay (the view fence
    commits with the view files). Views live under
    ``<root>/gold_views/<name>`` as TxTables of their own (time travel,
    vacuum); read them through ``TxAggView.read()`` — exact SQL
    aggregate semantics, equal to a full GROUP BY recompute after every
    refresh (pinned in tests/test_etl_tx.py).

    ``mode="auto"`` (default) encodes the measured crossover
    (COVERAGE.md round 9: below ~10M fact rows a full recompute is
    FASTER — a 457k-row fact recomputes in ~1.2 s while the fold
    carries ~3-7 s of fixed plan cost): each view picks recompute vs
    incremental from manifest metadata alone (live base rows + the
    unconsumed churn's file rows — zero Spark jobs,
    ``TxAggView.refresh``), landing the identical state either way.
    ``mode="incremental"`` / ``"recompute"`` force a path — the
    incremental fold is the 100 TB design: O(churn + touched groups)
    while recompute is O(base).

    The sweep shares ONE :class:`ChurnCache` across every view: the
    unconsumed fact-churn window (and any dim feeds / churned-file
    re-partial reads) materializes once as a localCheckpoint and all
    6+ views fold from the cached blocks — without it each refresh
    independently re-read the same window and paid its own fixed plan
    cost (r12 verdict's top perf finding; the reference's master proc
    likewise drives every downstream load from one orchestrated pass,
    run_full_etl_process.sql:36-104)."""
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxError
    from data_warehouse_project_spark.sources.txview import (
        ChurnCache,
        TxAggView,
    )

    if not wh.is_tx("bl_3nf", "ce_sales"):
        raise ValueError(
            "refresh_gold_views needs the transactional fact — run the "
            "pipeline with scd_strategy='tx' first"
        )
    base = wh.tx("bl_3nf", "ce_sales")
    out: dict[str, dict] = {}
    cache = ChurnCache()
    n_views = len(GOLD_VIEWS) + len(GOLD_JOIN_VIEWS)
    if max_parallel is None:
        # adaptive (r13 verdict item 7): pool every registered view at
        # once, capped well under the executor thread count so the
        # concurrent folds' jobs still get executor slots each
        max_parallel = min(8, n_views)
    jobs: list[tuple[str, object]] = []
    creates: list[tuple[str, object]] = []  # (name, thunk(src))
    for name, (group_col, measures) in GOLD_VIEWS.items():
        root = wh.root / "gold_views" / name
        try:
            jobs.append((name, TxAggView(wh.spark, root)))
        except TxError:
            def _mk_agg(name=name, root=root, group_col=group_col,
                        measures=measures):
                def thunk(src):
                    v = TxAggView.create(
                        wh.spark, root, base, group_col=group_col,
                        measures=measures, src=src,
                    )
                    return {"created": True,
                            "base_version": v.applied_base_version()}
                return thunk
            creates.append((name, _mk_agg()))
    for name, jspec in GOLD_JOIN_VIEWS.items():
        root = wh.root / "gold_views" / name
        try:
            jobs.append((name, TxJoinAggView(wh.spark, root)))
        except TxError:
            def _mk_join(name=name, root=root, jspec=jspec):
                def thunk(src):
                    extra = [
                        {"dim": wh.tx("bl_3nf", e["dim"]), "fk": e["fk"],
                         "dim_on": e.get("dim_on")}
                        for e in jspec.get("extra_dims", [])
                    ]
                    v = TxJoinAggView.create(
                        wh.spark, root, base, wh.tx("bl_3nf", jspec["dim"]),
                        fk=jspec["fk"], group_expr=jspec["group_expr"],
                        group_col=jspec["group_col"],
                        measures=jspec["measures"],
                        dim_on=jspec.get("dim_on"),
                        extra_dims=extra or None,
                        group_dims=jspec.get("group_dims"),
                        src=src,
                    )
                    return {"created": True,
                            "base_versions": v.applied_versions()}
                return thunk
            creates.append((name, _mk_join()))

    if creates:
        # first-call full computes SHARE one base read (r13 verdict
        # item 6: the sequential creates each re-scanned the fact —
        # 6+ scans for one sweep). The snapshot materializes EAGERLY
        # once, then every create's aggregation (and any distinct/topk
        # support build) reads the cached blocks; creates land in
        # DISJOINT roots, so they also run concurrently like the
        # refresh sweep below.
        shared = base.read(base.latest_version()).localCheckpoint(
            eager=True
        )

        def _create(nt):
            name, thunk = nt
            t0 = time.perf_counter()
            try:
                r = thunk(shared)
                r["secs"] = round(time.perf_counter() - t0, 3)
                return name, r
            except Exception as exc:  # contained per view (r13 ADVICE)
                return name, {"error": f"{type(exc).__name__}: {exc}"}

        if len(creates) > 1 and max_parallel > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(max_parallel, len(creates))
            ) as ex:
                for name, r in ex.map(_create, creates):
                    out[name] = r
        else:
            for nt in creates:
                name, r = _create(nt)
                out[name] = r

    def _run(nv):
        name, v = nv
        t0 = time.perf_counter()
        # per-view containment (r13 ADVICE): one failing refresh must
        # not discard the sweep's completed results, abandon the rest
        # of the pool, or silently skip publish — errors collect into
        # out[name] and re-raise AFTER the drain + publish
        try:
            r = v.refresh(mode=mode, cache=cache)
            r["secs"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            r = {"error": f"{type(exc).__name__}: {exc}"}
        return name, r

    # ALL views fold CONCURRENTLY (r14) — they commit to DISJOINT
    # TxTables (per-table os.link claims, no shared state beyond the
    # read-only cache, which locks its dict), and on a real cluster
    # concurrent jobs are how independent view maintenance hides
    # per-job scheduling latency; locally the same effect overlaps
    # each fold's driver-side planning with the others' executor work.
    # The sweep's shared churn checkpoint is PRIMED first with one
    # cheap action (ChurnCache.prime) instead of the old rule of
    # running the first view alone to materialize it — at sf1 the
    # first view was also the most expensive, so the wall was
    # first + max(rest); now it is prime + max(all).
    if jobs:
        if mode != "recompute" and (
            mode == "incremental"
            or base.row_count() >= TxAggView.RECOMPUTE_FLOOR_ROWS
        ):
            target = base.latest_version()
            for lo in {v.applied_versions()[0] + 1 for _, v in jobs}:
                if lo <= target:
                    cache.prime(base, lo, target)
        if len(jobs) > 1 and max_parallel > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(max_parallel, len(jobs))
            ) as ex:
                for name, r in ex.map(_run, jobs):
                    out[name] = r
        else:
            for nv in jobs:
                name, r = _run(nv)
                out[name] = r
    if publish is not None:
        # publish-on-refresh: the metastore/DuckDB surface tracks gold
        # automatically — aggregate-scale writes only (gold_only), the
        # previous published version retained for readers mid-query and
        # older ones reaped (catalog_publish's retention window). Runs
        # even when a view failed: the healthy views' committed state
        # deserves its publish; the failed view's published snapshot
        # just stays at its previous (consistent) version.
        wh.catalog_publish(gold_only=True, **publish)
    failures = {
        k: v["error"] for k, v in out.items()
        if isinstance(v, dict) and "error" in v
    }
    if failures:
        raise GoldRefreshError(failures, out)
    return out


def gold_router(wh: Warehouse):
    """Aggregate navigator over every MATERIALIZED gold view (the ones
    ``refresh_gold_views`` has created under ``<root>/gold_views``):
    ``gold_router(wh).route(["brand"], {"rev": ...})`` answers a
    dashboard query from the cheapest rollup that can derive it —
    O(view rows), base fact untouched — or raises ``NoRouteError``
    naming why each candidate refused (see sources/txrouter). The
    automated version of the reference pointing BI at hand-picked
    marts (readme.md Data Analysis)."""
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxError
    from data_warehouse_project_spark.sources.txview import TxAggView

    router = AggRouter(wh.spark)
    for name, cls in [(n, TxAggView) for n in GOLD_VIEWS] + [
        (n, TxJoinAggView) for n in GOLD_JOIN_VIEWS
    ]:
        try:
            router.register(cls(wh.spark, wh.root / "gold_views" / name))
        except TxError:
            pass  # not materialized yet — routing sees what exists
    return router


def load_3nf_sales(
    spark: SparkSession,
    wh: Warehouse,
    run_ts: dt.datetime | None = None,
    scd_strategy: str = "snapshot",
) -> None:
    """M4: watermark filter (P4) + surrogate resolution as left joins
    (J5 decorrelated) + natural-key anti-join append (J6).

    Scale notes: the customer dimension grows with the data, so its join
    carries NO broadcast hint — AQE converts to broadcast while it is
    small and falls back to a shuffled join when it is not (a forced
    broadcast OOMs at 100×). The idempotence anti-join reads only the
    target's order_month partitions inside the 30-day lateness window,
    not the full history (O(batch), not O(fact))."""
    sales = wh.read("staging", "sales")
    target = wh.read_or_none("bl_3nf", "ce_sales")

    typed = sales.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("sale_src_id"),
        F.col("l_orderkey").cast("bigint").alias("order_key"),
        F.col("l_partkey").cast("bigint").alias("product_src_id"),
        F.col("l_suppkey").cast("bigint").alias("store_src_id"),
        F.col("o_custkey").cast("bigint").alias("customer_src_id"),
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extended_price"),
        F.col("o_orderdate").cast("timestamp").cast("date").alias("order_dt"),
    )

    # P4: incremental watermark on order date vs MAX(loaded), with a
    # 30-day lateness allowance
    cutoff = None
    if target is not None:
        wm = target.agg(F.max("order_dt")).first()[0]
        if wm is not None:
            cutoff = wm - dt.timedelta(days=30)
            typed = typed.filter(F.col("order_dt") > F.lit(cutoff))

    cust = wh.read("bl_3nf", "ce_customers").select("customer_src_id", "customer_id")
    prod = (
        wh.read("bl_3nf", "ce_products_scd")
        .filter(F.col("is_active") == "Y")  # P3: active-version join
        .select("product_src_id", "product_id", "unit_price")
    )
    store = wh.read("bl_3nf", "ce_stores").select("store_src_id", "store_id")

    # no forced broadcasts: ALL three dims scale with the data (part and
    # supplier are SF-linear in TPC-H, products additionally grow SCD2
    # versions) — a broadcast hint that works at sf0.1 OOMs at 100x.
    # AQE converts any join whose build side is actually small at
    # runtime, which is the same physical plan locally without baking
    # the assumption into the code.
    resolved = (
        typed.join(cust, "customer_src_id", "left")
        .join(prod, "product_src_id", "left")
        .join(store, "store_src_id", "left")
        .select(
            "sale_src_id",
            "order_key",
            F.coalesce("customer_id", F.lit(DEFAULT_ID)).alias("customer_id"),
            F.coalesce("product_id", F.lit(DEFAULT_ID)).alias("product_id"),
            F.coalesce("store_id", F.lit(DEFAULT_ID)).alias("store_id"),
            "quantity",
            "extended_price",
            "order_dt",
            F.date_format("order_dt", "yyyyMM").alias("order_month"),
        )
    )
    if target is not None:
        tgt_keys = target
        if cutoff is not None:
            # only partitions overlapping the incoming batch can collide:
            # yyyyMM strings order like dates, so this prunes at the scan
            tgt_keys = tgt_keys.filter(
                F.col("order_month") >= dt.date.strftime(cutoff, "%Y%m")
            )
        resolved = resolved.join(
            tgt_keys.select("sale_src_id"), "sale_src_id", "left_anti"
        )
    resolved = _with_audit(resolved, "staging", "sales", run_ts)
    if scd_strategy == "tx":
        n = _tx_fact_append(wh, "ce_sales", resolved, run_ts or dt.datetime.now())
        wh.log("load_3nf_ce_sales", "fenced transactional fact append ok", n)
        return
    n = wh.append(resolved, "bl_3nf", "ce_sales", partition_by=["order_month"])
    wh.log("load_3nf_ce_sales", "incremental fact append ok", n)


# --------------------------------------------------------------------------
# DM: date dim (M5), denormalized dims (J7), partitioned fact (S7/J8)
# --------------------------------------------------------------------------


def load_dim_dates(
    spark: SparkSession, wh: Warehouse, run_ts: dt.datetime | None = None
) -> None:
    mm = wh.footer_min_max("bl_3nf", "ce_sales", "order_dt")
    if mm is not None:
        # A3 via parquet footers: the fact table's date endpoints are
        # exact DATE statistics — a metadata read replaces the full
        # fact scan that made this constant-output stage the first to
        # bend in the sf2→sf4 smoke (3.2× wall per 2× rows). add_months
        # matched in SQL below so both paths stay byte-identical.
        bounds = wh.spark.range(1).select(
            F.add_months(F.lit(mm[0]), -1).alias("start_d"),
            F.add_months(F.lit(mm[1]), 1).alias("end_d"),
        )
    else:
        sales = wh.read("bl_3nf", "ce_sales")
        bounds = sales.agg(
            F.add_months(F.min("order_dt"), -1).alias("start_d"),
            F.add_months(F.max("order_dt"), 1).alias("end_d"),
        )
    days = bounds.select(F.explode(F.sequence("start_d", "end_d")).alias("date_id"))
    # full 17-attribute projection (D1-D17), same schema as the
    # oracle-checked dim_dates query
    dim = date_attributes(days)
    existing = wh.read_or_none("bl_dm", "dim_dates")
    if existing is not None:
        dim = dim.join(existing.select("date_id"), "date_id", "left_anti")
    dim = _with_audit(dim, "bl_3nf", "ce_sales", run_ts)
    n = wh.append(dim, "bl_dm", "dim_dates")
    wh.log("load_dim_dates", "auto-ranged date dim ok", n)


def load_dm_dims(
    spark: SparkSession, wh: Warehouse, run_ts: dt.datetime | None = None
) -> None:
    # J7: flatten the 4-level geo snowflake (city→state→nation→region,
    # reference load_dim_customers_dimension_scd_type1.sql:86-95) and the
    # product hierarchy (scd⋈subcategory⋈category, :43-51) into the dims
    nat = wh.read("bl_3nf", "ce_nations")
    reg = wh.read("bl_3nf", "ce_regions")
    ngeo = nat.join(F.broadcast(reg), "region_id", "left").select(
        "nation_id",
        F.col("nation_name"),
        F.coalesce("region_name", F.lit(NA)).alias("region_name"),
    )
    cit = wh.read("bl_3nf", "ce_cities")
    st = wh.read("bl_3nf", "ce_states")
    geo = (
        cit.join(F.broadcast(st), "state_id", "left")
        .join(F.broadcast(ngeo), "nation_id", "left")
        .select(
            "city_id",
            F.coalesce("district", F.lit(NA)).alias("district"),
            F.coalesce("segment", F.lit(NA)).alias("state_segment"),
            F.coalesce("nation_name", F.lit(NA)).alias("nation_name"),
            F.coalesce("region_name", F.lit(NA)).alias("region_name"),
        )
    )

    cust = wh.read("bl_3nf", "ce_customers")
    dim_customers = cust.join(F.broadcast(geo), "city_id", "left").select(
        "customer_id",
        "customer_src_id",
        "customer_name",
        "market_segment",
        F.coalesce("district", F.lit(NA)).alias("district"),
        F.coalesce("state_segment", F.lit(NA)).alias("state_segment"),
        F.coalesce("nation_name", F.lit(NA)).alias("nation_name"),
        F.coalesce("region_name", F.lit(NA)).alias("region_name"),
    )
    dim_customers = _with_audit(
        dim_customers, "bl_3nf", "ce_customers", run_ts, overwrite=True
    )
    n = wh.overwrite(dim_customers, "bl_dm", "dim_customers")
    wh.log("load_dim_customers", "denormalized dim ok", n)

    # drop is a no-op when absent: __bucket exists only under the
    # merge SCD strategy and must not leak into the DM layer
    prod = wh.read("bl_3nf", "ce_products_scd").drop("__bucket")
    subs = wh.read("bl_3nf", "ce_subcategories")
    cats = wh.read("bl_3nf", "ce_categories")
    hier = subs.join(F.broadcast(cats), "category_id", "left").select(
        "subcategory_id",
        F.col("subcategory_src_id").alias("subcategory_name"),
        F.coalesce("category_src_id", F.lit(NA)).alias("category_name"),
    )
    dim_products = prod.join(F.broadcast(hier), "subcategory_id", "left").withColumn(
        "subcategory_name", F.coalesce("subcategory_name", F.lit(NA))
    ).withColumn("category_name", F.coalesce("category_name", F.lit(NA)))
    dim_products = _with_audit(
        dim_products, "bl_3nf", "ce_products_scd", run_ts, overwrite=True
    )
    n = wh.overwrite(dim_products, "bl_dm", "dim_products_scd")
    wh.log("load_dim_products", "SCD2 dim ok", n)

    store = wh.read("bl_3nf", "ce_stores")
    dim_stores = store.join(F.broadcast(ngeo), "nation_id", "left").select(
        "store_id",
        "store_src_id",
        "store_name",
        F.coalesce("nation_name", F.lit(NA)).alias("nation_name"),
        F.coalesce("region_name", F.lit(NA)).alias("region_name"),
    )
    dim_stores = _with_audit(
        dim_stores, "bl_3nf", "ce_stores", run_ts, overwrite=True
    )
    n = wh.overwrite(dim_stores, "bl_dm", "dim_stores")
    wh.log("load_dim_stores", "denormalized dim ok", n)


def load_fct_sales(
    spark: SparkSession, wh: Warehouse, run_ts: dt.datetime | None = None
) -> None:
    """S7: month-partitioned fact — partitionBy replaces the reference's
    manual RANGE-partition bookkeeping
    (load_fct_sales_fact_table_dimensional_layer.sql:26-102); partition
    pruning on order_month is automatic."""
    sales = wh.read("bl_3nf", "ce_sales")
    target = wh.read_or_none("bl_dm", "fct_sales")

    # same watermark discipline as the 3NF layer: rows older than the
    # 30-day lateness window are already in the fact by induction, so
    # both the incoming scan and the idempotence anti-join read only the
    # overlapping order_month partitions (S9 introspection lists them)
    cutoff_month = None
    if target is not None:
        wm = target.agg(F.max("sale_order_dt")).first()[0]
        if wm is not None:
            cutoff_month = dt.date.strftime(wm - dt.timedelta(days=30), "%Y%m")
            sales = sales.filter(F.col("order_month") >= cutoff_month)

    fct = sales.select(
        "sale_src_id",
        "customer_id",
        "product_id",
        "store_id",
        F.col("order_dt").alias("sale_order_dt"),
        "quantity",
        "extended_price",
        "order_month",
    )
    if target is not None:
        tgt_keys = target
        if cutoff_month is not None:
            overlap = [
                m
                for m in wh.partitions("bl_dm", "fct_sales", "order_month")
                if m >= cutoff_month
            ]
            tgt_keys = tgt_keys.filter(F.col("order_month").isin(overlap))
        fct = fct.join(tgt_keys.select("sale_src_id"), "sale_src_id", "left_anti")
    fct = _with_audit(fct, "bl_3nf", "ce_sales", run_ts, overwrite=True)
    n = wh.append(fct, "bl_dm", "fct_sales", partition_by=["order_month"])
    wh.log("load_fct_sales", "partitioned fact append ok", n)


# --------------------------------------------------------------------------
# orchestrator  [O1 O2]
# --------------------------------------------------------------------------

def load_fct_events(
    spark: SparkSession,
    wh: Warehouse,
    src_dir: str,
    run_ts: dt.datetime | None = None,
) -> None:
    """Beyond-reference telemetry mart: hourly rollup of the ``events``
    stream's batch view into a date-partitioned fact — the batch twin
    of streaming/windows.py's tumbling counts (stream-batch
    unification: same grain, same aggregates).

    Idempotence + late data (P4/J6, amended r5): an hourly COUNT is not
    append-safe — the first run inevitably loads the in-progress hour,
    and an anti-join at the (hour, type) grain would freeze that partial
    count forever, silently dropping every late event. Instead each run
    RECOMPUTES the rollup for all event_dates inside the 1-day lateness
    window behind MAX(event_hour) and atomically swaps exactly those
    date partitions (``Warehouse.overwrite_partitions``) — loaded
    partitions are replaced, never appended to, so late events within
    the window always land. At scale the source scan is pruned to the
    lateness window by the pushed-down ``ts`` predicate (~2 days of
    events per run, whatever the table's history), and the rollup is a
    single partial-aggregated shuffle on (hour, type). Events later
    than the lateness window are dropped by contract, exactly like the
    streaming twin's watermark.

    The events table is a beyond-reference source: a source directory
    without it (e.g. the reference-shaped CSV entry point) skips this
    stage with a log line rather than failing the pipeline."""
    import os

    if not os.path.exists(f"{src_dir}/events.parquet"):
        wh.log("load_fct_events", "skipped: source has no events table", 0)
        return
    ev = table(spark, src_dir, "events")
    target = wh.read_or_none("bl_dm", "fct_events")
    wm = target.agg(F.max("event_hour")).first()[0] if target is not None else None
    if wm is not None:
        # whole affected DATES are recomputed (a partition is the swap
        # unit), so the scan starts at midnight of the cutoff's date
        cutoff_date = (wm - dt.timedelta(days=1)).date()
        ev = ev.filter(F.to_date(F.col("ts")) >= F.lit(cutoff_date))
    hour = F.date_trunc("hour", F.col("ts"))
    rolled = (
        ev.groupBy(
            hour.alias("event_hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .withColumn("event_date", F.col("event_hour").cast("date").cast("string"))
    )
    rolled = _with_audit(rolled, "source", "events", run_ts)
    if wm is None:
        n = wh.append(rolled, "bl_dm", "fct_events", partition_by=["event_date"])
        wh.log("load_fct_events", "hourly events mart initial load ok", n)
    else:
        # swap exactly the recomputed date partitions; untouched history
        # stays physically in place
        n = wh.overwrite_partitions(rolled, "bl_dm", "fct_events", "event_date")
        wh.log("load_fct_events", "hourly events mart lateness-window recompute ok", n)


def run_full_etl(
    spark: SparkSession,
    src_dir: str,
    warehouse_root: str,
    run_ts: dt.datetime | None = None,
    src_format: str = "parquet",
    scd_strategy: str = "snapshot",
) -> dict[str, float]:
    """Execute all stages in the reference's topological order with
    per-stage exception trap + log (O2). Returns stage -> seconds.

    ``src_format="csv"`` ingests ``<src_dir>/<table>.csv`` through the
    S1 encoding-fallback reader instead of parquet (reference §3.1
    entry point); everything downstream of staging is identical.

    ``scd_strategy="merge"`` maintains the SCD dims via bucketed
    partition-scoped rewrites (only the hash buckets containing batch
    keys are touched) instead of full-snapshot overwrites — the scale
    path for low-churn dimensions.

    ``scd_strategy="tx"`` stores the SCD dims and the 3NF fact as
    transactional commit-log tables (sources/txtable.TxTable): SCD1
    runs through an atomic MERGE with file-level pruning, SCD2's
    expire+insert lands in ONE commit, and fact batches append behind a
    run-stamped idempotence fence — the closest execution model to the
    reference's in-transaction ON CONFLICT loads, with time travel and
    concurrent-writer safety on top. Downstream stages read the tx
    tables transparently through ``Warehouse.read``. The run ends with
    a WHOLE-RUN atomic publish: one ``TxCatalog`` commit under
    ``<root>/_txcatalog`` pins every tx-table version this run
    committed, so ``Warehouse.snapshot_reader()`` readers only ever
    see complete runs (a crash mid-pipeline leaves them on the
    previous run's consistent cross-table snapshot; the rerun
    publishes exactly once, fenced per run stamp).
    """
    if scd_strategy not in ("snapshot", "merge", "tx"):
        raise ValueError(f"scd_strategy: {scd_strategy!r}")
    wh = Warehouse(spark, warehouse_root)
    # recover any state a previous interrupted run left behind (restores
    # orphaned .old snapshots, clears scratch dirs) before loading; the
    # default age guard keeps this safe if another writer shares the root
    recovered = wh.vacuum()
    if recovered["restored"] or recovered["removed"]:
        wh.log("vacuum", f"startup recovery: {recovered}", 0)
    run_ts = run_ts or dt.datetime.now()
    timings: dict[str, float] = {}

    # Stage DAG, executed phase by phase; stages within a phase have no
    # mutual dependency and run concurrently (Spark's scheduler accepts
    # jobs from many threads — on a cluster this keeps executors busy
    # through the small-dimension stages instead of round-tripping one
    # tiny job at a time). The reference runs strictly sequentially
    # (run_full_etl_process.sql:36-104); the topological ORDER is
    # preserved, only independent branches overlap.
    phases: list[list[tuple[str, object]]] = [
        [("staging", lambda: load_staging(spark, wh, src_dir, src_format))],
        [
            ("3nf_geo", lambda: load_3nf_geo(spark, wh, run_ts)),
            ("3nf_product_hier", lambda: load_3nf_product_hierarchy(spark, wh, run_ts)),
        ],
        [
            (
                "3nf_customers",
                lambda: load_3nf_customers(spark, wh, run_ts, scd_strategy),
            ),
            (
                "3nf_products",
                lambda: load_3nf_products(spark, wh, run_ts, scd_strategy),
            ),
            ("3nf_stores", lambda: load_3nf_stores(spark, wh, run_ts)),
        ],
        [("3nf_sales", lambda: load_3nf_sales(spark, wh, run_ts, scd_strategy))],
        [
            ("dim_dates", lambda: load_dim_dates(spark, wh, run_ts)),
            ("fct_events", lambda: load_fct_events(spark, wh, src_dir, run_ts)),
            ("dm_dims", lambda: load_dm_dims(spark, wh, run_ts)),
        ],
        [("fct_sales", lambda: load_fct_sales(spark, wh, run_ts))],
    ]

    def _run_stage(stage: str, fn) -> None:
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — O2: trap, log, re-raise
            wh.log(f"etl_{stage}", "stage failed", 0, error=traceback.format_exc())
            raise RuntimeError(f"ETL stage {stage} failed: {e}") from e
        finally:
            timings[stage] = round(time.perf_counter() - t0, 3)

    for phase in phases:
        if len(phase) == 1:
            stage, fn = phase[0]
            try:
                _run_stage(stage, fn)
            except RuntimeError:
                wh.flush_log()
                raise
        else:
            with ThreadPoolExecutor(max_workers=len(phase)) as pool:
                futures = {
                    pool.submit(_run_stage, stage, fn): stage for stage, fn in phase
                }
                errors = [f.exception() for f in futures if f.exception()]
            if errors:
                wh.flush_log()
                raise errors[0]
    if scd_strategy == "tx" and wh.tx_pins:
        # whole-run atomic publish: ONE catalog commit pins every tx
        # table version this run committed, fenced per run stamp. A
        # crash anywhere above leaves the catalog at the previous run's
        # pins — Warehouse.snapshot_reader() readers never observe a
        # cross-table-inconsistent warehouse (the reference's analogue
        # is per-procedure transactions, run_full_etl_process.sql:36-104,
        # strengthened here to the whole run); the rerun replays each
        # idempotent stage and publishes exactly once.
        t0 = time.perf_counter()
        cat = wh.tx_catalog(create=True)
        r = cat.pin(dict(wh.tx_pins), txn=_run_fence("etl_run", run_ts))
        timings["catalog_publish"] = round(time.perf_counter() - t0, 3)
        wh.log(
            "catalog_publish",
            f"pinned {sorted(wh.tx_pins)} at catalog v{r.get('version')}"
            + (" (fenced replay, skipped)" if r.get("skipped") else ""),
            len(wh.tx_pins),
        )
    wh.log("run_full_etl", "pipeline complete", 0)
    wh.flush_log()
    return timings
