"""Pipeline invariants — the reference's Critical/Extended test tiers
(dw_etl_tests.py:200-302, :371-406): layer count conservation, no
unresolved dimension references, SCD structure, idempotent re-run."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.etl import Warehouse, run_full_etl
from tests.conftest import SF_SMOKE

T0 = dt.datetime(2025, 1, 1)
T1 = dt.datetime(2025, 2, 1)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh"))
    run_full_etl(spark, SF_SMOKE, root, run_ts=T0)
    return Warehouse(spark, root)


def test_count_conservation(spark, warehouse):
    staged = warehouse.read("staging", "sales").count()
    pre_fact = warehouse.read("bl_3nf", "ce_sales").count()
    fact = warehouse.read("bl_dm", "fct_sales").count()
    assert staged == pre_fact == fact  # exact conservation (ref: ±10%)
    assert fact > 0


def test_no_unresolved_dim_references(spark, warehouse):
    fct = warehouse.read("bl_dm", "fct_sales")
    bad = fct.filter(
        (F.col("customer_id") == -1)
        | (F.col("product_id") == -1)
        | (F.col("store_id") == -1)
    ).count()
    assert bad == 0


def test_geo_dims_have_default_rows(spark, warehouse):
    for name, id_col in (("ce_regions", "region_id"), ("ce_nations", "nation_id")):
        dim = warehouse.read("bl_3nf", name)
        assert dim.filter(F.col(id_col) == -1).count() == 1
        # surrogate keys unique
        assert dim.select(id_col).distinct().count() == dim.count()


def test_hierarchy_fk_integrity(spark, warehouse):
    """J11: every FK along the 4-level geo chain and the product chain
    resolves (left_anti orphan count == 0 — the reference's declared FK
    constraints, create_ddl_objects_3NF_layer.sql:52-128, recreated as
    post-load checks)."""
    chains = (
        ("ce_cities", "state_id", "ce_states"),
        ("ce_states", "nation_id", "ce_nations"),
        ("ce_nations", "region_id", "ce_regions"),
        ("ce_customers", "city_id", "ce_cities"),
        ("ce_subcategories", "category_id", "ce_categories"),
        ("ce_products_scd", "subcategory_id", "ce_subcategories"),
    )
    for child, fk, parent in chains:
        c = warehouse.read("bl_3nf", child)
        p = warehouse.read("bl_3nf", parent)
        orphans = c.join(p.select(F.col(fk)), on=fk, how="left_anti").count()
        assert orphans == 0, f"{child}.{fk} has {orphans} orphans vs {parent}"


def test_geo_chain_resolves_4_deep(spark, warehouse):
    """A customer walks city→state→nation→region to a real region (the
    denormalized dim carries all four levels, none NULL)."""
    dimc = warehouse.read("bl_dm", "dim_customers")
    assert {"district", "state_segment", "nation_name", "region_name"} <= set(
        dimc.columns
    )
    resolved = dimc.filter(
        (F.col("region_name") != "n.a.") & (F.col("district") != "n.a.")
    ).count()
    assert resolved > 0
    for col in ("district", "state_segment", "nation_name", "region_name"):
        assert dimc.filter(F.col(col).isNull()).count() == 0


def test_product_hierarchy_flattened(spark, warehouse):
    dimp = warehouse.read("bl_dm", "dim_products_scd")
    assert {"subcategory_name", "category_name"} <= set(dimp.columns)
    # TPC-H invariant: Brand#ij nests under category Brand#i
    mismatched = dimp.filter(
        (F.col("category_name") != "n.a.")
        & (F.substring("subcategory_name", 1, 7) != F.col("category_name"))
    ).count()
    assert mismatched == 0


def test_scd2_single_active_version(spark, warehouse):
    prods = warehouse.read("bl_3nf", "ce_products_scd")
    per_key = (
        prods.filter(F.col("is_active") == "Y").groupBy("product_src_id").count()
    )
    assert per_key.filter(F.col("count") != 1).count() == 0
    # every version has a unique surrogate id
    assert prods.select("product_id").distinct().count() == prods.count()


def test_dim_denormalization_flattens_geo(spark, warehouse):
    dimc = warehouse.read("bl_dm", "dim_customers")
    assert {"nation_name", "region_name"} <= set(dimc.columns)
    assert dimc.filter(F.col("region_name").isNull()).count() == 0


def test_fact_partitioned_by_month(spark, warehouse):
    path = warehouse.path("bl_dm", "fct_sales")
    parts = [p.name for p in path.iterdir() if p.name.startswith("order_month=")]
    assert len(parts) > 12  # ~6.5 years of orders → many monthly partitions


def test_etl_log_written(spark, warehouse):
    log = warehouse.read_log()
    names = {r["procedure_name"] for r in log.collect()}
    assert "load_staging_sales" in names
    assert "run_full_etl" in names
    assert log.filter(F.col("error_message").isNotNull()).count() == 0


def test_log_rollup(spark, warehouse):
    """A11: the lineage rollup aggregates the run log per procedure —
    golden-checked here because etl_log is not a driver oracle table."""
    roll = {r["procedure_name"]: r for r in warehouse.log_rollup().collect()}
    assert "load_staging_sales" in roll
    assert "load_3nf_ce_cities" in roll
    for name, r in roll.items():
        assert r["n_runs"] >= 1, name
        assert r["n_errors"] == 0, name
        assert r["last_run_ts"] is not None, name
    assert roll["load_staging_sales"]["total_rows"] > 0


def test_partition_introspection(spark, warehouse):
    """S9: partitions() lists the fact's order_month values from the
    self-describing directory layout."""
    months = warehouse.partitions("bl_dm", "fct_sales", "order_month")
    assert len(months) > 12
    assert months == sorted(months)
    assert all(len(m) == 6 and m.isdigit() for m in months)
    # the 3NF pre-fact is partitioned the same way for the pruned anti-join
    assert len(warehouse.partitions("bl_3nf", "ce_sales", "order_month")) > 12


def test_compaction_preserves_data(spark, warehouse):
    """compact() must shrink the file count without changing rows —
    including on the month-partitioned fact."""
    before_rows = warehouse.read("bl_3nf", "ce_nations").count()
    n = warehouse.compact("bl_3nf", "ce_nations")
    assert n == before_rows
    assert warehouse.data_file_count("bl_3nf", "ce_nations") == 1
    assert warehouse.read("bl_3nf", "ce_nations").count() == before_rows

    fact_rows = warehouse.read("bl_dm", "fct_sales").count()
    months = warehouse.partitions("bl_dm", "fct_sales", "order_month")
    n = warehouse.compact("bl_dm", "fct_sales", partition_by=["order_month"])
    assert n == fact_rows
    # one file per month partition after compaction
    assert warehouse.data_file_count("bl_dm", "fct_sales") == len(months)
    assert warehouse.partitions("bl_dm", "fct_sales", "order_month") == months


def test_idempotent_rerun(spark, warehouse):
    before = {
        (layer, t): warehouse.read(layer, t).count()
        for layer, t in (
            ("staging", "sales"),
            ("bl_3nf", "ce_sales"),
            ("bl_3nf", "ce_products_scd"),
            ("bl_3nf", "ce_customers"),
            ("bl_dm", "fct_sales"),
        )
    }
    run_full_etl(spark, SF_SMOKE, str(warehouse.root), run_ts=T1)
    after = {
        (layer, t): warehouse.read(layer, t).count() for (layer, t) in before
    }
    assert before == after  # re-run adds nothing (Extended tier :371-406)


def test_audit_columns_on_every_warehouse_table(spark, warehouse):
    """Reference parity (SURVEY §1.3): INSERT_DT / UPDATE_DT /
    SOURCE_SYSTEM / SOURCE_ENTITY on every 3NF and DM table; seeded
    default rows carry the 1900-01-01 / MANUAL sentinels
    (load_3nf_ce_countries_table.sql:85-92)."""
    wh = warehouse
    tables = [
        ("bl_3nf", t)
        for t in (
            "ce_regions", "ce_nations", "ce_states", "ce_cities",
            "ce_categories", "ce_subcategories", "ce_customers",
            "ce_products_scd", "ce_stores", "ce_sales",
        )
    ] + [
        ("bl_dm", t)
        for t in ("dim_dates", "dim_customers", "dim_products_scd",
                  "dim_stores", "fct_sales")
    ]
    for layer, name in tables:
        cols = set(wh.read(layer, name).columns)
        missing = {"insert_dt", "update_dt", "source_system", "source_entity"} - cols
        assert not missing, f"{layer}.{name} missing audit columns {missing}"

    regions = wh.read("bl_3nf", "ce_regions")
    sentinel = regions.filter("region_id = -1").collect()
    assert len(sentinel) == 1
    assert sentinel[0]["source_system"] == "MANUAL"
    assert str(sentinel[0]["insert_dt"]) == "1900-01-01"


def test_fct_events_hourly_mart(spark, warehouse):
    """Hourly events rollup: conservation vs a direct aggregate of the
    source, date-partitioned layout, idempotent rerun (stream-batch
    unification twin of streaming tumbling counts)."""
    from data_warehouse_project_spark.catalog import table as cat_table

    wh = warehouse
    fct = wh.read("bl_dm", "fct_events")
    src = cat_table(spark, SF_SMOKE, "events")
    assert fct.agg(F.sum("n_events")).first()[0] == src.count()
    direct = src.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).count()
    assert fct.count() == direct.count()
    assert wh.partitions("bl_dm", "fct_events", "event_date"), "not partitioned"

    before = fct.count()
    from data_warehouse_project_spark.etl.pipeline import load_fct_events

    load_fct_events(spark, wh, SF_SMOKE)
    assert wh.read("bl_dm", "fct_events").count() == before  # idempotent


def _write_events(spark, src_dir, rows):
    """rows: (ts, user_id, event_type, value) tuples → src/events.parquet."""
    df = spark.createDataFrame(
        rows, "ts timestamp, user_id bigint, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/events.parquet")


def test_fct_events_late_arrivals_update_loaded_hours(spark, tmp_path):
    """The mart must not freeze a partially-loaded hour: events arriving
    late for an hour already in the target (including the first run's
    in-progress hour) are folded in by the lateness-window partition
    recompute — an anti-join at the (hour, type) grain would silently
    drop them and freeze the undercount forever."""
    from data_warehouse_project_spark.etl.pipeline import load_fct_events

    src = str(tmp_path / "src")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    h = lambda hh, mm: dt.datetime(2025, 3, 1, hh, mm)  # noqa: E731

    # run 1: hour 10 is in-progress (2 events so far)
    _write_events(
        spark,
        src,
        [(h(9, 5), 1, "view", 1.0), (h(9, 40), 2, "view", 1.0),
         (h(10, 1), 1, "click", 2.0), (h(10, 2), 3, "click", 2.0)],
    )
    load_fct_events(spark, wh, src)
    fct = wh.read("bl_dm", "fct_events")
    assert fct.filter("event_type = 'click'").agg(F.sum("n_events")).first()[0] == 2

    # run 2: two late events land in the already-loaded hour 10, plus a
    # fresh hour 11 — the loaded hour's count must be corrected
    _write_events(
        spark,
        src,
        [(h(9, 5), 1, "view", 1.0), (h(9, 40), 2, "view", 1.0),
         (h(10, 1), 1, "click", 2.0), (h(10, 2), 3, "click", 2.0),
         (h(10, 30), 4, "click", 2.0), (h(10, 59), 5, "click", 2.0),
         (h(11, 0), 1, "view", 1.0)],
    )
    load_fct_events(spark, wh, src)
    fct = wh.read("bl_dm", "fct_events")
    assert fct.filter("event_type = 'click'").agg(F.sum("n_events")).first()[0] == 4
    assert fct.agg(F.sum("n_events")).first()[0] == 7
    # rerun with unchanged source stays idempotent
    load_fct_events(spark, wh, src)
    assert wh.read("bl_dm", "fct_events").agg(F.sum("n_events")).first()[0] == 7


def test_overwrite_partitions_contract(spark, tmp_path):
    """values=None swaps exactly the written partitions; an explicit
    values list rejects out-of-set writes (no silent row discard) and
    drops listed partitions whose recomputed content is empty."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    )
    wh.append(base, "bl_dm", "t", partition_by=["k"])

    # upsert mode: replace only partition b, leave a and c untouched
    upd = spark.createDataFrame([("b", 20), ("b", 21)], "k string, v int")
    wh.overwrite_partitions(upd, "bl_dm", "t", "k")
    got = {(r["k"], r["v"]) for r in wh.read("bl_dm", "t").collect()}
    assert got == {("a", 1), ("b", 20), ("b", 21), ("c", 3)}

    # declared-set mode: writing outside the set raises, table unchanged
    stray = spark.createDataFrame([("a", 99), ("z", 9)], "k string, v int")
    with pytest.raises(ValueError, match="outside the declared swap set"):
        wh.overwrite_partitions(stray, "bl_dm", "t", "k", values=["a"])
    assert {(r["k"], r["v"]) for r in wh.read("bl_dm", "t").collect()} == got

    # declared-set mode: a listed partition with no new content is dropped
    only_a = spark.createDataFrame([("a", 100)], "k string, v int")
    wh.overwrite_partitions(only_a, "bl_dm", "t", "k", values=["a", "c"])
    got = {(r["k"], r["v"]) for r in wh.read("bl_dm", "t").collect()}
    assert got == {("a", 100), ("b", 20), ("b", 21)}


def test_scd1_update_flows_from_source_to_dim(spark, tmp_path):
    """The full SCD1 path: a re-delivered customer with a CHANGED
    attribute must re-enter staging (reference anti-joins on key +
    attributes, load_staging_customers_table.sql:119-128) and update
    the ce_customers dim — with a key-only staging dedup the update
    machinery was unreachable."""
    import shutil as sh

    src = tmp_path / "src"
    src.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        sh.copy(f"{SF_SMOKE}/{t}.parquet", src / f"{t}.parquet")
    root = str(tmp_path / "wh")
    run_full_etl(spark, str(src), root, run_ts=T0)
    wh = Warehouse(spark, root)
    dim0 = wh.read("bl_3nf", "ce_customers")
    victim = dim0.select("customer_src_id", "acctbal", "customer_id").first()
    key, old_bal = victim["customer_src_id"], victim["acctbal"]

    # re-deliver the same source with ONE customer's acctbal changed
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    new_bal = float(old_bal or 0.0) + 1234.5
    cust2 = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == key, F.lit(new_bal)).otherwise(
            F.col("c_acctbal")
        ),
    )
    cust2.write.mode("overwrite").parquet(str(src / "customer.parquet"))
    run_full_etl(spark, str(src), root, run_ts=T1)

    dim1 = wh.read("bl_3nf", "ce_customers")
    row = dim1.filter(F.col("customer_src_id") == key).collect()
    assert len(row) == 1  # SCD1: still one row per key
    assert abs(row[0]["acctbal"] - new_bal) < 1e-6  # update landed
    assert row[0]["customer_id"] == victim["customer_id"]  # id stable
    assert str(row[0]["update_dt"]).startswith(str(T1.date()))  # bumped
    # untouched keys keep their original update_dt
    other = dim1.filter(F.col("customer_src_id") != key).select("update_dt")
    assert all(
        str(r["update_dt"]).startswith(str(T0.date())) for r in other.collect()
    )


def test_vacuum_restores_and_removes(spark, tmp_path):
    """Interrupted-write recovery: a .old snapshot whose live dir is
    missing is the only copy — vacuum renames it back; completed-swap
    garbage and scratch dirs are removed."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    wh.append(df, "bl_dm", "t", partition_by=["k"])

    tdir = wh.path("bl_dm", "t")
    # simulate a crash between the two renames of a partition swap:
    (tdir / "k=a").rename(tdir / ".k=a.old-deadbeef")
    # completed-swap garbage next to a live partition:
    (tdir / ".k=b.old-cafebabe").mkdir()
    # table-level scratch from an interrupted append:
    (tdir.parent / ".t.append-12345678").mkdir()
    # table-level crash between overwrite renames (live table 'u' missing):
    (tdir.parent / ".u.old-00000000").mkdir()
    (tdir.parent / ".u.old-00000000" / "part-x.parquet").touch()

    # default min_age_s guards against racing a live writer: fresh
    # scratch is untouched
    assert wh.vacuum() == {"restored": 0, "removed": 0}
    stats = wh.vacuum(min_age_s=0)
    assert stats == {"restored": 2, "removed": 2}
    got = {(r["k"], r["v"]) for r in wh.read("bl_dm", "t").collect()}
    assert got == {("a", 1), ("b", 2)}  # k=a restored
    assert wh.exists("bl_dm", "u")  # table-level snapshot restored
    assert not (tdir.parent / ".t.append-12345678").exists()
    assert not (tdir / ".k=b.old-cafebabe").exists()
    # idempotent second pass
    assert wh.vacuum(min_age_s=0) == {"restored": 0, "removed": 0}


def test_cli_main_runs_full_etl(spark, tmp_path):
    """python -m data_warehouse_project_spark: argument parsing +
    full-ETL + rollup print path (reuses the live session)."""
    from data_warehouse_project_spark.__main__ import main

    rc = main([SF_SMOKE, str(tmp_path / "wh")])
    assert rc == 0
    assert (tmp_path / "wh" / "bl_dm" / "fct_sales").exists()
