"""Step-level wall-clock + Spark-job profiler for the lifecycle bench
queries (guide §1: measure first, label your jobs).

Builds a session identical to ``session.get_spark`` but with the JSON
event log enabled, runs one named scenario with per-step
``setJobDescription`` labels, then parses the event log to attribute
every Spark job (count + wall) to the step that submitted it.

Run: PYTHONPATH=/root/repo python tools/profile_steps.py <scenario> [sf_dir]
Scenarios: jv2d, jvbrand, navigator, scd2cdc, etl_tx, staging, gold_refresh
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

EVDIR = "/tmp/spark-events"


def get_spark_with_eventlog():
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession

    n = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName("profile")
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.security.egd=file:/dev/./urandom",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


STEPS: list[tuple[str, float]] = []
ACTIONS: list[tuple[str, float, str]] = []


def instrument_actions():
    """Monkeypatch the DataFrame action surface so every eager call is
    logged with (method, seconds, engine call-site) — attribution for
    fixed per-refresh plan cost that a step timer can't localize."""
    import traceback

    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    def _site() -> str:
        stack = traceback.extract_stack()
        # innermost engine frame (skip this profiler + pyspark)
        for fr in reversed(stack):
            if "data_warehouse_project_spark" in fr.filename:
                return f"{Path(fr.filename).name}:{fr.lineno}"
        for fr in reversed(stack):
            if "profile_steps" in fr.filename and fr.name != "_site":
                return f"profile:{fr.lineno}"
        return "?"

    def wrap(cls, meth):
        orig = getattr(cls, meth)

        def inner(self, *a, **k):
            t0 = time.perf_counter()
            r = orig(self, *a, **k)
            ACTIONS.append((meth, time.perf_counter() - t0, _site()))
            return r

        inner.__name__ = meth
        setattr(cls, meth, inner)

    for m in ("collect", "count", "localCheckpoint", "toPandas", "first",
              "take", "head", "checkpoint"):
        wrap(DataFrame, m)
    for m in ("parquet", "save", "csv", "json"):
        wrap(DataFrameWriter, m)


@contextlib.contextmanager
def step(spark, name: str):
    sc = spark.sparkContext
    sc.setJobDescription(name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        STEPS.append((name, time.perf_counter() - t0))
        sc.setJobDescription(None)


def parse_eventlog(app_id: str) -> dict:
    """Aggregate per-job-description job count + wall from the log."""
    path = Path(EVDIR) / app_id
    if not path.exists():
        path = Path(EVDIR) / f"{app_id}.inprogress"
    job_desc: dict[int, str] = {}
    job_start: dict[int, int] = {}
    agg = defaultdict(lambda: [0, 0.0])  # desc -> [jobs, secs]
    for line in path.read_text().splitlines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            job_desc[jid] = ev.get("Properties", {}).get(
                "spark.job.description", "<unlabelled>"
            )
            job_start[jid] = ev["Submission Time"]
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            d = job_desc.get(jid, "<unlabelled>")
            agg[d][0] += 1
            agg[d][1] += (ev["Completion Time"] - job_start.get(jid, 0)) / 1e3
    return dict(agg)


def scenario_jv2d(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_warehouse_project_spark.catalog import table
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxTable

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("oid"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("amt"),
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    tmp = tempfile.mkdtemp(prefix="prof_jv2d_")
    try:
        with step(spark, "create_fact"):
            fact = TxTable.create(
                spark, tmp + "/fact", li, key="oid", stats_cols=["pk", "sk"]
            )
        with step(spark, "create_d1"):
            d1 = TxTable.create(spark, tmp + "/d1", p, key="p_partkey")
        with step(spark, "create_d2"):
            d2 = TxTable.create(spark, tmp + "/d2", s, key="s_suppkey")
        with step(spark, "view_create"):
            view = TxJoinAggView.create(
                spark, tmp + "/view", fact, d1,
                fk="pk",
                group_expr=["brand", "cast(s_nationkey as bigint)"],
                group_col=["brand", "supp_nation"],
                measures={
                    "total_cents": "amt",
                    "n_items": ("count", "amt"),
                },
                extra_dims=[{"dim": d2, "fk": "sk"}],
                group_dims=[0, 1],
            )
        with step(spark, "fact_append"):
            fact.append(
                li.filter(F.col("pk") % 7 == 0).select(
                    (F.col("oid") + 100000000).alias("oid"),
                    "pk", "sk",
                    (F.col("amt") * 2).alias("amt"),
                )
            )
        with step(spark, "d1_merge"):
            d1.merge(
                p.filter(F.col("p_partkey") % 10 == 0).withColumn(
                    "brand", F.lit("MOVED")
                )
            )
        with step(spark, "d1_delete"):
            d1.delete(F.col("p_partkey") % 17 == 0)
        with step(spark, "d2_merge"):
            d2.merge(
                s.filter(F.col("s_suppkey") % 6 == 0).withColumn(
                    "s_nationkey",
                    F.lit(-1).cast(dict(s.dtypes)["s_nationkey"]),
                )
            )
        with step(spark, "d2_delete"):
            d2.delete(F.col("s_suppkey") % 9 == 0)
        with step(spark, "fact_delete_dv"):
            fact.delete(F.col("oid") % 13 == 0, mode="dv")
        with step(spark, "refresh"):
            if os.environ.get("PROF_CPROFILE"):
                import cProfile
                import pstats

                pr = cProfile.Profile()
                pr.enable()
                r = view.refresh(mode="incremental")
                pr.disable()
                st = pstats.Stats(pr)
                st.sort_stats("cumulative").print_stats(45)
            else:
                r = view.refresh(mode="incremental")
            assert r["mode"] == "incremental" and not r["skipped"], r
        with step(spark, "read"):
            view.read().select(
                "brand", "supp_nation", "n_items", "total_cents"
            ).orderBy("brand", "supp_nation").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def scenario_jvbrand(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_warehouse_project_spark.catalog import table
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txtable import TxTable

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("oid"),
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("amt"),
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    tmp = tempfile.mkdtemp(prefix="prof_jvb_")
    try:
        with step(spark, "create_fact"):
            fact = TxTable.create(
                spark, tmp + "/fact", li, key="oid", stats_cols=["pk"]
            )
        with step(spark, "create_dim"):
            dim = TxTable.create(spark, tmp + "/dim", p, key="p_partkey")
        with step(spark, "view_create"):
            view = TxJoinAggView.create(
                spark, tmp + "/view", fact, dim,
                fk="pk", group_expr="brand", group_col="brand",
                measures={
                    "total_cents": "amt",
                    "n_items": ("count", "amt"),
                },
            )
        with step(spark, "fact_append"):
            fact.append(
                li.filter(F.col("pk") % 7 == 0).select(
                    (F.col("oid") + 100000000).alias("oid"),
                    "pk",
                    (F.col("amt") * 2).alias("amt"),
                )
            )
        with step(spark, "dim_merge"):
            dim.merge(
                p.filter(F.col("p_partkey") % 10 == 0).withColumn(
                    "brand", F.lit("MOVED")
                )
            )
        with step(spark, "dim_delete"):
            dim.delete(F.col("p_partkey") % 17 == 0)
        with step(spark, "fact_delete_dv"):
            fact.delete(F.col("oid") % 13 == 0, mode="dv")
        with step(spark, "refresh"):
            r = view.refresh(mode="incremental")
            assert r["mode"] == "incremental" and not r["skipped"], r
        with step(spark, "read"):
            view.read().select(
                "brand", "n_items", "total_cents"
            ).orderBy("brand").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def scenario_etl_tx(spark, sf_dir):
    import shutil
    import tempfile

    from data_warehouse_project_spark.etl import run_full_etl

    wh_root = tempfile.mkdtemp(prefix="prof_etl_")
    try:
        with step(spark, "etl_tx_total"):
            stages = run_full_etl(
                spark, sf_dir, wh_root, scd_strategy="tx"
            )
        print("[stage table]", json.dumps(stages, sort_keys=True))
    finally:
        shutil.rmtree(wh_root, ignore_errors=True)


def scenario_staging(spark, sf_dir):
    import shutil
    import tempfile

    from data_warehouse_project_spark.etl import Warehouse
    from data_warehouse_project_spark.etl.pipeline import load_staging

    wh_root = tempfile.mkdtemp(prefix="prof_stg_")
    try:
        wh = Warehouse(spark, wh_root)
        with step(spark, "staging_total"):
            load_staging(spark, wh, sf_dir)
    finally:
        shutil.rmtree(wh_root, ignore_errors=True)


def scenario_gold_refresh(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_warehouse_project_spark.etl import Warehouse, run_full_etl
    from data_warehouse_project_spark.etl.pipeline import refresh_gold_views

    wh_root = tempfile.mkdtemp(prefix="prof_gold_")
    try:
        with step(spark, "etl_build"):
            run_full_etl(spark, sf_dir, wh_root, scd_strategy="tx")
        wh = Warehouse(spark, wh_root)
        fact = wh.tx("bl_3nf", "ce_sales")
        with step(spark, "view_create"):
            refresh_gold_views(wh)
        with step(spark, "churn_commits"):
            late = (
                fact.read()
                .sample(0.01, seed=7)
                .withColumn(
                    "sale_src_id",
                    F.concat(F.lit("late-"), F.col("sale_src_id")),
                )
            )
            fact.append(late)
            fact.delete(F.col("order_key") % 997 == 0, mode="dv")
        with step(spark, "refresh_incremental"):
            r = refresh_gold_views(wh, mode="incremental")
        print(
            "[per-view]",
            json.dumps(
                {k: v.get("secs") for k, v in r.items()}, sort_keys=True
            ),
        )
    finally:
        shutil.rmtree(wh_root, ignore_errors=True)


def scenario_navigator(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_warehouse_project_spark.catalog import table
    from data_warehouse_project_spark.plans.extensions import _overlap
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txrouter import AggRouter
    from data_warehouse_project_spark.sources.txtable import TxTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg0"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    tmp = tempfile.mkdtemp(prefix="prof_nav_")
    try:
        with step(spark, "creates"):
            fact, dim = _overlap(
                lambda: TxTable.create(
                    spark, tmp + "/fact", o, key="ok", stats_cols=["ck"]
                ),
                lambda: TxTable.create(spark, tmp + "/dim", c, key="c_custkey"),
            )
        with step(spark, "view_create"):
            view = TxJoinAggView.create(
                spark, tmp + "/view", fact, dim,
                fk="ck",
                group_expr=["seg0", "cast(nk as bigint)"],
                group_col=["seg", "nk"],
                measures={
                    "total_cents": "amt",
                    "n_orders": ("count", "amt"),
                    "max_cents": ("max", "amt"),
                    "uniq_buyers": ("distinct", "ck"),
                },
            )
        with step(spark, "churn"):
            def churn_fact():
                fact.append(
                    o.filter(F.col("ok") % 5 == 0).select(
                        (F.col("ok") + 100000000).alias("ok"),
                        "ck",
                        (F.col("amt") * 2).alias("amt"),
                    )
                )
                fact.delete(F.col("ok") % 7 == 0, mode="dv")

            def churn_dim():
                dim.merge(
                    c.filter(F.col("c_custkey") % 11 == 0).withColumn(
                        "seg0", F.lit("MOVED")
                    )
                )
                dim.delete(F.col("c_custkey") % 13 == 0)

            _overlap(churn_fact, churn_dim)
        with step(spark, "refresh"):
            if os.environ.get("PROF_CPROFILE"):
                import cProfile
                import pstats

                pr = cProfile.Profile()
                pr.enable()
                r = view.refresh(mode="incremental")
                pr.disable()
                pstats.Stats(pr).sort_stats("cumulative").print_stats(45)
            else:
                r = view.refresh(mode="incremental")
            assert r["mode"] == "incremental" and not r["skipped"], r
        with step(spark, "route"):
            routed, how = AggRouter(spark).register(view).route(
                ["seg"],
                {
                    "total_cents": "amt",
                    "n_orders": ("count", "amt"),
                    "max_cents": ("max", "amt"),
                    "uniq_buyers": ("distinct", "ck"),
                    "n_live": ("count", "*"),
                },
                where="seg <> 'MOVED'",
                max_lag=0,
            )
            routed.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SCENARIOS = {
    "jv2d": scenario_jv2d,
    "jvbrand": scenario_jvbrand,
    "etl_tx": scenario_etl_tx,
    "staging": scenario_staging,
    "gold_refresh": scenario_gold_refresh,
    "navigator": scenario_navigator,
}


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark_with_eventlog()
    app_id = spark.sparkContext.applicationId
    instrument_actions()
    # warm-up pass at tiny scale so JVM/codegen warmup doesn't pollute
    STEPS.clear()
    SCENARIOS[name](spark, "/root/testdata/sf0.001")
    warm = list(STEPS)
    STEPS.clear()
    ACTIONS.clear()
    t0 = time.perf_counter()
    SCENARIOS[name](spark, sf_dir)
    total = time.perf_counter() - t0
    print(f"\n=== eager actions by call-site (warm run, >20ms) ===")
    bysite = defaultdict(lambda: [0, 0.0])
    for m, s, site in ACTIONS:
        bysite[f"{site} {m}"][0] += 1
        bysite[f"{site} {m}"][1] += s
    for k, (n_, s_) in sorted(bysite.items(), key=lambda kv: -kv[1][1]):
        if s_ >= 0.02:
            print(f"  {n_:4d}x {s_:8.3f}s  {k}")
    print(f"\n=== {name} @ {sf_dir}: total {total:.2f}s (warm run) ===")
    for n, s in STEPS:
        print(f"  {n:<24} {s:7.3f}s")
    print("  (warm-up at sf0.001 for reference)")
    for n, s in warm:
        print(f"  ~{n:<23} {s:7.3f}s")
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    # flush the event log and attribute jobs
    time.sleep(1)
    try:
        agg = parse_eventlog(app_id)
        print("\n=== per-description Spark jobs (both runs pooled) ===")
        for d, (njobs, secs) in sorted(
            agg.items(), key=lambda kv: -kv[1][1]
        ):
            print(f"  {njobs:4d} jobs {secs:8.2f}s  {d[:90]}")
    except Exception as e:
        print(f"[eventlog parse failed: {e}]")


if __name__ == "__main__":
    main()
