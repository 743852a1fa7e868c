"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collected) so the number includes the
whole job, not just plan construction. A warm-up pass on a tiny scale
factor triggers JVM/codegen warm-up outside the timed region.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np

from data_warehouse_project_spark.etl import run_full_etl
from data_warehouse_project_spark.plans import QUERIES
from data_warehouse_project_spark.session import get_spark

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def host_yardstick() -> float:
    """A fixed CPU-bound calibration number: seconds for a pinned
    single-threaded numpy workload (20 x 512x512 float64 matmuls on a
    deterministic input). Bench totals on this host drift ±25% with
    virtualization noise (r7->r8 adjudication took three
    cross-measurements); dividing a round's total by its yardstick
    normalizes out host speed so rounds compare like-for-like."""
    rng = np.random.default_rng(20240101)
    a = rng.standard_normal((512, 512))
    b = rng.standard_normal((512, 512))
    a @ b  # warm-up (allocator, BLAS thread spin-up)
    trials = []
    for _ in range(3):  # min-of-3: the yardstick itself must not absorb
        t0 = time.perf_counter()  # the very noise it measures
        x = a
        for _ in range(20):
            x = (x @ b) * 1e-3  # rescale so values stay finite
        trials.append(time.perf_counter() - t0)
    return round(min(trials), 4)


def host_yardstick_mc(threads: int = 8) -> float:
    """Multi-core companion to :func:`host_yardstick` (r13 verdict
    item 2): the single-threaded probe calibrates one core while the
    bench runs on 32, so it under-detects multi-core contention — r13's
    driver run showed ~40% uniform ETL-stage inflation on a host whose
    single-thread yardstick said 'faster'. This runs the SAME pinned
    matmul concurrently on ``threads`` Python threads (numpy releases
    the GIL inside BLAS) and reports the wall for all to finish —
    phantom load that steals whole cores shows up here first."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(20240101)
    a = rng.standard_normal((512, 512))
    b = rng.standard_normal((512, 512))

    def work(_):
        x = a
        for _ in range(20):
            x = (x @ b) * 1e-3
        return x[0, 0]

    with ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(work, range(threads)))  # warm-up
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            list(ex.map(work, range(threads)))
            trials.append(time.perf_counter() - t0)
    return round(min(trials), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # the lifecycle queries' in-plan exact cross-checks stay ON for
    # parity/driver correctness runs but OFF here, so the timed number
    # measures the operator, not the assertion harness (r13 item 8)
    os.environ.setdefault("SPARK_GRAFT_INPLAN_ASSERTS", "0")
    # bracket the whole run with yardstick samples (r13 item 2): a
    # phantom-load spike mid-run shows as pre/post divergence, and the
    # multi-core variant catches contention the 1-thread probe misses
    yard_pre = {"t1": host_yardstick(), "mc8": host_yardstick_mc()}
    spark = get_spark("bench")

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}

    # Warm-up: one untimed pass per query at the target SF (JIT/codegen,
    # parquet footers, file index) so timings measure steady-state engine
    # throughput — comparable to the reference's warm-cache numbers.
    for q in bench_queries.values():
        q.fn(spark, WARMUP_SF_DIR).collect()
        q.fn(spark, sf_dir).collect()

    # Each measurement is min-of-2: this host shows heavy phantom load
    # (virtualization noise), and min-of-N recovers the steady-state
    # engine cost rather than scheduling luck.
    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        trials = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).collect()
            trials.append(time.perf_counter() - t0)
        timings[name] = round(min(trials), 3)

    # Full medallion ETL (reference headline metric: 4.171s at 80k rows,
    # BASELINE.md) — cold warehouse, all 10 stages, includes all writes.
    # Both SCD maintenance paths are timed (the merge path had no bench
    # coverage before r5, so its perf could silently regress); the min
    # trial's per-stage breakdown goes to stderr + bench_stages.json so
    # a regression localizes to a stage instead of a total.
    stage_tables: dict[str, dict[str, float]] = {}
    tx_root = None  # the last tx trial's warehouse feeds the CDC benches
    for label, strategy in (
        ("etl_full_pipeline", "snapshot"),
        ("etl_full_pipeline_merge", "merge"),
        ("etl_full_pipeline_tx", "tx"),
    ):
        # bracket each ETL entry with its own yardstick samples (r13
        # item 2): the ETL totals are the entries most sensitive to
        # multi-core phantom load, and a per-entry bracket localizes a
        # spike to the entry it actually hit
        etl_yard = {"pre_t1": host_yardstick(), "pre_mc8": host_yardstick_mc()}
        etl_trials = []
        for i in range(2):
            wh_root = tempfile.mkdtemp(prefix="bench_wh_")
            keep = strategy == "tx" and i == 1
            try:
                t0 = time.perf_counter()
                stages = run_full_etl(spark, sf_dir, wh_root, scd_strategy=strategy)
                dt = time.perf_counter() - t0
                if not etl_trials or dt < min(etl_trials):
                    stage_tables[label] = {
                        k: round(v, 3) for k, v in stages.items()
                    }
                etl_trials.append(dt)
            finally:
                if keep:
                    tx_root = wh_root
                else:
                    shutil.rmtree(wh_root, ignore_errors=True)
        etl_yard["post_t1"] = host_yardstick()
        etl_yard["post_mc8"] = host_yardstick_mc()
        stage_tables[label].update(
            {f"yard_{k}": v for k, v in etl_yard.items()}
        )
        timings[label] = round(min(etl_trials), 3)

    # CDC surfaces (round 10): the incremental gold-view churn-fold and
    # a native txcdf stream drain, on the tx warehouse the ETL bench
    # just built — perf-tracked so the change-feed path cannot silently
    # regress round over round. The refresh is FORCED incremental (the
    # 100 TB path under measurement; mode="auto" would recompute at
    # this scale and measure the wrong plan).
    try:
        from pyspark.sql import functions as F

        from data_warehouse_project_spark.etl import Warehouse
        from data_warehouse_project_spark.etl.pipeline import refresh_gold_views

        wh = Warehouse(spark, tx_root)
        fact = wh.tx("bl_3nf", "ce_sales")
        cdc_stages: dict[str, float] = {}
        t0 = time.perf_counter()
        refresh_gold_views(wh)  # first call: full view create (untimed entry)
        cdc_stages["view_create"] = round(time.perf_counter() - t0, 3)
        # churn shape: ~1% late-arriving rows + a ~0.1% correction delete
        t0 = time.perf_counter()
        late = (
            fact.read()
            .sample(0.01, seed=7)
            .withColumn(
                "sale_src_id", F.concat(F.lit("late-"), F.col("sale_src_id"))
            )
        )
        fact.append(late)
        fact.delete(F.col("order_key") % 997 == 0, mode="dv")
        cdc_stages["churn_commits"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        r = refresh_gold_views(wh, mode="incremental")
        cdc_stages["refresh_incremental"] = round(time.perf_counter() - t0, 3)
        assert all(v.get("mode") == "incremental" for v in r.values()), r
        # per-view share so a regression localizes to one view (the
        # join view's repair path is the expensive one under deletes)
        for vn, vr in r.items():
            cdc_stages[f"view_{vn}"] = vr.get("secs", 0.0)
        # routed dashboard A/B (r11): the same segment rollup answered
        # from the maintained view via the aggregate navigator vs from
        # the base fact⋈dim — the number that shows WHY the gold layer
        # exists (view rows vs fact rows). Recorded as stages, not as
        # separate headline entries (they'd double-count the warehouse
        # build above).
        from data_warehouse_project_spark.etl.pipeline import gold_router

        router = gold_router(wh)
        spec = {
            "rev": "cast(round(extended_price * 100) as bigint)",
            "n": ("count", "sale_src_id"),
            "buyers": ("distinct", "customer_id"),
        }
        t0 = time.perf_counter()
        routed, how = router.route(["market_segment"], spec, max_lag=0)
        routed.collect()
        cdc_stages["routed_segment_rollup"] = round(
            time.perf_counter() - t0, 3
        )
        assert how["view"].endswith("sales_by_segment"), how
        t0 = time.perf_counter()
        dim = wh.read("bl_3nf", "ce_customers")
        (
            fact.read()
            .join(
                dim.select("customer_id", "market_segment"),
                "customer_id",
            )
            .groupBy("market_segment")
            .agg(
                F.sum(F.expr(spec["rev"])).alias("rev"),
                F.count("sale_src_id").alias("n"),
                F.count_distinct("customer_id").alias("buyers"),
            )
            .collect()
        )
        cdc_stages["base_segment_rollup"] = round(
            time.perf_counter() - t0, 3
        )
        timings["gold_views_refresh"] = cdc_stages["refresh_incremental"]
        stage_tables["gold_views_refresh"] = cdc_stages

        from data_warehouse_project_spark.sources.txcdf import TxCdfDataSource

        try:
            spark.dataSource.register(TxCdfDataSource)
        except Exception:
            pass  # already registered in this session
        # Warm-up (r14, guide §1.4): every bench QUERY gets an untimed
        # warm-up pass above, but the drain never did — its first run
        # paid one-time Python-data-source worker spin-up + streaming
        # machinery init (~3-4 s measured at sf0.01: addBatch 4.4 s
        # cold vs 0.8 s warm on identical input) INSIDE the timed
        # region. Drain a tiny scratch TxTable once, untimed, so the
        # timed entry measures the change-feed path, not JVM/worker
        # cold start. Same methodology as the query warm-ups; the
        # timed drain still computes entirely from the real feed.
        from data_warehouse_project_spark.sources.txtable import TxTable

        warm_dir = tempfile.mkdtemp(prefix="bench_cdf_warm_")
        try:
            wt = TxTable.create(
                spark, os.path.join(warm_dir, "t"),
                spark.range(1000).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                ),
                key="k",
            )
            wt.delete(F.col("k") % 7 == 0, mode="dv")
            wq = (
                spark.readStream.format("txcdf")
                .option("path", os.path.join(warm_dir, "t"))
                .load()
                .writeStream.format("parquet")
                .option("path", os.path.join(warm_dir, "out"))
                .option("checkpointLocation", os.path.join(warm_dir, "ck"))
                .trigger(availableNow=True)
                .start()
            )
            wq.awaitTermination(120)
        finally:
            shutil.rmtree(warm_dir, ignore_errors=True)
        drain_dir = tempfile.mkdtemp(prefix="bench_cdf_")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("txcdf")
            .option("path", tx_root + "/bl_3nf/ce_sales")
            .load()
            .writeStream.format("parquet")
            .option("path", os.path.join(drain_dir, "out"))
            .option("checkpointLocation", os.path.join(drain_dir, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        drain_s = round(time.perf_counter() - t0, 3)
        timings["txcdf_stream_drain"] = drain_s
        stage_tables["txcdf_stream_drain"] = {
            "drain_full_history": drain_s,
            "rows_drained": float(
                spark.read.parquet(os.path.join(drain_dir, "out")).count()
            ),
        }
        shutil.rmtree(drain_dir, ignore_errors=True)
    finally:
        shutil.rmtree(tx_root, ignore_errors=True)

    import sys

    # best-effort side artifact, anchored next to this script: it must
    # never lose the headline line (the driver contract) to a read-only
    # or unexpected working directory AFTER all measurement is done
    try:
        stages_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_stages.json"
        )
        with open(stages_path, "w") as f:
            json.dump(stage_tables, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"[stages] write skipped: {e}", file=sys.stderr)
    for label, stages in stage_tables.items():
        print(f"[stages] {label}: {json.dumps(stages, sort_keys=True)}",
              file=sys.stderr)

    total = round(sum(timings.values()), 3)
    yard_post = {"t1": host_yardstick(), "mc8": host_yardstick_mc()}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # host calibration (r13 item 2): compare rounds ONLY
                # after normalizing — pre/post divergence flags a
                # phantom-load spike mid-run, mc8 catches multi-core
                # contention the single-thread probe misses
                "host_yardstick": yard_post["t1"],
                "yard_pre": yard_pre,
                "yard_post": yard_post,
                "yard_mc": yard_post["mc8"],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
