"""Scale smoke (VERDICT r6 item 1): time every bench entry at sf1
(a deterministic 10× clone of sf0.1 — ~6M lineitem rows, built by
tools/gen_scale.py in /tmp) against sf0.1 IN THE SAME SESSION, and
flag any entry whose wall-clock grows faster than the row ratio.

Same-session A/B matters on this host: absolute walls swing ±15% with
phantom load, but both scales see the same conditions, so the RATIO is
stable. Each timed plan is rebuilt per scale (never collect the same
DataFrame twice — shuffle reuse would fake the second number).

Pass criterion: ratio ≤ row-ratio (10) + slack. Fixed per-job latency
(scheduler round-trips, AQE re-planning, parquet footer reads) means
healthy entries land well UNDER 10; an entry at or above it is
superlinear work growth — named and failed.

Usage: PYTHONPATH=/root/repo python tools/scale_smoke.py [--regen]
Writes nothing outside /tmp; prints one JSON line (plus a table) for
COVERAGE.md.
"""

from __future__ import annotations

import json
import shutil
import sys

_REPO = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:  # tolerate any caller cwd (gates must not
    sys.path.insert(0, _REPO)  # silently run against a stale install)
import tempfile
import time
from pathlib import Path

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1_smoke"
WARMUP = "/root/testdata/sf0.001"
FACTOR = 10
SLACK = 1.2  # 20% headroom over the row ratio for noise


def main() -> int:
    from data_warehouse_project_spark.etl import run_full_etl
    from data_warehouse_project_spark.plans import QUERIES
    from data_warehouse_project_spark.session import get_spark

    spark = get_spark("scale-smoke")

    if "--regen" in sys.argv or not Path(f"{SF1}/lineitem.parquet").exists():
        from tools.gen_scale import generate

        print("generating sf1 clone ...", file=sys.stderr)
        generate(spark, SF01, SF1, FACTOR)

    results: dict[str, dict[str, float]] = {}

    bench = {n: q for n, q in QUERIES.items() if q.bench}
    for name, q in bench.items():
        q.fn(spark, WARMUP).collect()  # codegen/footer warm-up
        t: dict[str, float] = {}
        for label, d in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.perf_counter()
            q.fn(spark, d).collect()
            t[label] = round(time.perf_counter() - t0, 3)
        results[name] = t

    tx_roots: dict[str, str] = {}  # scale label -> kept tx warehouse
    for strategy in ("snapshot", "merge", "tx"):
        t = {}
        for label, d in (("sf0.1", SF01), ("sf1", SF1)):
            root = tempfile.mkdtemp(prefix="smoke_wh_")
            try:
                t0 = time.perf_counter()
                run_full_etl(spark, d, root, scd_strategy=strategy)
                t[label] = round(time.perf_counter() - t0, 3)
            finally:
                if strategy == "tx":
                    tx_roots[label] = root
                else:
                    shutil.rmtree(root, ignore_errors=True)
        suffix = "" if strategy == "snapshot" else f"_{strategy}"
        results[f"etl_full_pipeline{suffix}"] = t

    # CDC surfaces on the kept tx warehouses: the incremental gold-view
    # fold (churn scales WITH the base — same ~1% + ~0.1% shape as
    # bench.py, so O(churn) must track the row ratio, not outgrow it)
    # and a full-history txcdf stream drain (O(history rows)).
    try:
        from pyspark.sql import functions as F

        from data_warehouse_project_spark.etl import Warehouse
        from data_warehouse_project_spark.etl.pipeline import (
            refresh_gold_views,
        )
        from data_warehouse_project_spark.sources.txcdf import TxCdfDataSource

        try:
            spark.dataSource.register(TxCdfDataSource)
        except Exception:
            pass
        t_refresh: dict[str, float] = {}
        t_drain: dict[str, float] = {}
        for label in ("sf0.1", "sf1"):
            wh = Warehouse(spark, tx_roots[label])
            fact = wh.tx("bl_3nf", "ce_sales")
            refresh_gold_views(wh)  # create (untimed)
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
            t0 = time.perf_counter()
            r = refresh_gold_views(wh, mode="incremental")
            t_refresh[label] = round(time.perf_counter() - t0, 3)
            assert all(v.get("mode") == "incremental" for v in r.values()), r
            drain_dir = tempfile.mkdtemp(prefix="smoke_cdf_")
            t0 = time.perf_counter()
            q = (
                spark.readStream.format("txcdf")
                .option("path", tx_roots[label] + "/bl_3nf/ce_sales")
                .load()
                .writeStream.format("parquet")
                .option("path", f"{drain_dir}/out")
                .option("checkpointLocation", f"{drain_dir}/ck")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(1200)
            t_drain[label] = round(time.perf_counter() - t0, 3)
            shutil.rmtree(drain_dir, ignore_errors=True)
        results["gold_views_refresh"] = t_refresh
        results["txcdf_stream_drain"] = t_drain
    finally:
        for root in tx_roots.values():
            shutil.rmtree(root, ignore_errors=True)

    failures = 0
    print(f"{'entry':<34}{'sf0.1':>9}{'sf1':>9}{'ratio':>8}  verdict")
    for name, t in results.items():
        ratio = round(t["sf1"] / t["sf0.1"], 2)
        ok = ratio <= FACTOR * SLACK
        failures += 0 if ok else 1
        print(
            f"{name:<34}{t['sf0.1']:>9}{t['sf1']:>9}{ratio:>8}  "
            f"{'ok' if ok else 'SUPERLINEAR'}"
        )
        t["ratio"] = ratio
    print(
        json.dumps(
            {
                "metric": "scale_smoke",
                "row_ratio": FACTOR,
                "slack": SLACK,
                "entries": results,
                "failures": failures,
            }
        )
    )
    return failures


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
