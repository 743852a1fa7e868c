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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
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
    for label, strategy in (
        ("etl_full_pipeline", "snapshot"),
        ("etl_full_pipeline_merge", "merge"),
        ("etl_full_pipeline_tx", "tx"),
    ):
        etl_trials = []
        for _ in range(2):
            wh_root = tempfile.mkdtemp(prefix="bench_wh_")
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
                shutil.rmtree(wh_root, ignore_errors=True)
        timings[label] = round(min(etl_trials), 3)

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
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "host_yardstick": host_yardstick(),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
