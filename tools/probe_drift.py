"""VERDICT item 5: pin or reclaim the small-query fixed-latency drift.
Runs the four drift-listed queries N times each, interleaved round-robin
in ONE session (so spikes spread across all four), reports min/median
vs the r13-clean and r14-close values."""
import sys, time, statistics
sys.path.insert(0, '/root/repo')
from data_warehouse_project_spark.plans import QUERIES
from data_warehouse_project_spark.session import get_spark

NAMES = ["q3_sales_by_geo", "revenue_forecast_filter",
         "ann_lsh_incremental", "preceding_events_10min_micros"]
R13 = {"q3_sales_by_geo": 0.916, "revenue_forecast_filter": 0.178,
       "ann_lsh_incremental": 2.051, "preceding_events_10min_micros": 1.619}
R14 = {"q3_sales_by_geo": 1.194, "revenue_forecast_filter": 0.228,
       "ann_lsh_incremental": 2.514, "preceding_events_10min_micros": 1.985}
sf = "/root/testdata/sf0.1"
spark = get_spark("drift-probe")
for n in NAMES:  # warm-up
    QUERIES[n].fn(spark, "/root/testdata/sf0.001").collect()
    QUERIES[n].fn(spark, sf).collect()
walls = {n: [] for n in NAMES}
N = 10
for i in range(N):
    for n in NAMES:
        t0 = time.perf_counter()
        QUERIES[n].fn(spark, sf).collect()
        walls[n].append(time.perf_counter() - t0)
print(f"{'query':32}{'r13cln':>8}{'r14cls':>8}{'min':>8}{'med':>8}{'max':>8}  vs r13(min)")
for n in NAMES:
    w = walls[n]
    print(f"{n:32}{R13[n]:>8.3f}{R14[n]:>8.3f}{min(w):>8.3f}"
          f"{statistics.median(w):>8.3f}{max(w):>8.3f}  {min(w)/R13[n]-1:+.0%}")
