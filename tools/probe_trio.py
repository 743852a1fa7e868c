"""VERDICT item 4: re-verify the three touched-but-driver-regressed
entries on the final tree — same-session min-of-5, yardstick brackets."""
import sys, time, statistics
sys.path.insert(0, '/root/repo')
from data_warehouse_project_spark.plans import QUERIES
from data_warehouse_project_spark.session import get_spark
import bench

NAMES = ["scd2_cdc_history_profile", "bloom_point_lookup", "tx_pruned_snapshot_scan"]
R14_DRIVER = {"scd2_cdc_history_profile": 7.756, "bloom_point_lookup": 3.849, "tx_pruned_snapshot_scan": 2.089}
R14_CLOSE = {"scd2_cdc_history_profile": 4.763, "bloom_point_lookup": 2.878, "tx_pruned_snapshot_scan": 1.522}
sf = "/root/testdata/sf0.1"
print("yard_pre mc8", bench.host_yardstick_mc(), flush=True)
spark = get_spark("trio-probe")
for n in NAMES:
    QUERIES[n].fn(spark, "/root/testdata/sf0.001").collect()
    QUERIES[n].fn(spark, sf).collect()
walls = {n: [] for n in NAMES}
for i in range(5):
    for n in NAMES:
        t0 = time.perf_counter()
        QUERIES[n].fn(spark, sf).collect()
        walls[n].append(time.perf_counter() - t0)
print(f"{'query':30}{'r14drv':>8}{'r14cls':>8}{'min':>8}{'med':>8}")
for n in NAMES:
    w = walls[n]
    print(f"{n:30}{R14_DRIVER[n]:>8.3f}{R14_CLOSE[n]:>8.3f}{min(w):>8.3f}{statistics.median(w):>8.3f}", flush=True)
print("yard_post mc8", bench.host_yardstick_mc(), flush=True)
