"""dv-delete micro-probe (r14 measured 0.37-0.42s at sf0.1 after the
shuffle-free fold; 4.3s before). r15 adds the os.replace fast path +
bounded driver merge — re-measure the same shape, plus a second delete
(old-vector merge path) and a forced distributed-merge arm."""
import sys, time, tempfile, shutil
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from data_warehouse_project_spark.session import get_spark
from data_warehouse_project_spark.sources import txtable as txt
from data_warehouse_project_spark.sources.txtable import TxTable
from data_warehouse_project_spark.catalog import table
import bench

spark = get_spark("dv-probe")
print("yard_pre mc8", bench.host_yardstick_mc(), flush=True)
o = table(spark, "/root/testdata/sf0.1", "orders")
def build(root):
    return TxTable.create(spark, root, o.select("o_orderkey", "o_custkey", "o_totalprice"), key="o_orderkey")
for arm, dmax in (("driver+fastpath", 10**9), ("distributed", 0)):
    txt.DV_DRIVER_MERGE_MAX = dmax
    tmp = tempfile.mkdtemp(prefix="dvp_")
    try:
        t = build(tmp + "/t")
        for trial, mod in ((1, 10), (2, 9)):
            t0 = time.perf_counter()
            r = t.delete(F.col("o_custkey") % mod == 0, mode="dv")
            print(f"  {arm} delete{trial}: {time.perf_counter()-t0:.3f}s rows_deleted={r['rows_deleted']}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
print("yard_post mc8", bench.host_yardstick_mc(), flush=True)
