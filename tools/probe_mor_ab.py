"""Same-session A/B for the r15 merge-on-read view apply
(``TxTable.merge_by_keys`` vs the r14 ``rewrite_by_keys`` CoW path).

Two identical TxAggViews over the SAME tx fact fold the SAME churn
windows; per window one view applies copy-on-write, the other
merge-on-read, alternating which arm goes first so host phantom-load
spikes hit both. After every window the two views' logical contents
are compared row-for-row (the state-equivalence check), and the probe
prints per-arm refresh walls plus the view table's physical footprint
(files carried vs written — the files-written ∝ churn claim).

Run: PYTHONPATH=/root/repo python tools/probe_mor_ab.py <sf_dir> [windows]
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_project_spark.etl import Warehouse, run_full_etl  # noqa: E402
from data_warehouse_project_spark.etl.pipeline import GOLD_VIEWS  # noqa: E402
from data_warehouse_project_spark.session import get_spark  # noqa: E402
from data_warehouse_project_spark.sources import txview  # noqa: E402
from data_warehouse_project_spark.sources.txview import TxAggView  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe-mor-ab")
    wh_root = tempfile.mkdtemp(prefix="probe_mor_")
    try:
        t0 = time.perf_counter()
        run_full_etl(spark, sf_dir, wh_root, scd_strategy="tx")
        print(f"etl {time.perf_counter() - t0:.1f}s", flush=True)
        wh = Warehouse(spark, wh_root)
        fact = wh.tx("bl_3nf", "ce_sales")
        group_col, measures = GOLD_VIEWS["sales_by_customer"]
        views = {}
        for arm in ("cow", "mor"):
            t0 = time.perf_counter()
            views[arm] = TxAggView.create(
                spark, os.path.join(wh_root, f"v_{arm}"), fact,
                group_col, measures,
            )
            print(f"create[{arm}] {time.perf_counter() - t0:.1f}s", flush=True)

        def refresh(arm: str):
            # flip the dispatch floor rather than the env (read at import)
            txview.MOR_APPLY_FLOOR_ROWS = 0 if arm == "mor" else 1 << 62
            t0 = time.perf_counter()
            r = views[arm].refresh(mode="incremental")
            wall = time.perf_counter() - t0
            m = views[arm].table._manifest()
            print(
                f"  refresh[{arm}] {wall:.2f}s files_rewritten="
                f"{r.get('files_rewritten')} groups={r.get('groups_touched')}"
                f" table_files={len(m['files'])}"
                f" dv_files={sum(1 for f in m['files'] if 'dv' in f)}",
                flush=True,
            )
            return wall

        walls = {"cow": [], "mor": []}
        for w in range(windows):
            late = (
                fact.read()
                .sample(0.01, seed=100 + w)
                .withColumn(
                    "sale_src_id",
                    F.concat(F.lit(f"late{w}-"), F.col("sale_src_id")),
                )
            )
            fact.append(late)
            fact.delete(F.col("order_key") % (997 - w) == 0, mode="dv")
            print(f"window {w}:", flush=True)
            order = ("cow", "mor") if w % 2 == 0 else ("mor", "cow")
            for arm in order:
                walls[arm].append(refresh(arm))
            a = views["cow"].read().orderBy(group_col).collect()
            b = views["mor"].read().orderBy(group_col).collect()
            assert a == b, f"window {w}: view contents diverged"
            print(f"  contents equal ({len(a)} groups)", flush=True)
        print(
            f"min walls: cow={min(walls['cow']):.2f}s "
            f"mor={min(walls['mor']):.2f}s  "
            f"med: cow={sorted(walls['cow'])[len(walls['cow']) // 2]:.2f}s "
            f"mor={sorted(walls['mor'])[len(walls['mor']) // 2]:.2f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(wh_root, ignore_errors=True)


if __name__ == "__main__":
    main()
