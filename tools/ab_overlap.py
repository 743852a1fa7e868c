"""Same-session A/B of the view-maintenance overlap (_pmap) change:
alternates SPARK_GRAFT_NO_OVERLAP=1 (sequential, the r13 behavior) and
=0 (overlapped) runs of one lifecycle scenario inside ONE SparkSession,
so host phantom-load spikes hit both arms equally. Reports per-arm
min/median of the step walls.

Run: PYTHONPATH=/root/repo python tools/ab_overlap.py <scenario> [sf_dir] [trials]
"""

from __future__ import annotations

import os
import statistics
import sys
from collections import defaultdict
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.profile_steps import (  # noqa: E402
    SCENARIOS,
    STEPS,
    get_spark_with_eventlog,
)


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark_with_eventlog()
    # warm-up both arms at tiny scale
    for arm in ("1", "0"):
        os.environ["SPARK_GRAFT_NO_OVERLAP"] = arm
        STEPS.clear()
        SCENARIOS[name](spark, "/root/testdata/sf0.001")
    results: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    totals: dict[str, list[float]] = defaultdict(list)
    import time

    for t in range(trials):
        for arm in ("1", "0"):
            os.environ["SPARK_GRAFT_NO_OVERLAP"] = arm
            STEPS.clear()
            t0 = time.perf_counter()
            SCENARIOS[name](spark, sf_dir)
            totals[arm].append(time.perf_counter() - t0)
            for s, secs in STEPS:
                results[arm][s].append(secs)
            print(
                f"[trial {t} arm {'seq' if arm == '1' else 'par'}] "
                f"total {totals[arm][-1]:.2f}s",
                flush=True,
            )
    print(f"\n=== {name} @ {sf_dir}, {trials} trials/arm ===")
    print(f"{'step':<26}{'seq min':>9}{'seq med':>9}{'par min':>9}"
          f"{'par med':>9}")
    steps = list(results["1"].keys())
    for s in steps:
        a, b = results["1"][s], results["0"][s]
        print(
            f"{s:<26}{min(a):>9.3f}{statistics.median(a):>9.3f}"
            f"{min(b):>9.3f}{statistics.median(b):>9.3f}"
        )
    print(
        f"{'TOTAL':<26}{min(totals['1']):>9.2f}"
        f"{statistics.median(totals['1']):>9.2f}"
        f"{min(totals['0']):>9.2f}{statistics.median(totals['0']):>9.2f}"
    )


if __name__ == "__main__":
    main()
