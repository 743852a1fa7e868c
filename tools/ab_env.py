"""Same-session A/B of an arbitrary env toggle: alternates the two
values of one environment variable across repeated runs of a
profile_steps scenario inside ONE SparkSession, so host phantom-load
spikes hit both arms equally (the same protocol as tools/ab_overlap.py,
generalized — r15 uses it for SPARK_GRAFT_VIEW_MOR).

Run: PYTHONPATH=/root/repo python tools/ab_env.py <scenario> <var> <valA> <valB> [sf_dir] [trials]
An empty string value unsets the variable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
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


def _set(var: str, val: str) -> None:
    if val == "":
        os.environ.pop(var, None)
    else:
        os.environ[var] = val


def main():
    name, var, val_a, val_b = sys.argv[1:5]
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
    trials = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    spark = get_spark_with_eventlog()
    for val in (val_a, val_b):  # warm-up both arms at tiny scale
        _set(var, val)
        STEPS.clear()
        SCENARIOS[name](spark, "/root/testdata/sf0.001")
    results: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    totals: dict[str, list[float]] = defaultdict(list)
    for t in range(trials):
        order = (val_a, val_b) if t % 2 == 0 else (val_b, val_a)
        for val in order:
            _set(var, val)
            STEPS.clear()
            t0 = time.perf_counter()
            SCENARIOS[name](spark, sf_dir)
            totals[val].append(time.perf_counter() - t0)
            for s, secs in STEPS:
                results[val][s].append(secs)
            print(
                f"[trial {t} {var}={val or '<unset>'}] "
                f"total {totals[val][-1]:.2f}s",
                flush=True,
            )
    print(f"\n=== {name} @ {sf_dir}, {trials} trials/arm, {var} ===")
    steps = sorted({s for arm in results.values() for s in arm})
    hdr_a, hdr_b = val_a or "<unset>", val_b or "<unset>"
    print(f"{'step':<26}{hdr_a + ' min':>12}{hdr_a + ' med':>12}"
          f"{hdr_b + ' min':>12}{hdr_b + ' med':>12}")
    for s in steps:
        a, b = results[val_a].get(s, []), results[val_b].get(s, [])
        if not a or not b:
            continue
        print(
            f"{s:<26}{min(a):>12.2f}{statistics.median(a):>12.2f}"
            f"{min(b):>12.2f}{statistics.median(b):>12.2f}"
        )
    print(
        f"{'TOTAL':<26}{min(totals[val_a]):>12.2f}"
        f"{statistics.median(totals[val_a]):>12.2f}"
        f"{min(totals[val_b]):>12.2f}"
        f"{statistics.median(totals[val_b]):>12.2f}"
    )


if __name__ == "__main__":
    main()
