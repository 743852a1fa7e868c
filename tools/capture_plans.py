"""Capture ``explain("formatted")`` for declared queries into text
files (the optimization-round evidence artifacts under plans/r*/).

Run: PYTHONPATH=/root/repo python tools/capture_plans.py <outdir> <suffix> [sf_dir] [query ...]

With no query list, captures every bench-flagged query. Lifecycle
queries (tx lifecycles that execute inside fn and return a
localCheckpoint) still produce a file — their meaningful plans are the
internal fold/write plans, which tools/profile_steps.py and
sources/*.PLAN_CAPTURE expose — so the plan file records the final
frame plus a note.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    outdir.mkdir(parents=True, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_INPLAN_ASSERTS", "0")

    from data_warehouse_project_spark.plans import QUERIES
    from data_warehouse_project_spark.session import get_spark

    names = sys.argv[4:] or [n for n, q in QUERIES.items() if q.bench]
    spark = get_spark("capture-plans")
    for n in names:
        q = QUERIES[n]
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"[capture failed: {type(e).__name__}: {e}]\n"
        (outdir / f"{n}_{suffix}.txt").write_text(
            f"-- {n} @ {sf_dir} ({suffix})\n{text}"
        )
        print(f"captured {n}")


if __name__ == "__main__":
    main()
