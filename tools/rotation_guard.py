"""Rotation guard: every registry query must eventually be DRIVER-GREEN.

The correctness driver hashes a deterministic 50-entry PREFIX of
``plans.QUERIES`` each round, so insertion order decides which queries
ever get driver-verified. Rounds 8-9 rotated the prefix by hand and
still miscounted one query (sampled-but-errored != green). This tool
makes the invariant mechanical:

  green union  = every query that has passed a driver sample in ANY
                 CORRECTNESS_r*.json (rows_match and, when an oracle
                 exists, hash_match);
  requirement  = every registry query NOT yet in that union must sit
                 inside the next sample's 50-entry prefix.

Exit 0 when the invariant holds (prints the would-be-sampled never-green
queries); exit 1 listing any never-green query the current rotation
would leave unsampled again.

Usage: PYTHONPATH=/root/repo python tools/rotation_guard.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys

PREFIX = 50


def green_union(repo_root: str) -> set[str]:
    union: set[str] = set()
    for p in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            d = json.load(f)
        for name, v in d.items():
            if not isinstance(v, dict):
                continue
            ok = bool(v.get("rows_match")) and v.get("hash_match") in (True, None)
            if ok and not v.get("err"):
                union.add(name)
    return union


def main() -> int:
    repo_root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, repo_root)
    from data_warehouse_project_spark.plans import QUERIES

    union = green_union(repo_root)
    names = list(QUERIES)
    never_green = [k for k in names if k not in union]
    prefix = set(names[:PREFIX])
    left_out = [k for k in never_green if k not in prefix]
    print(
        f"registry: {len(names)} queries; all-time driver-green: "
        f"{len(union & set(names))}; never green: {len(never_green)}"
    )
    for k in never_green:
        mark = "IN PREFIX (will be sampled)" if k in prefix else "LEFT OUT"
        print(f"  {k}: {mark}")
    if left_out:
        print(
            f"FAIL: {len(left_out)} never-green quer"
            f"{'y' if len(left_out) == 1 else 'ies'} outside the "
            f"{PREFIX}-entry driver prefix — rotate plans/__init__.py"
        )
        return 1
    print("OK: every never-green query is inside the driver prefix")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
