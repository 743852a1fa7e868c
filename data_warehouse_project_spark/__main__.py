"""Command-line entry point: run the full medallion ETL.

    python -m data_warehouse_project_spark SRC_DIR WAREHOUSE_DIR \
        [--format parquet|csv] [--scd snapshot|merge] [--cpus N]

Mirrors the reference's master procedure invocation (SURVEY §2.9 O1):
one command loads staging → 3NF → dimensional and prints the per-stage
timing table plus the run-log rollup.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_warehouse_project_spark")
    p.add_argument("src_dir", help="source directory (parquet or csv tables)")
    p.add_argument("warehouse_root", help="warehouse output directory")
    p.add_argument("--format", choices=("parquet", "csv"), default="parquet")
    p.add_argument("--scd", choices=("snapshot", "merge"), default="snapshot")
    p.add_argument("--cpus", default=None, help="local[N] parallelism")
    args = p.parse_args(argv)

    from data_warehouse_project_spark.etl import run_full_etl
    from data_warehouse_project_spark.etl.warehouse import Warehouse
    from data_warehouse_project_spark.session import get_spark

    spark = get_spark("etl-cli", cpus=int(args.cpus) if args.cpus else None)
    stages = run_full_etl(
        spark,
        args.src_dir,
        args.warehouse_root,
        src_format=args.format,
        scd_strategy=args.scd,
    )
    print(json.dumps({"stages_sec": {k: round(v, 3) for k, v in stages.items()}}))
    wh = Warehouse(spark, args.warehouse_root)
    for row in wh.log_rollup().collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
