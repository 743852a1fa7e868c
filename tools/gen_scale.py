"""Deterministic scale-up generator for the scale smoke (VERDICT r6
item 1): clone the driver's testdata schema ``factor``× into a scratch
dir, preserving per-clone distributions and FK consistency, so the
bench entries can be timed at ~10× the largest driver scale.

Design — clone-with-offsets, NOT resampling:

- clone 0 is byte-identical to the source, so low-id-keyed bench
  queries (ANN query vectors are ``vec_id < 5``) see exactly the
  workload they see at sf0.1;
- every key column is offset by ``clone × (max_key + 1)`` on BOTH
  sides of each FK (orders.o_custkey moves with customer.c_custkey),
  so join fan-outs scale linearly and no cross-clone key ever
  collides;
- bounded dimensions stay bounded: region/nation are NOT cloned, and
  cloned rows keep their nation keys / brand strings / segments — a
  10× corpus has 10× rows per brand, not 10× brands (exactly how a
  bigger TPC-H behaves, and what keeps the dense-key geo/product dims
  within their cardinality bound);
- document text gets a clone-specific prefix on EVERY token
  (``c<i>``-): intra-clone shingle structure — and therefore the
  near-dup pair set — is preserved verbatim per clone, while
  cross-clone shingles can never match, so LSH candidate volume
  scales linearly instead of quadratically (naive duplication would
  make every document a 10-way near-dup group and the smoke would
  measure an artificial all-pairs blowup, not scaling);
- embeddings get a deterministic per-(clone, dim) md5-derived ±0.005
  nudge: cluster structure survives, but no cross-clone vector is an
  exact duplicate;
- no RNG, no clock: everything derives from (clone index, column
  value, md5) — rerunning produces byte-identical output.

Usage: PYTHONPATH=/root/repo python tools/gen_scale.py \
           [src_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1  /tmp/sfscale  10
Never writes outside ``out_dir``; the source is read-only.
"""

from __future__ import annotations

import hashlib
import sys

_REPO = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:  # tolerate any caller cwd (gates must not
    sys.path.insert(0, _REPO)  # silently run against a stale install)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# key column -> owning table; FK columns share the owner's offset
KEY_OWNERS = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}
# per-table mapping: column -> key family (FKs point at the family)
OFFSET_COLS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def _nudge(clone: int, d: int) -> float:
    """Deterministic ±0.005 perturbation for embedding dim d of a clone."""
    h = int.from_bytes(hashlib.md5(f"{clone}:{d}".encode()).digest()[:8], "big")
    return ((h / 2**63) - 1.0) * 0.005


def generate(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int
) -> dict[str, int]:
    from data_warehouse_project_spark.catalog import table as cat_table

    # catalog.table, NOT spark.read.parquet: events has shipped as
    # TIMESTAMP(NANOS) in some testdata generations and only the
    # catalog reader normalizes it (verify SKILL.md gotcha) — the
    # clone is then written as a plain timestamp
    frames = {t: cat_table(spark, src_dir, t) for t in TABLES}
    # one tiny agg job per key family for the offset strides
    strides: dict[str, int] = {}
    for col, owner in KEY_OWNERS.items():
        strides[col] = int(
            frames[owner].agg(F.max(F.col(col))).collect()[0][0]
        ) + 1

    written: dict[str, int] = {}
    for t in TABLES:
        base = frames[t]
        if t in ("region", "nation"):
            out = base  # bounded dims: never cloned
        else:
            clones = []
            for i in range(factor):
                c = base
                for col, family in OFFSET_COLS.get(t, {}).items():
                    c = c.withColumn(
                        col,
                        (F.col(col) + F.lit(i * strides[family])).cast(
                            dict(base.dtypes)[col]
                        ),
                    )
                if t == "documents" and i > 0:
                    # prefix every token: intra-clone shingles identical,
                    # cross-clone shingles disjoint
                    c = c.withColumn(
                        "text",
                        F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}-$1"),
                    ).withColumn("n_chars", F.length("text").cast("bigint"))
                if t == "embeddings" and i > 0:
                    dim = len(base.select("embedding").first()[0])
                    nudges = F.array(
                        *[F.lit(_nudge(i, d)) for d in range(dim)]
                    )
                    c = c.withColumn(
                        "embedding",
                        F.zip_with(
                            F.col("embedding"),
                            nudges,
                            lambda x, y: (x + y).cast("float"),
                        ),
                    )
                clones.append(c)
            out = clones[0]
            for c in clones[1:]:
                out = out.unionByName(c)
        path = f"{out_dir}/{t}.parquet"
        out.write.mode("overwrite").parquet(path)
        written[t] = spark.read.parquet(path).count()
    return written


if __name__ == "__main__":
    from data_warehouse_project_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    counts = generate(get_spark("gen-scale"), src, out, factor)
    for t, n in counts.items():
        print(t, n)
