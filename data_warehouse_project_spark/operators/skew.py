"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
pre-planned variant for the pathological case AQE can't fix: one join
key so hot that even a split partition overwhelms an executor — the
classic power-law key (null-like sentinel ids, celebrity users).

`salted_join(big, small, key, salt)` replicates the *small* side
``salt`` times and scatters the big side uniformly across the salt
space, so the hot key's rows spread over ``salt`` reducers. Correct for
inner/left joins on equality (each big row meets exactly one replica of
its matching small row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equality join on ``key`` with the small side replicated over a
    salt space. Output columns = big ∪ (small minus key), like
    ``big.join(small, key, how)``."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: replicating "
            "the small side breaks right/full/semi/anti semantics (unmatched "
            "small rows would appear once per salt replica)"
        )
    # pmod, not abs(hash)%salt: hash can return Int.MIN_VALUE, whose
    # abs() is still negative (two's complement), and a negative salt
    # matches no replica — ~1 silently dropped row per 4.3B at scale
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(salt)),
    )
    replicas = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(replicas, on=[key, "__salt"], how=how).drop("__salt")
    return out
