"""Readers for the views' ``hist`` measure: a per-group bin-count
array ``[underflow, bin1..binN, overflow]`` over ``[lo, hi)`` —
additive (and delete-subtractable) physical state the views fold like
a per-cell SUM; this module derives quantiles from it.

Accuracy contract: exact counts per bin, so a quantile is exact to bin
resolution (±width/2 with linear interpolation inside the hit bin);
under/overflow mass clamps to lo/hi. That is the classic fixed-bin
alternative to streaming sketches — chosen here because it is the only
summary in this family that both MERGES (rollup across groups = array
sum) and SUBTRACTS (correction deletes fold with sign −1, no repair
read), which KLL/t-digest cannot."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hist_total(hist) -> Column:
    """Total (non-null) count in a hist array."""
    h = F.col(hist) if isinstance(hist, str) else hist
    return F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)


def hist_percentile(hist, p: float, lo: int, hi: int, bins: int) -> Column:
    """The p-quantile (0 < p <= 1) estimated from a hist array created
    with the same (lo, hi, bins): one pass over the cells with a
    struct accumulator, linear interpolation inside the hit cell,
    underflow/overflow clamped to lo/hi. NULL for an empty histogram.
    """
    if not (0 < p <= 1):
        raise ValueError(f"hist_percentile: p must be in (0, 1], got {p}")
    h = F.col(hist) if isinstance(hist, str) else hist
    w = (hi - lo) / bins
    total = hist_total(h)
    target = total.cast("double") * F.lit(float(p))
    init = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("ans"),
        F.lit(0).alias("i"),
    )

    def step(acc, x):
        cum2 = acc["cum"] + x
        i = acc["i"]
        left = F.lit(float(lo)) + (i.cast("double") - 1) * F.lit(w)
        frac = (target - acc["cum"].cast("double")) / x.cast("double")
        val = (
            F.when(i == 0, F.lit(float(lo)))
            .when(i == bins + 1, F.lit(float(hi)))
            .otherwise(
                left
                + F.lit(w)
                * F.least(F.lit(1.0), F.greatest(F.lit(0.0), frac))
            )
        )
        hit = (
            acc["ans"].isNull()
            & (x > 0)
            & (cum2.cast("double") >= target)
        )
        return F.struct(
            cum2.alias("cum"),
            F.when(hit, val).otherwise(acc["ans"]).alias("ans"),
            (i + F.lit(1)).alias("i"),
        )

    return F.when(total > 0, F.aggregate(h, init, step, lambda a: a["ans"]))
