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


def _cell_edges(i: int, lo: int, hi: int, bins: int, outer: int):
    """(left, width) of cell ``i`` in the two-level layout
    ``[u_K..u_1, bin_1..bin_N, o_1..o_K]`` — fine cells uniform over
    [lo, hi), outer cells geometric (bin j spans ``span·2^(j-1)``)."""
    span = hi - lo
    w = span / bins
    if i < outer:  # underflow, farthest first
        j = outer - i  # 1 = nearest the grid
        left = lo - span * (2**j - 1)
        return float(left), float(span * 2 ** (j - 1))
    if i < outer + bins:
        return float(lo + (i - outer) * w), float(w)
    j = i - (outer - 1 + bins)  # overflow, 1 = nearest the grid
    left = hi + span * (2 ** (j - 1) - 1)
    return float(left), float(span * 2 ** (j - 1))


def hist_percentile(
    hist, p: float, lo: int, hi: int, bins: int, outer: int = 1
) -> Column:
    """The p-quantile (0 < p <= 1) estimated from a hist array created
    with the same (lo, hi, bins, outer): one pass over the cells with
    a struct accumulator and linear interpolation inside the hit cell.
    With the legacy ``outer=1`` layout, under/overflow mass clamps to
    lo/hi; with ``outer=K > 1`` the geometric outer bins interpolate
    like fine bins, so mass that OVERFLOWS the original grid (a
    distribution shift after view create) still quantiles to the
    containing outer bin's width instead of collapsing to the edge.
    NULL for an empty histogram."""
    if not (0 < p <= 1):
        raise ValueError(f"hist_percentile: p must be in (0, 1], got {p}")
    h = F.col(hist) if isinstance(hist, str) else hist
    total = hist_total(h)
    target = total.cast("double") * F.lit(float(p))
    ncells = bins + 2 * outer
    init = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("ans"),
        F.lit(0).alias("i"),
    )
    # per-cell (left, width) lookup arrays — tiny literal arrays, so
    # the one-pass aggregate stays a single codegen expression
    lefts = F.array(
        *[
            F.lit(_cell_edges(i, lo, hi, bins, outer)[0])
            for i in range(ncells)
        ]
    )
    widths = F.array(
        *[
            F.lit(_cell_edges(i, lo, hi, bins, outer)[1])
            for i in range(ncells)
        ]
    )

    def step(acc, x):
        cum2 = acc["cum"] + x
        i = acc["i"]
        left = F.element_at(lefts, i + 1)
        width = F.element_at(widths, i + 1)
        frac = (target - acc["cum"].cast("double")) / x.cast("double")
        interp = left + width * F.least(
            F.lit(1.0), F.greatest(F.lit(0.0), frac)
        )
        if outer == 1:  # legacy clamp semantics, test-pinned
            val = (
                F.when(i == 0, F.lit(float(lo)))
                .when(i == bins + 1, F.lit(float(hi)))
                .otherwise(interp)
            )
        else:
            val = interp
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
