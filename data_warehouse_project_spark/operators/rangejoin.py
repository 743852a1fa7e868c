"""Bucketed interval-point range join — the general operator behind
every "point falls inside an interval" query Spark has no native join
strategy for.

A predicate join ``lo <= p AND p <= hi`` with no equi-key gives
Catalyst only BroadcastNestedLoopJoin (fine iff one side broadcasts)
or a cartesian product — O(|points| x |intervals|) at scale, the
classic 100 TB killer. The standard fix (the same banding trick
``plans/relational3.event_pairs_60s`` inlines for its fixed 60 s
window, generalized here to VARIABLE-width intervals): pick a bucket
width ``w``, explode each interval into the integer buckets
``floor(lo/w) .. floor(hi/w)`` it covers, map each point to its single
bucket ``floor(p/w)``, hash-join on the bucket (plus any caller
equi-keys), and re-check the exact BETWEEN as a residual filter.
Every true (point, interval) pair shares exactly one bucket row, so
no pair is lost and none is duplicated.

Cost model: shuffle volume is O(|points| + |intervals| * (span/w + 1))
— linear, not quadratic. Choosing ``w`` near the TYPICAL interval span
keeps the interval-side replication factor ~2; a too-small ``w``
replicates long intervals heavily, a too-large ``w`` degrades the
residual filter's selectivity (many same-bucket non-matches scanned
per probe). Both failure modes degrade gracefully to extra work,
never to wrong answers. Skew: a bucket is hot only if many intervals
overlap one ``w``-wide stripe AND many points land there; the salt of
composite ``keys`` usually disperses this, and AQE's skew-join
handles the rest.

Reference parity anchor: the reference never needs a range join (its
temporal predicates always ride an equi-key, SURVEY.md §2.3); this is
part of the beyond-reference extension surface, same family as
plans/asof.py (which deliberately does NOT use a range join — an
as-of lookup has a linear windowed formulation; containment joins do
not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"

# widest value domain interval_point_count_join will build a spine for:
# ~4M distinct values covers ten thousand years of days or ~450 years
# of hours; anything wider means the caller passed an unbucketed
# high-resolution column (raw epoch micros) and must bucket first
MAX_COUNT_JOIN_DOMAIN = 1 << 22


def _fdiv(name: str, bucket_width: int):
    """Exact integral floor-division of a column by the bucket width:
    (x - pmod(x, w)) is an exact multiple of w in bigint, ``div`` is
    integral — no double rounding near 2**53 (epoch micros live at
    ~1.7e15; float floor(x/w) can mis-bucket at stripe boundaries).
    ONE definition for both range-join shapes, so a bucketing fix can
    never apply to one and silently miss the other. Backtick-bearing
    names are rejected up front by ``_validate`` (they would need
    escaping here AND in every ``F.col`` reference — Spark's own
    attribute parser refuses them too), so the interpolation below is
    injection-safe by contract."""
    q = f"`{name}`"
    return F.expr(f"({q} - pmod({q}, {bucket_width})) div {bucket_width}")


def _validate(fn: str, a_cols, b_cols, keys, bucket_width: int) -> None:
    if bucket_width <= 0:
        raise ValueError(f"{fn}: bucket_width must be positive")
    ticked = [c for c in (*a_cols, *b_cols) if "`" in c]
    if ticked:
        # a backtick in a name would break the F.expr interpolation in
        # _fdiv (SQL-injection-shaped parse error) and F.col parsing
        # alike — fail fast with a clear message instead
        raise ValueError(f"{fn}: backtick in column name(s): {ticked}")
    dup = (set(a_cols) & set(b_cols)) - set(keys)
    if dup:
        raise ValueError(
            f"{fn}: column names must be disjoint outside `keys`, "
            f"clash: {sorted(dup)}"
        )
    clash = {_BUCKET} & (set(a_cols) | set(b_cols))
    if clash:
        raise ValueError(f"{fn}: reserved internal name in input: {clash}")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join every ``points`` row to every ``intervals`` row with
    ``lo_col <= point_col <= hi_col`` (and equality on ``keys``, which
    must exist on both sides), via the bucketed plan described in the
    module doc — never a nested loop.

    ``point_col``/``lo_col``/``hi_col`` must be integral (cast dates to
    epoch days with ``F.unix_date``, timestamps to ``F.unix_micros``
    first — integer bucket arithmetic is exact; float buckets would
    tear pairs at boundaries). Output columns are the union of both
    frames' columns minus the interval side's ``keys`` (kept once, from
    the point side); all other names must be disjoint or a ValueError
    is raised before any job runs. Empty intervals (hi < lo) match
    nothing, exactly like SQL BETWEEN.
    """
    _validate("interval_point_join", points.columns, intervals.columns, keys, bucket_width)
    lo, hi = F.col(lo_col), F.col(hi_col)

    def fdiv(name: str):
        return _fdiv(name, bucket_width)

    iv = intervals.filter(hi >= lo).withColumn(
        _BUCKET,
        F.explode(F.sequence(fdiv(lo_col), fdiv(hi_col))),
    )
    # The join's row EXPANSION happens inside the probe side's
    # partitions: a compact points scan (one or two parquet splits)
    # would fan out to millions of pairs on as many tasks. Spread the
    # points round-robin across the cluster BEFORE the probe, with an
    # EXPLICIT partition count — the pre-fanout points are small, so
    # AQE would coalesce an implicit repartition right back to one
    # partition (the optimizer sizes by input bytes; the blow-up is
    # invisible to it), and hashing by bucket would cap the width at
    # the distinct-bucket count (often just dozens). Round-robin costs
    # co-location only in the shuffle-join case, where the planner
    # re-exchanges the cheap pre-fanout rows anyway. Measured at sf0.1
    # (83M-pair containment join, 32 cores): scan-partitioned 23.3s,
    # bucket-hashed 3.2s, round-robin 1.4s.
    n_spread = points.sparkSession.sparkContext.defaultParallelism
    pt = points.withColumn(_BUCKET, fdiv(point_col)).repartition(n_spread)
    # string-qualified refs, not pt[k] == iv[k]: when points and
    # intervals derive from the SAME parent frame (a range self-join,
    # e.g. event pairs), dataframe-indexed columns resolve to one
    # attribute and Spark falls back to positional disambiguation with
    # a 'trivially true predicate' warning — explicit aliases keep the
    # condition unambiguous by construction
    pt, iv = pt.alias("__rj_p"), iv.alias("__rj_i")

    def p(c: str):
        return F.col(f"__rj_p.`{c}`")

    def i(c: str):
        return F.col(f"__rj_i.`{c}`")

    cond = [p(_BUCKET) == i(_BUCKET)]
    cond += [p(k) == i(k) for k in keys]
    joined = pt.join(iv, cond).filter(
        (i(lo_col) <= p(point_col)) & (p(point_col) <= i(hi_col))
    )
    keep = [p(c).alias(c) for c in points.columns] + [
        i(c).alias(c) for c in intervals.columns if c not in keys
    ]
    return joined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """The second canonical range-join shape: join every ``left``
    interval to every ``right`` interval it OVERLAPS (closed-interval
    test ``l_lo <= r_hi AND r_lo <= l_hi``, plus equality on ``keys``)
    — meeting scheduling, concurrent-session analytics, interval
    algebra — again without a nested loop.

    Same banding as ``interval_point_join``, with one extra idea: both
    sides explode into their covering buckets, and a true overlapping
    pair would meet in EVERY bucket the overlap region covers, so the
    join would duplicate pairs. Each candidate is therefore claimed by
    exactly ONE canonical bucket — the bucket of the overlap region's
    left edge, ``max(floor(l_lo/w), floor(r_lo/w))`` — checked as a
    residual predicate alongside the exact overlap test. No distinct
    is needed: dedup by construction, which matters because a DISTINCT
    over the pair blow-up would shuffle the very volume the banding
    exists to avoid.

    Contracts as in ``interval_point_join``: integral bounds, disjoint
    column names outside ``keys`` (kept once, from the left), empty
    intervals (hi < lo) match nothing, probe side spread explicitly
    (AQE cannot see the fanout). Replication is O(span/w + 1) per row
    on BOTH sides — pick ``w`` near the typical span of the longer
    side.
    """
    _validate("interval_overlap_join", left.columns, right.columns, keys, bucket_width)

    def fdiv(name: str):
        return _fdiv(name, bucket_width)

    # spread BEFORE the explode: the round-robin exchange then carries
    # the original rows, not span/w+1 replicas of each — the same
    # cheap-pre-fanout-rows argument interval_point_join makes
    n_spread = left.sparkSession.sparkContext.defaultParallelism
    l = (
        left.filter(F.col(left_hi) >= F.col(left_lo))
        .repartition(n_spread)
        .withColumn(_BUCKET, F.explode(F.sequence(fdiv(left_lo), fdiv(left_hi))))
        .alias("__rj_l")
    )
    r = (
        right.filter(F.col(right_hi) >= F.col(right_lo))
        .withColumn(_BUCKET, F.explode(F.sequence(fdiv(right_lo), fdiv(right_hi))))
        .alias("__rj_r")
    )

    def L(c: str):
        return F.col(f"__rj_l.`{c}`")

    def R(c: str):
        return F.col(f"__rj_r.`{c}`")

    cond = [L(_BUCKET) == R(_BUCKET)]
    cond += [L(k) == R(k) for k in keys]
    w = F.lit(bucket_width)
    overlap_lo = F.greatest(L(left_lo), R(right_lo))
    joined = (
        l.join(r, cond)
        .filter((L(left_lo) <= R(right_hi)) & (R(right_lo) <= L(left_hi)))
        # canonical-bucket claim, in pure bigint arithmetic (compare
        # the floored multiple against bucket*w — no float division):
        # the overlap region's left edge lives in exactly one bucket
        .filter((overlap_lo - F.pmod(overlap_lo, w)) == L(_BUCKET) * w)
    )
    keep = [L(c).alias(c) for c in left.columns] + [
        R(c).alias(c) for c in right.columns if c not in keys
    ]
    return joined.select(*keep)


def _count_join_measures(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    count_col: str,
    sum_cols: dict[str, str] | None,
    distinct_count_col: str | None,
):
    """Shared argument validation + measure-expression construction for
    the dense (domain-spine) and sparse (present-values) count joins —
    one definition, so the two modes can never drift on what a measure
    means. Returns (sums, measures, extra_outs)."""
    ticked = [c for c in (point_col, lo_col, hi_col) if "`" in c]
    if ticked:
        raise ValueError(
            f"interval_point_count_join: backtick in column name(s): {ticked}"
        )
    clash = {c for c in intervals.columns if c.startswith("__rj_")}
    if clash:
        raise ValueError(
            f"interval_point_count_join: reserved internal name(s) in "
            f"input: {sorted(clash)}"
        )
    sums = dict(sum_cols or {})
    extra_outs = [distinct_count_col] if distinct_count_col else []
    for out_name in (count_col, *sums, *extra_outs):
        if out_name in intervals.columns:
            raise ValueError(
                f"interval_point_count_join: {out_name!r} already "
                "exists on the interval side"
            )
    integral = ("bigint", "int", "smallint", "tinyint")
    dtypes = dict(points.dtypes)
    for out_name, src in sums.items():
        if "`" in src:
            raise ValueError(
                f"interval_point_count_join: backtick in column name(s): [{src!r}]"
            )
        if dtypes.get(src) not in integral:
            raise ValueError(
                f"interval_point_count_join: sum column {src!r} must be "
                f"integral (got {dtypes.get(src)}) — use exact integer "
                "units (cents/micros), not floats"
            )
    measures = {"__rj_cnt": F.count(F.lit(1))}
    for out_name, src in sums.items():
        measures[f"__rj_s_{out_name}"] = F.sum(F.col(src))
    if distinct_count_col:
        # the groupBy(point value) rollup has already collapsed
        # duplicates — presence is a constant 1 per surviving day row
        measures["__rj_dst"] = F.min(F.lit(1))
    return sums, measures, extra_outs


def interval_point_count_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    domain: tuple[int, int] | None = None,
    count_col: str = "n_points",
    sum_cols: dict[str, str] | None = None,
    distinct_count_col: str | None = None,
) -> DataFrame:
    """Append ``count_col`` = COUNT of points with ``lo <= p <= hi`` to
    every ``intervals`` row — WITHOUT materializing a single pair.

    The r7 sf1 scale smoke proved why this operator must exist next to
    ``interval_point_join``: a containment join's pair count grows
    with the PRODUCT of the two sides' densities, so any
    pair-enumerating plan — however well bucketed — is Θ(density²)
    (measured: 53.8× the wall at 10× the rows). When the deliverable
    is a count (or any sum decomposable over points), the pairs never
    need to exist: points roll up to per-value counts, a cumulative
    sum C over the value DOMAIN turns every interval's count into
    C(hi) - C(lo-1), and two broadcast lookups of the domain-sized
    spine finish the job. O(|points| + |intervals| + |domain|), where
    the domain (e.g. days of a date range) is bounded model state.

    ``domain=(lo, hi)`` (inclusive, integral) bounds the spine; points
    outside it are ignored (filter first if that matters). Omitted, it
    is derived lazily from the points' MIN/MAX — correct for any
    input, but the caller owns the guarantee that the VALUE RANGE is
    bounded (a spine over epoch-micros would explode; bucket such
    values to days/hours first). The single-task cumulative window is
    over the spine only — never data-proportional when the caller
    honors that contract. Intervals with ``hi < lo`` or entirely
    outside the domain get 0, exactly like COUNT over an empty
    BETWEEN.

    ``sum_cols`` extends the decomposition to weighted sums: each
    ``{output_name: points_column}`` entry appends
    SUM(points_column) over the contained points, through the same
    spine (one extra running sum per measure, zero extra joins).
    Measure columns must be INTEGRAL (exact-sum discipline: bigint
    cents, micros — float running sums would drift and break
    cross-engine hashing); enforced against the points schema.

    ``distinct_count_col`` appends COUNT(DISTINCT point value) over the
    contained points — the measure that has NO naive decomposition
    (COUNT DISTINCT is not sum-decomposable over arbitrary partitions)
    but decomposes exactly HERE because the per-value rollup already
    collapses duplicates: each domain value contributes 0/1 presence,
    the running sum of presence is D, and the window's distinct count
    is D(hi) - D(lo-1). One extra running sum, zero extra joins — the
    same cost as a weighted sum.
    """
    # no cross-side disjointness requirement (point columns are never
    # emitted) — only backtick safety, internal-name headroom, and the
    sums, measures, extra_outs = _count_join_measures(
        points, intervals, point_col, lo_col, hi_col,
        count_col, sum_cols, distinct_count_col,
    )
    daily = points.groupBy(F.col(point_col).alias("__rj_day")).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )

    from data_warehouse_project_spark.operators.prefix import single_group

    if domain is not None:
        d0, d1 = int(domain[0]), int(domain[1])
        if d1 - d0 > MAX_COUNT_JOIN_DOMAIN:
            raise ValueError(
                f"interval_point_count_join: domain width {d1 - d0} "
                f"exceeds {MAX_COUNT_JOIN_DOMAIN} — bucket the value "
                "column (days/hours, not raw micros) before counting"
            )
        daily = daily.filter(
            (F.col("__rj_day") >= d0) & (F.col("__rj_day") <= d1)
        )
        spine = points.sparkSession.range(d0 - 1, d1 + 1).select(
            F.col("id").alias("__rj_day")
        )
        iv = intervals
        b_lo, b_hi = F.lit(d0), F.lit(d1)
    else:
        bounds = points.agg(
            F.min(point_col).alias("__rj_b_lo"), F.max(point_col).alias("__rj_b_hi")
        )
        # same bound, enforced IN the plan (the derived width is only
        # known at run time): an unbucketed value column (epoch micros)
        # would otherwise try to materialize a billions-element spine
        # and die with an opaque array-size error mid-stage
        guarded_hi = F.when(
            F.col("__rj_b_hi") - F.col("__rj_b_lo") > MAX_COUNT_JOIN_DOMAIN,
            F.raise_error(
                F.lit(
                    "interval_point_count_join: derived domain wider "
                    f"than {MAX_COUNT_JOIN_DOMAIN} — bucket the value "
                    "column (days/hours, not raw micros) before counting"
                )
            ).cast("bigint"),
        ).otherwise(F.col("__rj_b_hi"))
        spine = bounds.select(
            F.explode(
                F.sequence(F.col("__rj_b_lo") - 1, guarded_hi)
            ).alias("__rj_day")
        )
        # 1-row bounds frame crossed into the interval side (broadcast
        # nested loop of one row — the same pattern as every watermark/
        # threshold query); empty points → null bounds → null clamped
        # keys → left-join miss → coalesce(0), rows all survive
        iv = intervals.crossJoin(F.broadcast(bounds))
        b_lo, b_hi = F.col("__rj_b_lo"), F.col("__rj_b_hi")

    cum_w = (
        Window.partitionBy(single_group(F.col("__rj_day"))).orderBy("__rj_day")
    )
    mnames = list(measures)
    cum = (
        spine.join(F.broadcast(daily), "__rj_day", "left")
        .select(
            "__rj_day",
            *[F.coalesce(m, F.lit(0)).alias(m) for m in mnames],
        )
        .select(
            "__rj_day",
            *[F.sum(m).over(cum_w).alias(m) for m in mnames],
        )
    )

    def clamp(col):
        return F.greatest(F.least(col, b_hi), b_lo - 1)

    keyed = iv.withColumn("__rj_dh", clamp(F.col(hi_col))).withColumn(
        "__rj_dl", clamp(F.col(lo_col) - 1)
    )
    # hi < lo (empty interval): clamp can leave dh < dl and the
    # prefix difference would be the NEGATED sum of the gap — zero
    # such intervals explicitly (a floor-at-0 would be wrong for
    # signed sum measures)
    out = keyed.join(
        F.broadcast(
            cum.select(
                F.col("__rj_day").alias("__rj_dh"),
                *[F.col(m).alias(f"__rj_h_{m}") for m in mnames],
            )
        ),
        "__rj_dh",
        "left",
    ).join(
        F.broadcast(
            cum.select(
                F.col("__rj_day").alias("__rj_dl"),
                *[F.col(m).alias(f"__rj_l_{m}") for m in mnames],
            )
        ),
        "__rj_dl",
        "left",
    )
    # NULL endpoints match nothing, exactly like SQL BETWEEN with a
    # NULL bound — without this the signed prefix difference emits a
    # meaningless one-sided value
    empty = (
        F.col(hi_col).isNull()
        | F.col(lo_col).isNull()
        | (F.col(hi_col) < F.col(lo_col))
    )

    def measure(m: str):
        diff = F.coalesce(F.col(f"__rj_h_{m}"), F.lit(0)) - F.coalesce(
            F.col(f"__rj_l_{m}"), F.lit(0)
        )
        return F.when(empty, F.lit(0)).otherwise(diff).cast("bigint")

    out = out.withColumn(count_col, measure("__rj_cnt"))
    for out_name in sums:
        out = out.withColumn(out_name, measure(f"__rj_s_{out_name}"))
    if distinct_count_col:
        out = out.withColumn(distinct_count_col, measure("__rj_dst"))
    return out.select(*intervals.columns, count_col, *sums, *extra_outs)


# bucket-spine ceiling for the sparse count join: the per-bucket carry
# frame is model state (broadcast + one single-task window), so its
# size must be bounded by the caller's width choice, not by data.
# 2^16 buckets of, say, 1-hour micros stripes span ~7.5 years.
MAX_SPARSE_BUCKETS = 1 << 16


def interval_point_count_join_sparse(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    count_col: str = "n_points",
    sum_cols: dict[str, str] | None = None,
    distinct_count_col: str | None = None,
) -> DataFrame:
    """``interval_point_count_join`` for UNBOUNDED value domains —
    epoch micros straight in, no pre-bucketing, no 4M-value spine.

    The dense mode materializes a spine row per domain VALUE, which is
    exactly right at day/hour grain and impossible at micros (a year is
    ~3.2e13 values). The sparse decomposition replaces the value spine
    with two levels:

    1. points roll up to per-VALUE measure rows (|distinct values| —
       data-proportional, distributed);
    2. a BUCKET spine at ``bucket_width`` stripes (bounded model state,
       enforced in-plan at MAX_SPARSE_BUCKETS) carries each bucket's
       exclusive prefix totals, computed with one single-task window
       over the bounded bucket frame — the
       ``operators.prefix.bucketed_prefix_sum`` two-pass shape;
    3. each value row's GLOBAL inclusive prefix C(v) = its in-bucket
       running sum (parallel per-bucket windows) + its bucket's carry;
    4. each interval endpoint needs C at an arbitrary value, i.e. the
       last value row ≤ endpoint — the as-of union trick
       (plans/asof.py), partitioned by the SAME buckets: interval rows
       ride one window per endpoint with the value rows of their
       bucket, ``last(C, ignorenulls)`` carries the answer onto them,
       and an endpoint with no preceding value row in its bucket falls
       back to the bucket carry (correct even in buckets holding no
       points at all, because the carry spine is dense over buckets).

    Cost: one rollup shuffle of points + two window shuffles of
    intervals (endpoints must move to their bucket's partition — the
    price of dropping the broadcastable spine), all linear; zero pair
    rows. Results are bit-identical to the dense mode wherever both
    apply (property-tested); empty (hi<lo) intervals yield 0.
    """
    if bucket_width <= 0:
        raise ValueError(
            "interval_point_count_join_sparse: bucket_width must be positive"
        )
    sums, measures, extra_outs = _count_join_measures(
        points, intervals, point_col, lo_col, hi_col,
        count_col, sum_cols, distinct_count_col,
    )
    from data_warehouse_project_spark.operators.prefix import single_group

    mnames = list(measures)
    daily = points.groupBy(F.col(point_col).alias("__rj_v")).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )
    fdiv = _fdiv("__rj_v", bucket_width)
    b = daily.withColumn("__rj_pb", fdiv)
    totals = b.groupBy("__rj_pb").agg(
        *[F.sum(m).alias(m) for m in mnames]
    )
    # dense spine over BUCKETS (not values): bounds derived lazily,
    # width guarded in the minted expression — same zero-extra-jobs
    # pattern as the dense mode's derived-domain guard
    bounds = b.agg(
        F.min("__rj_pb").alias("__rj_blo"), F.max("__rj_pb").alias("__rj_bhi")
    )
    guarded_bhi = F.when(
        F.col("__rj_bhi") - F.col("__rj_blo") > MAX_SPARSE_BUCKETS,
        F.raise_error(
            F.lit(
                "interval_point_count_join_sparse: bucket spine wider "
                f"than {MAX_SPARSE_BUCKETS} buckets — raise bucket_width "
                "so the stripe count stays model-sized"
            )
        ).cast("bigint"),
    ).otherwise(F.col("__rj_bhi"))
    bspine = bounds.select(
        F.explode(F.sequence(F.col("__rj_blo"), guarded_bhi)).alias("__rj_pb")
    )
    carry_w = (
        Window.partitionBy(single_group(F.col("__rj_pb")))
        .orderBy("__rj_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # per-bucket EXCLUSIVE prefix totals (carry-in), dense over the
    # bucket range so endpoints landing in point-free buckets resolve
    bcarry = (
        bspine.join(F.broadcast(totals), "__rj_pb", "left")
        .select(
            "__rj_pb",
            *[F.coalesce(F.col(m), F.lit(0)).alias(m) for m in mnames],
        )
        .select(
            "__rj_pb",
            *[
                F.coalesce(F.sum(m).over(carry_w), F.lit(0)).alias(
                    f"__rj_carry_{m}"
                )
                for m in mnames
            ],
        )
        .localCheckpoint(eager=False)
    )
    in_w = (
        Window.partitionBy("__rj_pb")
        .orderBy("__rj_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dcum = (
        b.join(F.broadcast(bcarry), "__rj_pb")
        .select(
            "__rj_pb",
            "__rj_v",
            *[
                (F.sum(m).over(in_w) + F.col(f"__rj_carry_{m}")).alias(
                    f"__rj_C_{m}"
                )
                for m in mnames
            ],
        )
        # consumed by BOTH endpoint lookups — checkpoint lazily so the
        # points rollup runs once, not per endpoint
        .localCheckpoint(eager=False)
    )
    # bucket clamp range for endpoints: [blo, bhi] so below-all-data
    # endpoints land before every value row of the first bucket (C=0
    # via carry(blo)=0) and above-all-data endpoints land after every
    # value row of the last bucket (C=total). The 1-row bounds frame
    # rides a broadcast cross — the same model-state scalar-attach
    # pattern as the watermark/threshold queries (explain audit
    # ALLOW_NESTED_LOOP: build side is exactly one row by construction,
    # an ungrouped agg)
    brange = F.broadcast(
        bounds.select("__rj_blo", "__rj_bhi").localCheckpoint(eager=False)
    )

    def lookup(iv: DataFrame, endpoint, tag: str) -> DataFrame:
        """Attach __rj_{tag}_{measure} = C(endpoint) to every iv row."""
        e = iv.crossJoin(brange).withColumn("__rj_v", endpoint)
        e = e.withColumn(
            "__rj_pb",
            F.greatest(
                F.least(_fdiv("__rj_v", bucket_width), F.col("__rj_bhi")),
                F.col("__rj_blo"),
            ),
        ).drop("__rj_blo", "__rj_bhi")
        u = dcum.withColumn("__rj_side", F.lit(0)).unionByName(
            e.withColumn("__rj_side", F.lit(1)), allowMissingColumns=True
        )
        w = (
            Window.partitionBy("__rj_pb")
            .orderBy("__rj_v", "__rj_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = u.select(
            "*",
            *[
                F.last(f"__rj_C_{m}", ignorenulls=True)
                .over(w)
                .alias(f"__rj_cd_{m}")
                for m in mnames
            ],
        ).filter(F.col("__rj_side") == 1)
        # LEFT join: a NULL endpoint yields a NULL bucket, which an
        # inner join would silently drop — dense mode keeps such rows
        # (count 0), so must this
        out = carried.join(F.broadcast(bcarry), "__rj_pb", "left")
        for m in mnames:
            out = out.withColumn(
                f"__rj_{tag}_{m}",
                F.coalesce(
                    F.col(f"__rj_cd_{m}"), F.col(f"__rj_carry_{m}"), F.lit(0)
                ),
            )
        drop = (
            ["__rj_v", "__rj_pb", "__rj_side"]
            + [f"__rj_C_{m}" for m in mnames]
            + [f"__rj_cd_{m}" for m in mnames]
            + [f"__rj_carry_{m}" for m in mnames]
        )
        return out.drop(*drop)

    keyed = lookup(intervals, F.col(hi_col), "h")
    keyed = lookup(keyed, F.col(lo_col) - 1, "l")
    # NULL endpoints match nothing, exactly like SQL BETWEEN with a
    # NULL bound — without this the signed prefix difference emits a
    # meaningless one-sided value
    empty = (
        F.col(hi_col).isNull()
        | F.col(lo_col).isNull()
        | (F.col(hi_col) < F.col(lo_col))
    )

    def measure(m: str):
        diff = F.col(f"__rj_h_{m}") - F.col(f"__rj_l_{m}")
        return F.when(empty, F.lit(0)).otherwise(diff).cast("bigint")

    out = keyed.withColumn(count_col, measure("__rj_cnt"))
    for out_name in sums:
        out = out.withColumn(out_name, measure(f"__rj_s_{out_name}"))
    if distinct_count_col:
        out = out.withColumn(distinct_count_col, measure("__rj_dst"))
    return out.select(*intervals.columns, count_col, *sums, *extra_outs)
