"""operators/rangejoin.interval_point_join vs the naive theta-join.

The bucketed plan must be EXACTLY the nested-loop's pair set — any
bucket-boundary tear (a pair whose point and interval stripe disagree)
or replication slip (a pair counted once per covered bucket) is a
wrong answer, so the property test sweeps bucket widths from
pathological (1) to degenerate (one bucket covers everything).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.operators.rangejoin import interval_point_join


def _frames(spark, seed, n_pts=120, n_iv=40, keyed=False):
    rng = random.Random(seed)
    pts = [(i, rng.randint(-50, 150), rng.randint(0, 2)) for i in range(n_pts)]
    ivs = []
    for j in range(n_iv):
        lo = rng.randint(-60, 140)
        # include empty (hi < lo), point (hi == lo), and long intervals
        hi = lo + rng.choice([-5, 0, 1, 3, 17, 60])
        ivs.append((j, lo, hi, rng.randint(0, 2)))
    p = spark.createDataFrame(pts, "pid long, p long, k long")
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long, k long")
    if not keyed:
        p, iv = p.drop("k"), iv.drop("k")
    return p, iv


def _naive(spark, p, iv, keyed):
    cond = (F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi"))
    if keyed:
        cond = cond & (p["k"] == iv["k"])
    out = p.join(iv, cond)
    return sorted(
        (r["pid"], r["ivid"]) for r in out.select(p["pid"], iv["ivid"]).collect()
    )


@pytest.mark.parametrize("width", [1, 7, 16, 1000])
@pytest.mark.parametrize("keyed", [False, True])
def test_matches_naive_theta_join(spark, width, keyed):
    p, iv = _frames(spark, seed=width * 2 + keyed, keyed=keyed)
    keys = ["k"] if keyed else []
    got = interval_point_join(p, iv, "p", "lo", "hi", width, keys=keys)
    assert sorted(
        (r["pid"], r["ivid"]) for r in got.select("pid", "ivid").collect()
    ) == _naive(spark, p, iv, keyed)


def test_boundaries_inclusive_and_empty_excluded(spark):
    p = spark.createDataFrame([(1, 10), (2, 20), (3, 15)], "pid long, p long")
    iv = spark.createDataFrame(
        [(1, 10, 20), (2, 30, 25)], "ivid long, lo long, hi long"
    )
    got = interval_point_join(p, iv, "p", "lo", "hi", 16)
    assert sorted(r["pid"] for r in got.collect()) == [1, 2, 3]  # lo==p, hi==p in
    assert all(r["ivid"] == 1 for r in got.collect())  # empty interval matches none


def test_negative_coordinates_floor_not_truncate(spark):
    # a point at -1 and an interval [-10, -1]: truncating division would
    # put bucket(-1)=0 while the interval covers stripes [-1, 0] — floor
    # semantics must still pair them for every width
    p = spark.createDataFrame([(1, -1), (2, -10), (3, 0)], "pid long, p long")
    iv = spark.createDataFrame([(7, -10, -1)], "ivid long, lo long, hi long")
    for width in (3, 16):
        got = interval_point_join(p, iv, "p", "lo", "hi", width)
        assert sorted(r["pid"] for r in got.collect()) == [1, 2]


def test_rejects_clashing_columns_and_bad_width(spark):
    p = spark.createDataFrame([(1, 2)], "x long, p long")
    iv = spark.createDataFrame([(1, 2, 3)], "x long, lo long, hi long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_point_join(p, iv, "p", "lo", "hi", 4)
    ok_iv = spark.createDataFrame([(1, 2, 3)], "ivid long, lo long, hi long")
    with pytest.raises(ValueError, match="positive"):
        interval_point_join(p, ok_iv, "p", "lo", "hi", 0)


def _iv_frames(spark, seed, keyed):
    rng = random.Random(seed)

    def mk(n, pfx):
        rows = []
        for j in range(n):
            lo = rng.randint(-40, 100)
            hi = lo + rng.choice([-3, 0, 1, 5, 20, 70])
            rows.append((j, lo, hi, rng.randint(0, 2)))
        df = spark.createDataFrame(
            rows, f"{pfx}id long, {pfx}lo long, {pfx}hi long, k long"
        )
        return df if keyed else df.drop("k")

    return mk(60, "a"), mk(45, "b")


@pytest.mark.parametrize("width", [1, 9, 16, 1000])
@pytest.mark.parametrize("keyed", [False, True])
def test_overlap_join_matches_naive_no_duplicates(spark, width, keyed):
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a, b = _iv_frames(spark, seed=width * 3 + keyed, keyed=keyed)
    cond = (
        (F.col("alo") <= F.col("bhi"))
        & (F.col("blo") <= F.col("ahi"))
        # the raw inequality pair is satisfied by EMPTY intervals too
        # (hi < lo); the operator excludes them like SQL BETWEEN, so the
        # naive reference must as well
        & (F.col("ahi") >= F.col("alo"))
        & (F.col("bhi") >= F.col("blo"))
    )
    if keyed:
        cond = cond & (a["k"] == b["k"])
    naive = sorted(
        (r["aid"], r["bid"])
        for r in a.join(b, cond).select(a["aid"], b["bid"]).collect()
    )
    got = interval_overlap_join(
        a, b, "alo", "ahi", "blo", "bhi", width, keys=["k"] if keyed else []
    )
    pairs = [(r["aid"], r["bid"]) for r in got.select("aid", "bid").collect()]
    # exact multiset equality: the canonical-bucket claim must dedup
    # (a pair overlapping many buckets appears once) AND lose nothing
    assert sorted(pairs) == naive
    assert len(pairs) == len(set(pairs))


def test_overlap_join_negative_and_touching_edges(spark):
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame([(1, -10, -1), (2, 5, 5)], "aid long, alo long, ahi long")
    b = spark.createDataFrame(
        [(1, -1, 3), (2, 4, 5), (3, 6, 9)], "bid long, blo long, bhi long"
    )
    for width in (3, 16):
        got = sorted(
            (r["aid"], r["bid"])
            for r in interval_overlap_join(
                a, b, "alo", "ahi", "blo", "bhi", width
            ).collect()
        )
        # touching at a single shared point counts as overlap (closed)
        assert got == [(1, 1), (2, 2)]


def test_epoch_micro_magnitudes_bucket_exactly(spark):
    """The operators claim exact bucketing at epoch-microsecond
    magnitudes (~1.7e15, where float floor(x/w) can misbucket at
    stripe boundaries). Points sit exactly ON bucket edges at ~4.5e15
    with an awkward odd width; every containment decision must be
    exact."""
    w = 60_000_001  # odd width: x/w is never exactly representable
    base = 4_500_000_000_000_000
    edge = base - base % w  # an exact stripe boundary near 4.5e15
    pts = [(i, edge + d) for i, d in enumerate([-1, 0, 1, w - 1, w, w + 1])]
    ivs = [(1, edge, edge + w - 1), (2, edge - w, edge - 1)]
    p = spark.createDataFrame(pts, "pid long, p long")
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long")
    got = sorted(
        (r["pid"], r["ivid"])
        for r in interval_point_join(p, iv, "p", "lo", "hi", w).collect()
    )
    want = sorted(
        (i, ivid)
        for i, (_, x) in enumerate(pts)
        for ivid, lo, hi in ivs
        if lo <= x <= hi
    )
    assert got == want


def test_backtick_column_names_rejected_up_front(spark):
    """A backtick in any input column name would break the F.expr
    interpolation inside _fdiv (SQL-injection-shaped parse error) and
    F.col attribute parsing alike — the operators must refuse it with
    a clear ValueError BEFORE any Spark job runs."""
    p = spark.createDataFrame([(1, 10), (2, 25)], ["pid", "p`t"])
    iv = spark.createDataFrame([(1, 5, 15)], ["ivid", "lo", "hi"])
    with pytest.raises(ValueError, match="backtick"):
        interval_point_join(p, iv, "p`t", "lo", "hi", 7)


# --- hypothesis sweep: (width, offset, sign) including widths near
# 2**31 and windows straddling 0, at epoch-micro magnitudes ---------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WIDTHS = st.one_of(
    st.integers(1, 9),
    st.integers(50, 5000),
    st.integers(2**31 - 3, 2**31 + 3),
)
_OFFSETS = st.sampled_from(
    [
        0,
        -1,
        1,
        -(2**31),
        2**31,
        1_700_000_000_000_000,  # epoch micros, "now"
        -4_500_000_000_000_000,  # negative epoch-micro magnitude
    ]
)


@st.composite
def _case(draw):
    w = draw(_WIDTHS)
    off = draw(_OFFSETS)
    # coordinates within a few stripes of the offset; spans relative
    # to w so boundary-width intervals (w-1, w, w+1) and empties occur
    delta = st.integers(-2 * w, 2 * w)
    pts = [off + d for d in draw(st.lists(delta, min_size=1, max_size=8))]
    ivs = []
    for _ in range(draw(st.integers(1, 6))):
        lo = off + draw(delta)
        span = draw(
            st.sampled_from([-3, -1, 0, 1, w - 1, w, w + 1, 2 * w])
        )
        ivs.append((lo, lo + span))
    # bias: every interval endpoint is also a point (exact-edge hits)
    for lo, hi in ivs:
        pts.extend([lo, hi])
    return w, pts, ivs


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=_case())
def test_hypothesis_point_join_matches_python_naive(spark, case):
    w, pts, ivs = case
    p = spark.createDataFrame(
        [(i, x) for i, x in enumerate(pts)], "pid long, p long"
    )
    iv = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(ivs)],
        "ivid long, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["ivid"])
        for r in interval_point_join(p, iv, "p", "lo", "hi", w).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(pts)
        for j, (lo, hi) in enumerate(ivs)
        if lo <= x <= hi
    )
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=_case())
def test_hypothesis_overlap_join_matches_python_naive(spark, case):
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    w, pts, ivs = case
    # reuse the generated intervals on both sides (self-overlap shape
    # included); points double as degenerate [x, x] intervals
    a_rows = [(j, lo, hi) for j, (lo, hi) in enumerate(ivs)]
    b_rows = [(i, x, x) for i, x in enumerate(pts)] + [
        (1000 + j, lo, hi) for j, (lo, hi) in enumerate(ivs)
    ]
    a = spark.createDataFrame(a_rows, "aid long, alo long, ahi long")
    b = spark.createDataFrame(b_rows, "bid long, blo long, bhi long")
    got = sorted(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(
            a, b, "alo", "ahi", "blo", "bhi", w
        ).collect()
    )
    want = sorted(
        (aid, bid)
        for aid, alo, ahi in a_rows
        if ahi >= alo
        for bid, blo, bhi in b_rows
        if bhi >= blo and alo <= bhi and blo <= ahi
    )
    assert got == want


# ---------------------------------------------------------------- count join


def _naive_counts(p, iv):
    pts = [r["p"] for r in p.collect()]
    return {
        r["ivid"]: sum(1 for x in pts if r["lo"] <= x <= r["hi"])
        for r in iv.collect()
    }


@pytest.mark.parametrize("mode", ["static", "derived"])
def test_count_join_matches_pair_enumeration(spark, mode):
    """The pair-free decomposition must agree with brute-force counts
    for every interval — including empty (hi<lo), point (hi==lo), and
    domain-straddling intervals — in both domain modes."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    p, iv = _frames(spark, seed=7)
    domain = (-50, 150) if mode == "static" else None
    got = {
        r["ivid"]: r["n_points"]
        for r in interval_point_count_join(
            p, iv, "p", "lo", "hi", domain=domain
        ).collect()
    }
    assert got == _naive_counts(p, iv)
    # every interval row survives, exactly once
    assert len(got) == iv.count()


def test_count_join_empty_points_and_outside_domain(spark):
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    iv = spark.createDataFrame(
        [(1, 5, 9), (2, 30, 20), (3, -100, -90)], "ivid long, lo long, hi long"
    )
    empty = spark.createDataFrame([], "p long")
    for domain in ((0, 10), None):
        got = {
            r["ivid"]: r["n_points"]
            for r in interval_point_count_join(
                empty, iv, "p", "lo", "hi", domain=domain
            ).collect()
        }
        assert got == {1: 0, 2: 0, 3: 0}
    # points exist but an interval sits entirely outside the domain
    p = spark.createDataFrame([(5,), (6,)], "p long")
    got = {
        r["ivid"]: r["n_points"]
        for r in interval_point_count_join(
            p, iv, "p", "lo", "hi", domain=(0, 10)
        ).collect()
    }
    assert got == {1: 2, 2: 0, 3: 0}


def test_count_join_rejects_clashes(spark):
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    p = spark.createDataFrame([(1,)], "p long")
    iv = spark.createDataFrame([(1, 2, 3)], "n_points long, lo long, hi long")
    with pytest.raises(ValueError, match="already exists"):
        interval_point_count_join(p, iv, "p", "lo", "hi")
    iv2 = spark.createDataFrame([(1, 2, 3)], "__rj_day long, lo long, hi long")
    with pytest.raises(ValueError, match="reserved"):
        interval_point_count_join(p, iv2, "p", "lo", "hi")
    with pytest.raises(ValueError, match="backtick"):
        interval_point_count_join(
            p.withColumnRenamed("p", "p`x"), iv.drop("n_points"), "p`x", "lo", "hi"
        )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=_case())
def test_hypothesis_count_join_matches_python_naive(spark, case):
    """The pair-free count decomposition must agree with a pure-Python
    pair count at every magnitude/offset the pair join is swept at —
    shared _case strategy, so exact-edge, empty, and 2**31-straddling
    intervals all occur. Domain derived lazily (the harder mode)."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    from data_warehouse_project_spark.operators.rangejoin import (
        MAX_COUNT_JOIN_DOMAIN,
    )

    _w, pts, ivs = case
    p = spark.createDataFrame([(x,) for x in pts], "p long")
    iv = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(ivs)],
        "ivid long, lo long, hi long",
    )
    if max(pts) - min(pts) > MAX_COUNT_JOIN_DOMAIN:
        # unbucketed high-resolution values: the in-plan guard must
        # fail CLEARLY instead of materializing a 2^31-element spine
        # (the ungated operator died with an opaque array-size error —
        # found by this very sweep)
        with pytest.raises(Exception, match="bucket the value column"):
            interval_point_count_join(p, iv, "p", "lo", "hi").collect()
        return
    want = {
        j: sum(1 for x in pts if lo <= x <= hi)
        for j, (lo, hi) in enumerate(ivs)
    }
    got = {
        r["ivid"]: r["n_points"]
        for r in interval_point_count_join(p, iv, "p", "lo", "hi").collect()
    }
    assert got == want


def test_count_join_sum_measures_signed_and_empty(spark):
    """sum_cols: signed integral measures must be exact — and an empty
    interval (hi < lo) must yield 0, not the NEGATED sum of the gap
    (which a naive clamped prefix difference produces)."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    pts = [(d, v) for d, v in [(1, 10), (2, -7), (2, 5), (5, -20), (9, 3)]]
    p = spark.createDataFrame(pts, "p long, v long")
    iv = spark.createDataFrame(
        [(1, 1, 2), (2, 3, 9), (3, 8, 4), (4, -5, 0)],
        "ivid long, lo long, hi long",
    )
    rows = {
        r["ivid"]: (r["n_points"], r["wsum"])
        for r in interval_point_count_join(
            p, iv, "p", "lo", "hi", sum_cols={"wsum": "v"}
        ).collect()
    }
    assert rows == {
        1: (3, 8),     # 10 - 7 + 5
        2: (2, -17),   # -20 + 3
        3: (0, 0),     # hi < lo: NOT -(sum over 5..7)
        4: (0, 0),     # no points below 1
    }
    with pytest.raises(ValueError, match="integral"):
        interval_point_count_join(
            p.withColumn("f", F.col("v").cast("double")),
            iv, "p", "lo", "hi", sum_cols={"s": "f"},
        )
    with pytest.raises(ValueError, match="exists"):
        interval_point_count_join(
            p, iv.withColumnRenamed("ivid", "s"), "p", "lo", "hi",
            sum_cols={"s": "v"},
        )


def test_count_join_distinct_matches_pair_enumeration(spark):
    """distinct_count_col: the presence-prefix-sum must equal a brute
    COUNT(DISTINCT point value) per interval — duplicates collapse,
    empty and inverted intervals give 0, and the distinct measure
    coexists with count + weighted sums in one pass."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
    )

    rnd = random.Random(13)
    pts = [(rnd.randint(-20, 40), rnd.randint(-5, 5)) for _ in range(200)]
    p = spark.createDataFrame(pts, "p long, v long")
    ivs = [(j, rnd.randint(-30, 50), rnd.randint(-30, 50)) for j in range(40)]
    ivs += [(40, 5, 5), (41, 10, 2), (42, -100, -50)]  # point/inverted/outside
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long")
    for domain in (None, (-25, 45)):
        got = {
            r["ivid"]: (r["n_points"], r["wsum"], r["d_vals"])
            for r in interval_point_count_join(
                p, iv, "p", "lo", "hi", domain=domain,
                sum_cols={"wsum": "v"}, distinct_count_col="d_vals",
            ).collect()
        }
        dlo, dhi = domain if domain else (-10**9, 10**9)
        want = {}
        for j, lo, hi in ivs:
            inside = [(x, v) for x, v in pts if lo <= x <= hi and dlo <= x <= dhi]
            want[j] = (
                len(inside) if hi >= lo else 0,
                sum(v for _, v in inside) if hi >= lo else 0,
                len({x for x, _ in inside}) if hi >= lo else 0,
            )
        assert got == want, f"domain={domain}"
    # output-name clash guard covers the distinct column too
    with pytest.raises(ValueError, match="exists"):
        interval_point_count_join(
            p, iv.withColumnRenamed("ivid", "d"), "p", "lo", "hi",
            distinct_count_col="d",
        )


# ------------------------------------------------ sparse count join


def test_sparse_count_join_matches_dense_and_naive(spark):
    """The sparse (present-values + bucket-carry) decomposition must be
    bit-identical to the dense spine mode and the brute-force truth at
    several bucket widths, including point/inverted/out-of-range and
    NULL-endpoint intervals (NULL BETWEEN bounds match nothing)."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join,
        interval_point_count_join_sparse,
    )

    rnd = random.Random(5)
    pts = [(rnd.randint(-2000, 4000), rnd.randint(-5, 5)) for _ in range(300)]
    p = spark.createDataFrame(pts, "p long, v long")
    ivs = [(j, rnd.randint(-3000, 5000), rnd.randint(-3000, 5000))
           for j in range(40)]
    ivs += [(40, 5, 5), (41, 10, 2), (42, -10000, -5000),
            (43, None, 100), (44, 100, None)]
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long")
    want = {}
    for j, lo, hi in ivs:
        if lo is None or hi is None or hi < lo:
            want[j] = (0, 0, 0)
        else:
            ins = [(x, v) for x, v in pts if lo <= x <= hi]
            want[j] = (len(ins), sum(v for _, v in ins),
                       len({x for x, _ in ins}))
    kw = dict(sum_cols={"ws": "v"}, distinct_count_col="dv")
    dense = {r["ivid"]: (r["n_points"], r["ws"], r["dv"])
             for r in interval_point_count_join(
                 p, iv, "p", "lo", "hi", **kw).collect()}
    assert dense == want
    for width in (1, 7, 100, 5000):
        sparse = {r["ivid"]: (r["n_points"], r["ws"], r["dv"])
                  for r in interval_point_count_join_sparse(
                      p, iv, "p", "lo", "hi", bucket_width=width, **kw
                  ).collect()}
        assert sparse == want, f"width={width}"


def test_sparse_count_join_micros_domain(spark):
    """The whole point of sparse mode: raw epoch-micros values (domain
    width ~3.6e12 — far past the dense 4M spine bound) count exactly,
    and empty points still yield all-zero rows."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join_sparse,
    )

    base = 1_700_000_000_000_000
    pts = [(base + i * 13_000_000,) for i in range(500)]
    p = spark.createDataFrame(pts, "p long")
    ivs = [(0, base, base + 3_600_000_000),
           (1, base + 7_000_000_000, base + 9_000_000_000),
           (2, base - 10**12, base - 1)]
    iv = spark.createDataFrame(ivs, "ivid long, lo long, hi long")
    got = {r["ivid"]: r["n_points"]
           for r in interval_point_count_join_sparse(
               p, iv, "p", "lo", "hi", bucket_width=3_600_000_000
           ).collect()}
    want = {j: sum(1 for (x,) in pts if lo <= x <= hi) for j, lo, hi in ivs}
    assert got == want and want[0] > 0 and want[2] == 0
    empty = spark.createDataFrame([], "p long")
    ze = {r["ivid"]: r["n_points"]
          for r in interval_point_count_join_sparse(
              empty, iv, "p", "lo", "hi", bucket_width=3_600_000_000
          ).collect()}
    assert ze == {0: 0, 1: 0, 2: 0}


def test_sparse_count_join_bucket_spine_guard(spark):
    """A width that would mint a bucket spine past MAX_SPARSE_BUCKETS
    must fail in-plan with the clear raise-width message."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join_sparse,
    )

    p = spark.createDataFrame(
        [(0,), (10**12,)], "p long"
    )
    iv = spark.createDataFrame([(1, 0, 10)], "ivid long, lo long, hi long")
    with pytest.raises(Exception, match="raise bucket_width"):
        interval_point_count_join_sparse(
            p, iv, "p", "lo", "hi", bucket_width=1000
        ).collect()
    with pytest.raises(ValueError, match="positive"):
        interval_point_count_join_sparse(
            p, iv, "p", "lo", "hi", bucket_width=0
        )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=_case(), wk=st.sampled_from([1, 3, 0]))
def test_hypothesis_sparse_count_join_matches_python_naive(spark, case, wk):
    """Sparse mode swept with the shared _case strategy (exact edges,
    empties, 2^31-straddling and epoch-micro offsets) at bucket widths
    below/above the stripe width — and NO domain restriction: the cases
    the dense mode must reject are exactly the ones sparse must get
    right."""
    from data_warehouse_project_spark.operators.rangejoin import (
        interval_point_count_join_sparse,
    )

    w, pts, ivs = case
    width = [w, 3 * w + 1, max(w // 3, 1)][wk if wk in (0, 1) else 2]
    p = spark.createDataFrame([(x,) for x in pts], "p long")
    iv = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(ivs)],
        "ivid long, lo long, hi long",
    )
    want = {
        j: sum(1 for x in pts if lo <= x <= hi)
        for j, (lo, hi) in enumerate(ivs)
    }
    got = {
        r["ivid"]: r["n_points"]
        for r in interval_point_count_join_sparse(
            p, iv, "p", "lo", "hi", bucket_width=width
        ).collect()
    }
    assert got == want
