"""Incrementally-maintained JOIN-aggregate views: star-schema rollups
(fact ⋈ one or more dimensions, grouped by dimension attributes) kept
in sync with ALL base tables from their change feeds.

``TxAggView`` maintains ``GROUP BY`` over ONE table; the gold layer's
real queries group a fact by DIMENSION attributes (reference:
dw_etl_tests.py Q2/Q3 group fct_sales by product brand / customer
geography — Q3 by the composite (country, state) pair). The reference
recomputes those rollups wholesale each run — right at 80k rows, wrong
at 100 TB where a day moves ~0.1% of the fact and a handful of
dimension rows.

``TxJoinAggView`` materializes

    SELECT <group exprs over dims>, agg(<measure exprs over fact>) ...
    FROM fact JOIN d1 ON fact.<fk1> = d1.<key1>
              [JOIN d2 ON fact.<fk2> = d2.<key2> ...]
    GROUP BY <group exprs>

and refreshes it in O(churn) using the classic delta decomposition
(Gupta & Mumick, IEEE Data Eng. Bulletin 1995; Blakeley et al., SIGMOD
1986 — the join-view maintenance algebra), generalized from bilinear
to k+1 relations: with F1 = F0 + ΔF and Di1 = Di0 + ΔDi,

    F1⋈D11⋈…⋈Dk1 − F0⋈D10⋈…⋈Dk0
      =  ΔF ⋈ D11 ⋈ … ⋈ Dk1                      (term A)
      +  Σ_i  F0 ⋈ D10 ⋈ … ⋈ D(i-1)0 ⋈ ΔDi ⋈ D(i+1)1 ⋈ … ⋈ Dk1

(each delta is paired with every EARLIER relation at its OLD version
and every LATER one at its NEW version — the telescoping expansion of
the product difference, so overlapping churn on several bases in one
window is counted exactly once).

- **Term A (fact churn)**: the fact's change feed rows (signed +1 in /
  −1 out), joined to every dimension AT ITS NEW VERSION — each dim
  side is read key-pruned for exactly the churned foreign keys
  (``read_for_keys``), never scanned. O(fact churn).
- **Term for dim i (dimension churn)**: the dim's change feed rows (an
  attribute update is a signed pair: preimage −old attr, postimage
  +new attr), joined to the fact AT ITS OLD VERSION, key-pruned to the
  changed dimension keys, and to the other dims at the versions the
  expansion dictates, pruned to the fact slice's foreign keys. This is
  the re-bucketing cost — a dimension attribute change moves ALL of
  that key's fact rows between groups, and the term touches exactly
  those rows. O(fact rows of changed dim keys) — the minimum possible
  work for the semantics.

All terms aggregate to one signed physical delta per touched group,
landed with a key-pruned fenced ``rewrite_by_keys`` — identical
exactly-once machinery to ``TxAggView``. The applied (fact, dim…)
version VECTOR is packed into the single monotonic fence version
(fact<<31k | d1<<31(k−1) | … | dk — Python ints are arbitrary
precision, and every component is non-decreasing, so the packing is
monotone), so one commit atomically records all cursors and a crash
replay of any fold is a fenced skip.

Group keys: ``group_expr``/``group_col`` accept a single expression or
a LIST — the composite (country, state)-style rollup of the
reference's geo query (dw_etl_tests.py:494-506). A multi-column view
is physically keyed by ``__gk``, a deterministic order-preserving
string encoding of the group tuple (first column is the prefix, so
the view's file pruning clusters by it; NULL is a distinct sentinel,
never conflated with a literal string). ``__gk`` is pure plumbing —
``read()`` never exposes it, and all merge/repair joins match on the
REAL group columns with null-safe equality, so even a pathological
encoding collision could only widen a rewrite slice, never corrupt a
group.

Measures: SUM / COUNT / AVG (self-maintainable — the view stores
per-measure running sum + non-null count, so SQL NULL semantics are
exact) plus MIN / MAX with per-file delete-repair (r12): inserts fold
(least/greatest), but a negative contribution at or past a group's
stored extremum — a fact delete, OR a dim change moving rows out of
the group — dirties it, and dirty groups re-aggregate their PER-FILE
partials from the ``_fparts`` support table (one row per live fact
file and group, maintained from the fact manifest diff plus the fact
files holding churned dim keys). Repair cost is O(dirty groups'
support rows) — file-count scale — with the support maintenance
itself O(affected files ⋈ dims), never O(dirty groups' fact rows).
APPROX_DISTINCT maintains a per-group HyperLogLog sketch like
``TxAggView``: inserts fold (HLL union), any deleted non-null value
repairs as the register-wise union of the group's per-file sketches
(identical to a direct sketch of its rows), and ``read()`` keeps
COUNT(DISTINCT) surface semantics.

DISTINCT (r11) is the EXACT twin without the delete tax — the
dual-level aggregation of the IVM literature (Gupta & Mumick 1995 §4:
COUNT(DISTINCT x) is COUNT over the auxiliary view GROUP BY g, x):
each distinct measure keeps a hidden per-(group, value) occurrence
count in a support ``TxTable`` under the view root, maintained purely
additively from the same signed churn, and the view's distinct count
moves by the 0→positive / positive→0 TRANSITIONS of those counts — a
delete decrements a value's count and only decrements the distinct
count when the LAST occurrence leaves, so no delete ever rescans the
bases. The trade vs the sketch is state: O(Σ_g distinct values) support
rows (dimension-scale for a customer-id measure, but fact-scale for a
unique-id one — choose approx_distinct there). Crash contract: the
view commits first, the support second, both behind the same packed
fence; a replay that finds the support lagging the view catches it up
from the feeds (deterministic) before folding the next window, so any
interleaving of crashes converges. Measure expressions range over FACT
columns; each group expression ranges over ONE dimension's columns
(``group_dims`` tags which).

Join semantics are INNER on each ``fact.fk_i = d_i.<dim_on_i>``
(``dim_on`` defaults to the dim's table key — e.g. a surrogate-id
column when the dim is merge-keyed by its natural key) with the
standard SQL treatment: NULL foreign keys match nothing; a fact row
with no dimension row contributes to no group until the dim row
arrives (the dim's term then picks its rows up — late-arriving
dimensions are handled by the algebra, not by special cases). Each
dimension must be unique per its ``dim_on`` value (an SCD1 dim, or an
SCD2 dim joined on its per-version surrogate — the same contract the
SQL join would need to avoid fanout).

100 TB shape: refresh cost is O(fact churn + moved dim keys' fact rows
+ touched view groups). Every point read prunes by its base's layout
(exact file pruning when the probe column is the table key, manifest
range skipping when it is in ``stats_cols``, honest full scan
otherwise — see ``_pruned_rows``); the view rewrite touches only files
whose key range holds a touched group.
"""

from __future__ import annotations

import json
import os
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.localframe import local_rows

from .txtable import DATA_DIR, TXLOG_DIR, TxError, TxTable, _live
from .txview import (
    _N,
    ChurnCache,
    _apply_by_keys,
    _hist_cells,
    _hist_zeros,
    _pmap,
    _signed,
    _sq,
    churn_rows,
)

_SIDECAR = "_joinview.json"
_DIM_BITS = 31  # fence packing: fact << 31k | d1 << 31(k-1) | ... | dk
_GK = "__gk"  # physical composite view key (multi-column groups only)




def _norm_measures(measures: dict) -> dict[str, dict]:
    # join views maintain the same measure algebra as TxAggView —
    # one normalizer (incl. hist lo/hi/bins validation), one fn set.
    # topk_approx (refused until r14): the MG fold is measure-local,
    # so it composes with the trilinear delta decomposition — every
    # term (fact churn AND dim-churn re-bucketing) lands as the same
    # per-(group, value) net signed deltas the single-base fold eats.
    # A dim-churn term's negative side (rows leaving a group) clamps
    # registers and can hit weight a past compress already shed, so
    # the drift is dim-churn-shaped, not just correction-shaped —
    # which is exactly what the per-group __ad delete-weight column
    # (read(include_error=True) → {n}_deleted) accounts for: the
    # consumer bound true ∈ [est, est + err + deleted] covers both.
    from .txview import _norm_measures as _agg_norm

    return _agg_norm(measures)


def _norm_spec(spec: dict) -> dict:
    """Normalize a sidecar to the multi-dim shape (``dims`` list +
    ``group`` list); pre-r11 single-dim sidecars load unchanged — their
    packed fences decode identically (k=1)."""
    if "dims" not in spec:
        spec = {
            "fact_root": spec["fact_root"],
            "dims": [{
                "root": spec["dim_root"],
                "fk": spec["fk"],
                "dim_key": spec["dim_key"],
            }],
            "group": [{
                "expr": spec["group_expr"],
                "col": spec["group_col"],
                "dim": 0,
            }],
            "measures": spec["measures"],
            "versions_at_create": [
                spec["fact_version_at_create"],
                spec["dim_version_at_create"],
            ],
        }
    spec["measures"] = _norm_measures(spec["measures"])
    return spec


def _enc(versions: list[int]) -> int:
    """Pack a (fact, d1, …, dk) version vector into one monotone fence
    int — 31 bits per DIM slot (the fact rides the unbounded top).
    Components are non-decreasing across refreshes, so the packed value
    is too; Python ints are arbitrary precision, and the txlog stores
    them as JSON numbers, so k is not width-limited."""
    out = int(versions[0])
    for v in versions[1:]:
        if v >= (1 << _DIM_BITS):
            raise TxError(f"dim version {v} exceeds fence packing range")
        out = (out << _DIM_BITS) | int(v)
    return out


def _dec(fence: int, ndims: int) -> tuple[int, ...]:
    vs = []
    for _ in range(ndims):
        vs.append(fence & ((1 << _DIM_BITS) - 1))
        fence >>= _DIM_BITS
    return tuple([fence] + list(reversed(vs)))


def _gk_expr(group_cols: list[str]):
    """Deterministic string encoding of the group tuple, usable as a
    single physical view key: \\x1f-joined, NULL a distinct \\x00
    sentinel (never conflated with any cast string, which is prefixed
    \\x01). Prefix-ordered by the FIRST group column, so view files
    cluster by it and rewrites range-prune. Purely plumbing — merge and
    repair joins match on the real columns (see module docstring)."""
    parts = [
        F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
            F.concat(F.lit("\x01"), F.col(c).cast("string"))
        )
        for c in group_cols
    ]
    return F.concat_ws("\x1f", *parts)


def _and_all(conds) -> "F.Column":
    return reduce(lambda a, b: a & b, conds)


#: below this many LIVE rows (known from manifest stats alone — zero
#: jobs) the prune-probe's own Spark job (distinct keys ⋈ file ranges,
#: or a min/max agg) costs more than just scanning the extra rows
#: inside the term's join job, so the slice reads whole. Probes stay
#: on for anything bigger — at the 100 TB design point every base is
#: far past the floor and pruning is what bounds the fold's IO.
#: Env-tunable for cluster profiles (guide §1.2: config parameterized,
#: scale-adaptive rather than tuned to either locale).
PRUNE_PROBE_FLOOR_ROWS = int(
    os.environ.get("SPARK_GRAFT_PRUNE_PROBE_FLOOR", 2_000_000)
)


def _pruned_rows(
    table: TxTable, col: str, keys: DataFrame, version: int
) -> DataFrame:
    """Rows of ``table`` (at ``version``) that MAY carry a ``col``
    value from ``keys`` — pruned as tightly as the table's layout
    allows; exactness comes from the caller's inner join, this only
    bounds IO:

    - ``col`` IS the table key: exact file pruning (``read_for_keys``);
    - ``col`` declared in ``stats_cols``: manifest range skipping over
      the keys' [min, max] (tight after a z-order/cluster on the
      column, conservative otherwise);
    - neither: a full scan at ``version`` — the honest fallback. At
      scale, key or stats-declare the join columns on both bases.

    Tables under ``PRUNE_PROBE_FLOOR_ROWS`` live rows skip the probe
    JOB and read whole (r14): the result is a superset either way —
    the caller's join supplies exactness — so only the cost model
    changes, by manifest metadata alone."""
    m = table._manifest(version)
    live = sum(_live(f) for f in m["files"])
    if live <= PRUNE_PROBE_FLOOR_ROWS:
        return table._read_files(m, [f["path"] for f in m["files"]])
    keyed = keys.select(F.col(keys.columns[0]).alias(col)).distinct()
    if m["key"] == col:
        return table.read_for_keys(keyed, version=version)
    if col in (m.get("stats_cols") or []):
        r = keyed.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        if r["lo"] is None:
            # no non-null probe keys: equality joins match nothing —
            # an empty slice, not a full scan
            return table.read(version).limit(0)
        return table.read(version=version, prune={col: (r["lo"], r["hi"])})
    return table.read(version)


class TxJoinAggView:
    """A fact ⋈ dims GROUP BY view stored as its own ``TxTable`` keyed
    by the group column (single-column groups) or by ``__gk``, the
    composite encoding (multi-column groups), refreshed incrementally
    from EVERY base's change feed. See the module docstring for the
    algebra.

    ``group_expr`` is a SQL expression over ONE dimension's columns —
    or a LIST of them for composite groups (``group_col`` names the
    output column(s); ``group_dims`` optionally tags which dim each
    expression reads, default the first). ``measures`` maps output
    name -> SQL expression over FACT columns (bare string = SUM, or
    ``(fn, expr)``). ``read()`` projects the logical view plus
    ``n_rows``; groups whose joined row count reaches zero leave the
    view, exactly like a recompute (test-pinned equal after every
    refresh)."""

    APP = "txjoinview"
    RECOMPUTE_FLOOR_ROWS = 10_000_000
    RECOMPUTE_CHURN_FRACTION = 0.2
    #: skew hardening for the ΔF ⋈ dim delta joins: when the signed
    #: fact churn is at least PROBE_FLOOR rows, a one-agg probe finds
    #: each dim key column's hottest fk; any fk above SHARE_PPM of the
    #: churn salts that dim's join (salted_join, small side replicated
    #: SKEW_SALT ways) so the hot key's rows spread over SKEW_SALT
    #: reducers instead of piling one. Below the floor the probe never
    #: runs — ordinary refreshes pay zero.
    SKEW_SALT = 8
    SKEW_PROBE_FLOOR_ROWS = 1_000_000
    SKEW_SHARE_PPM = 100_000  # hottest fk > 10% of the churn
    #: a dim rewriting this fraction of its keys moves a comparable
    #: fraction of the fact between groups — recompute wins
    RECOMPUTE_DIM_FRACTION = 0.05

    def __init__(self, spark: SparkSession, root: str | Path):
        self.root = Path(root)
        side = self.root / _SIDECAR
        if not side.is_file():
            raise TxError(f"not a TxJoinAggView (no {_SIDECAR}): {root}")
        with open(side) as f:
            self.spec = _norm_spec(json.load(f))
        self.spark = spark
        self.table = TxTable(spark, self.root)
        self.fact = TxTable(spark, self.spec["fact_root"])
        self.dims = [
            TxTable(spark, d["root"]) for d in self.spec["dims"]
        ]
        # single-dim convenience alias (the original surface)
        self.dim = self.dims[0]

    # ------------------------------------------------------------ init

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str | Path,
        fact: TxTable,
        dim: TxTable,
        fk: str,
        group_expr: str | list[str],
        group_col: str | list[str],
        measures: dict,
        dim_on: str | None = None,
        extra_dims: list[dict] | None = None,
        group_dims: list[int] | None = None,
        src: DataFrame | None = None,
    ) -> "TxJoinAggView":
        """Full-compute the view at every base's CURRENT version and
        persist the definition; later ``refresh()`` calls fold feeds
        from those versions. ``fk`` is the fact's join column for
        ``dim``; the dim side joins on ``dim_on`` (default: its table
        key — every dim must be keyed so its feed and rewrites stay
        key-pruned; pass a different unique column, e.g. a surrogate
        id, when the fact references that instead of the merge key).

        ``extra_dims`` adds more star dimensions, each a dict
        ``{"dim": TxTable, "fk": str, "dim_on": str | None}``;
        ``group_expr``/``group_col`` may then be lists, with
        ``group_dims`` tagging which dim each expression reads
        (default: the first dim).

        ``src``: optional caller-pinned frame equal to
        ``fact.read(fact.latest_version())`` — a create sweep's shared
        checkpoint, so several views' full computes read cached blocks
        instead of re-scanning the fact (r13 verdict item 6)."""
        root = Path(root)
        if (root / TXLOG_DIR).exists() or (root / _SIDECAR).exists():
            raise TxError(f"already a view or table: {root}")
        dim_specs = [(dim, fk, dim_on)] + [
            (d["dim"], d["fk"], d.get("dim_on")) for d in (extra_dims or [])
        ]
        for d, _, _ in dim_specs:
            if d._manifest()["key"] is None:
                raise TxError("join-view dims must be keyed TxTables")
        exprs = [group_expr] if isinstance(group_expr, str) else list(group_expr)
        cols = [group_col] if isinstance(group_col, str) else list(group_col)
        if len(exprs) != len(cols) or not exprs:
            raise TxError("group_expr and group_col must pair up, non-empty")
        if len(set(cols)) != len(cols):
            raise TxError(f"duplicate group column names: {cols}")
        gdims = group_dims if group_dims is not None else [0] * len(cols)
        if len(gdims) != len(cols) or any(
            not (0 <= g < len(dim_specs)) for g in gdims
        ):
            raise TxError(
                f"group_dims must tag each group column with a dim index "
                f"in [0, {len(dim_specs)})"
            )
        from .txview import _resolve_auto_hist

        fact_v0 = fact.latest_version()
        norm = _norm_measures(_resolve_auto_hist(measures, fact, fact_v0))
        bad = {
            n for n in list(norm) + cols
            if n == _N or n.startswith("__")
        }
        if bad:
            raise TxError(f"measure/group name(s) reserved: {sorted(bad)}")
        from .txview import _check_mg_reserved

        _check_mg_reserved(list(norm) + cols, norm)
        versions = [fact_v0] + [
            d.latest_version() for d, _, _ in dim_specs
        ]
        spec = _norm_spec({
            "fact_root": str(fact.root),
            "dims": [
                {
                    "root": str(d.root),
                    "fk": f,
                    "dim_key": on or d._manifest()["key"],
                }
                for d, f, on in dim_specs
            ],
            "group": [
                {"expr": e, "col": c, "dim": g}
                for e, c, g in zip(exprs, cols, gdims)
            ],
            "measures": norm,
            "versions_at_create": versions,
        })
        fact_df = fact.read(versions[0]) if src is None else src
        dim_dfs = [
            d.read(v) for (d, _, _), v in zip(dim_specs, versions[1:])
        ]
        full = cls._joined_agg(spec, fact_df, dim_dfs)
        root.mkdir(parents=True, exist_ok=True)
        with open(root / _SIDECAR, "w") as f:
            json.dump(spec, f)
            f.flush()
            os.fsync(f.fileno())
        key = _GK if len(cols) > 1 else cols[0]
        TxTable.create(spark, root, full, key=key)
        view = cls(spark, root)
        # the support tables and the per-file repair partials are
        # independent sibling TxTables under the view root, all built
        # from the same pinned snapshots — build them concurrently
        # (r14): a crash mid-fanout leaves any subset missing, exactly
        # the state _catchup_supports / _fparts create-if-absent heal.
        aux = [
            (lambda n=n: TxTable.create(
                spark, root / f"_vals_{n}",
                cls._support_full(spec, fact_df, dim_dfs, n),
                key=key,
            ))
            for n, m in norm.items()
            if m["fn"] in ("distinct", "topk")
        ]
        if view._use_fparts():
            aux.append(lambda: view._fparts(at=versions))
        _pmap(lambda f: f(), aux)
        return view

    # -------------------------------------------------------- internals

    def _gcols(self) -> list[str]:
        return [g["col"] for g in self.spec["group"]]

    @staticmethod
    def _spec_gcols(spec: dict) -> list[str]:
        return [g["col"] for g in spec["group"]]

    @staticmethod
    def _composite(spec: dict) -> bool:
        return len(spec["group"]) > 1

    @staticmethod
    def _fact_proj(spec: dict, fact_df: DataFrame) -> DataFrame:
        """Project a fact-side frame to (one fk per dim, one evaluated
        column per measure) — measure expressions are evaluated BEFORE
        the dim joins so fact/dim column-name collisions cannot
        misbind."""
        cols = [
            F.col(d["fk"]).alias(f"__jk{i}")
            for i, d in enumerate(spec["dims"])
        ]
        for n, m in spec["measures"].items():
            cols.append(F.expr(m["expr"]).alias(f"__e_{n}"))
        # passthroughs: the churn sign, and the per-file repair
        # partials' file tag (present only on _fparts builds)
        extra = [c for c in ("__vw_sign", "__f") if c in fact_df.columns]
        return fact_df.select(*cols, *extra)

    @staticmethod
    def _dim_proj(spec: dict, i: int, dim_df: DataFrame) -> DataFrame:
        cols = [F.col(spec["dims"][i]["dim_key"]).alias(f"__dk{i}")]
        for g in spec["group"]:
            if g["dim"] == i:
                cols.append(F.expr(g["expr"]).alias(g["col"]))
        extra = [c for c in ("__vw_sign",) if c in dim_df.columns]
        return dim_df.select(*cols, *extra)

    @classmethod
    def _join_all(
        cls,
        fact_proj: DataFrame,
        dim_projs: list[DataFrame],
        salt_dims: frozenset | set = frozenset(),
    ) -> DataFrame:
        """fact ⋈ every dim. Dims in ``salt_dims`` join SALTED
        (operators/skew.salted_join — the pruned dim slice replicates
        over the salt space, the fact side scatters), so one power-law
        fk in a large delta cannot pile a reducer; the others join
        plain (AQE's skew split covers ordinary skew)."""
        from data_warehouse_project_spark.operators.skew import salted_join

        j = fact_proj
        for i, dp in enumerate(dim_projs):
            if i in salt_dims:
                small = dp.withColumnRenamed(f"__dk{i}", f"__jk{i}")
                j = salted_join(
                    j, small, f"__jk{i}", how="inner", salt=cls.SKEW_SALT
                ).withColumn(f"__dk{i}", F.col(f"__jk{i}"))
            else:
                j = j.join(dp, F.col(f"__jk{i}") == F.col(f"__dk{i}"))
        return j

    @classmethod
    def _joined_agg(
        cls, spec: dict, fact_df: DataFrame, dim_dfs: list[DataFrame]
    ) -> DataFrame:
        """Full-recompute plan: fact ⋈ dims, grouped to the PHYSICAL
        view columns (running sum + non-null count per measure)."""
        j = cls._join_all(
            cls._fact_proj(spec, fact_df),
            [cls._dim_proj(spec, i, d) for i, d in enumerate(dim_dfs)],
        )
        anames = [
            n for n, m in spec["measures"].items()
            if m["fn"] == "topk_approx"
        ]
        if anames:
            # the MG snapshot state needs a second (two-level)
            # aggregation over the SAME joined rows — pin the join
            # once instead of recomputing it per pass
            j = j.localCheckpoint(eager=False)
        aggs = []
        for n, m in spec["measures"].items():
            e = F.col(f"__e_{n}")
            if m["fn"] in ("sum", "avg", "var", "stddev"):
                aggs.append(F.sum(e).alias(f"__s_{n}"))
            if m["fn"] in ("var", "stddev", "sumsq"):
                aggs.append(F.sum(_sq(e)).alias(f"__q_{n}"))
            if m["fn"] in ("sum", "avg", "count", "var", "stddev", "sumsq"):
                aggs.append(F.count(e).alias(f"__c_{n}"))
            if m["fn"] == "min":
                aggs.append(F.min(e).alias(f"__m_{n}"))
            if m["fn"] == "max":
                aggs.append(F.max(e).alias(f"__m_{n}"))
            if m["fn"] == "approx_distinct":
                aggs.append(F.hll_sketch_agg(e).alias(f"__h_{n}"))
            if m["fn"] == "distinct":
                aggs.append(F.count_distinct(e).alias(f"__d_{n}"))
            if m["fn"] == "hist":
                aggs.append(
                    F.array(*_hist_cells(e, m, F.lit(1))).alias(f"__g_{n}")
                )
        aggs.append(F.count(F.lit(1)).alias(_N))
        gcols = cls._spec_gcols(spec)
        out = j.groupBy(*gcols).agg(*aggs)
        for n in anames:
            # exact-snapshot Misra-Gries state (txview._mg_full_cols,
            # generalized to composite groups); __ad (cumulative
            # delete-side weight — the read-time drift signal) is 0 on
            # a fresh exact state
            from .txview import _MG_EMPTY, _mg_full_cols

            mg = _mg_full_cols(
                j, gcols, F.col(f"__e_{n}"),
                int(spec["measures"][n]["m"]),
            )
            cond = _and_all(
                F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in gcols
            )
            out = (
                out.alias("a")
                .join(mg.alias("b"), cond, "left")
                .select(
                    *[F.col(f"a.{c}").alias(c) for c in out.columns],
                    F.coalesce(F.col("b.__a"), F.expr(_MG_EMPTY)).alias(
                        f"__a_{n}"
                    ),
                    F.coalesce(F.col("b.__ae"), F.lit(0)).alias(
                        f"__ae_{n}"
                    ),
                    F.lit(0).cast("bigint").alias(f"__ad_{n}"),
                )
            )
        if cls._composite(spec):
            out = out.withColumn(_GK, _gk_expr(gcols))
        return out

    @classmethod
    def _support_full(
        cls, spec: dict, fact_df: DataFrame, dim_dfs: list[DataFrame], n: str
    ) -> DataFrame:
        """Full-compute of a distinct measure's support relation: one
        row per (group, non-null value) with its live occurrence
        count — the auxiliary view of the dual-level aggregation."""
        j = cls._join_all(
            cls._fact_proj(spec, fact_df),
            [cls._dim_proj(spec, i, d) for i, d in enumerate(dim_dfs)],
        )
        gcols = cls._spec_gcols(spec)
        out = (
            j.filter(F.col(f"__e_{n}").isNotNull())
            .groupBy(*gcols, F.col(f"__e_{n}").alias("__val"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        if cls._composite(spec):
            out = out.withColumn(_GK, _gk_expr(gcols))
        return out

    # ---------------------------------------------------------- reads

    def read(
        self, version: int | None = None, include_error: bool = False
    ) -> DataFrame:
        """The LOGICAL view: group column(s) + each measure with exact
        SQL aggregate semantics (NULL SUM/AVG for empty-of-non-null
        groups) + ``n_rows`` (live joined row count).

        ``include_error=True`` adds ``{n}_deleted`` per topk_approx
        measure — cumulative delete-side weight (fact deletes AND rows
        a dim change moved out of the group), bounding the register
        drift: ``true ∈ [est, est + err + deleted]`` (see TxAggView
        .read)."""
        phys = self.table.read(version)
        cols = [F.col(c) for c in self._gcols()]
        for n, m in self.spec["measures"].items():
            if m["fn"] == "sum":
                cols.append(
                    F.when(F.col(f"__c_{n}") > 0, F.col(f"__s_{n}")).alias(n)
                )
            elif m["fn"] == "avg":
                cols.append(
                    F.when(
                        F.col(f"__c_{n}") > 0,
                        F.col(f"__s_{n}") / F.col(f"__c_{n}"),
                    ).alias(n)
                )
            elif m["fn"] in ("var", "stddev"):
                # VAR_SAMP/STDDEV_SAMP from the exact second-moment
                # state (see txview._sq): NULL under 2 values
                c = F.col(f"__c_{n}")
                s = F.col(f"__s_{n}").cast("double")
                q = F.col(f"__q_{n}").cast("double")
                v = (q - s * s / c) / (c - 1)
                if m["fn"] == "stddev":
                    v = F.sqrt(F.greatest(v, F.lit(0.0)))
                cols.append(F.when(c > 1, v).alias(n))
            elif m["fn"] == "sumsq":
                cols.append(
                    F.when(F.col(f"__c_{n}") > 0, F.col(f"__q_{n}")).alias(n)
                )
            elif m["fn"] == "hist":
                cols.append(F.col(f"__g_{n}").alias(n))
            elif m["fn"] == "count":
                cols.append(F.col(f"__c_{n}").alias(n))
            elif m["fn"] == "approx_distinct":
                # COUNT(DISTINCT) surface semantics: 0 for all-null
                # groups, never NULL (empty sketch estimates 0)
                cols.append(
                    F.coalesce(
                        F.hll_sketch_estimate(F.col(f"__h_{n}")), F.lit(0)
                    ).alias(n)
                )
            elif m["fn"] == "distinct":
                # exact, transition-maintained — see module docstring
                cols.append(F.col(f"__d_{n}").alias(n))
            elif m["fn"] == "topk":
                continue  # derived from the support, joined below
            elif m["fn"] == "topk_approx":
                from .txview import _mg_display

                cols.append(
                    _mg_display(F.col(f"__a_{n}"), int(m["k"])).alias(n)
                )
                cols.append(F.col(f"__ae_{n}").alias(f"{n}_err"))
                if include_error:
                    ad = (
                        F.col(f"__ad_{n}")
                        if f"__ad_{n}" in phys.columns
                        else F.lit(None).cast("bigint")  # pre-r14 state
                    )
                    cols.append(ad.alias(f"{n}_deleted"))
            else:  # min / max
                cols.append(F.col(f"__m_{n}").alias(n))
        cols.append(F.col(_N))
        out = phys.select(*cols)
        tks = [
            (n, int(m["k"]))
            for n, m in self.spec["measures"].items()
            if m["fn"] == "topk"
        ]
        for n, k in tks:
            out = self._join_topk(out, n, k, version)
        if tks:  # restore the canonical column order
            order = []
            for n, m in self.spec["measures"].items():
                order.append(n)
                if m["fn"] == "topk_approx":
                    order.append(f"{n}_err")
                    if include_error:
                        order.append(f"{n}_deleted")
            out = out.select(*self._gcols(), *order, _N)
        return out

    def _join_topk(
        self, out: DataFrame, n: str, k: int, version: int | None
    ) -> DataFrame:
        """Left-join measure ``n``'s exact top-k array from the
        occurrence support (count desc, value asc — deterministic
        ties); refuses when the support cursor does not match the view
        state being read (crash window / time-travel mismatch). See
        TxAggView._join_topk."""
        from pyspark.sql import Window

        gcols = self._gcols()
        sup = self._support(n)
        want = list(self.applied_versions(at=version))
        have = self._support_vec(sup)
        if have != want:
            raise TxError(
                f"topk measure {n!r}: support cursor at base versions "
                f"{have} but the view state read reflects {want} — "
                "refresh() first (or retry after the concurrent "
                "refresh completes)"
            )
        w = Window.partitionBy(*gcols).orderBy(
            F.col("__cnt").desc(), F.col("__val").asc()
        )
        tk = (
            sup.read()
            .filter(F.col("__cnt") > 0)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .groupBy(*gcols)
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__rk").alias("rank"),
                            F.col("__val").alias("value"),
                            F.col("__cnt").alias("cnt"),
                        )
                    )
                ).alias(n)
            )
        )
        cond = _and_all(
            F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in gcols
        )
        return (
            out.alias("a")
            .join(tk.alias("b"), cond, "left")
            .select(
                *[F.col(f"a.{c}") for c in out.columns],
                F.col(f"b.{n}").alias(n),
            )
        )

    def applied_versions(self, at: int | None = None) -> tuple[int, ...]:
        """(fact version, dim versions…) whose effects the view
        reflects — at the view table's version ``at`` (default:
        latest), so catalog-consistent readers can pick the newest view
        state not ahead of a pinned base snapshot."""
        created = tuple(int(v) for v in self.spec["versions_at_create"])
        if at is None:
            fence = self.table.txn_version(self.APP)
        else:
            fence = self.table._manifest(at).get("txns", {}).get(self.APP)
        if fence is None:
            return created
        return _dec(int(fence), len(self.spec["dims"]))

    def base_roots(self) -> list[str]:
        """The base table roots, fact first — positionally aligned with
        ``applied_versions()``."""
        return [self.spec["fact_root"]] + [
            d["root"] for d in self.spec["dims"]
        ]

    # ---------------------------------------------- distinct supports

    def _distinct_names(self) -> list[str]:
        return [
            n for n, m in self.spec["measures"].items()
            if m["fn"] == "distinct"
        ]

    def _value_support_names(self) -> list[str]:
        """Measures backed by the per-(group, value) occurrence
        support: exact DISTINCT and TOPK (see txview)."""
        return [
            n for n, m in self.spec["measures"].items()
            if m["fn"] in ("distinct", "topk")
        ]

    def _view_key(self) -> str:
        return _GK if self._composite(self.spec) else self._gcols()[0]

    def _support(self, n: str, at: list[int] | None = None) -> TxTable:
        """The distinct measure's support table — CREATE-IF-ABSENT: a
        crash between the view's v0 commit and the support's create in
        ``create()`` must not strand the view, so a missing support is
        rebuilt here by full-computing the per-(group, value) counts at
        ``at`` (default: the view's applied versions — the state the
        support would hold had the create finished). A concurrent
        creator losing the race simply loads the winner's table."""
        root = self.root / f"_vals_{n}"
        try:
            return TxTable(self.spark, root)
        except TxError:
            pass
        vec = list(self.applied_versions()) if at is None else list(at)
        full = self._support_full(
            self.spec,
            self.fact.read(vec[0]),
            [d.read(v) for d, v in zip(self.dims, vec[1:])],
            n,
        )
        try:
            t = TxTable.create(self.spark, root, full, key=self._view_key())
        except TxError:
            return TxTable(self.spark, root)  # lost a concurrent create
        if vec != [int(v) for v in self.spec["versions_at_create"]]:
            # the rebuilt state reflects `vec`, not the sidecar's create
            # versions — record that as the support's fence (an empty
            # fenced append: no files, one manifest) so _support_vec and
            # the catch-up window start from the right cursor
            t.append(
                local_rows(self.spark, [], full.schema),
                txn=(self.APP, _enc(vec)),
            )
        return t

    def _support_vec(self, sup: TxTable) -> list[int]:
        f = sup.txn_version(self.APP)
        if f is None:
            return [int(v) for v in self.spec["versions_at_create"]]
        return list(_dec(int(f), len(self.spec["dims"])))

    def _dv_frame(self, churn: DataFrame, n: str) -> DataFrame:
        """Per-(group, value) signed occurrence delta for one distinct
        measure, from the same signed churn the other measures fold —
        NULL values excluded (COUNT DISTINCT ignores them), net-zero
        rows dropped."""
        gcols = self._gcols()
        e = F.col(f"__e_{n}")
        if self.spec["measures"][n]["fn"] == "topk_approx":
            e = e.cast("string")  # register keys are strings
        dv = (
            churn.filter(e.isNotNull())
            .groupBy(*gcols, e.alias("__val"))
            .agg(F.sum(F.col("__vw_sign")).alias("__dc"))
            .filter(F.col("__dc") != 0)
        )
        if self._composite(self.spec):
            dv = dv.withColumn(_GK, _gk_expr(gcols))
        return dv.localCheckpoint(eager=False)

    def _mg_delta_frame(self, churn: DataFrame, n: str) -> DataFrame:
        """Bounded (groups, __dm, __dae) fold operands for a
        topk_approx measure (txview._mg_window_delta) — every delta
        term of the trilinear decomposition (fact churn and dim-churn
        re-bucketing alike) arrives here as net per-(group, value)
        signed deltas, so the same bounded merge applies. Delete-side
        values are filtered to the group's CURRENT registers, read
        key-pruned to the delete-touched groups."""
        from .txview import _mg_window_delta

        gcols = self._gcols()
        mm = int(self.spec["measures"][n]["m"])
        dv = self._dv_frame(churn, n)
        regs = self.table.read_for_keys(
            dv.filter(F.col("__dc") < 0).select(self._view_key())
        ).select(
            *gcols,
            F.explode(F.map_keys(F.col(f"__a_{n}"))).alias("__val"),
        )
        return _mg_window_delta(dv, gcols, mm, regs)

    def _transitions(self, sup: TxTable, dv: DataFrame, n: str) -> DataFrame:
        """Per-group distinct-count delta: +1 for every value whose
        occurrence count transitions 0→positive this window, −1 for
        positive→0 — computed against the support state BEFORE this
        window's fold, read key-pruned to the touched groups. A count
        that would go negative raises in-plan (feed desync)."""
        gcols = self._gcols()
        s = sup.read_for_keys(dv.select(self._view_key()))
        cond = _and_all(
            [
                F.col(f"d.{c}").eqNullSafe(F.col(f"s.{c}"))
                for c in gcols
            ]
            + [F.col("d.__val") == F.col("s.__val")]
        )
        j = dv.alias("d").join(s.alias("s"), cond, "left")
        old = F.coalesce(F.col("s.__cnt"), F.lit(0))
        new = old + F.col("d.__dc")
        trans = (
            F.when(
                new < 0,
                F.raise_error(
                    F.lit(
                        f"txjoinview: distinct measure {n!r} occurrence "
                        "count went negative — view out of sync with "
                        "the base change feeds"
                    )
                ).cast("long"),
            )
            .when((old == 0) & (new > 0), F.lit(1))
            .when((old > 0) & (new == 0), F.lit(-1))
            .otherwise(F.lit(0))
        )
        return (
            j.groupBy(*[F.col(f"d.{c}") for c in gcols])
            .agg(F.sum(trans).alias(f"__dd_{n}"))
        )

    def _apply_support(self, sup: TxTable, dv: DataFrame, fence: int) -> None:
        """Fold a value-level delta into the support table — one fenced
        key-pruned rewrite, purely additive (rows at count 0 leave)."""
        gcols = self._gcols()
        composite = self._composite(self.spec)

        def xform(slice_df: DataFrame) -> DataFrame:
            s = slice_df.alias("s")
            d = dv.alias("d")
            cond = _and_all(
                [
                    F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}"))
                    for c in gcols
                ]
                + [F.col("s.__val") == F.col("d.__val")]
            )
            merged = s.join(d, cond, "full_outer")
            s_here = F.col("s.__cnt").isNotNull()
            cnt = (
                F.coalesce(F.col("s.__cnt"), F.lit(0))
                + F.coalesce(F.col("d.__dc"), F.lit(0))
            )
            out = merged.select(
                *[
                    F.when(s_here, F.col(f"s.{c}"))
                    .otherwise(F.col(f"d.{c}"))
                    .alias(c)
                    for c in gcols
                ],
                F.when(s_here, F.col("s.__val"))
                .otherwise(F.col("d.__val"))
                .alias("__val"),
                cnt.alias("__cnt"),
            )
            guard = F.when(
                F.col("__cnt") < 0,
                F.raise_error(
                    F.lit(
                        "txjoinview: support count negative — view out "
                        "of sync with the base change feeds"
                    )
                ).cast("boolean"),
            ).otherwise(F.col("__cnt") > 0)
            if composite:
                out = out.withColumn(_GK, _gk_expr(gcols))
            return out.filter(guard)

        _apply_by_keys(
            sup, dv.select(self._view_key()), xform, txn=(self.APP, fence)
        )

    def _churn_frame(
        self,
        v0: list[int],
        v1: list[int],
        cache: ChurnCache | None = None,
    ) -> DataFrame | None:
        """The signed joined churn for the window (v0, v1]: the union
        of term A and one term per moved dim (see refresh) — every
        measure and every distinct-value delta aggregates from this one
        frame. None when no base moved. With a per-sweep ``cache`` the
        raw signed feeds come from the sweep-shared checkpoints (the
        per-view projection stays a narrow map on top)."""
        spec = self.spec
        self._last_salted_dims: tuple[int, ...] = ()
        has_a = v1[0] > v0[0]
        churned = [
            i for i in range(len(self.dims)) if v1[i + 1] > v0[i + 1]
        ]
        if not has_a and not churned:
            return None

        def _term_a() -> DataFrame:
            # term A: ΔF ⋈ D1@new ⋈ … — signed fact churn, every dim
            # read pruned to the churned fks and pinned at its NEW
            # version
            raw = (
                cache.signed(self.fact, v0[0] + 1, v1[0])
                if cache is not None
                else _signed(self.fact.read_changes(v0[0] + 1, v1[0]))
            )
            df = self._fact_proj(spec, raw)
            if cache is None:
                df = df.localCheckpoint(eager=False)
            # the gating count materializes the churn checkpoint BEFORE
            # the per-dim probes fan out, so the concurrent probes read
            # cached blocks instead of racing to compute the feed
            hot = self._hot_fk_dims(df)
            dim_slices = _pmap(
                lambda i: self._dim_proj(
                    spec, i,
                    _pruned_rows(
                        self.dims[i], spec["dims"][i]["dim_key"],
                        df.select(f"__jk{i}"), v1[i + 1],
                    ),
                ),
                range(len(self.dims)),
            )
            self._last_salted_dims = tuple(sorted(hot))
            return self._join_all(df, dim_slices, salt_dims=hot)

        def _term_d(i: int) -> DataFrame:
            # term for dim i: F@old ⋈ D<i@old ⋈ ΔDi ⋈ D>i@new — signed
            # dim churn (an attribute update is −old attr / +new attr),
            # fact read pruned to the changed dim keys and pinned at
            # its OLD version; the other dims pruned to the fact
            # slice's fks
            d = self.dims[i]
            raw_d = (
                cache.signed(d, v0[i + 1] + 1, v1[i + 1])
                if cache is not None
                else _signed(d.read_changes(v0[i + 1] + 1, v1[i + 1]))
            )
            dd = self._dim_proj(spec, i, raw_d)
            if cache is None:
                dd = dd.localCheckpoint(eager=False)
            fact_slice = self._fact_proj(
                spec,
                _pruned_rows(
                    self.fact, spec["dims"][i]["fk"],
                    dd.select(f"__dk{i}"), v0[0],
                ),
            ).localCheckpoint(eager=False)

            def _other(j: int) -> DataFrame:
                if j == i:
                    return dd
                vj = v0[j + 1] if j < i else v1[j + 1]
                return self._dim_proj(
                    spec, j,
                    _pruned_rows(
                        self.dims[j], spec["dims"][j]["dim_key"],
                        fact_slice.select(f"__jk{j}"), vj,
                    ),
                )

            others = _pmap(_other, range(len(self.dims)))
            return self._join_all(fact_slice, others)

        # every term reads version-PINNED snapshots and change windows,
        # so the terms are independent plans that only meet in the
        # final union — build them concurrently: each term's eager
        # steps (feed checkpoint, prune-probe jobs, point reads) no
        # longer serialize behind the other terms' (r14; measured 8.7 s
        # of 10.5 s refresh wall spent in this sequential chain)
        builders: list = []
        if has_a:
            builders.append(lambda: _term_a())
        builders.extend((lambda i=i: _term_d(i)) for i in churned)
        terms = _pmap(lambda b: b(), builders)
        return reduce(lambda a, b: a.unionByName(b), terms)

    def _hot_fk_dims(self, fact_churn: DataFrame) -> set[int]:
        """Dims whose fk in this window's fact churn has a hot key —
        the skew diagnostic gating the salted delta join. The gating
        count() is the churn checkpoint's FIRST action (it materializes
        the lazy localCheckpoint, so nothing downstream re-reads the
        change feed), and past the floor ALL dims' top-1 key counts
        come from ONE job — posexplode the fk tuple to (dim, key) rows,
        count per pair, max per dim — instead of one churn pass per dim
        (r12 ADVICE)."""
        if self.SKEW_SALT <= 1:
            return set()
        n = fact_churn.count()
        if n < self.SKEW_PROBE_FLOOR_ROWS:
            return set()
        nd = len(self.dims)
        tops = (
            fact_churn.select(
                F.posexplode(
                    F.array(
                        *[F.col(f"__jk{i}").cast("string") for i in range(nd)]
                    )
                ).alias("__d", "__key")
            )
            .groupBy("__d", "__key")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("__d")
            .agg(F.max("c").alias("top"))
            .collect()
        )
        return {
            int(r["__d"])
            for r in tops
            if r["top"] * 1_000_000 > self.SKEW_SHARE_PPM * n
        }

    def _catchup_supports(
        self, v_vec: list[int], cache: ChurnCache | None = None
    ) -> None:
        """A crash between the view commit and a support commit leaves
        that support lagging the view's fence. Re-derive the missing
        window's value deltas from the feeds (deterministic at pinned
        versions) and fold them before anything else — every
        interleaving of crashes and replays converges. Two recovery
        tiers when the incremental path is unavailable: a support
        table MISSING entirely (crash inside ``create()``) is rebuilt
        by ``_support``'s create-if-absent at the view's cursor, and a
        lagging window whose change feeds were VACUUMED (e.g. a crash
        right after a large recompute jump) falls back to a wholesale
        support recompute at the view's cursor — so an explicit
        ``refresh(mode="recompute")`` can always heal, never trapped
        behind a gone feed."""
        for n in self._value_support_names():
            sup = self._support(n)
            s_vec = self._support_vec(sup)
            if _enc(s_vec) >= _enc(v_vec):
                continue
            try:
                churn = self._churn_frame(s_vec, v_vec, cache)
                if churn is not None:
                    self._apply_support(
                        sup, self._dv_frame(churn, n), _enc(v_vec)
                    )
                continue
            except TxError:
                pass  # window's feeds vacuumed — rebuild wholesale
            full = self._support_full(
                self.spec,
                self.fact.read(v_vec[0]),
                [d.read(v) for d, v in zip(self.dims, v_vec[1:])],
                n,
            )
            sup.overwrite(full, txn=(self.APP, _enc(v_vec)))

    # Per-FILE repair partials for MIN/MAX/APPROX_DISTINCT — the join
    # twin of txview's ``_fparts`` (see its comment block for the
    # algebra and crash contract). One row per (live FACT file, group)
    # holding that file's joined partial extremum / HLL sketch; a
    # repair aggregates the dirty groups' SUPPORT rows (MIN of minima,
    # register-wise HLL union) instead of rescanning their fact rows
    # through the join. The affected-file set per refresh is the fact
    # manifest diff (added / removed / dv-grown files) PLUS the fact
    # files holding any CHURNED dim key (a dim insert/delete/update
    # changes those rows' join membership or group attribution;
    # ``files_for_values`` bounds the set via fk stats/bloom, keeping
    # everything when the fk carries no stats — the honest fallback).
    # Cost: O(affected files ⋈ dims) per refresh — churn-proportional,
    # never O(dirty groups' fact rows).

    #: stop collecting churned dim keys past this many — re-partial
    #: every file instead (a dim churn that wide approaches a
    #: recompute anyway; mode="auto" usually picks one first)
    FPARTS_MAX_MOVED_KEYS = 100_000

    #: per-file partials for grains up to this many groups — same
    #: complementarity (and same r12-item-2 mid-cardinality raise from
    #: 8192, see txview.FPARTS_MAX_GROUPS's comment) as the single-
    #: table twin: low/mid grains repair from file partials bounded by
    #: SUPPORT rows; truly high-cardinality grains keep the
    #: dirty-group joined recompute (dims filtered to the dirty
    #: groups, fact point-pruned to their keys), whose cost is already
    #: proportional to the few dirty groups' rows.
    FPARTS_MAX_GROUPS = 131_072

    #: repair-read bucket pre-filter granularity (txview twin)
    FPARTS_BUCKETS = 1024

    def _repair_names(self) -> dict:
        return {
            n: m for n, m in self.spec["measures"].items()
            if m["fn"] in ("min", "max", "approx_distinct")
        }

    def _use_fparts(self) -> bool:
        return bool(self._repair_names()) and (
            self.table.row_count() <= self.FPARTS_MAX_GROUPS
        )

    def _fparts_aggs(self) -> list:
        aggs = []
        for n, m in self._repair_names().items():
            e = F.col(f"__e_{n}")
            if m["fn"] == "min":
                aggs.append(F.min(e).alias(f"__m_{n}"))
            elif m["fn"] == "max":
                aggs.append(F.max(e).alias(f"__m_{n}"))
            else:
                aggs.append(F.hll_sketch_agg(e).alias(f"__h_{n}"))
        return aggs

    def _files_with_name(self, m: dict, paths: list[str]) -> DataFrame:
        """Live fact rows of ``paths`` at manifest ``m`` tagged ``__f``
        — one metadata-column scan with DVs applied (txview's shared
        helper)."""
        from .txview import _tagged_rows

        return _tagged_rows(self.fact, m, paths)

    def _fparts_for_files(
        self,
        paths: list[str],
        vec: list[int],
        cache: ChurnCache | None = None,
    ) -> DataFrame:
        """(file, group) partials for ``paths``' live rows at the
        ``vec`` snapshot — each dim read pruned to the slice's fks."""
        spec = self.spec
        m = self.fact._manifest(vec[0])
        tagged = (
            cache.tagged(self.fact, vec[0], paths)
            if cache is not None
            else self._files_with_name(m, paths)
        )
        fproj = self._fact_proj(spec, tagged).localCheckpoint(eager=False)
        dim_slices = _pmap(
            lambda i: self._dim_proj(
                spec, i,
                _pruned_rows(
                    self.dims[i], spec["dims"][i]["dim_key"],
                    fproj.select(f"__jk{i}"), vec[i + 1],
                ),
            ),
            range(len(self.dims)),
        )
        return (
            self._join_all(fproj, dim_slices)
            .groupBy(F.col("__f"), *self._gcols())
            .agg(*self._fparts_aggs())
        )

    def _fparts_full(self, vec: list[int]) -> DataFrame:
        paths = [f["path"] for f in self.fact._manifest(vec[0])["files"]]
        return self._fparts_for_files(paths, vec)

    def _fparts(self, at: list[int] | None = None) -> TxTable:
        root = self.root / "_fparts"
        try:
            return TxTable(self.spark, root)
        except TxError:
            pass
        vec = list(self.applied_versions()) if at is None else list(at)
        full = self._fparts_full(vec)
        try:
            t = TxTable.create(self.spark, root, full, key="__f")
        except TxError:
            return TxTable(self.spark, root)  # lost a concurrent create
        if vec != [int(v) for v in self.spec["versions_at_create"]]:
            t.append(
                local_rows(self.spark, [], full.schema),
                txn=(self.APP, _enc(vec)),
            )
        return t

    def _fparts_vec(self, sup: TxTable) -> list[int]:
        f = sup.txn_version(self.APP)
        if f is None:
            return [int(v) for v in self.spec["versions_at_create"]]
        return list(_dec(int(f), len(self.spec["dims"])))

    def _affected_files(
        self,
        s_vec: list[int],
        v_vec: list[int],
        cache: ChurnCache | None = None,
    ) -> tuple[list[str], list[str]]:
        """(changed, fresh): support rows of ``changed`` fact files are
        dropped; ``fresh`` files re-partial at the ``v_vec`` snapshot.
        Raises TxError when a needed manifest/feed was vacuumed — the
        caller rebuilds wholesale."""
        m_old = self.fact._manifest(s_vec[0])
        m_new = self.fact._manifest(v_vec[0])
        old = {f["path"]: f for f in m_old["files"]}
        new = {f["path"]: f for f in m_new["files"]}
        removed = [p for p in old if p not in new]
        added = [p for p in new if p not in old]
        dv_grown = [
            p for p in new
            if p in old and new[p].get("dv") != old[p].get("dv")
        ]
        moved: set[str] = set()
        for i, d in enumerate(self.dims):
            if v_vec[i + 1] <= s_vec[i + 1]:
                continue
            dd = (
                cache.signed(d, s_vec[i + 1] + 1, v_vec[i + 1])
                if cache is not None
                else d.read_changes(s_vec[i + 1] + 1, v_vec[i + 1])
            )
            dk = self.spec["dims"][i]["dim_key"]
            rows = (
                dd.select(dk).distinct()
                .limit(self.FPARTS_MAX_MOVED_KEYS + 1).collect()
            )
            if len(rows) > self.FPARTS_MAX_MOVED_KEYS:
                moved = set(new)  # dim churn too wide: re-partial all
                break
            vals = [r[0] for r in rows]
            if vals:
                moved.update(
                    self.fact.files_for_values(
                        self.spec["dims"][i]["fk"], vals, v_vec[0]
                    )
                )
        fresh = sorted(set(added) | set(dv_grown) | (moved & set(new)))
        changed = sorted(set(removed) | set(fresh))
        return changed, fresh

    def _apply_fparts(
        self,
        sup: TxTable,
        changed: list[str],
        fresh: list[str],
        parts: DataFrame,
        fence: int,
    ) -> None:
        if not changed and not fresh:
            sup.append(
                local_rows(self.spark, [], sup.read().schema),
                txn=(self.APP, fence),
            )
            return
        keys = local_rows(
            self.spark, [(p,) for p in {*changed, *fresh}], "__f string"
        )
        drop = sorted({*changed, *fresh})

        def xform(slice_df: DataFrame) -> DataFrame:
            return slice_df.filter(
                ~F.col("__f").isin(drop)
            ).unionByName(parts)

        _apply_by_keys(sup, keys, xform, txn=(self.APP, fence))

    def _catchup_fparts(
        self, v_vec: list[int], cache: ChurnCache | None = None
    ) -> None:
        if not self._use_fparts():
            return
        sup = self._fparts()
        s_vec = self._fparts_vec(sup)
        if _enc(s_vec) >= _enc(v_vec):
            return
        try:
            changed, fresh = self._affected_files(s_vec, v_vec, cache)
            parts = self._fparts_for_files(
                fresh, v_vec, cache
            ).localCheckpoint(eager=False)
            self._apply_fparts(sup, changed, fresh, parts, _enc(v_vec))
        except TxError:
            sup.overwrite(
                self._fparts_full(v_vec), txn=(self.APP, _enc(v_vec))
            )

    # -------------------------------------------------------- refresh

    def _recompute(self, targets: list[int]) -> dict:
        fact_df = self.fact.read(targets[0])
        dim_dfs = [d.read(v) for d, v in zip(self.dims, targets[1:])]
        full = self._joined_agg(self.spec, fact_df, dim_dfs)
        r = self.table.overwrite(full, txn=(self.APP, _enc(targets)))
        if not r.get("skipped"):
            for n in self._value_support_names():
                self._support(n, at=targets).overwrite(
                    self._support_full(self.spec, fact_df, dim_dfs, n),
                    txn=(self.APP, _enc(targets)),
                )
            if self._use_fparts():
                self._fparts(at=targets).overwrite(
                    self._fparts_full(targets),
                    txn=(self.APP, _enc(targets)),
                )
        return {
            "refreshed_to": tuple(targets),
            "mode": "recompute",
            "skipped": bool(r.get("skipped", False)),
        }

    def refresh(
        self, mode: str = "incremental", cache: ChurnCache | None = None
    ) -> dict:
        """Fold every base's commits since the last refresh into the
        view: term A (fact feed ⋈ dims@new, each dim read key-pruned to
        the churned fks) plus one term per churned dim (dim feed ⋈
        fact@old key-pruned to the changed dim keys ⋈ the other dims at
        the versions the telescoping expansion dictates), aggregated to
        one signed delta per touched group and landed in one fenced
        key-pruned rewrite. A replayed refresh is a fenced skip;
        unmoved bases are a no-op without a commit. ``mode`` as in
        ``TxAggView.refresh``: incremental / recompute / auto (cost
        pick from manifest metadata alone — zero Spark jobs).
        ``cache`` as in ``TxAggView.refresh``: a per-sweep
        :class:`ChurnCache` sharing the raw feed reads across every
        view refreshed in one pass."""
        if mode not in ("incremental", "recompute", "auto"):
            raise TxError(f"refresh mode: {mode!r}")
        spec = self.spec
        v0 = list(self.applied_versions())
        # a crash between the view commit and a support commit leaves
        # supports lagging — converge them BEFORE the skip check, or a
        # movement-free replay would strand them forever
        self._catchup_supports(v0, cache)
        self._catchup_fparts(v0, cache)
        v1 = [self.fact.latest_version()] + [
            d.latest_version() for d in self.dims
        ]
        if all(a <= b for a, b in zip(v1, v0)):
            return {"refreshed_to": tuple(v0), "groups_touched": 0,
                    "skipped": True}
        if mode == "auto":
            fact_rows = self.fact.row_count()
            f_churn = (
                churn_rows(self.fact, v0[0] + 1, v1[0])
                if v1[0] > v0[0] else 0
            )
            mode = "incremental"
            if (
                fact_rows < self.RECOMPUTE_FLOOR_ROWS
                or f_churn >= self.RECOMPUTE_CHURN_FRACTION * fact_rows
            ):
                mode = "recompute"
            else:
                for i, d in enumerate(self.dims):
                    if v1[i + 1] <= v0[i + 1]:
                        continue
                    d_churn = churn_rows(d, v0[i + 1] + 1, v1[i + 1])
                    if d_churn >= self.RECOMPUTE_DIM_FRACTION * max(
                        d.row_count(), 1
                    ):
                        mode = "recompute"
                        break
        if mode == "recompute":
            return self._recompute(v1)

        gcols = self._gcols()
        # fparts maintenance needs only (v0, v1, cache) — never the
        # churn frame — and its probes are EAGER (per-dim moved-key
        # collects + file-value probes, ~1.2 s measured on the
        # navigator refresh), so overlap them with _churn_frame's own
        # eager chain (r14, guide §2.6). ChurnCache is lock-guarded and
        # already serves concurrent view refreshes in the gold sweep;
        # the except-path support rebuild committing while churn jobs
        # run is the documented AHEAD-support state, healed by fence.
        repairable = self._repair_names()

        def _fparts_block():
            if not (repairable and self._use_fparts()):
                return None, [], [], None, None
            fsup = self._fparts()
            try:
                f_changed, f_fresh = self._affected_files(v0, v1, cache)
                f_parts = self._fparts_for_files(
                    f_fresh, v1, cache
                ).localCheckpoint(eager=False)
                eff = fsup.read()
                if f_changed:
                    eff = eff.filter(~F.col("__f").isin(f_changed))
                return (
                    fsup, f_changed, f_fresh, f_parts,
                    eff.unionByName(f_parts),
                )
            except TxError:
                # manifest/feed window vacuumed — rebuild wholesale at
                # the target; the fence makes the later apply a no-op
                fsup.overwrite(
                    self._fparts_full(v1), txn=(self.APP, _enc(v1))
                )
                return fsup, [], [], None, fsup.read()

        _fp_ex = _fp_fut = None
        if os.environ.get("SPARK_GRAFT_NO_OVERLAP") != "1":
            from concurrent.futures import ThreadPoolExecutor

            _fp_ex = ThreadPoolExecutor(max_workers=1)
            _fp_fut = _fp_ex.submit(_fparts_block)
        churn = self._churn_frame(v0, v1, cache)
        dnames = self._distinct_names()
        snames = self._value_support_names()
        anames = [
            n for n, m in spec["measures"].items()
            if m["fn"] == "topk_approx"
        ]
        if snames or anames:
            # the same signed churn feeds the measure deltas AND each
            # distinct measure's value-level delta — pin it once (the
            # sweep cache checkpoints the RAW feeds; this frame is the
            # per-view JOINED churn, reused across this refresh only)
            churn = churn.localCheckpoint(eager=False)
        sign = F.col("__vw_sign")
        delta_aggs = []
        for n, m in spec["measures"].items():
            e = F.col(f"__e_{n}")
            if m["fn"] in ("sum", "avg", "var", "stddev"):
                delta_aggs.append(F.sum(sign * e).alias(f"__s_{n}"))
            if m["fn"] in ("var", "stddev", "sumsq"):
                delta_aggs.append(F.sum(sign * _sq(e)).alias(f"__q_{n}"))
            if m["fn"] == "hist":
                delta_aggs.append(
                    F.array(*_hist_cells(e, m, sign)).alias(f"__g_{n}")
                )
            if m["fn"] in ("sum", "avg", "count", "var", "stddev", "sumsq"):
                delta_aggs.append(
                    F.sum(
                        F.when(e.isNotNull(), sign).otherwise(F.lit(0))
                    ).alias(f"__c_{n}")
                )
            if m["fn"] == "min":
                delta_aggs.append(F.min(F.when(sign > 0, e)).alias(f"__i_{n}"))
                delta_aggs.append(F.min(F.when(sign < 0, e)).alias(f"__x_{n}"))
            if m["fn"] == "max":
                delta_aggs.append(F.max(F.when(sign > 0, e)).alias(f"__i_{n}"))
                delta_aggs.append(F.max(F.when(sign < 0, e)).alias(f"__x_{n}"))
            if m["fn"] == "approx_distinct":
                delta_aggs.append(
                    F.hll_sketch_agg(F.when(sign > 0, e)).alias(f"__i_{n}")
                )
                delta_aggs.append(
                    F.sum(
                        F.when(
                            (sign < 0) & e.isNotNull(), F.lit(1)
                        ).otherwise(F.lit(0))
                    ).alias(f"__x_{n}")
                )
            if m["fn"] == "topk_approx":
                # delete-side weight (fact deletes AND rows a dim
                # change moved out of the group) → the __ad drift
                # accumulator surfaced by read(include_error=True)
                delta_aggs.append(
                    F.sum(
                        F.when(
                            (sign < 0) & e.isNotNull(), F.lit(1)
                        ).otherwise(F.lit(0))
                    ).alias(f"__adw_{n}")
                )
        delta_aggs.append(F.sum(sign).alias(_N))
        delta = churn.groupBy(*gcols).agg(*delta_aggs)
        # distinct measures: value-level deltas → transitions against
        # the support state BEFORE this window's fold → one per-group
        # count delta joined into the main delta frame (its groups are
        # a subset of the churn's, so a left join is complete)
        dvs: dict[str, DataFrame] = {}
        for n in snames:
            dvs[n] = self._dv_frame(churn, n)
        for n in dnames:
            dg = self._transitions(self._support(n), dvs[n], n)
            cond = _and_all(
                F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in gcols
            )
            delta = (
                delta.alias("a")
                .join(dg.alias("b"), cond, "left")
                .select(
                    *[F.col(f"a.{c}").alias(c) for c in delta.columns],
                    F.coalesce(F.col(f"b.__dd_{n}"), F.lit(0)).alias(
                        f"__dd_{n}"
                    ),
                )
            )
        for n in anames:
            # topk_approx: BOUNDED fold operands (r14) — see
            # _mg_delta_frame / txview._mg_window_delta
            dmf = self._mg_delta_frame(churn, n)
            cond = _and_all(
                F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in gcols
            )
            delta = (
                delta.alias("a")
                .join(dmf.alias("b"), cond, "left")
                .select(
                    *[F.col(f"a.{c}").alias(c) for c in delta.columns],
                    F.col("b.__dm").alias(f"__dm_{n}"),
                    F.coalesce(F.col("b.__dae"), F.lit(0)).alias(
                        f"__dae_{n}"
                    ),
                )
            )
        delta = delta.localCheckpoint(eager=False)
        if _fp_fut is not None:
            try:
                fsup, f_changed, f_fresh, f_parts, rep_source = (
                    _fp_fut.result()
                )
            finally:
                _fp_ex.shutdown(wait=False)
        else:
            fsup, f_changed, f_fresh, f_parts, rep_source = _fparts_block()
        composite = self._composite(spec)
        view_key = _GK if composite else gcols[0]

        def _on_gcols(a: str, b: str):
            return _and_all(
                F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
                for c in gcols
            )

        def apply_delta(view_slice: DataFrame) -> DataFrame:
            s = view_slice.alias("v")
            d = delta.alias("d")
            merged = s.join(d, _on_gcols("v", "d"), "full_outer")
            v_here = F.col(f"v.{_N}").isNotNull()
            out_cols = [
                F.when(v_here, F.col(f"v.{c}"))
                .otherwise(F.col(f"d.{c}"))
                .alias(c)
                for c in gcols
            ]
            dirty_flags = []
            for n, m in spec["measures"].items():
                if m["fn"] in ("sum", "avg", "var", "stddev"):
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__s_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__s_{n}"), F.lit(0))
                        ).alias(f"__s_{n}")
                    )
                if m["fn"] in ("var", "stddev", "sumsq"):
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__q_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__q_{n}"), F.lit(0))
                        ).cast("decimal(38,0)").alias(f"__q_{n}")
                    )
                if m["fn"] in ("sum", "avg", "count", "var", "stddev",
                               "sumsq"):
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__c_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__c_{n}"), F.lit(0))
                        ).alias(f"__c_{n}")
                    )
                if m["fn"] == "hist":
                    zeros = _hist_zeros(m)
                    out_cols.append(
                        F.zip_with(
                            F.coalesce(F.col(f"v.__g_{n}"), zeros),
                            F.coalesce(F.col(f"d.__g_{n}"), zeros),
                            lambda x, y: x + y,
                        ).alias(f"__g_{n}")
                    )
                if m["fn"] == "distinct":
                    # exact transition fold — deletes never dirty
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__d_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__dd_{n}"), F.lit(0))
                        ).alias(f"__d_{n}")
                    )
                if m["fn"] == "topk_approx":
                    from .txview import _MG_EMPTY

                    mm = int(m["m"])
                    old = F.coalesce(
                        F.col(f"v.__a_{n}"), F.expr(_MG_EMPTY)
                    )
                    dm = F.col(f"d.__dm_{n}")
                    # merge the BOUNDED delta map (<= 2m keys) into the
                    # registers, then ONE Misra-Gries compress — same
                    # fold as TxAggView.apply_delta (txview)
                    merged_map = F.when(dm.isNull(), old).otherwise(
                        F.map_filter(
                            F.map_zip_with(
                                old,
                                dm,
                                lambda k, a, b: F.greatest(
                                    F.coalesce(a, F.lit(0))
                                    + F.coalesce(b, F.lit(0)),
                                    F.lit(0),
                                ),
                            ),
                            lambda k, v: v > 0,
                        )
                    )
                    cstar = F.coalesce(
                        F.get(
                            F.sort_array(
                                F.map_values(merged_map), asc=False
                            ),
                            mm,
                        ),
                        F.lit(0),
                    )
                    out_cols.append(
                        F.map_filter(
                            F.transform_values(
                                merged_map, lambda k, v: v - cstar
                            ),
                            lambda k, v: v > 0,
                        ).alias(f"__a_{n}")
                    )
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__ae_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__dae_{n}"), F.lit(0))
                            + cstar
                        ).alias(f"__ae_{n}")
                    )
                    if f"__ad_{n}" in view_slice.columns:
                        out_cols.append(
                            (
                                F.coalesce(F.col(f"v.__ad_{n}"), F.lit(0))
                                + F.coalesce(
                                    F.col(f"d.__adw_{n}"), F.lit(0)
                                )
                            ).alias(f"__ad_{n}")
                        )
                if m["fn"] == "approx_distinct":
                    vh = F.col(f"v.__h_{n}")
                    ins = F.col(f"d.__i_{n}")
                    dead = F.col(f"d.__x_{n}")
                    # inserts FOLD (HLL union is lossless on register
                    # state); sketches cannot subtract, so ANY deleted
                    # non-null value rides the repair path
                    dirty = F.coalesce(dead, F.lit(0)) > 0
                    fold = (
                        F.when(vh.isNull(), ins)
                        .when(ins.isNull(), vh)
                        .otherwise(F.hll_union(vh, ins))
                    )
                    out_cols.append(
                        F.when(dirty, F.lit(None))
                        .otherwise(fold)
                        .alias(f"__h_{n}")
                    )
                    out_cols.append(dirty.alias(f"__dirty_{n}"))
                    dirty_flags.append(f"__dirty_{n}")
                if m["fn"] in ("min", "max"):
                    vm = F.col(f"v.__m_{n}")
                    ins = F.col(f"d.__i_{n}")
                    dead = F.col(f"d.__x_{n}")
                    # inserts only improve the extremum; a negative
                    # contribution AT/PAST it (fact delete, or a dim
                    # change moving rows out of the group) may expose a
                    # new one only the joined bases know — repair. A
                    # group NEW to the view with any dead rows in the
                    # range repairs too (the range's surviving extremum
                    # is not derivable from its inserts alone).
                    if m["fn"] == "min":
                        dirty = dead.isNotNull() & (vm.isNull() | (dead <= vm))
                        fold = F.least(vm, ins)
                    else:
                        dirty = dead.isNotNull() & (vm.isNull() | (dead >= vm))
                        fold = F.greatest(vm, ins)
                    out_cols.append(
                        F.when(dirty, F.lit(None))
                        .otherwise(fold)
                        .alias(f"__m_{n}")
                    )
                    out_cols.append(dirty.alias(f"__dirty_{n}"))
                    dirty_flags.append(f"__dirty_{n}")
            out_cols.append(
                (
                    F.coalesce(F.col(f"v.{_N}"), F.lit(0))
                    + F.coalesce(F.col(f"d.{_N}"), F.lit(0))
                ).alias(_N)
            )
            out = merged.select(*out_cols)

            guard = F.when(
                F.col(_N) < 0,
                F.raise_error(
                    F.lit(
                        "txjoinview: negative group count — view out "
                        "of sync with the base change feeds"
                    )
                ).cast("boolean"),
            ).otherwise(F.col(_N) > 0)

            def finish(frame: DataFrame) -> DataFrame:
                if composite:
                    frame = frame.withColumn(_GK, _gk_expr(gcols))
                return frame.filter(guard)

            if not dirty_flags:
                return finish(out)
            out = out.localCheckpoint(eager=False)
            any_dirty = F.lit(False)
            for fl in dirty_flags:
                any_dirty = any_dirty | F.col(fl)
            # steady state (no extremal row died this range): skip the
            # repair recompute entirely — refresh stays O(churn)
            if out.filter(any_dirty).limit(1).count() == 0:
                return finish(out.drop(*dirty_flags))

            dirty_keys = out.filter(any_dirty).select(*gcols)
            if rep_source is not None:
                # LOW/MID-cardinality grain (r12): aggregate the dirty
                # groups' PER-FILE partials from the _fparts support —
                # O(dirty groups' support rows), never their fact
                # slice. The support state at the target snapshot is
                # (persisted rows minus changed files) ∪ this window's
                # fresh partials — built above. Bucket pre-filter
                # (r13, txview twin): hash the dirty group tuples into
                # FPARTS_BUCKETS and keep only dirty buckets' support
                # rows before the semi-join — bounded driver state,
                # derived on the fly (no support schema change).
                B = self.FPARTS_BUCKETS
                bcol = F.pmod(
                    F.xxhash64(*[F.col(c) for c in gcols]), F.lit(B)
                )
                dirty_b = [
                    r[0]
                    for r in dirty_keys.select(
                        bcol.alias("__b")
                    ).distinct().collect()
                ]
                rsrc = rep_source
                if len(dirty_b) < B:
                    # NULL group values are covered: xxhash64 skips
                    # NULL inputs (an all-NULL tuple hashes to the
                    # seed), so every group tuple owns a real bucket
                    rsrc = rsrc.filter(
                        F.pmod(
                            F.xxhash64(*[F.col(c) for c in gcols]),
                            F.lit(B),
                        ).isin(dirty_b)
                    )
                rep = (
                    rsrc.alias("b")
                    .join(
                        F.broadcast(dirty_keys.alias("k")),
                        _on_gcols("b", "k"),
                        "left_semi",
                    )
                    .groupBy(*gcols)
                    .agg(
                        *[
                            (
                                F.hll_union_agg(F.col(f"__h_{n}"))
                                if m["fn"] == "approx_distinct"
                                else (F.min if m["fn"] == "min" else F.max)(
                                    F.col(f"__m_{n}")
                                )
                            ).alias(f"__r_{n}")
                            for n, m in repairable.items()
                        ]
                    )
                )
            else:
                # HIGH-cardinality grain: recompute exactly the dirty
                # groups from the CURRENT joined bases — each group-
                # bearing dim scan filtered to those groups' rows
                # (group membership lives in the dim attrs, O(dim)),
                # fact read pruned to their keys
                d_slices = []
                anchor = None  # first dim carrying group cols
                for i, dj in enumerate(self.dims):
                    proj = self._dim_proj(spec, i, dj.read(v1[i + 1]))
                    own = [
                        g["col"] for g in spec["group"] if g["dim"] == i
                    ]
                    if own:
                        cond = _and_all(
                            F.col(f"b.{c}").eqNullSafe(F.col(f"k.{c}"))
                            for c in own
                        )
                        proj = proj.alias("b").join(
                            F.broadcast(
                                dirty_keys.select(*own).distinct().alias("k")
                            ),
                            cond,
                            "left_semi",
                        )
                        if anchor is None:
                            anchor = i
                    d_slices.append(proj)
                anchor = 0 if anchor is None else anchor
                f_slice = self._fact_proj(
                    spec,
                    _pruned_rows(
                        self.fact, spec["dims"][anchor]["fk"],
                        d_slices[anchor].select(f"__dk{anchor}"), v1[0],
                    ),
                )
                rep = (
                    self._join_all(f_slice, d_slices)
                    .groupBy(*gcols)
                    .agg(
                        *[
                            (
                                F.hll_sketch_agg(F.col(f"__e_{n}"))
                                if m["fn"] == "approx_distinct"
                                else (F.min if m["fn"] == "min" else F.max)(
                                    F.col(f"__e_{n}")
                                )
                            ).alias(f"__r_{n}")
                            for n, m in repairable.items()
                        ]
                    )
                )

            def repaired_cols(n: str, m: dict) -> list:
                if m["fn"] in ("sum", "avg"):
                    return [
                        F.col(f"m.__s_{n}").alias(f"__s_{n}"),
                        F.col(f"m.__c_{n}").alias(f"__c_{n}"),
                    ]
                if m["fn"] in ("var", "stddev"):
                    return [
                        F.col(f"m.__s_{n}").alias(f"__s_{n}"),
                        F.col(f"m.__q_{n}").alias(f"__q_{n}"),
                        F.col(f"m.__c_{n}").alias(f"__c_{n}"),
                    ]
                if m["fn"] == "sumsq":
                    return [
                        F.col(f"m.__q_{n}").alias(f"__q_{n}"),
                        F.col(f"m.__c_{n}").alias(f"__c_{n}"),
                    ]
                if m["fn"] == "hist":
                    return [F.col(f"m.__g_{n}").alias(f"__g_{n}")]
                if m["fn"] == "count":
                    return [F.col(f"m.__c_{n}").alias(f"__c_{n}")]
                if m["fn"] == "distinct":
                    return [F.col(f"m.__d_{n}").alias(f"__d_{n}")]
                if m["fn"] == "topk":
                    return []  # no physical column
                if m["fn"] == "topk_approx":
                    # register state never repairs — pass through
                    keep = [
                        F.col(f"m.__a_{n}").alias(f"__a_{n}"),
                        F.col(f"m.__ae_{n}").alias(f"__ae_{n}"),
                    ]
                    if f"__ad_{n}" in view_slice.columns:
                        keep.append(
                            F.col(f"m.__ad_{n}").alias(f"__ad_{n}")
                        )
                    return keep
                phys = "__h_" if m["fn"] == "approx_distinct" else "__m_"
                return [
                    F.when(F.col(f"m.__dirty_{n}"), F.col(f"r.__r_{n}"))
                    .otherwise(F.col(f"m.{phys}{n}"))
                    .alias(f"{phys}{n}")
                ]

            out = (
                out.alias("m")
                .join(rep.alias("r"), _on_gcols("m", "r"), "left")
                .select(
                    *[F.col(f"m.{c}").alias(c) for c in gcols],
                    *[
                        c
                        for n, m in spec["measures"].items()
                        for c in repaired_cols(n, m)
                    ],
                    F.col(f"m.{_N}").alias(_N),
                )
            )
            return finish(out)

        keys = delta
        if composite:
            keys = delta.withColumn(_GK, _gk_expr(gcols))
        r = _apply_by_keys(
            self.table, keys.select(view_key), apply_delta,
            txn=(self.APP, _enc(v1)),
        )
        if not r.get("skipped"):
            # supports fold AFTER the view commit, behind the same
            # fence: a crash here leaves them lagging, and the next
            # refresh's _catchup_supports re-derives this window from
            # the feeds; a fenced-skip view (a concurrent refresher
            # won) leaves supports to the winner / the catch-up.
            # The applies target DISJOINT support tables behind the
            # SAME fence, so they run concurrently (r14): a crash mid-
            # fanout leaves any subset lagging, exactly the state the
            # catch-up already heals.
            post = [
                (lambda n=n: self._apply_support(
                    self._support(n), dvs[n], _enc(v1)
                ))
                for n in snames
            ]
            if repairable and f_parts is not None:
                post.append(
                    lambda: self._apply_fparts(
                        fsup, f_changed, f_fresh, f_parts, _enc(v1)
                    )
                )
            _pmap(lambda f: f(), post)
        return {
            "refreshed_to": tuple(v1),
            "mode": "incremental",
            "groups_touched": delta.count(),
            "files_rewritten": r.get("files_rewritten", 0),
            "skipped": bool(r.get("skipped", False)),
            "skew_salted_dims": getattr(self, "_last_salted_dims", ()),
        }
