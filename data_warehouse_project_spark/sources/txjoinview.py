"""Incrementally-maintained JOIN-aggregate views: star-schema rollups
(fact ⋈ dimension, grouped by a dimension attribute) kept in sync with
BOTH base tables from their change feeds.

``TxAggView`` maintains ``GROUP BY`` over ONE table; the gold layer's
real queries group a fact by DIMENSION attributes (reference:
dw_etl_tests.py Q2/Q3 group fct_sales by product brand / customer
geography after joining the dims). The reference recomputes those
rollups wholesale each run — right at 80k rows, wrong at 100 TB where
a day moves ~0.1% of the fact and a handful of dimension rows.

``TxJoinAggView`` materializes

    SELECT <group_expr over dim>, agg(<measure exprs over fact>) ...
    FROM fact JOIN dim ON fact.<fk> = dim.<key>
    GROUP BY <group_expr>

and refreshes it in O(churn) using the classic bilinear delta
decomposition (Gupta & Mumick, IEEE Data Eng. Bulletin 1995; Blakeley
et al., SIGMOD 1986 — the join-view maintenance algebra):

    F1 ⋈ D1  −  F0 ⋈ D0   =   ΔF ⋈ D1   +   F0 ⋈ ΔD

- **Term A (fact churn)**: the fact's change feed rows (signed +1 in /
  −1 out), joined to the dimension AT ITS NEW VERSION — the dim side is
  read key-pruned for exactly the churned foreign keys
  (``read_for_keys``), never scanned. O(fact churn).
- **Term B (dimension churn)**: the dim's change feed rows (an
  attribute update is a signed pair: preimage −old attr, postimage
  +new attr), joined to the fact AT ITS OLD VERSION, again key-pruned
  to the changed dimension keys. This is the re-bucketing cost — a
  dimension attribute change moves ALL of that key's fact rows between
  groups, and term B touches exactly those rows. O(fact rows of
  changed dim keys) — the minimum possible work for the semantics.

Both terms aggregate to one signed physical delta per touched group,
landed with a key-pruned fenced ``rewrite_by_keys`` — identical
exactly-once machinery to ``TxAggView``. The applied (fact, dim)
version PAIR is packed into the single monotonic fence version
(fact<<31 | dim), so one commit atomically records both cursors and a
crash replay of either fold is a fenced skip.

Measures: SUM / COUNT / AVG (self-maintainable — the view stores
per-measure running sum + non-null count, so SQL NULL semantics are
exact) plus MIN / MAX with the standard delete-repair: inserts fold
(least/greatest), but a negative contribution at or past a group's
stored extremum — a fact delete, OR a dim change moving rows out of
the group — dirties it, and dirty groups recompute from the CURRENT
joined pair, restricted to exactly those groups (dim scan filtered to
the dirty groups' rows, fact read pruned to their keys). Repair cost
is O(dim + dirty groups' fact rows), never O(fact). APPROX_DISTINCT
maintains a per-group HyperLogLog sketch like ``TxAggView``: inserts
fold (HLL union), any deleted non-null value rides the same repair
path, and ``read()`` keeps COUNT(DISTINCT) surface semantics. Measure
expressions range over FACT columns; the group expression ranges over
DIMENSION columns.

Join semantics are INNER on ``fact.fk = dim.<dim_on>`` (``dim_on``
defaults to the dim's table key — e.g. a surrogate-id column when the
dim is merge-keyed by its natural key) with the standard SQL
treatment: NULL foreign keys match nothing; a fact row with no
dimension row contributes to no group until the dim row arrives (term
B then picks its rows up — late-arriving dimensions are handled by the
algebra, not by special cases). The dimension must be unique per
``dim_on`` value (an SCD1 dim — the same contract the SQL join would
need to avoid fanout).

100 TB shape: refresh cost is O(fact churn + moved dim keys' fact rows
+ touched view groups). Both point reads prune by each base's layout
(exact file pruning when the probe column is the table key, manifest
range skipping when it is in ``stats_cols``, honest full scan
otherwise — see ``_pruned_rows``); the view rewrite touches only files
whose key range holds a touched group.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txtable import TXLOG_DIR, TxError, TxTable
from .txview import _N, _signed, churn_rows

_SIDECAR = "_joinview.json"
_DIM_BITS = 31  # fence packing: fact_version << 31 | dim_version


def _norm_measures(measures: dict) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name, spec in measures.items():
        if isinstance(spec, str):
            fn, expr = "sum", spec
        elif isinstance(spec, dict):
            fn, expr = spec["fn"], spec["expr"]
        else:
            fn, expr = spec
        fn = fn.lower()
        if fn not in ("sum", "count", "avg", "min", "max", "approx_distinct"):
            raise TxError(
                f"measure {name!r}: join views maintain "
                f"sum/count/avg/min/max/approx_distinct; got {fn!r}"
            )
        out[name] = {"fn": fn, "expr": expr}
    return out


def _enc(fact_v: int, dim_v: int) -> int:
    if dim_v >= (1 << _DIM_BITS):
        raise TxError(f"dim version {dim_v} exceeds fence packing range")
    return (fact_v << _DIM_BITS) | dim_v


def _dec(fence: int) -> tuple[int, int]:
    return fence >> _DIM_BITS, fence & ((1 << _DIM_BITS) - 1)


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
      scale, key or stats-declare the join columns on both bases."""
    m = table._manifest(version)
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
    """A fact ⋈ dim GROUP BY view stored as its own ``TxTable`` keyed
    by the group column, refreshed incrementally from BOTH bases'
    change feeds. See the module docstring for the algebra.

    ``group_expr`` is a SQL expression over DIMENSION columns (its
    output is the view key — single column, like ``TxAggView``);
    ``measures`` maps output name -> SQL expression over FACT columns
    (bare string = SUM, or ``(fn, expr)`` with fn in sum/count/avg).
    ``read()`` projects the logical view plus ``n_rows``; groups whose
    joined row count reaches zero leave the view, exactly like a
    recompute (test-pinned equal after every refresh)."""

    APP = "txjoinview"
    RECOMPUTE_FLOOR_ROWS = 10_000_000
    RECOMPUTE_CHURN_FRACTION = 0.2
    #: a dim rewriting this fraction of its keys moves a comparable
    #: fraction of the fact between groups — recompute wins
    RECOMPUTE_DIM_FRACTION = 0.05

    def __init__(self, spark: SparkSession, root: str | Path):
        self.root = Path(root)
        side = self.root / _SIDECAR
        if not side.is_file():
            raise TxError(f"not a TxJoinAggView (no {_SIDECAR}): {root}")
        with open(side) as f:
            self.spec = json.load(f)
        self.spec["measures"] = _norm_measures(self.spec["measures"])
        self.spark = spark
        self.table = TxTable(spark, self.root)
        self.fact = TxTable(spark, self.spec["fact_root"])
        self.dim = TxTable(spark, self.spec["dim_root"])

    # ------------------------------------------------------------ init

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str | Path,
        fact: TxTable,
        dim: TxTable,
        fk: str,
        group_expr: str,
        group_col: str,
        measures: dict,
        dim_on: str | None = None,
    ) -> "TxJoinAggView":
        """Full-compute the view at both bases' CURRENT versions and
        persist the definition; later ``refresh()`` calls fold feeds
        from those versions. ``fk`` is the fact's join column; the dim
        side joins on ``dim_on`` (default: its table key — ``dim`` must
        be keyed so its feed and rewrites stay key-pruned; pass a
        different unique column, e.g. a surrogate id, when the fact
        references that instead of the merge key)."""
        root = Path(root)
        if (root / TXLOG_DIR).exists() or (root / _SIDECAR).exists():
            raise TxError(f"already a view or table: {root}")
        if dim._manifest()["key"] is None:
            raise TxError("join-view dim must be a keyed TxTable")
        norm = _norm_measures(measures)
        bad = {n for n in norm if n == _N or n.startswith("__")}
        if bad:
            raise TxError(f"measure name(s) reserved: {sorted(bad)}")
        f_v, d_v = fact.latest_version(), dim.latest_version()
        spec = {
            "fact_root": str(fact.root),
            "dim_root": str(dim.root),
            "fk": fk,
            "dim_key": dim_on or dim._manifest()["key"],
            "group_expr": group_expr,
            "group_col": group_col,
            "measures": norm,
            "fact_version_at_create": f_v,
            "dim_version_at_create": d_v,
        }
        full = cls._joined_agg(
            spec, fact.read(f_v), dim.read(d_v)
        )
        root.mkdir(parents=True, exist_ok=True)
        with open(root / _SIDECAR, "w") as f:
            json.dump(spec, f)
            f.flush()
            os.fsync(f.fileno())
        TxTable.create(spark, root, full, key=group_col)
        return cls(spark, root)

    # -------------------------------------------------------- internals

    @staticmethod
    def _fact_proj(spec: dict, fact_df: DataFrame) -> DataFrame:
        """Project a fact-side frame to (fk, one evaluated column per
        measure) — measure expressions are evaluated BEFORE the dim
        join so fact/dim column-name collisions cannot misbind."""
        cols = [F.col(spec["fk"]).alias("__jk")]
        for n, m in spec["measures"].items():
            cols.append(F.expr(m["expr"]).alias(f"__e_{n}"))
        extra = [c for c in ("__vw_sign",) if c in fact_df.columns]
        return fact_df.select(*cols, *extra)

    @staticmethod
    def _dim_proj(spec: dict, dim_df: DataFrame) -> DataFrame:
        cols = [
            F.col(spec["dim_key"]).alias("__dk"),
            F.expr(spec["group_expr"]).alias(spec["group_col"]),
        ]
        extra = [c for c in ("__vw_sign",) if c in dim_df.columns]
        return dim_df.select(*cols, *extra)

    @classmethod
    def _joined_agg(
        cls, spec: dict, fact_df: DataFrame, dim_df: DataFrame
    ) -> DataFrame:
        """Full-recompute plan: fact ⋈ dim, grouped to the PHYSICAL
        view columns (running sum + non-null count per measure)."""
        j = cls._fact_proj(spec, fact_df).join(
            cls._dim_proj(spec, dim_df),
            F.col("__jk") == F.col("__dk"),
        )
        aggs = []
        for n, m in spec["measures"].items():
            e = F.col(f"__e_{n}")
            if m["fn"] in ("sum", "avg"):
                aggs.append(F.sum(e).alias(f"__s_{n}"))
            if m["fn"] in ("sum", "avg", "count"):
                aggs.append(F.count(e).alias(f"__c_{n}"))
            if m["fn"] == "min":
                aggs.append(F.min(e).alias(f"__m_{n}"))
            if m["fn"] == "max":
                aggs.append(F.max(e).alias(f"__m_{n}"))
            if m["fn"] == "approx_distinct":
                aggs.append(F.hll_sketch_agg(e).alias(f"__h_{n}"))
        aggs.append(F.count(F.lit(1)).alias(_N))
        return j.groupBy(spec["group_col"]).agg(*aggs)

    # ---------------------------------------------------------- reads

    def read(self, version: int | None = None) -> DataFrame:
        """The LOGICAL view: group column + each measure with exact SQL
        aggregate semantics (NULL SUM/AVG for empty-of-non-null groups)
        + ``n_rows`` (live joined row count)."""
        g = self.spec["group_col"]
        cols = [F.col(g)]
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
            else:  # min / max
                cols.append(F.col(f"__m_{n}").alias(n))
        cols.append(F.col(_N))
        return self.table.read(version).select(*cols)

    def applied_versions(self) -> tuple[int, int]:
        """(fact version, dim version) whose effects the view reflects."""
        fence = self.table.txn_version(self.APP)
        if fence is None:
            return (
                int(self.spec["fact_version_at_create"]),
                int(self.spec["dim_version_at_create"]),
            )
        return _dec(fence)

    # -------------------------------------------------------- refresh

    def _recompute(self, f1: int, d1: int) -> dict:
        full = self._joined_agg(
            self.spec, self.fact.read(f1), self.dim.read(d1)
        )
        r = self.table.overwrite(full, txn=(self.APP, _enc(f1, d1)))
        return {
            "refreshed_to": (f1, d1),
            "mode": "recompute",
            "skipped": bool(r.get("skipped", False)),
        }

    def refresh(self, mode: str = "incremental") -> dict:
        """Fold both bases' commits since the last refresh into the
        view: term A (fact feed ⋈ dim@new, dim read key-pruned to the
        churned fks) plus term B (dim feed ⋈ fact@old, fact read
        key-pruned to the changed dim keys), aggregated to one signed
        delta per touched group and landed in one fenced key-pruned
        rewrite. A replayed refresh is a fenced skip; unmoved bases are
        a no-op without a commit. ``mode`` as in ``TxAggView.refresh``:
        incremental / recompute / auto (cost pick from manifest
        metadata alone — zero Spark jobs)."""
        if mode not in ("incremental", "recompute", "auto"):
            raise TxError(f"refresh mode: {mode!r}")
        f0, d0 = self.applied_versions()
        f1 = self.fact.latest_version()
        d1 = self.dim.latest_version()
        if f1 <= f0 and d1 <= d0:
            return {"refreshed_to": (f0, d0), "groups_touched": 0,
                    "skipped": True}
        if mode == "auto":
            fact_rows = self.fact.row_count()
            f_churn = churn_rows(self.fact, f0 + 1, f1) if f1 > f0 else 0
            d_churn = churn_rows(self.dim, d0 + 1, d1) if d1 > d0 else 0
            dim_rows = max(self.dim.row_count(), 1)
            mode = (
                "recompute"
                if fact_rows < self.RECOMPUTE_FLOOR_ROWS
                or f_churn >= self.RECOMPUTE_CHURN_FRACTION * fact_rows
                or d_churn >= self.RECOMPUTE_DIM_FRACTION * dim_rows
                else "incremental"
            )
        if mode == "recompute":
            return self._recompute(f1, d1)

        spec = self.spec
        g = spec["group_col"]
        terms = []
        if f1 > f0:
            # term A: ΔF ⋈ D1 — signed fact churn, dim read pruned to
            # the churned fks and pinned at its NEW version
            df = self._fact_proj(
                spec, _signed(self.fact.read_changes(f0 + 1, f1))
            )
            dim_slice = self._dim_proj(
                spec,
                _pruned_rows(
                    self.dim, spec["dim_key"], df.select("__jk"), d1
                ),
            )
            terms.append(df.join(dim_slice, F.col("__jk") == F.col("__dk")))
        if d1 > d0:
            # term B: F0 ⋈ ΔD — signed dim churn (an attribute update is
            # −old attr / +new attr), fact read pruned to the changed
            # dim keys and pinned at its OLD version
            dd = self._dim_proj(
                spec, _signed(self.dim.read_changes(d0 + 1, d1))
            ).localCheckpoint(eager=False)
            fact_slice = self._fact_proj(
                spec,
                _pruned_rows(self.fact, spec["fk"], dd.select("__dk"), f0),
            )
            terms.append(fact_slice.join(dd, F.col("__jk") == F.col("__dk")))

        churn = terms[0] if len(terms) == 1 else terms[0].unionByName(terms[1])
        sign = F.col("__vw_sign")
        delta_aggs = []
        for n, m in spec["measures"].items():
            e = F.col(f"__e_{n}")
            if m["fn"] in ("sum", "avg"):
                delta_aggs.append(F.sum(sign * e).alias(f"__s_{n}"))
            if m["fn"] in ("sum", "avg", "count"):
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
        delta_aggs.append(F.sum(sign).alias(_N))
        delta = (
            churn.groupBy(g).agg(*delta_aggs).localCheckpoint(eager=False)
        )
        repairable = {
            n: m for n, m in spec["measures"].items()
            if m["fn"] in ("min", "max", "approx_distinct")
        }

        def apply_delta(view_slice: DataFrame) -> DataFrame:
            s = view_slice.alias("v")
            d = delta.alias("d")
            merged = s.join(
                d, F.col(f"v.{g}").eqNullSafe(F.col(f"d.{g}")), "full_outer"
            )
            v_here = F.col(f"v.{_N}").isNotNull()
            out_cols = [
                F.when(v_here, F.col(f"v.{g}"))
                .otherwise(F.col(f"d.{g}"))
                .alias(g)
            ]
            dirty_flags = []
            for n, m in spec["measures"].items():
                if m["fn"] in ("sum", "avg"):
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__s_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__s_{n}"), F.lit(0))
                        ).alias(f"__s_{n}")
                    )
                if m["fn"] in ("sum", "avg", "count"):
                    out_cols.append(
                        (
                            F.coalesce(F.col(f"v.__c_{n}"), F.lit(0))
                            + F.coalesce(F.col(f"d.__c_{n}"), F.lit(0))
                        ).alias(f"__c_{n}")
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
                    # new one only the joined pair knows — repair. A
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

            if not dirty_flags:
                return out.filter(guard)
            out = out.localCheckpoint(eager=False)
            any_dirty = F.lit(False)
            for fl in dirty_flags:
                any_dirty = any_dirty | F.col(fl)
            # steady state (no extremal row died this range): skip the
            # repair recompute entirely — refresh stays O(churn)
            if out.filter(any_dirty).limit(1).count() == 0:
                return out.drop(*dirty_flags).filter(guard)

            # repair: recompute EXACTLY the dirty groups from the
            # CURRENT joined pair — dim scan filtered to those groups
            # (group membership lives in the dim attr, O(dim)), fact
            # read pruned to their keys
            dirty_keys = out.filter(any_dirty).select(g)
            d_slice = (
                self._dim_proj(spec, self.dim.read(d1))
                .alias("b")
                .join(
                    F.broadcast(dirty_keys.alias("k")),
                    F.col(f"b.{g}").eqNullSafe(F.col(f"k.{g}")),
                    "left_semi",
                )
            )
            f_slice = self._fact_proj(
                spec,
                _pruned_rows(self.fact, spec["fk"], d_slice.select("__dk"), f1),
            )
            rep = (
                f_slice.join(d_slice, F.col("__jk") == F.col("__dk"))
                .groupBy(g)
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
                if m["fn"] == "count":
                    return [F.col(f"m.__c_{n}").alias(f"__c_{n}")]
                phys = "__h_" if m["fn"] == "approx_distinct" else "__m_"
                return [
                    F.when(F.col(f"m.__dirty_{n}"), F.col(f"r.__r_{n}"))
                    .otherwise(F.col(f"m.{phys}{n}"))
                    .alias(f"{phys}{n}")
                ]

            out = (
                out.alias("m")
                .join(
                    rep.alias("r"),
                    F.col(f"m.{g}").eqNullSafe(F.col(f"r.{g}")),
                    "left",
                )
                .select(
                    F.col(f"m.{g}").alias(g),
                    *[
                        c
                        for n, m in spec["measures"].items()
                        for c in repaired_cols(n, m)
                    ],
                    F.col(f"m.{_N}").alias(_N),
                )
            )
            return out.filter(guard)

        r = self.table.rewrite_by_keys(
            delta.select(g), apply_delta, txn=(self.APP, _enc(f1, d1))
        )
        return {
            "refreshed_to": (f1, d1),
            "mode": "incremental",
            "groups_touched": delta.count(),
            "files_rewritten": r.get("files_rewritten", 0),
            "skipped": bool(r.get("skipped", False)),
        }
