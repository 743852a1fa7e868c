"""Physical-plan audit: assert the scale-critical plan properties the
engine is designed around (SURVEY.md §4 / the 100 TB checklist):

- column pruning reached the parquet scan (ReadSchema ⊂ table schema)
- filters pushed into the scan (PushedFilters non-empty where expected)
- dimension joins chose broadcast (no fact-side shuffle)
- no accidental CartesianProduct/BroadcastNestedLoopJoin except where
  a query intentionally crosses (documented below)

Run: PYTHONPATH=/root/repo python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

_REPO = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:  # tolerate any caller cwd (gates must not
    sys.path.insert(0, _REPO)  # silently run against a stale install)

# queries that intentionally contain a non-equi or cross join
ALLOW_NESTED_LOOP = {
    "ann_cosine_topk",  # broadcast cross of 5 query vectors — intended
    "dedup_embedding_cosine",  # brute-force all-pairs oracle baseline
    "watermark_incremental_sales",  # 1-row watermark broadcast cross
    "dedup_ngram_jaccard",  # shingle equi-join is present; pair filter non-equi
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",  # band equi-join plus neq filter
    "ann_ivf_topk",  # broadcast cross vs 16 centroids — intended
    "quartile_buckets_acctbal",  # broadcast cross of the 1-row boundary frame
    "idle_balance_by_segment",  # 1-row avg-balance threshold broadcast cross
    "bigram_df_topk",  # 1-row corpus-total broadcast cross
    "significant_nation_value",  # 1-row global-sum threshold broadcast cross
    "familiarity_outliers_by_source",  # 1-row corpus-mean broadcast cross
    "top_revenue_supplier",  # 1-row MAX argmax broadcast cross
    "mixture_resample_audit",  # 1-row total-weight + feasible-min crosses
    "funnel_view_click_purchase",  # 1-row stage-count crosses
    "key_skew_profile",  # 1-row total broadcast cross
    "kmeans_update_step",  # broadcast cross vs 16 centroids — intended
    "dedup_semantic_clusters",  # broadcast cross vs 16 centroids — intended
    "copurchase_triangles",  # 1-row n_edges/n_triangles stat crosses
    "source_overlap_minhash",  # |sources|-row signature cross — model state
    "heavy_hitters_cms",  # 10-probe x 1KB-register cross — sketch state
    "tfidf_top_terms_per_doc",  # 1-row corpus-total broadcast cross
    "pagerank_update_step",  # 1-row node-count broadcast cross
    "rfm_segments",  # 1-row global-max-day + 1-row quartile-boundary crosses
    "basket_lift_pairs",  # 1-row order-count broadcast cross
    "rolling_28d_active_users",  # 1-row max-day bound broadcast cross
    "preceding_events_10min_micros",  # 1-row bucket-bounds broadcast cross (×2 endpoints)
}

EXPECT_BROADCAST = [
    "q2_sales_by_brand",
    "q3_sales_by_geo",
    "dim_customer_denorm",
    "dim_supplier_denorm",
    "topk_parts_per_brand",
    "bridge_store_region",
    "customer_rank_in_nation",
    "returned_revenue_by_customer",
    "promo_revenue_share",
    "supplier_variety_by_brand",
    "large_volume_customers",
    "disjunctive_bracket_revenue",
]

EXPECT_PUSHED_FILTER = [
    "pricing_summary",
    "running_daily_revenue",
]

# shuffle-count regression guard: max Exchange nodes allowed in the
# executed plan (measured at the plan shape we designed for; a regression
# here usually means a broadcast fell back to SortMergeJoin or a window
# stopped reusing the aggregation's partitioning)
SHUFFLE_BUDGET = {
    "q1_fact_totals": 1,
    "q2_sales_by_brand": 3,
    "q3_sales_by_geo": 5,
    "pricing_summary": 2,
    "revenue_forecast_filter": 1,
    # candidate generation is checkpointed during construction, so the
    # final plan is the verify stage: pair broadcast joins + the
    # presentation sort (r5's shingle-explode formulation measured 22)
    "dedup_minhash_lsh": 3,
    "ann_cosine_topk": 3,
    "ann_lsh_topk": 6,
    "market_share_by_year": 8,
    "sole_blame_suppliers": 4,
    "repetition_profile": 4,
    "chunk_documents": 1,
    "kmeans_update_step": 4,
    # r7 prefix-sum rewrite: more exchanges than the old pair join (the
    # day-spine cumsum + two spine broadcasts add small-frame shuffles)
    # but every one is over ≤366-row model state except the daily
    # rollup — the pair-enumerating plan it replaced was Θ(density²)
    "shipments_during_open_orders": 10,
    "familiarity_outliers_by_source": 11,
    "overlapping_order_windows": 5,
}

# per-write Exchange budgets for BOTH full-ETL strategies (snapshot and
# merge), first run AND rerun — captured through Warehouse.PLAN_CAPTURE
# at the exact point each stage hands its frame to the writer, so every
# bench=True surface (queries + both ETL strategies) now carries an
# enforced shuffle ceiling. Calibrated at sf0.01 (the audit's default
# scale); values are the measured max across {strategy} × {run, rerun}.
# A write with NO entry here fails the audit — new stages must declare
# a budget. The rerun ceilings are higher because incremental loads add
# anti-join/change-detection stages (ce_products_scd's 31 is the SCD2
# full change-detection rebuild — dim-sized data on every exchange).
ETL_WRITE_BUDGET = {
    "staging/customers": 5,
    "staging/products": 3,
    "staging/sales": 4,
    "staging/stores": 5,
    "bl_3nf/ce_regions": 4,
    "bl_3nf/ce_nations": 4,
    "bl_3nf/ce_states": 4,
    "bl_3nf/ce_cities": 4,
    "bl_3nf/ce_categories": 8,
    "bl_3nf/ce_subcategories": 10,
    "bl_3nf/ce_customers": 13,
    "bl_3nf/ce_stores": 10,
    "bl_3nf/ce_products_scd": 31,
    "bl_3nf/ce_sales": 5,
    "bl_dm/dim_dates": 2,
    "bl_dm/dim_customers": 4,
    "bl_dm/dim_stores": 2,
    "bl_dm/dim_products_scd": 2,
    "bl_dm/fct_sales": 2,
    "bl_dm/fct_events": 3,
}

# writes whose plans legitimately carry a SinglePartition exchange:
# dim_dates is a calendar-bounded frame (one row per day of the fact
# range) built with a dense sequence — bounded model state, and the
# dense-key dims are runtime-guarded by DENSE_KEY_MAX_ROWS
ETL_SINGLE_PARTITION_OK = {"bl_dm/dim_dates"}

# queries whose plans must NOT funnel unaggregated data through one task
# (global windowless row_number / Window.orderBy): surrogate-key minting
# and sf-proportional cumulative sums use bucketed partition-offset
# assignment instead (operators/keys.py, operators/prefix.py)
NO_SINGLE_PARTITION_EXCHANGE = [
    "surrogate_keys_nation",
    "abc_classification_parts",
    # grouped bucketed_prefix_sum: offsets parallelize across sources,
    # so the plan needs no SinglePartition exchange at all
    "token_budget_pack_by_source",
]

# bucket-id columns whose per-bucket count/sum frames are bounded model
# state (<= n_buckets rows) — the only data a SinglePartition exchange
# may legitimately carry, besides scalar aggregates
_BOUNDED_BUCKET_KEYS = ("__kb", "__pb")


# structural wrapper nodes that can sit between an exchange and its
# real child in a plan dump without changing the data flowing through
_PLAN_WRAPPERS = (
    "WholeStageCodegen",
    "InputAdapter",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "TableCacheQueryStage",
    # a Sort between the exchange and a SortAggregate reorders, never
    # changes, the data — without this the SortAggregate branch below
    # is unreachable ("Sort [" cannot match "SortAggregate(")
    "Sort [",
    "== ",
)


def _single_partition_ok(lines: list[str], i: int) -> bool:
    """A SinglePartition exchange is legitimate iff its first real
    child operator is (a) an aggregate keyed by a bounded bucket id
    (the n_buckets-row offset frame of with_distributed_keys /
    bucketed_prefix_sum) or (b) a scalar aggregate (keys=[] — one
    partial row per map task). The scan walks past structural wrapper
    nodes but stops at the first REAL operator — matching the child,
    not textual proximity, so a serial exchange that merely sits NEAR
    a key-minting subtree still fails."""
    for j in range(i + 1, min(i + 11, len(lines))):
        ln = lines[j]
        if not ln.strip() or any(wtoken in ln for wtoken in _PLAN_WRAPPERS):
            continue
        if "HashAggregate" in ln or "SortAggregate" in ln or "ObjectHashAggregate" in ln:
            if "keys=[]" in ln:
                return True
            head = ln.split("functions=")[0]
            return any(k in head for k in _BOUNDED_BUCKET_KEYS)
        return False  # some other operator feeds the exchange: real data
    return False


def audit(sf_dir: str) -> int:
    from data_warehouse_project_spark.plans import QUERIES
    from data_warehouse_project_spark.session import get_spark

    spark = get_spark("explain-audit")
    failures = 0

    _plans: dict[str, str] = {}

    def plan_of(name: str) -> str:
        # memoized: several audit lists reference the same query, and
        # re-planning repeats parquet footer reads + Catalyst analysis
        if name not in _plans:
            df = QUERIES[name].fn(spark, sf_dir)
            _plans[name] = df._jdf.queryExecution().executedPlan().toString()
        return _plans[name]

    for name in QUERIES:
        if QUERIES[name].eager:
            # stateful index admissions RUN jobs when the plan is built —
            # skip in plan-only audits (their operators are covered by
            # parity + dedicated tests)
            continue
        p = plan_of(name)
        if "CartesianProduct" in p and name not in ALLOW_NESTED_LOOP:
            print(f"✗ {name}: unexpected CartesianProduct")
            failures += 1
        if "BroadcastNestedLoopJoin" in p and name not in ALLOW_NESTED_LOOP:
            print(f"✗ {name}: unexpected BroadcastNestedLoopJoin")
            failures += 1

    for name in EXPECT_BROADCAST:
        p = plan_of(name)
        if "BroadcastHashJoin" not in p:
            print(f"✗ {name}: expected BroadcastHashJoin, got none")
            failures += 1
        if "SortMergeJoin" in p and name in ("q2_sales_by_brand",):
            print(f"✗ {name}: fact join fell back to SortMergeJoin")
            failures += 1

    for name in EXPECT_PUSHED_FILTER:
        p = plan_of(name)
        # at least one scan must push a non-empty filter list; a second
        # predicate-free scan (e.g. an added dim join) is not a failure
        if not re.search(r"PushedFilters: \[[^\]]", p):
            print(f"✗ {name}: no scan carries pushed filters")
            failures += 1

    for name, budget in SHUFFLE_BUDGET.items():
        p = plan_of(name)
        got = p.count("Exchange ")
        if got > budget:
            print(f"✗ {name}: {got} Exchange nodes (budget {budget})")
            failures += 1

    for name in NO_SINGLE_PARTITION_EXCHANGE:
        p = plan_of(name)
        # rangepartitioning (presentation sort) is fine; a SinglePartition
        # exchange over the DATA means a serial global window. Every
        # SinglePartition exchange must individually prove it carries
        # bounded model state (see _single_partition_ok).
        lines = p.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line and not _single_partition_ok(
                lines, i
            ):
                print(f"✗ {name}: data funnels through one task (line {i})")
                failures += 1
                break

    # incremental-index admission plans (the eager queries are excluded
    # from the generic loops above, so their operators get explicit
    # budgets here, built lazily without running an admission):
    # - dedup: band_rows_narrow folds the shingle array to signatures
    #   per row — a pure projection, ZERO shuffles (the r4/r5
    #   explode/distinct/groupBy path cost two corpus-sized exchanges
    #   per admitted batch)
    # - vectors: signature banding is a pure projection — zero shuffles
    from pyspark.sql import functions as F_

    from data_warehouse_project_spark.catalog import table as _cat_table
    from data_warehouse_project_spark.operators.dedup_index import (
        admission_candidates,
        band_rows_narrow,
        candidate_pairs,
    )
    from data_warehouse_project_spark.operators.incremental import merge_additive
    from data_warehouse_project_spark.operators.similarity import (
        VectorLSHIndex,
        band_rows_of,
    )

    docs = _cat_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _cat_table(spark, sf_dir, "embeddings")
    # lazy twins of the eager bench queries' constituent plans (the
    # eager queries RUN jobs at construction, so the generic loops skip
    # them; these are the same plan constructors the operators use):
    db = band_rows_narrow(docs.filter("doc_id % 2 = 0"))
    ds = band_rows_narrow(docs.filter("doc_id % 2 = 1"))
    vb = band_rows_of(emb)
    ev = _cat_table(spark, sf_dir, "events")
    rollup_delta = (
        ev.filter(F_.col("ts").isNotNull())
        .groupBy(F_.date_trunc("hour", F_.col("ts")).alias("bucket_ts"), "event_type")
        .agg(F_.count(F_.lit(1)).alias("n_events"))
    )
    for label, df, budget in (
        ("minhash_index_admission", band_rows_narrow(docs), 0),
        ("vector_index_admission", band_rows_of(emb), 0),
        # the one-shot LSH query localCheckpoints candidate generation
        # at construction, so SHUFFLE_BUDGET["dedup_minhash_lsh"] only
        # sees the verify stage — audit the heavy pre-checkpoint
        # self-join here on the LAZY plan (no jobs run): band shuffle
        # ×2 for the self-join; distinct reuses the join partitioning
        ("minhash_candidate_generation", candidate_pairs(band_rows_narrow(docs)), 2),
        # dedup_minhash_incremental's probe join (its only corpus-sized
        # shuffle): batch bands vs stored∪batch, canonicalized+distinct
        ("minhash_admission_probe", admission_candidates(db, db.unionByName(ds)), 3),
        # ann_lsh_incremental's fused probe: band equi-join + candidate
        # payload join + rerank window, built on a band frame (no store)
        (
            "vector_index_probe",
            VectorLSHIndex(None).topk(emb, bands=vb),
            6,
        ),
        # rollup_cascade_day's per-grain maintenance: one map-side-
        # combined rollup of the batch + the null-safe full-outer
        # additive merge into pruned state partitions. The merge twin
        # feeds rollup_delta on BOTH sides (production localCheckpoints
        # the delta, so its rollup exchange is paid once): 1 rollup per
        # side + the full-outer join shuffling both sides = 4.
        ("rollup_grain_delta", rollup_delta, 1),
        (
            "rollup_additive_merge",
            merge_additive(
                rollup_delta,
                rollup_delta,
                keys=["bucket_ts", "event_type"],
                sum_cols=("n_events",),
            ),
            4,
        ),
    ):
        got = (
            df._jdf.queryExecution().executedPlan().toString().count("Exchange ")
        )
        if got > budget:
            print(f"✗ {label}: {got} Exchange nodes (budget {budget})")
            failures += 1

    # ----- full-ETL write-plan audit (both SCD strategies, run + rerun) —
    # every frame the pipeline hands to a Warehouse writer is captured
    # (PLAN_CAPTURE) and held to ETL_WRITE_BUDGET; unknown write labels
    # fail, so a new stage cannot ship without declaring its ceiling.
    import shutil
    import tempfile

    from data_warehouse_project_spark.etl import run_full_etl
    from data_warehouse_project_spark.etl import warehouse as _wmod
    from data_warehouse_project_spark.sources import txtable as _txmod

    for strategy in ("snapshot", "merge", "tx"):
        # the tx strategy writes its SCD dims/fact through TxTable,
        # whose write hook mirrors the warehouse one — share the list
        _wmod.PLAN_CAPTURE = _txmod.PLAN_CAPTURE = []
        wh_root = tempfile.mkdtemp(prefix="audit_etl_")
        try:
            run_full_etl(spark, sf_dir, wh_root, scd_strategy=strategy)
            run_full_etl(spark, sf_dir, wh_root, scd_strategy=strategy)  # rerun
            captured = list(_wmod.PLAN_CAPTURE)
        finally:
            _wmod.PLAN_CAPTURE = _txmod.PLAN_CAPTURE = None
            shutil.rmtree(wh_root, ignore_errors=True)
        for wlabel, p in captured:
            budget = ETL_WRITE_BUDGET.get(wlabel)
            if budget is None:
                print(f"✗ etl[{strategy}] {wlabel}: write has no ETL_WRITE_BUDGET entry")
                failures += 1
                continue
            got = p.count("Exchange ")
            if got > budget:
                print(f"✗ etl[{strategy}] {wlabel}: {got} Exchange nodes (budget {budget})")
                failures += 1
            if "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p:
                # the watermark predicate is a broadcast of ONE scalar
                # row — anything else crossing is a regression
                if wlabel not in ("bl_dm/fct_sales", "bl_dm/fct_events"):
                    print(f"✗ etl[{strategy}] {wlabel}: unexpected cross join")
                    failures += 1
            if wlabel not in ETL_SINGLE_PARTITION_OK:
                lines = p.splitlines()
                for i, line in enumerate(lines):
                    if "Exchange SinglePartition" in line and not _single_partition_ok(
                        lines, i
                    ):
                        print(
                            f"✗ etl[{strategy}] {wlabel}: data funnels through one task"
                        )
                        failures += 1
                        break

    # column pruning: q1 must scan exactly its 2 aggregate columns
    p = plan_of("q1_fact_totals")
    if "ReadSchema: struct<l_quantity:double,l_extendedprice:double>" not in p:
        print("✗ q1_fact_totals: scan is not pruned to 2 columns")
        failures += 1

    print("explain audit:", "OK" if failures == 0 else f"{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if audit(sf) else 0)
