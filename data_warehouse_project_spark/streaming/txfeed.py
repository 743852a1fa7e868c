"""Change data feed as a rate-limited incremental SOURCE.

``TxTable.read_changes`` is a batch surface: give it a version range,
get the change rows. This module turns it into the other half of a
streaming pipeline — a resumable, rate-limited consumer whose progress
fence rides the SINK's own commit log, so a tx → tx cascade runs
exactly-once end to end without any external offset store (the same
place Structured Streaming keeps its offsets is here the sink's
manifest ``txns`` map: data and progress commit atomically).

This is the lakehouse CDC-cascade shape (Delta's
``readStream.option("readChangeFeed", ...)`` feeding a downstream
table): a silver table maintains itself from bronze's churn — inserts,
updates AND deletes — at O(churn) per batch instead of recomputing from
raw appends. ``TxAggView`` is the aggregate consumer of the same feed;
``replicate_changes`` is the row-level one.

Delivery semantics per micro-batch:

  1. read ``read_changes(fence+1, upto)`` where ``upto`` honors
     ``max_versions_per_batch`` (the rate limit — bounds memory and
     latency per trigger exactly like ``maxFilesPerTrigger``);
  2. fold the batch into the sink with ``rewrite_by_keys`` — a
     multiset apply (slice ∖ deletes+preimages ∪ inserts+postimages)
     over ONLY the files whose key range intersects the batch's keys;
  3. the fence ``(app, upto)`` commits in the SAME manifest — a crash
     anywhere replays the batch, and the fence skips it.

Scale shape: per batch O(churn + touched sink files); the cascade
never rescans either table. ``vacuum`` on the source must retain at
least the consumer's lag (``read_changes`` raises TxVacuumedError
otherwise — loud, never silently lossy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxError, TxTable

_META = ("_change_type", "_commit_version", "_commit_ts")


def _plan_batches(applied: int, latest: int, rate: int | None):
    """Version ranges [(start, upto), ...] covering (applied, latest],
    each at most ``rate`` versions wide (rate=None → one batch)."""
    out = []
    v = applied
    while v < latest:
        upto = latest if rate is None else min(v + rate, latest)
        out.append((v + 1, upto))
        v = upto
    return out


def replicate_changes(
    spark: SparkSession,
    source_root: str,
    sink_root: str,
    app: str,
    columns: list[str] | None = None,
    where: str | None = None,
    max_versions_per_batch: int | None = None,
    max_batches: int | None = None,
) -> dict:
    """Advance the replica at ``sink_root`` from the source's change
    feed. Processes every pending source version (bounded by
    ``max_batches`` — the test hook for mid-stream crashes) in
    rate-limited micro-batches, each exactly-once.

    ``columns`` projects the replica (must keep the source's merge
    key); ``where`` filters it (SQL predicate over the projected
    columns — rows entering/leaving the predicate are handled by the
    feed's insert/delete rows themselves, and projection/filter commute
    with the multiset replay invariant). The replica is created on
    first call (empty, fenced from version -1, so the feed replays the
    source's full history — batch 1 delivers the v0 create as inserts).

    Returns {"batches": n, "consumed_to": v, "skipped": bool}.
    """
    src = TxTable(spark, source_root)
    key = src._manifest()["key"]
    if key is None:
        raise TxError("replicate_changes needs a source created with key=...")
    cols = columns or src.columns()  # full projection by default
    if key not in cols:
        raise TxError(f"columns must keep the source key {key!r}")
    try:
        sink = TxTable(spark, sink_root)
    except TxError:
        shell = src.read().select(*cols).limit(0)
        if where is not None:
            shell = shell.filter(F.expr(where))
        sink = TxTable.create(spark, sink_root, shell, key=key)

    applied = sink.txn_version(app)
    applied = -1 if applied is None else applied
    latest = src.latest_version()
    batches = _plan_batches(applied, latest, max_versions_per_batch)
    if max_batches is not None:
        batches = batches[:max_batches]
    done = 0
    consumed_to = applied
    for start, upto in batches:
        ch = src.read_changes(max(start, 0), upto).select(*cols, *_META)
        if where is not None:
            ch = ch.filter(F.expr(where))
        ch = ch.localCheckpoint(eager=False)
        minus = ch.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(*cols)
        plus = ch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(*cols)

        def apply_batch(cur: DataFrame, minus=minus, plus=plus) -> DataFrame:
            # multiset replay: (cur ⊎ inserts) ∖ deletes — the union
            # MUST precede the subtraction, or a row inserted and then
            # deleted inside one multi-version batch survives (its
            # delete finds nothing to cancel in cur)
            return cur.select(*cols).unionByName(plus).exceptAll(minus)

        r = sink.rewrite_by_keys(
            ch.select(key), apply_batch, txn=(app, upto)
        )
        done += 0 if r.get("skipped") else 1
        consumed_to = upto
    return {
        "batches": done,
        "consumed_to": consumed_to,
        "skipped": done == 0 and bool(batches),
        "pending": len(_plan_batches(consumed_to, src.latest_version(),
                                     max_versions_per_batch)),
    }


SCD2_COLS = ("_scd_start_v", "_scd_start_ts", "_scd_end_v", "_scd_end_ts")


def scd2_apply_changes(
    spark: SparkSession,
    source_root: str,
    sink_root: str,
    app: str,
    max_versions_per_batch: int | None = None,
    max_batches: int | None = None,
) -> dict:
    """Maintain a Type-2 HISTORY table from the source's change feed —
    the lakehouse ``APPLY CHANGES`` shape (Delta Live Tables' SCD2 /
    the reference's expire-and-insert procedure,
    load_3nf_ce_products_scd_table_type2.sql:59-248, re-expressed as a
    CDC consumer instead of a snapshot diff).

    Every source row version becomes one history row carrying its
    validity interval in BASE COMMIT coordinates: ``_scd_start_v`` /
    ``_scd_start_ts`` (the commit that created it) and nullable
    ``_scd_end_v`` / ``_scd_end_ts`` (the commit that replaced or
    deleted it; NULL = current). No 9999-12-31 sentinel anywhere — the
    open end is a SQL NULL, so Arrow/pandas consumers never overflow
    (the r1 driver-harness lesson, plans/scd.py:150).

    Per micro-batch (rate-limited like ``replicate_changes``): a CDF
    close event (delete / update_preimage) carries the exact row it
    removed, so closes pair FIFO with the oldest still-open history
    row of the IDENTICAL column tuple — sink current rows first, then
    this batch's opens, ranked per full-tuple partition. An update's
    preimage equals the row it replaces (the unique-key case pairs
    exactly as a per-key ordering would), while duplicate-key parallel
    rows close ONE per close event: a partial delete of one copy
    leaves the other current, a full-key delete emits one close per
    copy and closes them all. A close with no matching open (or one
    pairing an open that starts after it) raises in-plan — feed
    desync, never silent. One ``rewrite_by_keys`` per batch: O(churn +
    touched history files), fenced ``(app, upto)`` — crash replay
    applies exactly once.

    The invariant the tests pin, for EVERY base version v:
    ``rows where _scd_start_v <= v < coalesce(_scd_end_v, inf)`` ==
    ``source.read(version=v)`` — the history table IS the time-travel
    index, queryable without the source's retained manifests (vacuum
    the source freely; history keeps the full lineage).

    Assumes the source key is unique per snapshot (the same contract
    MERGE enforces); duplicate-key appends degrade to parallel current
    rows, exactly mirroring the duplicate in the base."""
    from pyspark.sql import Window

    src = TxTable(spark, source_root)
    key = src._manifest()["key"]
    if key is None:
        raise TxError("scd2_apply_changes needs a source created with key=...")
    cols = src.columns()
    try:
        sink = TxTable(spark, sink_root)
    except TxError:
        shell = (
            src.read()
            .limit(0)
            .select(
                *cols,
                F.lit(None).cast("bigint").alias("_scd_start_v"),
                F.lit(None).cast("timestamp").alias("_scd_start_ts"),
                F.lit(None).cast("bigint").alias("_scd_end_v"),
                F.lit(None).cast("timestamp").alias("_scd_end_ts"),
            )
        )
        sink = TxTable.create(spark, sink_root, shell, key=key)

    applied = sink.txn_version(app)
    applied = -1 if applied is None else applied
    latest = src.latest_version()
    batches = _plan_batches(applied, latest, max_versions_per_batch)
    if max_batches is not None:
        batches = batches[:max_batches]
    done = 0
    consumed_to = applied
    for start, upto in batches:
        ch = src.read_changes(max(start, 0), upto)
        ev = ch.select(
            *cols,
            F.col("_commit_version").alias("__v"),
            F.col("_commit_ts").alias("__ts"),
            F.col("_change_type")
            .isin("insert", "update_postimage")
            .alias("__open"),
        ).localCheckpoint(eager=False)

        # MULTISET-EXACT close pairing (r11, hardening the r10 ADVICE
        # fix): a CDF close event (delete / update_preimage) carries the
        # exact row it removed, so each close pairs FIFO with the
        # OLDEST still-open history row holding the IDENTICAL column
        # tuple — per (all columns) partition, closes ranked by version
        # pair with opens ranked by start version. Duplicate-key
        # parallel rows therefore close ONE per close event (a partial
        # delete of one copy leaves the other current), while
        # well-formed unique-key streams pair exactly as before (an
        # update's preimage tuple equals the row it replaces). Two
        # in-plan guards catch feed desync: a close with no matching
        # open, and a close pairing an open that starts after it.
        w_open = Window.partitionBy(*cols).orderBy("_scd_start_v")
        w_close = Window.partitionBy(*cols).orderBy("__v")
        batch_opens = ev.filter(F.col("__open")).select(
            *cols,
            F.col("__v").alias("_scd_start_v"),
            F.col("__ts").alias("_scd_start_ts"),
        )
        closes = (
            ev.filter(~F.col("__open"))
            .select(*cols, F.col("__v").alias("__cv"),
                    F.col("__ts").alias("__cts"))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy(*cols).orderBy("__cv")))
        )

        def apply_batch(
            cur: DataFrame, batch_opens=batch_opens, closes=closes
        ):
            # history rows already closed pass through untouched; the
            # slice's CURRENT rows join this batch's opens as one
            # FIFO-ordered open stream (sink rows start strictly before
            # every batch event — earlier batches ended at start-1)
            done = cur.filter(F.col("_scd_end_v").isNotNull())
            open_stream = (
                cur.filter(F.col("_scd_end_v").isNull())
                .select(*cols, "_scd_start_v", "_scd_start_ts")
                .unionByName(batch_opens)
                .withColumn("__rn", F.row_number().over(w_open))
            )
            cond = F.col("o.__rn") == F.col("c.__rn")
            for c in cols:
                cond = cond & F.col(f"o.{c}").eqNullSafe(F.col(f"c.{c}"))
            paired = open_stream.alias("o").join(
                closes.alias("c"), cond, "full_outer"
            )
            desync = F.raise_error(
                F.lit(
                    "scd2_apply_changes: close event with no matching "
                    "open row — sink out of sync with the source feed"
                )
            )
            end_v = (
                F.when(F.col("o._scd_start_v").isNull(),
                       desync.cast("bigint"))
                .when(
                    F.col("c.__cv") < F.col("o._scd_start_v"),
                    desync.cast("bigint"),
                )
                .otherwise(F.col("c.__cv"))
            )
            return done.unionByName(
                paired.select(
                    *[F.col(f"o.{c}").alias(c) for c in cols],
                    F.col("o._scd_start_v").alias("_scd_start_v"),
                    F.col("o._scd_start_ts").alias("_scd_start_ts"),
                    end_v.alias("_scd_end_v"),
                    F.col("c.__cts").alias("_scd_end_ts"),
                )
            )

        r = sink.rewrite_by_keys(ev.select(key), apply_batch, txn=(app, upto))
        done += 0 if r.get("skipped") else 1
        consumed_to = upto
    return {
        "batches": done,
        "consumed_to": consumed_to,
        "skipped": done == 0 and bool(batches),
        "pending": len(
            _plan_batches(consumed_to, src.latest_version(),
                          max_versions_per_batch)
        ),
    }
