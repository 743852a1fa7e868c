"""Exactly-once streaming sink into a transactional table.

The plain-parquet fenced sinks (``streaming/windows.py
streaming_rollup_cascade``, ``streaming/corpus.py neardup_ingest``)
each carry a documented residual window: data lands in one or more
table swaps and the batch-id fence lands in a LATER write, so a crash
between them replays a batch whose effects partially committed. Their
docstrings state the fix precisely — "closing it needs a transactional
table format, not a different algorithm." This module is that fix: with
``sources/txtable.py`` the fence (the Delta txnAppId/txnVersion map)
rides the SAME atomic manifest commit as the data files, so a batch is
either fully visible WITH its fence advanced, or neither. No residual
window at all — crash replay is detected by the fence inside the
commit protocol itself (a duplicate concurrent commit loses the
``os.link`` race, re-reads the manifest, and skips).

Incarnation scoping follows the cascade sink exactly: batch ids are
only meaningful relative to one checkpoint incarnation, so the fence
app-id is the streaming query id read from the checkpoint's own
``metadata`` file — clearing a checkpoint mints a new query id (full
replay becomes an idempotent recompute via merge mode, or an
intentional re-ingest via append mode), while a respelled path to the
same checkpoint keeps the same id.

Scale shape: per trigger, append mode is O(micro-batch) — new files +
one manifest link, no read of existing data; merge mode reads only the
data files whose footer key range intersects the batch's keys
(copy-on-write pruning), so a trickle of late upserts into a 100 TB
key-clustered table touches a sliver per trigger.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame

from data_warehouse_project_spark.sources.txtable import TxError, TxTable


def _incarnation(checkpoint_dir: str) -> str:
    """The streaming query id from the checkpoint's metadata file —
    written at stream start, regenerated when the checkpoint is
    cleared, identical however the path is spelled. Path-hash fallback
    only for checkpoint filesystems this process can't read."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as fh:
            return json.loads(fh.read())["id"][:8]
    except (OSError, KeyError, ValueError):
        return hashlib.md5(
            os.path.abspath(checkpoint_dir).encode()
        ).hexdigest()[:8]


def _resolve_view(spark, root):
    from data_warehouse_project_spark.sources.txjoinview import TxJoinAggView
    from data_warehouse_project_spark.sources.txview import TxAggView

    for cls in (TxAggView, TxJoinAggView):
        try:
            return cls(spark, root)
        except TxError:
            continue
    raise TxError(f"maintain: not a TxAggView/TxJoinAggView root: {root}")


def txtable_ingest(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    mode: str = "append",
    key: str | None = None,
    available_now: bool = True,
    merge_mode: str = "rewrite",
    maintain: list | None = None,
    maintain_mode: str = "incremental",
    publish: dict | None = None,
):
    """Start a ``foreachBatch`` stream writing every micro-batch into
    the transactional table at ``table_root`` with exactly-once
    semantics.

    ``mode="append"``: each batch's rows are appended once, even across
    crash replays (fence inside the commit).
    ``mode="merge"``: each batch upserts by ``key`` (last write per key
    wins within the stream's order) — requires ``key``; batches must
    not contain duplicate keys (merge's in-plan source contract).
    ``merge_mode="dv"`` switches the upsert to merge-on-read (deletion
    vectors + appends): per-trigger write cost O(batch), independent of
    how many cold rows share files with the batch's keys — the steady-
    state CDC shape; schedule ``compact()`` to re-materialize on the
    table owner's cadence.

    The table is created on the first trigger if absent — as an EMPTY
    table followed by a fenced append/merge, so a crash between
    creation and the first data commit replays into the fenced path
    instead of duplicating version 0's rows.

    ``publish`` (requires ``maintain``) rides a gold-only
    ``Warehouse.catalog_publish`` after each trigger's refreshes:
    ``{"root": <warehouse root>, "database": ..., "location": ...}`` —
    the metastore/DuckDB surface then tracks the streamed gold state
    with no manual publish step (the reference's BI reads live
    ``bl_dm.*``). Publish cost is aggregate-scale (the gold views'
    logical rows), idempotent per view version, with the built-in
    two-version retention window.

    ``maintain`` lists aggregate-view roots (``TxAggView`` /
    ``TxJoinAggView``, resolved per trigger) refreshed INSIDE the same
    micro-batch, right after the fenced write — continuously-maintained
    gold under streaming ingest. Every crash interleaving converges:
    refresh is idempotent against the base version cursor, so a replay
    whose append fence-skips either no-ops the refresh (it already
    folded) or folds the pending window now. The views must exist
    before the stream starts (create them from the table, then attach);
    a non-view root fails the trigger loudly. ``maintain_mode``
    defaults to the O(churn) incremental fold — per-trigger cost
    O(batch + touched groups), independent of table history.
    """
    if mode not in ("append", "merge"):
        raise ValueError(f"txtable_ingest: mode {mode!r}")
    if mode == "merge" and key is None:
        raise ValueError("txtable_ingest: merge mode requires key=...")
    if merge_mode not in ("rewrite", "dv"):
        raise ValueError(f"txtable_ingest: merge_mode {merge_mode!r}")
    if maintain_mode not in ("incremental", "recompute", "auto"):
        raise ValueError(f"txtable_ingest: maintain_mode {maintain_mode!r}")
    if publish is not None and ("root" not in publish or not maintain):
        raise ValueError(
            "txtable_ingest: publish requires maintain=[...] and a "
            "'root' key (the warehouse root owning the gold views)"
        )
    app: list[str] = []  # resolved on the first trigger

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if not app:
            app.append(f"stream-{_incarnation(checkpoint_dir)}")
        spark = batch_df.sparkSession
        try:
            t = TxTable(spark, table_root)
        except TxError:
            TxTable.create(spark, table_root, batch_df.limit(0), key=key)
            t = TxTable(spark, table_root)
        txn = (app[0], batch_id)
        if mode == "append":
            t.append(batch_df, txn=txn)
        else:
            t.merge(batch_df, txn=txn, mode=merge_mode)
        if maintain:
            from data_warehouse_project_spark.sources.txview import (
                ChurnCache,
            )

            sweep = ChurnCache()  # one shared churn read per trigger
            for vroot in maintain:
                _resolve_view(spark, vroot).refresh(
                    mode=maintain_mode, cache=sweep
                )
        if publish is not None:
            from data_warehouse_project_spark.etl.warehouse import Warehouse

            p = dict(publish)
            Warehouse(spark, p.pop("root")).catalog_publish(
                gold_only=True, **p
            )

    writer = stream_df.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def txcascade_ingest(
    stream_events: DataFrame,
    catalog_root: str,
    checkpoint_dir: str,
    ts_col: str,
    dims,
    measures,
    grains=("hour", "day", "month"),
    prefix: str = "rollup",
    available_now: bool = True,
):
    """The TRANSACTIONAL twin of ``streaming/windows.cascade_ingest``:
    the same hypertable-style continuous-aggregate cascade (batch rolls
    up once at the finest grain, every coarser grain merges the FINER
    grain's delta), but each grain lives in a ``TxTable`` inside one
    ``TxCatalog``, and every micro-batch lands as ONE multi-table
    transaction:

    - per grain, the additive merge runs through ``rewrite_by_keys``
      with a table-scoped txn fence — data files AND fence in one
      atomic table commit, so a crash replay can never double-apply a
      grain's delta (the plain-parquet cascade's documented residual
      window, closed);
    - the catalog pin commit makes all grains visible TOGETHER:
      ``catalog.read("rollup_day")``/``("rollup_hour")`` always come
      from the same batch boundary, even mid-crash. The plain sink
      could never offer that — its grains swap independently.

    Pruning: grain tables are keyed by ``bucket_us`` (epoch micros of
    the bucket), so the rewrite touches only files whose key range
    intersects the batch's buckets — O(delta + touched stripes) per
    trigger, independent of table history; ``compact(cluster=True)``
    keeps stripes disjoint as they accumulate. ``measures`` follows
    ``rollup_cascade``'s contract (additive SUM/COUNT shapes over raw
    rows; coarser grains re-sum by name; NULL ``ts_col`` rows are
    excluded). ``grains`` finest → coarsest.
    """
    from pyspark.sql import functions as F

    from data_warehouse_project_spark.sources.txcatalog import TxCatalog
    from data_warehouse_project_spark.sources.txtable import TxError

    names = list(measures)
    app: list[str] = []

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if not app:
            app.append(f"cascade-{_incarnation(checkpoint_dir)}")
        spark = batch_df.sparkSession
        try:
            cat = TxCatalog(spark, catalog_root)
        except TxError:
            cat = TxCatalog.create(spark, catalog_root)
        delta = (
            batch_df.filter(F.col(ts_col).isNotNull())
            .groupBy(
                F.date_trunc(grains[0], F.col(ts_col)).alias("bucket_ts"), *dims
            )
            .agg(*[expr.alias(name) for name, expr in measures.items()])
            .withColumn("bucket_us", F.unix_micros("bucket_ts"))
            .localCheckpoint(eager=False)
        )
        with cat.transaction(txn=(app[0], batch_id)) as tx:
            for grain in grains:
                if grain != grains[0]:
                    # coarser grain: re-bucket the FINER grain's delta
                    delta = (
                        delta.groupBy(
                            F.date_trunc(grain, F.col("bucket_ts")).alias(
                                "bucket_ts"
                            ),
                            *dims,
                        )
                        .agg(*[F.sum(n).alias(n) for n in names])
                        .withColumn("bucket_us", F.unix_micros("bucket_ts"))
                        .localCheckpoint(eager=False)
                    )
                d = delta

                def merge_additive(cur: DataFrame, d=d) -> DataFrame:
                    return (
                        cur.unionByName(d.select(*cur.columns))
                        .groupBy("bucket_us", "bucket_ts", *dims)
                        .agg(*[F.sum(n).alias(n) for n in names])
                    )

                tx.rewrite_by_keys(
                    f"{prefix}_{grain}",
                    d.select("bucket_us"),
                    merge_additive,
                    like=d,
                    key="bucket_us",
                )

    writer = stream_events.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
