"""Multi-table atomic commits over transactional tables.

``sources/txtable.py`` gives ONE table ACID commits; the rollup
cascade's remaining gap (streaming/windows.py docstring) is that its
state is N grain tables whose swaps land independently — a reader (or
a crash) can observe hour merged but day not yet. The standard lakehouse
answer is a catalog-level commit log (Iceberg's catalog pointer /
Delta's multi-table transaction coordinators): readers resolve every
table through a CATALOG manifest that pins one committed version per
table, and a multi-table transaction becomes

  1. commit each table independently (data-level, each atomic);
  2. commit ONE catalog manifest pinning the new (table → version) map
     — a single ``os.link``, atomic, optimistically concurrent.

A crash after step 1 but before step 2 leaves the new table versions
committed-but-unpinned: catalog readers still resolve the OLD pins —
a consistent cross-table snapshot — and the replay re-runs the
transaction, where each per-table op is individually idempotent via a
table-scoped txn fence (``(app#table, batch_id)``), so already-landed
ops skip and the catalog pin lands once. Exactly-once across the whole
multi-table group, with zero residual window.

Scale shape: the catalog manifest is O(tables) — pure driver model
state; per-table costs are unchanged (append O(batch), merge/rewrite
O(touched files)). Catalog time travel gives consistent cross-table
snapshots for free (pin map per version).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_project_spark.sources.txtable import (
    TXLOG_DIR,
    TxConflictError,
    TxError,
    TxTable,
    TxVacuumedError,
    _mname,
    _V_WIDTH,
)

TABLES_DIR = "tables"


class TxCatalog:
    """A directory of transactional tables plus a catalog commit log
    pinning a consistent version of each.

    ``tables_base`` overrides where member tables live: by default they
    sit under ``<root>/tables/<name>``, but a catalog can also pin
    EXTERNAL tables (e.g. a warehouse's ``bl_3nf/ce_sales``) by rooting
    name resolution at another directory — the Iceberg-style split
    between the catalog pointer and the table locations. The base is a
    resolution rule of the handle, not catalog state: every opener must
    pass the same one (the warehouse does)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | Path,
        tables_base: str | Path | None = None,
    ):
        self.spark = spark
        self.root = Path(root)
        self.log_dir = self.root / TXLOG_DIR
        self.tables_dir = (
            Path(tables_base) if tables_base is not None else self.root / TABLES_DIR
        )
        if not self.log_dir.is_dir():
            raise TxError(f"not a transactional catalog (no {TXLOG_DIR}): {root}")

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str | Path,
        tables_base: str | Path | None = None,
    ) -> "TxCatalog":
        root = Path(root)
        if (root / TXLOG_DIR).exists():
            raise TxError(f"already a transactional catalog: {root}")
        root.mkdir(parents=True, exist_ok=True)
        (root / TXLOG_DIR).mkdir()
        if tables_base is None:
            (root / TABLES_DIR).mkdir(exist_ok=True)
        cat = cls(spark, root, tables_base)
        cat._commit(0, {}, {})
        return cat

    @classmethod
    def ensure(
        cls,
        spark: SparkSession,
        root: str | Path,
        tables_base: str | Path | None = None,
    ) -> "TxCatalog":
        """Open the catalog at ``root``, creating it if absent."""
        try:
            return cls(spark, root, tables_base)
        except TxError:
            return cls.create(spark, root, tables_base)

    # ------------------------------------------------------- manifests

    def _versions(self) -> list[int]:
        out = []
        for p in self.log_dir.iterdir():
            n = p.name
            if (
                n.startswith("v")
                and n.endswith(".json")
                and n[1 : 1 + _V_WIDTH].isdigit()
                and len(n) == 1 + _V_WIDTH + 5
            ):
                out.append(int(n[1 : 1 + _V_WIDTH]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self._versions()
        if not vs:
            raise TxError(f"no committed catalog version in {self.log_dir}")
        return vs[-1]

    def _manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        p = self.log_dir / _mname(v)
        if not p.exists():
            raise TxVacuumedError(f"catalog version {v} is not on disk")
        with open(p) as f:
            return json.load(f)

    def _commit(self, version: int, pins: dict, txns: dict) -> None:
        manifest = {
            "version": version,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "tables": pins,
            "txns": txns,
        }
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self.log_dir / _mname(version))
        except FileExistsError:
            raise TxConflictError(
                f"catalog version {version} was committed concurrently"
            ) from None
        finally:
            tmp.unlink(missing_ok=True)

    # ----------------------------------------------------------- reads

    def snapshot(self, version: int | None = None) -> dict:
        """(table name → pinned table version) at a catalog version."""
        return dict(self._manifest(version)["tables"])

    def table(self, name: str) -> TxTable:
        """Direct (UNPINNED) handle — latest table version, which may be
        ahead of the catalog pins mid-transaction."""
        return TxTable(self.spark, self.tables_dir / name)

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read ``name`` AT ITS CATALOG-PINNED version — the consistent
        cross-table snapshot. ``version`` time-travels the catalog."""
        pins = self.snapshot(version)
        if name not in pins:
            raise TxError(f"table {name!r} not in catalog snapshot")
        return self.table(name).read(pins[name])

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    # ---------------------------------------------------- transactions

    def transaction(self, txn: tuple[str, int] | None = None) -> "TxTransaction":
        return TxTransaction(self, txn)

    #: pin-commit claim retries (pins merge monotonically, so a lost
    #: race just re-reads and retries; bounded to fail loudly on bugs)
    _PIN_RETRIES = 20

    def pin(self, pins: dict, txn: tuple[str, int] | None = None) -> dict:
        """Atomically advance the catalog's (table → version) map with
        ``pins`` in ONE commit — the publish step for a writer that ran
        its per-table commits OUTSIDE a ``TxTransaction`` (e.g. the tx
        ETL pipeline, whose loaders commit as they go and publish the
        whole run here). Pins only ever advance (max-merge), so racing
        publishers converge; ``txn`` fences the publish exactly-once
        across crash replays."""
        for _ in range(self._PIN_RETRIES):
            m = self._manifest()
            txns = dict(m["txns"])
            if txn is not None:
                app, ver = txn
                if txns.get(app, -(1 << 62)) >= ver:
                    return {"skipped": True, "version": m["version"]}
                txns[app] = ver
            merged = dict(m["tables"])
            for name, v in pins.items():
                merged[name] = max(int(v), int(merged.get(name, -1)))
            try:
                self._commit(m["version"] + 1, merged, txns)
            except TxConflictError:
                continue
            return {"version": m["version"] + 1, "tables": dict(pins)}
        raise TxConflictError(
            f"catalog pin lost the commit race {self._PIN_RETRIES} times"
        )

    def restore(self, version: int) -> dict:
        """RESTORE the catalog to an earlier version: a NEW catalog
        commit re-pinning that version's (table → version) map — one
        atomic operation rewinds the consistent cross-table snapshot,
        without touching any member table's own log (their histories,
        fences and later versions stay intact; the pins just point
        earlier). History is preserved; the restored-from catalog
        manifest must still be on disk, and every pinned table version
        must not have been vacuumed past."""
        pins = self.snapshot(version)
        m = self._manifest()
        for name, tv in pins.items():
            self.table(name)._manifest(tv)  # raises TxVacuumedError if gone
        self._commit(m["version"] + 1, pins, m.get("txns", {}))
        return {
            "version": m["version"] + 1,
            "restored_from": version,
            "tables": pins,
        }

    def vacuum(
        self,
        retain_versions: int = 2,
        min_age_s: float = TxTable.VACUUM_MIN_AGE_S,
        force: bool = False,
    ) -> dict:
        """Catalog-aware space reclaim: drop catalog manifests beyond
        the horizon, then vacuum each member table keeping every table
        version still pinned by a RETAINED catalog manifest (plus the
        table's own latest). ``min_age_s``/``force`` follow
        ``TxTable.vacuum``'s concurrent-writer safety contract."""
        if retain_versions < 1:
            raise TxError("retain_versions must be >= 1")
        vs = self._versions()
        for v in vs[:-retain_versions]:
            (self.log_dir / _mname(v)).unlink(missing_ok=True)
        pinned: dict[str, int] = {}  # table → MIN pinned version
        for v in vs[-retain_versions:]:
            for name, tv in self._manifest(v)["tables"].items():
                pinned[name] = min(pinned.get(name, tv), tv)
        out = {}
        for name, min_tv in pinned.items():
            t = self.table(name)
            keep = t.latest_version() - min_tv + 1
            out[name] = t.vacuum(
                retain_versions=max(keep, 1), min_age_s=min_age_s, force=force
            )
        return out


class TxTransaction:
    """Collects per-table operations and pins their resulting versions
    in one atomic catalog commit. Use as a context manager::

        with catalog.transaction(txn=(app, batch_id)) as tx:
            tx.append("rollup_hour", hour_delta)
            tx.merge("rollup_day", day_delta)

    Each per-table op runs (and commits on its table) IMMEDIATELY, with
    a table-scoped idempotence fence derived from ``txn`` — so a crash
    replay re-enters the transaction and already-landed ops skip. The
    catalog pin commit happens on clean ``__exit__`` (or ``commit()``),
    also fenced: a fully-replayed transaction is a no-op. On exception
    nothing is pinned; catalog readers never saw the partial state.
    """

    def __init__(self, catalog: TxCatalog, txn: tuple[str, int] | None):
        self.catalog = catalog
        self.txn = txn
        self._pins: dict[str, int] = {}
        self._done = False

    # -------------------------------------------------------- plumbing

    def __enter__(self) -> "TxTransaction":
        m = self.catalog._manifest()
        if self.txn is not None:
            app, ver = self.txn
            if m["txns"].get(app, -(1 << 62)) >= ver:
                self._done = True  # fully-replayed transaction
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.commit()

    def _table_txn(self, name: str) -> tuple[str, int] | None:
        if self.txn is None:
            return None
        app, ver = self.txn
        return (f"{app}#{name}", ver)

    def _ensure(self, name: str, like: DataFrame, key: str | None) -> TxTable:
        root = self.catalog.tables_dir / name
        try:
            return TxTable(self.catalog.spark, root)
        except TxError:
            return TxTable.create(self.catalog.spark, root, like.limit(0), key=key)

    # ------------------------------------------------------ operations

    def _pin(self, name: str, t: TxTable, r: dict) -> None:
        """Pin the version THIS op committed, never latest_version():
        a concurrent writer landing in between would otherwise get its
        foreign commit pinned as part of this transaction's snapshot.
        On a FENCED SKIP the op's return also carries the latest table
        version at skip time (same hazard), so resolve the version the
        fence actually committed at from the table's manifest history
        instead."""
        if r.get("skipped") and self.txn is not None:
            app, ver = self._table_txn(name)
            v = t.txn_commit_version(app, ver)
        else:
            v = int(r["version"])
        self._pins[name] = max(self._pins.get(name, -1), v)

    def append(self, name: str, df: DataFrame, key: str | None = None) -> dict:
        if self._done:
            return {"skipped": True}
        t = self._ensure(name, df, key)
        r = t.append(df, txn=self._table_txn(name))
        self._pin(name, t, r)
        return r

    def merge(self, name: str, source: DataFrame, key: str | None = None, **kw) -> dict:
        if self._done:
            return {"skipped": True}
        t = self._ensure(name, source, key)
        r = t.merge(source, txn=self._table_txn(name), **kw)
        self._pin(name, t, r)
        return r

    def rewrite_by_keys(
        self, name: str, keys: DataFrame, transform, like: DataFrame | None = None,
        key: str | None = None,
    ) -> dict:
        """Key-pruned copy-on-write inside the transaction, fenced in
        the SAME table commit as the rewritten files — safe for
        NON-idempotent transforms (additive rollup deltas). ``like``/
        ``key`` create the table on first use (empty, schema of
        ``like``), mirroring append/merge."""
        if self._done:
            return {"skipped": True}
        t = (
            self._ensure(name, like, key)
            if like is not None
            else self.catalog.table(name)
        )
        r = t.rewrite_by_keys(keys, transform, txn=self._table_txn(name))
        self._pin(name, t, r)
        return r

    def commit(self) -> dict:
        if self._done:
            return {"skipped": True}
        m = self.catalog._manifest()
        pins = dict(m["tables"])
        pins.update(self._pins)
        txns = dict(m["txns"])
        if self.txn is not None:
            app, ver = self.txn
            if txns.get(app, -(1 << 62)) >= ver:
                self._done = True
                return {"skipped": True}
            txns[app] = ver
        self.catalog._commit(m["version"] + 1, pins, txns)
        self._done = True
        return {"version": m["version"] + 1, "tables": dict(self._pins)}
