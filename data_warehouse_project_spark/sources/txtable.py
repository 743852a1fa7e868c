"""Transactional parquet table — a self-contained commit-log format
giving the warehouse file-level ACID semantics on plain parquet.

The reference gets atomicity from Postgres transactions (every loader
runs in one; readme.md "transactional load" + the ON CONFLICT upserts in
load_3nf_ce_customers_scd_table_type1.sql:101-144). The repo's
``Warehouse`` already provides whole-table atomic swap (snapshot path)
and partition-scoped swap (bucketed merge path); ``operators/merge.py``
documents Delta/Iceberg MERGE INTO as the managed-format upgrade with
*file-level* granularity. No such package exists offline, so this module
implements the core of that upgrade from first principles — the same
log-structured design Delta Lake describes publicly (Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020):

- ``<root>/_txlog/v<20-digit>.json`` — one immutable manifest per
  version, each the FULL file list (O(files) metadata; ~100k files is
  a few MB — driver model state, never row data);
- commit = write a temp manifest, then atomically claim the next
  version number with ``os.link`` (fails with EEXIST if a concurrent
  writer won — optimistic concurrency, the loser gets
  ``TxConflictError`` and re-runs from the new snapshot; blind appends
  auto-retry since they depend on no snapshot);
- readers pin a version: a read is "list the manifest's files, hand
  them to ``spark.read.parquet``" — they see a complete commit or the
  previous one, never a partial write, and any version not yet
  vacuumed is time-travel readable;
- writes are COPY-ON-WRITE at file granularity: MERGE/DELETE/UPDATE
  rewrite only the data files that can contain affected keys, carrying
  every other file into the new manifest untouched. Touched-file
  discovery uses per-file key min/max recorded at write time from
  parquet footer statistics (INT32/INT64 physical only — the same
  exactness contract as ``Warehouse.footer_max``; string stats may be
  truncated bounds). Files without usable stats are conservatively
  treated as touched.

Crash safety: data files land under ``data/`` BEFORE the manifest that
references them is linked, so a crash at any point leaves either the
old table (orphan data files + a dangling temp manifest, both invisible
to readers and reaped by ``vacuum``) or the new one — never a torn
state. There is no rename-the-directory window at all.

100 TB shape: everything per-row is a Spark job over only the touched
files; the driver holds manifests (O(files)) and file-range pruning
joins run against a broadcast frame of file stats (O(files) rows).
A MERGE that updates 0.1%% of keys clustered in 0.1%% of files reads
and rewrites ~0.1%% of the table — the property the snapshot path lacks
and the reason Delta-style layouts win at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from data_warehouse_project_spark.localframe import local_rows

TXLOG_DIR = "_txlog"
DATA_DIR = "data"
BLOOMS_DIR = "blooms"  # per-write-batch bloom-filter sidecar dirs
_BLOOM_SIDE = "_bloom.json"  # table-level bloom config (cols, params)
#: position space the double-hash scheme maps into before masking down
#: to a file's own 2^j bitmap — a power of two, so the mask keeps the
#: distribution uniform and writer/prober agree bit-for-bit
_BLOOM_SPACE = 1 << 30
_BLOOM_SALT = -6700417  # second-hash seed column (any fixed long)

#: above this many TOUCHED files a dv delete's per-file sidecar merge
#: stops looping on the driver (read+concat+write per file — fine for
#: the ≤32-file local case, 10⁵-10⁶ serialized tiny IOs for a
#: hash-spread delete at 100 TB; guide §5: the driver does no data
#: work) and runs as ONE distributed repartition-by-file job whose
#: outputs the driver only renames. Env-tunable for cluster profiles.
DV_DRIVER_MERGE_MAX = int(
    os.environ.get("SPARK_GRAFT_DV_DRIVER_MERGE_MAX", 1024)
)
_V_WIDTH = 20

# explain-audit hook, mirroring etl.warehouse.PLAN_CAPTURE: when set to
# a list, every data-file write records ("<parent>/<table>",
# executed-plan string) so tools/explain_audit.py can budget the tx
# pipeline's write plans through the same mechanism as the plain
# warehouse sinks. None (the default) is zero-overhead.
PLAN_CAPTURE: list[tuple[str, str]] | None = None


def _capture_plan(df: DataFrame, label: str) -> None:
    if PLAN_CAPTURE is not None:
        PLAN_CAPTURE.append(
            (label, df._jdf.queryExecution().executedPlan().toString())
        )

# commit claim retries for operations with no snapshot dependency
# (appends): bounded so a livelock bug fails loudly instead of spinning
_APPEND_RETRIES = 20


class TxError(RuntimeError):
    """Base class for transactional-table errors."""


class TxConflictError(TxError):
    """A concurrent writer committed between this operation's snapshot
    and its commit attempt. Re-run the operation from the new snapshot
    (the table on disk is untouched by the failed attempt)."""


class TxVacuumedError(TxError):
    """The requested version's manifest exists no longer (vacuumed)."""


class ClaimOutcomeUnknown(TxError):
    """A commit claim's outcome could not be observed (e.g. an object
    store timed out AFTER accepting the conditional PUT). ``_commit``
    recovers by reading back the claimed manifest and comparing commit
    ids — never by assuming either outcome."""


def _link_claim(tmp: Path, target: Path) -> bool:
    """Default commit-claim primitive: POSIX hard link, which is atomic
    and FAILS if the target exists (unlike rename, which silently
    overwrites). Exactly one writer can claim a version number.

    Object-store mapping (what a real deployment injects instead):
      - S3: ``PutObject`` with ``If-None-Match: *`` — True on 200,
        False on 412 Precondition Failed, raise ``ClaimOutcomeUnknown``
        on timeout/5xx (the PUT may have landed);
      - GCS: ``x-goog-if-generation-match: 0`` — same three-way contract.
    The claim must be atomic put-if-absent of the FULL manifest bytes;
    eventual-consistency listings are fine (readers re-probe by name).
    """
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False


def _mname(version: int) -> str:
    return f"v{version:0{_V_WIDTH}d}.json"


def _bloom_positions(h1, h2, k: int, m_bits: int):
    """The k bit positions of each hashed value, Kirsch–Mitzenmacher
    double hashing: pos_i = (h1 + i*h2) masked into the power-of-two
    position space, then down to the file's own 2^j bitmap. ONE shared
    function for the build and probe sides — membership has no false
    negatives by construction. h1/h2 are Spark ``xxhash64`` outputs
    (signed int64); arithmetic wraps in uint64, identically everywhere
    numpy runs."""
    import numpy as np

    h1u = np.ascontiguousarray(h1, dtype=np.int64).view(np.uint64)
    h2u = np.ascontiguousarray(h2, dtype=np.int64).view(np.uint64)
    ks = np.arange(k, dtype=np.uint64)
    pos = (h1u[:, None] + ks[None, :] * h2u[:, None]) & np.uint64(
        _BLOOM_SPACE - 1
    )
    return (pos & np.uint64(m_bits - 1)).astype(np.int64)


def _bloom_builder(bits_per_key: int, k: int, max_m_bits: int):
    """applyInPandas group function: one (file, column) group of
    xxhash64 pairs in, ONE bitmap row out — the bitmap is built on the
    EXECUTOR, so sidecar bits never pass through the driver no matter
    how many files a write lands. The bitmap is sized from the group's
    row count (next power of two of rows*bits_per_key, floored at 1 Kib
    and capped at ``max_m_bits``)."""

    def build(pdf):
        import numpy as np
        import pandas as pd

        n = max(1, len(pdf))
        m_bits = 1 << max(10, int(np.ceil(np.log2(n * bits_per_key))))
        m_bits = min(m_bits, max_m_bits)
        pos = _bloom_positions(
            pdf["__h1"].to_numpy(dtype=np.int64),
            pdf["__h2"].to_numpy(dtype=np.int64),
            k,
            m_bits,
        ).ravel()
        buf = np.zeros(m_bits >> 3, dtype=np.uint8)
        np.bitwise_or.at(
            buf, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
        )
        return pd.DataFrame(
            {
                "f": [pdf["__f"].iloc[0]],
                "c": [pdf["__c"].iloc[0]],
                "m": [int(m_bits)],
                "k": [int(k)],
                "bits": [buf.tobytes()],
            }
        )

    return build


class TxTable:
    """Handle to one transactional table rooted at ``root``.

    The handle is stateless between calls — every operation re-reads
    the latest manifest, so multiple handles (or processes) over the
    same root coordinate purely through the commit log.
    """

    #: a dv sidecar reaching this fraction of its data file's rows gets
    #: FOLDED (file rewritten without the deleted rows, vector dropped)
    #: by the same commit that would have grown it — Delta-style
    #: auto-compaction keeping merge-on-read read cost bounded under
    #: trickle CDC. 0.5 pinned by A/B (COVERAGE.md round 9; 30 clustered
    #: dv merges into a 200k-row/16-file table): vs never-fold it cut
    #: BOTH the write loop (37.2s vs 43.0s — dense vectors slow the
    #: pre-merge position scans too) and the steady-state full read
    #: (0.483s vs 0.596s); 0.25 over-folds (45.7s writes) for no read
    #: win (0.544s).
    DV_FOLD_THRESHOLD = 0.5

    #: bloom pruning only fires for probe sets at most this many
    #: DISTINCT non-null values: beyond it nearly every file matches
    #: anyway (a bulk merge's key set saturates the filters) and the
    #: probe's broadcast of hash pairs stops being metadata-sized
    BLOOM_PROBE_MAX_KEYS = 1024

    def __init__(self, spark: SparkSession, root: str | Path, claim=None):
        """``claim(tmp_path, target_path) -> bool`` is the pluggable
        commit-claim primitive (see ``_link_claim`` for the contract
        and the S3/GCS mapping); default is the local-FS atomic link."""
        self.spark = spark
        self.root = Path(root)
        self.log_dir = self.root / TXLOG_DIR
        self.data_dir = self.root / DATA_DIR
        self._claim = claim if claim is not None else _link_claim
        self.dv_fold_threshold = self.DV_FOLD_THRESHOLD
        if not self.log_dir.is_dir():
            raise TxError(f"not a transactional table (no {TXLOG_DIR}): {root}")

    # ------------------------------------------------------------ init

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str | Path,
        df: DataFrame,
        key: str | None = None,
        checks: dict | None = None,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> "TxTable":
        """Create a new table at ``root`` (must not already be one) and
        commit ``df`` as version 0. ``key`` declares the merge key whose
        per-file min/max statistics drive copy-on-write file pruning.
        ``checks`` (name → SQL predicate) declares CHECK constraints
        enforced IN-PLAN on this and every future write.

        ``stats_cols`` declares ADDITIONAL columns whose per-file
        min/max land in the manifest (Delta's data-skipping stats):
        ``read(prune={col: (lo, hi)})`` then skips files at the
        MANIFEST level on any of them, independent of the merge key —
        e.g. key=customer_id for merges, stats on event_date for
        time-range scans. Same INT32/INT64-physical exactness contract
        as the key stats; columns whose footers aren't usable simply
        never prune (conservative).

        ``bloom_cols`` declares columns that get PER-FILE bloom-filter
        sidecars (see :meth:`enable_bloom`) — equality probes on them
        (``read_for_keys``, merges, :meth:`read_for_values`) then skip
        files min/max ranges alone cannot, the decisive case being a
        key whose values are SCATTERED so every file's range spans
        everything."""
        root = Path(root)
        if (root / TXLOG_DIR).exists():
            raise TxError(f"already a transactional table: {root}")
        if key is not None and key not in df.columns:
            raise TxError(f"key column {key!r} not in dataframe")
        for c in stats_cols or []:
            if c not in df.columns:
                raise TxError(f"stats column {c!r} not in dataframe")
        for c in bloom_cols or []:
            if c not in df.columns:
                raise TxError(f"bloom column {c!r} not in dataframe")
        root.mkdir(parents=True, exist_ok=True)
        (root / TXLOG_DIR).mkdir()
        (root / DATA_DIR).mkdir(exist_ok=True)
        t = cls(spark, root)
        try:
            if bloom_cols:
                t.enable_bloom(bloom_cols)
            files = t._write_files(_checked(df, checks), key, stats_cols)
            t._commit(0, "create", files, _schema_json(df.schema), key,
                      checks=checks, stats_cols=stats_cols)
        except BaseException:
            # a failed v0 (e.g. CHECK violation inside the write job)
            # must not leave a manifest-less husk that blocks a retry
            shutil.rmtree(root / TXLOG_DIR, ignore_errors=True)
            (root / _BLOOM_SIDE).unlink(missing_ok=True)
            raise
        return t

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
            raise TxError(f"no committed version in {self.log_dir}")
        return vs[-1]

    def _manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        p = self.log_dir / _mname(v)
        if not p.exists():
            known = self._versions()
            lo = known[0] if known else None
            raise TxVacuumedError(
                f"version {v} is not on disk (retained: "
                f"{lo}..{known[-1] if known else None}) — vacuumed or never "
                "committed"
            )
        with open(p) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """All retained manifests, oldest first, file lists elided."""
        out = []
        for v in self._versions():
            m = self._manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "op": m["op"],
                    "ts": m["ts"],
                    "n_files": len(m["files"]),
                    "n_rows": sum(_live(f) for f in m["files"]),
                    "metrics": m.get("metrics", {}),
                }
            )
        return out

    def _commit(
        self,
        version: int,
        op: str,
        files: list[dict],
        schema_json: str,
        key: str | None,
        metrics: dict | None = None,
        txns: dict | None = None,
        checks: dict | None = None,
        stats_cols: list[str] | None = None,
    ) -> None:
        """Atomically claim ``version``. Raises TxConflictError if a
        concurrent writer claimed it first; the temp manifest is always
        cleaned up and data files referenced by the failed manifest stay
        orphaned (invisible) for vacuum. ``txns`` is the
        idempotence-fence map (app → highest committed txn version);
        ``checks`` the CHECK-constraint map (name → SQL predicate);
        ``stats_cols`` the data-skipping column list — all carried
        forward by every commit."""
        cid = uuid.uuid4().hex
        manifest = {
            "version": version,
            "op": op,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "commit_id": cid,
            "schema": schema_json,
            "key": key,
            "files": sorted(files, key=lambda f: f["path"]),
            "metrics": metrics or {},
            "txns": txns or {},
            "checks": checks or {},
            "stats_cols": stats_cols or [],
        }
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}.json"
        target = self.log_dir / _mname(version)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            try:
                claimed = self._claim(tmp, target)
            except ClaimOutcomeUnknown:
                # the claim may or may not have landed (an object store
                # timing out after accepting the conditional PUT): read
                # back whoever holds the version and compare commit ids
                # — never assume either outcome.
                claimed = None
            if claimed is None:
                try:
                    with open(target) as f:
                        claimed = json.load(f).get("commit_id") == cid
                except FileNotFoundError:
                    # nothing landed: safe to report a retryable loss
                    claimed = False
            if not claimed:
                raise TxConflictError(
                    f"version {version} was committed concurrently — "
                    "re-run this operation from the new snapshot"
                ) from None
        finally:
            tmp.unlink(missing_ok=True)

    # ------------------------------------------------------ data files

    def _write_files(
        self,
        df: DataFrame,
        key: str | None,
        stats_cols: list[str] | None = None,
    ) -> list[dict]:
        """Materialize ``df`` as new uniquely-named files under data/
        and return their manifest entries (rows + key stats + declared
        data-skipping column stats, all from parquet footers —
        metadata-only, no extra Spark job). Files written here are
        INVISIBLE until some manifest references them."""
        import pyarrow.parquet as pq

        _capture_plan(df, f"{self.root.parent.name}/{self.root.name}")
        staging = self.root / f"_staging-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(str(staging))
        entries: list[dict] = []
        try:
            for item in sorted(staging.rglob("*")):
                if not item.is_file() or item.name.startswith(("_", ".")):
                    continue
                final = self.data_dir / f"{uuid.uuid4().hex}.parquet"
                md = pq.ParquetFile(str(item)).metadata
                if md.num_rows == 0:
                    continue
                entry: dict = {"path": f"{DATA_DIR}/{final.name}", "rows": md.num_rows}
                if key is not None:
                    stats = _footer_range(md, key)
                    if stats is not None:
                        entry["kmin"], entry["kmax"] = stats
                        # NULL-key presence rides the stats: [kmin, kmax]
                        # only describes non-null values, so key pruning
                        # for a NULL probe needs its own footer fact
                        # (absent = unknown = conservatively touched)
                        nulls = _footer_nulls(md, key)
                        if nulls is not None:
                            entry["knulls"] = nulls
                cs = {}
                for c in stats_cols or []:
                    if c == key:
                        continue  # already in kmin/kmax
                    r = _footer_range(md, c)
                    if r is not None:
                        cs[c] = [r[0], r[1]]
                if cs:
                    entry["cs"] = cs
                os.replace(item, final)
                entries.append(entry)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        cfg = self.bloom_config()
        if cfg and entries:
            cols = [c for c in cfg["cols"] if c in df.columns]
            if cols:
                self._write_bloom_sidecars(entries, cols, cfg)
        return entries

    def _write_bloom_sidecars(
        self, entries: list[dict], cols: list[str], cfg: dict
    ) -> None:
        """One bloom-filter row per (new data file, column), built in a
        single executor-side pass over the just-written files (hashes
        computed by Spark's ``xxhash64`` on the values AS WRITTEN — the
        canonical table types — so probes hash identically) and landed
        as ONE per-batch sidecar dir of parquet part files. Bits never
        visit the driver: a 10k-file append's sidecars stream from
        executors to storage. Every entry of the batch references the
        dir; files written before bloom was enabled simply lack the
        reference and are never pruned by it (conservative)."""
        paths = [str(self.root / e["path"]) for e in entries]
        src = self.spark.read.parquet(*paths)
        frames = [
            src.filter(F.col(c).isNotNull()).select(
                F.regexp_extract(F.input_file_name(), "([^/]+)$", 1).alias(
                    "__f"
                ),
                F.lit(c).alias("__c"),
                F.xxhash64(F.col(c)).alias("__h1"),
                F.xxhash64(F.col(c), F.lit(_BLOOM_SALT)).alias("__h2"),
            )
            for c in cols
        ]
        res = (
            reduce(DataFrame.union, frames)
            .groupBy("__f", "__c")
            .applyInPandas(
                _bloom_builder(
                    int(cfg["bits_per_key"]), int(cfg["k"]),
                    int(cfg["max_m_bits"]),
                ),
                "f string, c string, m long, k long, bits binary",
            )
        )
        dname = f"{BLOOMS_DIR}/{uuid.uuid4().hex[:12]}"
        (self.root / BLOOMS_DIR).mkdir(exist_ok=True)
        res.write.mode("overwrite").parquet(str(self.root / dname))
        for e in entries:
            e["bloom"] = dname

    def _read_files(self, manifest: dict, paths: list[str]) -> DataFrame:
        schema = StructType.fromJson(json.loads(manifest["schema"]))
        if not paths:
            return local_rows(self.spark, [], schema)
        by_path = {f["path"]: f for f in manifest["files"]}
        if not any("dv" in by_path.get(p, {}) for p in paths):
            # fast path — plan-identical to a plain parquet scan
            return self.spark.read.schema(schema).parquet(
                *[str(self.root / p) for p in paths]
            )
        return self._read_with_positions(manifest, paths).drop(
            "__tx_fname", "__tx_ri"
        )

    def _read_with_positions(self, manifest: dict, paths: list[str]) -> DataFrame:
        """The manifest's live rows for ``paths`` plus their physical
        address (``__tx_fname`` file basename, ``__tx_ri`` row index
        within the file) from the scan's metadata columns. Deletion
        vectors are applied here: one anti-join against the (small)
        position frames of just the DV-carrying files in the selection
        — the merge-on-read half of DV deletes."""
        schema = StructType.fromJson(json.loads(manifest["schema"]))
        cols = [f.name for f in schema.fields]
        if not paths:
            return local_rows(self.spark, [], schema).select(
                "*",
                F.lit(None).cast("string").alias("__tx_fname"),
                F.lit(None).cast("long").alias("__tx_ri"),
            )
        base = (
            self.spark.read.schema(schema)
            .parquet(*[str(self.root / p) for p in paths])
            .select(
                *cols,
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__tx_fname"),
                F.col("_metadata.row_index").alias("__tx_ri"),
            )
        )
        by_path = {f["path"]: f for f in manifest["files"]}
        dv_paths = [
            str(self.root / by_path[p]["dv"]["path"])
            for p in paths
            if "dv" in by_path.get(p, {})
        ]
        if not dv_paths:
            return base
        dv = self.spark.read.schema("fname string, ri long").parquet(*dv_paths)
        return base.join(
            F.broadcast(dv),
            (F.col("__tx_fname") == F.col("fname"))
            & (F.col("__tx_ri") == F.col("ri")),
            "left_anti",
        )

    # ----------------------------------------------------------- reads

    def version_as_of(self, timestamp: str) -> int:
        """TIMESTAMP AS OF: the latest retained version committed at or
        before ``timestamp`` (ISO-8601, compared against the manifests'
        UTC commit stamps — lexicographic compare is chronological for
        this format). Raises if every retained commit is later."""
        ts = timestamp.replace(" ", "T")
        best = None
        for v in self._versions():
            if self._manifest(v)["ts"] <= ts:
                best = v
        if best is None:
            raise TxError(
                f"no retained version committed at or before {timestamp!r}"
            )
        return best

    def read(
        self,
        version: int | None = None,
        key_between: tuple[int, int] | None = None,
        prune: dict[str, tuple[int, int]] | None = None,
        as_of: str | None = None,
    ) -> DataFrame:
        """Snapshot read (latest, time travel to ``version``, or
        ``as_of`` an ISO timestamp — Delta's TIMESTAMP AS OF).

        ``key_between=(lo, hi)`` prunes at the MANIFEST level: only
        files whose footer key range intersects [lo, hi] are handed to
        Spark at all — on an object store that's the difference between
        listing/opening every file of a 100 TB table and touching the
        slice a time-range query needs. The result still contains every
        matching row but MAY contain out-of-range rows from straddling
        files; compose with a real ``.filter`` for exact semantics
        (the filter also pushes down into the surviving scans).

        ``prune={col: (lo, hi), ...}`` is the same skip on the table's
        declared ``stats_cols`` — Delta data skipping: any file whose
        recorded [min, max] for EVERY named column misses its range is
        dropped before Spark sees it; files lacking a stat for a column
        are conservatively kept. Selectivity is a LAYOUT property:
        after ``compact(zorder=[...])`` the ranges are tight in every
        z-ordered dimension at once."""
        if as_of is not None:
            if version is not None:
                raise TxError("read: pass version OR as_of, not both")
            version = self.version_as_of(as_of)
        m = self._manifest(version)
        files = m["files"]
        if key_between is not None:
            if m["key"] is None:
                raise TxError("key_between requires a table created with key=...")
            lo, hi = key_between
            files = [
                f
                for f in files
                if "kmin" not in f or (f["kmax"] >= lo and f["kmin"] <= hi)
            ]
        for col, (lo, hi) in (prune or {}).items():
            if col == m["key"]:
                files = [
                    f
                    for f in files
                    if "kmin" not in f or (f["kmax"] >= lo and f["kmin"] <= hi)
                ]
                continue
            if col not in m.get("stats_cols", []):
                raise TxError(
                    f"prune on {col!r} needs it declared in stats_cols "
                    f"(table has {m.get('stats_cols', [])})"
                )
            files = [
                f
                for f in files
                if col not in f.get("cs", {})
                or (f["cs"][col][1] >= lo and f["cs"][col][0] <= hi)
            ]
        return self._read_files(m, [f["path"] for f in files])

    def columns(self, version: int | None = None) -> list[str]:
        """Column names from the manifest — no read plan built."""
        return _schema_cols(self._manifest(version))

    def read_for_keys(self, keys: DataFrame, version: int | None = None) -> DataFrame:
        """The rows of ONLY the files whose footer key range may contain
        a key from ``keys`` (same pruning as MERGE's copy-on-write).
        Contract: contains EVERY row whose key appears in ``keys``
        (including NULL keys, via the per-file null-count stats), and
        MAY contain other rows from the same files — compose with a
        semi-join/filter for exact membership. The lookup-side reads
        that feed a merge source (recover existing surrogate ids /
        audit columns for a batch's keys) go through this instead of a
        full-dimension scan: O(touched files), not O(table)."""
        m = self._manifest(version)
        if m["key"] is None:
            raise TxError("read_for_keys requires a table created with key=...")
        return self._read_files(m, self._touched_by_keys(m, keys))

    # -------------------------------------------------- bloom skipping

    def bloom_config(self) -> dict | None:
        """The table's bloom-filter config (None = not enabled)."""
        p = self.root / _BLOOM_SIDE
        if not p.is_file():
            return None
        with open(p) as f:
            return json.load(f)

    def enable_bloom(
        self,
        cols: list[str],
        bits_per_key: int = 10,
        k: int = 7,
        max_m_bits: int = 1 << 23,
    ) -> dict:
        """Declare per-file bloom-filter sidecars for ``cols`` — the
        data-skipping index for EQUALITY probes on columns whose values
        are scattered across files (a uuid-ish key gives every file a
        [min, max] spanning the whole domain, so range stats prune
        nothing; blooms prune to the files that really may hold the
        probed values). Writes from now on build sidecars; existing
        files gain them at their next rewrite (``compact`` /
        copy-on-write), and until then are simply never bloom-pruned.

        Defaults: 10 bits/key with k=7 ≈ 0.8% false-positive rate;
        per-file bitmaps are sized from the file's row count and capped
        at ``max_m_bits`` (2^23 = 1 MiB — a cap hit means the fpp
        degrades gracefully, never correctness). The config is
        table-level TUNING metadata (like Delta's table properties),
        not part of any snapshot: flipping it mid-stream changes which
        future files carry sidecars, nothing else."""
        if k < 1 or bits_per_key < 1:
            raise TxError("enable_bloom: k and bits_per_key must be >= 1")
        if max_m_bits & (max_m_bits - 1) or max_m_bits < 1024:
            raise TxError(
                "enable_bloom: max_m_bits must be a power of two >= 1024"
            )
        if max_m_bits > _BLOOM_SPACE:
            raise TxError(
                f"enable_bloom: max_m_bits beyond the position space "
                f"({_BLOOM_SPACE})"
            )
        if self._versions():
            known = _schema_cols(self._manifest())
            bad = [c for c in cols if c not in known]
            if bad:
                raise TxError(f"bloom column(s) not in schema: {bad}")
        cfg = {
            "cols": list(cols),
            "bits_per_key": int(bits_per_key),
            "k": int(k),
            "max_m_bits": int(max_m_bits),
        }
        tmp = self.root / f".tmp-bloom-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as f:
            json.dump(cfg, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.root / _BLOOM_SIDE)
        return cfg

    def disable_bloom(self) -> None:
        """Stop building sidecars (existing ones stay until their files
        age out; probes ignore them once the config is gone)."""
        (self.root / _BLOOM_SIDE).unlink(missing_ok=True)

    def _bloom_prune(
        self, m: dict, paths: list[str], keys, col: str
    ) -> list[str]:
        """Drop candidates whose bloom filter PROVES no probe value is
        present. ``keys``: a DataFrame carrying ``col``, or a list of
        literal values. Conservative everywhere — no config, column
        not covered, file without a sidecar row (pre-bloom write or
        evolved-in column), probe set over ``BLOOM_PROBE_MAX_KEYS``,
        NULL probes: all keep. The membership check runs as a Spark
        job over the sidecar parquet (one boolean per candidate file
        comes back; bitmap bits NEVER visit the driver)."""
        import numpy as np
        import pandas as pd

        cfg = self.bloom_config()
        if not cfg or col not in cfg["cols"] or not paths:
            return paths
        by_path = {f["path"]: f for f in m["files"]}
        cands = [p for p in paths if "bloom" in by_path.get(p, {})]
        if not cands:
            return paths
        # hash probes under the CANONICAL column type (what the writer
        # hashed) — an int32 probe frame against a bigint column must
        # not hash differently
        dt = StructType.fromJson(json.loads(m["schema"]))[col].dataType
        if isinstance(keys, DataFrame):
            kdf = keys.select(F.col(col).cast(dt).alias("__v"))
        else:
            kdf = local_rows(
                self.spark, [(v,) for v in keys],
                StructType([StructField("__v", dt)]),
            )
        hashed = (
            kdf.where(F.col("__v").isNotNull())
            .distinct()
            .select(
                F.xxhash64("__v").alias("h1"),
                F.xxhash64("__v", F.lit(_BLOOM_SALT)).alias("h2"),
            )
            .limit(self.BLOOM_PROBE_MAX_KEYS + 1)
            .collect()
        )
        if not hashed or len(hashed) > self.BLOOM_PROBE_MAX_KEYS:
            return paths
        h1 = np.array([r["h1"] for r in hashed], dtype=np.int64)
        h2 = np.array([r["h2"] for r in hashed], dtype=np.int64)

        def member(bits, mm, kk):
            out = []
            for b, m_bits, k in zip(bits, mm, kk):
                arr = np.frombuffer(b, dtype=np.uint8)
                pos = _bloom_positions(h1, h2, int(k), int(m_bits))
                out.append(
                    bool(
                        ((arr[pos >> 3] >> (pos & 7)) & 1)
                        .all(axis=1)
                        .any()
                    )
                )
            return pd.Series(out)

        # real class objects, not strings — the module's `from
        # __future__ import annotations` would otherwise leave hints
        # pandas_udf cannot resolve from its own eval context
        member.__annotations__ = {
            "bits": pd.Series, "mm": pd.Series, "kk": pd.Series,
            "return": pd.Series,
        }
        names = {os.path.basename(p) for p in cands}
        dirs = sorted({by_path[p]["bloom"] for p in cands})
        rows = (
            self.spark.read.parquet(*[str(self.root / d) for d in dirs])
            .filter((F.col("c") == col) & F.col("f").isin(list(names)))
            .select(
                "f",
                F.pandas_udf(member, "boolean")(
                    F.col("bits"), F.col("m"), F.col("k")
                ).alias("hit"),
            )
            .collect()
        )
        present = {r["f"] for r in rows}
        maybe = {r["f"] for r in rows if r["hit"]}
        return [
            p
            for p in paths
            if p not in cands
            or os.path.basename(p) not in present  # no sidecar row: keep
            or os.path.basename(p) in maybe
        ]

    def files_for_values(
        self, col: str, values: list, version: int | None = None
    ) -> list[str]:
        """Point-lookup file pruning on ``col``: manifest min/max stats
        first (key stats or declared ``stats_cols`` — per VALUE, not
        the values' envelope), then the bloom sidecars. Returns the
        live file paths that MAY hold any of the values; files without
        usable stats/sidecars are kept. NULL in ``values``: key column
        → files whose recorded null count is nonzero (or unknown);
        other columns → conservatively all files (cs ranges describe
        non-null values only)."""
        m = self._manifest(version)
        vals = [v for v in values if v is not None]
        want_null = len(vals) != len(list(values))
        files = m["files"]
        kept: list[dict] = []
        for f in files:
            if col == m["key"] and "kmin" in f:
                ok = any(
                    v is not None and f["kmin"] <= v <= f["kmax"]
                    for v in vals
                    if isinstance(v, int)
                ) or any(not isinstance(v, int) for v in vals)
                if want_null and f.get("knulls", 1) != 0:
                    ok = True
            elif col in f.get("cs", {}):
                lo, hi = f["cs"][col]
                ok = want_null or any(lo <= v <= hi for v in vals)
            else:
                ok = True
            if ok:
                kept.append(f)
        paths = [f["path"] for f in kept]
        pruned = set(self._bloom_prune(m, paths, list(vals), col))
        if want_null:
            # bloom encodes non-null values only — a file kept for its
            # possible NULLs must survive regardless of the bitmaps
            for f in kept:
                if col == m["key"] and "kmin" in f:
                    if f.get("knulls", 1) != 0:
                        pruned.add(f["path"])
                else:
                    pruned.add(f["path"])
        return [p for p in paths if p in pruned]

    def read_for_values(
        self, col: str, values: list, version: int | None = None
    ) -> DataFrame:
        """The rows of ONLY the files that may hold any of ``values``
        in ``col`` (stats + bloom pruning — see ``files_for_values``).
        Same contract as ``read_for_keys``: every matching row is
        present, other rows from the same files may be — compose with
        a ``.filter``/semi-join for exact membership."""
        m = self._manifest(version)
        return self._read_files(m, self.files_for_values(col, values, version))

    def pruned_df(self, version: int | None = None) -> DataFrame:
        """A FRESH native-source relation
        (``spark.read.format("txtable")``) with manifest-stat file
        pruning ON and the snapshot pinned at ``version`` (default: the
        latest, resolved NOW — later commits cannot shift the plan
        mid-query).

        This is the engine-owned safe way to a pruned native read. The
        Spark 4.1 plan-reuse hazard (sources/txbatch.py module
        docstring; pinned in tests) bites only when ONE pruning
        relation is reused across queries with different pushed filters
        — a cached DataFrame, a shared variable, a temp view (temp
        views share the relation node, so registering a pruning reader
        as a SQL view replays query N's pruned file list into query
        N+1; measured, which is why ``create_sql_views`` stays on the
        manifest-parquet path). Each call here constructs a brand-new
        relation, so a prior query's pushed filters can never leak into
        this one's scan. Use one returned DataFrame per query; call
        again for the next — construction is manifest metadata only,
        zero Spark jobs."""
        from data_warehouse_project_spark.sources.txbatch import (
            TxBatchDataSource,
        )

        if self.spark is None:
            raise TxError("pruned_df needs a SparkSession-bound TxTable")
        self.spark.dataSource.register(TxBatchDataSource)
        self.spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        v = self.latest_version() if version is None else int(version)
        return (
            self.spark.read.format("txtable")
            .option("path", str(self.root))
            .option("pruneFiles", "true")
            .option("versionAsOf", v)
            .load()
        )

    def row_count(self, version: int | None = None) -> int:
        """Exact LIVE row count from manifest metadata (file rows minus
        deletion-vector rows) — no Spark job."""
        return sum(_live(f) for f in self._manifest(version)["files"])

    def txn_version(self, app: str) -> int | None:
        """Highest txn version committed under ``app`` (the idempotence
        fence recorded by append/merge/rewrite_by_keys), or None if the
        app never committed. Lets an incremental consumer ask "what have
        I already applied?" straight from the table it writes."""
        v = self._manifest().get("txns", {}).get(app)
        return None if v is None else int(v)

    def txn_commit_version(self, app: str, txn_version: int) -> int:
        """The TABLE version whose commit first advanced ``app``'s
        idempotence fence to at least ``txn_version`` — i.e. the commit
        that actually applied that fenced operation. This is the
        version a multi-table coordinator must pin when a replayed op
        reports a fenced skip: the skip's own return carries the LATEST
        table version at skip time, which may include foreign commits
        that are no part of the replayed transaction. O(retained
        manifests) driver metadata; raises if no retained commit has
        the fence that high (vacuumed past, or never committed)."""
        for v in self._versions():
            m = self._manifest(v)
            if m.get("txns", {}).get(app, -(1 << 62)) >= txn_version:
                return v
        raise TxError(
            f"no retained commit advanced fence {app!r} to >= "
            f"{txn_version} — vacuumed past, or the txn never committed"
        )

    def read_changes(
        self, starting_version: int, ending_version: int | None = None
    ) -> DataFrame:
        """CHANGE DATA FEED — every row-level change committed in
        versions ``[starting_version, ending_version]``, computed purely
        from manifest diffs (Delta Lake's CDF surface, derived the way
        Delta computes it for add/remove-only commits: no change files
        are ever stored).

        Output = the ending version's table columns plus
        ``_change_type`` ('insert' | 'delete' | 'update_preimage' |
        'update_postimage'), ``_commit_version`` and ``_commit_ts``.
        Guarantee (test-pinned): applying the feed to the
        ``starting_version - 1`` snapshot — add inserts+postimages,
        multiset-subtract deletes+preimages — reproduces the
        ``ending_version`` snapshot exactly.

        Per version the diff reads ONLY the files that version added or
        removed, so consuming a day of commits on a 100 TB table costs
        O(that day's churn), not O(table) — the property that makes
        incremental downstream pipelines (see ``txview.TxAggView``)
        cheaper than recomputation. Carried-over rows in rewritten files
        cancel in the multiset diff and are never emitted; ``compact``
        and constraint commits are logical no-ops and yield nothing.
        Update pairing: when the table has a merge key and a changed key
        has exactly one removed and one added row, the pair is labeled
        update_preimage/update_postimage; ambiguous keys (duplicates)
        degrade honestly to delete+insert. This holds for BOTH write
        modes — copy-on-write rewrites and merge-on-read (deletion
        vector) UPDATE/MERGE commits label identically, so consumers
        filtering on change type are write-mode agnostic. Requires the full version
        range to still be on disk (raises TxVacuumedError otherwise —
        size ``vacuum(retain_versions=...)`` to the consumer lag).
        Schema evolution: rows from before a column existed surface
        NULL for it, like reading an old file under the new schema."""
        end = self.latest_version() if ending_version is None else ending_version
        if starting_version < 0 or end < starting_version:
            raise TxError(
                f"bad change range [{starting_version}, {end}]"
            )
        end_m = self._manifest(end)
        parts = []
        for v in range(starting_version, end + 1):
            part = self._version_changes(v)
            if part is not None:
                parts.append(part)
        end_schema = StructType.fromJson(json.loads(end_m["schema"]))
        shell = StructType(
            list(end_schema.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
                StructField("_commit_ts", TimestampType(), True),
            ]
        )
        out = local_rows(self.spark, [], shell)
        for part in parts:
            out = out.unionByName(part, allowMissingColumns=True)
        return out

    def _version_changes(self, v: int) -> DataFrame | None:
        """One version's change rows (or None for a no-op commit). The
        multiset diff old-files-vs-new-files is exact for every op:
        appends diff against nothing, copy-on-write rewrites cancel
        their carried rows, overwrite/restore surface the full swap —
        the same rows Delta's CDF emits for those ops."""
        m = self._manifest(v)
        if m["op"] == "compact":
            return None  # same logical rows, different physical layout
        prev_files = [] if v == 0 else self._manifest(v - 1)["files"]
        cur_paths = {f["path"] for f in m["files"]}
        prev_paths = {f["path"] for f in prev_files}
        added = [f["path"] for f in m["files"] if f["path"] not in prev_paths]
        removed = [f["path"] for f in prev_files if f["path"] in prev_paths - cur_paths]
        ct = lambda tag: F.lit(tag).alias("_change_type")  # noqa: E731
        stamp = [
            F.lit(v).cast("long").alias("_commit_version"),
            F.lit(m["ts"]).cast("timestamp").alias("_commit_ts"),
        ]
        dv_part = self._dv_changes(m, prev_files, ct, stamp)
        if not added and not removed:
            return dv_part  # dv-only delete, or constraint/fence no-op
        new = self._read_files(m, added)
        if not removed:
            if dv_part is None:
                return new.select("*", ct("insert"), *stamp)
            if m["key"] is None:
                return new.select("*", ct("insert"), *stamp).unionByName(dv_part)
            # merge-on-read UPDATE/MERGE: this commit's dv pre-images
            # (deletes) pair with its appended post-images per key,
            # exactly like the copy-on-write path — consumers filtering
            # on change type see the same labels whichever write mode
            # produced the commit. (Restore-rewound dv re-inserts pass
            # through unpaired.)
            meta = ["_change_type", "_commit_version", "_commit_ts"]
            dv_dels = dv_part.filter(F.col("_change_type") == "delete").drop(*meta)
            dv_other = dv_part.filter(F.col("_change_type") != "delete")
            return self._pair_updates(m["key"], dv_dels, new, ct, stamp).unionByName(
                dv_other
            )
        # old files read under the PREVIOUS schema, aligned up to this
        # version's (evolution is add-nullable-only, so NULL-fill)
        old = self._read_files(self._manifest(v - 1), removed)
        cur_schema = StructType.fromJson(json.loads(m["schema"]))
        for f in cur_schema.fields:
            if f.name not in old.columns:
                old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
        old = old.select(*[f.name for f in cur_schema.fields])
        dels = old.exceptAll(new)
        ins = new.exceptAll(old)
        key = m["key"]
        if key is None:
            out = dels.select("*", ct("delete"), *stamp).unionByName(
                ins.select("*", ct("insert"), *stamp)
            )
            return out if dv_part is None else out.unionByName(dv_part)
        if dv_part is not None:
            # a commit can mix file rewrites with dv growth (e.g. a dv
            # merge that auto-folded a dense vector): its dv pre-images
            # pair against the same added post-images
            meta = ["_change_type", "_commit_version", "_commit_ts"]
            dels = dels.unionByName(
                dv_part.filter(F.col("_change_type") == "delete").drop(*meta)
            )
            dv_part = dv_part.filter(F.col("_change_type") != "delete")
        out = self._pair_updates(key, dels, ins, ct, stamp)
        return out if dv_part is None else out.unionByName(dv_part)

    def _pair_updates(self, key, dels, ins, ct, stamp) -> DataFrame:
        """Label one commit's removed/added rows: keys with exactly one
        pre and one post row pair as update_preimage/update_postimage;
        ambiguous keys (duplicates) degrade honestly to delete+insert."""
        paired = (
            dels.groupBy(key).agg(F.count(F.lit(1)).alias("__tx_dn"))
            .join(
                ins.groupBy(key).agg(F.count(F.lit(1)).alias("__tx_in")),
                key,
            )
            .filter((F.col("__tx_dn") == 1) & (F.col("__tx_in") == 1))
            .select(F.col(key).alias("__tx_pk"))
        )

        def tag(df: DataFrame, upd: str, plain: str) -> DataFrame:
            return (
                df.join(paired, df[key] == paired["__tx_pk"], "left")
                .select(
                    *df.columns,
                    F.when(F.col("__tx_pk").isNotNull(), F.lit(upd))
                    .otherwise(F.lit(plain))
                    .alias("_change_type"),
                    *stamp,
                )
            )

        return tag(dels, "update_preimage", "delete").unionByName(
            tag(ins, "update_postimage", "insert")
        )

    def _dv_changes(self, m: dict, prev_files: list[dict], ct, stamp):
        """Change rows for files CARRIED between versions whose deletion
        vector changed: positions newly in the vector are deletes,
        positions that left it (restore rewound the vector) are
        re-inserts. Reads only the affected dv sidecars plus the rows of
        the affected data files — never the untouched table."""
        prev_by = {f["path"]: f for f in prev_files}
        changed = [
            (prev_by[f["path"]], f)
            for f in m["files"]
            if f["path"] in prev_by and prev_by[f["path"]].get("dv") != f.get("dv")
        ]
        if not changed:
            return None

        def pos_frame(entries_side):
            paths = [
                str(self.root / e["dv"]["path"])
                for e in entries_side
                if e.get("dv")
            ]
            if not paths:
                return local_rows(self.spark, [], "fname string, ri long")
            return self.spark.read.schema("fname string, ri long").parquet(*paths)

        old_pos = pos_frame([p for p, _ in changed])
        new_pos = pos_frame([c for _, c in changed])
        schema = StructType.fromJson(json.loads(m["schema"]))
        cols = [f.name for f in schema.fields]
        base = (
            self.spark.read.schema(schema)
            .parquet(*[str(self.root / c["path"]) for _, c in changed])
            .select(
                *cols,
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__tx_fname"),
                F.col("_metadata.row_index").alias("__tx_ri"),
            )
        )

        def rows_at(positions, tag):
            return base.join(
                F.broadcast(positions),
                (F.col("__tx_fname") == F.col("fname"))
                & (F.col("__tx_ri") == F.col("ri")),
                "left_semi",
            ).select(*cols, ct(tag), *stamp)

        return rows_at(new_pos.exceptAll(old_pos), "delete").unionByName(
            rows_at(old_pos.exceptAll(new_pos), "insert")
        )

    # ---------------------------------------------------------- writes

    def append(
        self,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
        merge_schema: bool = False,
    ) -> dict:
        """Append a batch. Appends depend on no snapshot, so a lost
        commit race is retried onto the next version automatically
        (schema is revalidated against the winner's manifest each try).

        ``txn=(app_id, txn_version)`` makes the append IDEMPOTENT — the
        Delta txnAppId/txnVersion pattern: the manifest records the
        highest committed txn version per app, and a replay at or below
        it is skipped without writing (``{"skipped": True}``). This is
        the exactly-once fence for Structured Streaming foreachBatch
        sinks, whose batches can be redelivered after a restart.

        ``merge_schema=True`` allows the batch to carry NEW columns
        (Delta's mergeSchema): the table schema widens with them as
        nullable fields, existing files read back NULL for them, and
        existing columns must keep their exact types. The batch must
        still contain every existing column.
        Returns the commit metrics."""
        files = None
        for _ in range(_APPEND_RETRIES):
            m = self._manifest()
            skip, txns = _fence(m, txn)
            if skip:
                return {"rows_appended": 0, "version": m["version"], "skipped": True}
            if merge_schema:
                schema_json = _evolve_schema(m, df)
            else:
                schema_json = m["schema"]
                _check_schema(m, df)
            if files is None:  # write data once; only the claim retries
                files = self._write_files(
                    _checked(df, m.get("checks")), m["key"],
                    m.get("stats_cols"),
                )
                if not files and txn is None:
                    return {"rows_appended": 0, "version": m["version"]}
            try:
                self._commit(
                    m["version"] + 1,
                    "append",
                    m["files"] + files,
                    schema_json,
                    m["key"],
                    {"rows_appended": sum(f["rows"] for f in files)},
                    txns,
                    m.get("checks", {}),
                    m.get("stats_cols"),
                )
                return {
                    "rows_appended": sum(f["rows"] for f in files),
                    "version": m["version"] + 1,
                }
            except TxConflictError:
                continue
        raise TxConflictError(
            f"append lost the commit race {_APPEND_RETRIES} times"
        )

    def commit_prewritten(
        self,
        entries: list[dict],
        op: str,
        schema_json: str,
        txn: tuple[str, int] | None = None,
        merge_schema: bool = False,
        checks_validated: dict | None = None,
    ) -> dict:
        """Commit data files ALREADY sitting under ``data/`` (manifest
        entries prebuilt from their footers) as an ``append`` or
        ``overwrite`` — the driver half of the native batch writer
        (sources/txbatch.py), whose EXECUTORS write the parquet with
        pyarrow and must not round-trip rows through a DataFrame again.

        Runs without a SparkSession (manifest JSON + claim protocol
        only), so it is callable from a Python data source worker.
        Consequences, both surfaced loudly rather than silently
        weakened: the batch schema must EQUAL the table schema —
        unless ``merge_schema=True``, which widens the table with the
        batch's NEW nullable columns under the same rules as
        ``append(merge_schema=True)`` (every existing column present,
        exact types; older files NULL-fill on read) — and tables
        carrying CHECK constraints refuse (enforcement is in-plan on
        the write job; prewritten files bypassed it — use
        ``TxTable.append``).

        Same fence + lost-race retry contract as ``append``; an
        overwrite claims exactly once like ``overwrite``.

        ``checks_validated`` is the writer's attestation that its
        tasks ALREADY enforced the named CHECK predicates on every
        batch (the native writer's executor-side DuckDB validation,
        sources/txbatch.py). The commit refuses unless every constraint
        in the CURRENT manifest was validated with an identical
        predicate — a constraint added between plan time and commit
        fails loudly rather than landing unvalidated rows."""
        if op not in ("append", "overwrite"):
            raise TxError(f"commit_prewritten: op {op!r}")
        if merge_schema and op != "append":
            raise TxError("merge_schema applies to append only")
        want = {
            f["name"]: f["type"]
            for f in json.loads(schema_json)["fields"]
        }
        rows = sum(f["rows"] for f in entries)
        for _ in range(_APPEND_RETRIES):
            m = self._manifest()
            cv = checks_validated or {}
            unvalidated = {
                k for k, p in (m.get("checks") or {}).items()
                if cv.get(k) != p
            }
            if unvalidated:
                raise TxError(
                    "commit_prewritten: CHECK constraints "
                    f"{sorted(unvalidated)} were not enforced on these "
                    "prewritten files — write through the native "
                    "writer (executor-side validation) or "
                    "TxTable.append/overwrite (in-plan enforcement)"
                )
            if merge_schema:
                commit_schema = _evolve_schema_json(m, schema_json)
            else:
                commit_schema = m["schema"]
                have = {
                    f["name"]: f["type"]
                    for f in json.loads(m["schema"])["fields"]
                }
                if want != have:
                    raise TxError(
                        f"batch schema {sorted(want)} != table schema "
                        f"{sorted(have)} (pass mergeSchema/merge_schema "
                        "to widen with new nullable columns)"
                    )
            skip, txns = _fence(m, txn)
            metric = "rows_appended" if op == "append" else "rows_written"
            if skip:
                # uniform result shape: the op's metric key is present
                # (= 0) on a fenced skip, so callers reading
                # r["rows_appended"] / r["rows_written"] see zero rather
                # than a missing key (r10 ADVICE)
                return {metric: 0, "version": m["version"], "skipped": True}
            files = m["files"] + entries if op == "append" else entries
            try:
                self._commit(
                    m["version"] + 1,
                    op,
                    files,
                    commit_schema,
                    m["key"],
                    {metric: rows},
                    txns,
                    m.get("checks", {}),
                    m.get("stats_cols"),
                )
                return {metric: rows, "version": m["version"] + 1}
            except TxConflictError:
                if op == "overwrite":
                    raise  # snapshot-replacing: caller must re-decide
                continue
        raise TxConflictError(
            f"commit_prewritten lost the commit race {_APPEND_RETRIES} times"
        )

    def overwrite(
        self,
        df: DataFrame,
        key: str | None = None,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Replace the table contents (and optionally re-declare the
        merge key / schema). Old versions stay time-travel readable
        until vacuumed. ``txn`` fences the overwrite like append/merge
        — the replay-safe primitive for derived tables (a view
        recompute at base version V is idempotent per V)."""
        m = self._manifest()
        skip, txns = _fence(m, txn)
        if skip:
            return {"version": m["version"], "skipped": True}
        key = m["key"] if key is None else key
        if key is not None and key not in df.columns:
            raise TxError(f"key column {key!r} not in dataframe")
        files = self._write_files(
            _checked(df, m.get("checks")), key, m.get("stats_cols")
        )
        self._commit(
            m["version"] + 1,
            "overwrite",
            files,
            _schema_json(df.schema),
            key,
            {"rows_written": sum(f["rows"] for f in files)},
            txns,
            m.get("checks", {}),
            m.get("stats_cols"),
        )
        return {"version": m["version"] + 1}

    # ------------------------------------------------- copy-on-write

    def _touched_by_keys(self, m: dict, source: DataFrame) -> list[str]:
        """Paths of data files whose key range MAY contain a source key.
        A file whose [kmin, kmax] excludes every source key provably
        holds no matching row, so it can be carried over unread. Files
        without stats are always touched (conservative). The range probe
        is a broadcast join of distinct source keys against the O(files)
        stats frame — file paths come back bounded by the file count.

        NULL source keys: footer [kmin, kmax] describes only non-null
        values, so a NULL probe key matches no range — instead it
        touches every file whose recorded key null count is nonzero
        (or unknown, for files written before ``knulls`` existed). This
        lets key-confined transforms (``rewrite_by_keys``) handle SQL
        NULL groups exactly instead of silently missing the file that
        holds the NULL-key rows."""
        key = m["key"]
        with_stats = [f for f in m["files"] if "kmin" in f]
        no_stats = [f["path"] for f in m["files"] if "kmin" not in f]
        if not with_stats:
            return no_stats
        ranges = local_rows(
            self.spark,
            [(f["path"], f["kmin"], f["kmax"]) for f in with_stats],
            "__tx_path string, __tx_kmin long, __tx_kmax long",
        )
        # one job: non-null keys range-probe the broadcast stats frame;
        # NULL keys (whose comparisons are never true) and keys missing
        # every range both land in the NULL-path group, whose max flags
        # whether any probe key was NULL
        hit = (
            source.select(F.col(key).cast("long").alias("__tx_k"))
            .distinct()
            .join(
                F.broadcast(ranges),
                (F.col("__tx_k") >= F.col("__tx_kmin"))
                & (F.col("__tx_k") <= F.col("__tx_kmax")),
                "left",
            )
            .groupBy("__tx_path")
            .agg(F.max(F.col("__tx_k").isNull().cast("int")).alias("__tx_nul"))
            .collect()
        )
        paths = {r["__tx_path"] for r in hit if r["__tx_path"] is not None}
        # bloom sidecars cut the RANGE survivors further (scattered keys
        # make every range match; the bitmaps know better) — before the
        # NULL union, since blooms encode non-null values only and must
        # never veto a file kept for its possible NULL-key rows
        paths = set(self._bloom_prune(m, sorted(paths), source, key))
        if any(r["__tx_path"] is None and r["__tx_nul"] == 1 for r in hit):
            paths |= {f["path"] for f in with_stats if f.get("knulls", 1) != 0}
        return no_stats + sorted(paths)

    def _probe_key_stats(self, keys: DataFrame, key: str):
        """``(min, max, has_null)`` of the op's key set under the same
        long cast the file-range pruning uses — the conservative probe
        the rebase path intersects against foreign-added files' footer
        ranges. Keys that don't cast to long surface as NULL (and the
        stats-less foreign files a non-integer key column produces are
        conservatively conflicting anyway)."""
        r = (
            keys.select(F.col(key).cast("long").alias("__tx_k"))
            .agg(
                F.min("__tx_k").alias("lo"),
                F.max("__tx_k").alias("hi"),
                F.max(F.col("__tx_k").isNull().cast("int")).alias("nul"),
            )
            .first()
        )
        return r["lo"], r["hi"], bool(r["nul"])

    def _touched_by_predicate(self, m: dict, condition) -> list[str]:
        """Paths of data files that ACTUALLY contain LIVE rows matching
        an arbitrary predicate: one distributed scan grouping matches by
        the scan's file-path metadata column (result bounded by the file
        count; DV-deleted rows never match). Manifest paths are
        uuid-named, so basename equality identifies the file."""
        cur = self._read_with_positions(m, [f["path"] for f in m["files"]])
        hits = {
            r["__tx_fname"]
            for r in cur.filter(condition)
            .select("__tx_fname")
            .distinct()
            .collect()
        }
        return [f["path"] for f in m["files"] if os.path.basename(f["path"]) in hits]

    #: commit-rebase attempts after lost claim races before giving up
    _REBASE_RETRIES = 5

    def _cow_commit(
        self,
        m: dict,
        op: str,
        touched: list[str],
        replacement: DataFrame,
        metrics: dict,
        txns: dict | None = None,
        schema_json: str | None = None,
        conflict=None,
    ) -> dict:
        """Commit a copy-on-write rewrite: ``touched`` files drop out of
        the manifest, ``replacement`` (their rewritten contents) comes
        in as new files, everything else carries over untouched.

        LOGICAL conflict detection (Delta's concurrency semantics): a
        lost version-claim race is only a real conflict if the winner's
        commits actually overlap this rewrite — removed/changed one of
        our touched files, ADDED files that may hold rows this op's
        logic depended on reading (see ``conflict``), altered
        schema/key/constraints, or advanced our idempotence fence.
        Otherwise the already-written new files are REBASED onto the
        winner's manifest and the commit retries at the next version —
        the expensive Spark work is never redone. Two writers merging
        disjoint key ranges of a clustered table therefore both
        succeed; overlapping writers still get ``TxConflictError`` (and
        a concurrent duplicate of the same fenced txn degrades to a
        skip, exactly-once preserved).

        ``conflict`` declares what a file ADDED by the race winner
        means for this op (Delta's ConcurrentAppendException matrix):

        - ``None``: foreign additions never conflict — correct ONLY
          for layout-preserving rewrites (compact) whose logic depends
          on no row being absent (a carried foreign file keeps its
          rows);
        - ``"any"``: any foreign addition conflicts — predicate-driven
          delete/update, whose matched-row discovery scanned the whole
          snapshot (a foreign row could have matched);
        - ``("keys", keys_df)``: a foreign addition conflicts iff its
          footer key range may contain a key of ``keys_df`` (stats-less
          files and NULL probe keys stay conservative) — merge and
          rewrite_by_keys, whose not-matched inserts / key-confined
          transforms assumed those keys were ABSENT outside the touched
          files. Without this check, two concurrent merges inserting
          the same previously-absent key would both commit and leave
          duplicate rows for the merge key.

        Returns metrics + ``rows_written`` (live rows in the
        replacement files — computed from manifest metadata so row
        accounting stays exact even after a rebase past a foreign
        append)."""
        out_schema = m["schema"] if schema_json is None else schema_json
        out_cols = [f["name"] for f in json.loads(out_schema)["fields"]]
        new_files = self._write_files(
            _checked(replacement.select(*out_cols), m.get("checks")),
            m["key"],
            m.get("stats_cols"),
        )
        touched_set = set(touched)
        old_by_path = {f["path"]: f for f in m["files"]}
        base = m
        use_txns = m.get("txns", {}) if txns is None else txns
        # the fence entries THIS op is advancing (vs its base snapshot);
        # every attempt commits base.txns ∪ advanced, so a rebase keeps
        # the winner's fence state AND this op's
        advanced = {
            app: ver
            for app, ver in use_txns.items()
            if m.get("txns", {}).get(app) != ver
        }
        metrics = dict(metrics, files_rewritten=len(touched))
        probe = None  # (lo, hi, has_null) of the op's key set, lazy
        for _ in range(self._REBASE_RETRIES):
            kept = [f for f in base["files"] if f["path"] not in touched_set]
            # winner's fence advances carry forward; ours apply on top
            merged_txns = dict(base.get("txns", {}))
            merged_txns.update(advanced)
            try:
                self._commit(
                    base["version"] + 1,
                    op,
                    kept + new_files,
                    out_schema,
                    m["key"],
                    metrics,
                    merged_txns,
                    m.get("checks", {}),
                    m.get("stats_cols"),
                )
            except TxConflictError:
                latest = self._manifest()
                # structural changes conflict unconditionally
                if (
                    latest["schema"] != m["schema"]
                    or latest["key"] != m["key"]
                    or latest.get("checks", {}) != m.get("checks", {})
                    or latest.get("stats_cols", []) != m.get("stats_cols", [])
                ):
                    raise
                # a concurrent duplicate of the same fenced txn already
                # landed: this op's effect is committed — skip
                for app, ver in advanced.items():
                    if latest.get("txns", {}).get(app, -(1 << 62)) >= ver:
                        return dict(
                            metrics, version=latest["version"], skipped=True
                        )
                # every touched file must still be present and
                # byte-identical (same entry, same deletion vector) —
                # the winner provably worked on other files
                latest_by_path = {f["path"]: f for f in latest["files"]}
                for p in touched_set:
                    if latest_by_path.get(p) != old_by_path.get(p):
                        raise
                # files the winner ADDED since our last vetted base:
                # per the ``conflict`` contract above, they may hold
                # rows this op assumed absent (duplicate-insert race)
                base_paths = {f["path"] for f in base["files"]}
                foreign = [
                    f for f in latest["files"] if f["path"] not in base_paths
                ]
                if foreign and conflict is not None:
                    if conflict == "any":
                        raise TxConflictError(
                            f"{op}: a concurrent commit added files the "
                            "predicate scan did not see — re-run from "
                            "the new snapshot"
                        ) from None
                    if probe is None:  # one tiny agg, only on rebase
                        probe = self._probe_key_stats(conflict[1], m["key"])
                    lo, hi, has_null = probe
                    for f in foreign:
                        hit = (
                            "kmin" not in f  # stats-less: conservative
                            or (has_null and f.get("knulls", 1) != 0)
                            or (
                                lo is not None
                                and f["kmax"] >= lo
                                and f["kmin"] <= hi
                            )
                        )
                        if hit:
                            raise TxConflictError(
                                f"{op}: a concurrent commit added file "
                                f"{f['path']} whose key range may "
                                "contain this operation's keys — "
                                "re-run from the new snapshot"
                            ) from None
                base = latest
                continue
            return dict(
                metrics,
                version=base["version"] + 1,
                rows_written=sum(_live(f) for f in new_files),
            )
        raise TxConflictError(
            f"{op} lost the commit race {self._REBASE_RETRIES} times "
            "even after rebasing"
        )

    def delete(self, condition, mode: str = "rewrite") -> dict:
        """DELETE FROM table WHERE condition.

        ``mode="rewrite"`` (default): copy-on-write — rewrites only the
        files that actually contain matching LIVE rows.

        ``mode="dv"``: deletion vectors (Delta's merge-on-read delete)
        — NO data file is rewritten; each touched file gains/extends a
        small sidecar of deleted row positions that every read
        anti-joins out. The write cost is O(matched rows), not O(rows
        in the files they live in): deleting 100 rows scattered across
        a 100 TB table writes a few KB. Reads of DV-carrying files pay
        the anti-join until ``compact()`` (or any copy-on-write rewrite
        of the file) materializes the delete and drops the vector —
        the standard write-fast/read-later trade, chosen per delete."""
        if mode not in ("rewrite", "dv"):
            raise TxError(f"delete mode: {mode!r}")
        m = self._manifest()
        if mode == "dv":
            return self._delete_dv(m, condition)
        touched = self._touched_by_predicate(m, condition)
        if not touched:
            return {"files_rewritten": 0, "rows_deleted": 0, "version": m["version"]}
        before = sum(_live(f) for f in m["files"] if f["path"] in set(touched))
        kept_rows = self._read_files(m, touched).filter(
            ~F.coalesce(condition, F.lit(False))
        )
        out = self._cow_commit(m, "delete", touched, kept_rows, {},
                               conflict="any")
        out["rows_deleted"] = (
            0 if out.get("skipped") else before - out.get("rows_written", 0)
        )
        return out

    def _dv_entries(self, m: dict, pos: DataFrame):
        """Fold live positions ``pos`` (fname, ri) into per-file
        deletion vectors: writes ONE merged sidecar per touched data
        file (old vector ∪ new positions — vectors stay
        one-file-per-data-file, superseded sidecars become vacuum
        food) and returns ``(new_file_list, n_newly_deleted)``, or
        None when no position matched.

        r14 (guide §2.1/§2.2): ONE Spark job total. The new positions
        write straight out partitioned by file (``partitionBy`` without
        a repartition — no shuffle; a scan task writes the fnames it
        holds), the touched files are read OFF THE WRITE'S OWN
        partition dirs instead of a separate distinct-fnames collect
        job over the same scan, and each touched file's old vector
        joins by a driver-side pyarrow concat (sidecars are per-file
        and small — KBs; the bulk positions still never visit the
        driver).

        r15 (guide §5 — bound driver-side work): a partition dir with
        ONE part file and NO old vector needs no merge at all — the
        staged file IS the sidecar, ``os.replace`` it (row count from
        its footer, no read). And above
        ``SPARK_GRAFT_DV_DRIVER_MERGE_MAX`` touched files the per-file
        read+concat+write loop would serialize 10⁵-10⁶ tiny IOs on the
        driver (a hash-spread delete at 100 TB), so the old∪new merge
        runs DISTRIBUTED instead: one repartition("pf") job writes one
        merged sidecar per touched file and the driver only renames."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        dv_schema = pa.schema([("fname", pa.string()), ("ri", pa.int64())])
        by_name = {os.path.basename(f["path"]): f for f in m["files"]}
        # partition dirs keyed by a DUPLICATE of fname so the position
        # rows keep fname inside the file
        staging = self.root / f"_staging-{uuid.uuid4().hex[:12]}"
        (
            pos.withColumn("pf", F.col("fname"))
            .write.partitionBy("pf")
            .parquet(str(staging))
        )
        new_dv: dict[str, dict] = {}
        old_deleted = 0
        try:
            part_dirs = sorted(staging.glob("pf=*"))
            if not part_dirs:
                return None
            if len(part_dirs) > DV_DRIVER_MERGE_MAX:
                new_dv = self._dv_merge_distributed(by_name, staging, part_dirs)
                part_dirs = []
            for part_dir in part_dirs:
                name = part_dir.name[3:]
                parts = [
                    p
                    for p in sorted(part_dir.iterdir())
                    if p.is_file() and not p.name.startswith(("_", "."))
                ]
                old = by_name[name].get("dv")
                final = self.data_dir / f"{uuid.uuid4().hex}.dv.parquet"
                if len(parts) == 1 and old is None:
                    # already a complete sidecar: claim the file as-is
                    n_rows = pq.ParquetFile(str(parts[0])).metadata.num_rows
                    os.replace(parts[0], final)
                    new_dv[name] = {
                        "path": f"{DATA_DIR}/{final.name}",
                        "rows": n_rows,
                    }
                    continue
                tabs = [
                    pq.read_table(str(p), columns=["fname", "ri"])
                    .cast(dv_schema)
                    for p in parts
                ]
                if old:
                    tabs.append(
                        pq.read_table(
                            str(self.root / old["path"]),
                            columns=["fname", "ri"],
                        ).cast(dv_schema)
                    )
                merged = pa.concat_tables(tabs)
                pq.write_table(merged, str(final))
                new_dv[name] = {
                    "path": f"{DATA_DIR}/{final.name}",
                    "rows": merged.num_rows,
                }
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        files = []
        for f in m["files"]:
            name = os.path.basename(f["path"])
            if name in new_dv:
                old_deleted += f.get("dv", {}).get("rows", 0)
                f = {k: v for k, v in f.items() if k != "dv"}
                f["dv"] = new_dv[name]
            files.append(f)
        n_deleted = sum(d["rows"] for d in new_dv.values()) - old_deleted
        return files, n_deleted

    def _dv_merge_distributed(
        self, by_name: dict, staging: Path, part_dirs: list
    ) -> dict[str, dict]:
        """The bounded-driver sidecar merge for deletes touching MORE
        files than the per-file driver loop should serialize (guide §5:
        the driver does no data work): ONE Spark job reads the staged
        new positions plus the touched files' OLD vectors, shuffles by
        file (repartition — one merged sidecar per touched file) and
        writes them out; the driver only renames the results into
        data/ and takes row counts from a manifest-bounded collect.
        Returns the ``new_dv`` entry map (old vectors already folded
        in)."""
        names = [d.name[3:] for d in part_dirs]
        merged = self.spark.read.schema(
            "fname string, ri long, pf string"
        ).parquet(str(staging)).select("fname", "ri", "pf")
        old_paths = [
            str(self.root / by_name[n]["dv"]["path"])
            for n in names
            if by_name[n].get("dv")
        ]
        if old_paths:
            merged = merged.unionByName(
                self.spark.read.schema("fname string, ri long")
                .parquet(*old_paths)
                .withColumn("pf", F.col("fname"))
            )
        merged = merged.repartition("pf").localCheckpoint(eager=False)
        out = staging / "_merged"
        merged.write.partitionBy("pf").parquet(str(out))
        counts = {
            r["pf"]: r["n"]
            for r in merged.groupBy("pf").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        new_dv: dict[str, dict] = {}
        for part_dir in sorted(out.glob("pf=*")):
            name = part_dir.name[3:]
            parts = [
                p
                for p in sorted(part_dir.iterdir())
                if p.is_file() and not p.name.startswith(("_", "."))
            ]
            final = self.data_dir / f"{uuid.uuid4().hex}.dv.parquet"
            os.replace(parts[0], final)
            new_dv[name] = {
                "path": f"{DATA_DIR}/{final.name}",
                "rows": counts[name],
            }
        return new_dv

    def _fold_dense_dvs(self, m: dict, files: list[dict]):
        """Auto-compaction for merge-on-read: any file whose deletion
        vector has reached ``dv_fold_threshold`` of its rows is
        rewritten WITHOUT the deleted rows (vector dropped) inside the
        same commit that would have grown it — Delta's
        auto-compact/vector-fold behavior. Keeps trickle-CDC read cost
        bounded (the read-side anti-join only ever sees sparse
        vectors) while write amplification between folds stays
        O(batch). Returns ``(files', n_folded)``."""
        thr = self.dv_fold_threshold
        dense = [
            f
            for f in files
            if "dv" in f and f["dv"]["rows"] >= thr * f["rows"]
        ]
        if not dense:
            return files, 0
        live = self._read_files(
            dict(m, files=files), [f["path"] for f in dense]
        )
        new_files = self._write_files(live, m["key"], m.get("stats_cols"))
        dropped = {f["path"] for f in dense}
        return [f for f in files if f["path"] not in dropped] + new_files, len(
            dense
        )

    def _delete_dv(self, m: dict, condition) -> dict:
        # no checkpoint: _dv_entries consumes pos in its single write
        # job (r14) — pinning it would just add a block-materialize job
        pos = self._read_with_positions(m, [f["path"] for f in m["files"]]).filter(
            F.coalesce(condition, F.lit(False))
        ).select(
            F.col("__tx_fname").alias("fname"), F.col("__tx_ri").alias("ri")
        )
        res = self._dv_entries(m, pos)
        if res is None:
            return {"files_rewritten": 0, "rows_deleted": 0, "version": m["version"]}
        files, n_deleted = res
        files, n_folded = self._fold_dense_dvs(m, files)
        self._commit(
            m["version"] + 1,
            "delete",
            files,
            m["schema"],
            m["key"],
            {"rows_deleted": n_deleted, "dv": True, "files_rewritten": 0,
             "files_folded": n_folded},
            m.get("txns", {}),
            m.get("checks", {}),
            m.get("stats_cols"),
        )
        return {
            "files_rewritten": 0,
            "files_folded": n_folded,
            "rows_deleted": n_deleted,
            "version": m["version"] + 1,
        }

    def update(self, condition, assignments: dict, mode: str = "rewrite") -> dict:
        """UPDATE table SET col=expr WHERE condition.

        ``mode="rewrite"``: copy-on-write — same touched-file discovery
        as delete; unmatched rows in touched files carry through
        unchanged.

        ``mode="dv"``: merge-on-read — the matched rows' positions join
        their files' deletion vectors and the post-image rows append as
        new files, all in ONE commit. Write cost O(matched rows); the
        cold rows of the touched files are never rewritten."""
        if mode not in ("rewrite", "dv"):
            raise TxError(f"update mode: {mode!r}")
        m = self._manifest()
        bad = set(assignments) - set(_schema_cols(m))
        if bad:
            raise TxError(f"update of unknown column(s): {sorted(bad)}")
        cond = F.coalesce(condition, F.lit(False))
        if mode == "dv":
            matched = (
                self._read_with_positions(m, [f["path"] for f in m["files"]])
                .filter(cond)
                .localCheckpoint(eager=False)
            )
            pos = matched.select(
                F.col("__tx_fname").alias("fname"), F.col("__tx_ri").alias("ri")
            )
            res = self._dv_entries(m, pos)
            if res is None:
                return {"files_rewritten": 0, "rows_updated": 0,
                        "version": m["version"]}
            files, n = res
            files, n_folded = self._fold_dense_dvs(m, files)
            post = matched.select(
                *[
                    assignments[c].alias(c) if c in assignments else F.col(c)
                    for c in _schema_cols(m)
                ]
            )
            new_files = self._write_files(
                _checked(post, m.get("checks")), m["key"], m.get("stats_cols")
            )
            self._commit(
                m["version"] + 1,
                "update",
                files + new_files,
                m["schema"],
                m["key"],
                {"rows_updated": n, "dv": True, "files_rewritten": 0,
                 "files_folded": n_folded},
                m.get("txns", {}),
                m.get("checks", {}),
                m.get("stats_cols"),
            )
            return {"files_rewritten": 0, "rows_updated": n,
                    "version": m["version"] + 1}
        touched = self._touched_by_predicate(m, condition)
        if not touched:
            return {"files_rewritten": 0, "version": m["version"]}
        cur = self._read_files(m, touched)
        updated = cur.select(
            *[
                (
                    F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                    if c in assignments
                    else F.col(c)
                )
                for c in cur.columns
            ]
        )
        return self._cow_commit(m, "update", touched, updated, {},
                                conflict="any")

    def merge(
        self,
        source: DataFrame,
        when_matched: str | None = "update",
        when_not_matched: str | None = "insert",
        matched_condition=None,
        txn: tuple[str, int] | None = None,
        mode: str = "rewrite",
        merge_schema: bool = False,
    ) -> dict:
        """MERGE INTO table USING source ON table.key = source.key —
        Delta-style upsert with file-level pruning.

        ``merge_schema=True`` is Delta's automatic schema evolution for
        MERGE: the source may carry NEW columns — the table schema
        widens with them (nullable), unmatched target rows and all
        pre-evolution files read them back NULL, and existing columns
        must keep their exact types.

        ``when_matched``: "update" (replace the whole row with the
        source row, optionally gated on ``matched_condition``),
        "delete", or None (leave matched rows alone).
        ``when_not_matched``: "insert" or None.

        Source contract (enforced in-plan, single pass): the key is
        non-null and unique within the source — multiple source rows
        for one target key is ambiguous and raises, exactly like Delta.

        ``mode="rewrite"`` (copy-on-write): only files whose footer key
        range intersects a source key are read or rewritten; inserts
        cannot hide in unread files because a file whose range excludes
        a key provably does not contain it.

        ``mode="dv"`` (merge-on-read): matched pre-image positions join
        their files' deletion vectors, updated+inserted rows append as
        new files, one commit. Write cost O(source rows), independent
        of how many cold rows share files with the matched keys — the
        CDC-ingest shape at 100 TB: a trickle merge into a huge
        key-clustered table writes KBs, and ``compact()`` amortizes the
        read-side anti-join on whatever cadence the table owner picks.
        """
        if mode not in ("rewrite", "dv"):
            raise TxError(f"merge mode: {mode!r}")
        m = self._manifest()
        skip, txns = _fence(m, txn)
        if skip:
            return {"files_rewritten": 0, "version": m["version"], "skipped": True}
        key = m["key"]
        if key is None:
            raise TxError("merge requires a table created with key=...")
        if merge_schema:
            schema_json = _evolve_schema(m, source)
        else:
            schema_json = m["schema"]
            if set(source.columns) != set(_schema_cols(m)):
                raise TxError(
                    f"merge source columns {sorted(source.columns)} != table "
                    f"columns {sorted(_schema_cols(m))}"
                )
        want_kt = {
            f["name"]: f["type"] for f in json.loads(m["schema"])["fields"]
        }[key]
        have_kt = {
            f["name"]: f for f in source.schema.jsonValue()["fields"]
        }
        if have_kt[key]["type"] != want_kt:
            raise TxError(
                f"merge key dtype mismatch: table {key}:{want_kt} vs "
                f"source {key}:{have_kt[key]['type']} — an implicit cast "
                "would silently break file-range pruning"
            )
        if when_matched not in ("update", "delete", None):
            raise TxError(f"when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", None):
            raise TxError(f"when_not_matched: {when_not_matched!r}")

        # in-plan source contract: null keys and duplicate keys raise at
        # execution time without a separate validation job
        kw = Window.partitionBy(key)
        src = (
            source.withColumn("__tx_n", F.count(F.lit(1)).over(kw))
            .withColumn(
                "__tx_guard",
                F.when(
                    F.col(key).isNull(),
                    F.raise_error(F.lit("merge: NULL key in source")),
                )
                .when(
                    F.col("__tx_n") > 1,
                    F.raise_error(
                        F.lit("merge: duplicate keys in source — ambiguous")
                    ),
                )
                .otherwise(F.lit(1)),
            )
            .filter(F.col("__tx_guard") == 1)
            .drop("__tx_n", "__tx_guard")
            .localCheckpoint(eager=False)
        )

        touched = self._touched_by_keys(m, src)
        cols = [f["name"] for f in json.loads(schema_json)["fields"]]
        if mode == "dv":
            return self._merge_dv(
                m, src, touched, when_matched, when_not_matched,
                matched_condition, txns, schema_json,
            )
        target = self._read_files(m, touched)
        for c in cols:  # evolved columns: target rows read them as NULL
            if c not in target.columns:
                target = target.withColumn(
                    c, F.lit(None).cast(source.schema[c].dataType)
                )
        target = target.alias("t")
        s = src.alias("s")
        joined = target.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "left")
        matched = F.col(f"s.{key}").isNotNull()
        if matched_condition is not None:
            matched = matched & F.coalesce(matched_condition, F.lit(False))
        if when_matched == "update":
            rewritten = joined.select(
                *[
                    F.when(matched, F.col(f"s.{c}"))
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                    for c in cols
                ]
            )
        elif when_matched == "delete":
            rewritten = joined.filter(~matched).select(
                *[F.col(f"t.{c}").alias(c) for c in cols]
            )
        else:
            rewritten = joined.select(*[F.col(f"t.{c}").alias(c) for c in cols])

        if when_not_matched == "insert":
            # keys absent from the TOUCHED slice are absent from the
            # table: untouched files' ranges exclude every source key
            inserts = s.join(
                target.select(F.col(f"t.{key}").alias("__tx_tk")),
                F.col(f"s.{key}") == F.col("__tx_tk"),
                "left_anti",
            ).select(*cols)
            rewritten = rewritten.unionByName(inserts)

        before = sum(_live(f) for f in m["files"] if f["path"] in set(touched))
        out = self._cow_commit(
            m, "merge", touched, rewritten, {}, txns, schema_json=schema_json,
            conflict=("keys", src.select(key)),
        )
        # from replacement-file metadata, NOT a row_count diff — exact
        # even when a rebase carried a foreign append into the manifest
        out["rows_delta"] = (
            0 if out.get("skipped") else out.get("rows_written", 0) - before
        )
        return out

    def _merge_dv(
        self, m, src, touched, when_matched, when_not_matched,
        matched_condition, txns, schema_json=None,
    ) -> dict:
        """Merge-on-read MERGE: matched pre-images go into deletion
        vectors, updated/inserted rows append — no touched file is
        rewritten. The key-uniqueness guard in ``src`` still applies
        (it rides the checkpointed plan)."""
        key = m["key"]
        schema_json = m["schema"] if schema_json is None else schema_json
        cols = [f["name"] for f in json.loads(schema_json)["fields"]]
        tpos = self._read_with_positions(m, touched).alias("t")
        s = src.alias("s")
        gate = F.lit(True)
        if matched_condition is not None:
            gate = F.coalesce(matched_condition, F.lit(False))
        new_rows = None
        pos = local_rows(self.spark, [], "fname string, ri long")
        if when_matched in ("update", "delete"):
            hit = (
                tpos.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "inner")
                .filter(gate)
                .localCheckpoint(eager=False)
            )
            pos = hit.select(
                F.col("t.__tx_fname").alias("fname"),
                F.col("t.__tx_ri").alias("ri"),
            )
            if when_matched == "update":
                new_rows = hit.select(*[F.col(f"s.{c}").alias(c) for c in cols])
        if when_not_matched == "insert":
            inserts = s.join(
                tpos.select(F.col(f"t.{key}").alias("__tx_tk")),
                F.col(f"s.{key}") == F.col("__tx_tk"),
                "left_anti",
            ).select(*cols)
            new_rows = (
                inserts if new_rows is None else new_rows.unionByName(inserts)
            )
        res = self._dv_entries(m, pos)
        files, n_deleted = res if res is not None else (m["files"], 0)
        files, n_folded = self._fold_dense_dvs(m, files)
        new_files = (
            self._write_files(
                _checked(new_rows, m.get("checks")), key, m.get("stats_cols")
            )
            if new_rows is not None
            else []
        )
        n_added = sum(f["rows"] for f in new_files)
        if res is None and not new_files and txns == m.get("txns", {}):
            return {"files_rewritten": 0, "rows_delta": 0,
                    "version": m["version"]}
        self._commit(
            m["version"] + 1,
            "merge",
            files + new_files,
            schema_json,
            key,
            {"rows_delta": n_added - n_deleted, "dv": True,
             "files_rewritten": 0, "files_folded": n_folded},
            txns,
            m.get("checks", {}),
            m.get("stats_cols"),
        )
        return {
            "files_rewritten": 0,
            "files_folded": n_folded,
            "rows_delta": n_added - n_deleted,
            "version": m["version"] + 1,
        }

    def rewrite_by_keys(
        self, keys: DataFrame, transform, txn: tuple[str, int] | None = None
    ) -> dict:
        """Generic key-pruned copy-on-write: read ONLY the files that
        may contain a key from ``keys`` (the table's merge key column),
        hand that slice to ``transform(slice_df) -> DataFrame``, and
        commit its result in place of the touched files.

        Correctness contract: an untouched file provably contains no
        row whose key appears in ``keys`` (its footer range excludes
        them all), so any transform whose effect is confined to those
        keys' rows — SCD1 upsert, SCD2 expire+version, GDPR erasure —
        is EXACT when applied to the slice. This is how the snapshot
        path's pure functions (operators/scd.py) run at file-level cost
        on a 100 TB dimension: same function, O(touched files) IO.

        ``txn`` fences the rewrite like append/merge — essential for
        NON-idempotent transforms (additive deltas): the fence commits
        in the same manifest as the rewritten files, so a crash replay
        can never double-apply the delta.
        """
        m = self._manifest()
        skip, txns = _fence(m, txn)
        if skip:
            return {"files_rewritten": 0, "version": m["version"], "skipped": True}
        if m["key"] is None:
            raise TxError("rewrite_by_keys requires a table created with key=...")
        touched = self._touched_by_keys(m, keys)
        replacement = transform(self._read_files(m, touched))
        return self._cow_commit(
            m, "rewrite", touched, replacement, {}, txns,
            conflict=("keys", keys.select(m["key"])),
        )

    def merge_by_keys(
        self, keys: DataFrame, transform, txn: tuple[str, int] | None = None
    ) -> dict:
        """Merge-on-read twin of ``rewrite_by_keys`` — the SAME
        key-confined transform contract, committed without rewriting
        any touched file: the keys' OLD rows go into deletion vectors
        and the transform's output appends as new files, in ONE fused
        fenced commit. Write cost is O(keys' rows + transform output),
        not O(rows sharing files with them) — the difference between
        O(churn) and O(view) when a refresh's touched keys are
        hash-spread across every file of a high-cardinality table.

        The transform receives ONLY the keys' current rows (a
        key-confined transform is the identity on every other row, so
        the passthrough rows would only inflate its join); a key absent
        from its output is deleted — count-to-zero groups leave exactly
        like the rewrite path. Because dv growth, appended files and
        the fence land in one manifest, a NON-idempotent transform
        (additive delta) can never double-apply across a crash — the
        same guarantee ``rewrite_by_keys`` gives. Dense vectors fold in
        the same commit (``_fold_dense_dvs``), bounding the read-side
        anti-join; change-feed reads pair this commit's dv pre-images
        with its appended post-images exactly like a dv MERGE."""
        m = self._manifest()
        skip, txns = _fence(m, txn)
        if skip:
            return {"files_rewritten": 0, "version": m["version"], "skipped": True}
        key = m["key"]
        if key is None:
            raise TxError("merge_by_keys requires a table created with key=...")
        touched = self._touched_by_keys(m, keys)
        kdf = keys.select(F.col(key).alias("__tx_mk"))
        old = (
            self._read_with_positions(m, touched)
            .join(
                F.broadcast(kdf),
                F.col(key).eqNullSafe(F.col("__tx_mk")),
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )
        pos = old.select(
            F.col("__tx_fname").alias("fname"), F.col("__tx_ri").alias("ri")
        )
        replacement = transform(old.drop("__tx_fname", "__tx_ri"))
        cols = _schema_cols(m)
        new_files = self._write_files(
            _checked(replacement.select(*cols), m.get("checks")),
            key,
            m.get("stats_cols"),
        )
        res = self._dv_entries(m, pos)
        if res is None and not new_files and txns == m.get("txns", {}):
            return {"files_rewritten": 0, "rows_delta": 0,
                    "version": m["version"]}
        files, n_deleted = res if res is not None else (m["files"], 0)
        files, n_folded = self._fold_dense_dvs(m, files)
        n_added = sum(f["rows"] for f in new_files)
        try:
            self._commit(
                m["version"] + 1,
                "rewrite",
                files + new_files,
                m["schema"],
                key,
                {"rows_delta": n_added - n_deleted, "dv": True,
                 "files_rewritten": 0, "files_folded": n_folded},
                txns,
                m.get("checks", {}),
                m.get("stats_cols"),
            )
        except TxConflictError:
            # a concurrent duplicate of the same fenced txn already
            # landed: this op's effect is committed — degrade to a
            # skip (the refresh-race contract rewrite_by_keys honors
            # via _cow_commit). Any OTHER winner invalidates the dv
            # entries computed against our base snapshot — re-raise.
            latest = self._manifest()
            for app, ver in txns.items():
                if m.get("txns", {}).get(app) != ver and (
                    latest.get("txns", {}).get(app, -(1 << 62)) >= ver
                ):
                    return {
                        "files_rewritten": 0,
                        "version": latest["version"],
                        "skipped": True,
                    }
            raise
        return {
            "files_rewritten": 0,
            "files_folded": n_folded,
            "rows_delta": n_added - n_deleted,
            "version": m["version"] + 1,
        }

    def restore(self, version: int) -> dict:
        """RESTORE TABLE TO VERSION — a NEW commit re-pinning the old
        version's file list, schema, key, and constraints (txn fences
        carry forward: restore rewinds data, never delivery state, or a
        restored stream would re-ingest every fenced batch). History is
        preserved; the restored-from version must still be on disk."""
        m_old = self._manifest(version)
        m = self._manifest()
        self._commit(
            m["version"] + 1,
            "restore",
            m_old["files"],
            m_old["schema"],
            m_old["key"],
            {"restored_from": version},
            m.get("txns", {}),
            m_old.get("checks", {}),
            m_old.get("stats_cols"),
        )
        return {"version": m["version"] + 1, "restored_from": version}

    # ----------------------------------------------------- constraints

    def add_constraint(self, name: str, predicate: str) -> dict:
        """ALTER TABLE ADD CONSTRAINT CHECK (predicate) — Delta
        semantics: EXISTING rows are validated first (one scan; any row
        where the predicate is FALSE aborts with a sample), then the
        constraint joins the manifest and every later write enforces it
        in-plan (raise_error inside the write job — a violating batch
        commits nothing). NULL predicate results pass, like SQL CHECK."""
        m = self._manifest()
        checks = dict(m.get("checks", {}))
        if name in checks:
            raise TxError(f"constraint {name!r} already exists")
        bad = (
            self.read()
            .filter(~F.coalesce(F.expr(predicate), F.lit(True)))
            .limit(3)
            .collect()
        )
        if bad:
            raise TxError(
                f"cannot add constraint {name!r}: {len(bad)}+ existing "
                f"row(s) violate {predicate!r}, e.g. {bad[0].asDict()}"
            )
        checks[name] = predicate
        self._commit(
            m["version"] + 1, "add_constraint", m["files"], m["schema"],
            m["key"], {"constraint": name}, m.get("txns", {}), checks,
            m.get("stats_cols"),
        )
        return {"version": m["version"] + 1}

    def drop_constraint(self, name: str) -> dict:
        m = self._manifest()
        checks = dict(m.get("checks", {}))
        if name not in checks:
            raise TxError(f"no such constraint: {name!r}")
        del checks[name]
        self._commit(
            m["version"] + 1, "drop_constraint", m["files"], m["schema"],
            m["key"], {"constraint": name}, m.get("txns", {}), checks,
            m.get("stats_cols"),
        )
        return {"version": m["version"] + 1}

    # ---------------------------------------------------- maintenance

    def compact(
        self,
        target_files: int = 8,
        cluster: bool = False,
        zorder: list[str] | None = None,
    ) -> dict:
        """Rewrite the current snapshot into ``target_files`` files (an
        OPTIMIZE pass for tables fragmented by many small commits). A
        normal copy-on-write commit: time travel to pre-compaction
        versions still works until vacuum.

        ``cluster=True`` additionally range-partitions and sorts by the
        merge key (OPTIMIZE ... ZORDER's 1-key case): file key ranges
        come out (near-)disjoint, so a later merge of k clustered keys
        touches ~k/rows_per_file files instead of every file whose
        round-robin range happens to straddle them. This is the layout
        lever that makes copy-on-write pruning effective at 100 TB —
        stats are only as selective as the files are clustered.

        ``zorder=[c1, c2, ...]`` is the multi-dimension version
        (Delta's OPTIMIZE ... ZORDER BY): rows order by the Morton code
        of the columns — each column quantized to 256 uniform buckets
        between its global min/max, bucket bits interleaved — so file
        ranges come out tight in EVERY z-ordered dimension at once and
        ``read(prune=...)``/``key_between`` skip effectively on any of
        them. One tiny min/max agg job (2×len(zorder) scalars of model
        state) plus the rewrite itself; numeric/date/timestamp columns
        only. Uniform buckets trade skew-robustness for zero extra
        passes — a heavily skewed column wastes bucket resolution but
        never breaks correctness (stats stay exact per file)."""
        m = self._manifest()
        cur = self.read()
        if cluster and zorder:
            raise TxError("compact: cluster and zorder are exclusive")
        if cluster:
            if m["key"] is None:
                raise TxError("compact(cluster=True) requires a merge key")
            cur = cur.repartitionByRange(target_files, m["key"]).sortWithinPartitions(
                m["key"]
            )
        elif zorder:
            missing = set(zorder) - set(cur.columns)
            if missing:
                raise TxError(f"zorder column(s) not in table: {sorted(missing)}")
            bounds = cur.agg(
                *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(zorder)],
                *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(zorder)],
            ).first()
            k = len(zorder)
            z = F.lit(0).cast("long")
            for i, c in enumerate(zorder):
                lo, hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
                if lo is None or lo == hi:
                    continue  # constant or all-null column adds no order
                bucket = F.least(
                    F.greatest(
                        F.expr(
                            f"width_bucket(cast(`{c}` as double), {lo!r}, {hi!r}, 256) - 1"
                        ),
                        F.lit(0),
                    ),
                    F.lit(255),
                )
                bucket = F.coalesce(bucket, F.lit(0)).cast("long")
                for b in range(8):
                    z = z + F.shiftleft(
                        F.shiftright(bucket, b).bitwiseAND(F.lit(1)), b * k + i
                    )
            cur = (
                cur.withColumn("__tx_z", z)
                .repartitionByRange(target_files, "__tx_z")
                .sortWithinPartitions("__tx_z")
                .drop("__tx_z")
            )
        else:
            cur = cur.repartition(target_files)
        touched = [f["path"] for f in m["files"]]
        return self._cow_commit(m, "compact", touched, cur, {})

    #: files younger than this never vacuum by default. The hazard a
    #: short window invites: ``_write_files`` lands data under data/
    #: (and stages under _staging-*) BEFORE the manifest referencing it
    #: commits, so a concurrent vacuum with min_age_s≈0 deletes an
    #: in-flight writer's output as "orphans" — and if that writer then
    #: WINS the commit claim, the table references deleted files:
    #: silent data loss on read. Optimistic concurrency makes parallel
    #: writers the expected case, so the default must absorb any
    #: plausible write duration (Delta ships 7 days; one hour is ample
    #: for this engine's commit path, which stages for seconds).
    VACUUM_MIN_AGE_S = 3600.0
    _VACUUM_AGE_FLOOR_S = 600.0

    def compact_small(
        self, min_rows: int = 10_000, target_files: int = 1
    ) -> dict:
        """Incremental OPTIMIZE (Delta's bin-packing compaction):
        rewrite ONLY the files smaller than ``min_rows`` rows — plus any
        carrying a deletion vector, which gets materialized away — into
        ``target_files`` packed files. Large clean files are untouched,
        so the cost is O(small files), not O(table): the right
        maintenance for append-heavy tables (a fenced streaming sink or
        the tx fact) that accrue one small file-set per batch, where a
        full ``compact()`` would rewrite history every time. A normal
        copy-on-write commit: CDF-invisible (same logical rows), time
        travel intact, and the commit rebases past concurrent appends
        like any other rewrite."""
        m = self._manifest()
        small = [
            f for f in m["files"] if f["rows"] < min_rows or "dv" in f
        ]
        # nothing to gain from rewriting zero or one clean small file
        if not small or (len(small) == 1 and "dv" not in small[0]):
            return {"files_rewritten": 0, "version": m["version"]}
        touched = [f["path"] for f in small]
        packed = self._read_files(m, touched).coalesce(target_files)
        return self._cow_commit(m, "compact", touched, packed, {})

    def maintenance_plan(
        self,
        small_rows: int = 10_000,
        min_small_files: int = 4,
        dv_file_fraction: float = 0.25,
        stab_threshold: float = 3.0,
        reclaim_fraction: float = 0.5,
    ) -> dict:
        """What OPTIMIZE work this table needs, decided from the latest
        manifest plus local file metadata — ZERO Spark jobs (callable
        with ``TxTable(None, root)``, test-pinned). The metadata-driven
        half of an auto-OPTIMIZE loop (Delta's optimizeWrite/autoCompact
        decisions, here as an inspectable plan):

        - ``compact_small`` when >= ``min_small_files`` live files fall
          under ``small_rows`` rows (append-heavy fragmentation: every
          scan pays per-file open cost) OR when more than
          ``dv_file_fraction`` of live files carry a deletion vector
          (each one taxes every read with the merge-on-read anti-join;
          compact_small also materializes dvs away).
        - ``cluster`` when the mean key-range STABBING DEPTH — how many
          files an average point-probe key must open,
          sum(per-file key span) / overall span — exceeds
          ``stab_threshold`` with enough ranged files to matter.
          Footer stats are only as selective as the layout is
          clustered; this is the metric that says the layout, not the
          stats, is the bottleneck.
        - ``zorder`` when a declared NUMERIC ``stats_cols`` column has
          the same problem (deep stabbing over its per-file ``cs``
          ranges) and no key clustering is pending — e.g. an unkeyed
          append-only fact whose every batch spans all customers:
          ``read(prune={col: ...})`` and any join-view point probe on
          it open every file until a ``compact(zorder=[...])`` makes
          the ranges tight. All deep columns land in ONE recommended
          z-order (Morton interleave keeps every dimension selective).
          Suppressed while ``cluster`` is recommended — the key rewrite
          comes first; rerun the plan after.
        - ``vacuum`` when non-live bytes under the table root (aged-out
          versions + crash orphans) exceed ``reclaim_fraction`` of live
          bytes. REPORTED, never auto-run: retention must be sized to
          the slowest snapshot/stream/catalog consumer
          (``Warehouse.vacuum_tx`` is the snapshot-safe executor).

        Returns {"actions": [...], "stats": {...}} with one reasoned
        entry per recommended action."""
        m = self._manifest()
        files = m["files"]
        small = [f for f in files if f["rows"] < small_rows]
        dvf = [f for f in files if "dv" in f]
        ranged = [f for f in files if "kmin" in f]
        depth = None
        if len(ranged) >= 2:
            lo = min(f["kmin"] for f in ranged)
            hi = max(f["kmax"] for f in ranged)
            if hi > lo:
                depth = sum(f["kmax"] - f["kmin"] + 1 for f in ranged) / (
                    hi - lo + 1
                )
        live_paths = {f["path"] for f in files}
        live_b = dead_b = 0
        dead_n = 0
        if self.data_dir.is_dir():
            for p in self.data_dir.iterdir():
                if not p.is_file():
                    continue
                try:
                    sz = p.stat().st_size
                except OSError:
                    continue
                if f"{DATA_DIR}/{p.name}" in live_paths:
                    live_b += sz
                else:
                    dead_b += sz
                    dead_n += 1
        stats = {
            "files": len(files),
            "small_files": len(small),
            "dv_files": len(dvf),
            "stabbing_depth": None if depth is None else round(depth, 2),
            "live_bytes": live_b,
            "reclaimable_bytes": dead_b,
            "reclaimable_files": dead_n,
            "retained_versions": len(self._versions()),
        }
        actions = []
        if len(small) >= min_small_files or (
            files and len(dvf) / len(files) > dv_file_fraction
        ):
            actions.append(
                {
                    "action": "compact_small",
                    "args": {"min_rows": small_rows},
                    "reason": f"{len(small)} files under {small_rows} rows"
                    + (f", {len(dvf)} carrying deletion vectors" if dvf else ""),
                }
            )
        cluster_due = (
            depth is not None and depth > stab_threshold and len(ranged) >= 4
        )
        if cluster_due:
            actions.append(
                {
                    "action": "cluster",
                    "args": {"cluster": True},
                    "reason": f"mean key stabbing depth {depth:.1f} — a "
                    "point probe opens that many files; clustering makes "
                    "ranges (near-)disjoint",
                }
            )
        deep_cols = []
        col_depths = {}
        for col in m.get("stats_cols") or []:
            spans = [
                f["cs"][col]
                for f in files
                if isinstance(f.get("cs", {}).get(col, [None])[0], (int, float))
                and not isinstance(f["cs"][col][0], bool)
            ]
            if len(spans) < 4:
                continue
            lo = min(s[0] for s in spans)
            hi = max(s[1] for s in spans)
            if hi <= lo:
                continue
            cdepth = sum(s[1] - s[0] + 1 for s in spans) / (hi - lo + 1)
            col_depths[col] = round(cdepth, 2)
            if cdepth > stab_threshold:
                deep_cols.append(col)
        if col_depths:
            stats["stats_col_depths"] = col_depths
        if deep_cols and not cluster_due:
            actions.append(
                {
                    "action": "zorder",
                    "args": {"zorder": deep_cols},
                    "reason": "stats-column stabbing depth "
                    + ", ".join(
                        f"{c}={col_depths[c]:.1f}" for c in deep_cols
                    )
                    + " — prune= / join-view point probes open that many "
                    "files; a z-order rewrite makes the ranges tight",
                }
            )
        # bloom: a column whose per-file ranges each span (almost) the
        # whole domain — depth comparable to the FILE COUNT itself, the
        # hash-scattered/uuid-key signature. Clustering would tighten
        # the ranges but decays with every unsorted append; bloom
        # sidecars keep point probes selective regardless of layout.
        # Config is metadata-only, so maintain() runs it (sidecars then
        # arrive with the next writes / the compaction pass below).
        bloom_cols_due = []
        cfg_cols = (self.bloom_config() or {}).get("cols", [])
        if depth is not None and len(ranged) >= 4:
            if m["key"] not in cfg_cols and depth >= 0.5 * len(ranged):
                bloom_cols_due.append(m["key"])
        for col, cdepth in col_depths.items():
            n_spans = sum(1 for f in files if col in f.get("cs", {}))
            if col not in cfg_cols and cdepth >= 0.5 * n_spans:
                bloom_cols_due.append(col)
        stats["bloom_cols"] = cfg_cols
        # backfill: a bloom-enabled table whose live files mostly LACK
        # sidecars — files written BEFORE enable_bloom, or native-
        # writer batches whose bloom config appeared between plan and
        # commit (since r12 the native write tasks build sidecars
        # themselves, so this is the residual long tail, not every
        # native batch) — a rewrite builds them
        if cfg_cols and files:
            missing = sum(1 for f in files if "bloom" not in f)
            stats["bloom_missing_files"] = missing
            if missing / len(files) > 0.5 and len(files) >= 4:
                actions.append(
                    {
                        "action": "bloom_backfill",
                        "args": {},
                        "reason": f"{missing}/{len(files)} live files "
                        "carry no bloom sidecar (pre-enable files, or "
                        "a config that landed mid-write) — point "
                        "probes can't skip them until a rewrite "
                        "builds the filters",
                    }
                )
        if bloom_cols_due:
            actions.append(
                {
                    "action": "bloom",
                    "args": {"cols": sorted(set(cfg_cols) | set(bloom_cols_due))},
                    "reason": "per-file ranges on "
                    + ", ".join(bloom_cols_due)
                    + " each span most of the domain (depth ≈ file "
                    "count) — range stats can't prune point probes; "
                    "bloom sidecars stay selective under any layout",
                }
            )
        if live_b and dead_b > reclaim_fraction * live_b:
            actions.append(
                {
                    "action": "vacuum",
                    "args": {},
                    "reason": f"{dead_b} reclaimable vs {live_b} live bytes "
                    "(size retention to the slowest consumer; "
                    "Warehouse.vacuum_tx is the snapshot-safe path)",
                }
            )
        return {"actions": actions, "stats": stats}

    def maintain(self, plan: dict | None = None, **plan_kw) -> dict:
        """Execute the COMPACTION half of ``maintenance_plan`` (vacuum
        is reported but never auto-run — see the plan docstring). Runs
        ``compact_small`` before ``cluster`` so a clustering rewrite
        never re-reads files the bin-packing pass was about to fold.
        Returns per-action results plus the plan it executed."""
        plan = plan if plan is not None else self.maintenance_plan(**plan_kw)
        # bloom config lands FIRST so any rewrite in the same pass
        # builds the sidecars it just enabled
        order = {"bloom": 0, "compact_small": 1, "cluster": 2, "zorder": 2,
                 "bloom_backfill": 3}
        done: dict = {"plan": plan, "results": {}}
        for a in sorted(
            (a for a in plan["actions"] if a["action"] in order),
            key=lambda a: order[a["action"]],
        ):
            if a["action"] == "bloom":
                done["results"]["bloom"] = self.enable_bloom(
                    a["args"]["cols"]
                )
            elif a["action"] == "compact_small":
                done["results"]["compact_small"] = self.compact_small(
                    **a["args"]
                )
            elif a["action"] == "cluster":
                done["results"]["cluster"] = self.compact(cluster=True)
            elif a["action"] == "bloom_backfill":
                # skip when an earlier action in THIS pass already
                # rewrote everything (fresh files carry sidecars)
                m2 = self._manifest()
                if any("bloom" not in f for f in m2["files"]):
                    done["results"]["bloom_backfill"] = self.compact(
                        target_files=max(4, len(m2["files"]) // 2)
                    )
            else:
                done["results"]["zorder"] = self.compact(
                    zorder=a["args"]["zorder"]
                )
        return done

    def vacuum(
        self,
        retain_versions: int = 2,
        min_age_s: float = VACUUM_MIN_AGE_S,
        force: bool = False,
    ) -> dict:
        """Reclaim space: drop manifests older than the newest
        ``retain_versions`` and delete every data file referenced by no
        retained manifest (covers both aged-out versions and crash
        orphans that no manifest ever referenced). Files younger than
        ``min_age_s`` are kept — an in-flight writer's staged output is
        invisible but not yet referenced, and deleting it under a
        writer that then wins the commit race is silent data loss (see
        ``VACUUM_MIN_AGE_S``). ``min_age_s`` below the 600 s floor
        therefore requires ``force=True`` and a guarantee from the
        caller that no writer is concurrent (tests, single-process
        maintenance windows)."""
        if retain_versions < 1:
            raise TxError("retain_versions must be >= 1")
        if min_age_s < self._VACUUM_AGE_FLOOR_S and not force:
            raise TxError(
                f"vacuum(min_age_s={min_age_s}) is below the "
                f"{self._VACUUM_AGE_FLOOR_S:.0f}s safety floor: a "
                "concurrent writer's staged-but-uncommitted files would "
                "be deleted as orphans (data loss if it then wins the "
                "commit claim). Pass force=True only if no writer can "
                "be concurrent."
            )
        vs = self._versions()
        keep_vs = vs[-retain_versions:]
        referenced = set()
        ref_blooms = set()
        for v in keep_vs:
            for f in self._manifest(v)["files"]:
                referenced.add(os.path.basename(f["path"]))
                if "dv" in f:
                    referenced.add(os.path.basename(f["dv"]["path"]))
                if "bloom" in f:
                    ref_blooms.add(os.path.basename(f["bloom"]))
        dropped_manifests = 0
        for v in vs[:-retain_versions]:
            (self.log_dir / _mname(v)).unlink(missing_ok=True)
            dropped_manifests += 1
        now = time.time()
        dropped_files = 0
        for item in self.data_dir.iterdir():
            if not item.is_file() or item.name in referenced:
                continue
            if now - item.stat().st_mtime < min_age_s:
                continue
            item.unlink()
            dropped_files += 1
        # crash-leftover staging dirs (never referenced by anything)
        for item in self.root.iterdir():
            if item.is_dir() and item.name.startswith("_staging-"):
                if now - item.stat().st_mtime >= min_age_s:
                    shutil.rmtree(item, ignore_errors=True)
        # bloom sidecar dirs referenced by no retained manifest (aged
        # out with their batch's files, or a crashed write's orphans)
        dropped_blooms = 0
        dropped_bloom_parts = 0
        bdir = self.root / BLOOMS_DIR
        if bdir.is_dir():
            for item in bdir.iterdir():
                if not item.is_dir():
                    continue
                if item.name not in ref_blooms:
                    if now - item.stat().st_mtime < min_age_s:
                        continue
                    shutil.rmtree(item, ignore_errors=True)
                    dropped_blooms += 1
                    continue
                # inside a REFERENCED dir, a failed/retried write task
                # can leave a part whose 'f' basenames match no
                # retained manifest entry (the retry landed its own
                # part; the orphan can never cause false pruning but
                # would otherwise be unreclaimable forever). Reading
                # one string column per part is footer-cheap.
                for part in item.iterdir():
                    if (
                        not part.is_file()
                        or not part.name.endswith(".parquet")
                        or now - part.stat().st_mtime < min_age_s
                    ):
                        continue
                    try:
                        import pyarrow.parquet as _pq

                        fnames = set(
                            _pq.read_table(str(part), columns=["f"])
                            .column("f")
                            .to_pylist()
                        )
                    except Exception:
                        continue  # unreadable ≠ deletable
                    if fnames and fnames.isdisjoint(referenced):
                        part.unlink(missing_ok=True)
                        dropped_bloom_parts += 1
        return {
            "dropped_manifests": dropped_manifests,
            "dropped_files": dropped_files,
            "dropped_blooms": dropped_blooms,
            "dropped_bloom_parts": dropped_bloom_parts,
        }


# ------------------------------------------------------------- helpers


def _live(f: dict) -> int:
    """A manifest entry's live row count (file rows minus DV rows)."""
    return f["rows"] - f.get("dv", {}).get("rows", 0)


def _checked(df: DataFrame, checks: dict | None) -> DataFrame:
    """Weave CHECK-constraint enforcement into the write plan: a row
    where any predicate is FALSE raises inside the write job (nothing
    commits), NULL results pass (SQL CHECK semantics). Zero extra jobs
    — the same minted raise_error pattern as the surrogate-key bound."""
    if not checks:
        return df
    guard = F.lit(1)
    for name, predicate in sorted(checks.items()):
        ok = F.coalesce(F.expr(predicate), F.lit(True))
        guard = F.when(
            ~ok,
            F.raise_error(
                F.lit(f"CHECK constraint {name!r} violated: {predicate}")
            ).cast("int"),
        ).otherwise(guard)
    return (
        df.withColumn("__tx_chk", guard)
        .filter(F.col("__tx_chk") == 1)
        .drop("__tx_chk")
    )


def _evolve_schema(manifest: dict, df: DataFrame) -> str:
    return _evolve_schema_json(manifest, _schema_json(df.schema))


def _evolve_schema_json(manifest: dict, schema_json: str) -> str:
    """mergeSchema append: widen the table schema with the batch's NEW
    columns (nullable). Existing columns must keep their exact types
    and must all be present in the batch."""
    have = {f["name"]: f for f in json.loads(manifest["schema"])["fields"]}
    batch = json.loads(schema_json)
    batch_by_name = {f["name"]: f for f in batch["fields"]}
    missing = set(have) - set(batch_by_name)
    if missing:
        raise TxError(
            f"merge_schema append must still carry every existing "
            f"column; missing {sorted(missing)}"
        )
    for name, f in batch_by_name.items():
        if name in have and f["type"] != have[name]["type"]:
            raise TxError(
                f"merge_schema cannot change column {name!r}: "
                f"{have[name]['type']} -> {f['type']}"
            )
    evolved = {
        "type": "struct",
        "fields": list(have.values())
        + [f for n, f in batch_by_name.items() if n not in have],
    }
    return json.dumps(evolved)


def _fence(manifest: dict, txn: tuple[str, int] | None):
    """Idempotence fence (Delta txnAppId/txnVersion): returns
    ``(skip, new_txns)``. A txn at or below the app's highest committed
    version is a replay — skip without writing. Fence state rides the
    manifest, so the check-and-advance is atomic with the commit itself
    (a concurrent duplicate loses the os.link race and re-checks)."""
    txns = dict(manifest.get("txns", {}))
    if txn is None:
        return False, txns
    app, ver = txn
    if not isinstance(ver, int):
        raise TxError(f"txn version must be an int, got {ver!r}")
    if txns.get(app, -(1 << 62)) >= ver:
        return True, txns
    txns[app] = ver
    return False, txns


def _schema_json(schema: StructType) -> str:
    # parquet round-trips everything as nullable; normalizing avoids a
    # spurious schema mismatch on the first append after create
    relaxed = StructType(
        [type(f)(f.name, f.dataType, True, f.metadata) for f in schema.fields]
    )
    return json.dumps(relaxed.jsonValue())


def _schema_cols(manifest: dict) -> list[str]:
    return [f["name"] for f in json.loads(manifest["schema"])["fields"]]


def _check_schema(manifest: dict, df: DataFrame) -> None:
    want = json.loads(_schema_json(df.schema))
    have = json.loads(manifest["schema"])
    if want != have:
        raise TxError(
            "append schema mismatch: table "
            f"{StructType.fromJson(have).simpleString()} vs batch "
            f"{StructType.fromJson(want).simpleString()}"
        )


def _footer_nulls(md, col: str):
    """Total null count of ``col`` across the file's row groups from
    footer statistics, or None when any row group lacks the stat
    (absent = unknown; callers must stay conservative)."""
    total = 0
    seen = False
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema != col:
                continue
            seen = True
            st = c.statistics
            if st is None or st.null_count is None:
                return None
            total += st.null_count
    return total if seen else None


def _footer_range(md, col: str):
    """(min, max) of ``col`` across the file's row groups from footer
    statistics, or None when unusable. INT32/INT64 physical only — the
    same exactness contract as ``Warehouse.footer_max`` (string footer
    stats may be truncated bounds, which would corrupt pruning)."""
    lo = hi = None
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema != col:
                continue
            if c.physical_type not in ("INT32", "INT64"):
                return None
            st = c.statistics
            if st is None or not st.has_min_max:
                return None
            # pyarrow surfaces LOGICAL values: a DATE32 column (INT32
            # physical) yields datetime.date here — only plain integers
            # join the long-typed pruning frame
            if not isinstance(st.min, int) or not isinstance(st.max, int):
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (int(lo), int(hi))
