"""``txtable`` — BATCH reads AND writes of the transactional table
format as a first-class Spark data source (Spark 4 Python Data Source
API), with manifest-statistics file skipping driven by Catalyst's
pushed filters.

``sources/txcdf.py`` already makes the table's change feed a native
*streaming* source; this module is the snapshot half of the same
packaging: register once, then the tx layer is consumable from plain
DataFrame/SQL code with no ``TxTable`` import on the query side —

    spark.dataSource.register(TxBatchDataSource)
    df = (spark.read.format("txtable")
          .option("path", table_root)
          .option("versionAsOf", 7)        # or timestampAsOf
          .load())
    df.createOrReplaceTempView("sales")    # full Spark SQL from here

    out.write.format("txtable").option("path", table_root) \\
       .mode("append").save()              # ACID append (TxBatchWriter)

Reference parity: the reference exposes every warehouse table to any
SQL client through the Postgres catalog (readme.md "Data Analysis"
section); this source is the Spark-native equivalent for the
transactional layer — ``TxTable.read()`` needs the library,
``format("txtable")`` needs only the registered name.

Execution shape (the 100 TB contract):

- the DRIVER plans from the commit manifest only — O(live files)
  metadata, no listing, no footer reads (footer stats were hoisted
  into the manifest at write time);
- Catalyst pushes the query's conjunctive predicates down
  (``pushFilters``); any comparison/equality/IN/NULL test on the
  table's key or declared ``stats_cols`` prunes files against the
  manifest's exact integer [min, max] (+ null-count) stats BEFORE
  Spark sees a path — Delta-style data skipping, so a key-range query
  on a z-ordered 100 TB table opens the few straddling files, not the
  table. Every filter is also RETURNED to Spark as unsupported:
  file-granularity skipping is approximate (straddling files carry
  out-of-range rows), so Spark re-applies the exact predicate above
  the scan. Correctness never depends on the pruning;
- each surviving live file is one ``InputPartition``; EXECUTORS read
  parquet (and the file's deletion-vector sidecar) with pyarrow and
  emit Arrow record batches — columnar end to end, no Python row
  loop, no SparkSession on the executor. Deletion vectors apply as a
  sorted-position ``setdiff`` + ``take``, the merge-on-read half of
  DV deletes at file scope;
- schema is pinned to the requested snapshot's manifest; files
  written before a schema evolution NULL-fill the evolved columns
  (same rule as ``TxTable._read_files``).

File skipping is OPT-IN per load — ``.option("pruneFiles", "true")``
— because of a measured Spark 4.1 sharp edge this module refuses to
expose by default: the JVM caches a Python source's planned read
(partitions + read function) on the relation and re-plans ONLY when
the new query has filters to push, so a filter-LESS query issued
against the same DataFrame or temp view after a filtered one reuses
the stale filter-pruned partition list and silently drops rows. (The
probe in tests/test_txbatch_source.py pins it: count → filter.count →
count on one DataFrame returns the pruned count the third time, and
claiming the filters as supported does not change the replanning
decision.) The default reader therefore implements no ``pushFilters``
at all — its plan is filter-independent, correct under every reuse
pattern, and needs no pushdown conf. Pass ``pruneFiles=true`` from
code that builds a FRESH DataFrame per query (the engine's own
helpers do) to get manifest skipping; that path also requires
``spark.sql.python.filterPushdown.enabled`` (on in ``get_spark()``,
runtime-settable elsewhere).

Honest API gap: the Python data source API (Spark 4.1) exposes filter
pushdown but NOT column pruning, so this path reads every column of
the files it does open. ``TxTable.read()`` rides the JVM parquet scan
(column pruning + row-group pushdown) and stays the hot path for wide
tables; ``format("txtable")`` buys SQL-surface access + manifest
skipping. Both return identical rows (test-pinned).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from data_warehouse_project_spark.sources.txcdf import _dv_positions
from data_warehouse_project_spark.sources.txtable import (
    BLOOMS_DIR,
    DATA_DIR,
    TXLOG_DIR,
    TxConflictError,
    TxError,
    TxTable,
    TxVacuumedError,
    _BLOOM_SALT,
    _bloom_positions,
    _footer_nulls,
    _footer_range,
    _mname,
)


def _opt_path(p: str) -> Path:
    """A path option as a local filesystem path. SQL DDL
    (``CREATE TABLE ... USING txtable OPTIONS (path ...)``) hands the
    option through Spark's path normalization, which prefixes the
    ``file:`` scheme — strip it so the same table definition works from
    both ``spark.read`` and the persistent catalog."""
    if p.startswith("file://"):
        return Path(p[7:])
    if p.startswith("file:"):
        return Path(p[5:])
    return Path(p)


def _root_from(options) -> Path:
    """The table root from a data source's options. ``spark.read``
    passes ``path``; a catalog table created via DDL keeps ``path``
    only at CREATE time and hands the reader ``location`` — accept
    either, so one table definition serves both surfaces."""
    p = options.get("path") or options.get("location")
    if not p:
        raise TxError("txtable: missing 'path' option")
    return _opt_path(p)


class TxFilePartition(InputPartition):
    """One live data file of the snapshot. Self-contained: the executor
    needs nothing but this object and pyarrow. ``row_filters`` (set
    only by the pruning reader) are DNF-free conjunct tuples
    ``(col, op, value)`` implied by the query's pushed filters —
    applied at read as pyarrow row-group pruning + row filtering, a
    strict subset of what Spark re-applies above the scan."""

    def __init__(self, data_path, dv_path, schema_json, row_filters=None):
        self.data_path = data_path  # absolute parquet path (None = no rows)
        self.dv_path = dv_path  # dv sidecar absolute path or None
        self.schema_json = schema_json
        self.row_filters = row_filters


def _is_plain_int(v) -> bool:
    # bool is an int subclass but footer stats never describe booleans
    return isinstance(v, int) and not isinstance(v, bool)


class TxBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = _root_from(options)
        self.log_dir = self.root / TXLOG_DIR
        if not self.log_dir.is_dir():
            raise TxError(f"not a transactional table: {self.root}")
        if "versionAsOf" in options and "timestampAsOf" in options:
            raise TxError("txtable: pass versionAsOf OR timestampAsOf")
        version = (
            int(options["versionAsOf"]) if "versionAsOf" in options else None
        )
        if "timestampAsOf" in options:
            version = self._version_as_of(
                options["timestampAsOf"].replace(" ", "T")
            )
        self.m = self._manifest(version)
        self.schema_json = self.m["schema"]
        self._filters: list = []

    # ------------------------------------------------- manifest (driver)

    def _versions(self) -> list[int]:
        return sorted(
            int(p.name[1:21])
            for p in self.log_dir.iterdir()
            if p.name.startswith("v") and p.name.endswith(".json")
        )

    def _manifest(self, version: int | None) -> dict:
        vs = self._versions()
        if not vs:
            raise TxError(f"no committed version in {self.log_dir}")
        v = vs[-1] if version is None else version
        p = self.log_dir / _mname(v)
        if not p.exists():
            raise TxVacuumedError(
                f"version {v} is not on disk (retained: {vs[0]}..{vs[-1]})"
            )
        with open(p) as f:
            return json.load(f)

    def _version_as_of(self, ts: str) -> int:
        best = None
        for v in self._versions():
            if self._manifest(v)["ts"] <= ts:
                best = v
        if best is None:
            raise TxError(f"no retained version committed at or before {ts!r}")
        return best

    # ----------------------------------------------- filter pruning
    # (driven by the subclass's pushFilters; the base class never
    # receives filters, so its plan is filter-independent)

    def _stats_for(self, col: str):
        """Columns with per-file stats: the table key (kmin/kmax/knulls)
        and the declared stats_cols (cs)."""
        if col == self.m.get("key"):
            return "key"
        if col in self.m.get("stats_cols", []):
            return "cs"
        return None

    def _bloom_cols(self) -> list[str]:
        side = self.root / "_bloom.json"
        if not side.is_file():
            return []
        with open(side) as fh:
            return json.load(fh).get("cols", [])

    def _prunable(self, flt) -> bool:
        attr = getattr(flt, "attribute", None)
        if not (isinstance(attr, tuple) and len(attr) == 1):
            return False
        where = self._stats_for(attr[0])
        if where is None:
            # no range stats — but equality/IN on a bloom-covered
            # column still file-prunes through the sidecars (incl.
            # string columns, which never carry range stats at all)
            if attr[0] not in self._bloom_cols():
                return False
            if isinstance(flt, (EqualTo, EqualNullSafe)):
                return flt.value is not None
            if isinstance(flt, In):
                return all(v is not None for v in flt.value)
            return False
        if isinstance(flt, (IsNull, IsNotNull)):
            return where == "key"  # null counts ride the key stats only
        if isinstance(flt, In):
            return all(_is_plain_int(v) for v in flt.value)
        if isinstance(
            flt,
            (
                EqualTo,
                EqualNullSafe,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            ),
        ):
            return _is_plain_int(flt.value)
        return False

    def _may_match(self, entry: dict, flt) -> bool:
        """True unless the file's manifest stats PROVE no row matches.
        Missing stats are conservatively 'may match'. Footer stats
        describe all physical rows incl. dv-deleted ones — a dv only
        removes rows, so proving emptiness stays valid."""
        col = flt.attribute[0]
        if col == self.m.get("key"):
            lo, hi = entry.get("kmin"), entry.get("kmax")
            nulls = entry.get("knulls")
        else:
            r = entry.get("cs", {}).get(col)
            lo, hi = (r[0], r[1]) if r else (None, None)
            nulls = None
        if isinstance(flt, IsNull):
            return nulls is None or nulls > 0
        if isinstance(flt, IsNotNull):
            if lo is not None:
                return True  # a recorded range means >=1 non-null value
            if nulls is not None and nulls >= entry["rows"]:
                return False  # every physical row is null
            return True
        if lo is None:
            return True
        if isinstance(flt, (EqualTo, EqualNullSafe)):
            return lo <= flt.value <= hi
        if isinstance(flt, In):
            return any(lo <= v <= hi for v in flt.value)
        if isinstance(flt, GreaterThan):
            return hi > flt.value
        if isinstance(flt, GreaterThanOrEqual):
            return hi >= flt.value
        if isinstance(flt, LessThan):
            return lo < flt.value
        if isinstance(flt, LessThanOrEqual):
            return lo <= flt.value
        return True

    # ----------------------------------------------------------- plan

    def _row_filters(self):
        """The pushed conjuncts as pyarrow-filter tuples — row-group
        pruning + row filtering INSIDE the parquet read, for the
        filters whose semantics pyarrow reproduces exactly (integer
        comparisons and IN; null tests excluded — pyarrow's filter DNF
        has no is-null op). Spark re-applies everything above the scan,
        so this is a pure work-saver, never load-bearing."""
        out = []
        for flt in self._filters:
            col = flt.attribute[0]
            if isinstance(flt, (EqualTo, EqualNullSafe)):
                out.append((col, "==", flt.value))
            elif isinstance(flt, GreaterThan):
                out.append((col, ">", flt.value))
            elif isinstance(flt, GreaterThanOrEqual):
                out.append((col, ">=", flt.value))
            elif isinstance(flt, LessThan):
                out.append((col, "<", flt.value))
            elif isinstance(flt, LessThanOrEqual):
                out.append((col, "<=", flt.value))
            elif isinstance(flt, In):
                out.append((col, "in", list(flt.value)))
        return out or None

    # ------------------------------------------------- bloom (driver)

    #: stop bloom-probing when more candidate files than this survive
    #: the stats pass — each probed file costs one sidecar-row read on
    #: the driver, and a probe that keeps thousands of files wasn't
    #: going to be a point lookup anyway
    BLOOM_PROBE_MAX_FILES = 4096

    #: skip probing a pushed IN larger than this (mirrors
    #: TxTable.BLOOM_PROBE_MAX_KEYS): every value is hashed with the
    #: pure-Python xxh64 twin on the driver at PLANNING time, and an
    #: IN that wide isn't a point lookup anyway
    BLOOM_PROBE_MAX_KEYS = 1024

    def _bloom_filter_files(self, files: list[dict]) -> list[dict]:
        """Drop files whose bloom sidecar PROVES a pushed equality/IN
        can't match. Runs at PLANNING time on the driver — no Spark
        jobs are possible here, so hashing uses the pure-Python twin of
        executor-side ``xxhash64`` (functions/xxh64.py, pinned
        bit-for-bit) and sidecar rows come through pyarrow directly.
        Conservative: no config, uncovered column, unsupported type,
        file without a sidecar row, oversized candidate set — keep."""
        side = self.root / "_bloom.json"
        if not self._filters or not side.is_file():
            return files
        if len(files) > self.BLOOM_PROBE_MAX_FILES:
            return files
        with open(side) as fh:
            cfg = json.load(fh)
        types = _schema_types(self.schema_json)
        probes: list[tuple[str, list]] = []
        for flt in self._filters:
            attr = getattr(flt, "attribute", None)
            if not (isinstance(attr, tuple) and len(attr) == 1):
                continue
            col = attr[0]
            if col not in cfg["cols"]:
                continue
            if types.get(col) not in ("long", "integer", "short", "byte",
                                      "string"):
                continue
            if isinstance(flt, EqualTo) and flt.value is not None:
                probes.append((col, [flt.value]))
            elif isinstance(flt, EqualNullSafe) and flt.value is not None:
                probes.append((col, [flt.value]))
            elif isinstance(flt, In):
                vals = [v for v in flt.value if v is not None]
                if (
                    vals
                    and len(vals) == len(list(flt.value))
                    and len(vals) <= self.BLOOM_PROBE_MAX_KEYS
                ):
                    probes.append((col, vals))
        if not probes:
            return files
        from data_warehouse_project_spark.functions.xxh64 import (
            spark_xxhash64,
            spark_xxhash64_salted,
        )
        from data_warehouse_project_spark.sources.txtable import (
            _BLOOM_SALT,
            _BLOOM_SPACE,
            _bloom_positions,
        )
        import numpy as np
        import pyarrow.parquet as pq

        assert _BLOOM_SPACE  # shared position space with the builders
        # hash once per probe, not per (probe, file): the value hashes
        # are probe-invariant; only the (k, m)-dependent positions vary
        hashed: list[tuple[str, "np.ndarray", "np.ndarray"]] = [
            (
                col,
                np.array(
                    [spark_xxhash64(v, types[col]) for v in vals],
                    dtype=np.int64,
                ),
                np.array(
                    [
                        spark_xxhash64_salted(v, types[col], _BLOOM_SALT)
                        for v in vals
                    ],
                    dtype=np.int64,
                ),
            )
            for col, vals in probes
        ]
        rows_cache: dict[str, dict] = {}

        def sidecar_rows(dname: str) -> dict:
            if dname not in rows_cache:
                t = pq.read_table(
                    str(self.root / dname), columns=["f", "c", "m", "k", "bits"]
                )
                rows_cache[dname] = {
                    (r["f"], r["c"]): r for r in t.to_pylist()
                }
            return rows_cache[dname]

        out = []
        for f in files:
            if "bloom" not in f:
                out.append(f)
                continue
            keep = True
            for col, h1, h2 in hashed:
                row = sidecar_rows(f["bloom"]).get(
                    (os.path.basename(f["path"]), col)
                )
                if row is None:
                    continue  # no sidecar row for this column: unknown
                pos = _bloom_positions(h1, h2, int(row["k"]), int(row["m"]))
                arr = np.frombuffer(row["bits"], dtype=np.uint8)
                if not ((arr[pos >> 3] >> (pos & 7)) & 1).all(axis=1).any():
                    keep = False  # PROVEN: no probed value in this file
                    break
            if keep:
                out.append(f)
        return out

    def partitions(self):
        files = self.m["files"]
        for flt in self._filters:
            files = [f for f in files if self._may_match(f, flt)]
        files = self._bloom_filter_files(files)
        rf = self._row_filters()
        parts = [
            TxFilePartition(
                str(self.root / f["path"]),
                str(self.root / f["dv"]["path"]) if "dv" in f else None,
                self.schema_json,
                rf,
            )
            for f in files
        ]
        return parts or [TxFilePartition(None, None, self.schema_json)]

    # ----------------------------------------------------------- read

    def read(self, partition: TxFilePartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.data_path is None:
            return
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = to_arrow_schema(
            StructType.fromJson(json.loads(partition.schema_json))
        )
        if partition.dv_path is None:
            # clean file: pushed conjuncts become row-group pruning +
            # row filtering inside the read itself. A pre-evolution
            # file may lack a filtered column — drop those conjuncts
            # for that file (footer-only check); Spark re-filters.
            rf = partition.row_filters
            if rf:
                names = set(pq.read_schema(partition.data_path).names)
                rf = [t for t in rf if t[0] in names] or None
            tbl = pq.read_table(partition.data_path, filters=rf)
        else:
            # dv files read WHOLE: the deletion-vector mask is
            # POSITIONAL, so any row filtering before it would shift
            # indices and resurrect deleted rows. Spark's re-applied
            # predicate handles the filtering above the scan.
            tbl = pq.read_table(partition.data_path)
            dead = _dv_positions(
                partition.dv_path, os.path.basename(partition.data_path)
            )
            if dead.size:
                live = np.setdiff1d(
                    np.arange(tbl.num_rows, dtype=np.int64),
                    dead,
                    assume_unique=True,
                )
                tbl = tbl.take(pa.array(live, type=pa.int64()))
        n = tbl.num_rows
        if n == 0:
            return
        cols = []
        for f in schema:
            if f.name in tbl.column_names:
                cols.append(tbl.column(f.name).cast(f.type))
            else:  # pre-evolution file: NULL-fill
                cols.append(pa.nulls(n, type=f.type))
        yield from pa.table(cols, schema=schema).to_batches()


class TxBatchPruningReader(TxBatchReader):
    """The opt-in pruning variant: implements ``pushFilters`` so
    Catalyst hands the query's conjuncts over, and ``partitions()``
    skips files the manifest stats prove empty. ONLY safe when the
    DataFrame is built fresh per query — see the module docstring for
    the stale-plan-reuse hazard that keeps this out of the default."""

    def pushFilters(self, filters):
        """Keep every filter usable for manifest-stat skipping; report
        ALL filters back as unsupported so Spark re-applies them above
        the scan (file-level pruning is approximate by design)."""
        self._filters = [f for f in filters if self._prunable(f)]
        return filters


class TxWriteCommit(WriterCommitMessage):
    """One task's written file: its absolute path (for abort cleanup)
    and its prebuilt manifest entry (rows + footer stats)."""

    def __init__(self, path, entry):
        self.path = path
        self.entry = entry


def _schema_types(schema_json: str) -> dict:
    return {
        f["name"]: f["type"] for f in json.loads(schema_json)["fields"]
    }


#: bloom-probed type whitelist — must stay equal to the probe sides'
#: (TxBatchPruningReader._bloom_filter_files, TxTable._bloom_prune)
_BLOOM_TYPES = ("long", "integer", "short", "byte", "string")


class _TaskBlooms:
    """Write-TASK-side bloom sidecar builder: folds every Arrow batch's
    per-column ``xxhash64`` values as they stream through
    :meth:`TxBatchWriter.write` — no Spark job, no second read of the
    file. Only the FIRST hash is stored per value (8 bytes): the salted
    second hash chains off it (``h2 = hashInt(salt, seed=h1)``), so it
    is derived in one vectorized pass at finalize time. Hashing is the
    numpy-vectorized Spark-exact XXH64 (functions/xxh64.py), with Arrow
    string buffers hashed straight from their offsets — zero Python
    work per value. A column with no non-null values still lands a row
    with an all-zero bitmap: that PROVES absence (probes never probe
    NULL), strictly better than the conservative missing-row keep."""

    def __init__(self, cfg: dict, schema_json: str):
        self.cfg = cfg
        self.types = _schema_types(schema_json)
        self.h1: dict[str, list] = {c: [] for c in cfg["cols"]}

    def update(self, batch) -> None:
        import numpy as np
        import pyarrow as pa

        from data_warehouse_project_spark.functions.xxh64 import (
            hash_bytes_np,
            hash_long_np,
            hash_int_np,
        )

        for c in self.cfg["cols"]:
            idx = batch.schema.get_field_index(c)
            if idx < 0:
                continue
            arr = batch.column(idx)
            if arr.null_count:
                arr = arr.drop_null()
            if len(arr) == 0:
                continue
            t = self.types[c]
            if t == "long":
                h = hash_long_np(
                    np.asarray(arr.to_numpy(zero_copy_only=False),
                               dtype=np.int64)
                )
            elif t in ("integer", "short", "byte"):
                pats = (
                    np.asarray(arr.to_numpy(zero_copy_only=False))
                    .astype(np.int32)   # sign-extend to the 32-bit pattern
                    .astype(np.uint32)
                )
                h = hash_int_np(pats)
            else:  # string
                if not (
                    pa.types.is_string(arr.type)
                    or pa.types.is_large_string(arr.type)
                ):
                    arr = arr.cast(pa.large_string())
                odt = (
                    np.int64
                    if pa.types.is_large_string(arr.type)
                    else np.int32
                )
                bufs = arr.buffers()
                offsets = np.frombuffer(bufs[1], dtype=odt)[
                    arr.offset : arr.offset + len(arr) + 1
                ].astype(np.int64)
                data = (
                    np.frombuffer(bufs[2], dtype=np.uint8)
                    if bufs[2] is not None
                    else np.zeros(0, dtype=np.uint8)
                )
                h = hash_bytes_np(data, offsets[:-1], np.diff(offsets))
            self.h1[c].append(h)

    def land(self, root: Path, dname: str, fname: str) -> None:
        """Write this task's (file, column) bitmap rows as one parquet
        part under the job's shared sidecar dir — the same physical
        layout (and exact bit positions) as the Spark-built sidecars,
        so the probe sides need no new code path."""
        import uuid

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_warehouse_project_spark.functions.xxh64 import hash_int_np

        bpk = int(self.cfg["bits_per_key"])
        k = int(self.cfg["k"])
        max_m = int(self.cfg["max_m_bits"])
        salt = np.uint32(_BLOOM_SALT & 0xFFFFFFFF)
        rows = {"f": [], "c": [], "m": [], "k": [], "bits": []}
        for c in self.cfg["cols"]:
            parts = self.h1[c]
            h1 = (
                np.concatenate(parts)
                if parts
                else np.zeros(0, dtype=np.uint64)
            )
            n = max(1, len(h1))
            m_bits = 1 << max(10, int(np.ceil(np.log2(n * bpk))))
            m_bits = min(m_bits, max_m)
            buf = np.zeros(m_bits >> 3, dtype=np.uint8)
            if len(h1):
                h2 = hash_int_np(salt, h1)
                pos = _bloom_positions(
                    h1.view(np.int64), h2.view(np.int64), k, m_bits
                ).ravel()
                np.bitwise_or.at(
                    buf, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
            rows["f"].append(fname)
            rows["c"].append(c)
            rows["m"].append(int(m_bits))
            rows["k"].append(int(k))
            rows["bits"].append(buf.tobytes())
        d = root / dname
        d.mkdir(parents=True, exist_ok=True)
        t = pa.table(
            rows,
            schema=pa.schema(
                [
                    ("f", pa.string()),
                    ("c", pa.string()),
                    ("m", pa.int64()),
                    ("k", pa.int64()),
                    ("bits", pa.binary()),
                ]
            ),
        )
        pq.write_table(t, str(d / f"part-{uuid.uuid4().hex}.parquet"))


class TxBatchWriter(DataSourceArrowWriter):
    """The write half of ``format("txtable")`` — Delta-shaped batch
    writes from plain ``df.write``:

        df.write.format("txtable").option("path", root) \\
          .mode("append").save()        # or mode("overwrite")

    EXECUTORS stream their Arrow record batches straight into one
    uniquely-named parquet file each under ``data/`` (invisible until a
    manifest references them — the same staging contract as
    ``TxTable._write_files``) and return the file's manifest entry
    built from its own footer (rows, key min/max + null count,
    declared stats columns). The DRIVER-side ``commit`` then runs the
    ordinary claim protocol via ``TxTable.commit_prewritten`` — fence,
    lost-race retry, conflict semantics all identical to
    ``TxTable.append``/``overwrite``. ``abort`` deletes the orphans.

    Options: ``txnAppId`` + ``txnVersion`` make the write idempotent
    (the foreachBatch exactly-once fence); on a path that is not yet a
    table, ``key`` and ``statsCols`` (comma-separated) declare the
    layout and the write commits as version 0 (CREATE).

    Bloom sidecars are built IN the write tasks (r12): when the table
    has a bloom config at plan time, every task folds its batches'
    per-column ``xxhash64`` values (numpy-vectorized Spark-exact twin,
    functions/xxh64.py) into per-(file, column) bitmaps and lands them
    as parquet parts under one job-shared sidecar dir; the manifest
    entries reference it, so natively-written files bloom-prune
    IMMEDIATELY — no ``maintain()``/``bloom_backfill`` pass needed
    (the advisor backfill remains for files written before bloom was
    enabled, or under a config that appeared between plan and commit).
    A fenced replay or abort removes the job's sidecar dir with its
    data files. A part a failed/RETRIED task leaves inside a dir the
    successful tasks committed can never cause false pruning (its 'f'
    basename matches no manifest entry) and is reaped part-by-part by
    ``vacuum``, which drops aged parquet parts whose 'f' values match
    no retained manifest file (r12 ADVICE: whole-dir reaping alone
    left such parts permanently unreclaimable).

    CHECK constraints are enforced EXECUTOR-SIDE (r11): every write
    task validates each Arrow batch against the manifest's predicates
    with DuckDB before a byte lands; a violating batch fails the task
    (and so the job), ``abort`` removes the staged files, and the
    commit additionally refuses unless every CURRENT constraint was
    validated with an identical predicate — a constraint added
    concurrently between plan and commit fails loudly. Predicates must
    evaluate in DuckDB's ANSI dialect (probed at plan time, before any
    task runs); engine-specific syntax refuses with a pointer to
    ``TxTable.append``'s in-plan enforcement."""

    def __init__(self, options, schema, overwrite: bool):
        self.root = _root_from(options)
        self.overwrite = overwrite
        self.schema_json = json.dumps(schema.jsonValue())
        self.txn = None
        if "txnAppId" in options or "txnVersion" in options:
            if not ("txnAppId" in options and "txnVersion" in options):
                raise TxError("txnAppId and txnVersion come together")
            self.txn = (options["txnAppId"], int(options["txnVersion"]))
        self.merge_schema = (
            str(options.get("mergeSchema", "false")).lower() == "true"
        )
        if self.merge_schema and overwrite:
            raise TxError("mergeSchema applies to append mode only")
        # "creating" = no committed manifest yet. The log dir ALONE is
        # not the signal: streaming re-instantiates this writer for the
        # commit phase, by which time __init__'s own mkdir has run but
        # version 0 has not landed.
        log_dir = self.root / TXLOG_DIR
        vs = (
            sorted(
                int(p.name[1:21])
                for p in log_dir.iterdir()
                if p.name.startswith("v") and p.name.endswith(".json")
            )
            if log_dir.is_dir()
            else []
        )
        self.creating = not vs
        self.checks: dict = {}
        names = {f.name for f in schema.fields}
        if self.creating:
            self.key = options.get("key")
            self.stats_cols = [
                c for c in options.get("statsCols", "").split(",") if c
            ]
            for c in ([self.key] if self.key else []) + self.stats_cols:
                if c not in names:
                    raise TxError(f"declared column {c!r} not in batch schema")
            (self.root / TXLOG_DIR).mkdir(parents=True, exist_ok=True)
            (self.root / DATA_DIR).mkdir(exist_ok=True)
        else:
            # fail BEFORE any task runs: schema mismatch / CHECKs
            with open(self.root / TXLOG_DIR / _mname(vs[-1])) as f:
                m = json.load(f)
            self.checks = dict(m.get("checks") or {})
            if self.checks:
                # CHECK enforcement is executor-side here (each write
                # task validates its Arrow batches with DuckDB before
                # landing — _validate_batch). Probe the dialect NOW,
                # before any task runs: a predicate DuckDB cannot
                # evaluate (engine-specific syntax) refuses loudly
                # rather than enforcing a silently different semantics.
                from pyspark.sql.pandas.types import to_arrow_schema

                empty = to_arrow_schema(schema).empty_table()
                # any bind/parse failure surfaces as the loud
                # "not portable" TxError from _violations; drop the
                # probe's connection — the writer object is pickled to
                # executors and a DuckDB handle cannot ride along
                try:
                    self._violations(empty)
                finally:
                    probe_con = self.__dict__.pop("_duck", None)
                    if probe_con is not None:
                        probe_con.close()
            if self.merge_schema:
                from data_warehouse_project_spark.sources.txtable import (
                    _evolve_schema_json,
                )

                # fail BEFORE tasks if the widened schema is invalid
                # (missing existing column / type change); the commit
                # re-evolves against the then-current manifest
                _evolve_schema_json(m, self.schema_json)
            elif _schema_types(self.schema_json) != _schema_types(m["schema"]):
                raise TxError(
                    "batch schema != table schema (set "
                    '.option("mergeSchema","true") to widen with new '
                    "nullable columns)"
                )
            self.key = m["key"]
            self.stats_cols = m.get("stats_cols") or []
        # bloom sidecar plan: resolved ONCE here (driver/plan side) and
        # pickled to every task, so all tasks share one sidecar dir and
        # a config change mid-job can't split the batch. A config that
        # appears AFTER planning simply means these files wait for the
        # advisor backfill — conservative, never wrong.
        self.bloom_cfg = None
        self.bloom_dname = None
        side = self.root / "_bloom.json"
        if not self.creating and side.is_file():
            with open(side) as fh:
                cfg = json.load(fh)
            types = _schema_types(self.schema_json)
            cols = [
                c for c in cfg.get("cols", [])
                if types.get(c) in _BLOOM_TYPES
            ]
            if cols:
                import uuid as _uuid

                self.bloom_cfg = {**cfg, "cols": cols}
                self.bloom_dname = (
                    f"{BLOOMS_DIR}/{_uuid.uuid4().hex[:12]}"
                )

    # ------------------------------------------------------ executors

    def _violations(self, arrow_batch) -> None:
        """Validate one Arrow batch against the table's CHECK
        constraints — DuckDB evaluates each predicate directly on the
        Arrow buffers (no Spark on the write task), with SQL CHECK
        semantics: NULL results pass, FALSE rows abort the write with a
        sample. The task failure fails the job, ``abort()`` removes
        every staged file, and nothing commits — the same atomicity
        TxTable.append's in-plan raise_error gives.

        Honest limit: the evaluator is DuckDB, the in-plan path's is
        Spark — the plan-time probe catches predicates that don't BIND,
        but a predicate whose VALUE semantics differ between engines
        (e.g. ``cast(str as int)``: Spark non-ANSI yields NULL, DuckDB
        raises) diverges at write time. Any DuckDB evaluation ERROR
        (not a violation) therefore fails LOUDLY as non-portable below
        rather than silently weakening enforcement; keep CHECK
        predicates ANSI-portable or write through TxTable.append. One
        connection per write task, reused across its batches."""
        if not self.checks:
            return
        import pyarrow as pa

        if isinstance(arrow_batch, pa.RecordBatch):
            arrow_batch = pa.Table.from_batches([arrow_batch])
        con = getattr(self, "_duck", None)
        if con is None:
            import duckdb

            con = self._duck = duckdb.connect()
        con.register("__batch", arrow_batch)
        for name, pred in self.checks.items():
            try:
                bad = con.execute(
                    "SELECT * FROM __batch WHERE NOT COALESCE("
                    f"({pred}), TRUE) LIMIT 3"
                ).fetchall()
            except TxError:
                raise
            except Exception as e:
                raise TxError(
                    f"CHECK constraint {name!r} ({pred}) is not "
                    f"portable: DuckDB raised {e!r} evaluating it on "
                    "this batch (Spark may treat the same rows "
                    "differently) — write through TxTable.append for "
                    "in-plan Spark enforcement"
                ) from None
            if bad:
                raise TxError(
                    f"CHECK constraint {name!r} ({pred}) violated "
                    f"by {len(bad)}+ row(s) in this write, e.g. "
                    f"{bad[0]!r} — nothing was committed"
                )

    def write(self, iterator):
        import uuid

        import pyarrow.parquet as pq

        path = self.root / DATA_DIR / f"{uuid.uuid4().hex}.parquet"
        blooms = (
            _TaskBlooms(self.bloom_cfg, self.schema_json)
            if self.bloom_cfg
            else None
        )
        writer = None
        try:
            for batch in iterator:
                self._violations(batch)
                if writer is None:
                    writer = pq.ParquetWriter(str(path), batch.schema)
                writer.write_batch(batch)
                if blooms is not None:
                    blooms.update(batch)
        except TxError:
            if writer is not None:
                writer.close()
                writer = None
            if path.exists():
                os.unlink(path)
            raise
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return TxWriteCommit(None, None)  # empty task
        md = pq.ParquetFile(str(path)).metadata
        if md.num_rows == 0:
            os.unlink(path)
            return TxWriteCommit(None, None)
        entry: dict = {"path": f"{DATA_DIR}/{path.name}", "rows": md.num_rows}
        if self.key is not None:
            r = _footer_range(md, self.key)
            if r is not None:
                entry["kmin"], entry["kmax"] = r
                nulls = _footer_nulls(md, self.key)
                if nulls is not None:
                    entry["knulls"] = nulls
        cs = {}
        for c in self.stats_cols:
            if c == self.key:
                continue
            r = _footer_range(md, c)
            if r is not None:
                cs[c] = [r[0], r[1]]
        if cs:
            entry["cs"] = cs
        if blooms is not None:
            blooms.land(self.root, self.bloom_dname, path.name)
            entry["bloom"] = self.bloom_dname
        return TxWriteCommit(str(path), entry)

    # --------------------------------------------------------- driver

    def _land(self, messages, txn) -> dict:
        """Driver-side landing shared by the batch and streaming
        writers: CREATE as version 0 if no manifest exists yet (the
        fence, if any, is recorded in the create commit so a replayed
        first batch still skips), else the ordinary
        ``commit_prewritten``. A fenced SKIP deletes this job's
        just-written files — they would otherwise accumulate as
        orphans on every replay."""
        entries = [m.entry for m in messages if m is not None and m.entry]
        rows = sum(e["rows"] for e in entries)
        t = TxTable(None, self.root)
        try:
            t.latest_version()
            fresh = False
        except TxError:
            fresh = True
        if fresh:
            try:
                t._commit(
                    0,
                    "create",
                    entries,
                    self.schema_json,
                    self.key,
                    {"rows_written": rows},
                    txns={txn[0]: txn[1]} if txn else None,
                    stats_cols=self.stats_cols,
                )
                return {"rows_written": rows, "version": 0}
            except TxConflictError:
                # lost a concurrent fresh-create race: the table exists
                # NOW — land this job's already-written files as an
                # ordinary append against it (same retry contract as
                # any other append), instead of failing the whole write.
                # The key must agree with the winner's: the file entries'
                # kmin/kmax were computed for OUR key column and would
                # corrupt pruning under a different table key.
                winner_key = t._manifest()["key"]
                if winner_key != self.key:
                    raise TxError(
                        "concurrent create race: winning writer declared "
                        f"key={winner_key!r}, this writer key={self.key!r}"
                    )
        if not entries and not self.overwrite and txn is None:
            return {"rows_appended": 0, "skipped": True}
        r = t.commit_prewritten(
            entries,
            "overwrite" if self.overwrite else "append",
            self.schema_json,
            txn=txn,
            merge_schema=self.merge_schema,
            checks_validated=self.checks,
        )
        if r.get("skipped"):
            for m in messages:
                if m is not None and m.path:
                    try:
                        os.unlink(m.path)
                    except FileNotFoundError:
                        pass
            self._drop_bloom_dirs(messages)
        return r

    def _drop_bloom_dirs(self, messages) -> None:
        """Remove the job's sidecar dir(s) when its data files are
        being discarded (fenced replay / abort). Dir names come from
        the messages' entries — the streaming path re-instantiates the
        writer for the commit phase, so ``self.bloom_dname`` there is a
        fresh unused name, not the one the tasks wrote under."""
        import shutil

        dirs = {
            m.entry["bloom"]
            for m in messages
            if m is not None and m.entry and "bloom" in m.entry
        }
        if self.bloom_dname:
            dirs.add(self.bloom_dname)
        for d in dirs:
            shutil.rmtree(self.root / d, ignore_errors=True)

    def commit(self, messages):
        self._land(messages, self.txn)

    def abort(self, messages):
        for m in messages:
            if m is not None and m.path:
                try:
                    os.unlink(m.path)
                except FileNotFoundError:
                    pass
        self._drop_bloom_dirs(messages)
        if self.creating:
            # no manifest ever landed: remove the husk so TxTable.create
            # / a retried write can claim the path again
            log_dir = self.root / TXLOG_DIR
            try:
                if not any(
                    p.name.endswith(".json") for p in log_dir.iterdir()
                ):
                    log_dir.rmdir()
            except OSError:
                pass


class TxStreamWriter(TxBatchWriter, DataSourceStreamArrowWriter):
    """Structured Streaming sink for the transactional format —

        df.writeStream.format("txtable").option("path", root) \\
          .option("checkpointLocation", ck).start()

    — with EXACTLY-ONCE delivery for free: every micro-batch commits
    behind the txn fence ``(txnAppId, batchId)``. A restarted query
    replays its last uncommitted batch (Spark's at-least-once
    contract); the fence turns the replay into a no-op commit AND
    deletes the replay's just-written files, so the table sees each
    batch once — the same guarantee foreachBatch + TxTable.append(txn=)
    gives, packaged as a native sink with zero user code.

    ``txnAppId`` defaults to ``"txtable-stream"``; set it per query
    when MULTIPLE streams append to one table (the fence is
    max-per-app, so two queries sharing an app id would skip each
    other's lower batch ids). ``outputMode("complete")`` maps to a
    fenced per-batch overwrite — a streaming aggregation materializes
    as a transactional table with time travel across batches."""

    def __init__(self, options, schema, overwrite: bool):
        opts = dict(options)
        opts.setdefault("txnAppId", "txtable-stream")
        opts.setdefault("txnVersion", "0")  # real fence is the batchId
        super().__init__(opts, schema, overwrite)

    def commit(self, messages, batchId: int):
        self._land(messages, (self.txn[0], int(batchId)))

    def abort(self, messages, batchId: int):
        TxBatchWriter.abort(self, messages)


class TxBatchDataSource(DataSource):
    """``spark.read.format("txtable").option("path", root)`` — options:
    ``path`` (table root, required), ``versionAsOf`` (int),
    ``timestampAsOf`` (ISO-8601; mutually exclusive with versionAsOf),
    ``pruneFiles`` ("true" to skip files via manifest stats + pushed
    filters; needs spark.sql.python.filterPushdown.enabled and a fresh
    DataFrame per query — module docstring has the why)."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def _cls(self):
        prune = str(self.options.get("pruneFiles", "false")).lower() == "true"
        return TxBatchPruningReader if prune else TxBatchReader

    def schema(self):
        return StructType.fromJson(
            json.loads(TxBatchReader(self.options).schema_json)
        )

    def reader(self, schema):
        # always a fresh reader: one DataSource instance is reused
        # across plannings, and pushFilters state must never leak
        return self._cls()(self.options)

    def writer(self, schema, overwrite):
        return TxBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite):
        return TxStreamWriter(self.options, schema, overwrite)
