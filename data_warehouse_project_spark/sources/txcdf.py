"""``txcdf`` — the transactional change data feed as a FIRST-CLASS
Structured Streaming source (Spark 4 Python Data Source API).

``streaming/txfeed.py`` drives tx→tx replication through its own
micro-batch loop; this module is the upstream-native packaging of the
same feed: register once, then

    spark.dataSource.register(TxCdfDataSource)
    df = (spark.readStream.format("txcdf")
          .option("path", table_root)
          .option("maxVersionsPerBatch", 2)   # rate limit
          .load())

and every existing streaming sink (windows, txsink, foreachBatch)
consumes table churn with Spark's own offset tracking: offsets are
commit-log versions, checkpointed by the engine; a restart resumes
from the checkpointed version exactly like a file or Kafka source.

Execution shape (scales like the batch feed):

- the DRIVER plans each micro-batch purely from manifests — O(files
  changed in the version range) metadata, never row data;
- each changed file becomes one ``InputPartition``; EXECUTORS read the
  parquet (and deletion-vector sidecars) with pyarrow and emit Arrow
  record batches directly — no Python row loop, no SparkSession on the
  executor;
- rate limiting (``maxVersionsPerBatch``) caps how many commit-log
  versions one trigger consumes, the same knob as maxFilesPerTrigger.

Semantics vs ``TxTable.read_changes`` (documented, test-pinned):

- MULTISET-exact: applying a batch's inserts minus deletes to the
  previous snapshot reproduces the end snapshot, for every op;
- labels are ``insert``/``delete`` only — update pre/post pairing is a
  cross-partition refinement the batch reader performs; a streaming
  partition sees one file;
- copy-on-write rewrites emit their removed files' live rows as
  deletes and the replacement rows as inserts WITHOUT cancelling
  carried rows (cancellation needs a shuffle; the batch reader does
  it). ``compact`` commits are still skipped entirely (same logical
  rows by construction), so steady-state maintenance stays quiet;
- the schema is pinned at stream start (the then-latest table schema,
  plus ``_change_type``/``_commit_version``/``_commit_ts``); older
  files NULL-fill evolved columns.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from data_warehouse_project_spark.sources.txtable import (
    TXLOG_DIR,
    TxError,
    _mname,
)


class TxCdfPartition(InputPartition):
    """One changed file's worth of change rows. Self-contained: the
    executor needs nothing but this object and pyarrow."""

    def __init__(self, kind, data_path, dv_old, dv_new, version, ts,
                 schema_json, change_type):
        self.kind = kind  # "file" (whole file ± old dv) | "dv_diff"
        self.data_path = data_path
        self.dv_old = dv_old  # old dv sidecar path or None
        self.dv_new = dv_new  # new dv sidecar path or None
        self.version = version
        self.ts = ts
        self.schema_json = schema_json  # END schema incl. meta columns
        self.change_type = change_type  # for kind="file"


def _arrow_schema(schema_json: str):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(StructType.fromJson(json.loads(schema_json)))


def _dv_positions(path: str | None, fname: str):
    """Deleted row positions for ``fname`` as a SORTED unique int64
    numpy array — columnar end to end (pyarrow filter + numpy), no
    Python row loop, so a dense vector on a 1M-row file costs
    milliseconds, not a per-element set build."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if path is None or not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    t = pq.read_table(path, columns=["fname", "ri"])
    ri = t.filter(pc.equal(t.column("fname"), fname)).column("ri")
    return np.unique(ri.to_numpy(zero_copy_only=False).astype(np.int64))


def _emit(part: TxCdfPartition, indices, change_type):
    """Arrow batches for the selected row indices of the partition's
    data file, aligned to the pinned stream schema (NULL-fill evolved
    columns, meta columns appended)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _arrow_schema(part.schema_json)
    data_fields = [f for f in schema
                   if not f.name.startswith("_change")
                   and f.name not in ("_commit_version", "_commit_ts")]
    tbl = pq.read_table(part.data_path)
    if indices is not None:
        # indices arrive as a sorted numpy int64 array — zero-copy take
        tbl = tbl.take(pa.array(indices, type=pa.int64()))
    n = tbl.num_rows
    if n == 0:
        return
    cols = []
    for f in data_fields:
        if f.name in tbl.column_names:
            cols.append(tbl.column(f.name).cast(f.type))
        else:  # pre-evolution file: NULL-fill
            cols.append(pa.nulls(n, type=f.type))
    cols.append(pa.array([change_type] * n, type=pa.string()))
    cols.append(pa.array([part.version] * n, type=pa.int64()))
    ts = dt.datetime.strptime(part.ts, "%Y-%m-%dT%H:%M:%SZ")
    ts_field = schema.field("_commit_ts")
    cols.append(pa.array([ts] * n, type=ts_field.type))
    yield from pa.table(cols, schema=schema).to_batches()


class TxCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = Path(options["path"])
        self.log_dir = self.root / TXLOG_DIR
        if not self.log_dir.is_dir():
            raise TxError(f"not a transactional table: {self.root}")
        self.rate = int(options.get("maxVersionsPerBatch", 0)) or None
        self.start_v = int(options.get("startingVersion", 0))
        if "startingTimestamp" in options:
            if "startingVersion" in options:
                raise TxError(
                    "txcdf: pass startingVersion OR startingTimestamp"
                )
            # resolve once at stream start (Delta's startingTimestamp):
            # the first version committed AT OR AFTER the timestamp
            ts = options["startingTimestamp"].replace(" ", "T")
            vs = sorted(
                int(p.name[1:21])
                for p in self.log_dir.iterdir()
                if p.name.startswith("v") and p.name.endswith(".json")
            )
            start = None
            for v in vs:
                with open(self.log_dir / _mname(v)) as f:
                    if json.load(f)["ts"] >= ts:
                        start = v
                        break
            if start is None:
                start = vs[-1] + 1 if vs else 0  # nothing yet: only new
            self.start_v = start
        # Delta's skipChangeCommits: stream ONLY pure-append commits,
        # silently skipping versions that removed/rewrote files or grew
        # deletion vectors (the fold/merge/delete shapes) — for
        # consumers that treat the table as an event log
        self.skip_change = str(
            options.get("skipChangeCommits", "false")
        ).lower() == "true"
        self._committed: int | None = None
        # rate-limit base fallback for a reader whose commit() has not
        # fired yet (fresh start AND checkpoint restart): the last end
        # offset this reader returned or planned. Seeded by
        # initialOffset (fresh) and partitions() (a replayed batch on
        # restart), and advanced by every latestOffset return, so at
        # most ONE post-restart batch can exceed the cap (a clean
        # restart's first latestOffset has no base to cap against —
        # the Python source API exposes no start offset there).
        self._last_end: int | None = None
        # pin the stream schema NOW (latest at start)
        latest = self._latest()
        with open(self.log_dir / _mname(latest)) as f:
            base = json.loads(f.read())["schema"]
        fields = list(StructType.fromJson(json.loads(base)).fields)
        fields += [
            StructField("_change_type", StringType(), False),
            StructField("_commit_version", LongType(), False),
            StructField("_commit_ts", TimestampType(), True),
        ]
        self.schema_json = json.dumps(StructType(fields).jsonValue())

    # ----------------------------------------------------- offsets

    def _latest(self) -> int:
        vs = [
            int(p.name[1:21])
            for p in self.log_dir.iterdir()
            if p.name.startswith("v") and p.name.endswith(".json")
        ]
        if not vs:
            raise TxError(f"no committed version in {self.log_dir}")
        return max(vs)

    def initialOffset(self) -> dict:
        self._committed = self.start_v - 1
        self._last_end = self.start_v - 1
        return {"version": self.start_v - 1}

    def latestOffset(self) -> dict:
        latest = self._latest()
        if self.rate is not None:
            base = self._committed if self._committed is not None else self._last_end
            if base is not None:
                latest = min(latest, base + self.rate)
        if self._last_end is None or latest > self._last_end:
            self._last_end = latest
        return {"version": latest}

    def commit(self, end: dict) -> None:
        self._committed = int(end["version"])

    # --------------------------------------------------- planning

    def _manifest(self, v: int) -> dict:
        try:
            with open(self.log_dir / _mname(v)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise TxError(
                f"txcdf: version {v} is no longer on disk — vacuum "
                "outran this stream's offset; size "
                "vacuum(retain_versions=...) to the consumer lag"
            ) from None

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        # restart seeding: a replayed batch reaches here before any
        # commit() fires — its start offset is the checkpointed
        # position, the correct rate-limit base for the next batch
        self._committed = lo if self._committed is None else self._committed
        if self._last_end is None or hi > self._last_end:
            self._last_end = hi
        parts: list[TxCdfPartition] = []
        for v in range(lo + 1, hi + 1):
            m = self._manifest(v)
            if m["op"] == "compact":
                continue
            prev = self._manifest(v - 1)["files"] if v > 0 else []
            prev_by = {f["path"]: f for f in prev}
            cur_by = {f["path"]: f for f in m["files"]}
            if self.skip_change and (
                set(prev_by) - set(cur_by)
                or any(
                    p in prev_by and prev_by[p].get("dv") != e.get("dv")
                    for p, e in cur_by.items()
                )
            ):
                continue  # not a pure append: skipChangeCommits drops it

            def sidecar(entry):
                dv = (entry or {}).get("dv")
                return str(self.root / dv["path"]) if dv else None

            mk = lambda kind, entry, old, ct: TxCdfPartition(  # noqa: E731
                kind,
                str(self.root / entry["path"]),
                sidecar(old),
                sidecar(entry),
                v,
                m["ts"],
                self.schema_json,
                ct,
            )
            for p, entry in cur_by.items():
                old = prev_by.get(p)
                if old is None:  # added file: all rows insert
                    parts.append(mk("file", entry, None, "insert"))
                elif old.get("dv") != entry.get("dv"):  # dv moved
                    parts.append(mk("dv_diff", entry, old, ""))
            for p, old in prev_by.items():
                if p not in cur_by:  # removed file: live rows delete
                    parts.append(mk("file", old, old, "delete"))
        if not parts:
            # Spark requires >= 1 partition per batch; emit a no-row one
            parts.append(
                TxCdfPartition("file", None, None, None, hi, "",
                               self.schema_json, "insert")
            )
        return parts

    # ----------------------------------------------------- reading

    def read(self, partition: TxCdfPartition):
        import numpy as np

        if partition.data_path is None:
            return iter(())
        fname = os.path.basename(partition.data_path)
        if partition.kind == "file":
            # whole file minus its (old) deletion vector, one label.
            # For an added file dv_old is None -> all rows.
            dead = _dv_positions(partition.dv_old, fname)
            import pyarrow.parquet as pq

            n = pq.ParquetFile(partition.data_path).metadata.num_rows
            idx = (
                None
                if dead.size == 0
                else np.setdiff1d(
                    np.arange(n, dtype=np.int64), dead, assume_unique=True
                )
            )
            return _emit(partition, idx, partition.change_type)
        # dv_diff: positions entering the vector are deletes; positions
        # leaving it (restore rewound) are re-inserts — sorted-array
        # set difference, all columnar
        old = _dv_positions(partition.dv_old, fname)
        new = _dv_positions(partition.dv_new, fname)

        def gen():
            yield from _emit(
                partition,
                np.setdiff1d(new, old, assume_unique=True),
                "delete",
            )
            yield from _emit(
                partition,
                np.setdiff1d(old, new, assume_unique=True),
                "insert",
            )

        return gen()


class TxCdfDataSource(DataSource):
    """``spark.readStream.format("txcdf").option("path", root)`` —
    options: ``path`` (table root, required), ``startingVersion``
    (default 0 = full history), ``maxVersionsPerBatch`` (rate limit,
    default unlimited), ``skipChangeCommits`` (Delta semantics: emit
    only pure-append commits, default false)."""

    @classmethod
    def name(cls) -> str:
        return "txcdf"

    def schema(self):
        reader = TxCdfStreamReader(self.options)
        self._reader = reader
        return StructType.fromJson(json.loads(reader.schema_json))

    def streamReader(self, schema):
        return getattr(self, "_reader", None) or TxCdfStreamReader(self.options)
