"""txbatch: snapshot reads of the transactional format as a native
batch data source (`spark.read.format("txtable")`), with pushed-filter
manifest skipping. Equality vs TxTable.read across every op shape,
time travel options, pruning exactness, end-to-end skip proof."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txbatch import (
    TxBatchDataSource,
    TxBatchPruningReader,
    TxBatchReader,
)
from data_warehouse_project_spark.sources.txtable import TxError, TxTable


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TxBatchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _churny_table(spark, root):
    t = TxTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, i * 2, f"v{i}") for i in range(20)],
            "id long, amt long, v string",
        ),
        key="id",
        stats_cols=["amt"],
    )
    t.append(
        spark.createDataFrame(
            [(100, 200, "new"), (101, 202, "new")], "id long, amt long, v string"
        )
    )
    t.merge(
        spark.createDataFrame(
            [(3, -1, "M"), (200, 400, "M")], "id long, amt long, v string"
        )
    )
    t.delete(F.col("id") % 7 == 1)  # copy-on-write
    t.delete(F.col("id") == 12, mode="dv")  # deletion vector
    t.compact(target_files=2)
    t.append(spark.createDataFrame([(300, 600, "z")], "id long, amt long, v string"))
    return t


def _bag(df):
    return Counter(tuple(r) for r in df.collect())


def _fmt(spark, t, **opts):
    r = spark.read.format("txtable").option("path", str(t.root))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_txtable_read(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    got, want = _fmt(spark, t), t.read()
    assert got.schema == want.schema
    assert _bag(got) == _bag(want)


def test_time_travel_options(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    for v in (0, 2, t.latest_version()):
        assert _bag(_fmt(spark, t, versionAsOf=v)) == _bag(t.read(version=v))
    ts = t._manifest(1)["ts"]
    assert _bag(_fmt(spark, t, timestampAsOf=ts)) == _bag(t.read(as_of=ts))
    with pytest.raises(Exception, match="versionAsOf OR timestampAsOf"):
        spark.read.format("txtable").option("path", str(t.root)).option(
            "versionAsOf", 0
        ).option("timestampAsOf", ts).load()


def test_pushed_filters_prune_partitions(registered, tmp_path):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        In,
        LessThan,
        StringStartsWith,
    )

    spark = registered
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.range(0, 1000).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
        ),
        key="k",
        stats_cols=["v"],
    )
    for lo in (1000, 2000, 3000):
        t.append(
            spark.range(lo, lo + 1000).select(
                F.col("id").alias("k"),
                (F.col("id") * 2).alias("v"),
                F.concat(F.lit("n"), F.col("id")).alias("name"),
            )
        )
    total = len(TxBatchReader({"path": root}).partitions())
    assert total > 4  # multiple files per append at 8 cores

    def planned(*filters):
        r = TxBatchPruningReader({"path": root})
        unsupported = list(r.pushFilters(list(filters)))
        # EVERY filter is reported unsupported: Spark must re-apply
        assert unsupported == list(filters)
        return len(r.partitions())

    assert planned(GreaterThanOrEqual(("k",), 2500), LessThan(("k",), 2600)) < total / 4
    assert planned(EqualTo(("v",), 5000)) < total / 4  # declared stats col
    assert planned(In(("k",), (10, 3990))) < total  # two point probes
    # no stats for strings: filter kept but prunes nothing
    assert planned(StringStartsWith(("name",), "n1")) == total
    # contradiction prunes to zero files -> the no-row fallback partition
    assert planned(LessThan(("k",), -5)) == 1


def test_null_stat_pruning_logic():
    from pyspark.sql.datasource import EqualTo, IsNotNull, IsNull

    r = TxBatchPruningReader.__new__(TxBatchPruningReader)
    r.m = {"key": "k", "stats_cols": []}
    with_nulls = {"rows": 10, "kmin": 1, "kmax": 5, "knulls": 2}
    no_nulls = {"rows": 10, "kmin": 1, "kmax": 5, "knulls": 0}
    all_null = {"rows": 10, "knulls": 10}
    no_stats = {"rows": 10}
    assert r._may_match(with_nulls, IsNull(("k",)))
    assert not r._may_match(no_nulls, IsNull(("k",)))
    assert r._may_match(no_stats, IsNull(("k",)))  # unknown: keep
    assert r._may_match(with_nulls, IsNotNull(("k",)))
    assert not r._may_match(all_null, IsNotNull(("k",)))
    assert r._may_match(no_stats, IsNotNull(("k",)))
    assert not r._may_match(no_nulls, EqualTo(("k",), 9))
    assert r._may_match(all_null, EqualTo(("k",), 9))  # no range: keep


def test_pruning_never_changes_results(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    ref = t.read()
    for cond in (
        (F.col("id") >= 5) & (F.col("id") < 15),  # straddles + dv row
        F.col("amt") == -1,  # stats-col point (merged row)
        F.col("id").isin(3, 12, 300),  # dv-deleted member
        F.col("id") < -1,  # empty
    ):
        # fresh DataFrame per query: the supported pruning pattern
        got = _fmt(spark, t, pruneFiles="true").filter(cond)
        assert _bag(got) == _bag(ref.filter(cond))


def test_scan_narrows_and_skips_missing_file_end_to_end(registered, tmp_path):
    import os

    spark = registered
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        key="k",
    )
    t.append(spark.range(1000, 2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    nfiles = len(TxBatchReader({"path": root}).partitions())
    pids = lambda d: d.select(F.spark_partition_id().alias("p")).distinct().count()  # noqa: E731
    assert pids(_fmt(spark, t, pruneFiles="true")) == nfiles
    assert (
        pids(
            _fmt(spark, t, pruneFiles="true").filter(
                (F.col("k") >= 1500) & (F.col("k") < 1600)
            )
        )
        < nfiles / 2
    )

    # physically remove a file the filter's key range excludes: the
    # pruned query never opens it (real skip, not cosmetic), while a
    # full scan fails LOUDLY rather than silently dropping rows
    victim = next(f for f in t._manifest()["files"] if f["kmax"] < 1000)
    os.remove(os.path.join(root, victim["path"]))
    assert (
        _fmt(spark, t, pruneFiles="true")
        .filter((F.col("k") >= 1500) & (F.col("k") < 1600))
        .count()
        == 100
    )
    with pytest.raises(Exception):
        _fmt(spark, t, pruneFiles="true").count()
    with pytest.raises(Exception):
        _fmt(spark, t).count()  # default reader: same loud failure


def test_default_reader_is_safe_under_shared_plan_reuse(registered, tmp_path):
    """The Spark 4.1 hazard that makes pruning opt-in: the JVM caches a
    Python source's planned read on the relation and only re-plans when
    the new query pushes filters, so filtered-then-unfiltered on ONE
    DataFrame reuses the pruned plan. The default (no-pushFilters)
    reader is immune; the pruning reader exhibits it — pinned here so a
    future Spark fix surfaces and the default can flip."""
    spark = registered
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        key="k",
    )
    safe = _fmt(spark, t)
    assert safe.count() == 2000
    assert safe.filter(F.col("k") < 100).count() == 100
    assert safe.count() == 2000  # filter-independent plan: no staleness

    sharp = _fmt(spark, t, pruneFiles="true")
    assert sharp.filter(F.col("k") < 100).count() == 100
    stale = sharp.count()
    if stale == 2000:
        pytest.fail(
            "Spark re-planned the filter-less query over a pruned "
            "relation — upstream hazard fixed; pruneFiles can default on"
        )
    assert stale < 2000  # documented stale-plan reuse


def test_evolved_schema_null_fills(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        key="id",
    )
    t.merge(
        spark.createDataFrame(
            [(2, "B", 9), (3, "c", 7)], "id long, v string, extra long"
        ),
        merge_schema=True,
    )
    got, want = _fmt(spark, t), t.read()
    assert got.schema == want.schema
    assert _bag(got) == _bag(want)
    assert got.filter(F.col("extra").isNull()).count() == 1  # pre-evolution row


def test_sql_surface_over_registered_view(registered, tmp_path):
    spark = registered
    t = _churny_table(spark, tmp_path / "t")
    _fmt(spark, t).createOrReplaceTempView("txb_sales")
    got = spark.sql(
        "select count(*) n, sum(amt) s from txb_sales where id between 0 and 50"
    ).first()
    ref = t.read().filter(F.col("id").between(0, 50)).agg(
        F.count("*").alias("n"), F.sum("amt").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (ref["n"], ref["s"])


def test_all_rows_deleted_reads_empty(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        key="id",
    )
    t.delete(F.lit(True))
    df = _fmt(spark, t)
    assert df.count() == 0
    assert df.columns == ["id", "v"]


def test_not_a_tx_table_raises(registered, tmp_path):
    with pytest.raises(TxError, match="not a transactional table"):
        TxBatchReader({"path": str(tmp_path / "nope")})
