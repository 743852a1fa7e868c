"""Bloom-filter file skipping (TxTable bloom sidecars): equality
probes must skip files min/max ranges cannot — with NO false negatives
ever (every matching row always comes back), and every unsure case
(no sidecar, huge probe set, NULL probes, disabled config) degrading
to the plain stats behavior.

Reference analogue: the reference's loads probe dimensions by natural
key through B-tree indexes (create_ddl_objects_3NF_layer.sql PRIMARY
KEYs); at 100 TB on immutable parquet the equivalent point-lookup
structure is per-file bloom sidecars, Delta/Iceberg-style.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import (
    BLOOMS_DIR,
    TxError,
    TxTable,
)

N = 4000
FILES = 8


def _scattered(spark, n=N, parts=FILES, extra=0):
    """Rows whose int key is SCATTERED (Knuth multiplicative hash): in
    any row subset the key range spans nearly the whole domain, so
    per-file [kmin, kmax] stats prune nothing — the bloom's home turf.
    """
    return (
        spark.range(extra, n + extra, 1, parts)
        .select(
            ((F.col("id") * 2654435761) % (1 << 31)).alias("k"),
            (F.col("id") % 97).alias("grp"),
            F.concat(F.lit("tag-"), F.col("id") % 53).alias("tag"),
            (F.col("id") * 7).alias("val"),
        )
    )


@pytest.fixture(scope="module")
def bloomed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bloom") / "t"
    df = _scattered(spark)
    t = TxTable.create(
        spark, root, df, key="k", bloom_cols=["k", "tag"]
    )
    return t, df


def _key_of(i: int) -> int:
    return (i * 2654435761) % (1 << 31)


def test_scattered_keys_prune_where_ranges_cannot(spark, bloomed):
    t, df = bloomed
    m = t._manifest()
    assert len(m["files"]) == FILES
    # ranges are useless by construction: every file spans (almost)
    # the whole key domain, so range-only pruning keeps everything
    lo = max(f["kmin"] for f in m["files"])
    hi = min(f["kmax"] for f in m["files"])
    assert lo < hi, "fixture must produce overlapping ranges"
    probe = spark.createDataFrame(
        [(_key_of(3),), (_key_of(777),), (_key_of(3999),)], "k long"
    )
    touched = t._touched_by_keys(m, probe)
    assert len(touched) < FILES, (
        f"bloom should beat ranges: touched {len(touched)}/{FILES}"
    )
    # and the contract holds: every matching row is in the pruned read
    got = (
        t.read_for_keys(probe)
        .join(probe.hint("broadcast"), "k", "left_semi")
        .orderBy("k")
        .collect()
    )
    assert [r["k"] for r in got] == sorted(
        _key_of(i) for i in (3, 777, 3999)
    )


def test_no_false_negatives_across_many_probes(spark, bloomed):
    t, df = bloomed
    # every 83rd key individually: each must come back from the pruned
    # read — a single false negative is silent row loss in a merge
    keys = [_key_of(i) for i in range(0, N, 83)]
    got = (
        t.read_for_values("k", keys)
        .filter(F.col("k").isin(keys))
        .select("k")
        .distinct()
        .count()
    )
    assert got == len(keys)


def test_absent_values_prune_to_near_zero(spark, bloomed):
    t, _ = bloomed
    absent = [(1 << 40) + i for i in range(20)]  # outside every range
    assert t.files_for_values("k", absent) == []
    # in-range but never written: blooms must cut most files (fpp ~1%)
    absent_in_range = [_key_of(i) + 1 for i in range(50, 70)]
    paths = t.files_for_values("k", absent_in_range)
    assert len(paths) <= 2, f"expected ~0 fp files, got {len(paths)}"
    assert t.read_for_values("k", absent_in_range).filter(
        F.col("k").isin(absent_in_range)
    ).count() == 0


def test_string_column_blooms_prune_without_stats(spark, bloomed):
    t, df = bloomed
    # tag has NO range stats (string), so stats keep all 8 files;
    # blooms prune to the files holding the tag — here every file
    # (tags repeat mod 53 in each), so probe an ABSENT tag instead
    assert len(t.files_for_values("tag", ["tag-7"])) == FILES
    assert t.files_for_values("tag", ["no-such-tag"]) == []
    got = (
        t.read_for_values("tag", ["tag-7"])
        .filter(F.col("tag") == "tag-7")
        .count()
    )
    assert got == df.filter(F.col("tag") == "tag-7").count()


def test_pre_bloom_files_never_pruned_post_enable(spark, tmp_path):
    df = _scattered(spark, n=1000, parts=4)
    t = TxTable.create(spark, tmp_path / "t", df, key="k")
    t.enable_bloom(["k"])
    t.append(_scattered(spark, n=1000, parts=4, extra=5000))
    m = t._manifest()
    old = {f["path"] for f in m["files"] if "bloom" not in f}
    assert len(old) == 4 and len(m["files"]) == 8
    # a key absent everywhere: pre-bloom files all kept, new all cut
    paths = set(t.files_for_values("k", [(1 << 40)]))
    assert paths == set() , "range stats already exclude out-of-range"
    in_range_absent = [_key_of(i) + 1 for i in range(30)]
    paths = set(t.files_for_values("k", in_range_absent))
    assert old <= paths, "files without sidecars must be kept"
    assert len(paths - old) <= 1  # new files bloom-pruned (fpp slack)


def test_null_probe_keeps_null_holding_files(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, "x")] + [(_key_of(i), "y") for i in range(200)],
        "k long, s string",
    ).repartition(4)
    t = TxTable.create(spark, tmp_path / "t", df, key="k",
                       bloom_cols=["k"])
    paths = t.files_for_values("k", [None])
    rows = t._read_files(t._manifest(), paths)
    assert rows.filter(F.col("k").isNull()).count() == 1
    # and via the merge/read_for_keys path
    probe = spark.createDataFrame([(None,)], "k long")
    assert (
        t.read_for_keys(probe).filter(F.col("k").isNull()).count() == 1
    )


def test_oversized_probe_set_bypasses_blooms(spark, bloomed):
    t, _ = bloomed
    m = t._manifest()
    big = spark.range(0, 3000).select(
        ((F.col("id") * 2654435761) % (1 << 31)).alias("k")
    )
    # > BLOOM_PROBE_MAX_KEYS distinct keys: blooms step aside, the
    # range probe's answer comes back unchanged (here: all files)
    assert len(t._touched_by_keys(m, big)) == FILES


def test_merge_on_bloomed_table_is_exact(spark, tmp_path):
    df = _scattered(spark, n=1200, parts=6)
    t = TxTable.create(spark, tmp_path / "t", df, key="k",
                       bloom_cols=["k"])
    upd = spark.createDataFrame(
        [(_key_of(5), 11, "tag-5", -1), (_key_of(4321) + 1, 1, "new", -2)],
        "k long, grp long, tag string, val long",
    )
    r = t.merge(upd)
    assert r["rows_delta"] == 1  # one insert; the update is in place
    assert t.read().filter(F.col("val") < 0).count() == 2
    assert t.read().count() == 1201
    # merged-in rows are probeable through the fresh sidecars
    assert (
        t.read_for_values("k", [_key_of(4321) + 1])
        .filter(F.col("val") == -2)
        .count()
        == 1
    )


def test_vacuum_reaps_unreferenced_bloom_dirs(spark, tmp_path):
    df = _scattered(spark, n=500, parts=2)
    t = TxTable.create(spark, tmp_path / "t", df, key="k",
                       bloom_cols=["k"])
    t.overwrite(_scattered(spark, n=500, parts=2, extra=9000))
    t.overwrite(_scattered(spark, n=500, parts=2, extra=18000))
    n_dirs = len(list((t.root / BLOOMS_DIR).iterdir()))
    assert n_dirs == 3
    r = t.vacuum(retain_versions=1, min_age_s=0, force=True)
    assert r["dropped_blooms"] == 2
    left = list((t.root / BLOOMS_DIR).iterdir())
    assert len(left) == 1
    # the survivor still prunes and reads exactly
    k = (9000 + 18000) * 0  # keys from the LAST overwrite only
    keys = [_key_of(18000 + i) for i in range(3)]
    got = t.read_for_values("k", keys).filter(F.col("k").isin(keys))
    assert got.count() == 3


def test_disable_bloom_degrades_to_stats_only(spark, tmp_path):
    df = _scattered(spark, n=600, parts=3)
    t = TxTable.create(spark, tmp_path / "t", df, key="k",
                       bloom_cols=["k"])
    assert len(t.files_for_values("k", [_key_of(1) + 1])) <= 1
    t.disable_bloom()
    assert t.bloom_config() is None
    # ranges alone: scattered keys keep everything
    assert len(t.files_for_values("k", [_key_of(1) + 1])) == 3
    got = t.read_for_values("k", [_key_of(7)])
    assert got.filter(F.col("k") == _key_of(7)).count() == 1


def test_enable_bloom_validation(spark, tmp_path):
    df = _scattered(spark, n=100, parts=1)
    t = TxTable.create(spark, tmp_path / "t", df, key="k")
    with pytest.raises(TxError, match="not in schema"):
        t.enable_bloom(["nope"])
    with pytest.raises(TxError, match="power of two"):
        t.enable_bloom(["k"], max_m_bits=3000)
    with pytest.raises(TxError, match=">= 1"):
        t.enable_bloom(["k"], k=0)
    with pytest.raises(TxError, match="bloom column"):
        TxTable.create(spark, tmp_path / "t2", df, bloom_cols=["zz"])


# ------------------------- native data source (driver-side planning)


def test_python_xxh64_matches_spark_bit_for_bit(spark):
    """The pure-Python xxh64 twin (functions/xxh64.py) must equal
    F.xxhash64 exactly — it is what lets the native source's planner
    probe executor-built bloom sidecars without launching a job."""
    from data_warehouse_project_spark.functions.xxh64 import (
        spark_xxhash64,
        spark_xxhash64_salted,
    )
    from data_warehouse_project_spark.sources.txtable import _BLOOM_SALT

    longs = [0, 1, -1, 42, 2654435761, -(1 << 62), (1 << 62) + 12345]
    strs = ["", "a", "hello world", "ünïcødé-ßtring", "x" * 7, "y" * 8,
            "z" * 31, "w" * 32, "v" * 100]
    ints = [0, -1, 7, -(1 << 31), (1 << 31) - 1]
    df = spark.createDataFrame(
        [(l, None, None) for l in longs]
        + [(None, t, None) for t in strs]
        + [(None, None, i) for i in ints],
        "l long, t string, i int",
    )
    got = df.select(
        "l", "t", "i",
        F.xxhash64("l").alias("hl"),
        F.xxhash64("l", F.lit(_BLOOM_SALT)).alias("hl2"),
        F.xxhash64("t").alias("ht"),
        F.xxhash64("t", F.lit(_BLOOM_SALT)).alias("ht2"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("i", F.lit(_BLOOM_SALT)).alias("hi2"),
    ).collect()
    for r in got:
        for v, ty, h, h2 in (
            (r["l"], "long", r["hl"], r["hl2"]),
            (r["t"], "string", r["ht"], r["ht2"]),
            (r["i"], "integer", r["hi"], r["hi2"]),
        ):
            if v is None:
                continue
            assert spark_xxhash64(v, ty) == h, (v, ty)
            assert spark_xxhash64_salted(v, ty, _BLOOM_SALT) == h2, (v, ty)


def test_native_source_bloom_prunes_partitions(spark, tmp_path):
    """spark.read.format('txtable') with pruneFiles: a pushed equality
    on a bloom column plans FEWER partitions than stats allow, and the
    result is exact."""
    from data_warehouse_project_spark.sources.txbatch import (
        TxBatchDataSource,
        TxBatchPruningReader,
        TxBatchReader,
    )
    from pyspark.sql.datasource import EqualTo, In

    spark.dataSource.register(TxBatchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark, root, _scattered(spark), key="k", bloom_cols=["k", "tag"]
    )
    total = len(TxBatchReader({"path": root}).partitions())
    assert total == FILES

    def planned(*filters):
        r = TxBatchPruningReader({"path": root})
        assert list(r.pushFilters(list(filters))) == list(filters)
        return len(r.partitions())

    # scattered key: ranges keep all 8, blooms cut to the real holders
    k3 = _key_of(3)
    assert planned(EqualTo(("k",), k3)) < total
    assert planned(In(("k",), (k3, _key_of(777)))) < total
    # string bloom column with no stats at all
    assert planned(EqualTo(("tag",), "no-such-tag")) == 1  # empty fallback
    # end-to-end through the real reader: exact rows
    got = (
        t.pruned_df().filter(F.col("k") == k3).collect()
    )
    assert len(got) == 1 and got[0]["k"] == k3
    # absent value: zero rows, and the plan collapsed to the fallback
    assert t.pruned_df().filter(F.col("k") == k3 + 1).count() == 0


def test_native_source_bloom_conservative_paths(spark, tmp_path):
    """Files without sidecars and oversized candidate sets must pass
    through untouched."""
    from data_warehouse_project_spark.sources.txbatch import (
        TxBatchPruningReader,
        TxBatchReader,
    )
    from pyspark.sql.datasource import EqualTo

    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _scattered(spark, n=1000, parts=4),
                       key="k")
    t.enable_bloom(["k"])
    t.append(_scattered(spark, n=1000, parts=4, extra=5000))
    r = TxBatchPruningReader({"path": root})
    r.pushFilters([EqualTo(("k",), 12345678901)])  # absent everywhere
    # in-range absent: 4 pre-bloom files kept, 4 bloomed files cut
    r2 = TxBatchPruningReader({"path": root})
    r2.pushFilters([EqualTo(("k",), _key_of(20) + 1)])
    kept = len(r2.partitions())
    assert 4 <= kept <= 5  # pre-bloom files + fpp slack
    # oversized candidate set: bloom steps aside entirely
    r3 = TxBatchPruningReader({"path": root})
    r3.BLOOM_PROBE_MAX_FILES = 2
    r3.pushFilters([EqualTo(("k",), _key_of(20) + 1)])
    assert len(r3.partitions()) == 8


def test_compaction_rebuilds_bloom_sidecars(spark, tmp_path):
    """compact() goes through the same write path, so rewritten files
    get FRESH sidecars and point probes stay exact — this is also how
    pre-bloom files acquire filters after enable_bloom."""
    t = TxTable.create(spark, tmp_path / "t",
                       _scattered(spark, n=800, parts=8), key="k")
    t.enable_bloom(["k"])
    m = t._manifest()
    assert all("bloom" not in f for f in m["files"])
    t.compact(target_files=2)
    m = t._manifest()
    assert m["files"] and all("bloom" in f for f in m["files"])
    # post-compaction probes prune and read exactly
    k = _key_of(123)
    paths = t.files_for_values("k", [k])
    assert len(paths) < len(m["files"]) or len(m["files"]) == 1
    assert t.read_for_values("k", [k]).filter(
        F.col("k") == k
    ).count() == 1


def test_advisor_recommends_bloom_for_scattered_keys(spark, tmp_path):
    """maintenance_plan (zero jobs): a key whose per-file ranges each
    span the whole domain gets a 'bloom' action; maintain() enables the
    config FIRST so the same pass's rewrite builds sidecars; the next
    plan is quiet about bloom."""
    t = TxTable.create(spark, tmp_path / "t",
                       _scattered(spark, n=2000, parts=8), key="k")
    plan = TxTable(None, tmp_path / "t").maintenance_plan()
    acts = {a["action"]: a for a in plan["actions"]}
    assert "bloom" in acts, plan
    assert acts["bloom"]["args"]["cols"] == ["k"]
    assert plan["stats"]["bloom_cols"] == []
    r = t.maintain(plan)
    assert r["results"]["bloom"]["cols"] == ["k"]
    # the same pass's cluster/compact rewrite built sidecars
    m = t._manifest()
    assert any("bloom" in f for f in m["files"])
    # point probes are now selective, and the advisor has moved on
    k = _key_of(55)
    assert len(t.files_for_values("k", [k])) <= 2
    assert t.read_for_values("k", [k]).filter(F.col("k") == k).count() == 1
    plan2 = t.maintenance_plan()
    assert "bloom" not in {a["action"] for a in plan2["actions"]}
    assert plan2["stats"]["bloom_cols"] == ["k"]


def test_concurrent_appends_keep_sidecars_isolated(spark, tmp_path):
    """Two racing appends each land their OWN per-batch sidecar dir —
    the loser's retry re-stages files but never cross-references the
    winner's sidecars, and probes over the merged manifest stay exact.
    """
    import threading

    t = TxTable.create(spark, tmp_path / "t",
                       _scattered(spark, n=400, parts=2), key="k",
                       bloom_cols=["k"])
    errs = []

    def append(extra):
        try:
            TxTable(spark, tmp_path / "t").append(
                _scattered(spark, n=400, parts=2, extra=extra)
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=append, args=(e,)) for e in (5000, 9000)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    m = t._manifest()
    assert len(m["files"]) == 6 and all("bloom" in f for f in m["files"])
    assert len({f["bloom"] for f in m["files"]}) == 3  # one dir per batch
    # every batch's keys probe exactly through the merged manifest
    for i in (3, 5003, 9003):
        k = _key_of(i)
        got = t.read_for_values("k", [k]).filter(F.col("k") == k)
        assert got.count() == 1, i
    r = t.vacuum(retain_versions=1, min_age_s=0, force=True)
    assert r["dropped_blooms"] == 0  # all three dirs still referenced


def test_property_no_false_negative_over_random_probes(spark, bloomed):
    """Hypothesis over probe subsets of the written keys: a bloom may
    keep extra files, but a file holding a probed value must ALWAYS
    survive — checked at the files_for_values level (cheaper than a
    read) against the ground-truth file assignment."""
    from hypothesis import given, settings, strategies as st

    t, _ = bloomed
    m = t._manifest()
    truth = {}  # key -> file basename set
    for f in m["files"]:
        rows = spark.read.parquet(str(t.root / f["path"])).select("k")
        import os as _os

        b = _os.path.basename(f["path"])
        for r in rows.collect():
            truth.setdefault(r["k"], set()).add(b)
    keys = sorted(truth)

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(st.sampled_from(keys), min_size=1, max_size=6, unique=True)
    )
    def check(probe):
        import os as _os

        got = {
            _os.path.basename(p) for p in t.files_for_values("k", probe)
        }
        need = set().union(*(truth[k] for k in probe))
        assert need <= got, (sorted(need - got), probe)

    check()


def test_pre_bloom_native_batches_backfill_via_advisor(spark, tmp_path):
    """Files natively written BEFORE bloom was enabled have no
    sidecars; the advisor detects the sidecar-less majority and
    maintain() backfills with a rewrite; probes are selective
    afterwards. (Writes AFTER enable_bloom build sidecars in their
    write tasks — test_native_writer_builds_sidecars_at_write_time.)"""
    from data_warehouse_project_spark.sources.txbatch import (
        TxBatchDataSource,
    )

    spark.dataSource.register(TxBatchDataSource)
    root = str(tmp_path / "t")
    t = TxTable.create(spark, root, _scattered(spark, n=200, parts=2),
                       key="k")
    # native batches land while bloom is OFF: no sidecars
    for e in (5000, 9000, 13000):
        _scattered(spark, n=400, parts=2, extra=e).write.format(
            "txtable"
        ).mode("append").save(root)
    t.enable_bloom(["k"])
    m = t._manifest()
    assert sum(1 for f in m["files"] if "bloom" not in f) == 8
    plan = t.maintenance_plan()
    acts = {a["action"] for a in plan["actions"]}
    assert "bloom_backfill" in acts, plan
    t.maintain(plan)
    m2 = t._manifest()
    assert all("bloom" in f for f in m2["files"])
    # selective again, and exact
    k = _key_of(9003)
    assert len(t.files_for_values("k", [k])) < len(m2["files"])
    assert t.read_for_values("k", [k]).filter(F.col("k") == k).count() == 1
    # quiet on the next plan
    assert "bloom_backfill" not in {
        a["action"] for a in t.maintenance_plan()["actions"]
    }


def test_native_writer_builds_sidecars_at_write_time(spark, tmp_path):
    """df.write.format('txtable') into a bloom-enabled table lands
    per-(file, column) sidecars from its own write tasks — probing
    works with NO maintain() pass, for long AND string columns, and a
    fenced txn replay removes the replay's sidecar dir."""
    import os

    from data_warehouse_project_spark.sources.txbatch import (
        TxBatchDataSource,
        TxBatchPruningReader,
    )
    from pyspark.sql.datasource import EqualTo

    spark.dataSource.register(TxBatchDataSource)
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark, root, _scattered(spark, n=200, parts=2), key="k",
        bloom_cols=["k", "tag"],
    )
    for e in (5000, 9000):
        _scattered(spark, n=400, parts=2, extra=e).write.format(
            "txtable"
        ).mode("append").save(root)
    m = t._manifest()
    assert all("bloom" in f for f in m["files"]), "write-time sidecars"
    # long probe: exact, selective, no maintain() ran
    k = _key_of(9003)
    assert len(t.files_for_values("k", [k])) < len(m["files"])
    assert t.read_for_values("k", [k]).filter(F.col("k") == k).count() == 1
    # string probe: absent tag prunes natively-written files too
    assert len(t.files_for_values("tag", ["no-such-tag"])) == 0
    # native pruning reader agrees
    r = TxBatchPruningReader({"path": root})
    r.pushFilters([EqualTo(("k",), k)])
    assert len(r.partitions()) < len(m["files"])
    # fenced replay: second commit skips AND removes its sidecar dir
    before = set(os.listdir(tmp_path / "t" / "blooms"))
    df = _scattered(spark, n=100, parts=1, extra=20000)
    for _ in range(2):
        df.write.format("txtable").option("txnAppId", "app").option(
            "txnVersion", "7"
        ).mode("append").save(root)
    after = set(os.listdir(tmp_path / "t" / "blooms"))
    assert len(after) - len(before) == 1, (before, after)
    # no false negatives across every key ever written
    rows = t.read().count()
    assert rows == 200 + 800 + 100


def test_native_writer_all_null_bloom_column_proves_absence(spark, tmp_path):
    """A natively-written file whose bloom column is entirely NULL
    lands an all-zero bitmap — probes PRUNE it (provably no non-null
    value), while NULL-probe reads still find the rows (blooms encode
    non-null values only; the NULL union keeps the file)."""
    from data_warehouse_project_spark.sources.txbatch import (
        TxBatchDataSource,
    )

    spark.dataSource.register(TxBatchDataSource)
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark, root, _scattered(spark, n=100, parts=1), key="k",
        bloom_cols=["k", "tag"],
    )
    nulls = _scattered(spark, n=100, parts=1, extra=3000).withColumn(
        "tag", F.lit(None).cast("string")
    )
    nulls.write.format("txtable").mode("append").save(root)
    m = t._manifest()
    assert all("bloom" in f for f in m["files"])
    # a tag value that exists only in the FIRST file: the all-null
    # file is pruned by its empty bitmap
    kept = t.files_for_values("tag", ["tag-1"])
    assert len(kept) == 1
    # NULL lookups still see the all-null file's rows
    assert t.read().filter(F.col("tag").isNull()).count() == 100


def test_vectorized_xxh64_matches_scalar_twin():
    """The numpy-vectorized XXH64 used by the native writer's tasks is
    bit-for-bit the scalar twin (itself pinned against F.xxhash64
    below) — longs, 32-bit patterns with array seeds (the salted
    second hash), and byte streams across every length class."""
    import random

    import numpy as np

    from data_warehouse_project_spark.functions import xxh64 as x

    rng = random.Random(1234)
    longs = [rng.randint(-(2**63), 2**63 - 1) for _ in range(500)] + [
        0, -1, 1, 2**63 - 1, -(2**63)
    ]
    got = x.hash_long_np(np.array(longs, dtype=np.int64), 42)
    assert all(
        int(g) == x.hash_long(v, 42) for g, v in zip(got, longs)
    )
    pats = np.array(
        [rng.randint(0, 2**32 - 1) for _ in range(500)], dtype=np.uint32
    )
    seeds = got[:500]
    got2 = x.hash_int_np(pats, seeds)
    assert all(
        int(g) == x.hash_int(int(p), int(s))
        for g, p, s in zip(got2, pats, seeds)
    )
    blobs = [
        bytes(rng.randrange(256) for _ in range(L))
        for L in list(range(0, 70)) * 4
    ] + ["héllo wörld — ünïcode".encode("utf-8"), b""]
    rng.shuffle(blobs)
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    starts, lengths, o = [], [], 0
    for b in blobs:
        starts.append(o)
        lengths.append(len(b))
        o += len(b)
    got3 = x.hash_bytes_np(data, starts, lengths, 42)
    assert all(
        int(g) == x.hash_bytes(b, 42) for g, b in zip(got3, blobs)
    )


def test_oversized_in_list_bypasses_bloom_planning(spark, tmp_path):
    """A pushed IN wider than BLOOM_PROBE_MAX_KEYS must skip bloom
    probing (every value would be hashed with driver-side pure-Python
    xxh64 at PLANNING time) — all stats-surviving files are kept."""
    from data_warehouse_project_spark.sources.txbatch import (
        TxBatchPruningReader,
    )
    from pyspark.sql.datasource import In

    root = str(tmp_path / "t")
    TxTable.create(
        spark, root, _scattered(spark), key="k", bloom_cols=["k"]
    )
    # in-range but absent: stats keep everything, only blooms prune
    absent = tuple(_key_of(i) + 1 for i in range(20, 28))
    r = TxBatchPruningReader({"path": root})
    r.pushFilters([In(("k",), absent)])
    pruned = len(r.partitions())
    assert pruned < FILES  # blooms pruned (fpp slack allowed)
    r2 = TxBatchPruningReader({"path": root})
    r2.BLOOM_PROBE_MAX_KEYS = 4  # now the same IN is "oversized"
    r2.pushFilters([In(("k",), absent)])
    assert len(r2.partitions()) == FILES  # bloom stepped aside


def test_vacuum_reaps_orphan_parts_in_referenced_dirs(spark, tmp_path):
    """A failed/retried write task's sidecar part inside a dir the
    successful tasks committed (so the manifest references the DIR)
    can never cause false pruning — its 'f' basename matches no
    manifest entry — but whole-dir reaping alone would leave it
    unreclaimable forever (r12 ADVICE). vacuum drops such parts
    part-by-part and keeps every live one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = _scattered(spark, n=500, parts=2)
    t = TxTable.create(spark, tmp_path / "t", df, key="k",
                       bloom_cols=["k"])
    bdirs = [d for d in (t.root / BLOOMS_DIR).iterdir() if d.is_dir()]
    assert len(bdirs) == 1
    live_parts = {
        p.name for p in bdirs[0].iterdir() if p.suffix == ".parquet"
    }
    # forge the retried task's leftover: a well-formed sidecar part
    # whose 'f' references a data file no manifest ever committed
    orphan = bdirs[0] / "part-orphan.parquet"
    pq.write_table(
        pa.table(
            {"f": ["never-committed.parquet"], "c": ["k"],
             "m": [1024], "k": [7], "bits": [b"\x00" * 128]},
        ),
        str(orphan),
    )
    r = t.vacuum(retain_versions=1, min_age_s=0, force=True)
    assert r["dropped_bloom_parts"] == 1
    left = {p.name for p in bdirs[0].iterdir() if p.suffix == ".parquet"}
    assert left == live_parts  # orphan gone, every live part kept
    # pruning still exact after the reap
    keys = [_key_of(i) for i in range(3)]
    got = t.read_for_values("k", keys).filter(F.col("k").isin(keys))
    assert got.count() == 3
