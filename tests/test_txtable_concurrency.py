"""Optimistic concurrency under REAL interleaving: multiple writer
threads race appends and merges on one transactional table through
independent handles. The os.link claim protocol must serialize them
with zero lost updates — every batch lands exactly once, versions are
contiguous, and the final state equals the sequential model."""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxTable


@pytest.fixture(params=["link", "objstore"])
def mk_handle(request):
    """Handle factory parametrizing the racing suites over BOTH commit
    claims: the local os.link primitive and the object-store double
    (sources/objstore.DirectoryConditionalPutClaim — conditional PUT
    with injected latency and 20% lost acks), so the Delta-shaped
    claim contract is EXECUTED against object-store semantics, not
    just documented."""
    from data_warehouse_project_spark.sources.objstore import (
        DirectoryConditionalPutClaim,
    )

    counter = [0]

    def make(spark, root):
        if request.param == "link":
            return TxTable(spark, root)
        counter[0] += 1
        return TxTable(
            spark,
            root,
            claim=DirectoryConditionalPutClaim(
                latency_s=0.02, lost_ack_rate=0.2, seed=counter[0]
            ),
        )

    return make


def test_concurrent_appends_lose_nothing(spark, tmp_path, mk_handle):
    t0 = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([], "writer long, seq long"),
        key="seq",
    )
    n_writers, n_batches = 4, 5
    errors = []

    def writer(w: int) -> None:
        try:
            h = mk_handle(spark, t0.root)  # own handle, shared log
            for s in range(n_batches):
                h.append(
                    spark.createDataFrame([(w, s)], "writer long, seq long")
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append((w, repr(e)))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    got = {(r["writer"], r["seq"]) for r in t0.read().collect()}
    want = {(w, s) for w in range(n_writers) for s in range(n_batches)}
    assert got == want, "every append must land exactly once"
    assert t0.row_count() == n_writers * n_batches
    # versions are contiguous 0..N with no gaps (every claim that won
    # produced a manifest; losers retried onto later numbers)
    assert t0._versions() == list(range(n_writers * n_batches + 1))
    ops = [h["op"] for h in t0.history()]
    assert ops == ["create"] + ["append"] * (n_writers * n_batches)


def test_concurrent_fenced_appends_are_exactly_once(spark, tmp_path, mk_handle):
    """Two handles racing the SAME (app, batch) — e.g. a zombie
    executor replaying a foreachBatch alongside its successor — must
    land the batch exactly once: the loser's claim either fails and
    re-checks the fence, or is skipped up front."""
    t0 = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([], "x long"),
        key="x",
    )
    barrier = threading.Barrier(2)
    results = []

    def racer(tag: int) -> None:
        h = mk_handle(spark, t0.root)
        df = spark.createDataFrame([(tag,)], "x long")
        barrier.wait(timeout=60)
        results.append(h.append(df, txn=("app", 7)))

    threads = [threading.Thread(target=racer, args=(i,)) for i in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert len(results) == 2
    landed = [r for r in results if not r.get("skipped")]
    assert len(landed) == 1, f"exactly one racer must win: {results}"
    assert t0.row_count() == 1
    assert t0._manifest()["txns"] == {"app": 7}


def test_racing_writers_with_unknown_claim_outcomes(spark, tmp_path):
    """The claim primitive is pluggable; an object-store-shaped fault
    (the conditional PUT lands but the ack is lost) surfaces as
    ClaimOutcomeUnknown, and _commit recovers by reading back the
    claimed manifest and comparing commit ids. Under racing writers
    with injected faults, every batch still lands exactly once."""
    import os
    import random

    from data_warehouse_project_spark.sources.txtable import (
        ClaimOutcomeUnknown,
    )

    t0 = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([], "writer long, seq long"),
        key="seq",
    )

    def flaky_claim_factory(seed):
        rng = random.Random(seed)

        def claim(tmp, target):
            r = rng.random()
            if r < 0.25:
                # fault AFTER the PUT landed: ack lost
                try:
                    os.link(tmp, target)
                except FileExistsError:
                    pass  # somebody else's manifest is there
                raise ClaimOutcomeUnknown("ack lost after PUT")
            if r < 0.40:
                # fault BEFORE anything landed
                raise ClaimOutcomeUnknown("timeout before PUT")
            try:
                os.link(tmp, target)
                return True
            except FileExistsError:
                return False

        return claim

    n_writers, n_batches = 4, 4
    errors = []

    def writer(w: int) -> None:
        try:
            h = TxTable(spark, t0.root, claim=flaky_claim_factory(w))
            for s in range(n_batches):
                # the fenced append is the realistic shape: a writer
                # whose claim outcome was unknown retries the batch and
                # the fence dedups if it had actually landed
                h.append(
                    spark.createDataFrame(
                        [(w, s)], "writer long, seq long"
                    ),
                    txn=(f"w{w}", s),
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append((w, repr(e)))

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    got = sorted(
        (r["writer"], r["seq"]) for r in t0.read().collect()
    )
    want = sorted((w, s) for w in range(n_writers) for s in range(n_batches))
    assert got == want, "exactly-once under injected claim faults"
    # versions contiguous: unknown-outcome recovery never burned or
    # duplicated a version number
    assert t0._versions() == list(range(t0.latest_version() + 1))


def test_disjoint_merge_rebases_past_foreign_append(spark, tmp_path):
    """Logical conflict detection: a merge that loses the version claim
    to a commit touching OTHER files rebases its already-written files
    onto the winner's manifest and succeeds — the Spark work is not
    redone and nothing is lost."""
    import os

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(40)], "id long, n long"),
        key="id",
    )
    t.compact(target_files=4, cluster=True)
    foreign = TxTable(spark, t.root)

    fired = []

    def interposing_claim(tmp, target):
        if not fired:
            fired.append(1)
            # a foreign append wins the race for this version number
            foreign.append(
                spark.createDataFrame([(500, 99)], "id long, n long")
            )
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False

    t2 = TxTable(spark, t.root, claim=interposing_claim)
    r = t2.merge(spark.createDataFrame([(3, 7)], "id long, n long"))
    assert fired and r["rows_delta"] == 0  # update in place, rebased
    got = {x["id"]: x["n"] for x in t.read().collect()}
    assert got[3] == 7 and got[500] == 99 and len(got) == 41
    ops = [h["op"] for h in t.history()]
    assert ops[-2:] == ["append", "merge"]  # both commits landed


def test_overlapping_concurrent_rewrite_still_conflicts(spark, tmp_path):
    """If the race winner changed one of OUR touched files, rebase must
    refuse: the rewrite was computed against stale contents."""
    import os

    from data_warehouse_project_spark.sources.txtable import TxConflictError

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(40)], "id long, n long"),
        key="id",
    )
    t.compact(target_files=4, cluster=True)
    foreign = TxTable(spark, t.root)
    fired = []

    def interposing_claim(tmp, target):
        if not fired:
            fired.append(1)
            foreign.update(F.col("id") == 3, {"n": F.lit(-1)})  # same file
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False

    t2 = TxTable(spark, t.root, claim=interposing_claim)
    with pytest.raises(TxConflictError):
        t2.merge(spark.createDataFrame([(4, 7)], "id long, n long"))
    # the foreign update won; the failed merge left no trace
    got = {x["id"]: x["n"] for x in t.read().collect()}
    assert got[3] == -1 and got[4] == 0


def test_fenced_twin_rebase_degrades_to_skip(spark, tmp_path):
    """A concurrent duplicate of the SAME fenced txn landing first makes
    the loser's rebase a skip — exactly-once preserved."""
    import os

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(10)], "id long, n long"),
        key="id",
    )
    foreign = TxTable(spark, t.root)
    fired = []

    def interposing_claim(tmp, target):
        if not fired:
            fired.append(1)
            foreign.rewrite_by_keys(
                spark.createDataFrame([(3,)], "id long"),
                lambda s: s.withColumn(
                    "n", F.when(F.col("id") == 3, 1).otherwise(F.col("n"))
                ),
                txn=("twin", 7),
            )
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False

    t2 = TxTable(spark, t.root, claim=interposing_claim)
    r = t2.rewrite_by_keys(
        spark.createDataFrame([(3,)], "id long"),
        lambda s: s.withColumn(
            "n", F.when(F.col("id") == 3, 100).otherwise(F.col("n"))
        ),
        txn=("twin", 7),
    )
    assert r.get("skipped")
    got = {x["id"]: x["n"] for x in t.read().collect()}
    assert got[3] == 1, "first twin's effect wins exactly once"


def test_racing_disjoint_mergers_all_succeed(spark, tmp_path, mk_handle):
    """Integration: writer threads merging DISJOINT key ranges of a
    clustered table never see a conflict (rebase absorbs the races) and
    every batch lands."""
    t0 = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame(
            [(i, -1) for i in range(400)], "id long, n long"
        ),
        key="id",
    )
    t0.compact(target_files=8, cluster=True)
    n_writers, n_batches = 4, 3
    errors = []

    def writer(w: int) -> None:
        try:
            h = mk_handle(spark, t0.root)
            for s in range(n_batches):
                lo = w * 100 + s * 20
                h.merge(
                    spark.createDataFrame(
                        [(k, w) for k in range(lo, lo + 10)], "id long, n long"
                    )
                )
        except Exception as e:  # pragma: no cover
            errors.append((w, repr(e)))

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    got = {r["id"]: r["n"] for r in t0.read().collect()}
    for w in range(n_writers):
        for s in range(n_batches):
            for k in range(w * 100 + s * 20, w * 100 + s * 20 + 10):
                assert got[k] == w, (w, s, k)
    assert t0.row_count() == 400


def test_racing_merges_inserting_same_absent_key_conflict(spark, tmp_path):
    """Two concurrent merges inserting the SAME previously-absent key
    must NOT both succeed: the loser's rebase sees the winner ADDED a
    file whose key range may contain its source keys and raises —
    Delta's ConcurrentAppendException semantics. (Before this check the
    rebase only vetted TOUCHED files, so both inserts landed and the
    merge key was silently duplicated.)"""
    import os

    from data_warehouse_project_spark.sources.txtable import TxConflictError

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(40)], "id long, n long"),
        key="id",
    )
    t.compact(target_files=4, cluster=True)
    foreign = TxTable(spark, t.root)
    fired = []

    def interposing_claim(tmp, target):
        if not fired:
            fired.append(1)
            foreign.merge(spark.createDataFrame([(999, 1)], "id long, n long"))
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False

    t2 = TxTable(spark, t.root, claim=interposing_claim)
    with pytest.raises(TxConflictError):
        t2.merge(spark.createDataFrame([(999, 2)], "id long, n long"))
    rows = t.read().filter(F.col("id") == 999).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1, "exactly one 999 row"
    # and the caller-driven retry path works: re-running the loser's
    # merge from the new snapshot now MATCHES the winner's row
    r = t2.merge(spark.createDataFrame([(999, 2)], "id long, n long"))
    assert not r.get("skipped")
    rows = t.read().filter(F.col("id") == 999).collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


def test_racing_rewrites_on_same_absent_key_conflict(spark, tmp_path):
    """rewrite_by_keys has the same hole shape: a foreign commit adding
    rows for this op's key set between snapshot and claim must conflict
    (the transform assumed those keys were absent outside the slice)."""
    import os

    from data_warehouse_project_spark.sources.txtable import TxConflictError

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(20)], "id long, n long"),
        key="id",
    )
    foreign = TxTable(spark, t.root)
    fired = []

    def interposing_claim(tmp, target):
        if not fired:
            fired.append(1)
            foreign.append(spark.createDataFrame([(500, 7)], "id long, n long"))
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False

    t2 = TxTable(spark, t.root, claim=interposing_claim)
    with pytest.raises(TxConflictError):
        t2.rewrite_by_keys(
            spark.createDataFrame([(500,)], "id long"),
            lambda s: s.unionByName(
                spark.createDataFrame([(500, 8)], "id long, n long")
            ),
        )
    rows = t.read().filter(F.col("id") == 500).collect()
    assert len(rows) == 1 and rows[0]["n"] == 7


def test_predicate_delete_conflicts_with_concurrent_append(spark, tmp_path):
    """A predicate-driven DELETE whose claim race is lost to an append
    must conflict unconditionally: the appended rows could have matched
    the predicate, and rebasing past them would leave them undeleted
    while reporting success."""
    import os

    from data_warehouse_project_spark.sources.txtable import TxConflictError

    t = TxTable.create(
        spark,
        tmp_path / "t",
        spark.createDataFrame([(i, i % 2) for i in range(20)], "id long, n long"),
        key="id",
    )
    foreign = TxTable(spark, t.root)
    fired = []

    def interposing_claim(tmp, target):
        if not fired:
            fired.append(1)
            foreign.append(spark.createDataFrame([(100, 1)], "id long, n long"))
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False

    t2 = TxTable(spark, t.root, claim=interposing_claim)
    with pytest.raises(TxConflictError):
        t2.delete(F.col("n") == 1)
    # retry from the new snapshot deletes the appended row too
    r = t2.delete(F.col("n") == 1)
    assert r["rows_deleted"] == 11
    assert t.read().filter(F.col("n") == 1).count() == 0
