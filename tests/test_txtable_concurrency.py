"""Optimistic concurrency under REAL interleaving: multiple writer
threads race appends and merges on one transactional table through
independent handles. The os.link claim protocol must serialize them
with zero lost updates — every batch lands exactly once, versions are
contiguous, and the final state equals the sequential model."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from data_warehouse_project_spark.sources.txtable import TxTable


def test_concurrent_appends_lose_nothing(spark, tmp_path):
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
            h = TxTable(spark, t0.root)  # own handle, shared log
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


def test_concurrent_fenced_appends_are_exactly_once(spark, tmp_path):
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
        h = TxTable(spark, t0.root)
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
