from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from data_warehouse_project_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from data_warehouse_project_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# Process-parallel test execution (r15, VERDICT item 2).
#
# The full suite is ~54 min single-process on 32 cores — almost entirely
# fixed per-Spark-job latency in 700+ tiny tests, which one process
# serializes while 24+ cores idle. pytest-xdist is not installed in this
# environment, so this conftest implements the same by-file process fan-out
# directly: the parent pytest session collects as usual, then (instead of
# running) partitions the collected items BY FILE (longest-file-first onto
# the least-loaded worker; per-file grouping keeps module/session fixtures
# and in-file ordering intact) across N worker subprocesses, each a plain
# `pytest <nodeids>` with its own working directory (derby/metastore/
# .hypothesis isolation) and its own 8-core Spark session. The parent
# streams per-worker summaries, AGGREGATES the counts, and fails loudly
# unless every worker produced a parseable summary and the executed total
# equals the collected total — a worker crash or silent skip can never
# read as green.
#
# Fidelity with the sequential run: same tests, same per-file order, same
# fixtures; `-x` propagates (first failing worker cancels the rest).
# Sequential fallback (collection untouched, normal in-process run) for:
# -k/-m filters, --collect-only, explicit nodeids with ::, --pdb, small
# selections, or SPARK_GRAFT_PYTEST_PAR=0 (the kill-switch).
# ---------------------------------------------------------------------------

#: measured per-file wall from the r15 baseline run (top-120 durations,
#: rank-correct; unlisted files default small) — drives longest-first
#: placement so the big integration files don't land on one worker.
_FILE_COST = {
    "test_etl_tx.py": 575, "test_txjoinview.py": 403, "test_txcdf.py": 187,
    "test_queries_oracle.py": 117, "test_support_hygiene.py": 111,
    "test_rangejoin.py": 107, "test_txtable_stream.py": 97,
    "test_txtable.py": 96, "test_etl.py": 92,
    "test_topk_approx_properties.py": 90, "test_streaming_corpus.py": 76,
    "test_merge.py": 74, "test_topk_measures.py": 60, "test_txfeed.py": 55,
    "test_fparts_repair.py": 53, "test_scd2_apply.py": 53,
    "test_scd_properties.py": 52, "test_txrouter.py": 43,
    "test_txbatch_source.py": 36, "test_bloom_skipping.py": 35,
    "test_churn_cache.py": 31, "test_sources.py": 28, "test_prefix.py": 25,
    "test_txcdf_source.py": 23, "test_incremental.py": 23,
    "test_topk_approx.py": 20, "test_similarity_index.py": 19,
    "test_hist_measures.py": 18, "test_bloom.py": 17,
    "test_merge_by_keys.py": 15, "test_streaming.py": 10,
    "test_txcatalog.py": 10, "test_graph.py": 9,
}

_SUMMARY_RE = re.compile(
    r"(\d+) (passed|failed|skipped|xfailed|xpassed|error|errors|deselected)"
)


def _n_workers() -> int:
    env = os.environ.get("SPARK_GRAFT_PYTEST_WORKERS")
    if env:
        return max(1, int(env))
    return max(1, min(4, (os.cpu_count() or 8) // 8))


def pytest_runtestloop(session):
    if os.environ.get("SPARK_GRAFT_PYTEST_WORKER") == "1":
        return None
    if os.environ.get("SPARK_GRAFT_PYTEST_PAR", "1") != "1":
        return None
    opt = session.config.option
    if (
        getattr(opt, "collectonly", False)
        or getattr(opt, "keyword", None)
        or getattr(opt, "markexpr", None)
        or getattr(opt, "usepdb", False)
        or getattr(opt, "lf", False)
        or getattr(opt, "durations", None) is not None
    ):
        return None
    # explicit ::nodeid selections run in-process (partitioning would
    # re-group them per file anyway, but keep the semantics obvious)
    if any("::" in a for a in session.config.invocation_params.args):
        return None
    items = session.items
    n_workers = _n_workers()
    if len(items) < 50 or n_workers < 2:
        return None

    # group by file, keep in-file order
    by_file: dict[str, list] = {}
    for it in items:
        by_file.setdefault(str(it.path), []).append(it)
    # longest-first onto the least-loaded worker
    def cost(f: str) -> int:
        return _FILE_COST.get(os.path.basename(f), 5)

    buckets: list[list[str]] = [[] for _ in range(n_workers)]
    loads = [0] * n_workers
    for f in sorted(by_file, key=cost, reverse=True):
        w = loads.index(min(loads))
        buckets[w].append(f)
        loads[w] += cost(f)

    exitfirst = bool(
        getattr(opt, "exitfirst", False) or getattr(opt, "maxfail", 0) == 1
    )
    tr = session.config.pluginmanager.get_plugin("terminalreporter")

    def say(msg: str) -> None:
        if tr is not None:
            tr.write_line(msg)
        else:
            print(msg, flush=True)

    say(
        f"[parallel] {len(items)} tests in {len(by_file)} files across "
        f"{n_workers} workers (SPARK_GRAFT_PYTEST_PAR=0 for sequential)"
    )
    procs = []
    t0 = time.time()
    scratch = tempfile.mkdtemp(prefix="pt_par_")
    try:
        for w, files in enumerate(buckets):
            if not files:
                continue
            ids = [
                str(REPO_ROOT / it.nodeid) for f in files for it in by_file[f]
            ]
            cwd = os.path.join(scratch, f"w{w}")
            os.makedirs(cwd)
            cmd = [
                sys.executable, "-m", "pytest", "-q",
                "-p", "no:cacheprovider",
                f"--basetemp={cwd}/tmp",
            ]
            if exitfirst:
                cmd.append("-x")
            cmd += ids
            # own cwd isolates derby/metastore/.hypothesis, so the
            # repo root must ride PYTHONPATH instead of cwd — Spark's
            # executor-side Python workers import the package from it
            pp = os.environ.get("PYTHONPATH", "")
            env = dict(
                os.environ,
                SPARK_GRAFT_PYTEST_WORKER="1",
                PYTHONPATH=(
                    f"{REPO_ROOT}{os.pathsep}{pp}" if pp else str(REPO_ROOT)
                ),
            )
            out = open(os.path.join(scratch, f"w{w}.log"), "w+")
            procs.append(
                (
                    w,
                    sum(len(by_file[f]) for f in files),
                    subprocess.Popen(
                        cmd, cwd=cwd, env=env, stdout=out, stderr=out
                    ),
                    out,
                )
            )
        failed = 0
        executed = 0
        pending = list(procs)
        bad: list[int] = []
        last_beat = time.time()
        while pending:
            time.sleep(2)
            if time.time() - last_beat >= 60:
                last_beat = time.time()
                say(
                    f"[parallel] heartbeat {time.time() - t0:.0f}s: "
                    f"{len(pending)} worker(s) running"
                )
            for rec in list(pending):
                w, n_items, p, out = rec
                rc = p.poll()
                if rc is None:
                    continue
                pending.remove(rec)
                out.flush()
                out.seek(0)
                text = out.read()
                # parse ONLY the final summary line — test bodies may
                # legitimately print "N passed"-shaped strings
                summary = next(
                    (
                        ln
                        for ln in reversed(text.strip().splitlines())
                        if _SUMMARY_RE.search(ln)
                        and ("in " in ln or "=" in ln)
                    ),
                    "",
                )
                counts = dict(
                    (k, int(v)) for v, k in _SUMMARY_RE.findall(summary)
                )
                ran = sum(
                    v for k, v in counts.items() if k != "deselected"
                )
                executed += ran
                failed += counts.get("failed", 0) + counts.get(
                    "error", counts.get("errors", 0)
                )
                tail = "\n".join(text.strip().splitlines()[-1:])
                say(
                    f"[parallel] worker {w}: rc={rc} "
                    f"({ran}/{n_items} ran) {tail}"
                )
                if rc != 0 or ran != n_items:
                    bad.append(w)
                    # surface the failure detail in the parent output
                    say(f"[parallel] ---- worker {w} output ----")
                    for line in text.splitlines()[-200:]:
                        say(line)
                    # only -x cancels siblings; a plain run lets the
                    # other workers finish and reports every failure,
                    # like the sequential loop would
                    if exitfirst:
                        for _, _, q, _ in pending:
                            q.terminate()
        wall = time.time() - t0
        if bad and failed == 0:
            failed = len(bad)  # crash/short-count with no parsed failures
        session.testsfailed = failed
        session.testscollected = len(items)
        verdict = (
            f"{executed - failed} passed, {failed} failed"
            if failed
            else f"{executed} passed"
        )
        say(
            f"[parallel] TOTAL: {verdict} of {len(items)} collected "
            f"in {wall:.1f}s across {n_workers} workers"
        )
        if not bad and not failed and executed != len(items):
            session.testsfailed = 1
            say(
                f"[parallel] FAIL: executed {executed} != collected "
                f"{len(items)} — refusing to report green"
            )
        elif tr is not None and not failed:
            # make the reporter's final line read "<n> passed" instead
            # of "no tests ran" (the runs happened in the workers); a
            # tally only needs to be countable
            class _Tally:
                count_towards_summary = True

            tr.stats.setdefault("passed", []).extend(
                _Tally() for _ in range(executed)
            )
    finally:
        for _, _, p, out in procs:
            if p.poll() is None:
                p.terminate()
            out.close()
        shutil.rmtree(scratch, ignore_errors=True)
    return True
