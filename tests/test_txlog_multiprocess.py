"""Cross-PROCESS txlog contention (VERDICT r4 #2): the optimistic-commit
protocol stress-tested by separate Spark processes (separate JVMs,
separate SparkSessions) racing commits against one table — the in-process
thread tests cannot certify process-level visibility.

What these tests certify, and on which filesystem semantics: the local
(posix-backed) Hadoop filesystem, where ``fs.create(path,
overwrite=false)`` is CHECK-WITHIN-CREATE, not an atomic O_EXCL claim —
exactly the weak case the commit protocol's read-back token verification
(`sources/txlog.py` ``_commit``) exists for. A lost claim is detected by
the writer re-reading the landed record and finding another writer's
token, then rebuilding against the winner. On HDFS the create itself is
namenode-arbitrated (strictly stronger); on S3/GCS swap in the store's
conditional put (If-None-Match) for ``_create_no_overwrite`` — the
read-back verify then becomes redundant but stays harmless.
"""

import json
import pytest

# slow tier (two-JVM race suites) — skipped unless SPARK_GRAFT_SLOW_TESTS=1;
# fast-tier coverage of the same operators lives in the unit modules
pytestmark = pytest.mark.slow
import os
import subprocess
import sys
import time

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

wid = int(sys.argv[1]); table = sys.argv[2]; barrier = sys.argv[3]
n = int(sys.argv[4]); mode = sys.argv[5]

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"txlog-worker-{{wid}}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX

# rendezvous: mark ready, then spin until every worker is ready, so both
# JVMs are warm before the race starts
open(os.path.join(barrier, f"ready-{{wid}}"), "w").close()
while len([f for f in os.listdir(barrier) if f.startswith("ready-")]) < 2:
    time.sleep(0.05)

if mode == "append":
    for i in range(n):
        df = spark.createDataFrame([(wid, i)], "w long, i long").coalesce(1)
        TX.tx_write(spark, df, table, mode="append")
elif mode == "merge":
    src = spark.createDataFrame(
        [(100 + wid, f"from-w{{wid}}", "p1")], "k long, v string, part string"
    ).coalesce(1)
    try:
        TX.tx_merge(spark, src, table, keys=["k"], partition_by=["part"])
        print("MERGE_OK")
    except TX.TxConflictError as e:
        print("MERGE_CONFLICT")
elif mode == "txn":
    # both processes replay the SAME tagged batches — the txn high-water
    # mark must land each batch exactly once across JVMs
    for i in range(n):
        df = spark.createDataFrame(
            [(i, f"batch-{{i}}")], "b long, v string"
        ).coalesce(1)
        TX.tx_write(spark, df, table, mode="append", txn=("replayer", i))
print("WORKER_DONE")
"""


def _spawn(tmp_path, wid, table, barrier, n, mode):
    script = tmp_path / f"worker{wid}.py"
    script.write_text(WORKER.format(repo=REPO))
    wdir = tmp_path / f"cwd{wid}"
    wdir.mkdir(exist_ok=True)
    return subprocess.Popen(
        [sys.executable, str(script), str(wid), table, str(barrier), str(n), mode],
        cwd=str(wdir),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def test_two_process_append_race_gapless_versions(spark, tmp_path):
    """Two separate Spark processes each commit 5 appends concurrently:
    the version chain must be gapless, every row must survive exactly
    once (no lost update), and the doctor must find a clean table."""
    table = str(tmp_path / "race")
    barrier = tmp_path / "barrier"
    barrier.mkdir()
    n = 5
    procs = [
        _spawn(tmp_path, wid, table, barrier, n, "append") for wid in (1, 2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        assert "WORKER_DONE" in out

    versions, _ = TX._log_listing(spark, table)
    assert versions == list(range(1, 2 * n + 1))  # gapless, nothing lost
    got = sorted(
        (r["w"], r["i"]) for r in TX.tx_read(spark, table).collect()
    )
    assert got == sorted((w, i) for w in (1, 2) for i in range(n))
    # every committed version carries a distinct per-commit writer token
    # (a duplicate would mean one claim landed twice — a lost update)
    writers = [TX.read_commit(spark, table, v)["writer"] for v in versions]
    assert len(set(writers)) == len(versions)

    sys.path.insert(0, REPO)
    from tools.table_doctor import doctor

    rep = doctor(spark, table)
    assert rep["errors"] == [] and rep["orphans"] == []


def test_cross_process_merge_conflict_on_overlapping_partition(
    spark, tmp_path, monkeypatch
):
    """Forced TxConflictError across PROCESS boundaries: while this
    process's tx_merge holds its base snapshot (batch already written,
    commit not yet attempted), a separate Spark process merges into the
    SAME partition. The in-flight merge must detect the invalidated read
    set and raise — and the winner's rows must survive untouched, with
    the loser's orphan batch reaped."""
    import pytest

    table = str(tmp_path / "conflict")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "k long, v string, part string"
    ).coalesce(1)
    TX.tx_merge(spark, base, table, keys=["k"], partition_by=["part"])

    barrier = tmp_path / "barrier2"
    barrier.mkdir()
    # the subprocess barrier waits for 2 ready files; pre-seed one so the
    # single worker proceeds once launched
    (barrier / "ready-0").touch()

    orig_write_batch = TX._write_batch
    fired = {"done": False}

    def write_batch_then_lose_race(df, path, partition_by, *a, **kw):
        out = orig_write_batch(df, path, partition_by, *a, **kw)
        if not fired["done"] and path == table:
            fired["done"] = True
            # base snapshot is held; now let the OTHER PROCESS commit a
            # merge into the same partition before our commit attempt
            p = _spawn(tmp_path, 9, table, barrier, 1, "merge")
            out_err = p.communicate(timeout=300)
            assert p.returncode == 0, out_err[1][-2000:]
            assert "MERGE_OK" in out_err[0]
        return out

    monkeypatch.setattr(TX, "_write_batch", write_batch_then_lose_race)

    src = spark.createDataFrame(
        [(1, "LOSER", "p1")], "k long, v string, part string"
    ).coalesce(1)
    with pytest.raises(TX.TxConflictError, match="touched partitions"):
        TX.tx_merge(spark, src, table, keys=["k"], partition_by=["part"])

    # the winner's merge is intact; the loser changed nothing
    got = {r["k"]: r["v"] for r in TX.tx_read(spark, table).collect()}
    assert got == {1: "a", 2: "b", 109: "from-w9"}
    # failed attempt's batch was reaped immediately (no orphans)
    monkeypatch.undo()
    time.sleep(0.1)
    sys.path.insert(0, REPO)
    from tools.table_doctor import doctor

    rep = doctor(spark, table)
    assert rep["errors"] == [] and rep["orphans"] == []


def test_two_process_txn_replays_land_exactly_once(spark, tmp_path):
    """Two separate Spark processes replay the SAME txn-tagged batch
    sequence concurrently (the restarted-sink-races-its-zombie scenario):
    every batch must land exactly once, the per-app high-water mark must
    equal the last batch id, and any loser's orphan batch files must have
    been cleaned up."""
    table = str(tmp_path / "txnrace")
    barrier = tmp_path / "barrier"
    barrier.mkdir()
    n = 5
    procs = [
        _spawn(tmp_path, wid, table, barrier, n, "txn") for wid in (1, 2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        assert "WORKER_DONE" in out

    got = sorted((r["b"], r["v"]) for r in TX.tx_read(spark, table).collect())
    assert got == [(i, f"batch-{i}") for i in range(n)]  # exactly once
    assert TX.tx_txn_version(spark, table, "replayer") == n - 1

    sys.path.insert(0, REPO)
    from tools.table_doctor import doctor

    rep = doctor(spark, table)
    assert rep["errors"] == [] and rep["orphans"] == []
