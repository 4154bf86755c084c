"""txlog streaming SOURCE (streaming/source.py): a txlog table tailed as a
Structured Streaming input — Delta's `readStream.format("delta")` parity
(initial snapshot → commit tail, version offsets in the checkpoint,
append-only contract with skipChangeCommits, admission control)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX
from cdk_datalake_analytics_comercial_spark.streaming.source import (
    TxChangeCommitError,
    TxLogStreamReader,
    stream_txlog,
)


def _mk(spark, i, region="us"):
    return spark.createDataFrame(
        [(i, f"v{i}", region)], "id long, s string, region string"
    ).repartition(1)


def _drain(spark, tbl, out, chk, **opts):
    """One availableNow drain of the stream into a parquet sink; returns
    the sink's full contents as a sorted list of (id, s, region)."""
    q = (
        stream_txlog(spark, tbl, **opts)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        (r.id, r.s, r.region) for r in spark.read.parquet(out).collect()
    )


def test_initial_snapshot_matches_tx_read(spark, tmp_path):
    """The first micro-batch is the RESOLVED snapshot (removes applied),
    with hive partition columns reconstructed — row-identical to tx_read."""
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "us"), (2, "b", "eu"), (3, "c", "us")],
        "id long, s string, region string",
    )
    TX.tx_write(spark, df, tbl, partition_by=["region"])
    TX.tx_write(spark, _mk(spark, 4, "ap"), tbl, mode="append")
    TX.tx_delete(spark, tbl, where={"id": (2, 2)})  # pre-stream remove

    got = _drain(spark, tbl, str(tmp_path / "out"), str(tmp_path / "chk"))
    exp = sorted(
        (r.id, r.s, r.region) for r in TX.tx_read(spark, tbl).collect()
    )
    assert got == exp and (2, "b", "eu") not in got
    # dtypes survive the arrow path
    assert dict(spark.read.parquet(str(tmp_path / "out")).dtypes) == {
        "id": "bigint",
        "s": "string",
        "region": "string",
    }


def test_incremental_tail_exactly_once(spark, tmp_path):
    """Re-running from the same checkpoint delivers each commit exactly
    once: appends arrive incrementally, an unchanged log adds nothing."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    TX.tx_write(spark, _mk(spark, 1), tbl)
    assert _drain(spark, tbl, out, chk) == [(1, "v1", "us")]

    TX.tx_write(spark, _mk(spark, 2), tbl, mode="append")
    TX.tx_write(spark, _mk(spark, 3, "eu"), tbl, mode="append")
    got = _drain(spark, tbl, out, chk)
    assert got == [(1, "v1", "us"), (2, "v2", "us"), (3, "v3", "eu")]
    # idempotent: no new commits -> no new rows (no duplicate replay)
    assert _drain(spark, tbl, out, chk) == got


def test_starting_version_and_latest(spark, tmp_path):
    """startingVersion=N skips the snapshot and replays commit adds from
    version N (the v1 creation commit truncates an EMPTY table — pure
    append, replayable); 'latest' sees only post-start commits."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)  # v1
    TX.tx_write(spark, _mk(spark, 2), tbl, mode="append")  # v2
    TX.tx_write(spark, _mk(spark, 3), tbl, mode="append")  # v3

    assert _drain(
        spark, tbl, str(tmp_path / "o1"), str(tmp_path / "c1"),
        starting_version=1,
    ) == [(1, "v1", "us"), (2, "v2", "us"), (3, "v3", "us")]
    assert _drain(
        spark, tbl, str(tmp_path / "o2"), str(tmp_path / "c2"),
        starting_version=3,
    ) == [(3, "v3", "us")]

    # 'latest': drain now is empty; only commits made after stream setup
    got = _drain(
        spark, tbl, str(tmp_path / "o3"), str(tmp_path / "c3"),
        starting_version="latest",
    )
    assert got == []
    TX.tx_write(spark, _mk(spark, 4), tbl, mode="append")
    got = _drain(
        spark, tbl, str(tmp_path / "o3"), str(tmp_path / "c3"),
        starting_version="latest",
    )
    assert got == [(4, "v4", "us")]


def test_change_commit_fails_unless_skipped(spark, tmp_path):
    """A tailed DELETE/overwrite commit fails the stream (append-only
    contract, Delta's error); skipChangeCommits=true skips the commit
    entirely and the stream continues past it."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    TX.tx_write(spark, _mk(spark, 2), tbl, mode="append")
    TX.tx_delete(spark, tbl, where={"id": (2, 2)})  # v3: change commit
    TX.tx_write(spark, _mk(spark, 3), tbl, mode="append")  # v4

    with pytest.raises(Exception, match="append-only|skipChangeCommits"):
        _drain(
            spark, tbl, str(tmp_path / "o1"), str(tmp_path / "c1"),
            starting_version=1,
        )
    # skipping: replayed adds include the later-deleted row (the delete is
    # simply not represented), plus commits after the change commit
    got = _drain(
        spark, tbl, str(tmp_path / "o2"), str(tmp_path / "c2"),
        starting_version=1, skip_change_commits=True,
    )
    assert got == [(1, "v1", "us"), (2, "v2", "us"), (3, "v3", "us")]


def test_partition_values_roundtrip(spark, tmp_path):
    """Typed + hive-escaped + null partition values reconstruct exactly
    (int partition cast back from the path, %XX unescaped, NULL from
    __HIVE_DEFAULT_PARTITION__)."""
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, "a:b"), (2, 20, None), (3, 10, "plain")],
        "id long, bucket int, tag string",
    )
    TX.tx_write(spark, df, tbl, partition_by=["bucket", "tag"])
    q = (
        stream_txlog(spark, tbl)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert dict(out.dtypes)["bucket"] == "int"
    assert sorted((r.id, r.bucket, r.tag) for r in out.collect()) == [
        (1, 10, "a:b"),
        (2, 20, None),
        (3, 10, "plain"),
    ]


def test_schema_evolution_null_pads_old_files(spark, tmp_path):
    """After the table schema gains a column, snapshot reads null-pad the
    pre-evolution files (same contract as tx_read's unionByName)."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, spark.createDataFrame([(1, "a")], "id long, s string"), tbl)
    TX.tx_write(
        spark,
        spark.createDataFrame([(2, "b", 9.5)], "id long, s string, score double"),
        tbl,
        mode="append",
        schema_evolution=True,
    )
    q = (
        stream_txlog(spark, tbl)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.id, r.s, r.score)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [(1, "a", None), (2, "b", 9.5)]


def test_admission_control_caps_steady_state(spark, tmp_path):
    """maxFilesPerTrigger, at the reader level with the observed fresh-query
    call order (latestOffset BEFORE initialOffset): the first planned batch
    is uncapped (unknown base — capping could regress past a restart's
    checkpoint), every later batch admits <= cap files on commit
    boundaries, and offsets never move backward."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    reader = TxLogStreamReader(
        TX.read_manifest(spark, tbl, 1)["schema"],
        {"path": tbl, "maxfilespertrigger": "2"},
    )
    # fresh-query sequence
    first = reader.latestOffset()
    start = reader.initialOffset()
    assert (start["version"], first["version"]) == (-1, 1)
    parts = reader.partitions(start, first)
    assert sum(len(p.rel_paths) for p in parts) == 1

    # 5 single-file commits accumulate; steady state caps at 2 per batch
    for i in range(2, 7):
        TX.tx_write(spark, _mk(spark, i), tbl, mode="append")
    sizes, last = [], first
    for _ in range(5):
        nxt = reader.latestOffset()
        assert nxt["version"] >= last["version"]  # monotonic
        if nxt["version"] == last["version"]:
            break
        parts = reader.partitions(last, nxt)
        sizes.append(sum(len(p.rel_paths) for p in parts))
        last = nxt
    assert sizes == [2, 2, 1]  # 5 pending files -> 2+2+1, never splitting a commit


def test_integration_steady_state_capped(spark, tmp_path):
    """End-to-end continuous trigger: after the initial snapshot batch,
    appended commits arrive in order with every steady-state batch within
    the cap."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    batches: list[list[int]] = []

    def sink(bdf, _bid):
        rows = sorted(r.id for r in bdf.collect())
        if rows:
            batches.append(rows)

    q = (
        stream_txlog(spark, tbl, max_files_per_trigger=2)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not batches:
            time.sleep(0.5)
        for i in range(2, 7):
            TX.tx_write(spark, _mk(spark, i), tbl, mode="append")
        deadline = time.time() + 120
        while time.time() < deadline and sum(map(len, batches)) < 6:
            time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(x for b in batches for x in b) == list(range(1, 7))
    assert all(len(b) <= 2 for b in batches[1:])  # steady state capped


def test_guardrails(spark, tmp_path):
    """Batch reads serve the snapshot (SQL-serving path — since round 9;
    tx_read remains the fast programmatic path); non-local paths are
    refused with the fsspec-shim pointer; empty tables have no schema."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        register_txlog_source,
    )

    register_txlog_source(spark)
    assert spark.read.format("txlog").load(tbl).count() == 1
    # surfaces wrapped as AnalysisException (raised during schema resolution
    # inside the data source runner), message preserved
    with pytest.raises(Exception, match="local paths"):
        stream_txlog(spark, "s3://bucket/table")
    with pytest.raises(Exception, match="no committed txlog version"):
        stream_txlog(spark, str(tmp_path / "nope")).schema


def test_cdc_fanout_rollup(spark, tmp_path):
    """The fanout pattern the source exists for: an upstream job appends to
    table A; a downstream stream tails A and maintains a per-region rollup
    table B (foreachBatch: aggregate the batch delta, fold into B). Across
    multiple drains from one checkpoint — i.e. restarts — B equals a full
    recompute of A: exactly-once delivery means no contribution is ever
    double-counted."""
    from pyspark.sql import functions as F

    a, b, chk = (str(tmp_path / d) for d in ("a", "b", "chk"))
    TX.tx_write(spark, _mk(spark, 1, "us"), a)
    TX.tx_write(spark, _mk(spark, 2, "eu"), a, mode="append")

    def fold(bdf, _bid):
        delta = bdf.groupBy("region").agg(F.count(F.lit(1)).alias("n"))
        if TX.is_txlog_table(spark, b):
            delta = (
                TX.tx_read(spark, b)
                .unionByName(delta)
                .groupBy("region")
                .agg(F.sum("n").alias("n"))
            )
        TX.tx_write(spark, delta, b)  # one atomic rollup version per batch

    def drain_into_b():
        q = (
            stream_txlog(spark, a)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def recompute():
        return sorted(
            (r.region, r.n)
            for r in TX.tx_read(spark, a)
            .groupBy("region")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    drain_into_b()
    assert sorted((r.region, r.n) for r in TX.tx_read(spark, b).collect()) == recompute()

    for i in range(3, 6):
        TX.tx_write(spark, _mk(spark, i, "us" if i % 2 else "ap"), a, mode="append")
    drain_into_b()
    drain_into_b()  # restart with nothing new: must not double-count
    assert sorted((r.region, r.n) for r in TX.tx_read(spark, b).collect()) == recompute()


def test_dv_delete_is_a_change_commit(spark, tmp_path):
    """A deletion-vector commit re-adds existing entries with a dv ref —
    streaming its adds would replay whole files, so the source treats it
    exactly like a rewrite delete: fail, or skip under skipChangeCommits."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    TX.tx_write(spark, _mk(spark, 2), tbl, mode="append")
    TX.tx_delete(spark, tbl, where={"id": (2, 2)}, use_dv=True)  # v3
    TX.tx_write(spark, _mk(spark, 3), tbl, mode="append")  # v4

    with pytest.raises(Exception, match="append-only|skipChangeCommits"):
        _drain(
            spark, tbl, str(tmp_path / "o1"), str(tmp_path / "c1"),
            starting_version=1,
        )
    got = _drain(
        spark, tbl, str(tmp_path / "o2"), str(tmp_path / "c2"),
        starting_version=1, skip_change_commits=True,
    )
    assert got == [(1, "v1", "us"), (2, "v2", "us"), (3, "v3", "us")]
    # snapshot-first stream resolves the DV (id=2 gone)
    got = _drain(spark, tbl, str(tmp_path / "o3"), str(tmp_path / "c3"))
    assert got == [(1, "v1", "us"), (3, "v3", "us")]


@pytest.mark.slow
def test_lost_checkpoint_plain_append_sink_exactly_once_with_txn(
    spark, tmp_path
):
    """THE idempotent-commit contract (Delta foreachBatch + txnAppId):
    a foreachBatch sink that PLAIN-APPENDS each micro-batch tagged
    ``txn=(app, batch_id)`` survives a LOST SINK CHECKPOINT — the full
    replay re-offers every batch, and every one commits as a no-op. Zero
    duplicates, no keyed merge."""
    src, snk = str(tmp_path / "src"), str(tmp_path / "snk")
    TX.tx_write(spark, _mk(spark, 1), src)
    for i in range(2, 6):
        TX.tx_write(spark, _mk(spark, i), src, mode="append")

    def append_batch(bdf, bid):
        TX.tx_write(
            bdf.sparkSession, bdf, snk, mode="append", txn=("sink-app", bid)
        )

    def drain(chk):
        q = (
            stream_txlog(spark, src)
            .writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain(str(tmp_path / "chk1"))
    want = sorted((r.id, r.s) for r in TX.tx_read(spark, src).select("id", "s").collect())
    got = lambda: sorted(  # noqa: E731
        (r.id, r.s) for r in TX.tx_read(spark, snk).select("id", "s").collect()
    )
    assert got() == want
    v_after_first = TX.current_version(spark, snk)
    # the replay-safety contract below assumes batch ids line up across
    # checkpoint generations, which holds because the source is
    # snapshot-first (the whole backlog is ONE batch 0). If batching ever
    # changes, fail HERE, not silently below (Delta documents the same
    # caveat: txn versions must be deterministic per batch content).
    assert TX.tx_txn_version(spark, snk, "sink-app") == 0

    # catastrophic restart: the sink checkpoint is GONE — a fresh drain
    # replays the whole source from scratch into the same sink table
    drain(str(tmp_path / "chk2"))
    assert got() == want  # zero duplicates
    assert TX.current_version(spark, snk) == v_after_first  # all no-ops

    # new upstream data after the restart still flows through
    TX.tx_write(spark, _mk(spark, 6), src, mode="append")
    drain(str(tmp_path / "chk2"))
    want = sorted((r.id, r.s) for r in TX.tx_read(spark, src).select("id", "s").collect())
    assert got() == want


@pytest.mark.slow
def test_vacuumed_gap_between_offset_and_horizon_fails_loudly(spark, tmp_path):
    """Commit versions vacuumed BETWEEN a stream's checkpointed offset and
    the retained horizon must fail the restart, never be silently skipped
    (Delta's contract). Pure appends are the dangerous shape: their data
    files survive the vacuum (still referenced by the kept manifests), so
    nothing else would error — the stream would just drop those rows."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    TX.tx_write(spark, _mk(spark, 1), tbl)  # v1
    _drain(spark, tbl, out, chk)  # checkpoint offset = v1
    for i in (2, 3, 4):
        TX.tx_write(spark, _mk(spark, i), tbl, mode="append")  # v2..v4
    TX.tx_vacuum(spark, tbl, keep_versions=2, retain_hours=0)  # drops v1,v2
    with pytest.raises(Exception, match="vacuumed"):
        _drain(spark, tbl, out, chk)
    # a fresh stream (new checkpoint) recovers via the initial snapshot
    got = _drain(spark, tbl, str(tmp_path / "out2"), str(tmp_path / "chk2"))
    assert [g[0] for g in got] == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# Native STREAMING SINK (writeStream.format("txlog"))


def _sink_drain(spark, src, dst, chk, outputMode="append", query=None,
                app=None):
    """availableNow drain of a txlog-source stream into the txlog SINK."""
    df = stream_txlog(spark, src)
    if query is not None:
        df = query(df)
    w = (
        df.writeStream.format("txlog")
        .outputMode(outputMode)
        .option("checkpointLocation", chk)
    )
    if app is not None:
        w = w.option("txnAppId", app)
    q = w.trigger(availableNow=True).start(dst)
    q.awaitTermination(180)


@pytest.mark.slow
def test_stream_sink_append_exactly_once(spark, tmp_path):
    """writeStream.format('txlog') creates the sink table on the first
    batch and appends exactly once: each micro-batch is ONE atomic commit
    carrying txn=(app, batchId), so a checkpoint-loss replay of identical
    batch content is a no-op, never a duplicate (Delta-sink contract)."""
    src, dst, chk = (str(tmp_path / d) for d in ("src", "dst", "chk"))
    TX.tx_write(spark, _mk(spark, 1), src)
    _sink_drain(spark, src, dst, chk, app="sink-test")
    want = sorted(
        (r.id, r.s) for r in TX.tx_read(spark, src).select("id", "s").collect()
    )
    got = lambda: sorted(  # noqa: E731
        (r.id, r.s) for r in TX.tx_read(spark, dst).select("id", "s").collect()
    )
    assert got() == want
    # the txn mark landed with batch 0
    assert TX.read_manifest(
        spark, dst, TX.current_version(spark, dst)
    )["txns"]
    # new upstream data flows once; a re-drain adds nothing
    TX.tx_write(spark, _mk(spark, 2), src, mode="append")
    _sink_drain(spark, src, dst, chk, app="sink-test")
    _sink_drain(spark, src, dst, chk, app="sink-test")
    want = sorted(
        (r.id, r.s) for r in TX.tx_read(spark, src).select("id", "s").collect()
    )
    assert got() == want
    v_stable = TX.current_version(spark, dst)
    # catastrophic checkpoint loss: with an EXPLICIT stable txnAppId a
    # fresh checkpoint replays the whole source as batch 0 again —
    # identical content, same txn id -> no-op (requires the source
    # unchanged since the loss, same caveat as the foreachBatch txn
    # test; the default checkpoint-derived app id protects only
    # same-checkpoint replays, exactly like Delta's sink)
    _sink_drain(spark, src, dst, str(tmp_path / "chk2"), app="sink-test")
    assert got() == want  # zero duplicates
    assert TX.current_version(spark, dst) == v_stable


def test_stream_sink_complete_mode_truncate_replaces(spark, tmp_path):
    """outputMode('complete') truncate-replaces the sink per batch: a
    streaming aggregate maintains a one-row summary table."""
    from pyspark.sql import functions as F

    src, dst, chk = (str(tmp_path / d) for d in ("src", "dst", "chk"))
    TX.tx_write(spark, _mk(spark, 1), src)
    TX.tx_write(spark, _mk(spark, 2), src, mode="append")
    agg = lambda df: df.groupBy().agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.max("id").alias("max_id")
    )
    _sink_drain(spark, src, dst, chk, outputMode="complete", query=agg)
    assert [(r.n, r.max_id) for r in TX.tx_read(spark, dst).collect()] == [
        (2, 2)
    ]
    TX.tx_write(spark, _mk(spark, 7), src, mode="append")
    _sink_drain(spark, src, dst, chk, outputMode="complete", query=agg)
    assert [(r.n, r.max_id) for r in TX.tx_read(spark, dst).collect()] == [
        (3, 7)
    ]


def test_stream_sink_refuses_unenforceable_tables(spark, tmp_path):
    """The sink shares the batch writer's honesty gates: identity columns
    (et al.) refuse at plan time, naming the streaming sink."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    TX.tx_write(spark, _mk(spark, 1), src)
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a", "us")], "id long, s string, region string"), dst
    )
    TX.tx_add_identity(spark, dst, "id")
    with pytest.raises(Exception, match="streaming sink cannot enforce"):
        _sink_drain(spark, src, dst, str(tmp_path / "chk"))


def test_admission_control_max_bytes_per_trigger(spark, tmp_path):
    """maxBytesPerTrigger (Delta's byte-based admission twin): steady-state
    batches end at the first commit that reaches the byte budget —
    commit-boundary-respecting, offsets monotonic. A tiny budget still
    admits at least one commit per batch (progress is guaranteed)."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    reader = TxLogStreamReader(
        TX.read_manifest(spark, tbl, 1)["schema"],
        {"path": tbl, "maxbytespertrigger": "1"},  # < any file: 1 commit/batch
    )
    first = reader.latestOffset()
    start = reader.initialOffset()
    parts = reader.partitions(start, first)  # initial snapshot uncapped
    assert sum(len(p.rel_paths) for p in parts) == 1

    for i in range(2, 5):
        TX.tx_write(spark, _mk(spark, i), tbl, mode="append")
    sizes, last = [], first
    for _ in range(5):
        nxt = reader.latestOffset()
        assert nxt["version"] >= last["version"]
        if nxt["version"] == last["version"]:
            break
        sizes.append(
            sum(len(p.rel_paths) for p in reader.partitions(last, nxt))
        )
        last = nxt
    assert sizes == [1, 1, 1]  # 3 pending commits, byte budget -> one each


def test_stream_sink_races_tx_write_gapless(spark, tmp_path):
    """The streaming sink's per-batch commit runs in the Python Data
    Source worker process; racing a driver-side tx_write append goes
    through the same optimistic CAS — both land, versions stay gapless,
    no rows lost."""
    import threading

    src, dst, chk = (str(tmp_path / d) for d in ("src", "dst", "chk"))
    TX.tx_write(spark, _mk(spark, 1), src)
    TX.tx_write(spark, _mk(spark, 0), dst)  # sink table pre-exists
    errs = []

    def py_writer():
        try:
            for i in range(3):
                TX.tx_write(
                    spark, _mk(spark, 100 + i), dst, mode="append"
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = threading.Thread(target=py_writer)
    th.start()
    _sink_drain(spark, src, dst, chk, app="race-sink")
    th.join(120)
    assert not errs
    ids = sorted(r.id for r in TX.tx_read(spark, dst).select("id").collect())
    assert ids == [0, 1, 100, 101, 102]  # all writers' rows landed
    vers = TX.list_versions(spark, dst)
    assert vers == list(range(1, len(vers) + 1))  # gapless


def test_stream_sink_refuses_schema_widening(spark, tmp_path):
    """The sink validates schema at the commit boundary with tx_write's
    rule: a stream whose rows carry a column the sink table lacks fails
    LOUDLY (no silent widening, no partial commit) — evolve the table
    first (tx_add_column), then the same stream flows."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a", "us")], "id long, s string, region string"
        ),
        src,
    )
    TX.tx_write(spark, spark.createDataFrame([(0,)], "id long"), dst)
    v0 = TX.current_version(spark, dst)
    with pytest.raises(Exception, match="new column|schema"):
        _sink_drain(spark, src, dst, str(tmp_path / "chk1"), app="wide")
    assert TX.current_version(spark, dst) == v0  # nothing landed
    TX.tx_add_column(spark, dst, "s", "string")
    TX.tx_add_column(spark, dst, "region", "string")
    _sink_drain(spark, src, dst, str(tmp_path / "chk2"), app="wide")
    got = {(r.id, r.s, r.region) for r in TX.tx_read(spark, dst).collect()}
    assert got == {(0, None, None), (1, "a", "us")}


def test_stream_converted_table_snapshot_and_tail(spark, tmp_path):
    """A CONVERTed table (tx_convert: entries reference pre-existing
    files at the table root, hive k=v dirs, no data/<batch> prefix)
    streams exactly like a native one: initial snapshot = tx_read, then
    appended commits tail in."""
    src = str(tmp_path / "convstream")
    spark.createDataFrame(
        [(i, f"v{i}", "us" if i % 2 else "eu") for i in range(6)],
        "id long, s string, region string",
    ).write.partitionBy("region").parquet(src)
    TX.tx_convert(
        spark, src, partition_by=["region"],
        partition_types={"region": "string"},
    )
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    got = _drain(spark, src, out, chk)
    assert got == sorted(
        (r.id, r.s, r.region) for r in TX.tx_read(spark, src).collect()
    )
    # tail: a post-conversion append lands in the next drain
    TX.tx_write(spark, _mk(spark, 100), src, mode="append")
    got = _drain(spark, src, out, chk)
    assert (100, "v100", "us") in got and len(got) == 7
