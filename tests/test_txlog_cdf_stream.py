"""Streaming CHANGE-DATA-FEED source (streaming/source.py,
readChangeFeed=true): change ROWS as a stream with version offsets in the
Spark checkpoint — Delta's `readStream.option("readChangeFeed")` twin —
plus the row-keyed mode over row tracking where rewrites cancel
(OPTIMIZE contributes ZERO rows, UPDATE emits exact pre/post pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX
from cdk_datalake_analytics_comercial_spark.streaming.source import (
    stream_txlog_changes,
)


def _drain(spark, tbl, out, chk, row_keyed=False):
    """One availableNow drain of the change feed into a parquet sink;
    returns every change row accumulated so far, sorted."""
    q = (
        stream_txlog_changes(spark, tbl, row_keyed=row_keyed)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    df = spark.read.parquet(out)
    cols = [c for c in df.columns]
    return sorted(tuple(r) for r in df.select(*sorted(cols)).collect())


def _rows(spark, out):
    return spark.read.parquet(out)


def test_cdf_initial_snapshot_then_appends_exactly_once(spark, tmp_path):
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        tbl,
    )
    _drain(spark, tbl, out, chk)
    got = _rows(spark, out)
    assert {tuple(r) for r in got.select("id", "v", "_change_type").collect()} == {
        (1, "a", "insert"),
        (2, "b", "insert"),
    }
    # incremental: a new append arrives once, replays add nothing
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        tbl,
        mode="append",
    )
    _drain(spark, tbl, out, chk)
    _drain(spark, tbl, out, chk)  # no new commits -> no duplicate rows
    got = _rows(spark, out)
    assert got.count() == 3
    v3 = got.filter(F.col("id") == 3).collect()[0]
    assert v3["_change_type"] == "insert"
    assert v3["_commit_version"] == TX.current_version(spark, tbl)


def test_cdf_default_mode_rewrite_streams_net_equivalent_feed(spark, tmp_path):
    """Without row tracking, a rewrite commit streams its touched files
    as delete(pre) + insert(post) rows — Delta's reconstruction for
    commits without materialized change data. Folding the feed
    reproduces the table state."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        tbl,
    )
    _drain(spark, tbl, out, chk)
    TX.tx_delete(spark, tbl, where={"id": (2, 2)})
    _drain(spark, tbl, out, chk)
    feed = _rows(spark, out).collect()
    # fold: apply versions in order; deletes drop keys, inserts add them
    state: dict[int, str] = {}
    for r in sorted(feed, key=lambda r: (r["_commit_version"],
                                         r["_change_type"] != "delete")):
        if r["_change_type"] == "delete":
            state.pop(r["id"], None)
        else:
            state[r["id"]] = r["v"]
    assert state == {1: "a", 3: "c"}
    assert {r["id"] for r in feed if r["_change_type"] == "delete"} >= {2}


@pytest.fixture()
def tracked(spark, tmp_path):
    tbl = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        tbl,
    )
    TX.tx_enable_row_tracking(spark, tbl)
    return tbl


def test_cdf_row_keyed_update_emits_exact_pairs(spark, tracked, tmp_path):
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    _drain(spark, tracked, out, chk, row_keyed=True)
    n0 = _rows(spark, out).count()  # initial snapshot inserts
    TX.tx_update(
        spark, tracked, where={"id": (2, 2)}, assignments={"v": F.lit("B!")}
    )
    _drain(spark, tracked, out, chk, row_keyed=True)
    new = (
        _rows(spark, out)
        .filter(F.col("_change_type") != "insert")
        .select("id", "v", "_change_type")
        .collect()
    )
    assert _rows(spark, out).count() == n0 + 2
    assert {tuple(r) for r in new} == {
        (2, "b", "update_preimage"),
        (2, "B!", "update_postimage"),
    }


def test_cdf_row_keyed_optimize_contributes_zero_rows(spark, tracked, tmp_path):
    """The verdict's gate: an OPTIMIZE (compaction rewrite) between
    micro-batches contributes ZERO change rows in row-keyed mode — same
    ids, same values, everything cancels — while a later real append
    still arrives."""
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    _drain(spark, tracked, out, chk, row_keyed=True)
    n0 = _rows(spark, out).count()
    TX.tx_compact(spark, tracked, n_files=1)
    _drain(spark, tracked, out, chk, row_keyed=True)
    assert _rows(spark, out).count() == n0, "OPTIMIZE leaked change rows"
    TX.tx_write(
        spark,
        spark.createDataFrame([("d",)], "v string"),
        tracked,
        mode="append",
    )
    _drain(spark, tracked, out, chk, row_keyed=True)
    extra = (
        _rows(spark, out)
        .filter(F.col("v") == "d")
        .select("_change_type")
        .collect()
    )
    assert [r["_change_type"] for r in extra] == ["insert"]
    assert _rows(spark, out).count() == n0 + 1


def test_cdf_row_keyed_dv_delete_emits_exact_delete(spark, tracked, tmp_path):
    """A deletion-vector soft delete re-adds the file with a DV sidecar:
    the row-keyed diff of prior entry vs dv'd entry is exactly the
    newly-dead row."""
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    _drain(spark, tracked, out, chk, row_keyed=True)
    n0 = _rows(spark, out).count()
    TX.tx_delete(spark, tracked, where={"id": (3, 3)}, use_dv=True)
    _drain(spark, tracked, out, chk, row_keyed=True)
    new = (
        _rows(spark, out)
        .filter(F.col("_change_type") == "delete")
        .select("id", "v")
        .collect()
    )
    assert _rows(spark, out).count() == n0 + 1
    assert {tuple(r) for r in new} == {(3, "c")}


def test_cdf_row_keyed_requires_row_tracking(spark, tmp_path):
    tbl = str(tmp_path / "plain")
    TX.tx_write(spark, spark.createDataFrame([(1,)], "id long"), tbl)
    q = None
    with pytest.raises(Exception, match="row tracking"):
        q = (
            stream_txlog_changes(spark, tbl, row_keyed=True)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
    if q is not None:
        q.stop()


def test_cdf_restart_after_rewrite_is_exactly_once(spark, tracked, tmp_path):
    """Kill-and-restart around a rewrite commit: the checkpointed version
    offset resumes exactly after the last delivered commit — the update
    pair is delivered once, never replayed."""
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    _drain(spark, tracked, out, chk, row_keyed=True)
    TX.tx_update(
        spark, tracked, where={"id": (1, 1)}, assignments={"v": F.lit("A2")}
    )
    _drain(spark, tracked, out, chk, row_keyed=True)
    first = _rows(spark, out).count()
    _drain(spark, tracked, out, chk, row_keyed=True)  # restart, no new commits
    assert _rows(spark, out).count() == first
    pairs = (
        _rows(spark, out)
        .filter(F.col("_change_type").startswith("update"))
        .count()
    )
    assert pairs == 2


def test_cdf_row_keyed_oversized_group_splits_and_stays_exact(
    spark, tracked, tmp_path
):
    """A diff group over the split threshold parallelizes into row-id
    sub-ranges: with a 1-byte threshold every id diffs in its own split,
    and the feed is UNCHANGED — OPTIMIZE still contributes zero rows, an
    update still exactly its pair (splits never double-emit: each owns a
    half-open id range)."""
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")

    def drain():
        q = (
            stream_txlog_changes(
                spark, tracked, row_keyed=True, diff_split_bytes=1
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out)

    drain()
    n0 = drain().count()
    TX.tx_compact(spark, tracked, n_files=1)
    assert drain().count() == n0, "split OPTIMIZE diff leaked change rows"
    TX.tx_update(
        spark, tracked, where={"id": (2, 2)}, assignments={"v": F.lit("B2")}
    )
    new = drain().filter(F.col("_change_type").startswith("update")).collect()
    assert {(r["id"], r["v"], r["_change_type"]) for r in new} == {
        (2, "b", "update_preimage"),
        (2, "B2", "update_postimage"),
    }


@pytest.mark.slow
def test_cdf_stream_drives_incremental_view_maintenance(spark, tmp_path):
    """The full production chain: a row-keyed CHANGE-FEED STREAM feeds
    incremental aggregate maintenance (operators/incremental.maintain_agg)
    through foreachBatch — the rollup equals a full recompute after
    appends, an UPDATE, and an OPTIMIZE (which contributes zero change
    rows, so the maintainer does no work for it)."""
    from cdk_datalake_analytics_comercial_spark.operators.incremental import (
        maintain_agg,
    )

    src = str(tmp_path / "src")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "us", 10.0), (2, "eu", 20.0), (3, "us", 5.0)],
            "id long, region string, amount double",
        ),
        src,
    )
    TX.tx_enable_row_tracking(spark, src)
    state = {"agg": None}

    def fold(batch, batch_id):
        changes = batch.filter(F.col("_change_type").isNotNull()).drop(
            "_commit_version"
        )
        if changes.isEmpty():
            return
        prior = state["agg"]
        if prior is None:
            prior = (
                changes.filter(F.col("_change_type") == "insert")
                .limit(0)
                .groupBy("region")
                .agg(
                    F.sum("amount").alias("amount"),
                    F.count(F.lit(1)).alias("n_rows"),
                )
            ).localCheckpoint(eager=True)
        new = maintain_agg(prior, changes, ["region"], ["amount"])
        state["agg"] = new.localCheckpoint(eager=True)

    def drain():
        q = (
            stream_txlog_changes(spark, src, row_keyed=True)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def recompute():
        return sorted(
            tuple(r)
            for r in TX.tx_read(spark, src)
            .groupBy("region")
            .agg(
                F.sum("amount").alias("amount"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        )

    def maintained():
        return sorted(
            tuple(r)
            for r in state["agg"].filter(F.col("n_rows") > 0).collect()
        )

    drain()
    assert maintained() == recompute()
    TX.tx_write(
        spark,
        spark.createDataFrame([(4, "eu", 7.5)], "id long, region string, amount double"),
        src,
        mode="append",
    )
    TX.tx_update(
        spark, src, where={"id": (1, 1)}, assignments={"amount": F.lit(11.0)}
    )
    drain()
    assert maintained() == recompute()
    before = maintained()
    TX.tx_compact(spark, src, n_files=1)
    drain()  # zero change rows: the fold sees nothing, state unchanged
    assert maintained() == before == recompute()


def test_cdf_starting_timestamp_and_admission_control(spark, tmp_path):
    """startingTimestamp replays commits stamped at-or-after the
    timestamp (no initial snapshot); maxCommitsPerTrigger bounds how far
    each micro-batch advances (first batch of a run uncapped — same
    checkpoint-safety caveat as the append reader's maxFilesPerTrigger)."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), tbl
    )
    v_cut = TX.current_version(spark, tbl)
    for i, tag in enumerate(["b", "c", "d", "e"]):
        TX.tx_write(
            spark,
            spark.createDataFrame([(2 + i, tag)], "id long, v string"),
            tbl,
            mode="append",
        )
    # timestamp boundary: just after v_cut's commit stamp
    rec = TX.read_commit(spark, tbl, v_cut)
    ts = (rec["ts_ms"] + 1) / 1000.0

    q = (
        stream_txlog_changes(
            spark, tbl, starting_timestamp=ts, max_commits_per_trigger=1
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    # only the four post-cut commits stream (no snapshot, id=1 absent);
    # availableNow planned multiple capped batches until caught up
    assert {r["id"] for r in got.collect()} == {2, 3, 4, 5}
    assert got.count() == 4
    versions = {r["_commit_version"] for r in got.collect()}
    assert len(versions) == 4  # one commit per row, all replayed


def test_stream_starting_version_and_timestamp_are_exclusive(spark, tmp_path):
    import pytest

    tbl = str(tmp_path / "t2")
    TX.tx_write(spark, spark.createDataFrame([(1,)], "id long"), tbl)
    q = None
    with pytest.raises(Exception, match="not both"):
        q = (
            stream_txlog_changes(
                spark, tbl, starting_version=1,
                starting_timestamp="2024-01-01",
            )
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
    if q is not None:
        q.stop()


def test_cdf_vacuumed_gap_fails_loudly_even_for_pure_appends(spark, tmp_path):
    """A checkpointed change-feed restart after tx_vacuum pruned commits
    in its replay range raises 'vacuumed — start a fresh stream' — the
    pure-append case included (rewrite commits already failed via the
    missing v-1 manifest; appends used to slip through silently)."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), tbl
    )
    _drain(spark, tbl, out, chk)  # checkpoint offset = v1
    for i, tag in ((2, "b"), (3, "c")):  # v2, v3: pure appends
        TX.tx_write(
            spark,
            spark.createDataFrame([(i, tag)], "id long, v string"),
            tbl,
            mode="append",
        )
    TX.tx_vacuum(spark, tbl, keep_versions=1, retain_hours=0)  # only v3 kept
    with pytest.raises(Exception, match="vacuumed"):
        _drain(spark, tbl, out, chk)


def test_cdf_row_keyed_nan_rows_do_not_leak_on_optimize(spark, tmp_path):
    """Python's nan != nan would make every NaN-bearing UNCHANGED row look
    updated on each rewrite; the diff is NaN-aware, so OPTIMIZE still
    contributes ZERO change rows — while a REAL update of a NaN row still
    emits its exact pre/post pair."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    nan = float("nan")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, nan), (2, 2.5)], "id long, x double"),
        tbl,
    )
    TX.tx_enable_row_tracking(spark, tbl)
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, nan)], "id long, x double"),
        tbl,
        mode="append",
    )
    _drain(spark, tbl, out, chk, row_keyed=True)
    n0 = _rows(spark, out).count()
    TX.tx_compact(spark, tbl, n_files=1)  # rewrite of every row
    _drain(spark, tbl, out, chk, row_keyed=True)
    assert _rows(spark, out).count() == n0, "NaN rows leaked as updates"
    # a real 2.5 -> NaN update is NOT cancelled by NaN-awareness
    TX.tx_update(
        spark, tbl, where={"id": (2, 2)}, assignments={"x": F.lit(nan)}
    )
    _drain(spark, tbl, out, chk, row_keyed=True)
    new = (
        _rows(spark, out)
        .filter(F.col("_change_type") != "insert")
        .select("id", "_change_type")
        .collect()
    )
    assert {tuple(r) for r in new} == {
        (2, "update_preimage"),
        (2, "update_postimage"),
    }


def test_starting_timestamp_iso_first_epoch_fallback(spark, tmp_path):
    """A compact digit-only date like '99990101' is valid ISO basic format
    and must read as the DATE it looks like, never as epoch seconds
    (which would land in 1973 and replay everything); real epoch-second
    strings still route to epoch; garbage raises naming both forms."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        _initial_offset_from_options,
    )

    tbl = str(tmp_path / "t")
    TX.tx_write(spark, spark.createDataFrame([(1,)], "id long"), tbl)
    cur = TX.current_version(spark, tbl)
    # far-future ISO date: nothing at/after it -> tail-only offset
    got = _initial_offset_from_options(tbl, {"startingtimestamp": "99990101"})
    assert got == {"version": cur}
    # epoch seconds (not valid ISO): near-zero epoch replays everything
    got = _initial_offset_from_options(tbl, {"startingtimestamp": "1.0"})
    assert got == {"version": 0}
    with pytest.raises(ValueError, match="neither ISO-8601.*nor epoch"):
        _initial_offset_from_options(tbl, {"startingtimestamp": "not-a-time"})


# ---------------------------------------------------------------------------
# BATCH change-feed reads (Delta's table_changes twin)


def test_batch_changes_row_keyed_exact_rows(spark, tmp_path):
    """read_txlog_changes(start..end) returns exactly the change rows of
    the version range: appends as inserts, a row-keyed UPDATE as its
    exact pre/post pair, version bounds inclusive of start."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        read_txlog_changes,
    )

    tbl = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        tbl,
    )  # v1
    TX.tx_enable_row_tracking(spark, tbl)  # property + backfill commits
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        tbl,
        mode="append",
    )
    v_append = TX.current_version(spark, tbl)
    TX.tx_update(
        spark, tbl, where={"id": (2, 2)}, assignments={"v": F.lit("B!")}
    )
    v_update = TX.current_version(spark, tbl)

    ch = read_txlog_changes(
        spark, tbl, starting_version=v_append, row_keyed=True
    )
    got = {
        (r.id, r.v, r._change_type, r._commit_version)
        for r in ch.select("id", "v", "_change_type", "_commit_version").collect()
    }
    assert got == {
        (3, "c", "insert", v_append),
        (2, "b", "update_preimage", v_update),
        (2, "B!", "update_postimage", v_update),
    }
    # ending bound excludes the update
    ch3 = read_txlog_changes(
        spark, tbl, starting_version=v_append, ending_version=v_append,
        row_keyed=True,
    )
    assert {r._change_type for r in ch3.collect()} == {"insert"}


def test_batch_changes_default_mode_is_net_equivalent(spark, tmp_path):
    """Default (file-action) mode: applying the change rows of (v_s, v_e]
    to the v_s snapshot reproduces the v_e snapshot — whole-file churn is
    allowed, net effect must be exact."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        read_txlog_changes,
    )

    tbl = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        tbl,
    )  # v1
    TX.tx_delete(spark, tbl, where={"id": (2, 2)})  # v2: rewrite
    TX.tx_write(
        spark,
        spark.createDataFrame([(4, "d")], "id long, v string"),
        tbl,
        mode="append",
    )  # v3

    base = {(r.id, r.v) for r in TX.tx_read(spark, tbl, version=1).collect()}
    ch = read_txlog_changes(spark, tbl, starting_version=2).collect()
    for r in ch:
        if r._change_type == "delete":
            base.discard((r.id, r.v))
    for r in ch:
        if r._change_type in ("insert", "update_postimage"):
            base.add((r.id, r.v))
    assert base == {(r.id, r.v) for r in TX.tx_read(spark, tbl).collect()}


def test_batch_changes_guardrails(spark, tmp_path):
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        read_txlog_changes,
    )

    tbl = str(tmp_path / "t")
    TX.tx_write(spark, spark.createDataFrame([(1,)], "id long"), tbl)  # v1
    TX.tx_write(
        spark, spark.createDataFrame([(2,)], "id long"), tbl, mode="append"
    )  # v2
    # no start: ambiguous, refused (Delta raises the same way)
    with pytest.raises(Exception, match="startingVersion or"):
        read_txlog_changes(spark, tbl).collect()
    # ending beyond current / before start
    with pytest.raises(Exception, match="beyond the current"):
        read_txlog_changes(
            spark, tbl, starting_version=1, ending_version=9
        ).collect()
    with pytest.raises(Exception, match="precedes startingVersion"):
        read_txlog_changes(
            spark, tbl, starting_version=2, ending_version=1
        ).collect()
    # vacuumed range raises, same contract as the stream
    TX.tx_write(
        spark, spark.createDataFrame([(3,)], "id long"), tbl, mode="append"
    )  # v3
    TX.tx_vacuum(spark, tbl, keep_versions=1, retain_hours=0)
    with pytest.raises(Exception, match="vacuumed"):
        read_txlog_changes(spark, tbl, starting_version=2).collect()


def test_batch_changes_by_timestamp_bounds(spark, tmp_path):
    """Batch change feed with TIMESTAMP bounds: startingTimestamp is
    at-or-after (Delta), endingTimestamp resolves to the newest commit
    at-or-before — the window between two wall-clock points."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        read_txlog_changes,
    )

    tbl = str(tmp_path / "t")
    for i, tag in enumerate(["a", "b", "c"]):
        TX.tx_write(
            spark,
            spark.createDataFrame([(i, tag)], "id long, v string"),
            tbl,
            mode="append" if i else "overwrite",
        )
    ts2 = TX.read_commit(spark, tbl, 2)["ts_ms"]
    ch = read_txlog_changes(
        spark,
        tbl,
        starting_timestamp=ts2 / 1000.0,
        ending_timestamp=ts2 / 1000.0,
    )
    assert {(r.id, r._commit_version) for r in ch.collect()} == {(1, 2)}


def test_rows_equal_nan_awareness_unit():
    """The row-keyed diff's equality kernel: NaN equals NaN (top-level
    and nested in arrays/maps), but NaN never equals a number or None,
    and element order still matters."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        _rows_equal,
    )

    nan = float("nan")
    assert _rows_equal((1, nan), (1, nan))
    assert not _rows_equal((1, nan), (1, 2.0))
    assert _rows_equal(([nan, 1.0], {"k": nan}), ([nan, 1.0], {"k": nan}))
    assert not _rows_equal(([nan, 1.0],), ([1.0, nan],))
    assert _rows_equal((None,), (None,))
    assert not _rows_equal((nan,), (None,))
    assert _rows_equal((0.0,), (0.0,)) and not _rows_equal((0.0,), (1.0,))
    # map<k, double> cells arrive from pyarrow.to_pylist as lists of
    # (key, value) TUPLES — NaN inside a tuple must still self-compare,
    # or unchanged NaN-map rows emit spurious updates on every OPTIMIZE.
    assert _rows_equal(([("a", nan)],), ([("a", nan)],))
    assert not _rows_equal(([("a", nan)],), ([("a", 1.0)],))
    assert not _rows_equal(([("a", nan)],), ([("b", nan)],))


def test_starting_timestamp_garbage_inputs_unit(spark, tmp_path):
    """'inf' passes float() but overflows int(); it must surface the
    same descriptive 'neither ISO-8601 nor epoch seconds' error as any
    other unparsable string, not a bare OverflowError."""
    tbl = str(tmp_path / "t")
    TX.tx_write(
        spark, spark.createDataFrame([(1,)], "id long"), tbl, mode="overwrite"
    )
    for i, bad in enumerate(("inf", "Infinity", "-inf", "nan-ish", "")):
        with pytest.raises(Exception, match="neither ISO-8601"):
            (
                stream_txlog_changes(spark, tbl, starting_timestamp=bad)
                .writeStream.format("parquet")
                .option("path", str(tmp_path / f"out_{i}"))
                .option("checkpointLocation", str(tmp_path / f"cp_{i}"))
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )


def test_cdf_stream_ending_version_bounded_audit(spark, tmp_path):
    """Batch-reader parity (r10 verdict #7): a stream with BOTH edges
    pinned drains exactly the audit window (s, e] once — commits beyond
    endingVersion never emit, replays add nothing, and a commit landing
    AFTER the drain stays invisible to the capped checkpoint."""
    tbl, out, chk = (str(tmp_path / d) for d in ("t", "out", "chk"))
    for i in range(5):  # v1..v5
        TX.tx_write(
            spark,
            spark.createDataFrame([(i,)], "id long"),
            tbl,
            mode="append" if i else "overwrite",
        )

    def drain():
        q = (
            stream_txlog_changes(
                spark, tbl, starting_version=2, ending_version=4
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.id, r._commit_version)
            for r in spark.read.parquet(out).collect()
        )

    window = [(1, 2), (2, 3), (3, 4)]  # v2..v4 inclusive, never v1/v5
    assert drain() == window
    assert drain() == window  # replay adds nothing (exactly-once)
    TX.tx_write(
        spark, spark.createDataFrame([(99,)], "id long"), tbl, mode="append"
    )
    assert drain() == window  # post-cap commit stays invisible


def test_cdf_stream_ending_version_validation(spark, tmp_path):
    tbl = str(tmp_path / "t")
    for i in range(3):
        TX.tx_write(
            spark,
            spark.createDataFrame([(i,)], "id long"),
            tbl,
            mode="append" if i else "overwrite",
        )

    def start(**kw):
        return (
            stream_txlog_changes(spark, tbl, **kw)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "o"))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    with pytest.raises(Exception, match="explicit.*starting"):
        start(ending_version=2)  # snapshot-first default has no start edge
    with pytest.raises(Exception, match="precedes"):
        start(starting_version=3, ending_version=1)


def test_retained_span_unit(spark, tmp_path):
    """_retained_span: gapless ranges pass through; a vacuumed hole in
    the middle raises naming the missing versions; empty ranges are
    fine."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        _retained_span,
    )

    tbl = str(tmp_path / "t")
    for i in range(4):  # v1..v4
        TX.tx_write(
            spark,
            spark.createDataFrame([(i,)], "id long"),
            tbl,
            mode="append" if i else "overwrite",
        )
    assert _retained_span(tbl, 1, 4) == [2, 3, 4]
    assert _retained_span(tbl, 4, 4) == []  # caught up
    TX.tx_vacuum(spark, tbl, keep_versions=2, retain_hours=0)  # keeps v3,v4
    assert _retained_span(tbl, 2, 4) == [3, 4]  # fully retained suffix
    with pytest.raises(RuntimeError, match=r"\[2\].*vacuumed"):
        _retained_span(tbl, 1, 4)
