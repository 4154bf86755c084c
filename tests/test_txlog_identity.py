"""Identity columns and column DEFAULTs on the txlog twin (Delta's
identityColumns / allowColumnDefaults writer features): monotone
allocation with the high-water mark in the manifest, concurrency-proof
via batch rewrite on watermark conflict, defaults applied when a write
omits the column."""

import json
import threading

import pytest

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _ids(spark, p):
    return sorted(r["id"] for r in TX.tx_read(spark, p).select("id").collect())


def test_identity_allocates_on_omitted_column(spark, tmp_path):
    p = str(tmp_path / "id1")
    TX.tx_write(
        spark,
        spark.createDataFrame([(10, "a"), (20, "b")], "id long, v string"),
        p,
    )
    TX.tx_add_identity(spark, p, "id", start=1, step=1)
    # mark initialized past existing data (max=20): next alloc is 21..
    TX.tx_write(
        spark,
        spark.createDataFrame([("c",), ("d",), ("e",)], "v string"),
        p,
        mode="append",
    )
    assert _ids(spark, p) == [10, 20, 21, 22, 23]
    # ids pair with the right rows (dense, in order per batch)
    got = {
        r["v"]: r["id"] for r in TX.tx_read(spark, p).collect() if r["id"] > 20
    }
    assert set(got) == {"c", "d", "e"} and len(set(got.values())) == 3


def test_identity_start_step_and_negative_step(spark, tmp_path):
    p = str(tmp_path / "id2")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id", start=100, step=10)
    TX.tx_write(
        spark, spark.createDataFrame([("a",), ("b",)], "v string"), p, mode="append"
    )
    assert _ids(spark, p) == [100, 110]

    n = str(tmp_path / "idneg")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), n)
    TX.tx_add_identity(spark, n, "id", start=-1, step=-1)
    TX.tx_write(
        spark, spark.createDataFrame([("a",), ("b",)], "v string"), n, mode="append"
    )
    assert _ids(spark, n) == [-2, -1]


def test_identity_explicit_values_advance_the_mark(spark, tmp_path):
    p = str(tmp_path / "id3")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(
        spark,
        spark.createDataFrame([(500, "x")], "id long, v string"),
        p,
        mode="append",
    )
    TX.tx_write(
        spark, spark.createDataFrame([("y",)], "v string"), p, mode="append"
    )
    assert _ids(spark, p) == [500, 501]  # allocation resumed past 500


@pytest.mark.slow
def test_identity_survives_overwrite_checkpoint_vacuum(spark, tmp_path):
    p = str(tmp_path / "id4")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(spark, spark.createDataFrame([("a",)], "v string"), p, mode="append")
    assert _ids(spark, p) == [1]
    # full overwrite truncates the data, NOT the allocation history
    TX.tx_write(spark, spark.createDataFrame([("b",)], "v string"), p)
    assert _ids(spark, p) == [2]
    # roll past a checkpoint boundary, then vacuum the log prefix
    for i in range(TX._CHECKPOINT_EVERY + 1):
        TX.tx_write(
            spark, spark.createDataFrame([(f"r{i}",)], "v string"), p, mode="append"
        )
    TX.tx_vacuum(spark, p, keep_versions=2, retain_hours=0)
    TX.tx_write(spark, spark.createDataFrame([("z",)], "v string"), p, mode="append")
    ids = _ids(spark, p)
    assert len(ids) == len(set(ids)), "duplicate ids after checkpoint+vacuum"
    assert max(ids) == 2 + TX._CHECKPOINT_EVERY + 2


def test_identity_follows_clone(spark, tmp_path):
    src = str(tmp_path / "id5src")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), src)
    TX.tx_add_identity(spark, src, "id")
    TX.tx_write(
        spark, spark.createDataFrame([("a",), ("b",)], "v string"), src, mode="append"
    )
    dst = str(tmp_path / "id5dst")
    TX.tx_clone(spark, src, dst)
    TX.tx_write(spark, spark.createDataFrame([("c",)], "v string"), dst, mode="append")
    assert _ids(spark, dst) == [1, 2, 3]  # continued, no reuse of 1/2


@pytest.mark.slow
def test_identity_concurrent_writers_never_collide(spark, tmp_path):
    """The CAS race: concurrent appends that all allocate must end with
    all-unique dense ids — a loser whose watermark moved rewrites its
    batch (_IdentityMoved) instead of committing overlapping ids."""
    p = str(tmp_path / "id6")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    errs = []

    def writer(tag):
        try:
            for i in range(3):
                TX.tx_write(
                    spark,
                    spark.createDataFrame(
                        [(f"{tag}{i}a",), (f"{tag}{i}b",)], "v string"
                    ),
                    p,
                    mode="append",
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in "wxyz"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    ids = _ids(spark, p)
    assert len(ids) == 4 * 3 * 2
    assert len(set(ids)) == len(ids), "duplicate identity values"
    assert ids == list(range(1, 25)), "allocation left holes"


def test_identity_declaration_validates(spark, tmp_path):
    import pytest

    p = str(tmp_path / "id7")
    TX.tx_write(
        spark, spark.createDataFrame([(1.0, "a")], "x double, v string"), p
    )
    with pytest.raises(ValueError, match="long/integer"):
        TX.tx_add_identity(spark, p, "x")
    with pytest.raises(ValueError, match="not in the table schema"):
        TX.tx_add_identity(spark, p, "nope")
    with pytest.raises(ValueError, match="nonzero"):
        TX.tx_add_identity(spark, p, "x", step=0)


def test_identity_declares_writer_feature(spark, tmp_path):
    p = str(tmp_path / "id8")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    assert TX.FEATURE_IDENTITY_COLUMNS in m["protocol"]["writer_features"]


def test_identity_drop_then_plain_append_null_fills(spark, tmp_path):
    p = str(tmp_path / "id9")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(spark, spark.createDataFrame([("a",)], "v string"), p, mode="append")
    TX.tx_drop_identity(spark, p, "id")
    TX.tx_write(spark, spark.createDataFrame([("b",)], "v string"), p, mode="append")
    got = {r["v"]: r["id"] for r in TX.tx_read(spark, p).collect()}
    assert got == {"a": 1, "b": None}
    # re-declare: the mark survived the drop — no reuse of id 1
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(spark, spark.createDataFrame([("c",)], "v string"), p, mode="append")
    assert {r["v"]: r["id"] for r in TX.tx_read(spark, p).collect()}["c"] == 2


def test_identity_merge_explicit_values_bump_mark(spark, tmp_path):
    p = str(tmp_path / "id10")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), p
    )
    TX.tx_add_identity(spark, p, "id")
    TX.tx_merge(
        spark,
        spark.createDataFrame([(40, "m")], "id long, v string"),
        p,
        keys=["id"],
    )
    TX.tx_write(spark, spark.createDataFrame([("n",)], "v string"), p, mode="append")
    assert _ids(spark, p) == [1, 40, 41]


# ---------------------------------------------------------------------------
# column DEFAULTs


def test_default_applied_when_column_omitted(spark, tmp_path):
    p = str(tmp_path / "d1")
    TX.tx_write(
        spark,
        spark.createDataFrame([("a", "manual")], "v string, src string"),
        p,
    )
    TX.tx_set_default(spark, p, "src", "'ingest'")
    TX.tx_write(spark, spark.createDataFrame([("b",)], "v string"), p, mode="append")
    # supplied values win; existing rows untouched
    TX.tx_write(
        spark,
        spark.createDataFrame([("c", "explicit")], "v string, src string"),
        p,
        mode="append",
    )
    got = {r["v"]: r["src"] for r in TX.tx_read(spark, p).collect()}
    assert got == {"a": "manual", "b": "ingest", "c": "explicit"}


def test_default_expression_validated_at_declaration(spark, tmp_path):
    import pytest

    p = str(tmp_path / "d2")
    TX.tx_write(spark, spark.createDataFrame([("a",)], "v string"), p)
    with pytest.raises(Exception):
        TX.tx_set_default(spark, p, "v", "no_such_col + 1")
    with pytest.raises(ValueError, match="not in the table schema"):
        TX.tx_set_default(spark, p, "nope", "'x'")


def test_default_survives_clone_and_feeds_generated(spark, tmp_path):
    src = str(tmp_path / "d3src")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, 2, 3)], "a long, b long, a_plus_b long"
        ),
        src,
    )
    TX.tx_set_default(spark, src, "b", "2")
    TX.tx_add_generated_column(spark, src, "a_plus_b", "a + b")
    dst = str(tmp_path / "d3dst")
    TX.tx_clone(spark, src, dst)
    # omitted b defaults to 2 FIRST, then the generated column computes
    TX.tx_write(spark, spark.createDataFrame([(7,)], "a long"), dst, mode="append")
    got = rows(TX.tx_read(spark, dst))
    assert got == [(1, 2, 3), (7, 2, 9)]
    m = TX.read_manifest(spark, dst, TX.current_version(spark, dst))
    assert TX.FEATURE_COLUMN_DEFAULTS in m["protocol"]["writer_features"]


def test_default_drop(spark, tmp_path):
    p = str(tmp_path / "d4")
    TX.tx_write(spark, spark.createDataFrame([("a", "x")], "v string, s string"), p)
    TX.tx_set_default(spark, p, "s", "'dflt'")
    TX.tx_drop_default(spark, p, "s")
    TX.tx_write(spark, spark.createDataFrame([("b",)], "v string"), p, mode="append")
    got = {r["v"]: r["s"] for r in TX.tx_read(spark, p).collect()}
    assert got == {"a": "x", "b": None}


def test_identity_no_reuse_after_restore(spark, tmp_path):
    """RESTORE rewinds the data, never the allocator: ids minted after the
    restore point must not collide with ids the restore discarded (Delta
    keeps the identity high watermark monotone across RESTORE the same
    way)."""
    p = str(tmp_path / "id11")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(spark, spark.createDataFrame([("a",)], "v string"), p, mode="append")
    v_before = TX.current_version(spark, p)
    TX.tx_write(spark, spark.createDataFrame([("b",)], "v string"), p, mode="append")
    assert _ids(spark, p) == [1, 2]
    TX.tx_restore(spark, p, v_before)  # discards the row holding id 2
    assert _ids(spark, p) == [1]
    TX.tx_write(spark, spark.createDataFrame([("c",)], "v string"), p, mode="append")
    # id 2 was burned by the discarded row — allocation continues at 3
    assert _ids(spark, p) == [1, 3]


def test_identity_survives_compaction(spark, tmp_path):
    p = str(tmp_path / "id12")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    for tag in "abc":
        TX.tx_write(
            spark, spark.createDataFrame([(tag,)], "v string"), p, mode="append"
        )
    TX.tx_compact(spark, p, n_files=2)
    assert _ids(spark, p) == [1, 2, 3]  # values rewritten verbatim
    TX.tx_write(spark, spark.createDataFrame([("d",)], "v string"), p, mode="append")
    assert _ids(spark, p) == [1, 2, 3, 4]  # mark unmoved by the rewrite


def test_table_doctor_flags_identity_mark_behind_data(spark, tmp_path):
    import json as _json

    from tools.table_doctor import doctor

    p = str(tmp_path / "id13")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(spark, spark.createDataFrame([("a",)], "v string"), p, mode="append")
    rep = doctor(spark, p)
    assert not rep["errors"] and rep["identity"] == {"id": 1}
    # corrupt: land an explicit id ABOVE the mark without bumping it, by
    # writing a raw commit record (simulates a foreign/buggy writer)
    v = TX.current_version(spark, p)
    batch, files = TX._write_batch(
        spark.createDataFrame([(99, "z")], "id long, v string"), p, None
    )
    rec = {
        "op": "append", "version": v + 1,
        "schema": TX.read_manifest(spark, p, v)["schema"],
        "add": files, "remove": [], "truncate": False, "writer": "x",
        "ts_ms": 0,
    }
    TX._create_no_overwrite(
        spark, TX._version_path(p, v + 1), _json.dumps(rec)
    )
    rep = doctor(spark, p)
    assert any("behind the data" in e for e in rep["errors"])


# ---------------------------------------------------------------------------
# round 9: keyword-only API, exchange-free allocation, partition-column
# identity marks, conditional commits, 8-thread contention budget


def test_txlog_dml_api_is_keyword_only(spark, tmp_path):
    """The positional footgun is dead: `tx_write(spark, df, p, "append")`
    used to bind "append" to partition_by (chars became partition columns
    -> COLUMN_ALREADY_EXISTS); now every option past the address is
    keyword-only and the old call cannot even bind."""
    import pytest

    p = str(tmp_path / "kw1")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    TX.tx_write(spark, df, p)
    with pytest.raises(TypeError):
        TX.tx_write(spark, df, p, "append")
    with pytest.raises(TypeError):
        TX.tx_write(spark, df, p, ["id"], "append")
    with pytest.raises(TypeError):
        TX.tx_merge(spark, df, p, ["id"], ["v"])  # positional partition_by
    with pytest.raises(TypeError):
        TX.tx_delete(spark, p, {"id": (1, 1)})  # positional where
    with pytest.raises(TypeError):
        TX.tx_update(spark, p, {"id": (1, 1)}, {"v": F.lit("x")})


def test_identity_allocation_plan_has_zero_exchange(spark):
    """The id-stamping job is a single narrow Arrow pass over the pinned
    frame — no Exchange of any kind (the old window-over-partition-id
    form paid a full hash Exchange of the batch). The per-partition count
    job is a separate metadata-sized aggregation; the DATA never
    shuffles."""
    df = spark.range(0, 10_000, 1, 8).selectExpr("id * 2 as x")
    out, mark, _ = TX._allocate_identity(df.drop("id"), "rid", 0, 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = [r["rid"] for r in out.collect()]
    assert sorted(got) == list(range(1, 10_001))
    assert mark == 10_000


def test_identity_column_as_partition_column_advances_mark(spark, tmp_path):
    """An identity column that is ALSO a partition column records no file
    stats (partition columns are excluded from stats_for), so the mark
    must advance from the hive partition values — without that, every
    append re-allocates the same ids."""
    p = str(tmp_path / "idpart")
    TX.tx_write(
        spark,
        spark.createDataFrame([], "id long, v string"),
        p,
        partition_by=["id"],
    )
    TX.tx_add_identity(spark, p, "id")
    TX.tx_write(
        spark,
        spark.createDataFrame([("a",), ("b",)], "v string"),
        p,
        mode="append",
        partition_by=["id"],
    )
    assert _ids(spark, p) == [1, 2]
    TX.tx_write(
        spark,
        spark.createDataFrame([("c",)], "v string"),
        p,
        mode="append",
        partition_by=["id"],
    )
    ids = _ids(spark, p)
    assert ids == [1, 2, 3], f"identity mark failed to advance: {ids}"


def test_require_version_guards_snapshot_overwrites(spark, tmp_path):
    """tx_write(require_version=N) is an optimistic CAS on the snapshot
    the caller derived the batch from: a commit racing in between raises
    TxConflictError and nothing lands (the row-tracking backfill uses
    exactly this so a concurrent append is never silently discarded)."""
    import pytest

    p = str(tmp_path / "reqv")
    TX.tx_write(spark, spark.createDataFrame([("a",)], "v string"), p)
    v = TX.current_version(spark, p)
    # a concurrent writer advances the table past the snapshot we read
    TX.tx_write(
        spark, spark.createDataFrame([("b",)], "v string"), p, mode="append"
    )
    with pytest.raises(TX.TxConflictError, match="advanced"):
        TX.tx_write(
            spark,
            spark.createDataFrame([("stale",)], "v string"),
            p,
            mode="overwrite",
            require_version=v,
        )
    # nothing landed; the racing append's row is intact
    assert {r["v"] for r in TX.tx_read(spark, p).collect()} == {"a", "b"}
    # the happy path commits when the version still matches
    v2 = TX.current_version(spark, p)
    TX.tx_write(
        spark,
        spark.createDataFrame([("fresh",)], "v string"),
        p,
        mode="overwrite",
        require_version=v2,
    )
    assert {r["v"] for r in TX.tx_read(spark, p).collect()} == {"fresh"}


@pytest.mark.slow
def test_identity_8_thread_race_within_bounded_retry_budget(spark, tmp_path):
    """Contention fairness: 8 racing allocators must all land within a
    12-retry budget under the full-jitter exponential backoff (the linear
    backoff this replaced starved 8 of 24 retries at FOUR threads). Every
    id unique and dense — no loser ever commits overlapping ranges."""
    p = str(tmp_path / "id8t")
    TX.tx_write(spark, spark.createDataFrame([], "id long, v string"), p)
    TX.tx_add_identity(spark, p, "id")
    errs = []

    def writer(tag):
        try:
            TX.tx_write(
                spark,
                spark.createDataFrame([(f"{tag}a",), (f"{tag}b",)], "v string"),
                p,
                mode="append",
                _identity_retries=12,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=writer, args=(str(t),)) for t in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    ids = _ids(spark, p)
    assert ids == list(range(1, 17)), f"holes or duplicates: {ids}"
