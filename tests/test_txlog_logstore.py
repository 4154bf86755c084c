"""Pluggable LogStore (txlog's twin of Delta's public LogStore plugin
interface): ALL transaction-log I/O funnels through six primitives, so an
object-store deployment supplies conditional-put claim atomicity without
touching the commit protocol. Verified here with the reference
InMemoryCASLogStore — the log lives entirely OFF the filesystem while the
parquet data stays on disk, and claim atomicity comes from the store's CAS
instead of posix O_EXCL."""

from __future__ import annotations

import os
import threading

import pytest

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


@pytest.fixture
def cas_store():
    store = TX.InMemoryCASLogStore()
    TX.set_log_store(store)
    try:
        yield store
    finally:
        TX.set_log_store(None)


def _mk(spark, i, region="us"):
    return spark.createDataFrame(
        [(i, f"v{i}", region)], "id long, s string, region string"
    ).repartition(1)


def test_full_lifecycle_through_store(spark, tmp_path, cas_store):
    """Write/append/merge-free lifecycle with the LOG in the store: reads,
    time travel, history, checkpoints, vacuum all work; the table dir holds
    data files but NO _txlog directory (every log byte went to the store)."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl, partition_by=["region"])
    for i in range(2, 13):  # crosses the checkpoint cadence (v10)
        TX.tx_write(spark, _mk(spark, i, "eu" if i % 2 else "us"), tbl,
                    mode="append")

    assert not os.path.exists(os.path.join(tbl, "_txlog"))
    assert os.path.isdir(os.path.join(tbl, "data"))
    # log content is in the store: 12 commits + checkpoint(s) + hint
    names = cas_store.list_names(f"{tbl}/_txlog")
    assert "v0000000001.json" in names and "c0000000010.json" in names
    assert "_last_checkpoint" in names

    assert TX.current_version(spark, tbl) == 12
    assert TX.tx_read(spark, tbl).count() == 12
    assert TX.tx_read(spark, tbl, version=3).count() == 3  # time travel
    assert len(TX.tx_history(spark, tbl)) == 12

    # vacuum truncates the stored log and grounds it with a checkpoint
    TX.tx_vacuum(spark, tbl, keep_versions=2, retain_hours=0)
    versions, checkpoints = TX._log_listing(spark, tbl)
    assert versions == [11, 12] and checkpoints == [11]
    assert TX.tx_read(spark, tbl).count() == 12


def test_cas_claim_thread_race_gapless(spark, tmp_path, cas_store):
    """8 threads race appends through the store's CAS put_if_absent: every
    commit lands, versions are gapless, no rows lost — the claim atomicity
    an object store's conditional put provides."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 0), tbl)
    barrier = threading.Barrier(8)
    errors: list[Exception] = []

    def writer(k: int) -> None:
        try:
            barrier.wait(30)
            for j in range(3):
                TX.tx_write(spark, _mk(spark, 100 * k + j), tbl, mode="append")
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors
    assert TX.list_versions(spark, tbl) == list(range(1, 26))  # 1 + 24, gapless
    ids = sorted(r.id for r in TX.tx_read(spark, tbl).collect())
    assert ids == sorted([0] + [100 * k + j for k in range(8) for j in range(3)])


def test_store_scoped_to_log_paths_only(spark, tmp_path, cas_store):
    """The store sees ONLY _txlog paths; data files take the filesystem
    route (Delta's LogStore contract — executors write parquet directly)."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    assert all("/_txlog/" in p or p.endswith("/_txlog")
               for p in cas_store._files)
    # a data-file path never routes to the store
    assert TX._store_for(f"{tbl}/data/b0/part-0.parquet") is None
    assert TX._store_for(f"{tbl}/_txlog/v0000000001.json") is cas_store


def test_dml_and_diff_through_store(spark, tmp_path, cas_store):
    """Row-level DELETE and the change feed work unchanged with the log in
    the store (the commit protocol never notices the backend swap)."""
    tbl = str(tmp_path / "t")
    TX.tx_write(spark, _mk(spark, 1), tbl)
    TX.tx_write(spark, _mk(spark, 2), tbl, mode="append")
    TX.tx_delete(spark, tbl, where={"id": (2, 2)})
    assert sorted(r.id for r in TX.tx_read(spark, tbl).collect()) == [1]
    diff = TX.tx_diff(spark, tbl, ["id"], 2, 3)
    assert [(r.id, r._change_type) for r in diff.collect()] == [(2, "delete")]


def test_round6_features_flow_through_store(spark, tmp_path, cas_store):
    """Protocol flags, txn marks, properties/constraints, DV deletes, and
    column mapping all resolve through the SAME six log primitives — with
    the log entirely in the store (no _txlog on disk), every round-6
    surface behaves identically to the filesystem path."""
    import pyspark.sql.functions as F

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k long, v string"
    )
    TX.tx_write(spark, df, tbl, txn=("sink", 1))
    # txn replay no-ops through the store
    v = TX.current_version(spark, tbl)
    assert TX.tx_write(spark, df, tbl, mode="append", txn=("sink", 1)) == v
    # constraint + appendOnly round trip
    TX.tx_add_constraint(spark, tbl, "positive", "k >= 0")
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_write(
            spark,
            spark.createDataFrame([(-1, "x")], "k long, v string"),
            tbl,
            mode="append",
        )
    TX.tx_set_properties(spark, tbl, {"appendOnly": "true"})
    with pytest.raises(TX.TxPropertyViolation):
        TX.tx_delete(spark, tbl, where={"k": (0, 0)})
    TX.tx_set_properties(spark, tbl, {"appendOnly": None})
    # DV delete declares the protocol feature in the store-resident log
    TX.tx_delete(spark, tbl, where={"k": (1, 1)}, use_dv=True)
    assert (
        TX.FEATURE_DELETION_VECTORS
        in TX.tx_protocol(spark, tbl)["reader_features"]
    )
    # column mapping: metadata-only rename via the store
    TX.tx_rename_column(spark, tbl, "v", "label")
    got = sorted(
        (r.k, r.label) for r in TX.tx_read(spark, tbl).collect()
    )
    assert got == [(i, f"v{i}") for i in range(6) if i != 1]
    assert TX.tx_txn_version(spark, tbl, "sink") == 1
    # the whole log — incl. every new action type — lives in the store
    import os as _os

    assert not _os.path.exists(_os.path.join(tbl, "_txlog"))
