"""Idempotent writer commits (Delta's txnAppId/txnVersion SetTransaction
twin): a ``txn``-tagged tx_write at or below the table's per-app
high-water mark is a NO-OP, so a restarted streaming sink replays a
micro-batch as a PLAIN APPEND with zero duplicates — no keyed merge
needed. The mark must survive checkpointing, vacuum, and racing replays."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _df(spark, *ks):
    return spark.createDataFrame([(k, f"v{k}") for k in ks], "k long, v string")


def test_txn_replay_is_noop(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1), p, mode="append", txn=("job", 1))
    v = TX.tx_write(spark, _df(spark, 2), p, mode="append", txn=("job", 2))
    # exact replay of batch 2: no-op returning the current version
    assert TX.tx_write(spark, _df(spark, 2), p, mode="append", txn=("job", 2)) == v
    # a STALE replay (batch 1 again after batch 2) is also a no-op
    assert TX.tx_write(spark, _df(spark, 1), p, mode="append", txn=("job", 1)) == v
    assert rows(TX.tx_read(spark, p)) == [(1, "v1"), (2, "v2")]
    assert TX.current_version(spark, p) == v == 2
    # a DIFFERENT app's version counter is independent
    TX.tx_write(spark, _df(spark, 3), p, mode="append", txn=("other", 1))
    assert rows(TX.tx_read(spark, p)) == [(1, "v1"), (2, "v2"), (3, "v3")]


def test_txn_version_getter(spark, tmp_path):
    p = str(tmp_path / "t")
    assert TX.tx_txn_version(spark, p, "job") is None
    TX.tx_write(spark, _df(spark, 1), p, txn=("job", 7))
    assert TX.tx_txn_version(spark, p, "job") == 7
    assert TX.tx_txn_version(spark, p, "other") is None


def test_txn_declares_writer_feature_and_old_writer_refuses(
    spark, tmp_path, monkeypatch
):
    """An old writer that does not maintain txn marks must refuse the
    table: its checkpoint writer would silently DROP the high-water marks,
    re-opening the door to replays."""
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1), p, txn=("job", 1))
    proto = TX.tx_protocol(spark, p)
    assert TX.FEATURE_IDEMPOTENT_TXN in proto["writer_features"]
    assert TX.FEATURE_IDEMPOTENT_TXN not in proto["reader_features"]
    monkeypatch.setattr(
        TX,
        "SUPPORTED_WRITER_FEATURES",
        TX.SUPPORTED_WRITER_FEATURES - {TX.FEATURE_IDEMPOTENT_TXN},
    )
    with pytest.raises(TX.TxProtocolError, match="idempotent-txn"):
        TX.tx_write(spark, _df(spark, 2), p, mode="append")
    # readers are unaffected — txn marks are invisible to reads
    assert rows(TX.tx_read(spark, p)) == [(1, "v1")]


def test_txn_mark_survives_checkpoint_and_vacuum(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 0), p, txn=("job", 1))
    for i in range(1, TX._CHECKPOINT_EVERY + 2):
        TX.tx_write(spark, _df(spark, i), p, mode="append")
    TX.tx_vacuum(spark, p, keep_versions=2, retain_hours=0)
    # the txn commit's own record is vacuumed — the checkpoint must carry
    # the mark, or this replay would duplicate batch 1
    assert TX.tx_txn_version(spark, p, "job") == 1
    before = rows(TX.tx_read(spark, p))
    TX.tx_write(spark, _df(spark, 0), p, mode="append", txn=("job", 1))
    assert rows(TX.tx_read(spark, p)) == before


def test_txn_racing_replays_land_exactly_once(spark, tmp_path, monkeypatch):
    """Two concurrent replays of the SAME batch: the claim loser re-checks
    the winner's high-water mark when it rebuilds, and becomes a no-op —
    never a duplicate (the per-attempt re-check inside build)."""
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1), p)
    orig = TX._create_no_overwrite
    state = {"raced": False}

    def racy(sp, dst, text):
        if not state["raced"]:
            state["raced"] = True
            # the competing replay of batch 5 lands while our claim flies
            TX.tx_write(
                spark, _df(spark, 5), p, mode="append", txn=("job", 5)
            )
            return False  # and our claim loses
        return orig(sp, dst, text)

    monkeypatch.setattr(TX, "_create_no_overwrite", racy)
    TX.tx_write(spark, _df(spark, 5), p, mode="append", txn=("job", 5))
    assert rows(TX.tx_read(spark, p)) == [(1, "v1"), (5, "v5")]
    # the loser's orphan batch files were cleaned up, nothing references them
    from tools.table_doctor import doctor

    rep = doctor(spark, p)
    assert rep["errors"] == []
    assert rep["orphans"] == []


def test_txn_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    with pytest.raises(ValueError, match="app id"):
        TX.tx_write(spark, _df(spark, 1), p, txn=("", 1))
