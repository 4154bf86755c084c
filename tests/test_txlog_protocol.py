"""Protocol / table-feature tests (Delta protocol action twin): a table
written with deletion vectors must be UNREADABLE-LOUDLY — never
silently-wrong — to a reader that does not implement deletion vectors, and
un-writable by a writer that cannot maintain them. Features are monotone
and must survive checkpointing, vacuum, restore, and clone."""

import json

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _dv_table(spark, tmp_path, name="t"):
    p = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string"
    )
    TX.tx_write(spark, df, p)
    TX.tx_delete(spark, p, where={"k": (3, 5)}, use_dv=True)
    return p


def test_plain_table_declares_no_features(spark, tmp_path):
    p = str(tmp_path / "plain")
    TX.tx_write(spark, spark.createDataFrame([(1, "a")], "k long, v string"), p)
    proto = TX.tx_protocol(spark, p)
    assert proto == {"reader_features": [], "writer_features": []}


def test_dv_commit_declares_deletion_vectors(spark, tmp_path):
    p = _dv_table(spark, tmp_path)
    proto = TX.tx_protocol(spark, p)
    assert TX.FEATURE_DELETION_VECTORS in proto["reader_features"]
    assert TX.FEATURE_DELETION_VECTORS in proto["writer_features"]
    # the raw DV commit record itself carries the action (grounded-suffix
    # guarantee: any retained log containing it declares the feature)
    rec = TX.read_commit(spark, p, 2)
    assert TX.FEATURE_DELETION_VECTORS in rec["protocol"]["reader_features"]


def test_old_reader_fails_loudly_on_dv_table(spark, tmp_path, monkeypatch):
    """THE directive contract: simulate a reader build that predates
    deletion vectors — it must raise, not silently return deleted rows."""
    dv = _dv_table(spark, tmp_path, "dv")
    plain = str(tmp_path / "plain")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "k long, v string"), plain
    )
    monkeypatch.setattr(
        TX,
        "SUPPORTED_READER_FEATURES",
        TX.SUPPORTED_READER_FEATURES - {TX.FEATURE_DELETION_VECTORS},
    )
    with pytest.raises(TX.TxProtocolError, match="deletion-vectors"):
        TX.tx_read(spark, dv)
    # the same old reader still reads a plain table
    assert rows(TX.tx_read(spark, plain)) == [(1, "a")]


def test_old_writer_refuses_dv_table(spark, tmp_path, monkeypatch):
    dv = _dv_table(spark, tmp_path, "dv")
    plain = str(tmp_path / "plain")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "k long, v string"), plain
    )
    monkeypatch.setattr(
        TX,
        "SUPPORTED_WRITER_FEATURES",
        TX.SUPPORTED_WRITER_FEATURES - {TX.FEATURE_DELETION_VECTORS},
    )
    extra = spark.createDataFrame([(99, "z")], "k long, v string")
    with pytest.raises(TX.TxProtocolError, match="deletion-vectors"):
        TX.tx_write(spark, extra, dv, mode="append")
    # nothing committed by the refused attempt
    assert TX.current_version(spark, dv) == 2
    # the same old writer still appends to a plain table
    TX.tx_write(spark, extra, plain, mode="append")
    assert rows(TX.tx_read(spark, plain)) == [(1, "a"), (99, "z")]


def test_unknown_future_feature_fails_reads_but_not_history(spark, tmp_path):
    p = str(tmp_path / "future")
    TX.tx_write(spark, spark.createDataFrame([(1, "a")], "k long, v string"), p)

    def build(now):
        snap = TX.read_manifest(spark, p, now)
        return {
            "op": "upgrade_protocol",
            "schema": snap["schema"],
            "add": [],
            "remove": [],
            "truncate": False,
            "protocol": {
                "reader_features": ["future-quantum-encoding"],
                "writer_features": ["future-quantum-encoding"],
            },
        }

    TX._commit(spark, p, build)
    with pytest.raises(TX.TxProtocolError, match="future-quantum-encoding"):
        TX.tx_read(spark, p)
    with pytest.raises(TX.TxProtocolError):
        TX.tx_write(
            spark,
            spark.createDataFrame([(2, "b")], "k long, v string"),
            p,
            mode="append",
        )
    # metadata-only display still works (Delta: DESCRIBE HISTORY does)
    assert [m["op"] for m in TX.tx_history(spark, p)] == [
        "overwrite",
        "upgrade_protocol",
    ]
    # doctor diagnoses instead of crashing
    from tools.table_doctor import doctor

    rep = doctor(spark, p)
    assert any("future-quantum-encoding" in e for e in rep["errors"])


def test_upgrade_protocol_is_monotone_and_validated(spark, tmp_path):
    p = str(tmp_path / "up")
    TX.tx_write(spark, spark.createDataFrame([(1, "a")], "k long, v string"), p)
    TX.tx_upgrade_protocol(
        spark, p, writer_features=(TX.FEATURE_IDEMPOTENT_TXN,)
    )
    proto = TX.tx_protocol(spark, p)
    assert proto["writer_features"] == [TX.FEATURE_IDEMPOTENT_TXN]
    # idempotent re-declare unions to the same set
    TX.tx_upgrade_protocol(
        spark, p, writer_features=(TX.FEATURE_IDEMPOTENT_TXN,)
    )
    assert TX.tx_protocol(spark, p) == proto
    # a feature this build does not implement cannot be declared
    with pytest.raises(TX.TxProtocolError):
        TX.tx_upgrade_protocol(spark, p, reader_features=("not-a-feature",))


def test_protocol_survives_checkpoint_and_vacuum(spark, tmp_path):
    p = _dv_table(spark, tmp_path)
    # push past a checkpoint boundary, then vacuum away the DV commit's
    # own record — the checkpoint header must carry the declaration
    for i in range(TX._CHECKPOINT_EVERY + 2):
        TX.tx_write(
            spark,
            spark.createDataFrame([(100 + i, "x")], "k long, v string"),
            p,
            mode="append",
        )
    TX.tx_vacuum(spark, p, keep_versions=2, retain_hours=0)
    proto = TX.tx_protocol(spark, p)
    assert TX.FEATURE_DELETION_VECTORS in proto["reader_features"]
    cp_versions = TX._log_listing(spark, p)[1]
    cp = json.loads(
        TX._read_text(spark, TX._checkpoint_path(p, max(cp_versions)))
    )
    assert TX.FEATURE_DELETION_VECTORS in cp["protocol"]["reader_features"]


def test_restore_carries_protocol_forward(spark, tmp_path):
    p = _dv_table(spark, tmp_path)
    TX.tx_restore(spark, p, 1)  # restore to the pre-DV version
    proto = TX.tx_protocol(spark, p)
    # features are monotone: restoring to a pre-feature snapshot does NOT
    # downgrade (the restore record truncate-grounds the log, so it must
    # re-declare)
    assert TX.FEATURE_DELETION_VECTORS in proto["reader_features"]
    rec = TX.read_commit(spark, p, 3)
    assert rec["truncate"] is True
    assert TX.FEATURE_DELETION_VECTORS in rec["protocol"]["reader_features"]


def test_clone_of_dv_table_reads_masked_rows_and_declares(spark, tmp_path):
    src = _dv_table(spark, tmp_path, "src")
    dst = str(tmp_path / "dst")
    TX.tx_clone(spark, src, dst)
    # the clone must see the DV-masked state (k 3..5 soft-deleted at src);
    # its absolute dv refs resolve the sidecars at the SOURCE
    assert rows(TX.tx_read(spark, dst).select("k")) == [
        (i,) for i in range(10) if not 3 <= i <= 5
    ]
    proto = TX.tx_protocol(spark, dst)
    assert TX.FEATURE_DELETION_VECTORS in proto["reader_features"]


def test_dv_merge_declares_protocol(spark, tmp_path):
    p = str(tmp_path / "m")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        p,
    )
    TX.tx_merge(
        spark,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        p,
        keys=["k"],
        use_dv=True,
    )
    assert rows(TX.tx_read(spark, p)) == [(1, "a"), (2, "B"), (3, "c")]
    proto = TX.tx_protocol(spark, p)
    assert TX.FEATURE_DELETION_VECTORS in proto["reader_features"]
