"""COPY INTO — idempotent bulk-file ingestion (`txlog.tx_copy_into` +
the `core/sql_dml` COPY INTO route): each source file lands EXACTLY ONCE
across reruns. The raw→stage bridge the reference hand-rolls with its
extractor (`utils/extract_data/load_with_query_python.py:288-294` drops
gzip CSVs into the raw layer); Delta's COPY INTO gives the same
guarantee as one SQL statement. The ingested-file ledger rides the SAME
atomic commit as the rows, accumulates like txn marks, and survives log
truncation via checkpoints."""

import gzip
import os

import pytest

from cdk_datalake_analytics_comercial_spark.core.sql_dml import SqlDmlError, sql_dml
from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
    register_txlog_table,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _target(spark, tmp_path, name="t"):
    p = str(tmp_path / name)
    TX.tx_write(
        spark,
        spark.createDataFrame([], "id long, v string, amt double"),
        p,
    )
    return p


def _drop_parquet(spark, d, fname, data):
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, "_tmp_build")
    spark.createDataFrame(
        data, "id long, v string, amt double"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, part), os.path.join(d, fname))
    import shutil

    shutil.rmtree(tmp)
    return os.path.join(d, fname)


def test_copy_into_parquet_idempotent_rerun(spark, tmp_path):
    p = _target(spark, tmp_path)
    drop = str(tmp_path / "drop")
    _drop_parquet(spark, drop, "a.parquet", [(1, "a", 1.5), (2, "b", 2.5)])
    _drop_parquet(spark, drop, "b.parquet", [(3, "c", 3.5)])
    v1 = TX.tx_copy_into(spark, p, drop, "parquet")
    assert rows(TX.tx_read(spark, p).select("id")) == [(1,), (2,), (3,)]
    # rerun: NO new version, NO duplicate rows — the idempotence contract
    v2 = TX.tx_copy_into(spark, p, drop, "parquet")
    assert v2 == v1
    assert TX.tx_read(spark, p).count() == 3
    # a NEW file arrives: only it loads
    _drop_parquet(spark, drop, "c.parquet", [(4, "d", 4.5)])
    v3 = TX.tx_copy_into(spark, p, drop, "parquet")
    assert v3 == v1 + 1
    assert rows(TX.tx_read(spark, p).select("id")) == [(1,), (2,), (3,), (4,)]
    # ledger records all three identities
    led = TX.read_manifest(spark, p, v3)["copy_files"]
    assert len(led) == 3 and all(os.path.isabs(f) for f in led)
    # the writer feature gates older writers from dropping the ledger
    assert TX.FEATURE_COPY_LEDGER in TX.tx_protocol(spark, p)["writer_features"]


def test_copy_into_force_reloads(spark, tmp_path):
    p = _target(spark, tmp_path)
    drop = str(tmp_path / "drop")
    _drop_parquet(spark, drop, "a.parquet", [(1, "a", 1.0)])
    TX.tx_copy_into(spark, p, drop, "parquet")
    TX.tx_copy_into(spark, p, drop, "parquet", force=True)
    assert TX.tx_read(spark, p).count() == 2  # duplicate by request


def test_copy_into_csv_gz_semicolon(spark, tmp_path):
    """The reference's raw shape: `;`-delimited gzip CSVs — ingested
    with FORMAT_OPTIONS, strings cast to the table's declared types."""
    p = _target(spark, tmp_path, "csvt")
    drop = str(tmp_path / "csvdrop")
    os.makedirs(drop)
    with gzip.open(os.path.join(drop, "x.csv.gz"), "wt") as f:
        f.write("id;v;amt\n1;aa;1.25\n2;bb;2.5\n")
    with gzip.open(os.path.join(drop, "y.csv.gz"), "wt") as f:
        f.write("id;v;amt\n3;cc;3.75\n")
    TX.tx_copy_into(
        spark, p, drop, "csv",
        format_options={"header": "true", "sep": ";"},
    )
    assert rows(TX.tx_read(spark, p)) == [
        (1, "aa", 1.25), (2, "bb", 2.5), (3, "cc", 3.75),
    ]
    # rerun no-op even though gzip mtimes differ from listing time
    v = TX.tx_copy_into(
        spark, p, drop, "csv",
        format_options={"header": "true", "sep": ";"},
    )
    assert TX.tx_read(spark, p).count() == 3 and isinstance(v, int)


def test_copy_into_pattern_and_refusals(spark, tmp_path):
    p = _target(spark, tmp_path, "pat")
    drop = str(tmp_path / "patdrop")
    _drop_parquet(spark, drop, "keep_1.parquet", [(1, "a", 1.0)])
    _drop_parquet(spark, drop, "skip_1.parquet", [(9, "z", 9.0)])
    # hidden/underscore files are never listed
    with open(os.path.join(drop, "_SUCCESS"), "w") as f:
        f.write("")
    TX.tx_copy_into(spark, p, drop, "parquet", pattern="keep_*.parquet")
    assert rows(TX.tx_read(spark, p).select("id")) == [(1,)]
    with pytest.raises(ValueError, match="FILEFORMAT"):
        TX.tx_copy_into(spark, p, drop, "orc")
    with pytest.raises(FileNotFoundError, match="not found"):
        TX.tx_copy_into(spark, p, str(tmp_path / "nope"), "parquet")
    # unknown source column refuses loudly (COPY never evolves schema)
    bad = str(tmp_path / "baddrop")
    os.makedirs(bad)
    spark.createDataFrame([(1, "a", 1.0, "X")], "id long, v string, amt double, extra string").coalesce(1).write.mode("overwrite").parquet(os.path.join(bad, "b"))
    with pytest.raises(TX.TxSchemaMismatch, match="extra"):
        TX.tx_copy_into(spark, p, os.path.join(bad, "b"), "parquet")


def test_copy_into_atomicity_on_failed_batch(spark, tmp_path):
    """Partial failure: a batch that violates a stored CHECK constraint
    commits NOTHING — rows absent AND ledger untouched — so the rerun
    after fixing the data re-ingests exactly the failed files."""
    p = _target(spark, tmp_path, "atom")
    TX.tx_add_constraint(spark, p, "amt_pos", "amt > 0")
    drop = str(tmp_path / "atomdrop")
    f_bad = _drop_parquet(spark, drop, "bad.parquet", [(1, "a", -5.0)])
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_copy_into(spark, p, drop, "parquet")
    cur = TX.current_version(spark, p)
    assert TX.read_manifest(spark, p, cur)["copy_files"] == []
    assert TX.tx_read(spark, p).count() == 0
    # fix the file in place; path identity unchanged — still ingestable
    os.remove(f_bad)
    _drop_parquet(spark, drop, "bad.parquet", [(1, "a", 5.0)])
    TX.tx_copy_into(spark, p, drop, "parquet")
    assert rows(TX.tx_read(spark, p)) == [(1, "a", 5.0)]


def test_copy_into_ledger_survives_checkpoint(spark, tmp_path):
    p = _target(spark, tmp_path, "ckpt")
    drop = str(tmp_path / "ckptdrop")
    _drop_parquet(spark, drop, "a.parquet", [(1, "a", 1.0)])
    v = TX.tx_copy_into(spark, p, drop, "parquet")
    TX._write_checkpoint(spark, p, v)
    # resolved THROUGH the checkpoint, the ledger still blocks re-ingest
    assert TX.read_manifest(spark, p, v)["copy_files"]
    assert TX.tx_copy_into(spark, p, drop, "parquet") == v
    assert TX.tx_read(spark, p).count() == 1


def test_sql_copy_into_route(spark, tmp_path):
    """The SQL face: COPY INTO by name with PATTERN, FORMAT_OPTIONS and
    COPY_OPTIONS, returning the committed version; reruns no-op."""
    p = _target(spark, tmp_path, "sqlt")
    register_txlog_table(spark, "copydb", "t", p)
    drop = str(tmp_path / "sqldrop")
    os.makedirs(drop)
    with gzip.open(os.path.join(drop, "d1.csv.gz"), "wt") as f:
        f.write("id;v;amt\n10;s1;0.5\n")
    with gzip.open(os.path.join(drop, "d2.csv.gz"), "wt") as f:
        f.write("id;v;amt\n11;s2;1.5\n")
    stmt = (
        f"COPY INTO copydb.t FROM '{drop}' FILEFORMAT = CSV "
        "PATTERN = '*.csv.gz' "
        "FORMAT_OPTIONS ('header' = 'true', 'sep' = ';')"
    )
    v1 = sql_dml(spark, stmt)
    assert isinstance(v1, int)
    assert spark.sql("SELECT COUNT(*) AS n FROM copydb.t").collect()[0].n == 2
    assert sql_dml(spark, stmt) == v1  # rerun: idempotent no-op
    assert spark.sql("SELECT COUNT(*) AS n FROM copydb.t").collect()[0].n == 2
    # force reload via COPY_OPTIONS
    sql_dml(spark, stmt + " COPY_OPTIONS ('force' = 'true')")
    assert spark.sql("SELECT COUNT(*) AS n FROM copydb.t").collect()[0].n == 4
    # refusals: unregistered table, unknown copy option, trailing junk
    with pytest.raises(SqlDmlError, match="registered"):
        sql_dml(spark, f"COPY INTO copydb.nope FROM '{drop}' FILEFORMAT = CSV")
    with pytest.raises(SqlDmlError, match="COPY_OPTIONS"):
        sql_dml(spark, stmt + " COPY_OPTIONS ('mergeSchema' = 'true')")
    with pytest.raises(SqlDmlError, match="cannot parse clause"):
        sql_dml(spark, stmt + " BOGUS CLAUSE")
