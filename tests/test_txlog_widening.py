"""ALTER COLUMN TYPE widening (Delta's type-widening table feature):
metadata-only commit, zero files moved; old files keep their narrow
physical type and readers cast at scan time; time travel serves each
version's own type; lossy changes refuse; protocol-gated reader+writer."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core.sql_dml import sql_dml
from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
    register_txlog_table,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _files(spark, p):
    cur = TX.current_version(spark, p)
    return sorted(f["path"] for f in TX.read_manifest(spark, p, cur)["files"])


def test_widen_int_to_long_metadata_only(spark, tmp_path):
    p = str(tmp_path / "w1")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, n int"),
        p,
        stats_for=["n"],
    )
    before = _files(spark, p)
    TX.tx_widen_column(spark, p, "n", "bigint")
    assert _files(spark, p) == before  # ZERO files rewritten
    got = TX.tx_read(spark, p)
    assert dict(got.dtypes)["n"] == "bigint"
    assert rows(got) == [(1, 10), (2, 20)]
    # appends land with the WIDE type; reads mix narrow+wide files
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(3, 2**40)], "k long, n long"
        ),
        p,
        mode="append",
    )
    got = TX.tx_read(spark, p)
    assert rows(got) == [(1, 10), (2, 20), (3, 2**40)]
    # stats-range DML still prunes/applies across mixed-width files
    TX.tx_delete(spark, p, where={"n": (15, 25)}, condition="n BETWEEN 15 AND 25")
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (3,)]
    # time travel BEFORE the widening serves the narrow type
    old = TX.tx_read(spark, p, version=1)
    assert dict(old.dtypes)["n"] == "int"
    # protocol gates old readers AND writers
    proto = TX.tx_protocol(spark, p)
    assert TX.FEATURE_TYPE_WIDENING in proto["reader_features"]
    assert TX.FEATURE_TYPE_WIDENING in proto["writer_features"]


def test_widen_refusals(spark, tmp_path):
    p = str(tmp_path / "w2")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, 1.5, "x")], "k long, f float, s string"
        ).select(
            "k", F.col("f").cast("float").alias("f"),
            "s", F.lit(1).cast("decimal(10,2)").alias("d"),
        ),
        p,
    )
    with pytest.raises(ValueError, match="not a lossless widening"):
        TX.tx_widen_column(spark, p, "k", "int")  # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        TX.tx_widen_column(spark, p, "s", "bigint")  # cross-family
    with pytest.raises(ValueError, match="not a lossless widening"):
        TX.tx_widen_column(spark, p, "d", "decimal(12,4)")  # scale change
    with pytest.raises(ValueError, match="already has type"):
        TX.tx_widen_column(spark, p, "k", "bigint")
    with pytest.raises(ValueError, match="no column"):
        TX.tx_widen_column(spark, p, "zz", "bigint")
    with pytest.raises(ValueError, match="cannot parse type"):
        TX.tx_widen_column(spark, p, "k", "wat(3)")
    # the allowed ones on this table
    TX.tx_widen_column(spark, p, "f", "double")
    TX.tx_widen_column(spark, p, "d", "decimal(14,2)")
    dt = dict(TX.tx_read(spark, p).dtypes)
    assert dt["f"] == "double" and dt["d"] == "decimal(14,2)"
    assert rows(TX.tx_read(spark, p).select("k", "f")) == [(1, 1.5)]
    # long -> double is LOSSY (> 2^53) and refuses; int -> double is exact
    with pytest.raises(ValueError, match="not a lossless widening"):
        TX.tx_widen_column(spark, p, "k", "double")


def test_widen_int_to_double(spark, tmp_path):
    p = str(tmp_path / "w4")
    TX.tx_write(
        spark, spark.createDataFrame([(1, 7)], "k long, n int"), p
    )
    TX.tx_widen_column(spark, p, "n", "double")
    got = TX.tx_read(spark, p)
    assert dict(got.dtypes)["n"] == "double"
    assert rows(got) == [(1, 7.0)]


def test_sql_alter_column_type(spark, tmp_path):
    p = str(tmp_path / "w3")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, 7)], "k long, n int"),
        p,
    )
    register_txlog_table(spark, "widb", "t", p)
    v = sql_dml(spark, "ALTER TABLE widb.t ALTER COLUMN n TYPE BIGINT")
    assert isinstance(v, int)
    # re-registered: SELECT by name serves the widened type immediately
    assert dict(spark.table("widb.t").dtypes)["n"] == "bigint"
    sql_dml(spark, "INSERT INTO widb.t SELECT 2, CAST(4294967296 AS BIGINT)")
    assert rows(spark.sql("SELECT k, n FROM widb.t")) == [
        (1, 7), (2, 4294967296),
    ]
    with pytest.raises(ValueError, match="not a lossless"):
        sql_dml(spark, "ALTER TABLE widb.t ALTER COLUMN n TYPE INT")
