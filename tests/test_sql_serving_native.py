"""Read-optimized SQL serving (core/sql_serving._native_register): eligible
txlog snapshots serve through a NATIVE parquet relation over a symlink
manifest; commits refresh it in-process, ineligible snapshots fall back to
the Python Data Source and flip back when eligibility returns; DML by name
keeps routing to the transactional writers via TBLPROPERTIES."""

import pytest

from cdk_datalake_analytics_comercial_spark.core.sql_dml import (
    sql_dml,
    txlog_table_path,
)
from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
    register_txlog_table,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def _provider(spark, fq):
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect()
    return next(
        str(r.data_type)
        for r in rows
        if r.col_name in ("Provider", "Name") and r.data_type
    )


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        p,
        stats_for=["id"],
    )
    return p


def test_native_registration_serves_snapshot(spark, table):
    fq = register_txlog_table(
        spark, "natdb", "t1", table, read_optimized=True
    )
    assert _provider(spark, fq) == "parquet"
    got = {tuple(r) for r in spark.sql(f"SELECT id, v FROM {fq}").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # env kill-switch forces the Python source
    import os

    os.environ["SPARK_GRAFT_SQL_NATIVE"] = "0"
    try:
        fq2 = register_txlog_table(
            spark, "natdb", "t1_off", table, read_optimized=True
        )
        assert _provider(spark, fq2).startswith("txlog")
    finally:
        del os.environ["SPARK_GRAFT_SQL_NATIVE"]


def test_commit_refreshes_native_table(spark, table):
    fq = register_txlog_table(
        spark, "natdb", "t2", table, read_optimized=True
    )
    # a direct writer-API commit is visible to the NEXT SELECT with no
    # re-registration (post-commit listener swaps the manifest)
    TX.tx_write(
        spark,
        spark.createDataFrame([(4, "d")], "id long, v string"),
        table,
        mode="append",
    )
    assert {r.id for r in spark.sql(f"SELECT id FROM {fq}").collect()} == {
        1,
        2,
        3,
        4,
    }


def test_dml_routes_and_refreshes(spark, table):
    fq = register_txlog_table(
        spark, "natdb", "t3", table, read_optimized=True
    )
    assert txlog_table_path(spark, fq) == (table, {})
    v0 = TX.current_version(spark, table)
    sql_dml(spark, f"DELETE FROM {fq} WHERE id = 2")
    assert TX.current_version(spark, table) == v0 + 1  # routed, one commit
    assert {r.id for r in spark.sql(f"SELECT id FROM {fq}").collect()} == {
        1,
        3,
    }


def test_dv_flip_to_python_and_back(spark, table):
    fq = register_txlog_table(
        spark, "natdb", "t4", table, read_optimized=True
    )
    TX.tx_delete(spark, table, where={"id": (2, 2)}, use_dv=True)
    assert _provider(spark, fq).startswith("txlog")  # DVs: Python source
    assert {r.id for r in spark.sql(f"SELECT id FROM {fq}").collect()} == {
        1,
        3,
    }
    TX.tx_compact(spark, table, n_files=1)  # DVs materialize away
    assert _provider(spark, fq) == "parquet"
    assert {r.id for r in spark.sql(f"SELECT id FROM {fq}").collect()} == {
        1,
        3,
    }


def test_schema_evolution_recreates_native_entry(spark, table):
    fq = register_txlog_table(
        spark, "natdb", "t5", table, read_optimized=True
    )
    sql_dml(spark, f"ALTER TABLE {fq} ADD COLUMN extra STRING")
    assert spark.sql(f"SELECT * FROM {fq}").columns == ["id", "v", "extra"]
    assert {r.extra for r in spark.sql(f"SELECT extra FROM {fq}").collect()} == {
        None
    }


def test_partitioned_native_table(spark, tmp_path):
    p = str(tmp_path / "tp")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "en"), (2, "de")], "id long, lang string"
        ),
        p,
        partition_by=["lang"],
    )
    fq = register_txlog_table(spark, "natdb", "tp", p, read_optimized=True)
    assert _provider(spark, fq) == "parquet"
    got = {tuple(r) for r in spark.sql(f"SELECT id, lang FROM {fq}").collect()}
    assert got == {(1, "en"), (2, "de")}
    # a new partition value appears after an append (MSCK SYNC on refresh)
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "fr")], "id long, lang string"),
        p,
        mode="append",
        partition_by=["lang"],
    )
    assert {r.lang for r in spark.sql(f"SELECT lang FROM {fq}").collect()} == {
        "en",
        "de",
        "fr",
    }


def test_time_travel_frozen_twin_is_native(spark, table):
    register_txlog_table(spark, "natdb", "t6", table, read_optimized=True)
    TX.tx_write(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string"),
        table,
        mode="append",
    )
    out = sql_dml(spark, "SELECT id FROM natdb.t6 VERSION AS OF 1")
    assert {r.id for r in out.collect()} == {1, 2, 3}
    assert _provider(spark, "natdb.t6__asof_v1") == "parquet"


def test_native_matches_python_source_rows(spark, table):
    register_txlog_table(spark, "natdb", "t7n", table, read_optimized=True)
    register_txlog_table(spark, "natdb", "t7p", table)
    a = {tuple(r) for r in spark.sql("SELECT * FROM natdb.t7n").collect()}
    b = {tuple(r) for r in spark.sql("SELECT * FROM natdb.t7p").collect()}
    assert a == b and a
