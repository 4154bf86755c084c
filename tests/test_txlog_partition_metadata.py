"""Partition columns as TABLE metadata (Delta records partitionColumns
in table metadata; the writer never chooses). Before this, every DML
rewrite / MERGE / OPTIMIZE that didn't explicitly re-pass partition_by
wrote its output files UNPARTITIONED into a hive-partitioned table —
those files then escaped dynamic-overwrite remove sets (stale rows
surviving an INSERT OVERWRITE) and partition pruning, and a TRUNCATE
(zero files left) erased the only place the layout could be derived
from. Now the layout is a carried-forward manifest property recorded by
partitioned writes and inherited by every rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core.sql_dml import sql_dml
from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
    register_txlog_table,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def _mk(spark, tmp_path, name="pt"):
    p = str(tmp_path / name)
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}", i % 3) for i in range(12)],
            "id long, v string, g long",
        ),
        p,
        partition_by=["g"],
    )
    return p


def _file_partitions(spark, p):
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    return [dict(f.get("partition") or {}) for f in m["files"]]


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_partitioned_write_records_table_metadata(spark, tmp_path):
    p = _mk(spark, tmp_path)
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    assert TX.table_partition_columns(m) == ["g"]
    assert m["properties"].get("partitionColumns") == "g"


def test_dml_rewrite_inherits_layout(spark, tmp_path):
    """tx_delete/tx_update WITHOUT partition_by must keep rewritten
    files inside the hive layout — every manifest entry stays keyed by
    its partition dict."""
    p = _mk(spark, tmp_path)
    TX.tx_delete(spark, p, where_equals={"id": 4})
    TX.tx_update(
        spark, p, assignments={"v": F.upper(F.col("v"))},
        where={"id": (0, 2)},
    )
    assert all(pt.get("g") is not None for pt in _file_partitions(spark, p))
    got = rows(TX.tx_read(spark, p).select("id", "v"))
    assert (4, "v4") not in got and ("V1" in {v for _, v in got})


def test_merge_without_partition_by_keeps_layout(spark, tmp_path):
    p = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "upd", 1), (100, "ins", 1)], "id long, v string, g long"
    )
    TX.tx_merge(spark, src, p, keys=["id"])
    assert all(pt.get("g") is not None for pt in _file_partitions(spark, p))
    got = dict(
        (r.id, r.v) for r in TX.tx_read(spark, p).select("id", "v").collect()
    )
    assert got[1] == "upd" and got[100] == "ins" and got[2] == "v2"


def test_optimize_by_name_keeps_layout(spark, tmp_path):
    p = _mk(spark, tmp_path)
    # several small appends to give OPTIMIZE something to pack
    for i in (20, 21):
        TX.tx_write(
            spark,
            spark.createDataFrame([(i, f"v{i}", i % 3)], "id long, v string, g long"),
            p,
            mode="append",
        )
    register_txlog_table(spark, "pmdb", "opt", p)
    sql_dml(spark, "OPTIMIZE pmdb.opt")
    assert all(pt.get("g") is not None for pt in _file_partitions(spark, p))
    assert TX.tx_read(spark, p).count() == 14


def test_sql_dml_then_dynamic_overwrite_no_stale_rows(spark, tmp_path):
    """THE advice scenario: a SQL DELETE used to rewrite affected files
    unpartitioned (manifest partition={}), so a later INSERT OVERWRITE's
    dynamic remove set — keyed on the partition dict — never removed
    them and the overwritten partition's stale rows survived as
    duplicates."""
    p = _mk(spark, tmp_path)
    register_txlog_table(spark, "pmdb", "t", p)
    # forces a rewrite of every file that can contain id=7 (g=1 rows)
    sql_dml(spark, "DELETE FROM pmdb.t WHERE id = 7")
    # dynamic overwrite of partition g=1: ALL prior g=1 rows must go
    sql_dml(
        spark,
        "INSERT OVERWRITE pmdb.t "
        "SELECT CAST(1000 AS BIGINT), 'fresh', CAST(1 AS BIGINT)",
    )
    got = rows(spark.sql("SELECT id, v, g FROM pmdb.t WHERE g = 1"))
    assert got == [(1000, "fresh", 1)], got
    # other partitions untouched
    assert spark.sql("SELECT count(*) AS n FROM pmdb.t WHERE g = 0").collect()[0].n == 4


def test_truncate_then_insert_keeps_partitioning(spark, tmp_path):
    """TRUNCATE leaves zero files; the layout must survive as metadata
    so the next INSERT still writes hive-partitioned files."""
    p = _mk(spark, tmp_path)
    register_txlog_table(spark, "pmdb", "tr", p)
    sql_dml(spark, "TRUNCATE TABLE pmdb.tr")
    assert spark.sql("SELECT * FROM pmdb.tr").count() == 0
    sql_dml(
        spark,
        "INSERT INTO pmdb.tr SELECT CAST(1 AS BIGINT), 'a', CAST(2 AS BIGINT)",
    )
    parts = _file_partitions(spark, p)
    assert parts and all(pt.get("g") is not None for pt in parts), parts
    # and a dynamic overwrite right after TRUNCATE+INSERT still works
    sql_dml(
        spark,
        "INSERT OVERWRITE pmdb.tr SELECT CAST(2 AS BIGINT), 'b', CAST(2 AS BIGINT)",
    )
    assert rows(spark.sql("SELECT id, v, g FROM pmdb.tr")) == [(2, "b", 2)]


def test_append_layout_mismatch_refused(spark, tmp_path):
    p = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="partition columns"):
        TX.tx_write(
            spark,
            spark.createDataFrame([(50, "x", 0)], "id long, v string, g long"),
            p,
            mode="append",
            partition_by=["v"],
        )
    # matching explicit spec is fine
    TX.tx_write(
        spark,
        spark.createDataFrame([(50, "x", 0)], "id long, v string, g long"),
        p,
        mode="append",
        partition_by=["g"],
    )
    # a full overwrite may REDEFINE the layout (here: unpartition)
    TX.tx_write(
        spark,
        spark.createDataFrame([(60, "y", 9)], "id long, v string, g long"),
        p,
        mode="overwrite",
        partition_by=[],
    )
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    assert TX.table_partition_columns(m) == []
    assert all(pt == {} for pt in _file_partitions(spark, p))


def test_legacy_table_heals_on_next_commit(spark, tmp_path):
    """Tables written before the property existed derive the layout from
    file paths; the first new commit records it durably."""
    p = str(tmp_path / "legacy")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, 0), (2, 1)], "id long, g long"),
        p,
        partition_by=["g"],
    )
    # simulate a legacy table: strip the property via a raw unset
    TX.tx_set_properties(spark, p, {"partitionColumns": None})
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    assert "partitionColumns" not in m["properties"]
    assert TX.table_partition_columns(m) == ["g"]  # file-derived fallback
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, 2)], "id long, g long"),
        p,
        mode="append",
    )
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    assert m["properties"].get("partitionColumns") == "g"  # healed
    assert all(pt.get("g") is not None for pt in _file_partitions(spark, p))
