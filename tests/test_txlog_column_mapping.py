"""Column mapping (Delta columnMapping name-mode twin): RENAME and DROP
are metadata-only commits — zero data files rewritten — with immutable
physical names inside files. Public predicates/keys/columns stay logical;
time travel reads each version through its own schema record; a re-added
logical name can never resurrect a dropped column's dormant data."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _files(spark, p):
    cur = TX.current_version(spark, p)
    return sorted(f["path"] for f in TX.read_manifest(spark, p, cur)["files"])


def _mk(spark, tmp_path, name="t"):
    p = str(tmp_path / name)
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, v string, amt long"
        ),
        p,
        stats_for=["k"],
    )
    return p


def test_rename_is_metadata_only_and_time_travel_keeps_old_name(
    spark, tmp_path
):
    p = _mk(spark, tmp_path)
    before = _files(spark, p)
    TX.tx_rename_column(spark, p, "v", "label")
    assert _files(spark, p) == before  # ZERO files rewritten
    got = TX.tx_read(spark, p)
    assert got.columns == ["k", "label", "amt"]
    assert rows(got) == [(1, "a", 10), (2, "b", 20)]
    # time travel to v1 shows the ORIGINAL name (schema is per-version)
    old = TX.tx_read(spark, p, version=1)
    assert old.columns == ["k", "v", "amt"]
    proto = TX.tx_protocol(spark, p)
    assert TX.FEATURE_COLUMN_MAPPING in proto["reader_features"]
    assert TX.FEATURE_COLUMN_MAPPING in proto["writer_features"]


def test_rename_collision_and_missing_column_refused(spark, tmp_path):
    p = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        TX.tx_rename_column(spark, p, "v", "k")
    with pytest.raises(ValueError, match="no column"):
        TX.tx_rename_column(spark, p, "nope", "x")


def test_append_and_filters_after_rename(spark, tmp_path):
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "k", "id")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(3, "c", 30)], "id long, label string, amt long"
        ).withColumnRenamed("label", "v"),
        p,
        mode="append",
        stats_for=["id"],
    )
    got = TX.tx_read(spark, p, where={"id": (2, 3)})
    assert rows(got.select("id", "amt")) == [(2, 20), (3, 30)]
    # stats pruning still keys on the physical name underneath — the
    # logical predicate must not silently stop matching
    assert rows(TX.tx_read(spark, p, where={"id": (3, 3)}).select("v")) == [
        ("c",)
    ]


def test_merge_after_rename_without_rewriting_files(spark, tmp_path):
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "v", "label")
    TX.tx_merge(
        spark,
        spark.createDataFrame(
            [(2, "B", 99), (4, "d", 40)], "k long, label string, amt long"
        ),
        p,
        keys=["k"],
    )
    assert rows(TX.tx_read(spark, p)) == [
        (1, "a", 10),
        (2, "B", 99),
        (4, "d", 40),
    ]
    # DV merge too: only winners move
    TX.tx_merge(
        spark,
        spark.createDataFrame([(4, "D", 44)], "k long, label string, amt long"),
        p,
        keys=["k"],
        use_dv=True,
    )
    assert rows(TX.tx_read(spark, p)) == [
        (1, "a", 10),
        (2, "B", 99),
        (4, "D", 44),
    ]


def test_merge_partitioned_mapped_table(spark, tmp_path):
    p = str(tmp_path / "pt")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "us", 10), (2, "eu", 20)], "k long, region string, amt long"
        ),
        p,
        partition_by=["region"],
    )
    TX.tx_rename_column(spark, p, "region", "geo")
    us_files_before = [
        f["path"]
        for f in TX.read_manifest(spark, p, TX.current_version(spark, p))["files"]
        if "region=us" in f["path"]
    ]
    TX.tx_merge(
        spark,
        spark.createDataFrame([(2, "eu", 99)], "k long, geo string, amt long"),
        p,
        keys=["k"],
        partition_by=["geo"],
    )
    assert rows(TX.tx_read(spark, p).select("k", "geo", "amt")) == [
        (1, "us", 10),
        (2, "eu", 99),
    ]
    # the untouched us partition was carried by reference
    us_files_after = [
        f["path"]
        for f in TX.read_manifest(spark, p, TX.current_version(spark, p))["files"]
        if "region=us" in f["path"]
    ]
    assert us_files_after == us_files_before


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    p = _mk(spark, tmp_path)
    TX.tx_drop_column(spark, p, "v")
    assert TX.tx_read(spark, p).columns == ["k", "amt"]
    # re-add the same logical name: fresh physical id → old rows NULL
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, 30, "NEW")], "k long, amt long, v string"),
        p,
        mode="append",
        schema_evolution=True,
    )
    got = rows(TX.tx_read(spark, p).select("k", "v"))
    assert got == [(1, None), (2, None), (3, "NEW")]


def test_delete_and_update_on_renamed_column(spark, tmp_path):
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "k", "id")
    TX.tx_update(
        spark,
        p,
        where={"id": (2, 2)},
        assignments={"amt": F.lit(999)},
    )
    assert rows(TX.tx_read(spark, p).select("id", "amt")) == [
        (1, 10),
        (2, 999),
    ]
    TX.tx_delete(spark, p, where={"id": (1, 1)})
    assert rows(TX.tx_read(spark, p).select("id")) == [(2,)]
    # DV paths too
    TX.tx_write(
        spark,
        spark.createDataFrame([(5, "e", 50)], "id long, v string, amt long"),
        p,
        mode="append",
    )
    TX.tx_delete(spark, p, where={"id": (5, 5)}, use_dv=True)
    assert rows(TX.tx_read(spark, p).select("id")) == [(2,)]


def test_old_reader_refuses_mapped_table(spark, tmp_path, monkeypatch):
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "v", "label")
    monkeypatch.setattr(
        TX,
        "SUPPORTED_READER_FEATURES",
        TX.SUPPORTED_READER_FEATURES - {TX.FEATURE_COLUMN_MAPPING},
    )
    with pytest.raises(TX.TxProtocolError, match="column-mapping"):
        TX.tx_read(spark, p)


def test_full_compaction_materializes_renames(spark, tmp_path):
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "v", "label")
    TX.tx_compact(spark, p, n_files=1)
    got = TX.tx_read(spark, p)
    assert got.columns == ["k", "label", "amt"]
    assert rows(got) == [(1, "a", 10), (2, "b", 20)]
    # the mapping is identity again (renames baked into the files)
    cur = TX.current_version(spark, p)
    m = TX._schema_mapping(TX.read_manifest(spark, p, cur)["schema"])
    assert TX._mapping_is_identity(m)


def test_streaming_source_serves_mapped_table_logical_names(spark, tmp_path):
    """Since round 9 the file-based readers resolve the logical→physical
    column mapping per field, so mapped tables stream and batch-read
    under their LOGICAL names (they used to refuse)."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        register_txlog_source,
        stream_txlog,
    )

    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "v", "label")
    assert stream_txlog(spark, p).schema.names == ["k", "label", "amt"]
    register_txlog_source(spark)
    got = spark.read.format("txlog").load(p)
    assert got.columns == ["k", "label", "amt"]
    assert rows(got) == rows(TX.tx_read(spark, p))
    # initial streaming snapshot row-identical to tx_read
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = (
        stream_txlog(spark, p)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert rows(spark.read.parquet(out)) == rows(TX.tx_read(spark, p))


def test_sql_serving_mapped_table_and_rename_reregister(spark, tmp_path):
    """A mapped table registered by name serves logical columns; after a
    further RENAME, re-registration refreshes the served names (the SQL
    schema is CREATE-time, the column mapping is injected from the
    current manifest at every scan)."""
    from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
        register_txlog_table,
    )

    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "v", "label")
    register_txlog_table(spark, "mapdb", "t", p)
    assert {
        tuple(r) for r in spark.sql("SELECT k, label FROM mapdb.t").collect()
    } == {(1, "a"), (2, "b")}
    TX.tx_rename_column(spark, p, "label", "etiqueta")
    register_txlog_table(spark, "mapdb", "t", p)
    assert {
        tuple(r)
        for r in spark.sql("SELECT k, etiqueta FROM mapdb.t").collect()
    } == {(1, "a"), (2, "b")}


def test_cdf_drain_consumes_mapped_table(spark, tmp_path):
    from cdk_datalake_analytics_comercial_spark.streaming.cdf import drain_cdf

    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "amt", "value")
    sink = str(tmp_path / "sink")

    def fold(changes, state):
        inc = changes.groupBy().agg(F.sum("value").alias("total"))
        if state is None:
            return inc
        return (
            state.unionByName(inc).groupBy().agg(F.sum("total").alias("total"))
        )

    drain_cdf(spark, p, sink, fold, ["k"])
    assert rows(TX.tx_read(spark, sink)) == [(30,)]
    TX.tx_write(
        spark,
        spark.createDataFrame([(7, "g", 70)], "k long, v string, value long"),
        p,
        mode="append",
    )
    drain_cdf(spark, p, sink, fold, ["k"])
    assert rows(TX.tx_read(spark, sink)) == [(100,)]


def test_constraint_added_after_rename_enforced_on_dml(spark, tmp_path):
    """A CHECK constraint added AFTER a rename references the NEW logical
    name; DML enforcement must bind it on the logical projection of the
    rewritten rows (the physical frame has no such column — enforcement
    there raised AnalysisException on perfectly valid data)."""
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "amt", "amount")
    TX.tx_add_constraint(spark, p, "amount_pos", "amount > 0")
    # valid update passes on both the rewrite and the DV path
    TX.tx_update(
        spark, p, where={"k": (1, 1)}, assignments={"amount": F.lit(11)}
    )
    TX.tx_update(
        spark,
        p,
        where={"k": (2, 2)},
        assignments={"amount": F.lit(22)},
        use_dv=True,
    )
    assert rows(TX.tx_read(spark, p).select("k", "amount")) == [
        (1, 11),
        (2, 22),
    ]
    # violating post-images refuse on both paths, nothing committed
    with pytest.raises(TX.TxCheckViolation, match="amount_pos"):
        TX.tx_update(
            spark, p, where={"k": (1, 1)}, assignments={"amount": F.lit(-5)}
        )
    with pytest.raises(TX.TxCheckViolation, match="amount_pos"):
        TX.tx_update(
            spark,
            p,
            where={"k": (2, 2)},
            assignments={"amount": F.lit(-5)},
            use_dv=True,
        )
    assert rows(TX.tx_read(spark, p).select("k", "amount")) == [
        (1, 11),
        (2, 22),
    ]


def test_constraint_never_binds_dormant_physical_name(spark, tmp_path):
    """Rename k->id, then evolve a NEW logical column named k (fresh
    physical id, old rows NULL). A constraint on the new k must validate
    the NEW column — enforcement on the physical frame would silently bind
    the name 'k' to logical id's data (the dormant physical name)."""
    p = _mk(spark, tmp_path)
    TX.tx_rename_column(spark, p, "k", "id")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(7, "g", 70, 1000)], "id long, v string, amt long, k long"
        ),
        p,
        mode="append",
        schema_evolution=True,
    )
    # new logical k: NULL on old rows, 1000 on the new one; logical id
    # holds 1, 2, 7 — an expr binding the dormant physical 'k' would see
    # those small values and reject this valid update
    TX.tx_add_constraint(spark, p, "k_big", "k IS NULL OR k >= 1000")
    TX.tx_update(
        spark, p, where={"id": (7, 7)}, assignments={"amt": F.lit(71)}
    )
    assert rows(TX.tx_read(spark, p).select("id", "amt", "k")) == [
        (1, 10, None),
        (2, 20, None),
        (7, 71, 1000),
    ]
    # and a genuinely violating write on the new column still refuses
    with pytest.raises(TX.TxCheckViolation, match="k_big"):
        TX.tx_update(
            spark, p, where={"id": (7, 7)}, assignments={"k": F.lit(5)},
            use_dv=True,
        )


def test_add_column_metadata_only(spark, tmp_path):
    """ALTER TABLE ADD COLUMN twin: one metadata commit, zero files
    moved; old files null-pad the new column, later appends populate it,
    time travel shows the pre-add schema."""
    p = str(tmp_path / "t")
    TX.tx_write(spark, spark.createDataFrame([(1, "a")], "id long, v string"), p)
    v1 = TX.current_version(spark, p)
    files_before = TX.read_manifest(spark, p, v1)["files"]
    TX.tx_add_column(spark, p, "score", "double")
    v2 = TX.current_version(spark, p)
    assert v2 == v1 + 1
    assert TX.read_manifest(spark, p, v2)["files"] == files_before  # no data moved
    got = TX.tx_read(spark, p).collect()
    assert [(r.id, r.v, r.score) for r in got] == [(1, "a", None)]
    TX.tx_write(
        spark,
        spark.createDataFrame([(2, "b", 0.5)], "id long, v string, score double"),
        p,
        mode="append",
    )
    rows = {(r.id, r.score) for r in TX.tx_read(spark, p).collect()}
    assert rows == {(1, None), (2, 0.5)}
    # time travel: pre-add schema has no 'score'
    assert "score" not in TX.tx_read(spark, p, version=v1).columns
    # duplicate add refused; NOT NULL add on non-empty refused
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        TX.tx_add_column(spark, p, "score", "double")
    with pytest.raises(ValueError, match="NOT NULL"):
        TX.tx_add_column(spark, p, "req", "long", nullable=False)


def test_add_column_never_resurrects_dropped_data(spark, tmp_path):
    """Dropping a column leaves its data dormant; re-adding the same
    logical name on the (now mapped) table stamps a FRESH physical id,
    so the old values stay invisible."""
    p = str(tmp_path / "t")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "secret")], "id long, note string"), p
    )
    TX.tx_drop_column(spark, p, "note")  # activates column mapping
    TX.tx_add_column(spark, p, "note", "string")
    got = TX.tx_read(spark, p).collect()
    assert [(r.id, r.note) for r in got] == [(1, None)], "dropped data resurrected!"
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    import json as _json

    fld = [f for f in _json.loads(m["schema"])["fields"] if f["name"] == "note"][0]
    assert fld["metadata"]["txlog_physical"].startswith("col-")  # fresh id


def test_add_column_visible_through_sql_face(spark, tmp_path):
    """The SQL serving path sees the added column after re-registration
    (catalog tables pin their CREATE-time schema) and null-pads it for
    pre-add files."""
    from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
        register_txlog_table,
    )

    p = str(tmp_path / "t")
    TX.tx_write(spark, spark.createDataFrame([(1, "a")], "id long, v string"), p)
    TX.tx_add_column(spark, p, "score", "double")
    register_txlog_table(spark, "addcoldb", "t", p)
    assert [tuple(r) for r in spark.sql(
        "SELECT id, v, score FROM addcoldb.t"
    ).collect()] == [(1, "a", None)]


def test_add_column_then_default_composes(spark, tmp_path):
    """ALTER TABLE ADD COLUMN then SET DEFAULT (the Delta evolution
    recipe): pre-add rows stay null (standard SQL semantic), writes that
    omit the column get the default, explicit values win."""
    p = str(tmp_path / "t")
    TX.tx_write(spark, spark.createDataFrame([(1,)], "id long"), p)
    TX.tx_add_column(spark, p, "tier", "string")
    TX.tx_set_default(spark, p, "tier", "'std'")
    TX.tx_write(
        spark, spark.createDataFrame([(2,)], "id long"), p, mode="append"
    )  # omits tier -> default
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "vip")], "id long, tier string"),
        p,
        mode="append",
    )  # explicit wins
    got = {(r.id, r.tier) for r in TX.tx_read(spark, p).collect()}
    assert got == {(1, None), (2, "std"), (3, "vip")}
