"""Name-based SQL serving surface (Athena-catalog twin): one database per
layer, external parquet tables with partition recovery, txlog tables
through the Python Data Source batch reader, multi-instance union views,
and the domain→analytics by-name chain (CTAS) the reference's consumers
run (`stacks/cdk_datalake_analytics_stack.py:483-522`)."""

import os

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core.catalog import Catalog
from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
    register_parquet_table,
    register_sql,
    register_sql_dir,
    register_txlog_table,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


@pytest.fixture()
def lake_fs(spark, tmp_path):
    """A small lake: partitioned parquet in domain, flat parquet in
    analytics, a txlog table in domain, a two-instance stage table with
    schema drift."""
    root = str(tmp_path / "lake")
    cat = Catalog(root=root)
    spark.createDataFrame(
        [(1, "a", "202401"), (2, "b", "202401"), (3, "c", "202402")],
        "id long, v string, id_periodo string",
    ).write.partitionBy("id_periodo").parquet(f"{root}/domain/t_venta")
    spark.createDataFrame(
        [(10, 99.5), (20, 1.25)], "fact_id long, amount double"
    ).write.parquet(f"{root}/analytics/fact_venta_detalle")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, "PE"), (2, "CL")], "pais_id long, iso string"),
        f"{root}/domain/m_pais",
    )
    spark.createDataFrame([(1, 5)], "k long, ep1_only int").write.parquet(
        f"{root}/stage/m_cliente/ep1"
    )
    spark.createDataFrame([(2,)], "k long").write.parquet(
        f"{root}/stage/m_cliente/ep2"
    )
    return cat


def test_register_sql_per_layer_databases(spark, lake_fs):
    reg = register_sql(spark, lake_fs, db_prefix="s1_")
    assert set(reg) == {"s1_domain", "s1_analytics", "s1_stage"}
    assert "s1_domain.t_venta" in reg["s1_domain"]
    assert "s1_domain.m_pais" in reg["s1_domain"]
    # name-addressable, partition columns recovered with values
    got = {
        (r["id"], r["id_periodo"])
        for r in spark.sql("SELECT id, id_periodo FROM s1_domain.t_venta").collect()
    }
    assert got == {(1, "202401"), (2, "202401"), (3, "202402")}
    assert spark.sql("SELECT count(*) c FROM s1_analytics.fact_venta_detalle").collect()[0]["c"] == 2


def test_sql_txlog_table_serves_current_snapshot(spark, lake_fs):
    register_sql(spark, lake_fs, db_prefix="s2_")
    assert {
        r["iso"] for r in spark.sql("SELECT iso FROM s2_domain.m_pais").collect()
    } == {"PE", "CL"}
    # a new commit is visible WITHOUT re-registration (snapshot resolved
    # per query plan — the raw-parquet stale-batch trap cannot happen)
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "AR")], "pais_id long, iso string"),
        lake_fs.table_path("domain", "m_pais"),
        mode="append",
    )
    assert {
        r["iso"] for r in spark.sql("SELECT iso FROM s2_domain.m_pais").collect()
    } == {"PE", "CL", "AR"}
    # a DV soft delete is honored by the SQL read
    TX.tx_delete(
        spark,
        lake_fs.table_path("domain", "m_pais"),
        where={"pais_id": (2, 2)},
        use_dv=True,
    )
    assert {
        r["iso"] for r in spark.sql("SELECT iso FROM s2_domain.m_pais").collect()
    } == {"PE", "AR"}


def test_stage_union_view_null_pads_by_name(spark, lake_fs):
    register_sql(spark, lake_fs, db_prefix="s3_")
    rows = {
        (r["k"], r["ep1_only"])
        for r in spark.sql("SELECT k, ep1_only FROM s3_stage.m_cliente").collect()
    }
    assert rows == {(1, 5), (2, None)}
    # per-instance tables also addressable
    assert spark.sql("SELECT count(*) c FROM s3_stage.m_cliente__ep2").collect()[0]["c"] == 1


def test_domain_to_analytics_chain_by_name(spark, lake_fs, tmp_path):
    """The reference's consumption chain: analytics tables are DEFINED in
    SQL over domain names (CTAS), then queried by name."""
    register_sql(spark, lake_fs, db_prefix="s4_")
    loc = str(tmp_path / "lake/analytics/agg_venta")
    spark.sql("DROP TABLE IF EXISTS s4_analytics.agg_venta")
    spark.sql(f"""
        CREATE TABLE s4_analytics.agg_venta USING parquet LOCATION '{loc}'
        AS SELECT id_periodo, CAST(count(*) AS BIGINT) AS n
        FROM s4_domain.t_venta GROUP BY id_periodo
    """)
    got = {
        (r["id_periodo"], r["n"])
        for r in spark.sql(
            "SELECT v.id_periodo, a.n FROM s4_domain.t_venta v "
            "JOIN s4_analytics.agg_venta a USING (id_periodo) "
            "WHERE v.id = 1"
        ).collect()
    }
    assert got == {("202401", 2)}
    # the CTAS landed in the lake: re-registration picks it up as a table
    reg = register_sql(spark, lake_fs, db_prefix="s4b_")
    assert "s4b_analytics.agg_venta" in reg["s4b_analytics"]


def test_register_sql_dir_testdata(spark):
    sf = "/root/testdata/sf0.001"
    names = register_sql_dir(spark, sf, "tdx")
    assert "tdx.region" in names and "tdx.lineitem" in names
    n = spark.sql(
        "SELECT count(*) c FROM tdx.nation JOIN tdx.region "
        "ON n_regionkey = r_regionkey"
    ).collect()[0]["c"]
    assert n == 25


def test_sql_query_matches_dataframe_twin(spark):
    """sql_regional_supplier_volume (pure spark.sql over registered
    names) returns exactly the DataFrame twin's rows."""
    from cdk_datalake_analytics_comercial_spark.plans.relational import (
        q_regional_supplier_volume,
        q_sql_regional_supplier_volume,
    )

    sf = "/root/testdata/sf0.001"
    a = {tuple(r) for r in q_regional_supplier_volume(spark, sf).collect()}
    b = {tuple(r) for r in q_sql_regional_supplier_volume(spark, sf).collect()}
    assert a == b and a


def test_registration_is_idempotent_and_external(spark, lake_fs):
    """Re-registering drops/recreates METADATA only; the data survives."""
    register_sql(spark, lake_fs, db_prefix="s5_")
    register_sql(spark, lake_fs, db_prefix="s5_")
    assert spark.sql("SELECT count(*) c FROM s5_domain.t_venta").collect()[0]["c"] == 3
    # dropping the table never deletes lake data (external semantics)
    spark.sql("DROP TABLE s5_domain.t_venta")
    p = lake_fs.table_path("domain", "t_venta")
    assert os.path.isdir(p) and any("id_periodo=" in e for e in os.listdir(p))
    register_parquet_table(spark, "s5_domain", "t_venta", p)
    assert spark.sql("SELECT count(*) c FROM s5_domain.t_venta").collect()[0]["c"] == 3


def test_txlog_batch_read_format(spark, tmp_path):
    """spark.read.format('txlog') — the DataFrame face of the same batch
    reader — matches tx_read, including partition columns and types."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        register_txlog_source,
    )

    p = str(tmp_path / "txb")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, part long"
        ),
        p,
        partition_by=["part"],
    )
    register_txlog_source(spark)
    got = spark.read.format("txlog").load(p)
    assert dict(got.dtypes) == dict(TX.tx_read(spark, p).dtypes)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in TX.tx_read(spark, p).collect()
    }
    # versionAsOf time travel through the batch reader
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "c", 9)], "id long, v string, part long"),
        p,
        mode="append",
        partition_by=["part"],
    )
    v1 = spark.read.format("txlog").option("versionAsOf", "1").load(p)
    assert v1.count() == 2 and spark.read.format("txlog").load(p).count() == 3


# ---------------------------------------------------------------------------
# SQL DML INTO txlog tables (INSERT INTO / INSERT OVERWRITE by name)


def test_sql_insert_into_txlog_table(spark, tmp_path):
    p = str(tmp_path / "ins")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), p
    )
    register_txlog_table(spark, "insdb", "t", p)
    v0 = TX.current_version(spark, p)
    spark.sql("INSERT INTO insdb.t VALUES (2, 'b'), (3, 'c')")
    assert TX.current_version(spark, p) == v0 + 1  # ONE atomic commit
    assert {tuple(r) for r in spark.sql("SELECT id, v FROM insdb.t").collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # the same rows through the native fast path + time travel intact
    assert TX.tx_read(spark, p).count() == 3
    assert TX.tx_read(spark, p, version=v0).count() == 1
    # INSERT OVERWRITE truncates in one commit (static mode: the dynamic
    # default plans OverwritePartitionsDynamic, inexpressible in the
    # Python Data Source API — see TxLogBatchWriter docstring)
    mode0 = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.sql("INSERT OVERWRITE insdb.t VALUES (9, 'z')")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode0)
    assert {tuple(r) for r in spark.sql("SELECT id, v FROM insdb.t").collect()} == {
        (9, "z"),
    }


def test_sql_insert_records_skipping_stats(spark, tmp_path):
    """SQL inserts must not strip the table's skipping index: files carry
    min/max for the declared dataSkippingColumns."""
    p = str(tmp_path / "insstats")
    TX.tx_write(
        spark, spark.createDataFrame([(5, "a")], "id long, v string"), p
    )
    TX.tx_set_properties(spark, p, {"dataSkippingColumns": "id"})
    register_txlog_table(spark, "insdb2", "t", p)
    spark.sql("INSERT INTO insdb2.t VALUES (100, 'x'), (200, 'y')")
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    new = [f for f in m["files"] if f["path"].split("/")[-1].startswith("sql-")]
    assert new and all("id" in (f.get("stats") or {}) for f in new)
    assert min(f["stats"]["id"]["min"] for f in new) == 100
    assert max(f["stats"]["id"]["max"] for f in new) == 200
    # and the skipping read proves the stats are live (file-pruned scan)
    assert TX.tx_read(spark, p, where={"id": (150, 300)}).count() == 1


def test_sql_insert_refuses_unenforceable_tables(spark, tmp_path):
    import pytest

    p = str(tmp_path / "insref")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), p
    )
    TX.tx_add_identity(spark, p, "id")
    register_txlog_table(spark, "insdb3", "t", p)
    with pytest.raises(Exception, match="identity columns"):
        spark.sql("INSERT INTO insdb3.t (v) VALUES ('b')")

    q = str(tmp_path / "inspart")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, "a", "p1")], "id long, v string, part string"),
        q,
        partition_by=["part"],
    )
    register_txlog_table(spark, "insdb3", "tp", q)
    with pytest.raises(Exception, match="hive-partitioned"):
        spark.sql("INSERT INTO insdb3.tp VALUES (2, 'b', 'p2')")


def test_sql_insert_races_tx_write_gapless(spark, tmp_path):
    """A SQL INSERT (whose commit runs in the Python Data Source worker
    process) racing a driver-side tx_write append goes through the SAME
    optimistic CAS: both land, versions stay gapless, no rows lost."""
    import threading

    p = str(tmp_path / "race")
    TX.tx_write(
        spark, spark.createDataFrame([(0, "seed")], "id long, v string"), p
    )
    register_txlog_table(spark, "racedb", "t", p)
    errs = []

    def sql_writer():
        try:
            for i in range(3):
                spark.sql(f"INSERT INTO racedb.t VALUES ({10 + i}, 'sql{i}')")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def py_writer():
        try:
            for i in range(3):
                TX.tx_write(
                    spark,
                    spark.createDataFrame(
                        [(20 + i, f"py{i}")], "id long, v string"
                    ),
                    p,
                    mode="append",
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=sql_writer), threading.Thread(target=py_writer)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    ids = sorted(r["id"] for r in TX.tx_read(spark, p).collect())
    assert ids == [0, 10, 11, 12, 20, 21, 22]
    vs = TX.list_versions(spark, p)
    assert vs == list(range(1, len(vs) + 1)), f"version gap: {vs}"
    # and the SQL face agrees
    assert spark.sql("SELECT count(*) c FROM racedb.t").collect()[0]["c"] == 7


def test_txlog_batch_read_timestamp_as_of(spark, tmp_path):
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        register_txlog_source,
    )

    p = str(tmp_path / "txts")
    TX.tx_write(spark, spark.createDataFrame([(1,)], "id long"), p)
    rec = TX.read_commit(spark, p, TX.current_version(spark, p))
    cut = (rec["ts_ms"] + 1) / 1000.0
    TX.tx_write(
        spark, spark.createDataFrame([(2,)], "id long"), p, mode="append"
    )
    register_txlog_source(spark)
    old = spark.read.format("txlog").option("timestampAsOf", str(cut)).load(p)
    assert [r["id"] for r in old.collect()] == [1]
    assert spark.read.format("txlog").load(p).count() == 2
    import pytest

    with pytest.raises(Exception, match="not both"):
        spark.read.format("txlog").option("timestampAsOf", str(cut)).option(
            "versionAsOf", "1"
        ).load(p).collect()


def test_stage_union_view_with_txlog_instance(spark, tmp_path):
    """A stage endpoint may itself be a txlog table: the union view
    composes the pinned-format member with plain parquet members, and a
    new commit to the txlog instance is visible through the VIEW without
    re-registration (views re-resolve their member tables, and the
    pinned member re-resolves its snapshot per plan)."""
    root = str(tmp_path / "lake")
    cat = Catalog(root=root)
    spark.createDataFrame([(1, "ep1")], "k long, src string").write.parquet(
        f"{root}/stage/m_mixed/ep1"
    )
    TX.tx_write(
        spark,
        spark.createDataFrame([(2, "ep2")], "k long, src string"),
        f"{root}/stage/m_mixed/ep2",
    )
    register_sql(spark, cat, db_prefix="s6_")
    assert {
        tuple(r) for r in spark.sql("SELECT k, src FROM s6_stage.m_mixed").collect()
    } == {(1, "ep1"), (2, "ep2")}
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "ep2b")], "k long, src string"),
        f"{root}/stage/m_mixed/ep2",
        mode="append",
    )
    assert {
        r["k"] for r in spark.sql("SELECT k FROM s6_stage.m_mixed").collect()
    } == {1, 2, 3}


def test_sql_insert_blockers_rechecked_at_commit_time(spark, tmp_path):
    """The honesty gates run AGAIN inside the CAS build callback: a
    concurrent DDL that declares an invariant after the INSERT was
    planned (but before its commit) raises TxConflictError instead of
    committing rows that violate it (e.g. null identity ids)."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        TxLogBatchWriter,
        _TxWriteMessage,
    )

    p = str(tmp_path / "insddl")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), p
    )
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    w = TxLogBatchWriter(m["schema"], {"path": p}, False)  # plan-time: clean
    v_ddl_before = TX.current_version(spark, p)
    TX.tx_add_identity(spark, p, "id")  # concurrent DDL lands mid-flight
    with pytest.raises(TX.TxConflictError, match="identity columns"):
        w.commit([_TxWriteMessage([])])
    # nothing landed after the DDL commit
    assert TX.current_version(spark, p) == v_ddl_before + 1


def test_register_sql_dir_raises_on_identifier_collision(spark, tmp_path):
    """_ident is lossy ('T-1' and 't_1' both map to t_1); registration
    drop-and-recreates, so a collision must raise instead of silently
    replacing the first table with the second."""
    d = str(tmp_path / "flat")
    os.makedirs(d)
    df = spark.createDataFrame([(1,)], "id long")
    df.write.parquet(os.path.join(d, "T-1.parquet"))
    df.write.parquet(os.path.join(d, "t_1.parquet"))
    with pytest.raises(ValueError, match="collision"):
        register_sql_dir(spark, d, "colldb")


# ---------------------------------------------------------------------------
# Filter pushdown through the SQL face (file skipping in TxLogBatchReader)


def test_sql_pushdown_prunes_files_by_stats_bloom_and_partition(
    spark, tmp_path
):
    """Pushed WHERE clauses skip files through the Python Data Source:
    manifest min/max stats (range + equality), Bloom bitsets (equality on
    high-cardinality keys), and hive partition values — the same pruning
    tx_read does natively, now reachable from `SELECT … FROM db.t`."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        TxLogBatchReader,
    )

    p = str(tmp_path / "t")
    for lo in (0, 100, 200):
        TX.tx_write(
            spark,
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(3)],
                "id long, v string",
            ).coalesce(1),
            p,
            mode="append" if lo else "overwrite",
            stats_for=["id"],
            bloom_for=["v"],
        )
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    assert len(m["files"]) == 3

    def parts(*filters):
        r = TxLogBatchReader(m["schema"], {"path": p})
        leftover = r.pushFilters(list(filters))
        assert list(leftover) == list(filters)  # Spark still evaluates all
        return r.partitions()

    assert len(parts(EqualTo(("id",), 101))) == 1  # stats equality
    assert len(parts(GreaterThan(("id",), 99))) == 2  # stats range
    assert len(parts(EqualTo(("v",), "s201"))) == 1  # bloom (no v stats)
    assert len(parts()) == 3  # no filters: every file

    # end-to-end: the registered table answers WHERE queries exactly
    register_txlog_table(spark, "pddb", "t", p)
    assert [
        tuple(r)
        for r in spark.sql("SELECT id, v FROM pddb.t WHERE id = 101").collect()
    ] == [(101, "s101")]
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM pddb.t WHERE id > 99").collect()[0].n
        == 6
    )

    # hive partition pruning: per-partition files, equality on the
    # partition column opens only its partition's file
    q = str(tmp_path / "part")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(1, "us"), (2, "eu"), (3, "apac")], "id long, region string"
        ).repartition(3),
        q,
        partition_by=["region"],
    )
    mq = TX.read_manifest(spark, q, TX.current_version(spark, q))
    assert len(mq["files"]) == 3
    r = TxLogBatchReader(mq["schema"], {"path": q})
    r.pushFilters([EqualTo(("region",), "us")])
    assert len(r.partitions()) == 1
    register_txlog_table(spark, "pddb", "tp", q)
    assert [
        tuple(x)
        for x in spark.sql(
            "SELECT id, region FROM pddb.tp WHERE region = 'us'"
        ).collect()
    ] == [(1, "us")]


def test_sql_pushdown_in_filter_and_column_mapping(spark, tmp_path):
    """IN-list predicates prune by [min, max] envelope, and pruning keys
    translate logical -> physical on column-MAPPED tables: after a
    metadata-only RENAME the pushed filter names the new logical column,
    while per-file stats stay keyed by the immutable physical name."""
    from pyspark.sql.datasource import EqualTo, In

    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        TxLogBatchReader,
    )

    p = str(tmp_path / "t")
    for lo in (0, 100, 200):
        TX.tx_write(
            spark,
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(3)],
                "id long, v string",
            ).coalesce(1),
            p,
            mode="append" if lo else "overwrite",
            stats_for=["id"],
        )
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))

    r = TxLogBatchReader(m["schema"], {"path": p})
    r.pushFilters([In(("id",), (0, 2, 102))])  # envelope [0, 102]: 2 files
    assert len(r.partitions()) == 2

    # metadata-only rename; stats in old files stay keyed by physical 'id'
    TX.tx_rename_column(spark, p, "id", "ident")
    m2 = TX.read_manifest(spark, p, TX.current_version(spark, p))
    r2 = TxLogBatchReader(m2["schema"], {"path": p})
    r2.pushFilters([EqualTo(("ident",), 201)])
    [part] = r2.partitions()
    assert part.rel_paths, "got the empty-fallback partition, not a real file"

    # a value no file can contain: every file provably misses -> the scan
    # is the zero-file fallback partition (and SQL returns no rows)
    r3 = TxLogBatchReader(m2["schema"], {"path": p})
    r3.pushFilters([EqualTo(("ident",), 999)])
    [fallback] = r3.partitions()
    assert not fallback.rel_paths

    # end-to-end through SQL: the renamed logical name answers exactly
    register_txlog_table(spark, "pdmapdb", "t", p)
    assert [
        tuple(x)
        for x in spark.sql(
            "SELECT ident, v FROM pdmapdb.t WHERE ident = 201"
        ).collect()
    ] == [(201, "s201")]


def test_pushdown_reinvocation_resets_equality_probes(spark, tmp_path):
    """pushFilters must be idempotent per-call: a second invocation with
    a DIFFERENT filter set on the same reader must not let the first
    call's equality probes keep Bloom/stats-pruning files the new
    predicates still need."""
    from pyspark.sql.datasource import EqualTo

    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        TxLogBatchReader,
    )

    p = str(tmp_path / "t")
    for lo in (0, 100, 200):
        TX.tx_write(
            spark,
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(3)],
                "id long, v string",
            ).coalesce(1),
            p,
            mode="append" if lo else "overwrite",
            stats_for=["id"],
            bloom_for=["v"],
        )
    m = TX.read_manifest(spark, p, TX.current_version(spark, p))
    r = TxLogBatchReader(m["schema"], {"path": p})

    r.pushFilters([EqualTo(("v",), "s201")])
    assert len(r.partitions()) == 1  # Bloom narrows to the third file

    # Re-plan with a different predicate: the stale v='s201' probe must
    # be discarded, or the second call would unsoundly open 1 file
    # instead of the 1 matching-by-stats + keep semantics for v='s001'.
    r.pushFilters([EqualTo(("v",), "s1")])
    [part] = r.partitions()
    assert part.rel_paths  # a real file survived — id 1 lives in file 1
    r.pushFilters([])  # no predicates: all files again, no residue
    assert len(r.partitions()) == 3


def test_batch_changes_on_column_mapped_table(spark, tmp_path):
    """The batch change feed serves LOGICAL column names on mapped
    tables: changes made before and after a RENAME both stream under the
    current logical schema."""
    from cdk_datalake_analytics_comercial_spark.streaming.source import (
        read_txlog_changes,
    )

    tbl = str(tmp_path / "t")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), tbl
    )  # v1
    TX.tx_write(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        tbl,
        mode="append",
    )  # v2
    TX.tx_rename_column(spark, tbl, "v", "val")  # v3 metadata-only
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "c")], "id long, val string"),
        tbl,
        mode="append",
    )  # v4
    ch = read_txlog_changes(spark, tbl, starting_version=2)
    got = {
        (r.id, r.val, r._change_type, r._commit_version) for r in ch.collect()
    }
    assert got == {(2, "b", "insert", 2), (3, "c", "insert", 4)}


def test_named_change_feed_table(spark, tmp_path):
    """table_changes as a catalog NAME: SELECT from the registered
    change-feed table serves the commits since the pinned starting
    version, re-resolved per plan — a commit made AFTER registration
    appears in the next SELECT with no re-registration."""
    from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
        register_txlog_changes_table,
    )
    from pyspark.sql import functions as F  # noqa: F811

    p = str(tmp_path / "t")
    TX.tx_write(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), p
    )  # v1
    TX.tx_write(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        p,
        mode="append",
    )  # v2
    register_txlog_changes_table(spark, "cfdb", "t_changes", p, 2)
    got = {
        (r.id, r.v, r._change_type, r._commit_version)
        for r in spark.sql("SELECT * FROM cfdb.t_changes").collect()
    }
    assert got == {(2, "b", "insert", 2)}
    # a new commit appears with no re-registration
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        p,
        mode="append",
    )  # v3
    got = {
        (r.id, r._commit_version)
        for r in spark.sql("SELECT id, _commit_version FROM cfdb.t_changes").collect()
    }
    assert got == {(2, 2), (3, 3)}
    # SQL aggregation over the named feed
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM cfdb.t_changes WHERE _change_type = 'insert'"
    ).collect()[0].n
    assert n == 2
    # bounded window: ending_version freezes the feed (an audit table)
    from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
        register_txlog_changes_table as _reg,
    )

    _reg(spark, "cfdb", "t_changes_w", p, 2, ending_version=2)
    got = {
        (r.id, r._commit_version)
        for r in spark.sql("SELECT id, _commit_version FROM cfdb.t_changes_w").collect()
    }
    assert got == {(2, 2)}


def test_named_change_feed_row_keyed_through_sql(spark, tmp_path):
    """Row-keyed mode through the NAMED feed: an OPTIMIZE between
    SELECTs contributes zero rows to the registered change table, an
    UPDATE shows as its exact pre/post pair — all by SQL name."""
    from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
        register_txlog_changes_table,
    )
    from pyspark.sql import functions as F  # noqa: F811

    p = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        p,
    )
    TX.tx_enable_row_tracking(spark, p)
    v0 = TX.current_version(spark, p)
    register_txlog_changes_table(
        spark, "cfrk", "t_changes", p, v0 + 1, row_keyed=True
    )
    assert spark.sql("SELECT * FROM cfrk.t_changes").count() == 0
    TX.tx_compact(spark, p, n_files=1)  # rewrite: cancels row-keyed
    assert spark.sql("SELECT * FROM cfrk.t_changes").count() == 0
    TX.tx_update(
        spark, p, where={"id": (2, 2)}, assignments={"v": F.lit("B!")}
    )
    got = {
        (r.id, r.v, r._change_type)
        for r in spark.sql(
            "SELECT id, v, _change_type FROM cfrk.t_changes"
        ).collect()
    }
    assert got == {(2, "b", "update_preimage"), (2, "B!", "update_postimage")}
