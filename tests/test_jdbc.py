"""JDBC integration tests against Spark's bundled embedded Derby: the
partitioned extraction scan (S6) and the idempotent delete-preaction export
(K6) — the paths that normally need a live warehouse."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources.export import export_jdbc
from cdk_datalake_analytics_comercial_spark.sources.reader import read_jdbc_partitioned


def _exec(spark, url, *stmts):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.executeUpdate(s)
        st.close()
    finally:
        conn.close()


@pytest.fixture()
def derby_url(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    _exec(
        spark,
        url,
        "CREATE TABLE src (id INT, grp VARCHAR(10), amount DOUBLE)",
        "INSERT INTO src VALUES "
        + ", ".join(f"({i}, 'g{i % 3}', {i * 1.5})" for i in range(1, 31)),
    )
    return url


def test_read_jdbc_plain(spark, derby_url):
    df = spark.read.format("jdbc").option("url", derby_url).option("dbtable", "src").load()
    assert df.count() == 30
    assert {f.name.lower() for f in df.schema.fields} == {"id", "grp", "amount"}


def test_read_jdbc_partitioned(spark, derby_url):
    """The reference's 30-way range extraction (load_with_query_python.py:
    448-480) as Spark's built-in partitioned JDBC scan."""
    df = read_jdbc_partitioned(
        spark, derby_url, "src", partition_column="id",
        lower_bound=1, upper_bound=31, num_partitions=5,
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 30  # range partitioning must not drop/dup rows
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(1, 31))


def test_export_jdbc_delete_preaction_idempotent(spark, derby_url):
    """K6: rerunning the same partition load replaces, never duplicates;
    other partitions survive."""
    _exec(
        spark,
        derby_url,
        "CREATE TABLE wh (id_pais VARCHAR(4), id_periodo VARCHAR(8), amount DOUBLE)",
        "INSERT INTO wh VALUES ('CL', '202504', 999.0)",  # foreign partition
    )
    out = spark.createDataFrame(
        [("PE", "202504", 10.0), ("PE", "202505", 20.0)],
        "id_pais string, id_periodo string, amount double",
    )
    export_jdbc(out, derby_url, "wh", partition_cols=["id_pais", "id_periodo"])
    export_jdbc(out, derby_url, "wh", partition_cols=["id_pais", "id_periodo"])  # rerun

    back = spark.read.format("jdbc").option("url", derby_url).option("dbtable", "wh").load()
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [
        ("CL", "202504", 999.0),   # untouched foreign partition
        ("PE", "202504", 10.0),
        ("PE", "202505", 20.0),
    ]
