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


# ---------------------------------------------------------------------------
# between-date incremental extraction (round 9 — the reference's third
# load strategy, load_with_query_python.py:485-517)


@pytest.fixture()
def derby_dated(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/dateddb;create=true"
    rows = []
    # 2024-03-01 .. 2024-03-30, one row per day at noon; two NULL-date rows
    for i in range(30):
        rows.append(
            f"({i}, TIMESTAMP('2024-03-{i + 1:02d} 12:00:00'), {i * 2.0})"
        )
    _exec(
        spark,
        url,
        "CREATE TABLE ev (id INT, created_at TIMESTAMP, amount DOUBLE)",
        "INSERT INTO ev VALUES " + ", ".join(rows),
        "INSERT INTO ev VALUES (97, NULL, 0.0), (98, NULL, 0.0)",
    )
    return url


def test_between_date_extraction_exact_and_partitioned(spark, derby_dated):
    from cdk_datalake_analytics_comercial_spark.sources.reader import (
        read_jdbc_between_date,
    )

    df = read_jdbc_between_date(
        spark, derby_dated, "ev", "created_at",
        "2024-03-05 00:00:00", "2024-03-20 00:00:00", num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    ids = sorted(r["ID"] for r in df.collect())
    # days 05..19 at noon fall in [start, end); NULL dates excluded
    assert ids == list(range(4, 19))


def test_between_date_boundary_rows_extracted_once(spark, derby_dated):
    """The reference's inclusive BETWEEN with shared slice boundaries
    extracts a row sitting exactly on a boundary twice; the half-open
    slices here deliver it exactly once."""
    from cdk_datalake_analytics_comercial_spark.sources.reader import (
        read_jdbc_between_date,
    )

    # slice boundary at 2024-03-11 00:00 is irrelevant for noon rows; put
    # one row exactly ON a computed boundary: window 01..29 split in 4 →
    # boundaries at 08T00, 15T00, 22T00; insert a row at 15T00 sharp
    _exec(
        spark, derby_dated,
        "INSERT INTO ev VALUES (99, TIMESTAMP('2024-03-15 00:00:00'), 1.0)",
    )
    df = read_jdbc_between_date(
        spark, derby_dated, "ev", "created_at",
        "2024-03-01 00:00:00", "2024-03-29 00:00:00", num_partitions=4,
    )
    hits = [r["ID"] for r in df.collect() if r["ID"] == 99]
    assert hits == [99], f"boundary row delivered {len(hits)} times"
    # end boundary itself is inclusive (reference BETWEEN keeps it)
    _exec(
        spark, derby_dated,
        "INSERT INTO ev VALUES (100, TIMESTAMP('2024-03-29 00:00:00'), 1.0)",
    )
    df2 = read_jdbc_between_date(
        spark, derby_dated, "ev", "created_at",
        "2024-03-01 00:00:00", "2024-03-29 00:00:00", num_partitions=4,
    )
    assert [r["ID"] for r in df2.collect() if r["ID"] == 100] == [100]


def test_between_date_two_column_filter_no_duplicates(spark, derby_dated):
    """The reference's comma FILTER_COLUMN form ((c1 BETWEEN) OR (c2
    BETWEEN), load_with_query_python.py:366-371): same overall row set,
    but a row matching on c1 in one slice and c2 in another arrives
    exactly once."""
    from cdk_datalake_analytics_comercial_spark.sources.reader import (
        read_jdbc_between_date,
    )

    _exec(
        spark, derby_dated,
        "ALTER TABLE ev ADD COLUMN updated_at TIMESTAMP",
        # matches only via updated_at (created_at NULL)
        "INSERT INTO ev (id, created_at, amount, updated_at) VALUES "
        "(200, NULL, 5.0, TIMESTAMP('2024-03-18 09:00:00'))",
        # created_at in slice 0, updated_at in slice 2: must arrive ONCE
        "UPDATE ev SET updated_at = TIMESTAMP('2024-03-19 09:00:00') WHERE id = 5",
    )
    df = read_jdbc_between_date(
        spark, derby_dated, "ev", "created_at",
        "2024-03-05 00:00:00", "2024-03-20 00:00:00", num_partitions=3,
        secondary_column="updated_at",
    )
    got = sorted(r["ID"] for r in df.collect())
    assert got.count(5) == 1 and got.count(200) == 1
    assert got == sorted(set(range(4, 19)) | {200})


def test_between_date_magic_1900_rendering(spark, tmp_path):
    """BigMagic integer-day sources (aje_date): boundaries render as the
    1900-pivot integers the extractor computes (offset 693596)."""
    from cdk_datalake_analytics_comercial_spark.core.magic_dates import (
        py_date_to_magic_1900,
    )
    from cdk_datalake_analytics_comercial_spark.sources.reader import (
        read_jdbc_between_date,
    )
    import datetime as dt

    url = f"jdbc:derby:{tmp_path}/magicdb;create=true"
    d0 = py_date_to_magic_1900(dt.date(2024, 3, 1))
    _exec(
        spark,
        url,
        "CREATE TABLE mv (id INT, fecha INT)",
        "INSERT INTO mv VALUES "
        + ", ".join(f"({i}, {d0 + i})" for i in range(10)),
    )
    df = read_jdbc_between_date(
        spark, url, "mv", "fecha",
        "2024-03-03 00:00:00", "2024-03-08 00:00:00",
        num_partitions=2, filter_type="magic_1900",
    )
    assert sorted(r["ID"] for r in df.collect()) == [2, 3, 4, 5, 6, 7]


def test_between_date_magic_2008_rendering(spark, tmp_path):
    """The 2008-pivot BigMagic encoding (offset 733042 — the redshift-load
    codec) renders boundaries for sources storing that pivot."""
    import datetime as dt

    from cdk_datalake_analytics_comercial_spark.core.magic_dates import (
        py_date_to_magic_2008,
    )
    from cdk_datalake_analytics_comercial_spark.sources.reader import (
        read_jdbc_between_date,
    )

    url = f"jdbc:derby:{tmp_path}/magic08db;create=true"
    d0 = py_date_to_magic_2008(dt.date(2024, 3, 1))
    _exec(
        spark,
        url,
        "CREATE TABLE mv (id INT, fecha INT)",
        "INSERT INTO mv VALUES "
        + ", ".join(f"({i}, {d0 + i})" for i in range(10)),
    )
    df = read_jdbc_between_date(
        spark, url, "mv", "fecha",
        "2024-03-02 00:00:00", "2024-03-06 00:00:00",
        num_partitions=2, filter_type="magic_2008",
    )
    assert sorted(r["ID"] for r in df.collect()) == [1, 2, 3, 4, 5]
