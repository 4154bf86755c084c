"""Warehouse export sink: JDBC write with idempotent delete-preaction.

Reference K6 (`common_jobs_functions.py:450-573` ``load_to_redshift`` /
``load_to_redshift_stage``): before appending a country/period slice to the
warehouse table, issue ``DELETE FROM t WHERE id_pais IN (...) AND id_periodo
IN (...)`` so reruns replace instead of duplicate — partition-replace
semantics on the warehouse side.

The Spark-native path: collect the distinct partition values from the
outgoing DataFrame (small, A9-style), run the DELETE over a JDBC connection,
then ``df.write.jdbc(mode="append")``. SQL synthesis is pure and
unit-testable; the network write needs a live warehouse and is exercised
only when a URL is supplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _quote(v) -> str:
    if v is None:
        return "NULL"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def build_delete_preaction(
    table: str, partition_values: dict[str, list]
) -> str | None:
    """``DELETE FROM t WHERE c1 IN (...) AND c2 IN (...)`` for the partition
    slice being loaded (reference `common_jobs_functions.py:462-473`:
    id_pais/id_periodo IN-lists). Returns None when there is nothing to
    delete (empty load)."""
    clauses = []
    for col, vals in partition_values.items():
        if not vals:
            return None
        in_list = ", ".join(_quote(v) for v in sorted(map(str, vals)))
        clauses.append(f"{col} IN ({in_list})")
    if not clauses:
        return None
    return f"DELETE FROM {table} WHERE " + " AND ".join(clauses)


def collect_partition_values(df: DataFrame, partition_cols: list[str]) -> dict[str, list]:
    """Distinct values per partition column (driver-side, bounded by
    partition-value cardinality — the reference's collected ``id_compania``
    list, `loadt_stage_to_redshift.py:271-277`)."""
    out: dict[str, list] = {}
    for c in partition_cols:
        out[c] = [r[0] for r in df.select(c).distinct().collect()]
    return out


def export_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    partition_cols: list[str] | None = None,
    properties: dict[str, str] | None = None,
    batchsize: int = 10000,
) -> None:
    """Idempotent JDBC load: DELETE the partition slice, then append.

    The DELETE runs on the driver through the JVM's ``DriverManager`` (same
    connection class the JDBC writer uses), so failure aborts before any
    rows land.
    """
    props = dict(properties or {})
    if partition_cols:
        values = collect_partition_values(df, partition_cols)
        delete_sql = build_delete_preaction(table, values)
        if delete_sql is not None:
            _execute_statement(df, url, delete_sql, props)
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.mode("append").save()


def _execute_statement(df: DataFrame, url: str, sql: str, props: dict[str, str]) -> None:
    """Run one DDL/DML statement through the JVM JDBC driver."""
    jvm = df.sparkSession._jvm
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()
