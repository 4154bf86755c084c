"""Table readers: layered parquet scan, multi-instance union, CSV, JDBC.

Replaces `common_jobs_functions.py:222-277` (``read_table``) minus the AWS
coupling. Storage format is parquet (columnar, predicate-pushdown +
partition-pruning capable); the catalog abstracts the path scheme so the same
code runs on local FS and ``s3a://``.

Scale notes:
- The multi-instance union is a metadata-only plan operation (``unionByName``
  of N scans); Catalyst pushes filters/projections into every branch.
- The empty-table fallback (SURVEY S3) keeps the registered schema so joins
  against absent tables neither fail nor drop columns.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession

from ..core.catalog import Catalog, Layer
from .registry import SchemaRegistry


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Scan one table dir — format-transparent: txlog tables (detected by
    their ``_txlog`` log, like the reference's ``DeltaTable.isDeltaTable``
    probe) resolve their current manifest; plain dirs are parquet scans. A
    raw ``spark.read.parquet`` on a txlog dir would union every batch ever
    written, including superseded versions — hence the mandatory probe."""
    from .txlog import is_txlog_table, tx_read

    if is_txlog_table(spark, path):
        return tx_read(spark, path)
    return spark.read.parquet(path)


def table_exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` holds a readable table (reference ``table_exists``,
    `common_jobs_functions.py:351-356`, done via Delta log probe there)."""
    from .txlog import is_txlog_table

    if is_txlog_table(spark, path):
        return True
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    catalog: Catalog,
    layer: Layer | str,
    table: str,
    instances: list[str] | None = None,
    registry: SchemaRegistry | None = None,
    principal_only: bool = False,
) -> DataFrame:
    """Read a layer table.

    - Single-instance layers (domain/analytics): one parquet dir scan
      (reference S1, `common_jobs_functions.py:271`).
    - Stage: one dir per source endpoint; all instances are read and
      ``unionByName``-ed (reference S2, `:231-268`, union at `:268`).
      ``instances=None`` → discover from the filesystem catalog.
    - ``principal_only=True``: restrict discovery to endpoints flagged
      principal in the layer's ``_endpoints.json`` — the reference's
      ``have_principal=True`` (`common_jobs_functions.py:241-243`), used
      for shared masters replicated to every endpoint (``m_pais``,
      ``m_parametro``, …) where unioning all copies would duplicate rows.
      Ignored when ``instances`` is passed explicitly.
    - Absent everywhere → empty DataFrame with the registered schema
      (reference S3, `:124-217`); raises if no registry can answer.
    """
    layer = Layer(layer) if not isinstance(layer, Layer) else layer

    if layer == Layer.STAGE:
        if instances is None:
            instances = catalog.instances(layer, table, principal_only=principal_only)
        paths = [catalog.table_path(layer, table, i) for i in instances]
        dfs = [ _read_parquet(spark, p) for p in paths if table_exists(spark, p) ]
        if not dfs and catalog.is_table_dir(layer, table):
            # single-instance stage layout (no endpoint subdirs)
            base = catalog.table_path(layer, table)
            if table_exists(spark, base):
                dfs = [_read_parquet(spark, base)]
        if dfs:
            return functools.reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
            )
    else:
        path = catalog.table_path(layer, table)
        if table_exists(spark, path):
            return _read_parquet(spark, path)

    if registry is not None:
        return registry.empty_dataframe(spark, table)
    raise FileNotFoundError(
        f"table {layer.value}/{table} not found and no schema registry fallback"
    )


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ";",
    header: bool = True,
    schema=None,
) -> DataFrame:
    """CSV scan (reference S4, `common_jobs_functions.py:225-229`:
    ``;``-delimited with header, or schema-supplied ``,``-CSV)."""
    reader = spark.read.format("csv").option("delimiter", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("header", str(header).lower()).option("inferSchema", "true")
    return reader.load(path)


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 30,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan — replaces the reference's hand-rolled extractor
    (min/max of ``PARTITION_COLUMN`` → 30 integer ranges → ThreadPool,
    `utils/extract_data/load_with_query_python.py:438-525`) with Spark's
    built-in range-partitioned JDBC source; 30 partitions mirrors
    ``number_threads=30`` (`:459`)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
