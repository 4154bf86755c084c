"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the training-data
extensions) as ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for EVERY query — the sketch pipelines run in portable
mode (md5-derived hashes, literal-injected constants) so the oracle rebuilds
identical MinHash/SimHash/LSH/IVF sketches (see plans.docs docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdk_datalake_analytics_comercial_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the sales-enrichment star
    (left-join chain + surrogate keys + period derivation — the reference's
    t_venta shape)."""
    return QUERIES["sales_enrichment"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
