"""Principal-instance stage reads — the engine twin of the reference's
``have_principal=True`` endpoint filter (`common_jobs_functions.py:241-243`:
DynamoDB endpoints carry ``IS_PRINCIPAL``; shared masters like ``m_pais`` /
``m_parametro`` are replicated to EVERY source endpoint, so reading them from
all endpoints unions duplicate copies → join fan-out and double-counted
aggregates). Here the endpoint registry is ``{stage}/_endpoints.json`` and
``read_table(..., principal_only=True)`` restricts discovery to flagged
endpoints; lakes without a registry file treat every endpoint as principal
(single-endpoint test lakes keep working unchanged)."""

import datetime as dt
import json
import os

from cdk_datalake_analytics_comercial_spark.core.catalog import Layer
from cdk_datalake_analytics_comercial_spark.jobs import DOMAIN_JOBS
from cdk_datalake_analytics_comercial_spark.runner import JobConfig, JobContext
from cdk_datalake_analytics_comercial_spark.sources.reader import read_table
from cdk_datalake_analytics_comercial_spark.sources.registry import SchemaRegistry


def write_endpoints(lake, meta):
    os.makedirs(lake.layer_path(Layer.STAGE), exist_ok=True)
    with open(os.path.join(lake.layer_path(Layer.STAGE), "_endpoints.json"), "w") as f:
        json.dump(meta, f)


def seed_two_endpoint_lake(spark, lake):
    """ep_main (principal) and ep_branch (non-principal). The shared master
    m_pais is REPLICATED to both — the branch carries a conflicting copy
    (extra stale row). m_compania is genuinely split across endpoints."""
    ts = dt.datetime(2025, 4, 1, 12, 0, 0)
    pais_schema = "id_pais string, cod_pais string, desc_pais string"
    spark.createDataFrame(
        [("PE", "PE", "PERU"), ("CL", "CL", "CHILE")], pais_schema
    ).write.parquet(lake.table_path(Layer.STAGE, "m_pais", "ep_main"))
    # the replica: same PE row AGAIN plus a stale country name
    spark.createDataFrame(
        [("PE", "PE", "PERU (STALE)"), ("CL", "CL", "CHILE")], pais_schema
    ).write.parquet(lake.table_path(Layer.STAGE, "m_pais", "ep_branch"))

    comp_schema = (
        "cod_compania string, cod_pais string, desc_compania string, es_activo string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp"
    )
    spark.createDataFrame(
        [("10", "PE", "AJE PERU", "T", ts, ts)], comp_schema
    ).write.parquet(lake.table_path(Layer.STAGE, "m_compania", "ep_main"))
    spark.createDataFrame(
        [("20", "CL", "AJE CHILE", "T", ts, ts)], comp_schema
    ).write.parquet(lake.table_path(Layer.STAGE, "m_compania", "ep_branch"))

    write_endpoints(
        lake,
        {"ep_main": {"is_principal": True}, "ep_branch": {"is_principal": False}},
    )


def test_catalog_principal_filter(spark, lake):
    seed_two_endpoint_lake(spark, lake)
    assert lake.instances(Layer.STAGE, "m_pais") == ["ep_branch", "ep_main"]
    assert lake.instances(Layer.STAGE, "m_pais", principal_only=True) == ["ep_main"]


def test_catalog_without_registry_treats_all_as_principal(spark, lake):
    seed_two_endpoint_lake(spark, lake)
    os.remove(os.path.join(lake.layer_path(Layer.STAGE), "_endpoints.json"))
    assert lake.instances(Layer.STAGE, "m_pais", principal_only=True) == [
        "ep_branch", "ep_main",
    ]


def test_read_table_principal_only_skips_replica_copies(spark, lake):
    seed_two_endpoint_lake(spark, lake)
    all_rows = read_table(spark, lake, Layer.STAGE, "m_pais").count()
    principal = read_table(spark, lake, Layer.STAGE, "m_pais", principal_only=True)
    assert all_rows == 4  # the union of both replicas — duplicates included
    assert principal.count() == 2
    assert {r["desc_pais"] for r in principal.collect()} == {"PERU", "CHILE"}
    # a genuinely-split table still unions every endpoint
    assert read_table(spark, lake, Layer.STAGE, "m_compania").count() == 2


def test_job_output_matches_single_principal_truth(spark, lake):
    """The day-one multi-endpoint scenario: without the principal filter,
    m_compania's inner join against the unioned m_pais replicas fans out
    (one output row per replica copy) and the merge key dedups
    NON-deterministically between 'PERU' and 'PERU (STALE)'. With it, the
    output equals what a single-principal lake produces."""
    seed_two_endpoint_lake(spark, lake)
    registry = SchemaRegistry(
        {
            "m_pais": [
                ("id_pais", "string"), ("cod_pais", "string"), ("desc_pais", "string")
            ],
            "m_compania": [
                ("cod_compania", "string"), ("cod_pais", "string"),
                ("desc_compania", "string"), ("es_activo", "string"),
                ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp"),
            ],
        }
    )
    cfg = JobConfig(layer="domain", procedure="m_compania", exe_order=1)
    ctx = JobContext(
        spark=spark, catalog=lake, registry=registry, config=cfg,
        as_of=dt.date(2025, 5, 15),
    )
    DOMAIN_JOBS.get("m_compania")(ctx)
    out = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_compania"))
    got = sorted(
        (r["id_compania"], r["id_pais"], r["nomb_compania"]) for r in out.collect()
    )
    # exactly one row per company, joined against the PRINCIPAL m_pais copy
    assert got == [("10", "PE", "AJE PERU"), ("20", "CL", "AJE CHILE")]

    # sanity: the unguarded read really would have fanned out the join
    m_pais_all = read_table(spark, lake, Layer.STAGE, "m_pais")
    m_comp = read_table(spark, lake, Layer.STAGE, "m_compania")
    fanout = m_comp.join(m_pais_all, "cod_pais", "inner").count()
    assert fanout == 4  # 2 companies × 2 replica copies
