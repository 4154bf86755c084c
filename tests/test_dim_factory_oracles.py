"""Spec-driven DuckDB differentials for EVERY factory-generated dim.

`test_dim_factory.py` pins hand-computed values per family;
`test_job_oracles.py` covers the hand-written jobs. This module closes the
remaining gap: each ConformDimSpec / PassthroughDimSpec gets a DuckDB
oracle whose SQL is derived from the SPEC (the shared column config) but
re-implements the factory SEMANTICS independently — bridge join, surrogate
vs passthrough id, trim, NULL placeholders, clock vs stage dates, casts,
distinct — so a factory-body bug cannot hide behind its own spec.

Fixtures are adversarial per the job-oracle convention: an unbridged
compania (inner join must drop it), CHAR-padded values for trim specs, and
a duplicate row for distinct specs.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from cdk_datalake_analytics_comercial_spark.core.catalog import Layer
from cdk_datalake_analytics_comercial_spark.jobs import ANALYTICS_JOBS, DOMAIN_JOBS
from cdk_datalake_analytics_comercial_spark.jobs.dim_factory import (
    CONFORM_DIM_SPECS,
    PASSTHROUGH_DIM_SPECS,
)
from cdk_datalake_analytics_comercial_spark.runner import (
    JobConfig,
    JobContext,
    run_waves,
)
from cdk_datalake_analytics_comercial_spark.sources.registry import SchemaRegistry

from test_job_oracles import assert_match

AS_OF = dt.date(2025, 5, 15)
TS = dt.datetime(2025, 4, 1, 9, 30)

_DUCK_TYPES = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


def _duck_type(t: str) -> str:
    if t.startswith(("numeric", "decimal")):
        return t.replace("numeric", "DECIMAL").upper()
    return _DUCK_TYPES[t]


def _spark_seed_type(t: str) -> str:
    # stage sources are seeded pre-cast: numerics as double exercises the
    # declared-type cast in both engines
    if t.startswith(("numeric", "decimal")):
        return "double"
    return t


def _seed_value(col: str, typ: str, i: int, padded: bool):
    if typ == "int":
        return 10 + i
    if typ == "double":
        return 2.5 + i
    v = f"{col[:6]}_{i}"
    return f"  {v} " if padded else v


def _conform_stage_columns(spec) -> list[tuple[str, str]]:
    cols: list[tuple[str, str]] = [(spec.compania_col, "string")]
    if spec.natural_key is None:
        cols.append((spec.id_col, "string"))
    else:
        for k in spec.natural_key:
            if all(k != c for c, _ in cols):
                cols.append((k, "string"))
    for src, _out, typ in spec.attrs:
        if src is not None and all(src != c for c, _ in cols):
            cols.append((src, _spark_seed_type(typ)))
    if spec.date_source == "stage":
        cols += [("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp")]
    return cols


def _conform_oracle_sql(spec, stage_path: str, compania_path: str, pais_path: str) -> str:
    if spec.natural_key is None:
        id_sql = f"CAST(st.{spec.id_col} AS VARCHAR)"
    else:
        parts = ", ".join(
            f"TRIM(CAST(st.{c} AS VARCHAR))"
            for c in (spec.compania_col, *spec.natural_key)
        )
        id_sql = f"concat_ws('|', {parts})"
    attr_sql = []
    for src, out, typ in spec.attrs:
        if src is None:
            attr_sql.append(f"CAST(NULL AS {_duck_type(typ)}) AS {out}")
        else:
            e = f"TRIM(st.{src})" if src in spec.trim_attrs else f"st.{src}"
            attr_sql.append(f"CAST({e} AS {_duck_type(typ)}) AS {out}")
    dates = []
    if spec.date_source == "stage":
        dates = [
            f"CAST(st.fecha_creacion AS {_duck_type(spec.date_type)}) AS fecha_creacion",
            f"CAST(st.fecha_modificacion AS {_duck_type(spec.date_type)}) AS fecha_modificacion",
        ]
    elif spec.date_source == "clock":
        dates = [
            f"CAST(DATE '{AS_OF}' AS {_duck_type(spec.date_type)}) AS fecha_creacion",
            f"CAST(DATE '{AS_OF}' AS {_duck_type(spec.date_type)}) AS fecha_modificacion",
        ]
    distinct = "DISTINCT " if spec.distinct else ""
    selects = ",\n       ".join(
        [f"{id_sql} AS {spec.id_col}", "CAST(b.id_pais AS VARCHAR) AS id_pais"]
        + attr_sql
        + dates
    )
    return f"""
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM read_parquet('{compania_path}/*.parquet') mc
  JOIN read_parquet('{pais_path}/*.parquet') mp ON mc.cod_pais = mp.cod_pais
)
SELECT {distinct}{selects}
FROM read_parquet('{stage_path}/*.parquet') st
JOIN bridge b ON st.{spec.compania_col} = b.cod_compania
"""


@pytest.mark.parametrize("spec", CONFORM_DIM_SPECS, ids=lambda s: s.name)
def test_conform_dim_matches_spec_oracle(spark, lake, spec):
    stage_cols = _conform_stage_columns(spec)
    reg_dict = {
        spec.stage_table: stage_cols,
        "m_compania": [
            ("cod_compania", "string"), ("id_compania", "string"),
            ("cod_pais", "string"),
        ],
        "m_pais": [("id_pais", "string"), ("cod_pais", "string")],
    }
    # bridge: compania 10 joins; compania 99 points at an absent pais
    comp_rows = [("10", "10", "PE"), ("99", "99", "XX")]
    if spec.compania_col == "id_compania":
        # stage carries id_compania; the bridge still joins on cod_compania,
        # so keep both ids equal (the factory joins st.id_compania = cod)
        pass
    spark.createDataFrame(
        comp_rows, "cod_compania string, id_compania string, cod_pais string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_compania", "pe01"))
    spark.createDataFrame(
        [("PE", "PE")], "id_pais string, cod_pais string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_pais", "principal"))

    schema = ", ".join(f"{c} {t}" for c, t in stage_cols)
    rows = []
    for i, compania in ((0, "10"), (1, "10"), (2, "99")):
        row = []
        for c, t in stage_cols:
            if c == spec.compania_col:
                row.append(compania)
            elif t == "timestamp":
                row.append(TS)
            else:
                row.append(_seed_value(c, t, i, c in spec.trim_attrs))
        rows.append(tuple(row))
    if spec.distinct:
        rows.append(rows[0])  # exact duplicate the job must collapse
    spark.createDataFrame(rows, schema).write.parquet(
        lake.table_path(Layer.STAGE, spec.stage_table, "pe01")
    )

    reg = SchemaRegistry(reg_dict)

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF
        )

    res = run_waves(
        [JobConfig("domain", f"{spec.name}_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error

    got = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, spec.name)
    ).toPandas()
    con = duckdb.connect()
    want = con.sql(
        _conform_oracle_sql(
            spec,
            lake.table_path(Layer.STAGE, spec.stage_table, "pe01"),
            lake.table_path(Layer.STAGE, "m_compania", "pe01"),
            lake.table_path(Layer.STAGE, "m_pais", "principal"),
        )
    ).df()
    con.close()
    assert len(want) == 2  # bridged rows only; compania 99 dropped, dupe collapsed
    assert_match(got, want, spec.name)


def _passthrough_oracle_sql(spec, domain_path: str) -> str:
    selects = ",\n       ".join(
        f"CAST(NULL AS {_duck_type(typ)}) AS {out}"
        if src is None
        else f"CAST(d.{src} AS {_duck_type(typ)}) AS {out}"
        for src, out, typ in spec.columns
    )
    return f"SELECT {selects} FROM read_parquet('{domain_path}/**/*.parquet', hive_partitioning=true) d"


@pytest.mark.parametrize("spec", PASSTHROUGH_DIM_SPECS, ids=lambda s: s.name)
def test_passthrough_dim_matches_spec_oracle(spark, lake, spec):
    # seed the DOMAIN input generically from the spec's source columns
    srcs: list[tuple[str, str]] = []
    for src, _out, typ in spec.columns:
        if src is not None and all(src != c for c, _ in srcs):
            srcs.append((src, _spark_seed_type(typ)))
    if all(spec.partition_col != c for c, _ in srcs):
        srcs.append((spec.partition_col, "string"))
    schema = ", ".join(f"{c} {t}" for c, t in srcs)
    rows = []
    for i in range(3):
        row = []
        for c, t in srcs:
            if c == spec.partition_col:
                # when the dim KEY is the partition col (dim_pais), rows
                # must carry distinct values or the upsert correctly
                # collapses them — one country, one row
                row.append(f"P{i}" if spec.id_col == spec.partition_col else "PE")
            elif t == "timestamp":
                row.append(TS)
            elif t == "date":
                row.append(AS_OF)
            else:
                row.append(_seed_value(c, t, i, False))
        rows.append(tuple(row))
    dom_path = lake.table_path(Layer.DOMAIN, spec.domain_table)
    spark.createDataFrame(rows, schema).write.partitionBy(
        spec.partition_col
    ).parquet(dom_path)

    reg = SchemaRegistry({})

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF
        )

    res = run_waves(
        [JobConfig("analytics", f"{spec.name}_lite", 1)], ANALYTICS_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error

    got = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, spec.name)
    ).toPandas()
    con = duckdb.connect()
    want = con.sql(_passthrough_oracle_sql(spec, dom_path)).df()
    con.close()
    assert len(want) == 3
    assert_match(got, want, spec.name)
