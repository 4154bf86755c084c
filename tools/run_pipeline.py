"""Executable end-to-end demo: synthesize stage fixtures → run the domain
wave-DAG → run the analytics wave-DAG → print the status log and result
samples. The in-process equivalent of the reference's orchestration state
machine (domain SM → analytics SM, `stacks/cdk_datalake_analytics_stack.py:808-867`).

Usage: python tools/run_pipeline.py [lake_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
from decimal import Decimal

sys.path.insert(0, ".")

AS_OF = dt.date(2025, 5, 15)

DOMAIN_CSV = """layer;procedure;exe_order;process_id;periods
domain;m_pais;1;1;2
domain;m_compania;1;2;2
domain;m_articulo_lite;1;3;2
domain;m_estructura_comercial_lite;1;4;2
domain;t_venta_lite;2;5;3
domain;t_pedido_lite;2;6;3
domain;t_venta_detalle_lite;3;7;3
"""

ANALYTICS_CSV = """layer;procedure;exe_order;process_id;periods
analytics;fact_venta_resumen;1;1;3
analytics;fact_cliente_venta_lite;1;2;3
analytics;fact_kpi_lite;2;3;3
"""


def main() -> None:
    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.core.catalog import Catalog, Layer
    from cdk_datalake_analytics_comercial_spark.jobs import ANALYTICS_JOBS, DOMAIN_JOBS
    from cdk_datalake_analytics_comercial_spark.runner import (
        JobContext,
        parse_config_csv,
        run_waves,
        write_status_log,
    )

    sys.path.insert(0, "tests")
    from test_analytics_jobs import _registry as analytics_registry
    from test_runner_jobs import registry as domain_registry, seed_stage

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lake_")
    spark = get_spark("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    lake = Catalog(root=root)
    seed_stage(spark, lake)
    # extra fixtures for the wider domain jobs
    spark.createDataFrame(
        [("10", "A1", "AGUA 1L", "L1", "F1", "M1", Decimal("10"), Decimal("2"), "T")],
        "cod_compania string, cod_articulo string, desc_articulo string, cod_linea string, "
        "cod_familia string, cod_marca string, cant_unidad_paquete decimal(38,12), "
        "cant_paquete_caja decimal(38,12), es_activo string",
    ).write.mode("overwrite").parquet(lake.table_path(Layer.STAGE, "m_articulo", "pe01"))

    domain_reg = domain_registry()
    # jobs not exercised by the smoke fixtures still resolve via the
    # empty-schema fallback — register their input schemas
    for tbl, cols in {
        "m_linea": [("cod_compania", "string"), ("cod_linea", "string"), ("desc_linea", "string")],
        "m_familia": [("cod_compania", "string"), ("cod_linea", "string"),
                      ("cod_familia", "string"), ("desc_familia", "string")],
        "m_marca": [("cod_compania", "string"), ("cod_marca", "string"), ("desc_marca", "string")],
        "m_articulo": [("cod_compania", "string"), ("cod_articulo", "string"),
                       ("desc_articulo", "string"), ("cod_linea", "string"),
                       ("cod_familia", "string"), ("cod_marca", "string"),
                       ("cant_unidad_paquete", "numeric(38,12)"),
                       ("cant_paquete_caja", "numeric(38,12)"), ("es_activo", "string")],
        "m_ruta": [("cod_compania", "string"), ("cod_sucursal", "string"),
                   ("cod_fuerza_venta", "string"), ("cod_ruta", "string"),
                   ("cod_zona", "string"), ("cod_vendedor", "string"),
                   ("desc_ruta", "string"), ("es_activo", "string")],
        "m_zona": [("cod_compania", "string"), ("cod_sucursal", "string"),
                   ("cod_zona", "string"), ("cod_region", "string"),
                   ("cod_supervisor", "string"), ("desc_zona", "string"),
                   ("es_activo", "string")],
        "t_documento_pedido": [("cod_compania", "string"), ("cod_sucursal", "string"),
                               ("cod_documento_pedido", "string"), ("nro_documento_pedido", "string"),
                               ("cod_cliente", "string"), ("fecha_pedido", "date")],
        "t_documento_pedido_ades": [("cod_compania", "string"), ("cod_sucursal", "string"),
                                    ("cod_documento_transaccion", "string"), ("nro_comprobante", "string"),
                                    ("cod_cliente", "string"), ("fecha_pedido", "date")],
        "t_documento_venta_detalle": [("cod_compania", "string"), ("cod_sucursal", "string"),
                                      ("cod_documento_venta", "string"), ("nro_documento_venta", "string"),
                                      ("cod_articulo", "string"), ("cod_operacion", "string"),
                                      ("cant_paquete", "numeric(38,12)"), ("cant_unidad", "numeric(38,12)"),
                                      ("imp_valorizado", "numeric(38,12)"), ("imp_cobrar", "numeric(38,12)")],
        "m_operacion": [("cod_compania", "string"), ("cod_operacion", "string"),
                        ("cod_tipo_operacion", "string")],
    }.items():
        domain_reg.register(tbl, cols)

    analytics_reg = analytics_registry()
    analytics_reg.register("t_pedido", [("id_pedido", "string"), ("id_periodo", "string"),
                                        ("cod_cliente", "string")])
    analytics_reg.tables["t_venta"].append(("fecha_liquidacion", "date"))

    def domain_ctx(cfg):
        return JobContext(spark=spark, catalog=lake, registry=domain_reg, config=cfg, as_of=AS_OF)

    def analytics_ctx(cfg):
        return JobContext(spark=spark, catalog=lake, registry=analytics_reg, config=cfg, as_of=AS_OF)

    status_path = f"{root}/status.jsonl"
    dr = run_waves(parse_config_csv(DOMAIN_CSV), DOMAIN_JOBS, domain_ctx)
    write_status_log(dr, status_path, run_id="domain")
    ar = run_waves(parse_config_csv(ANALYTICS_CSV), ANALYTICS_JOBS, analytics_ctx)
    write_status_log(ar, status_path, run_id="analytics")

    print(f"\nlake: {root}")
    for r in dr + ar:
        print(f"  [{r.status:9s}] wave {r.wave}  {r.name}  ({r.seconds}s)")
    failed = [r for r in dr + ar if r.status == "failed"]
    for r in failed:
        print(f"\n--- {r.name} error ---\n{r.error}")
    for layer, table in [
        (Layer.DOMAIN, "t_venta"),
        (Layer.ANALYTICS, "fact_cliente_venta"),
        (Layer.ANALYTICS, "fact_kpi"),
    ]:
        df = spark.read.parquet(lake.table_path(layer, table))
        print(f"\n{layer.value}/{table}: {df.count()} rows")
        df.show(5, truncate=False)
    print(json.dumps({"failed": len(failed), "succeeded": len(dr + ar) - len(failed)}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
