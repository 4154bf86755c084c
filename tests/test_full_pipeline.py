"""The complete reference workload as one integration test: all 31 domain +
21 analytics job equivalents run as config-driven wave DAGs over the
coherent stage universe in tools/full_stage.py. Every domain job must
succeed AND emit rows; every analytics job must succeed reading the REAL
domain outputs — this resolves the entire layer-contract graph (columns,
types, partitioning) end to end, the way the reference's orchestration
state machine does nightly."""

import os
import pytest

# slow tier (end-to-end 52-job replay) — skipped unless SPARK_GRAFT_SLOW_TESTS=1;
# fast-tier coverage of the same operators lives in the unit modules
pytestmark = pytest.mark.slow
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from cdk_datalake_analytics_comercial_spark.core.catalog import Catalog, Layer


def test_full_52_job_pipeline(spark, tmp_path):
    from run_full_pipeline import run

    root = str(tmp_path / "lake")
    dr, ar = run(spark, root)

    failed = [r for r in dr + ar if r.status != "succeeded"]
    assert not failed, "\n".join(f"{r.name}: {r.error}" for r in failed)
    assert len(dr) == 31 and len(ar) == 22  # 21 reference jobs + fact_venta_resumen

    # per-job observability: every one of the 53 jobs reports the rows it
    # wrote (observed on its own write actions — no extra scan), and every
    # job in this universe writes at least one row
    for r in dr + ar:
        assert r.rows_written is not None and r.writes >= 1, r.name
        assert r.rows_written >= 1, f"{r.name} reported zero rows written"

    lake = Catalog(root=root)
    # every domain table landed with rows (stage universe is coherent)
    for table in [
        "m_pais", "m_compania", "m_articulo", "m_cliente", "m_eje_territorial",
        "m_estructura_comercial", "m_tipo_venta", "m_transportista",
        "m_responsable_comercial", "m_modulo", "m_clasificacion_cliente",
        "m_asignacion_modulo", "m_forma_pago", "m_tipo_pedido", "m_origen_pedido",
        "m_medio_transporte", "m_almacen", "m_fuerza_venta", "m_lista_precio",
        "m_sucursal", "m_modelo_atencion", "t_venta", "t_venta_detalle", "t_pedido",
        "t_pedido_detalle", "t_pedido_cumplimiento", "t_reparto", "t_visita",
        "t_movimiento_inventario", "t_movimiento_inventario_detalle",
        "t_saldos_iniciales",
    ]:
        n = spark.read.parquet(lake.table_path(Layer.DOMAIN, table)).count()
        assert n >= 1, f"domain/{table} is empty"

    # spot-check the lineage stitched across all three layers: the sale
    # flows stage → t_venta/t_venta_detalle → fact_venta_cliente_historico
    hist = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_cliente_historico")
    ).collect()
    assert len(hist) == 1
    assert hist[0]["id_cliente"] == "10|C1"
    assert hist[0]["id_producto"] == "A1"

    # dim_cliente's three-hop lineage resolved: assignment → module (the
    # extraction 4-part id) → attention model; the priority ladder saw the
    # real description, not the otherwise(5) fallback
    cli = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "dim_cliente")).collect()
    assert len(cli) == 1
    assert cli[0]["id_cliente"] == "10|C1"
    assert cli[0]["id_estructura_comercial"] == "10|01|F1|M1"
    assert cli[0]["modelo_atencion"] == "Pre Venta"
    # the attribute surface resolved through the widened m_cliente: the
    # postal-minted territorial pointer matched a real m_eje_territorial row
    assert cli[0]["id_eje_territorial"] == "PE|15074"
    assert cli[0]["cod_eje_territorial"] == "15074"
    assert cli[0]["nomb_cuenta_clave"] == "CUENTA CLAVE AJE"
    assert cli[0]["desc_canal_local"] == "BODEGA"
    assert cli[0]["desc_giro_local"] == "ABARROTES"

    # the delivery fact stitched order ⋈ fulfillment ⋈ delivery headers —
    # BOTH left joins must have matched (carrier from t_reparto, client and
    # order date from t_pedido)
    rep = {r["id_pedido"]: r for r in spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_reparto_detalle")
    ).collect()}
    # the main '200' order line (dispatched) plus the ADES-only '300' line
    assert set(rep) == {"10|01|200|N1|C1", "10|01|300|N3|C1"}
    main_line = rep["10|01|200|N1|C1"]
    assert main_line["id_reparto"] == "10|01|AL1|GRA|900"
    assert main_line["id_transportista"] == "10|77"
    assert main_line["cod_cliente"] == "C1"
    assert main_line["fecha_pedido"] is not None
    assert rep["10|01|300|N3|C1"]["id_reparto"] is None  # ADES line undispatched

    # the reference reruns the whole workload nightly — a second full run
    # must be a fixed point: merges match-update instead of duplicating,
    # overwrites replace the same partitions
    counts1 = {
        (layer, tbl): spark.read.parquet(lake.table_path(layer, tbl)).count()
        for layer, tbl in [
            (Layer.DOMAIN, "m_cliente"), (Layer.DOMAIN, "t_venta"),
            (Layer.DOMAIN, "t_pedido_detalle"),
            (Layer.ANALYTICS, "dim_clasificacion_cliente"),
            (Layer.ANALYTICS, "fact_reparto_detalle"),
        ]
    }
    dr2, ar2 = run(spark, root)
    assert not [r for r in dr2 + ar2 if r.status != "succeeded"]
    for (layer, tbl), n in counts1.items():
        assert spark.read.parquet(lake.table_path(layer, tbl)).count() == n, (
            f"{layer.value}/{tbl} changed row count on rerun"
        )
