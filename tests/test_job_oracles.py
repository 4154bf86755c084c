"""Value-level DuckDB differentials for EVERY hand-written job.

The 52-job pipeline test proves the layer-contract graph resolves and reruns
are idempotent; THESE tests prove the transforms compute the right VALUES:
every output column of each job is recomputed independently in DuckDB SQL
from the same input parquet and compared row-by-row (order-insensitive,
numerics normalized to 8dp to absorb decimal-scale differences between
engines — both engines are exact far beyond that on these fixtures).

Coverage: all 33 hand-written domain + analytics jobs (facts, masters,
dims). The 20 spec-generated conform/passthrough dims get their own
spec-derived DuckDB differentials in test_dim_factory_oracles.py (plus the
hand-pinned family tests in test_dim_factory.py) — every job in the
engine is value-checked. Each fixture is adversarial —
orphans, duplicates, out-of-window rows, NULL coalesce sources, zero-divisor
guards — and each test adds hand-computed pins so engine and oracle cannot
agree on a shared misreading.
"""

from __future__ import annotations
import pytest

# slow tier (per-job oracle replays (the driver re-proves these against DuckDB every round)) — skipped unless SPARK_GRAFT_SLOW_TESTS=1;
# fast-tier coverage of the same operators lives in the unit modules
pytestmark = pytest.mark.slow

import datetime as dt
from decimal import Decimal as D

import duckdb
import pandas as pd

from cdk_datalake_analytics_comercial_spark.core.catalog import Layer
from cdk_datalake_analytics_comercial_spark.jobs import ANALYTICS_JOBS, DOMAIN_JOBS
from cdk_datalake_analytics_comercial_spark.runner import JobConfig, JobContext, run_waves
from cdk_datalake_analytics_comercial_spark.sources.registry import SchemaRegistry

from test_runner_jobs import AS_OF, seed_cumplimiento_stage

TS = dt.datetime(2025, 5, 3, 8)


def canon(df: pd.DataFrame):
    """Order-insensitive canonical rows: numerics to 8dp, datetimes to ISO
    (midnight timestamps collapse to dates — DuckDB reads DATE as
    datetime64), NULL-likes unified."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
                vals.append("NULL")
            elif isinstance(v, (float, D)):
                vals.append(f"{float(v):.8f}")
            elif hasattr(v, "isoformat"):
                s = v.isoformat()
                vals.append(s[:10] if s.endswith("T00:00:00") else s)
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    rows.sort()
    return rows


def assert_match(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    a, b = canon(sdf), canon(odf)
    assert len(a) == len(b), f"{name}: rows spark={len(a)} oracle={len(b)}"
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"{name}: row {i} mismatch\n spark: {x}\n oracle: {y}"


def duck_with_views(views: dict[str, str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, path in views.items():
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/**/*.parquet')"
        )
    return con


# ===========================================================================
# 1. t_pedido_cumplimiento — the reference's biggest job, recomputed from
#    the STAGE universe of tests.test_runner_jobs.seed_cumplimiento_stage.
# ===========================================================================

_CUMPLIMIENTO_SQL = """
WITH compania AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
), irpv AS (
  SELECT i.cod_compania, i.cod_documento_pedido, i.cod_procedimiento_pedido,
         i.cod_documento_venta, i.cod_procedimiento_venta, i.cod_operacion_venta,
         i.cod_tipo_pedido, mp.cod_tipo_operacion
  FROM i_relacion_proced_venta i
  JOIN m_procedimiento mp
    ON i.cod_compania = mp.cod_compania
   AND i.cod_documento_pedido = mp.cod_documento_transaccion
   AND i.cod_procedimiento_pedido = mp.cod_procedimiento
), alm AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY cod_compania, cod_sucursal, cod_almacen_emisor_origen,
                   cod_documento_transaccion, nro_documento_almacen
      ORDER BY nro_documento_movimiento DESC) AS orden
  FROM t_movimiento_inventario
), main_lines AS (
  SELECT mc.id_pais, strftime(h.fecha_pedido, '%Y%m') AS id_periodo,
         d.cod_compania, d.cod_sucursal, d.cod_almacen,
         d.cod_documento_pedido, d.nro_documento_pedido,
         h.cod_tipo_pedido,
         COALESCE(h.cod_documento_pedido_origen, '000') AS cod_origen_pedido,
         h.cod_vendedor, d.cod_lista_precio, h.cod_condicion_pago AS cod_forma_pago,
         d.cod_zona, d.cod_ruta, d.cod_modulo, h.cod_fuerza_venta,
         d.cod_documento_almacen, d.nro_documento_almacen, d.cod_cliente,
         d.id_salesforce AS nro_pedido_ref, d.cod_articulo, d.cod_procedimiento,
         h.fecha_pedido, h.fecha_entrega,
         d.cant_paquete AS cantidad_cajas, d.cant_unidad AS cantidad_botellas,
         d.cant_paquete_asignado AS cantidad_cajas_asignada,
         d.cant_unidad_asignado AS cantidad_botellas_asignada,
         d.fecha_creacion, d.fecha_modificacion
  FROM t_documento_pedido_detalle d
  JOIN t_documento_pedido h
    ON d.cod_compania = h.cod_compania AND d.cod_sucursal = h.cod_sucursal
   AND d.cod_almacen = h.cod_almacen
   AND d.cod_documento_pedido = h.cod_documento_pedido
   AND d.nro_documento_pedido = h.nro_documento_pedido
   AND strftime(h.fecha_pedido, '%Y%m') IN ({periods})
  JOIN compania mc ON d.cod_compania = mc.cod_compania
  WHERE d.cod_documento_pedido = '200'
    AND strftime(d.fecha_pedido, '%Y%m') IN ({periods})
), ades_lines AS (
  SELECT mc.id_pais, strftime(h.fecha_pedido, '%Y%m') AS id_periodo,
         d.cod_compania, d.cod_sucursal, d.cod_almacen_emisor AS cod_almacen,
         d.cod_documento_transaccion AS cod_documento_pedido,
         d.nro_comprobante AS nro_documento_pedido,
         h.cod_tipo_pedido,
         COALESCE(h.cod_tipo_documento_origen, '000') AS cod_origen_pedido,
         h.cod_vendedor, d.cod_lista_precios AS cod_lista_precio,
         h.cod_condicion_pago AS cod_forma_pago,
         d.cod_zona_distribucion AS cod_zona, d.cod_ruta_distribucion AS cod_ruta,
         d.cod_modulo, h.cod_fuerza_venta,
         d.cod_tipo_documento_almacen AS cod_documento_almacen,
         d.nro_documento_almacen, d.cod_cliente,
         d.id_salesforce AS nro_pedido_ref, d.cod_articulo, d.cod_procedimiento,
         h.fecha_pedido, h.fecha_entrega,
         d.cantidad_cajas, d.cantidad_botellas AS cantidad_botellas,
         d.cantidad_cajas_asignada, d.cantidad_botellas_asignada,
         d.fecha_creacion, d.fecha_modificacion
  FROM t_documento_pedido_ades_detalle d
  JOIN t_documento_pedido_ades h
    ON d.cod_compania = h.cod_compania AND d.cod_sucursal = h.cod_sucursal
   AND d.cod_almacen_emisor = h.cod_almacen_emisor
   AND d.cod_documento_transaccion = h.cod_documento_transaccion
   AND d.nro_comprobante = h.nro_comprobante
   AND strftime(h.fecha_pedido, '%Y%m') IN ({periods})
  JOIN compania mc ON d.cod_compania = mc.cod_compania
  WHERE d.cod_documento_transaccion IN ('200', '300')
    AND strftime(d.fecha_pedido, '%Y%m') IN ({periods})
), lines_all AS (
  SELECT * FROM main_lines
  UNION ALL
  SELECT * FROM ades_lines e
  WHERE NOT EXISTS (
    SELECT 1 FROM main_lines m
    WHERE m.cod_compania = e.cod_compania AND m.cod_sucursal = e.cod_sucursal
      AND m.cod_almacen = e.cod_almacen
      AND m.cod_documento_pedido = e.cod_documento_pedido
      AND m.nro_documento_pedido = e.nro_documento_pedido)
), rollup AS (
  SELECT t.id_pais, t.cod_compania, t.cod_sucursal, t.cod_almacen,
         t.cod_documento_pedido, t.nro_documento_pedido, t.cod_cliente,
         t.cod_articulo, t.cod_documento_almacen, t.nro_documento_almacen,
         i.cod_documento_venta, i.cod_procedimiento_venta, i.cod_operacion_venta,
         MAX(t.id_periodo) AS id_periodo,
         MAX(i.cod_tipo_operacion) AS cod_tipo_operacion,
         MAX(t.cod_zona) AS cod_zona, MAX(t.cod_ruta) AS cod_ruta,
         SUM(t.cantidad_cajas) AS cantidad_cajas,
         SUM(t.cantidad_botellas) AS cantidad_botellas,
         SUM(t.cantidad_cajas_asignada) AS cantidad_cajas_asignada,
         SUM(t.cantidad_botellas_asignada) AS cantidad_botellas_asignada,
         SUM(CASE WHEN v.cod_documento_transaccion IS NULL THEN 0
                  ELSE t.cantidad_cajas_asignada END) AS cantidad_cajas_despechado,
         SUM(CASE WHEN v.cod_documento_transaccion IS NULL THEN 0
                  ELSE t.cantidad_botellas_asignada END) AS cantidad_botellas_despechado,
         MAX(t.fecha_creacion) AS fecha_creacion,
         MAX(t.fecha_modificacion) AS fecha_modificacion
  FROM lines_all t
  LEFT JOIN alm v
    ON t.cod_compania = v.cod_compania AND t.cod_sucursal = v.cod_sucursal
   AND t.cod_almacen = v.cod_almacen_emisor_origen
   AND t.cod_documento_almacen = v.cod_documento_transaccion
   AND t.nro_documento_almacen = v.nro_documento_almacen
   AND v.orden = 1 AND v.cod_estado_comprobante IN ('PLI', 'LIQ')
  LEFT JOIN irpv i
    ON t.cod_compania = i.cod_compania
   AND t.cod_documento_pedido = i.cod_documento_pedido
   AND t.cod_tipo_pedido = i.cod_tipo_pedido
   AND t.cod_procedimiento = i.cod_procedimiento_pedido
  GROUP BY 1,2,3,4,5,6,7,8,9,10,11,12,13
), unico AS (
  SELECT DISTINCT cod_compania, cod_sucursal, cod_almacen, cod_documento_pedido,
         nro_documento_pedido, cod_documento_almacen, nro_documento_almacen,
         cod_documento_venta, cod_procedimiento_venta, cod_operacion_venta
  FROM rollup WHERE COALESCE(cod_documento_almacen, '') <> ''
), resumen AS (
  SELECT h.cod_compania, h.cod_sucursal, h.cod_almacen,
         u.cod_documento_almacen, u.nro_documento_almacen,
         h.cod_documento_pedido, h.nro_documento_pedido, h.cod_cliente,
         dd.cod_articulo, h.cod_documento_venta, h.cod_procedimiento,
         dd.cod_operacion,
         MAX(h.fecha_liquidacion) AS fecha_liquidacion,
         SUM((CASE WHEN h.cod_documento_venta = 'NCC' THEN -1 ELSE 1 END)
             * dd.cant_paquete) AS cantidad_cajas,
         SUM((CASE WHEN h.cod_documento_venta = 'NCC' THEN -1 ELSE 1 END)
             * dd.cant_unidad) AS cantidad_botellas
  FROM t_documento_venta h
  JOIN t_documento_venta_detalle dd
    ON h.cod_compania = dd.cod_compania AND h.cod_sucursal = dd.cod_sucursal
   AND h.cod_almacen = dd.cod_almacen
   AND h.cod_documento_venta = dd.cod_documento_venta
   AND h.nro_documento_venta = dd.nro_documento_venta
  JOIN unico u
    ON h.cod_compania = u.cod_compania AND h.cod_sucursal = u.cod_sucursal
   AND h.cod_almacen = u.cod_almacen
   AND h.cod_documento_pedido = u.cod_documento_pedido
   AND h.nro_documento_pedido = u.nro_documento_pedido
   AND h.cod_documento_almacen = u.cod_documento_almacen
   AND h.nro_documento_almacen = u.nro_documento_almacen
   AND h.cod_documento_venta = u.cod_documento_venta
   AND h.cod_procedimiento = u.cod_procedimiento_venta
   AND dd.cod_operacion = u.cod_operacion_venta
  WHERE h.cod_documento_venta NOT IN ('RMD', 'CMD')
    AND h.cod_estado_comprobante <> '002'
  GROUP BY 1,2,3,4,5,6,7,8,9,10,11,12
), final AS (
  SELECT r.cod_compania, r.cod_sucursal, r.cod_almacen, r.cod_documento_pedido,
         r.nro_documento_pedido, r.cod_cliente, r.cod_articulo,
         COALESCE(r.cod_documento_almacen, '') AS cod_documento_almacen,
         COALESCE(r.nro_documento_almacen, '') AS nro_documento_almacen,
         MAX(r.id_pais) AS id_pais, MAX(r.id_periodo) AS id_periodo,
         MAX(s.fecha_liquidacion) AS fecha_liquidacion,
         {conv_aggs},
         MAX(r.fecha_creacion) AS fecha_creacion,
         MAX(r.fecha_modificacion) AS fecha_modificacion,
         MAX(r.cod_zona) AS cod_zona, MAX(r.cod_ruta) AS cod_ruta
  FROM rollup r
  LEFT JOIN resumen s
    ON r.cod_compania = s.cod_compania AND r.cod_sucursal = s.cod_sucursal
   AND r.cod_almacen = s.cod_almacen
   AND r.cod_documento_pedido = s.cod_documento_pedido
   AND r.nro_documento_pedido = s.nro_documento_pedido
   AND r.cod_cliente = s.cod_cliente AND r.cod_articulo = s.cod_articulo
   AND r.cod_documento_almacen = s.cod_documento_almacen
   AND r.nro_documento_almacen = s.nro_documento_almacen
   AND r.cod_documento_venta = s.cod_documento_venta
   AND r.cod_procedimiento_venta = s.cod_procedimiento
   AND r.cod_operacion_venta = s.cod_operacion
  JOIN m_articulo m
    ON r.cod_compania = m.cod_compania AND r.cod_articulo = m.cod_articulo
  GROUP BY 1,2,3,4,5,6,7,8,9
)
SELECT id_pais, id_periodo,
       concat_ws('|', trim(cod_compania), trim(cod_sucursal)) AS id_sucursal,
       concat_ws('|', trim(cod_compania), trim(cod_sucursal),
                 trim(cod_documento_pedido), trim(nro_documento_pedido),
                 trim(cod_cliente)) AS id_pedido,
       concat_ws('|', trim(cod_compania), trim(cod_articulo)) AS id_producto,
       CASE WHEN cod_documento_almacen <> '' THEN
         concat_ws('|', trim(cod_compania), trim(cod_sucursal), trim(cod_almacen),
                   trim(cod_documento_almacen), trim(nro_documento_almacen))
       END AS id_reparto,
       fecha_liquidacion,
       cant_cajafisica_ped, cant_cajafisica_ped_pro,
       cant_cajafisica_asignado_ped, cant_cajafisica_asignado_ped_pro,
       cant_cajafisica_desp, cant_cajafisica_desp_pro,
       cant_cajavolumen_ped, cant_cajavolumen_ped_pro,
       cant_cajavolumen_asignado_ped, cant_cajavolumen_asignado_ped_pro,
       cant_cajavolumen_desp, cant_cajavolumen_desp_pro,
       cant_caja_fisica_ven, cant_caja_volumen_ven,
       cant_caja_fisica_pro, cant_caja_volumen_pro,
       cod_zona, cod_ruta, fecha_creacion, fecha_modificacion
FROM final
"""


def _conv_aggs_sql() -> str:
    """The 16 Ven/Pro-split unit-converted aggregates, mirroring the job's
    ``conv`` builder (decimal(20,6) casts, física = cajas + bot/upaq,
    volumen = (cajas·upaq + bot)·uvol)."""

    def dec(c):
        return f"CAST({c} AS DECIMAL(20,6))"

    def expr(cajas, bot, fisica):
        if fisica:
            return f"({dec(cajas)} + {dec(bot)} / {dec('m.cant_unidad_paquete')})"
        return (
            f"(({dec(cajas)} * {dec('m.cant_unidad_paquete')} + {dec(bot)})"
            f" * {dec('m.cant_unidad_volumen')})"
        )

    def conv(op, cajas, bot, fisica, alias):
        return (
            f"SUM(CASE WHEN lower(r.cod_tipo_operacion) = '{op}' THEN "
            f"CAST({expr(cajas, bot, fisica)} AS DECIMAL(38,12)) ELSE 0 END) AS {alias}"
        )

    q = {
        "ped": ("r.cantidad_cajas", "r.cantidad_botellas"),
        "asignado_ped": ("r.cantidad_cajas_asignada", "r.cantidad_botellas_asignada"),
        "desp": ("r.cantidad_cajas_despechado", "r.cantidad_botellas_despechado"),
    }
    out = []
    for name, (cajas, bot) in q.items():
        out += [
            conv("ven", cajas, bot, True, f"cant_cajafisica_{name}"),
            conv("ven", cajas, bot, False, f"cant_cajavolumen_{name}"),
            conv("pro", cajas, bot, True, f"cant_cajafisica_{name}_pro"),
            conv("pro", cajas, bot, False, f"cant_cajavolumen_{name}_pro"),
        ]
    sold = ("s.cantidad_cajas", "s.cantidad_botellas")
    out += [
        conv("ven", *sold, True, "cant_caja_fisica_ven"),
        conv("ven", *sold, False, "cant_caja_volumen_ven"),
        conv("pro", *sold, True, "cant_caja_fisica_pro"),
        conv("pro", *sold, False, "cant_caja_volumen_pro"),
    ]
    return ",\n         ".join(out)


def test_t_pedido_cumplimiento_duckdb_differential(spark, lake):
    reg = seed_cumplimiento_stage(spark, lake)

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves(
        [JobConfig("domain", "t_pedido_cumplimiento_lite", 1, periods=2)],
        DOMAIN_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_pedido_cumplimiento")
    ).toPandas()

    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    con = duck_with_views(
        {
            "m_pais": stage("m_pais", "principal"),
            "m_compania": stage("m_compania"),
            "m_procedimiento": stage("m_procedimiento"),
            "i_relacion_proced_venta": stage("i_relacion_proced_venta"),
            "t_movimiento_inventario": stage("t_movimiento_inventario"),
            "t_documento_pedido": stage("t_documento_pedido"),
            "t_documento_pedido_detalle": stage("t_documento_pedido_detalle"),
            "t_documento_pedido_ades": stage("t_documento_pedido_ades"),
            "t_documento_pedido_ades_detalle": stage("t_documento_pedido_ades_detalle"),
            "t_documento_venta": stage("t_documento_venta"),
            "t_documento_venta_detalle": stage("t_documento_venta_detalle"),
            "m_articulo": stage("m_articulo"),
        }
    )
    periods = "'202504', '202505'"
    odf = con.sql(
        _CUMPLIMIENTO_SQL.format(periods=periods, conv_aggs=_conv_aggs_sql())
    ).df()
    assert_match(sdf, odf, "t_pedido_cumplimiento")
    assert len(sdf) >= 4  # fixture produces the 4-line surface (3 main + ADES)


# ===========================================================================
# 2. fact_cliente_venta — monthly base + trailing 3/12-month rollups + the
#    '_nn' branch, recomputed from its DOMAIN/ANALYTICS inputs.
# ===========================================================================

_GENERAL_ROLL = [
    "cant_caja_fisica_ven", "cant_caja_unitaria_ven", "cant_caja_fisica_pro",
    "cant_caja_unitaria_pro", "imp_neto_mn", "imp_neto_me", "imp_bruto_mn",
    "imp_bruto_me",
]

_FCV_SQL = """
WITH venta AS (
  SELECT * FROM t_venta WHERE id_periodo IN ({periods})
), detalle AS (
  SELECT * FROM t_venta_detalle WHERE id_periodo IN ({periods})
), base AS (
  SELECT tv.id_pais, tv.id_periodo, tv.cod_compania AS id_compania,
         tv.id_cliente, tv.cod_modulo, tv.id_venta, tv.fecha_liquidacion,
         tvd.id_producto, tvd.cant_caja_fisica_ven, tvd.cant_caja_volumen_ven,
         tvd.cant_caja_fisica_pro, tvd.cant_caja_volumen_pro,
         tvd.imp_neto_vta_mn, tvd.imp_neto_vta_me,
         tvd.imp_cobrar_vta_mn, tvd.imp_cobrar_vta_me,
         dp.desc_marca, dp.cod_unidad_negocio
  FROM venta tv
  JOIN detalle tvd ON tv.id_venta = tvd.id_venta AND tv.es_eliminado = 0
  LEFT JOIN dim_producto dp ON tvd.id_producto = dp.id_producto
), monthly AS (
  SELECT id_pais, id_periodo, id_compania, id_cliente, cod_modulo,
         SUM(cant_caja_volumen_ven) / 30 AS cant_caja_unitaria_ven,
         SUM(imp_neto_vta_mn) AS imp_neto_mn,
         COUNT(DISTINCT desc_marca) AS cant_marca,
         COUNT(DISTINCT id_venta) AS cant_venta,
         MAX(fecha_liquidacion) AS ult_fecha_compra_cliente,
         SUM(cant_caja_fisica_ven) AS cant_caja_fisica_ven,
         SUM(cant_caja_fisica_pro) AS cant_caja_fisica_pro,
         SUM(cant_caja_volumen_pro) / 30 AS cant_caja_unitaria_pro,
         SUM(imp_neto_vta_me) AS imp_neto_me,
         SUM(imp_cobrar_vta_mn) AS imp_bruto_mn,
         SUM(imp_cobrar_vta_me) AS imp_bruto_me,
         COUNT(DISTINCT id_producto) AS cant_producto
  FROM base GROUP BY 1,2,3,4,5
), monthly_nn AS (
  SELECT id_pais, id_periodo, id_compania, id_cliente, cod_modulo,
         SUM(cant_caja_volumen_ven) / 30 AS cant_caja_unitaria_ven,
         SUM(imp_neto_vta_mn) AS imp_neto_mn,
         COUNT(DISTINCT desc_marca) AS cant_marca,
         COUNT(DISTINCT id_venta) AS cant_venta,
         MAX(fecha_liquidacion) AS ult_fecha_compra_cliente
  FROM base WHERE cod_unidad_negocio = '003' GROUP BY 1,2,3,4,5
), gen AS (
  SELECT *,
         CAST(substr(id_periodo, 1, 4) AS INT) * 12
           + CAST(substr(id_periodo, 5, 2) AS INT) - 1 AS m_idx
  FROM monthly
), gen_rolled AS (
  SELECT *, {gen_windows} FROM gen
), nn AS (
  SELECT *,
         CAST(substr(id_periodo, 1, 4) AS INT) * 12
           + CAST(substr(id_periodo, 5, 2) AS INT) - 1 AS m_idx
  FROM monthly_nn
), nn_rolled AS (
  SELECT *, {nn_windows} FROM nn
)
SELECT g.id_pais, g.id_periodo, g.id_compania, g.id_cliente, g.cod_modulo,
       {gen_out},
       CAST(g.cant_producto AS INT) AS cant_producto,
       CAST(g.cant_venta AS INT) AS cant_venta,
       CAST(g.cant_marca AS INT) AS cant_marca,
       g.ult_fecha_compra_cliente,
       CAST(datediff('day', g.ult_fecha_compra_cliente, DATE '{as_of}') AS INT)
         AS ult_dia_compra_cliente,
       CAST(trunc(n.cant_caja_unitaria_ven_12meses) AS INT) AS cant_caja_unit_venta_12meses_nn,
       CAST(trunc(n.cant_caja_unitaria_ven_3meses) AS INT) AS cant_caja_unit_venta_3meses_nn,
       CAST(n.imp_neto_mn_12meses AS DECIMAL(38,12)) AS imp_neto_mn_12meses_nn,
       CAST(n.imp_neto_mn_3meses AS DECIMAL(38,12)) AS imp_neto_mn_3meses_nn,
       n.ult_fecha_compra_cliente AS ult_fecha_compra_12meses_nn,
       CAST(n.cant_venta AS INT) AS cant_venta_nn,
       CAST(n.cant_marca AS INT) AS cant_marca_nn
FROM gen_rolled g
LEFT JOIN nn_rolled n
  ON g.id_pais = n.id_pais AND g.id_periodo = n.id_periodo
 AND g.id_compania = n.id_compania AND g.id_cliente = n.id_cliente
 AND g.cod_modulo = n.cod_modulo
"""


def _fcv_windows(cols: list[str]) -> str:
    w = (
        "OVER (PARTITION BY id_pais, id_compania, id_cliente, cod_modulo "
        "ORDER BY m_idx RANGE BETWEEN {m} PRECEDING AND CURRENT ROW)"
    )
    parts = []
    for m in (3, 12):
        for c in cols:
            parts.append(f"SUM(COALESCE({c}, 0)) {w.format(m=m)} AS {c}_{m}meses")
    return ",\n         ".join(parts)


def test_fact_cliente_venta_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    ana = lambda t: lake.table_path(Layer.ANALYTICS, t)  # noqa: E731
    d = dt.date
    # three periods × two clients; an es_eliminado=1 doc, an orphan product
    # (null marca via the left join), a '003' unidad-negocio product feeding
    # the _nn branch, an out-of-window period that must be filtered
    venta = [
        # id_venta, id_pais, id_periodo, cod_compania, id_cliente, cod_modulo,
        # es_eliminado, fecha_liquidacion
        ("V1", "PE", "202503", "10", "C1", "M1", 0, d(2025, 3, 10)),
        ("V2", "PE", "202504", "10", "C1", "M1", 0, d(2025, 4, 11)),
        ("V3", "PE", "202505", "10", "C1", "M1", 0, d(2025, 5, 12)),
        ("V4", "PE", "202505", "10", "C1", "M1", 1, d(2025, 5, 13)),  # deleted
        ("V5", "PE", "202505", "10", "C2", "M2", 0, d(2025, 5, 9)),
        ("V6", "PE", "202401", "10", "C1", "M1", 0, d(2024, 1, 5)),   # out of window
    ]
    detalle = [
        # id_venta, id_periodo, id_producto, caja_fisica_ven, caja_volumen_ven,
        # caja_fisica_pro, caja_volumen_pro, neto_mn, neto_me, cobrar_mn, cobrar_me
        ("V1", "202503", "P1", D("2"), D("60"), D("0"), D("0"),
         D("100"), D("25"), D("110"), D("27")),
        ("V2", "202504", "P1", D("3"), D("90"), D("1"), D("30"),
         D("200"), D("50"), D("220"), D("55")),
        ("V2", "202504", "P2", D("1"), D("15"), D("0"), D("0"),
         D("40"), D("10"), D("44"), D("11")),
        ("V3", "202505", "P3", D("5"), D("150"), D("0"), D("0"),
         D("500"), D("125"), D("550"), D("137.5")),
        ("V3", "202505", "PX", D("1"), D("30"), D("0"), D("0"),
         D("10"), D("2.5"), D("11"), D("2.75")),   # orphan product
        ("V4", "202505", "P1", D("9"), D("270"), D("0"), D("0"),
         D("900"), D("225"), D("990"), D("247.5")),  # deleted doc's line
        ("V5", "202505", "P2", D("4"), D("120"), D("2"), D("60"),
         D("400"), D("100"), D("440"), D("110")),
        ("V6", "202401", "P1", D("7"), D("210"), D("0"), D("0"),
         D("700"), D("175"), D("770"), D("192.5")),
    ]
    producto = [
        ("P1", "CIELO", None),
        ("P2", "BIG", "003"),
        ("P3", "CIELO", "003"),
        # PX intentionally absent
    ]
    spark.createDataFrame(
        venta,
        "id_venta string, id_pais string, id_periodo string, cod_compania string, "
        "id_cliente string, cod_modulo string, es_eliminado int, fecha_liquidacion date",
    ).write.mode("overwrite").parquet(dom("t_venta"))
    spark.createDataFrame(
        detalle,
        "id_venta string, id_periodo string, id_producto string, "
        "cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12), "
        "cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12), "
        "imp_neto_vta_mn decimal(38,12), imp_neto_vta_me decimal(38,12), "
        "imp_cobrar_vta_mn decimal(38,12), imp_cobrar_vta_me decimal(38,12)",
    ).write.mode("overwrite").parquet(dom("t_venta_detalle"))
    spark.createDataFrame(
        producto,
        "id_producto string, desc_marca string, cod_unidad_negocio string",
    ).write.mode("overwrite").parquet(ana("dim_producto"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "fact_cliente_venta_lite", 1, periods=3)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "fact_cliente_venta")).toPandas()

    con = duck_with_views(
        {
            "t_venta": dom("t_venta"),
            "t_venta_detalle": dom("t_venta_detalle"),
            "dim_producto": ana("dim_producto"),
        }
    )
    gen_out = ",\n       ".join(
        f"CAST(g.{c}_{m}meses AS DECIMAL(38,12)) AS {c}_{m}meses"
        for c in _GENERAL_ROLL for m in (3, 12)
    )
    odf = con.sql(
        _FCV_SQL.format(
            periods="'202503', '202504', '202505'",
            gen_windows=_fcv_windows(_GENERAL_ROLL),
            nn_windows=_fcv_windows(["cant_caja_unitaria_ven", "imp_neto_mn"]),
            gen_out=gen_out,
            as_of=AS_OF.isoformat(),
        )
    ).df()
    assert_match(sdf, odf, "fact_cliente_venta")
    # hand-computed pins (guard against engine+oracle agreeing on a shared
    # misreading): C1/May 3-month trailing fisica_ven = Mar 2 + Apr (3+1)
    # + May (5+1) = 12; the out-of-window V6 (7 cajas) must NOT be in the
    # 12-month total either because the period filter runs FIRST
    may_c1 = sdf[(sdf.id_cliente == "C1") & (sdf.id_periodo == "202505")].iloc[0]
    assert float(may_c1["cant_caja_fisica_ven_3meses"]) == 12.0
    assert float(may_c1["cant_caja_fisica_ven_12meses"]) == 12.0
    # deleted doc V4's 9 cajas excluded; orphan PX still counted as product
    assert int(may_c1["cant_producto"]) == 2  # P3 + PX in May
    assert len(sdf) >= 4


# ===========================================================================
# 3. fact_kpi — double FULL OUTER stitch at line grain, recomputed from its
#    DOMAIN inputs.
# ===========================================================================

_KPI_SQL = """
WITH pedido AS (
  SELECT * FROM t_pedido WHERE id_periodo IN ({periods})
), pedido_det AS (
  SELECT * FROM t_pedido_detalle WHERE id_periodo IN ({periods})
), ped AS (
  SELECT tp.id_pais, tp.id_pedido, tp.id_periodo, tp.id_sucursal, tp.id_cliente,
         tpd.id_articulo, tp.id_vendedor, tp.id_supervisor, tp.id_fuerza_venta,
         tp.id_modelo_atencion, tp.id_origen_pedido, tp.fecha_pedido,
         tp.cod_tipo_atencion, tp.id_visita AS id_visita_pedido,
         tp.id_cliente AS id_cliente_pedido
  FROM pedido tp
  JOIN pedido_det tpd ON tp.id_pedido = tpd.id_pedido
  WHERE tp.cod_tipo_documento_pedido = '200'
), ven AS (
  SELECT tv.id_pais, tv.id_sucursal, tp.id_periodo, tv.id_pedido, tv.id_cliente,
         tvd.id_producto,
         tvd.cant_caja_fisica_ven AS cant_cajafisica_vta,
         tvd.cant_caja_volumen_ven / 30 AS cant_cajaunitaria_vta,
         tvd.cant_caja_fisica_pro AS cant_cajafisica_pro,
         tvd.cant_caja_volumen_pro / 30 AS cant_cajaunitaria_pro,
         tvd.imp_neto_vta_mn, tvd.imp_neto_vta_me,
         tvd.imp_bruto_vta_mn, tvd.imp_bruto_vta_me,
         tv.id_cliente AS id_cliente_venta
  FROM pedido tp
  JOIN t_venta tv ON tp.id_pedido = tv.id_pedido
  JOIN t_venta_detalle tvd ON tv.id_venta = tvd.id_venta
  JOIN m_tipo_venta mtv
    ON tv.id_tipo_venta = mtv.id_tipo_venta
   AND upper(mtv.cod_tipo_operacion) IN ('VEN', 'PRO')
  WHERE tp.cod_tipo_documento_pedido = '200'
    AND tv.es_eliminado = 0
    AND tv.cod_documento_venta NOT IN ('CMD', 'RMD')
), resumen AS (
  SELECT COALESCE(tp.id_pais, tv.id_pais) AS id_pais,
         COALESCE(tp.id_periodo, tv.id_periodo) AS id_periodo,
         COALESCE(tp.id_pedido, tv.id_pedido) AS id_pedido,
         COALESCE(tp.id_sucursal, tv.id_sucursal) AS id_sucursal,
         COALESCE(tp.id_cliente, tv.id_cliente) AS id_cliente,
         COALESCE(tp.id_articulo, tv.id_producto) AS id_articulo,
         tp.id_vendedor, tp.id_supervisor, tp.id_fuerza_venta,
         tp.id_modelo_atencion, tp.id_origen_pedido, tp.fecha_pedido,
         tp.id_visita_pedido AS id_visita, tp.id_visita_pedido,
         tp.id_cliente_pedido, tp.cod_tipo_atencion,
         tp.id_visita_pedido AS id_visita_venta,
         tv.id_cliente_venta, tv.cant_cajafisica_vta, tv.cant_cajaunitaria_vta,
         tv.cant_cajafisica_pro, tv.cant_cajaunitaria_pro,
         tv.imp_neto_vta_mn, tv.imp_neto_vta_me,
         tv.imp_bruto_vta_mn, tv.imp_bruto_vta_me
  FROM ped tp
  FULL OUTER JOIN ven tv
    ON tp.id_pedido = tv.id_pedido AND tp.id_articulo = tv.id_producto
)
SELECT COALESCE(tv.id_pais, r.id_pais) AS id_pais,
       COALESCE(tv.id_periodo, r.id_periodo) AS id_periodo,
       COALESCE(tv.id_sucursal, r.id_sucursal) AS id_sucursal,
       COALESCE(tv.id_cliente, r.id_cliente) AS id_cliente,
       r.id_articulo AS id_producto,
       r.id_vendedor, r.id_supervisor, r.id_fuerza_venta, r.id_modelo_atencion,
       r.id_origen_pedido,
       COALESCE(r.fecha_pedido, tv.fecha_visita) AS fecha_pedido,
       r.cod_tipo_atencion,
       COALESCE(tv.id_visita, r.id_pedido) AS id_visita,
       r.id_visita_pedido, r.id_visita_venta,
       tv.id_cliente AS id_cliente_visita,
       COALESCE(tv.id_cliente, r.id_cliente_pedido) AS id_cliente_visita_pedido,
       COALESCE(tv.id_cliente, r.id_cliente_venta) AS id_cliente_visita_venta,
       CAST(r.cant_cajafisica_vta AS DECIMAL(38,12)) AS cant_cajafisica_vta,
       CAST(r.cant_cajaunitaria_vta AS DECIMAL(38,12)) AS cant_cajaunitaria_vta,
       CAST(r.cant_cajafisica_pro AS DECIMAL(38,12)) AS cant_cajafisica_pro,
       CAST(r.cant_cajaunitaria_pro AS DECIMAL(38,12)) AS cant_cajaunitaria_pro,
       CAST(r.imp_neto_vta_mn AS DECIMAL(38,12)) AS imp_neto_vta_mn,
       CAST(r.imp_neto_vta_me AS DECIMAL(38,12)) AS imp_neto_vta_me,
       CAST(r.imp_bruto_vta_mn AS DECIMAL(38,12)) AS imp_bruto_vta_mn,
       CAST(r.imp_bruto_vta_me AS DECIMAL(38,12)) AS imp_bruto_vta_me
FROM t_visita tv
FULL OUTER JOIN resumen r ON r.id_visita = tv.id_visita
"""


def test_fact_kpi_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    d = dt.date
    spark.createDataFrame(
        [
            # id_pedido, id_pais, id_periodo, id_sucursal, id_cliente,
            # id_vendedor, id_supervisor, id_fuerza_venta, id_modelo_atencion,
            # id_origen_pedido, fecha_pedido, cod_tipo_atencion, id_visita,
            # cod_tipo_documento_pedido
            ("PD1", "PE", "202505", "10|01", "10|C1", "10|V9", "10|S1", "10|01|F1",
             "MA1", "10|000", d(2025, 5, 2), "TA", "VIS1", "200"),
            ("PD2", "PE", "202505", "10|01", "10|C2", "10|V9", None, "10|01|F1",
             "MA1", "10|000", d(2025, 5, 3), "TA", None, "200"),   # no visit ptr
            ("PD3", "PE", "202505", "10|01", "10|C3", "10|V9", None, "10|01|F1",
             "MA1", "10|000", d(2025, 5, 4), "TA", "VISX", "300"),  # excluded type
        ],
        "id_pedido string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, id_vendedor string, id_supervisor string, "
        "id_fuerza_venta string, id_modelo_atencion string, id_origen_pedido string, "
        "fecha_pedido date, cod_tipo_atencion string, id_visita string, "
        "cod_tipo_documento_pedido string",
    ).write.mode("overwrite").parquet(dom("t_pedido"))
    spark.createDataFrame(
        [
            ("PD1", "202505", "10|A1"),
            ("PD1", "202505", "10|A2"),   # ordered, never sold
            ("PD2", "202505", "10|A1"),
            ("PD3", "202505", "10|A1"),
        ],
        "id_pedido string, id_periodo string, id_articulo string",
    ).write.mode("overwrite").parquet(dom("t_pedido_detalle"))
    spark.createDataFrame(
        [
            # id_venta, id_pedido, id_pais, id_sucursal, id_cliente,
            # id_tipo_venta, es_eliminado, cod_documento_venta
            ("VT1", "PD1", "PE", "10|01", "10|C1", "TV1", 0, "FAC"),
            ("VT2", "PD2", "PE", "10|01", "10|C2", "TV2", 0, "FAC"),  # excluded op
            ("VT3", "PD1", "PE", "10|01", "10|C1", "TV1", 1, "FAC"),  # deleted
            ("VT4", "PD1", "PE", "10|01", "10|C1", "TV1", 0, "CMD"),  # CMD
        ],
        "id_venta string, id_pedido string, id_pais string, id_sucursal string, "
        "id_cliente string, id_tipo_venta string, es_eliminado int, "
        "cod_documento_venta string",
    ).write.mode("overwrite").parquet(dom("t_venta"))
    spark.createDataFrame(
        [
            # sold line matching an ordered article → inner region of FULL
            ("VT1", "10|A1", D("2"), D("60"), D("0"), D("0"),
             D("100"), D("25"), D("110"), D("27.5")),
            # sold article never ordered → venta-only region of FULL
            ("VT1", "10|A9", D("1"), D("30"), D("0"), D("0"),
             D("50"), D("12.5"), D("55"), D("13.75")),
            ("VT2", "10|A1", D("4"), D("120"), D("0"), D("0"),
             D("400"), D("100"), D("440"), D("110")),
            ("VT3", "10|A1", D("9"), D("270"), D("0"), D("0"),
             D("900"), D("225"), D("990"), D("247.5")),
            ("VT4", "10|A1", D("8"), D("240"), D("0"), D("0"),
             D("800"), D("200"), D("880"), D("220")),
        ],
        "id_venta string, id_producto string, "
        "cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12), "
        "cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12), "
        "imp_neto_vta_mn decimal(38,12), imp_neto_vta_me decimal(38,12), "
        "imp_bruto_vta_mn decimal(38,12), imp_bruto_vta_me decimal(38,12)",
    ).write.mode("overwrite").parquet(dom("t_venta_detalle"))
    spark.createDataFrame(
        [
            ("VIS1", "PE", "202505", "10|01", "10|C1", d(2025, 5, 1)),
            ("VIS9", "PE", "202505", "10|01", "10|C9", d(2025, 5, 6)),  # visit-only
        ],
        "id_visita string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, fecha_visita date",
    ).write.mode("overwrite").parquet(dom("t_visita"))
    spark.createDataFrame(
        [("TV1", "VEN"), ("TV2", "OTR")],
        "id_tipo_venta string, cod_tipo_operacion string",
    ).write.mode("overwrite").parquet(dom("m_tipo_venta"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "fact_kpi_lite", 1, periods=3)], ANALYTICS_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "fact_kpi_detalle")).toPandas()

    con = duck_with_views(
        {
            "t_pedido": dom("t_pedido"),
            "t_pedido_detalle": dom("t_pedido_detalle"),
            "t_venta": dom("t_venta"),
            "t_venta_detalle": dom("t_venta_detalle"),
            "t_visita": dom("t_visita"),
            "m_tipo_venta": dom("m_tipo_venta"),
        }
    )
    odf = con.sql(_KPI_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "fact_kpi")
    # all three FULL OUTER regions are populated: order-only (A2), sale-only
    # (A9), visit-only (VIS9)
    prods = set(sdf["id_producto"].dropna())
    assert "10|A2" in prods and "10|A9" in prods
    assert (sdf["id_producto"].isna() & sdf["id_cliente"].eq("10|C9")).any()
    # hand pins: the ordered-never-sold A2 row carries NULL sale metrics;
    # PD2's sale went through the excluded 'OTR' op so its A1 row is also
    # order-only; the deleted VT3 / CMD VT4 quantities (9, 8) appear nowhere
    a2 = sdf[sdf.id_producto.eq("10|A2")].iloc[0]
    assert pd.isna(a2["cant_cajafisica_vta"])
    pd2_a1 = sdf[sdf.id_producto.eq("10|A1") & sdf.id_cliente.eq("10|C2")].iloc[0]
    assert pd.isna(pd2_a1["cant_cajafisica_vta"])
    sold = sdf["cant_cajafisica_vta"].dropna().astype(float)
    assert set(sold) == {2.0, 1.0}


# ===========================================================================
# 4. t_venta_detalle — the numerically richest job (33-aggregate money
#    surface with the SURVEY §7.3.1 decimal-semantics risk), recomputed
#    from STAGE + the DOMAIN header.
# ===========================================================================


def _tvd_money_sql() -> str:
    """sum(dispatch × sign × decimal(20,6)-cast expression) for the full
    (mn, me) money surface, mirroring the job's ``money_pair`` builder."""

    def dec(c):
        return f"CAST({c} AS DECIMAL(20,6))"

    cajas = (
        f"(({dec('d.cant_paquete')} + {dec('d.cant_unidad')} / "
        f"{dec('ma.cant_unidad_paquete')}) * {dec('ma.cant_paquete_caja')})"
    )
    volumen = (
        f"(({dec('d.cant_paquete')} * {dec('ma.cant_unidad_paquete')} + "
        f"{dec('d.cant_unidad')}) * {dec('ma.cant_unidad_volumen')})"
    )

    def signed(dispatch, expr, alias):
        return (
            f"SUM(CAST({dispatch} * factor * {expr} AS DECIMAL(38,12))) AS {alias}"
        )

    def pair(dispatch, src, name):
        return [
            signed(dispatch, f"{dec(src)} * {dec('v.tipo_cambio_mn')}", f"{name}_mn"),
            signed(dispatch, f"{dec(src)} / {dec('v.tipo_cambio_me')}", f"{name}_me"),
        ]

    aggs = [
        signed("d_ven", cajas, "cant_caja_fisica_ven"),
        signed("d_pro", cajas, "cant_caja_fisica_pro"),
        signed("d_ven", volumen, "cant_caja_volumen_ven"),
        signed("d_pro", volumen, "cant_caja_volumen_pro"),
        *pair("d_ven", "d.imp_valorizado", "imp_neto_vta"),
        *pair("d_ven", "d.imp_cobrar", "imp_bruto_vta"),
        *pair("d_ven", "d.imp_descuento", "imp_dscto"),
        *pair("d_ven", "d.imp_descuento_sinimp", "imp_desnimp"),
        *pair("d_ven", "d.imp_cobrar", "imp_cobrar_vta"),
        signed(
            "d_ven",
            f"{cajas} * {dec('d.precio_paquete')} * {dec('v.tipo_cambio_mn')}",
            "imp_paquete_vta_mn",
        ),
        signed(
            "d_ven",
            f"{cajas} * {dec('d.precio_paquete')} / {dec('v.tipo_cambio_me')}",
            "imp_paquete_vta_me",
        ),
        *pair("d_ven", "0", "imp_sugerido"),
        *pair("d_ven", "0", "imp_full_vta"),
        *pair("d_pro", "d.imp_valorizado", "imp_valorizado_pro"),
        *pair("d_ven", "d.imp_isc", "imp_impuesto1"),
        *pair("d_ven", "d.imp_igv", "imp_impuesto2"),
        *pair("d_ven", "d.imp_im3", "imp_impuesto3"),
        *pair("d_ven", "d.imp_im4", "imp_impuesto4"),
        *pair("d_ven", "d.imp_im5", "imp_impuesto5"),
        *pair("d_ven", "d.imp_im6", "imp_impuesto6"),
    ]
    return ",\n         ".join(aggs)


def test_t_venta_detalle_duckdb_differential(spark, lake):
    from test_runner_jobs import seed_venta_detalle_stage

    reg = seed_venta_detalle_stage(spark, lake)

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves(
        [JobConfig("domain", "t_venta_detalle_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "t_venta_detalle")).toPandas()

    con = duck_with_views(
        {
            "t_venta": lake.table_path(Layer.DOMAIN, "t_venta"),
            "t_documento_venta_detalle": lake.table_path(
                Layer.STAGE, "t_documento_venta_detalle", "pe01"
            ),
            "m_articulo": lake.table_path(Layer.STAGE, "m_articulo", "pe01"),
            "m_operacion": lake.table_path(Layer.STAGE, "m_operacion", "pe01"),
        }
    )
    # the joined subquery needs v./ma./mo. columns under the aliases used by
    # _tvd_money_sql: rename via a flat projection, aliasing d/v/ma columns
    sql = """
WITH det AS (
  SELECT *, concat_ws('|', trim(cod_compania), trim(cod_sucursal), trim(cod_almacen),
                      trim(cod_documento_venta), trim(nro_documento_venta)) AS id_venta
  FROM t_documento_venta_detalle
)
SELECT d.id_venta, d.cod_articulo AS id_producto,
       MAX(v.id_pais) AS id_pais, MAX(v.id_periodo) AS id_periodo,
       {money},
       MAX(d.fecha_creacion) AS fecha_creacion,
       MAX(d.fecha_modificacion) AS fecha_modificacion,
       MAX(d.es_eliminado) AS es_eliminado
FROM det d
JOIN t_venta v ON d.id_venta = v.id_venta
LEFT JOIN m_articulo ma
  ON d.cod_compania = ma.cod_compania AND d.cod_articulo = ma.cod_articulo
LEFT JOIN (
  SELECT cod_compania, cod_operacion,
         CASE WHEN COALESCE(upper(cod_tipo_operacion), '') = 'PRO' THEN 1 ELSE 0 END AS is_pro
  FROM m_operacion
) mo ON d.cod_compania = mo.cod_compania AND d.cod_operacion = mo.cod_operacion
GROUP BY 1, 2
""".format(
        money=_tvd_money_sql()
        .replace("factor", "(CASE WHEN v.cod_documento_venta = 'NCC' THEN -1 ELSE 1 END)")
        .replace("d_ven", "(CASE WHEN COALESCE(mo.is_pro, 0) = 1 THEN 0 ELSE 1 END)")
        .replace("d_pro", "COALESCE(mo.is_pro, 0)")
    )
    odf = con.sql(sql).df()
    assert_match(sdf, odf, "t_venta_detalle")
    # hand pin: the FAC sale-op line contributes +, the NCC flips −, promo
    # rides only the _pro buckets — already asserted value-wise in
    # test_runner_jobs; here we pin the money surface width
    assert len([c for c in sdf.columns if c.startswith("imp_")]) == 30


# ===========================================================================
# 5. fact_reparto_detalle — the delivery-detail projection over two optional
#    joins: every column recomputed in SQL.
# ===========================================================================

_QTY = [
    f"cant_cajavolumen_{n}{s}" if vol else f"cant_cajafisica_{n}{s}"
    for n in ("ped", "asignado_ped", "desp")
    for s in ("", "_pro")
    for vol in (False, True)
]

_FRD_SQL = """
SELECT c.id_pais, c.id_periodo, c.id_reparto, c.id_pedido, c.id_producto,
       c.id_sucursal,
       r.id_transportista, r.id_chofer, r.id_medio_transporte,
       p.id_cliente, p.cod_cliente, p.id_origen_pedido, p.id_tipo_pedido,
       p.id_fuerza_venta, p.id_vendedor, p.id_lista_precio, p.id_forma_pago,
       p.desc_region, p.desc_subregion, p.desc_division,
       p.cod_zona, p.cod_ruta, p.cod_modulo, p.nro_pedido_ref,
       p.fecha_pedido, p.fecha_entrega,
       r.fecha_orden_carga,
       r.fecha_reparto AS fecha_movimiento_inventario,
       c.fecha_liquidacion,
       r.fecha_reparto AS fecha_almacen,
       p.nro_pedido, r.estado_guia,
       {qty},
       c.cant_caja_fisica_ven AS cant_cajafisica_ven,
       c.cant_caja_volumen_ven AS cant_cajavolumen_ven,
       c.cant_caja_fisica_pro AS cant_cajafisica_pro,
       c.cant_caja_volumen_pro AS cant_cajavolumen_pro,
       c.fecha_creacion, c.fecha_modificacion
FROM t_pedido_cumplimiento c
LEFT JOIN t_pedido p ON p.id_pedido = c.id_pedido
LEFT JOIN t_reparto r ON r.id_reparto = c.id_reparto
WHERE c.id_periodo IN ({periods})
"""


def test_fact_reparto_detalle_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    d = dt.date
    base_qty = {c: D("1.5") for c in _QTY}
    cumpl_schema = (
        "id_pais string, id_periodo string, id_reparto string, id_pedido string, "
        "id_producto string, id_sucursal string, fecha_liquidacion date, "
        + ", ".join(f"{c} decimal(38,12)" for c in _QTY)
        + ", cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12)"
        ", cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12)"
        ", fecha_creacion timestamp, fecha_modificacion timestamp"
    )

    def cumpl_row(reparto, pedido, producto, periodo="202505"):
        return (
            "PE", periodo, reparto, pedido, producto, "10|01", d(2025, 5, 3),
            *[base_qty[c] for c in _QTY],
            D("2"), D("40"), D("0"), D("0"), TS, TS,
        )

    spark.createDataFrame(
        [
            cumpl_row("10|01|AL1|GRA|900", "PD1", "10|A1"),          # fully joined
            cumpl_row(None, "PD1", "10|A2"),                          # undispatched
            cumpl_row("10|01|AL1|GRA|901", "PDX", "10|A3"),           # orphan order
            cumpl_row("10|01|AL1|GRA|900", "PD1", "10|A4", "202401"), # out of window
        ],
        cumpl_schema,
    ).write.mode("overwrite").parquet(dom("t_pedido_cumplimiento"))
    spark.createDataFrame(
        [
            ("PD1", "10|C1", "C1", "10|000", "10|TP1", "10|01|F1", "10|V9",
             "10|LP1", "10|CP1", "REGION N", "SUB N", "DIV C", "Z1", "R1", "M1",
             "SF1", d(2025, 5, 2), d(2025, 5, 4), "N1"),
        ],
        "id_pedido string, id_cliente string, cod_cliente string, "
        "id_origen_pedido string, id_tipo_pedido string, id_fuerza_venta string, "
        "id_vendedor string, id_lista_precio string, id_forma_pago string, "
        "desc_region string, desc_subregion string, desc_division string, "
        "cod_zona string, cod_ruta string, cod_modulo string, nro_pedido_ref string, "
        "fecha_pedido date, fecha_entrega date, nro_pedido string",
    ).write.mode("overwrite").parquet(dom("t_pedido"))
    spark.createDataFrame(
        [
            ("10|01|AL1|GRA|900", "10|T7", "10|CH1", "10|V7", d(2025, 5, 2),
             d(2025, 5, 3), "LIQ"),
        ],
        "id_reparto string, id_transportista string, id_chofer string, "
        "id_medio_transporte string, fecha_orden_carga date, fecha_reparto date, "
        "estado_guia string",
    ).write.mode("overwrite").parquet(dom("t_reparto"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "fact_reparto_detalle_lite", 1, periods=3)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_reparto_detalle")
    ).toPandas()

    con = duck_with_views(
        {
            "t_pedido_cumplimiento": dom("t_pedido_cumplimiento"),
            "t_pedido": dom("t_pedido"),
            "t_reparto": dom("t_reparto"),
        }
    )
    qty = ",\n       ".join(f"c.{c}" for c in _QTY)
    odf = con.sql(
        _FRD_SQL.format(qty=qty, periods="'202503', '202504', '202505'")
    ).df()
    assert_match(sdf, odf, "fact_reparto_detalle")
    # hand pins: the window filter dropped A4; the undispatched A2 row has a
    # NULL delivery block but a full order block; the orphan-order A3 row
    # has NULL order block but a real... no matching reparto row for 901 →
    # NULL carrier too
    assert len(sdf) == 3
    by_prod = {r.id_producto: r for r in sdf.itertuples()}
    assert by_prod["10|A1"].id_transportista == "10|T7"
    assert by_prod["10|A1"].id_cliente == "10|C1"
    assert pd.isna(by_prod["10|A2"].id_transportista)
    assert by_prod["10|A2"].id_cliente == "10|C1"
    assert pd.isna(by_prod["10|A3"].id_cliente)


# ===========================================================================
# 6. t_pedido — dual-branch order fact (main + ADES): header ladders (zona →
#    división/región/subregión with DEFAULT coalescing), day-rate fx, the
#    detail pre-agg OWNING the order identity (5-part id incl. client), the
#    ADES anti-join union — every column recomputed in SQL.
# ===========================================================================

_TP_SK = "concat_ws('|', {})"


def _sk(*cols):
    return _TP_SK.format(", ".join(f"trim({c})" for c in cols))


_TP_HDR = """
  SELECT c.id_pais,
         CAST(year(tp.fecha_pedido) * 100 + month(tp.fecha_pedido) AS VARCHAR) AS id_periodo,
         tp.cod_compania AS id_compania,
         {sk_suc} AS id_sucursal,
         tp.{doc} AS cod_tipo_documento_pedido,
         {sk_docped} AS id_documento_pedido,
         {sk_origen} AS id_origen_pedido,
         {sk_tipoped} AS id_tipo_pedido,
         {sk_fv} AS id_fuerza_venta,
         {sk_vend} AS id_vendedor,
         CAST(NULL AS VARCHAR) AS id_supervisor,
         CAST(NULL AS VARCHAR) AS id_jefe_venta,
         {sk_fp} AS id_forma_pago,
         COALESCE(mr.desc_region, 'REGION DEFAULT') AS desc_region,
         COALESCE(msr.desc_subregion, 'SUBREGION DEFAULT') AS desc_subregion,
         mcd.desc_division,
         tp.cod_centro_distribucion AS cod_division,
         tp.cod_zona_distribucion AS cod_zona,
         tp.fecha_entrega, tp.fecha_pedido,
         tp.fecha_pedido AS fecha_visita,
         tp.fecha_creacion, tp.fecha_modificacion,
         0 AS es_eliminado,
         CASE WHEN mtc.cod_moneda = c.moneda_mn THEN 1 ELSE mtc.tc_venta END AS tipo_cambio_mn,
         CASE WHEN mtc.cod_moneda IN ('DOL', 'USD') THEN 1 ELSE mtc.tc_venta END AS tipo_cambio_me
  FROM {tbl} tp
  JOIN compania c ON tp.cod_compania = c.cod_compania
  LEFT JOIN m_zona mzo
    ON mzo.cod_compania = tp.cod_compania AND mzo.cod_sucursal = tp.cod_sucursal
   AND mzo.cod_zona = tp.cod_zona_distribucion
  LEFT JOIN m_division mcd
    ON mcd.cod_division = tp.cod_centro_distribucion
   AND mcd.cod_compania = tp.cod_compania
  LEFT JOIN m_region mr
    ON mr.cod_pais = c.cod_pais AND mr.cod_region = mzo.cod_region
  LEFT JOIN m_subregion msr
    ON msr.cod_pais = c.cod_pais AND msr.cod_region = mzo.cod_region
   AND msr.cod_subregion = mzo.cod_subregion
  LEFT JOIN m_tipo_cambio mtc
    ON mtc.fecha = tp.fecha_pedido AND mtc.cod_compania = tp.cod_compania
   AND mtc.cod_moneda = c.moneda_mn
  WHERE {doc_filter}
    AND CAST(year(tp.fecha_pedido) * 100 + month(tp.fecha_pedido) AS VARCHAR) IN ({periods})
"""

_TP_DET = """
  SELECT {sk_docped} AS id_documento_pedido,
         {sk_cliente} AS id_cliente,
         MAX({sk_nro}) AS nro_pedido,
         MAX(cod_cliente) AS cod_cliente,
         MAX({ruta}) AS cod_ruta,
         MAX(cod_modulo) AS cod_modulo,
         MAX({sk_lista}) AS id_lista_precio,
         MAX({sk_pedido}) AS id_pedido,
         MAX(CAST(NULL AS VARCHAR)) AS id_pedido_ref
  FROM {tbl}
  WHERE {doc_filter}
  GROUP BY 1, 2
"""

_TP_COMBINED = """
  SELECT tp.id_pais, tp.id_periodo, tpd.id_pedido, tpd.id_pedido_ref,
         tp.id_compania, tp.id_sucursal, tp.cod_tipo_documento_pedido,
         tpd.id_cliente, tpd.cod_cliente, tp.id_origen_pedido, tp.id_tipo_pedido,
         tp.id_fuerza_venta, tp.id_vendedor, tp.id_supervisor, tp.id_jefe_venta,
         tpd.id_lista_precio, tp.id_forma_pago, tp.desc_region, tp.desc_subregion,
         tp.desc_division, tp.cod_division, tp.cod_zona, tpd.cod_ruta,
         tpd.cod_modulo, tpd.nro_pedido, tp.fecha_pedido, tp.fecha_entrega,
         tp.fecha_visita, tp.tipo_cambio_mn, tp.tipo_cambio_me,
         tp.fecha_creacion, tp.fecha_modificacion, tp.es_eliminado
  FROM {hdr} tp JOIN {det} tpd ON tpd.id_documento_pedido = tp.id_documento_pedido
"""


def _tp_oracle_sql(periods: str) -> str:
    hdr_main = _TP_HDR.format(
        tbl="t_documento_pedido", doc="cod_documento_pedido",
        sk_suc=_sk("tp.cod_compania", "tp.cod_sucursal"),
        sk_docped=_sk("tp.cod_compania", "tp.cod_sucursal",
                      "tp.cod_documento_pedido", "tp.nro_documento_pedido"),
        sk_origen=_sk("tp.cod_compania", "tp.cod_documento_pedido_origen"),
        sk_tipoped=_sk("tp.cod_compania", "tp.cod_tipo_pedido"),
        sk_fv=_sk("tp.cod_compania", "tp.cod_sucursal", "tp.cod_fuerza_venta"),
        sk_vend=_sk("tp.cod_compania", "tp.cod_vendedor"),
        sk_fp=_sk("tp.cod_compania", "tp.cod_condicion_pago"),
        doc_filter="tp.cod_documento_pedido = '200'", periods=periods,
    )
    hdr_ades = _TP_HDR.format(
        tbl="t_documento_pedido_ades", doc="cod_documento_transaccion",
        sk_suc=_sk("tp.cod_compania", "tp.cod_sucursal"),
        sk_docped=_sk("tp.cod_compania", "tp.cod_sucursal",
                      "tp.cod_documento_transaccion", "tp.nro_comprobante"),
        sk_origen=_sk("tp.cod_compania", "tp.cod_tipo_documento_origen"),
        sk_tipoped=_sk("tp.cod_compania", "tp.cod_tipo_pedido"),
        sk_fv=_sk("tp.cod_compania", "tp.cod_sucursal", "tp.cod_fuerza_venta"),
        sk_vend=_sk("tp.cod_compania", "tp.cod_vendedor"),
        sk_fp=_sk("tp.cod_compania", "tp.cod_condicion_pago"),
        doc_filter="tp.cod_documento_transaccion IN ('200', '300')", periods=periods,
    )
    det_main = _TP_DET.format(
        tbl="t_documento_pedido_detalle",
        sk_docped=_sk("cod_compania", "cod_sucursal",
                      "cod_documento_pedido", "nro_documento_pedido"),
        sk_cliente=_sk("cod_compania", "cod_cliente"),
        sk_nro=_sk("nro_documento_pedido", "cod_cliente"),
        ruta="cod_ruta",
        sk_lista=_sk("cod_compania", "cod_lista_precio"),
        sk_pedido=_sk("cod_compania", "cod_sucursal", "cod_documento_pedido",
                      "nro_documento_pedido", "cod_cliente"),
        doc_filter="cod_documento_pedido = '200'",
    )
    det_ades = _TP_DET.format(
        tbl="t_documento_pedido_ades_detalle",
        sk_docped=_sk("cod_compania", "cod_sucursal",
                      "cod_documento_transaccion", "nro_comprobante"),
        sk_cliente=_sk("cod_compania", "cod_cliente"),
        sk_nro=_sk("nro_comprobante", "cod_cliente"),
        ruta="cod_ruta_distribucion",
        sk_lista=_sk("cod_compania", "cod_lista_precios"),
        sk_pedido=_sk("cod_compania", "cod_sucursal", "cod_documento_transaccion",
                      "nro_comprobante", "cod_cliente"),
        doc_filter="cod_documento_transaccion IN ('200', '300')",
    )
    return f"""
WITH compania AS (
  SELECT mc.cod_compania, mc.cod_pais, mp.id_pais, mpar.cod_moneda_mn AS moneda_mn
  FROM m_compania mc
  LEFT JOIN m_parametro mpar ON mpar.id_compania = mc.cod_compania
  JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
), hdr_main AS ({hdr_main}
), hdr_ades AS ({hdr_ades}
), det_main AS ({det_main}
), det_ades AS ({det_ades}
), main AS ({_TP_COMBINED.format(hdr="hdr_main", det="det_main")}
), extra AS ({_TP_COMBINED.format(hdr="hdr_ades", det="det_ades")}
), unioned AS (
  SELECT * FROM main
  UNION ALL
  SELECT * FROM extra e
  WHERE NOT EXISTS (SELECT 1 FROM main m WHERE m.id_pedido = e.id_pedido)
)
SELECT *,
       CAST(NULL AS VARCHAR) AS id_visita,
       CAST(NULL AS VARCHAR) AS id_modelo_atencion,
       CAST(NULL AS VARCHAR) AS nro_pedido_ref,
       CAST(NULL AS VARCHAR) AS cod_tipo_atencion
FROM unioned
"""


def test_t_pedido_duckdb_differential(spark, lake):
    import datetime as _dt

    d = _dt.date(2025, 5, 2)
    ts = _dt.datetime(2025, 5, 2, 9)
    hdr_ddl = (
        "cod_compania string, cod_sucursal string, cod_cliente string, "
        "cod_zona_distribucion string, fecha_pedido date, cod_tipo_pedido string, "
        "cod_fuerza_venta string, cod_vendedor string, cod_condicion_pago string, "
        "cod_centro_distribucion string, fecha_entrega date, "
        "fecha_creacion timestamp, fecha_modificacion timestamp"
    )
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    # headers: P1 walks the live geography+fx ladder; P2 hits a zona whose
    # subregion is absent (DEFAULT path) and a date with no rate row; PX is
    # gated ('100'); P4 is out of window
    spark.createDataFrame(
        [
            ("200", "P1", "AL1", "OR1", "10", "01", "C1", "Z1", d, "TP1", "F1",
             "V9", "CP1", "D1", d, ts, ts),
            ("200", "P2", "AL1", "OR1", "10", "01", "C2", "Z2", _dt.date(2025, 5, 6),
             "TP1", "F1", "V9", "CP1", "D9", d, ts, ts),
            ("100", "PX", "AL1", "OR1", "10", "01", "C1", "Z1", d, "TP1", "F1",
             "V9", "CP1", "D1", d, ts, ts),
            ("200", "P4", "AL1", "OR1", "10", "01", "C1", "Z1", _dt.date(2024, 1, 5),
             "TP1", "F1", "V9", "CP1", "D1", d, ts, ts),
        ],
        "cod_documento_pedido string, nro_documento_pedido string, cod_almacen string, "
        "cod_documento_pedido_origen string, " + hdr_ddl,
    ).write.parquet(stage("t_documento_pedido"))
    spark.createDataFrame(
        [("200", "P2", "AL1", "OR2", "10", "01", "C2", "Z1", d, "TP1", "F1",
          "V9", "CP1", "D1", d, ts, ts),        # overlaps main → anti-dropped
         ("300", "P9", "AL1", "OR2", "10", "01", "C9", "Z1", d, "TP1", "F1",
          "V9", "CP1", "D1", d, ts, ts)],       # ADES-only survives
        "cod_documento_transaccion string, nro_comprobante string, "
        "cod_almacen_emisor string, cod_tipo_documento_origen string, " + hdr_ddl,
    ).write.parquet(stage("t_documento_pedido_ades"))
    spark.createDataFrame(
        [
            # two lines, same (doc, client): collapse with max() attributes
            ("10", "01", "200", "P1", "C1", "LP1", "R1", "M1"),
            ("10", "01", "200", "P1", "C1", "LP1", "R7", "M1"),
            # second CLIENT on the same document → its own order identity
            ("10", "01", "200", "P1", "C5", "LP5", "R5", "M5"),
            ("10", "01", "200", "P2", "C2", "LP2", "R2", "M2"),
        ],
        "cod_compania string, cod_sucursal string, cod_documento_pedido string, "
        "nro_documento_pedido string, cod_cliente string, cod_lista_precio string, "
        "cod_ruta string, cod_modulo string",
    ).write.parquet(stage("t_documento_pedido_detalle"))
    spark.createDataFrame(
        [("10", "01", "200", "P2", "C2", "LP2", "R2", "M2"),
         ("10", "01", "300", "P9", "C9", "LP9", "R9", "M9")],
        "cod_compania string, cod_sucursal string, cod_documento_transaccion string, "
        "nro_comprobante string, cod_cliente string, cod_lista_precios string, "
        "cod_ruta_distribucion string, cod_modulo string",
    ).write.parquet(stage("t_documento_pedido_ades_detalle"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", ts, ts)],
        "cod_compania string, cod_pais string, desc_compania string, es_activo string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))
    spark.createDataFrame(
        [("10", "PEN")], "id_compania string, cod_moneda_mn string"
    ).write.parquet(stage("m_parametro"))
    spark.createDataFrame(
        [("10", "PEN", d, D("3.75"))],
        "cod_compania string, cod_moneda string, fecha date, tc_venta decimal(12,6)",
    ).write.parquet(stage("m_tipo_cambio"))
    spark.createDataFrame(
        [("10", "01", "Z1", "RG1", "SR1"), ("10", "01", "Z2", "RG1", "SR_MISSING")],
        "cod_compania string, cod_sucursal string, cod_zona string, "
        "cod_region string, cod_subregion string",
    ).write.parquet(stage("m_zona"))
    spark.createDataFrame(
        [("PE", "RG1", "REGION NORTE")],
        "cod_pais string, cod_region string, desc_region string",
    ).write.parquet(stage("m_region"))
    spark.createDataFrame(
        [("PE", "RG1", "SR1", "SUBREGION UNO")],
        "cod_pais string, cod_region string, cod_subregion string, desc_subregion string",
    ).write.parquet(stage("m_subregion"))
    spark.createDataFrame(
        [("10", "D1", "DIVISION CENTRO")],
        "cod_compania string, cod_division string, desc_division string",
    ).write.parquet(stage("m_division"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves([JobConfig("domain", "t_pedido_lite", 1, periods=3)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "t_pedido")).toPandas()

    con = duck_with_views(
        {t: stage(t) for t in (
            "t_documento_pedido", "t_documento_pedido_ades",
            "t_documento_pedido_detalle", "t_documento_pedido_ades_detalle",
            "m_compania", "m_parametro", "m_tipo_cambio", "m_zona", "m_region",
            "m_subregion", "m_division",
        )} | {"m_pais": stage("m_pais")}
    )
    odf = con.sql(_tp_oracle_sql("'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_pedido")
    # hand pins: two clients on P1 → two order rows; the overlap P2 came
    # from MAIN (ruta R2 either way, but fx resolved: mn=1 through the PEN
    # rate row on P1's date only); P2's date has no rate row → NULL fx;
    # Z2's subregion falls back to the DEFAULT literal
    rows = {r.id_pedido: r for r in sdf.itertuples()}
    assert set(rows) == {
        "10|01|200|P1|C1", "10|01|200|P1|C5", "10|01|200|P2|C2", "10|01|300|P9|C9",
    }
    assert rows["10|01|200|P1|C1"].cod_ruta == "R7"
    assert rows["10|01|200|P1|C5"].id_lista_precio == "10|LP5"
    assert float(rows["10|01|200|P1|C1"].tipo_cambio_mn) == 1.0
    assert float(rows["10|01|200|P1|C1"].tipo_cambio_me) == 3.75
    assert pd.isna(rows["10|01|200|P2|C2"].tipo_cambio_mn)
    assert rows["10|01|200|P2|C2"].desc_subregion == "SUBREGION DEFAULT"
    assert rows["10|01|200|P1|C1"].desc_subregion == "SUBREGION UNO"


# ===========================================================================
# 7. t_venta — the flagship sales fact (this round's join-semantics fix):
#    period+guard filters, INNER company bridge, geography ladder, fx
#    resolution, the full id block — every column recomputed in SQL over
#    the seed_stage universe (orphan company, CMD/refact guards, three
#    currency cases).
# ===========================================================================

_TV_SQL = """
WITH compania AS (
  SELECT mc.cod_compania, mc.cod_pais, mp.id_pais, mpar.cod_moneda_mn AS moneda_mn
  FROM m_compania mc
  LEFT JOIN m_parametro mpar ON mpar.id_compania = mc.cod_compania
  JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
), filtered AS (
  SELECT * FROM t_documento_venta
  WHERE CAST(year(fecha_liquidacion) * 100 + month(fecha_liquidacion) AS VARCHAR)
        IN ({periods})
    AND cod_documento_venta NOT IN ('CMD', 'RMD')
    AND COALESCE(flg_facglob, 'F') = 'F'
    AND COALESCE(flg_refact, 'F') = 'F'
)
SELECT
  concat_ws('|', trim(v.cod_compania), trim(v.cod_sucursal), trim(v.cod_almacen),
            trim(v.cod_documento_venta), trim(v.nro_documento_venta)) AS id_venta,
  c.id_pais,
  CAST(year(v.fecha_liquidacion) * 100 + month(v.fecha_liquidacion) AS VARCHAR)
    AS id_periodo,
  v.cod_compania, v.cod_sucursal,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_sucursal)) AS id_sucursal,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_cliente)) AS id_cliente,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_sucursal),
            trim(v.cod_documento_pedido), trim(v.nro_documento_pedido),
            trim(v.cod_cliente)) AS id_pedido,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_documento_venta),
            trim(v.cod_procedimiento)) AS id_tipo_venta,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_sucursal),
            trim(v.cod_fuerza_venta)) AS id_fuerza_venta,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_vendedor)) AS id_vendedor,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_supervisor)) AS id_supervisor,
  CAST(NULL AS VARCHAR) AS id_jefe_venta,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_lista_precio)) AS id_lista_precio,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_documento_pedido)) AS id_tipo_documento,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_forma_pago)) AS id_forma_pago,
  concat_ws('|', trim(v.cod_compania), trim(v.cod_motivo_rechazo)) AS id_motivo_rechazo,
  CAST(NULL AS VARCHAR) AS id_motivo_nota_credito,
  v.nro_comprobante AS nro_venta,
  CAST(NULL AS VARCHAR) AS nro_venta_ref,
  COALESCE(mr.desc_region, 'REGION DEFAULT') AS desc_region,
  COALESCE(msr.desc_subregion, 'SUBREGION DEFAULT') AS desc_subregion,
  mcd.desc_division,
  v.cod_zona, v.cod_ruta, v.cod_modulo, v.cod_documento_venta,
  v.nro_documento_venta, v.cod_cliente, v.cod_moneda,
  CASE WHEN v.cod_estado_comprobante = '002' THEN 1 ELSE 0 END AS es_anulado,
  v.fecha_pedido, v.fecha_creacion, v.fecha_modificacion,
  CAST(COALESCE(
    CASE WHEN v.cod_moneda = c.moneda_mn THEN CAST(1 AS DECIMAL(12,6))
         ELSE CAST(mtc.tc_venta AS DECIMAL(12,6)) END,
    CAST(v.tipo_cambio_mn AS DECIMAL(12,6))) AS DECIMAL(12,6)) AS tipo_cambio_mn,
  CAST(COALESCE(
    CASE WHEN v.cod_moneda IN ('DOL', 'USD') THEN CAST(1 AS DECIMAL(12,6))
         ELSE CAST(mtc.tc_venta AS DECIMAL(12,6)) END,
    CASE WHEN v.tipo_cambio_me = 0 THEN CAST(1 AS DECIMAL(12,6))
         ELSE CAST(v.tipo_cambio_me AS DECIMAL(12,6)) END) AS DECIMAL(12,6))
    AS tipo_cambio_me,
  v.imp_venta, v.fecha_liquidacion, v.fecha_emision,
  CASE WHEN v.cod_estado_comprobante = '002' THEN 1 ELSE 0 END AS es_eliminado
FROM filtered v
JOIN compania c ON v.cod_compania = c.cod_compania
LEFT JOIN m_zona mzo
  ON mzo.cod_compania = v.cod_compania AND mzo.cod_sucursal = v.cod_sucursal
 AND mzo.cod_zona = v.cod_zona
LEFT JOIN m_division mcd
  ON mcd.cod_division = mzo.cod_zona AND mcd.cod_compania = mzo.cod_compania
LEFT JOIN m_region mr
  ON mr.cod_pais = c.cod_pais AND mr.cod_region = mzo.cod_region
LEFT JOIN m_subregion msr
  ON msr.cod_pais = c.cod_pais AND msr.cod_region = mzo.cod_region
 AND msr.cod_subregion = mzo.cod_subregion
LEFT JOIN m_tipo_cambio mtc
  ON mtc.fecha = v.fecha_emision AND mtc.cod_compania = c.cod_compania
 AND mtc.cod_moneda = c.moneda_mn
"""


def test_t_venta_duckdb_differential(spark, lake):
    from test_runner_jobs import seed_stage, registry

    seed_stage(spark, lake)
    reg = registry()

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves([JobConfig("domain", "t_venta_lite", 1, periods=3)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "t_venta")).toPandas()

    con = duckdb_con_tventa(lake)
    odf = con.sql(_TV_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_venta")
    # the round's fix, pinned at the differential level too: the orphan
    # company doc 0007 appears in NEITHER result (both drop it via inner)
    assert not any("99|" in v for v in sdf["id_venta"])
    assert len(sdf) == 3


def duckdb_con_tventa(lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    con = duckdb.connect()
    # m_compania is two stage instances (S2 union); m_subregion is absent
    # (S3 empty fallback) — mirror both storage behaviors
    con.sql(
        "CREATE VIEW m_compania AS "
        f"SELECT * FROM read_parquet('{stage('m_compania', 'pe01')}/**/*.parquet') "
        "UNION ALL "
        f"SELECT * FROM read_parquet('{stage('m_compania', 'cl01')}/**/*.parquet')"
    )
    con.sql(
        "CREATE VIEW m_subregion AS SELECT CAST(NULL AS VARCHAR) AS cod_pais, "
        "CAST(NULL AS VARCHAR) AS cod_region, CAST(NULL AS VARCHAR) AS cod_subregion, "
        "CAST(NULL AS VARCHAR) AS desc_subregion WHERE false"
    )
    for t, inst in [
        ("t_documento_venta", "pe01"), ("m_pais", "principal"),
        ("m_parametro", "pe01"), ("m_tipo_cambio", "pe01"), ("m_zona", "pe01"),
        ("m_region", "pe01"), ("m_division", "pe01"),
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{stage(t, inst)}/**/*.parquet')"
        )
    return con


# ===========================================================================
# 8. fact_venta_detalle — 58-col line-item serving fact: the VEN/EXP/OBS
#    whitelist in the join condition, order-left geography backfills, /30
#    conversions, the whole money surface.
# ===========================================================================

_FVD_MONEY = [
    "imp_neto_vta_mn", "imp_neto_vta_me", "imp_bruto_vta_mn", "imp_bruto_vta_me",
    "imp_dscto_mn", "imp_dscto_me", "imp_cobrar_vta_mn", "imp_cobrar_vta_me",
    "imp_paquete_vta_mn", "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
    "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
    "imp_valorizado_pro_me",
] + [f"imp_impuesto{i}_{c}" for i in range(1, 7) for c in ("mn", "me")]

_FVD_SQL = """
SELECT tv.id_pais, tv.id_periodo, tv.id_sucursal, tv.id_cliente, tvd.id_producto,
       tv.id_vendedor, tv.id_supervisor, tv.id_forma_pago, tv.id_fuerza_venta,
       tp.id_modelo_atencion, tv.id_lista_precio, tp.id_origen_pedido,
       tv.id_tipo_venta, tv.id_venta, tv.id_pedido,
       tv.fecha_emision, tv.fecha_liquidacion, tv.fecha_pedido,
       tv.nro_venta, tp.nro_pedido,
       COALESCE(tv.desc_region, tp.desc_region) AS desc_region,
       COALESCE(tv.desc_subregion, tp.desc_subregion) AS desc_subregion,
       COALESCE(tv.desc_division, tp.desc_division) AS desc_division,
       COALESCE(tv.cod_zona, tp.cod_zona) AS cod_zona,
       COALESCE(tv.cod_ruta, tp.cod_ruta) AS cod_ruta,
       COALESCE(tv.cod_modulo, tp.cod_modulo) AS cod_modulo,
       tvd.cant_caja_fisica_ven AS cant_cajafisica_vta,
       CAST(tvd.cant_caja_volumen_ven / 30 AS DECIMAL(38,12)) AS cant_cajaunitaria_vta,
       tvd.cant_caja_fisica_pro AS cant_cajafisica_pro,
       CAST(tvd.cant_caja_volumen_pro / 30 AS DECIMAL(38,12)) AS cant_cajaunitaria_pro,
       tvd.imp_desnimp_mn AS imp_dscto_sinimpvta_mn,
       tvd.imp_desnimp_me AS imp_dscto_sinimpvta_me,
       {money}
FROM t_venta_detalle tvd
JOIN t_venta tv ON tvd.id_venta = tv.id_venta
JOIN m_tipo_venta mtv
  ON tv.id_tipo_venta = mtv.id_tipo_venta
 AND upper(mtv.cod_tipo_operacion) IN ('VEN', 'EXP', 'OBS')
LEFT JOIN t_pedido tp ON tv.id_pedido = tp.id_pedido
WHERE tv.es_eliminado = 0
  AND tv.id_periodo IN ({periods}) AND tvd.id_periodo IN ({periods})
"""


def test_fact_venta_detalle_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    d = dt.date
    # venta headers: VT1 with geography, VT2 with NULL geography (order
    # backfills), VT3 deleted, VT4 on an excluded op type, VT5 with no order
    spark.createDataFrame(
        [
            ("VT1", "PE", "202505", "10|01", "10|C1", "TV1", "PD1", "10|V9",
             "10|S1", "10|FP1", "10|01|F1", "10|LP1", 0, d(2025, 5, 1),
             d(2025, 5, 2), d(2025, 4, 30), "N1", "REG V", "SUB V", "DIV V",
             "Z1", "R1", "M1"),
            ("VT2", "PE", "202505", "10|01", "10|C2", "TV1", "PD1", "10|V9",
             None, "10|FP1", "10|01|F1", "10|LP1", 0, d(2025, 5, 3),
             d(2025, 5, 4), d(2025, 5, 1), "N2", None, None, None,
             None, None, None),
            ("VT3", "PE", "202505", "10|01", "10|C1", "TV1", "PD1", "10|V9",
             "10|S1", "10|FP1", "10|01|F1", "10|LP1", 1, d(2025, 5, 1),
             d(2025, 5, 2), d(2025, 4, 30), "N3", "REG V", "SUB V", "DIV V",
             "Z1", "R1", "M1"),
            ("VT4", "PE", "202505", "10|01", "10|C1", "TV2", "PD1", "10|V9",
             "10|S1", "10|FP1", "10|01|F1", "10|LP1", 0, d(2025, 5, 1),
             d(2025, 5, 2), d(2025, 4, 30), "N4", "REG V", "SUB V", "DIV V",
             "Z1", "R1", "M1"),
            ("VT5", "PE", "202505", "10|01", "10|C3", "TV1", "PDX", "10|V9",
             "10|S1", "10|FP1", "10|01|F1", "10|LP1", 0, d(2025, 5, 1),
             d(2025, 5, 2), d(2025, 4, 30), "N5", "REG V", "SUB V", "DIV V",
             "Z1", "R1", "M1"),
        ],
        "id_venta string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, id_tipo_venta string, id_pedido string, "
        "id_vendedor string, id_supervisor string, id_forma_pago string, "
        "id_fuerza_venta string, id_lista_precio string, es_eliminado int, "
        "fecha_emision date, fecha_liquidacion date, fecha_pedido date, "
        "nro_venta string, desc_region string, desc_subregion string, "
        "desc_division string, cod_zona string, cod_ruta string, cod_modulo string",
    ).write.mode("overwrite").parquet(dom("t_venta"))
    money_vals = {c: D(str(1 + i * 0.25)) for i, c in enumerate(_FVD_MONEY)}
    det_ddl = (
        "id_venta string, id_periodo string, id_producto string, "
        "cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12), "
        "cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12), "
        "imp_desnimp_mn decimal(38,12), imp_desnimp_me decimal(38,12), "
        + ", ".join(f"{c} decimal(38,12)" for c in _FVD_MONEY)
    )

    def det_row(venta, prod, periodo="202505"):
        return (venta, periodo, prod, D("2"), D("60"), D("1"), D("45"),
                D("3.5"), D("0.875"), *[money_vals[c] for c in _FVD_MONEY])

    spark.createDataFrame(
        [
            det_row("VT1", "10|A1"),
            det_row("VT2", "10|A2"),
            det_row("VT3", "10|A1"),    # deleted header → excluded
            det_row("VT4", "10|A1"),    # excluded op type
            det_row("VT5", "10|A3"),    # orphan order → NULL tp block
            det_row("VT1", "10|A9", "202401"),  # out-of-window detail line
        ],
        det_ddl,
    ).write.mode("overwrite").parquet(dom("t_venta_detalle"))
    spark.createDataFrame(
        [
            ("PD1", "MA1", "10|000", "P1|C1", "REG P", "SUB P", "DIV P",
             "ZP", "RP", "MP"),
        ],
        "id_pedido string, id_modelo_atencion string, id_origen_pedido string, "
        "nro_pedido string, desc_region string, desc_subregion string, "
        "desc_division string, cod_zona string, cod_ruta string, cod_modulo string",
    ).write.mode("overwrite").parquet(dom("t_pedido"))
    spark.createDataFrame(
        [("TV1", "ven"), ("TV2", "otr")],
        "id_tipo_venta string, cod_tipo_operacion string",
    ).write.mode("overwrite").parquet(dom("m_tipo_venta"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "fact_venta_detalle_lite", 1, periods=3)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_detalle")
    ).toPandas()

    con = duck_with_views(
        {
            "t_venta": dom("t_venta"),
            "t_venta_detalle": dom("t_venta_detalle"),
            "t_pedido": dom("t_pedido"),
            "m_tipo_venta": dom("m_tipo_venta"),
        }
    )
    money = ",\n       ".join(f"tvd.{c}" for c in _FVD_MONEY)
    odf = con.sql(
        _FVD_SQL.format(money=money, periods="'202503', '202504', '202505'")
    ).df()
    assert_match(sdf, odf, "fact_venta_detalle")
    # pins: 3 surviving lines (VT1/A1, VT2/A2, VT5/A3); the sale's own
    # territory wins on VT1, the order's backfills on VT2, NULLs on VT5
    assert len(sdf) == 3
    rows = {r.id_venta: r for r in sdf.itertuples()}
    assert rows["VT1"].desc_region == "REG V" and rows["VT1"].cod_ruta == "R1"
    assert rows["VT2"].desc_region == "REG P" and rows["VT2"].cod_ruta == "RP"
    assert pd.isna(rows["VT5"].desc_region) or rows["VT5"].desc_region == "REG V"
    assert rows["VT5"].desc_region == "REG V"  # sale carries its own
    assert pd.isna(rows["VT5"].id_modelo_atencion)
    assert float(rows["VT1"].cant_cajaunitaria_vta) == 2.0  # 60/30


# ===========================================================================
# 9. dim_cliente — the dim-class representative: priority-ladder top-1
#    assignment (W1 with the rank in the join condition), eje resolve, wide
#    attribute passthrough; merge-upsert sink.
# ===========================================================================

_DIM_CLIENTE_SQL = """
WITH enriched AS (
  SELECT mam.id_cliente, mm.id_modulo, mam.frecuencia_visita, mam.periodo_visita,
         mma.desc_modelo_atencion AS modelo_atencion, mm.fecha_creacion,
         CASE mma.desc_modelo_atencion
              WHEN 'Pre Venta' THEN 1 WHEN 'Especializado' THEN 2
              WHEN 'Auto Venta' THEN 3 WHEN 'Televenta' THEN 4
              ELSE 5 END AS orden_modelo
  FROM m_asignacion_modulo mam
  LEFT JOIN m_modulo mm ON mm.id_modulo = mam.id_modulo
  LEFT JOIN m_modelo_atencion mma ON mma.id_modelo_atencion = mm.id_modelo_atencion
  WHERE mam.es_activo = 1 AND mam.es_eliminado = 0
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id_cliente
             ORDER BY orden_modelo ASC, fecha_creacion DESC) AS orden
  FROM enriched
)
SELECT c.id_cliente, c.id_pais, c.id_sucursal,
       a.id_modulo AS id_estructura_comercial,
       c.id_clasificacion_cliente, c.id_eje_territorial, c.id_lista_precio,
       c.cod_cliente, c.nomb_cliente, c.cod_segmento, c.desc_subsegmento,
       c.cod_cliente_ref, c.cod_cliente_ref2, c.cod_cliente_ref3,
       c.cod_cliente_ref4, c.cod_tipo_cliente, c.cod_cuenta_clave,
       c.nomb_cuenta_clave, c.desc_canal_local, c.desc_giro_local, c.direccion,
       c.nro_documento, c.cod_cliente_principal, c.cod_cliente_transferencia,
       met.cod_eje_territorial,
       c.coord_x AS coordx, c.coord_y AS coordy,
       a.modelo_atencion, a.frecuencia_visita, a.periodo_visita,
       c.fecha_creacion, c.fecha_baja, c.estado
FROM m_cliente c
LEFT JOIN ranked a ON c.id_cliente = a.id_cliente AND a.orden = 1
LEFT JOIN m_eje_territorial met
  ON c.id_eje_territorial = met.id_eje_territorial
"""


def test_dim_cliente_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    d = dt.date
    cli_attrs = ("SEG1", "SUBSEG", "RF1", "RF2", "RF3", "RF4", "T1", "CK",
                 "CUENTA AJE", "BODEGA", "ABARROTES", "CALLE 1", "DOC1",
                 "CPR", "CTR")
    spark.createDataFrame(
        [
            ("10|C1", "PE", "10|01", "CL1", "PE|15074", "10|LP1", "C1",
             "CLIENTE UNO", *cli_attrs, "-76.9", "-12.0", TS, None, "A"),
            # no assignments at all → NULL best-assignment block
            ("10|C2", "PE", "10|01", "CL1", "PE|15074", "10|LP1", "C2",
             "CLIENTE DOS", *cli_attrs, "-76.9", "-12.0", TS, d(2025, 1, 1), "B"),
            # eje pointer with no m_eje_territorial row → NULL cod
            ("10|C3", "PE", "10|01", "CL1", "PE|99999", "10|LP1", "C3",
             "CLIENTE TRES", *cli_attrs, None, None, TS, None, "A"),
        ],
        "id_cliente string, id_pais string, id_sucursal string, "
        "id_clasificacion_cliente string, id_eje_territorial string, "
        "id_lista_precio string, cod_cliente string, nomb_cliente string, "
        "cod_segmento string, desc_subsegmento string, cod_cliente_ref string, "
        "cod_cliente_ref2 string, cod_cliente_ref3 string, cod_cliente_ref4 string, "
        "cod_tipo_cliente string, cod_cuenta_clave string, nomb_cuenta_clave string, "
        "desc_canal_local string, desc_giro_local string, direccion string, "
        "nro_documento string, cod_cliente_principal string, "
        "cod_cliente_transferencia string, coord_x string, coord_y string, "
        "fecha_creacion timestamp, fecha_baja date, estado string",
    ).write.mode("overwrite").parquet(dom("m_cliente"))
    spark.createDataFrame(
        [
            # C1: Televenta (prio 4, newest) vs Pre Venta (prio 1, older) →
            # the LADDER must win over recency; plus an inactive row and a
            # deleted row that the filters drop
            ("10|C1", "MODT", 1, 0, "F7", "P7"),
            ("10|C1", "MODP", 1, 0, "F1", "P1"),
            ("10|C1", "MODX", 0, 0, "F9", "P9"),   # inactive
            ("10|C1", "MODP", 1, 1, "F8", "P8"),   # deleted
            # C3: module whose model is unknown → otherwise(5) priority
            ("10|C3", "MODU", 1, 0, "F3", "P3"),
        ],
        "id_cliente string, id_modulo string, es_activo int, es_eliminado int, "
        "frecuencia_visita string, periodo_visita string",
    ).write.mode("overwrite").parquet(dom("m_asignacion_modulo"))
    spark.createDataFrame(
        [
            ("MODP", "MA_P", dt.datetime(2025, 1, 1, 8)),
            ("MODT", "MA_T", dt.datetime(2025, 4, 1, 8)),
            ("MODU", "MA_U", dt.datetime(2025, 2, 1, 8)),
        ],
        "id_modulo string, id_modelo_atencion string, fecha_creacion timestamp",
    ).write.mode("overwrite").parquet(dom("m_modulo"))
    spark.createDataFrame(
        [("MA_P", "Pre Venta"), ("MA_T", "Televenta")],  # MA_U absent → prio 5
        "id_modelo_atencion string, desc_modelo_atencion string",
    ).write.mode("overwrite").parquet(dom("m_modelo_atencion"))
    spark.createDataFrame(
        [("PE|15074", "15074")],
        "id_eje_territorial string, cod_eje_territorial string",
    ).write.mode("overwrite").parquet(dom("m_eje_territorial"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "dim_cliente_lite", 1, periods=2)], ANALYTICS_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "dim_cliente")).toPandas()

    con = duck_with_views(
        {t: dom(t) for t in (
            "m_cliente", "m_asignacion_modulo", "m_modulo", "m_modelo_atencion",
            "m_eje_territorial",
        )}
    )
    odf = con.sql(_DIM_CLIENTE_SQL).df()
    assert_match(sdf, odf, "dim_cliente")
    rows = {r.id_cliente: r for r in sdf.itertuples()}
    # the priority ladder beat recency: Pre Venta (older) wins over Televenta
    assert rows["10|C1"].id_estructura_comercial == "MODP"
    assert rows["10|C1"].modelo_atencion == "Pre Venta"
    assert pd.isna(rows["10|C2"].id_estructura_comercial)
    # unknown model → otherwise(5) but still the only assignment → kept
    assert rows["10|C3"].id_estructura_comercial == "MODU"
    assert pd.isna(rows["10|C3"].modelo_atencion)
    assert rows["10|C1"].cod_eje_territorial == "15074"
    assert pd.isna(rows["10|C3"].cod_eje_territorial)


# ===========================================================================
# 10. m_estructura_comercial — the hierarchy-union class: five adjacency
#     levels (ruta → zona → división → subregión → región) unioned +
#     distinct, división recovering its geography through the DISTINCT zona
#     context, injected-clock stamps.
# ===========================================================================

_MEC_SQL = """
WITH conformed AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mp.cod_pais = mc.cod_pais
), zona_geo AS (
  SELECT DISTINCT cod_compania, cod_sucursal, cod_centro_distribucion,
         cod_subregion, cod_region
  FROM m_zona
), levels AS (
  SELECT concat_ws('|', trim(n.cod_compania), trim(n.cod_sucursal),
                   trim(n.cod_fuerza_venta), trim(n.cod_ruta)) AS id_estructura_comercial,
         c.id_pais,
         concat_ws('|', trim(n.cod_compania), trim(n.cod_sucursal)) AS id_sucursal,
         concat_ws('|', trim(n.cod_compania), trim(n.cod_sucursal),
                   trim(n.cod_zona)) AS id_estructura_comercial_padre,
         concat_ws('|', trim(n.cod_compania), trim(n.cod_vendedor)) AS id_responsable_comercial,
         CAST(n.cod_ruta AS VARCHAR) AS cod_estructura_comercial,
         n.desc_ruta AS nomb_estructura_comercial,
         'Ruta' AS cod_tipo_estructura_comercial, n.es_activo AS estado
  FROM m_ruta n JOIN conformed c ON n.cod_compania = c.cod_compania
  UNION ALL
  SELECT concat_ws('|', trim(n.cod_compania), trim(n.cod_sucursal), trim(n.cod_zona)),
         c.id_pais,
         concat_ws('|', trim(n.cod_compania), trim(n.cod_sucursal)),
         concat_ws('|', trim(n.cod_compania), trim(n.cod_sucursal), trim(n.cod_region),
                   trim(n.cod_subregion), trim(n.cod_centro_distribucion)),
         concat_ws('|', trim(n.cod_compania), trim(n.cod_supervisor)),
         CAST(n.cod_zona AS VARCHAR), n.desc_zona, 'Zona', n.es_activo
  FROM m_zona n JOIN conformed c ON n.cod_compania = c.cod_compania
  UNION ALL
  SELECT concat_ws('|', trim(n.cod_compania), trim(g.cod_sucursal), trim(g.cod_region),
                   trim(g.cod_subregion), trim(n.cod_division)),
         c.id_pais,
         concat_ws('|', trim(n.cod_compania), trim(g.cod_sucursal)),
         concat_ws('|', trim(c.id_pais), trim(g.cod_region), trim(g.cod_subregion)),
         concat_ws('|', trim(n.cod_compania), trim(n.cod_jefe_venta)),
         CAST(trim(n.cod_division) AS VARCHAR), n.desc_division, 'División', n.es_activo
  FROM m_division n
  JOIN zona_geo g ON n.cod_compania = g.cod_compania
                 AND n.cod_division = g.cod_centro_distribucion
  JOIN conformed c ON n.cod_compania = c.cod_compania
  UNION ALL
  SELECT concat_ws('|', trim(mp.id_pais), trim(n.cod_region), trim(n.cod_subregion)),
         mp.id_pais, CAST(NULL AS VARCHAR),
         concat_ws('|', trim(mp.id_pais), trim(n.cod_region)),
         CAST(NULL AS VARCHAR),
         CAST(trim(n.cod_subregion) AS VARCHAR), n.desc_subregion, 'Subregión', n.es_activo
  FROM m_subregion n JOIN m_pais mp ON mp.cod_pais = n.cod_pais
  UNION ALL
  SELECT concat_ws('|', trim(mp.id_pais), trim(n.cod_region)),
         mp.id_pais, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR),
         CAST(trim(n.cod_region) AS VARCHAR), n.desc_region, 'Región', n.es_activo
  FROM m_region n JOIN m_pais mp ON mp.cod_pais = n.cod_pais
)
SELECT DISTINCT *, DATE '{as_of}' AS fecha_creacion, DATE '{as_of}' AS fecha_modificacion
FROM levels
"""


def test_m_estructura_comercial_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    reg = SchemaRegistry({})
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))
    spark.createDataFrame(
        [
            ("10", "01", "F1", "RT1", "Z1", "V9", "RUTA UNO", "T"),
            ("10", "01", "F1", "RT1", "Z1", "V9", "RUTA UNO", "T"),  # dup → distinct
            ("99", "01", "F1", "RT9", "Z1", "V9", "RUTA GHOST", "T"),  # orphan pais
        ],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_ruta string, cod_zona string, cod_vendedor string, desc_ruta string, "
        "es_activo string",
    ).write.parquet(stage("m_ruta"))
    spark.createDataFrame(
        [
            ("10", "01", "Z1", "RG1", "SR1", "D1", "SUP1", "ZONA UNO", "T"),
            ("10", "01", "Z2", "RG1", "SR1", "D1", "SUP2", "ZONA DOS", "T"),
        ],
        "cod_compania string, cod_sucursal string, cod_zona string, "
        "cod_region string, cod_subregion string, cod_centro_distribucion string, "
        "cod_supervisor string, desc_zona string, es_activo string",
    ).write.parquet(stage("m_zona"))
    spark.createDataFrame(
        [("10", "D1", "JV1", "DIVISION UNO", "T"),
         ("10", "DX", "JV1", "DIVISION HUERFANA", "T")],  # no zona context → dropped
        "cod_compania string, cod_division string, cod_jefe_venta string, "
        "desc_division string, es_activo string",
    ).write.parquet(stage("m_division"))
    spark.createDataFrame(
        [("PE", "RG1", "SR1", "SUBREGION UNO", "T")],
        "cod_pais string, cod_region string, cod_subregion string, "
        "desc_subregion string, es_activo string",
    ).write.parquet(stage("m_subregion"))
    spark.createDataFrame(
        [("PE", "RG1", "REGION UNO", "T")],
        "cod_pais string, cod_region string, desc_region string, es_activo string",
    ).write.parquet(stage("m_region"))

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves(
        [JobConfig("domain", "m_estructura_comercial_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_estructura_comercial")
    ).toPandas()

    con = duck_with_views(
        {t: stage(t) for t in (
            "m_compania", "m_pais", "m_ruta", "m_zona", "m_division",
            "m_subregion", "m_region",
        )}
    )
    odf = con.sql(_MEC_SQL.format(as_of=AS_OF.isoformat())).df()
    assert_match(sdf, odf, "m_estructura_comercial")
    # pins: 1 ruta (dup collapsed, ghost-company row dropped) + 2 zonas +
    # 1 división (orphan DX dropped) + 1 subregión + 1 región = 6 nodes;
    # the división recovered its geography through the DISTINCT zona context
    assert len(sdf) == 6
    tipos = sdf.groupby("cod_tipo_estructura_comercial").size().to_dict()
    assert tipos == {"División": 1, "Región": 1, "Ruta": 1, "Subregión": 1, "Zona": 2}
    div = sdf[sdf.cod_tipo_estructura_comercial.eq("División")].iloc[0]
    assert div["id_estructura_comercial"] == "10|01|RG1|SR1|D1"
    assert div["id_estructura_comercial_padre"] == "PE|RG1|SR1"


# ===========================================================================
# 11. fact_venta_cliente_historico — the historic client-sales rollup
#     (`code/analytics/fact_venta_cliente_historico.py:27-147`): detail ⋈
#     header ⋈ (left) order ⋈ sales-type dim with the VEN/EXP whitelist
#     INSIDE the join condition, max(coalesce(header, order)) territory
#     backfills, 34-measure decimal surface with the /30 conversions —
#     recomputed column-for-column from the DOMAIN universe.
# ===========================================================================

_FVCH_SUMS = [
    "imp_neto_vta_mn", "imp_neto_vta_me", "imp_bruto_vta_mn", "imp_bruto_vta_me",
    "imp_dscto_mn", "imp_dscto_me", "imp_cobrar_vta_mn", "imp_cobrar_vta_me",
    "imp_paquete_vta_mn", "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
    "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
    "imp_valorizado_pro_me",
]
_FVCH_TAXES = [f"imp_impuesto{i}_{c}" for i in range(1, 7) for c in ("mn", "me")]
# fixture measure order: 4 quantities, 2 desnimp, 16 sums, 12 taxes
_FVCH_MEASURES = [
    "cant_caja_fisica_ven", "cant_caja_volumen_ven",
    "cant_caja_fisica_pro", "cant_caja_volumen_pro",
    "imp_desnimp_mn", "imp_desnimp_me",
] + _FVCH_SUMS + _FVCH_TAXES

_FVCH_SQL = """
WITH venta AS (
  SELECT * FROM t_venta WHERE id_periodo IN ({periods})
), detalle AS (
  SELECT * FROM t_venta_detalle WHERE id_periodo IN ({periods})
)
SELECT tv.id_pais, tv.id_periodo, tv.id_sucursal, tv.id_cliente,
       tvd.id_producto, tv.id_forma_pago, tv.id_lista_precio,
       CAST(strptime(tv.id_periodo || '01', '%Y%m%d') AS DATE) AS fecha_liquidacion,
       MAX(COALESCE(tv.desc_region, tp.desc_region)) AS desc_region,
       MAX(COALESCE(tv.desc_subregion, tp.desc_subregion)) AS desc_subregion,
       MAX(COALESCE(tv.desc_division, tp.desc_division)) AS desc_division,
       MAX(COALESCE(tv.cod_zona, tp.cod_zona)) AS cod_zona,
       MAX(COALESCE(tv.cod_ruta, tp.cod_ruta)) AS cod_ruta,
       MAX(COALESCE(tv.cod_modulo, tp.cod_modulo)) AS cod_modulo,
       CAST(SUM(tvd.cant_caja_fisica_ven) AS DECIMAL(38,12)) AS cant_cajafisica_vta,
       CAST(SUM(tvd.cant_caja_volumen_ven) / 30 AS DECIMAL(38,12)) AS cant_cajaunitaria_vta,
       CAST(SUM(tvd.cant_caja_fisica_pro) AS DECIMAL(38,12)) AS cant_cajafisica_pro,
       CAST(SUM(tvd.cant_caja_volumen_pro) / 30 AS DECIMAL(38,12)) AS cant_cajaunitaria_pro,
       CAST(SUM(tvd.imp_desnimp_mn) AS DECIMAL(38,12)) AS imp_dscto_sinimpvta_mn,
       CAST(SUM(tvd.imp_desnimp_me) AS DECIMAL(38,12)) AS imp_dscto_sinimpvta_me,
       {sum_out}
FROM detalle tvd
JOIN venta tv ON tvd.id_venta = tv.id_venta
LEFT JOIN t_pedido tp ON tv.id_pedido = tp.id_pedido
JOIN m_tipo_venta mtv
  ON tv.id_tipo_venta = mtv.id_tipo_venta
 AND upper(mtv.cod_tipo_operacion) IN ('VEN', 'EXP')
WHERE tv.es_eliminado = 0
GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
"""


def test_fact_venta_cliente_historico_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731

    def dline(id_venta, periodo, producto, i):
        vals = []
        for j, name in enumerate(_FVCH_MEASURES):
            if name in ("cant_caja_volumen_ven", "cant_caja_volumen_pro"):
                # multiples of 3 so the /30 conversion is exact in any scale
                vals.append(D(str(3 * ((i + 1) * 10 + j))))
            else:
                vals.append(D(f"{(i + 1) * 100 + j}.25"))
        return (id_venta, periodo, producto, *vals)

    detalle = [
        dline("V1", "202503", "P1", 0),
        dline("V1", "202503", "P1", 1),    # same group → summed
        dline("V1", "202503", "P2", 2),    # second product group
        dline("V1", "202401", "P1", 3),    # detail out of window → dropped
        dline("V2", "202504", "P1", 4),
        dline("V3", "202505", "P1", 5),    # header op 'DEV' → whitelist drop
        dline("V3B", "202505", "P1", 10),  # header op NULL → whitelist drop
        dline("V4", "202505", "P1", 6),    # deleted header → dropped
        dline("V5", "202505", "P3", 7),    # merges with V7's line
        dline("V7", "202505", "P3", 8),    # same 7-key group as V5
        dline("V6", "202401", "P1", 9),    # out-of-window header
    ]
    det_schema = (
        "id_venta string, id_periodo string, id_producto string, "
        + ", ".join(f"{c} decimal(38,12)" for c in _FVCH_MEASURES)
    )
    # id_venta, id_pedido, id_pais, id_periodo, id_sucursal, id_cliente,
    # id_forma_pago, id_lista_precio, id_tipo_venta, es_eliminado,
    # desc_region, desc_subregion, desc_division, cod_zona, cod_ruta, cod_modulo
    venta = [
        # all-NULL territory → every attr backfills from order PD1
        ("V1", "PD1", "PE", "202503", "S1", "C1", "FP1", "LP1", "TV1", 0,
         None, None, None, None, None, None),
        # order id unknown → left-join misses; header's own attrs survive,
        # the NULL subregion stays NULL
        ("V2", "PDX", "PE", "202504", "S1", "C1", "FP1", "LP1", "TV2", 0,
         "SUR", None, "DIVS", "ZS1", "RS1", "MS1"),
        ("V3", "PD1", "PE", "202505", "S1", "C1", "FP1", "LP1", "TV3", 0,
         "X", "X", "X", "X", "X", "X"),
        ("V3B", "PD1", "PE", "202505", "S1", "C1", "FP1", "LP1", "TV4", 0,
         "X", "X", "X", "X", "X", "X"),
        ("V4", "PD1", "PE", "202505", "S1", "C2", "FP1", "LP1", "TV1", 1,
         "X", "X", "X", "X", "X", "X"),
        # V5/V7 share the 7-key group: per-attr max over coalesce results —
        # OESTE beats ANDES, V5's own SUBS beats V7's PD2-backfilled SUBE
        ("V5", "PD2", "PE", "202505", "S2", "C2", "FP2", "LP2", "TV1", 0,
         "OESTE", "SUBS", None, "ZV5", None, "MV5"),
        ("V7", "PD2", "PE", "202505", "S2", "C2", "FP2", "LP2", "TV1", 0,
         "ANDES", None, "DIVV7", None, "RV7", None),
        ("V6", "PD1", "PE", "202401", "S1", "C1", "FP1", "LP1", "TV1", 0,
         "X", "X", "X", "X", "X", "X"),
    ]
    venta_schema = (
        "id_venta string, id_pedido string, id_pais string, id_periodo string, "
        "id_sucursal string, id_cliente string, id_forma_pago string, "
        "id_lista_precio string, id_tipo_venta string, es_eliminado int, "
        "desc_region string, desc_subregion string, desc_division string, "
        "cod_zona string, cod_ruta string, cod_modulo string"
    )
    pedido = [
        ("PD1", "NORTE", "SUBN", "DIVN", "ZP1", "RP1", "MP1"),
        ("PD2", "ESTE", "SUBE", "DIVE", "ZP2", "RP2", "MP2"),
    ]
    pedido_schema = (
        "id_pedido string, desc_region string, desc_subregion string, "
        "desc_division string, cod_zona string, cod_ruta string, cod_modulo string"
    )
    tipo_venta = [
        ("TV1", "VEN"), ("TV2", "exp"), ("TV3", "DEV"), ("TV4", None),
    ]
    spark.createDataFrame(detalle, det_schema).write.parquet(dom("t_venta_detalle"))
    spark.createDataFrame(venta, venta_schema).write.parquet(dom("t_venta"))
    spark.createDataFrame(pedido, pedido_schema).write.parquet(dom("t_pedido"))
    spark.createDataFrame(
        tipo_venta, "id_tipo_venta string, cod_tipo_operacion string"
    ).write.parquet(dom("m_tipo_venta"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "fact_venta_cliente_historico_lite", 1, periods=3)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_cliente_historico")
    ).toPandas()

    con = duck_with_views({t: dom(t) for t in (
        "t_venta", "t_venta_detalle", "t_pedido", "m_tipo_venta",
    )})
    sum_out = ",\n       ".join(
        f"CAST(SUM(tvd.{c}) AS DECIMAL(38,12)) AS {c}"
        for c in _FVCH_SUMS + _FVCH_TAXES
    )
    odf = con.sql(
        _FVCH_SQL.format(periods="'202503', '202504', '202505'", sum_out=sum_out)
    ).df()
    assert_match(sdf, odf, "fact_venta_cliente_historico")

    # hand-computed pins: 4 surviving groups
    assert len(sdf) == 4
    g1 = sdf[(sdf.id_periodo == "202503") & (sdf.id_producto == "P1")].iloc[0]
    # lines i=0,1: fisica_ven 100.25 + 200.25; volumen_ven 33 + 63 → 96/30
    assert float(g1["cant_cajafisica_vta"]) == 300.50
    assert float(g1["cant_cajaunitaria_vta"]) == 3.2
    # every territory attr backfilled through the order left join
    assert g1["desc_region"] == "NORTE" and g1["cod_modulo"] == "MP1"
    g3 = sdf[sdf.id_periodo == "202504"].iloc[0]
    assert g3["desc_region"] == "SUR" and g3["desc_subregion"] is None
    g4 = sdf[sdf.id_producto == "P3"].iloc[0]
    assert g4["desc_region"] == "OESTE"      # max(OESTE, ANDES)
    assert g4["desc_subregion"] == "SUBS"    # own beats backfill in max
    assert g4["desc_division"] == "DIVV7"    # max(PD2's DIVE, V7's own DIVV7)
    assert g4["fecha_liquidacion"] == dt.date(2025, 5, 1)


# ===========================================================================
# 12. t_movimiento_inventario_detalle — the widest domain job (52-column
#     serving surface, `code/domain/t_movimiento_inventario_detalle.py:
#     26-236`): operation-direction signing from the warehouse-doc master,
#     directional ingreso/salida splits, PLI+GRA transit gate, REV kardex
#     fallback, zero-package guard on package→case totals, CPM valuation
#     with the zero-rate guard (precio_me) vs NULLIF (valorizado_me) —
#     recomputed column-for-column from the STAGE universe.
# ===========================================================================

_TMID_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais, mpar.cod_moneda_mn AS moneda_mn
  FROM m_compania mc
  JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
  LEFT JOIN m_parametro mpar ON mpar.id_compania = mc.cod_compania
), base AS (
  SELECT b.id_pais, strftime(t.fecha_almacen, '%Y%m') AS id_periodo,
         t.cod_compania AS id_compania, t.id_sucursal, t.id_almacen,
         t.id_articulo, t.id_movimiento_almacen, t.fecha_almacen,
         t.cod_documento_transaccion, t.nro_documento_almacen,
         t.cod_procedimiento, t.id_centro_costo, t.nro_documento_movimiento,
         t.nro_linea_comprobante,
         t.cod_documento_transaccion_ref AS cod_documento_transaccion_referencia,
         t.nro_documento_almacen_ref AS nro_documento_almacen_referencia,
         t.cod_estado_comprobante, t.cod_motivo,
         t.cod_unidad_articulo AS cod_unidad_almacen, t.nro_secuencia_origen,
         t.usuario_creacion, t.fecha_creacion, t.usuario_modificacion,
         t.fecha_modificacion,
         CASE WHEN mda.cod_operacion_origen = 'S' THEN 1 ELSE -1 END AS sgn,
         mda.cod_operacion_origen = 'S' AS entrada,
         mda.cod_operacion_origen = 'R' AS salida,
         t.estado = 'PLI' AND t.cod_documento_transaccion = 'GRA' AS transito,
         CASE WHEN t.cod_procedimiento = 'REV' THEN t.operacion_kardex
              ELSE mda.cod_operacion_origen END AS cod_operacion_kardex,
         t.cant_cajas, t.cant_botellas, t.cant_unidades,
         t.costo_unitario, t.costo_total,
         ma.cant_unidad_paquete, b.moneda_mn
  FROM t_movimiento_inventario_detalle t
  JOIN m_documento_almacen mda
    ON t.cod_compania = mda.cod_compania
   AND t.cod_procedimiento = mda.cod_transaccion
  JOIN bridge b ON t.cod_compania = b.cod_compania
  JOIN m_articulo ma ON t.id_articulo = ma.id_articulo
  WHERE strftime(t.fecha_almacen, '%Y%m') IN ({periods})
), sgned AS (
  SELECT *,
         sgn * cant_cajas AS cant_cajafisica,
         sgn * cant_botellas AS s_unidades,
         sgn * cant_unidades AS s_unidades_total,
         CASE WHEN entrada THEN cant_cajas ELSE 0 END AS cant_cajafisica_ingresada,
         CASE WHEN salida THEN cant_cajas ELSE 0 END AS cant_cajafisica_salida,
         CASE WHEN entrada THEN cant_botellas ELSE 0 END AS cant_unidades_ingresada,
         CASE WHEN salida THEN cant_botellas ELSE 0 END AS cant_unidades_salida,
         CASE WHEN entrada THEN cant_unidades ELSE 0 END AS cant_unidades_total_ingresada,
         CASE WHEN salida THEN cant_unidades ELSE 0 END AS cant_unidades_total_salida,
         CASE WHEN entrada THEN costo_total ELSE 0 END AS imp_total_ingreso,
         CASE WHEN salida THEN costo_total ELSE 0 END AS imp_total_salida,
         CASE WHEN transito THEN cant_unidades ELSE 0 END AS cant_unidades_transito,
         CASE WHEN transito THEN costo_total ELSE 0 END AS imp_total_transito
  FROM base
)
SELECT CAST(s.id_pais AS VARCHAR) AS id_pais, s.id_periodo, s.id_compania,
       s.id_sucursal, s.id_almacen, s.id_articulo, s.id_movimiento_almacen,
       s.fecha_almacen, s.cod_documento_transaccion, s.nro_documento_almacen,
       s.cod_procedimiento, s.cod_operacion_kardex, s.id_centro_costo,
       s.nro_documento_movimiento, s.nro_linea_comprobante,
       s.cod_documento_transaccion_referencia, s.nro_documento_almacen_referencia,
       s.cod_estado_comprobante, s.cod_motivo, s.cod_unidad_almacen,
       s.nro_secuencia_origen,
       CAST(s.cant_cajafisica AS DECIMAL(38,12)) AS cant_cajafisica,
       CAST(CASE WHEN s.cant_unidad_paquete = 0 THEN s.cant_cajafisica
            ELSE s.cant_cajafisica + s.s_unidades / s.cant_unidad_paquete
            END AS DECIMAL(38,12)) AS cant_cajafisica_total,
       CAST(s.s_unidades AS DECIMAL(38,12)) AS cant_unidades,
       CAST(s.s_unidades_total AS DECIMAL(38,12)) AS cant_unidades_total,
       CAST(s.cant_cajafisica_ingresada AS DECIMAL(38,12)) AS cant_cajafisica_ingresada,
       CAST(CASE WHEN s.cant_unidad_paquete = 0 THEN s.cant_cajafisica_ingresada
            ELSE s.cant_cajafisica_ingresada + s.cant_unidades_ingresada / s.cant_unidad_paquete
            END AS DECIMAL(38,12)) AS cant_cajafisica_ingresada_total,
       CAST(s.cant_cajafisica_salida AS DECIMAL(38,12)) AS cant_cajafisica_salida,
       CAST(CASE WHEN s.cant_unidad_paquete = 0 THEN s.cant_cajafisica_salida
            ELSE s.cant_cajafisica_salida + s.cant_unidades_salida / s.cant_unidad_paquete
            END AS DECIMAL(38,12)) AS cant_cajafisica_salida_total,
       CAST(s.cant_unidades_ingresada AS DECIMAL(38,12)) AS cant_unidades_ingresada,
       CAST(s.cant_unidades_salida AS DECIMAL(38,12)) AS cant_unidades_salida,
       CAST(s.cant_unidades_total_ingresada AS DECIMAL(38,12)) AS cant_unidades_total_ingresada,
       CAST(s.cant_unidades_total_salida AS DECIMAL(38,12)) AS cant_unidades_total_salida,
       CAST(s.costo_unitario AS DECIMAL(38,12)) AS imp_unitario,
       CAST(s.costo_total AS DECIMAL(38,12)) AS imp_total,
       CAST(s.imp_total_ingreso AS DECIMAL(38,12)) AS imp_total_ingreso,
       CAST(s.imp_total_salida AS DECIMAL(38,12)) AS imp_total_salida,
       CAST(s.cant_unidades_transito AS DECIMAL(38,12)) AS cant_unidades_transito,
       CAST(s.imp_total_transito AS DECIMAL(38,12)) AS imp_total_transito,
       CAST(c.imp_cpm AS DECIMAL(38,12)) AS precio_unitario_mn,
       CAST(CASE WHEN mtc.tc_compra = 0 THEN 0
            ELSE c.imp_cpm / mtc.tc_compra END AS DECIMAL(38,12)) AS precio_unitario_me,
       CAST(s.cant_cajafisica * c.imp_cpm AS DECIMAL(38,12)) AS imp_valorizado_mn,
       CAST(s.cant_cajafisica * c.imp_cpm / NULLIF(mtc.tc_compra, 0)
            AS DECIMAL(38,12)) AS imp_valorizado_me,
       CAST(c.imp_saldo_inicial AS DECIMAL(30,4)) AS imp_saldo_inicial,
       CAST(c.imp_saldo_final AS DECIMAL(30,4)) AS imp_saldo_final,
       CAST(c.imp_ingreso AS DECIMAL(30,4)) AS imp_valorizado_ingreso,
       CAST(c.imp_salida AS DECIMAL(30,4)) AS imp_valorizado_salida,
       s.usuario_creacion, s.fecha_creacion, s.usuario_modificacion,
       s.fecha_modificacion, CAST(1 AS INT) AS es_eliminado
FROM sgned s
LEFT JOIN t_cierre_inventario_cpm c
  ON c.id_sucursal = s.id_sucursal AND c.id_articulo = s.id_articulo
 AND c.id_periodo = s.id_periodo
LEFT JOIN m_tipo_cambio mtc
  ON s.id_compania = mtc.cod_compania AND s.fecha_almacen = mtc.fecha
 AND s.moneda_mn = mtc.cod_moneda
"""


def test_t_movimiento_inventario_detalle_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    d = dt.date

    def det(id_mov, comp, proc, art, fecha, doc, estado, kardex,
            cajas, botellas, unidades, cu, ct):
        return (
            comp, proc, art, "S1", "AL1", id_mov, fecha, doc, f"N-{id_mov}",
            "CC1", f"M-{id_mov}", "1", "REF", "NR", estado, "MOT", "CAJ",
            "1", "u.load", TS, "u.load", TS,
            D(cajas), D(botellas), D(unidades), D(cu), D(ct), estado, kardex,
        )

    rows = [
        # entry + transit (PLI+GRA), package 12 → total = 10 + 6/12
        det("R1", "10", "ING", "A1", d(2025, 5, 10), "GRA", "PLI", None,
            "10", "6", "126", "2.5", "315"),
        # exit, zero-package guard, no CPM, no fx row for that date
        det("R2", "10", "SAL", "A2", d(2025, 4, 20), "GRA", "APR", None,
            "4", "8", "40", "2.5", "100"),
        # REV → kardex fallback 'X'; PLI but doc GRB → NOT transit;
        # fx row with tc_compra=0 → precio_me=0 but valorizado_me NULL
        det("R3", "10", "REV", "A3", d(2025, 5, 15), "GRB", "PLI", "X",
            "3", "3", "21", "2.0", "60"),
        det("R4", "10", "ING", "A1", d(2024, 12, 31), "GRA", "PLI", None,
            "1", "1", "1", "1", "1"),          # out of window
        det("R5", "10", "XXX", "A1", d(2025, 5, 11), "GRA", "APR", None,
            "1", "1", "1", "1", "1"),          # proc not in doc master
        det("R6", "99", "ING", "A1", d(2025, 5, 12), "GRA", "APR", None,
            "1", "1", "1", "1", "1"),          # ghost company → bridge drop
    ]
    det_schema = (
        "cod_compania string, cod_procedimiento string, id_articulo string, "
        "id_sucursal string, id_almacen string, id_movimiento_almacen string, "
        "fecha_almacen date, cod_documento_transaccion string, "
        "nro_documento_almacen string, id_centro_costo string, "
        "nro_documento_movimiento string, nro_linea_comprobante string, "
        "cod_documento_transaccion_ref string, nro_documento_almacen_ref string, "
        "cod_estado_comprobante string, cod_motivo string, "
        "cod_unidad_articulo string, nro_secuencia_origen string, "
        "usuario_creacion string, fecha_creacion timestamp, "
        "usuario_modificacion string, fecha_modificacion timestamp, "
        "cant_cajas decimal(20,4), cant_botellas decimal(20,4), "
        "cant_unidades decimal(20,4), costo_unitario decimal(20,4), "
        "costo_total decimal(20,4), estado string, operacion_kardex string"
    )
    spark.createDataFrame(rows, det_schema).write.parquet(
        stage("t_movimiento_inventario_detalle")
    )
    spark.createDataFrame(
        [("10", "ING", "S"), ("10", "SAL", "R"), ("10", "REV", "R")],
        "cod_compania string, cod_transaccion string, cod_operacion_origen string",
    ).write.parquet(stage("m_documento_almacen"))
    spark.createDataFrame(
        [("A1", D("12")), ("A2", D("0")), ("A3", D("6"))],
        "id_articulo string, cant_unidad_paquete decimal(10,2)",
    ).write.parquet(stage("m_articulo"))
    spark.createDataFrame(
        [
            ("S1", "A1", "202505", D("7.0"), D("100.5"), D("200.5"),
             D("50.25"), D("25.25")),
            ("S1", "A3", "202505", D("9.0"), D("10"), D("20"), D("5"), D("2")),
        ],
        "id_sucursal string, id_articulo string, id_periodo string, "
        "imp_cpm decimal(20,4), imp_saldo_inicial decimal(20,4), "
        "imp_saldo_final decimal(20,4), imp_ingreso decimal(20,4), "
        "imp_salida decimal(20,4)",
    ).write.parquet(stage("t_cierre_inventario_cpm"))
    spark.createDataFrame(
        [("10", d(2025, 5, 10), "PEN", D("3.5")),
         ("10", d(2025, 5, 15), "PEN", D("0"))],
        "cod_compania string, fecha date, cod_moneda string, tc_compra decimal(12,6)",
    ).write.parquet(stage("m_tipo_cambio"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))
    spark.createDataFrame(
        [("10", "PEN")], "id_compania string, cod_moneda_mn string"
    ).write.parquet(stage("m_parametro"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "t_movimiento_inventario_detalle_lite", 1, periods=3)],
        DOMAIN_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_movimiento_inventario_detalle")
    ).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "t_movimiento_inventario_detalle", "m_documento_almacen", "m_articulo",
        "t_cierre_inventario_cpm", "m_tipo_cambio", "m_compania", "m_pais",
        "m_parametro",
    )})
    odf = con.sql(_TMID_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_movimiento_inventario_detalle")

    # hand-computed pins
    assert len(sdf) == 3
    r1 = sdf[sdf.id_movimiento_almacen == "R1"].iloc[0]
    assert float(r1["cant_cajafisica"]) == 10.0
    assert float(r1["cant_cajafisica_total"]) == 10.5      # 10 + 6/12
    assert float(r1["cant_unidades_transito"]) == 126.0    # PLI + GRA
    assert float(r1["imp_total_transito"]) == 315.0
    assert float(r1["precio_unitario_me"]) == 2.0          # 7.0 / 3.5
    assert float(r1["imp_valorizado_me"]) == 20.0          # 10*7/3.5
    assert r1["cod_operacion_kardex"] == "S"
    r2 = sdf[sdf.id_movimiento_almacen == "R2"].iloc[0]
    assert float(r2["cant_cajafisica"]) == -4.0
    assert float(r2["cant_cajafisica_total"]) == -4.0      # zero-package guard
    assert float(r2["cant_cajafisica_salida_total"]) == 4.0
    assert pd.isna(r2["precio_unitario_mn"]) and pd.isna(r2["imp_valorizado_me"])
    assert float(r2["cant_unidades_transito"]) == 0.0      # estado APR
    r3 = sdf[sdf.id_movimiento_almacen == "R3"].iloc[0]
    assert r3["cod_operacion_kardex"] == "X"               # REV fallback
    assert float(r3["cant_cajafisica_total"]) == -3.5      # -3 + -3/6
    assert float(r3["precio_unitario_me"]) == 0.0          # zero-rate guard
    assert pd.isna(r3["imp_valorizado_me"])                # NULLIF path
    assert float(r3["imp_valorizado_mn"]) == -27.0
    assert float(r3["cant_unidades_transito"]) == 0.0      # doc GRB


# ===========================================================================
# 13. m_cliente — the client master (`code/domain/m_cliente.py:22-156`):
#     when()-inside-join-key module assignment ('00' clients match any
#     sucursal), rank-predicate coordinate pick, filtered-left tipo join,
#     null-guarded eje mint, 'SG'-infixed classification key, coalesce
#     defaults — the full 36-column surface recomputed in SQL.
# ===========================================================================

_MCLIENTE_SQL = """
WITH conformed AS (
  SELECT mco.cod_compania, mp.id_pais
  FROM m_compania mco JOIN m_pais mp ON mco.cod_pais = mp.cod_pais
), coords AS (
  SELECT mcl.cod_compania, mcl.cod_sucursal, mcl.cod_cliente,
         ma.coord_x, ma.coord_y,
         ROW_NUMBER() OVER (
           PARTITION BY mcl.cod_compania, mcl.cod_sucursal, mcl.cod_cliente
           ORDER BY ma.cod_fuerza_venta ASC) AS orden
  FROM m_cliente mcl
  JOIN m_asignacion_modulo ma
    ON mcl.cod_compania = ma.cod_compania
   AND mcl.cod_cliente = ma.cod_cliente
   AND mcl.cod_sucursal = CASE WHEN mcl.cod_sucursal = '00'
                               THEN mcl.cod_sucursal ELSE ma.cod_sucursal END
)
SELECT concat_ws('|', trim(mc.cod_compania), trim(mc.cod_cliente)) AS id_cliente,
       CAST(NULL AS VARCHAR) AS id_cliente_ref,
       CAST(NULL AS VARCHAR) AS id_cliente_ref2,
       c.id_pais, mc.cod_compania, mc.cod_sucursal,
       concat_ws('|', trim(mc.cod_compania), trim(mc.cod_sucursal)) AS id_sucursal,
       CASE WHEN mc.cod_zona_postal IS NULL OR mc.cod_zona_postal = '' THEN NULL
            ELSE concat_ws('|', trim(c.id_pais),
                           trim(COALESCE(mc.cod_zona_postal, '0')))
       END AS id_eje_territorial,
       concat_ws('|', trim(mc.cod_compania), 'SG', trim(mc.cod_subgiro))
         AS id_clasificacion_cliente,
       concat_ws('|', trim(mc.cod_compania), trim(mc.cod_lista_precio))
         AS id_lista_precio,
       mc.cod_cliente, mc.nomb_cliente,
       cc.cod_cuenta_clave, cc.descripcion AS nomb_cuenta_clave,
       CAST(NULL AS VARCHAR) AS cod_segmento,
       CAST(NULL AS VARCHAR) AS desc_subsegmento,
       CAST(NULL AS VARCHAR) AS cod_cliente_ref,
       CAST(NULL AS VARCHAR) AS cod_cliente_ref2,
       CAST(NULL AS VARCHAR) AS cod_cliente_ref3,
       CAST(NULL AS VARCHAR) AS cod_cliente_ref4,
       cn.desc_canal AS desc_canal_local,
       g.desc_giro AS desc_giro_local,
       mc.direccion,
       mc.tipo_documento_identidad AS tipo_documento,
       mc.nro_documento_identidad AS nro_documento,
       tc.tipo_cliente,
       COALESCE(tc.tipo_cliente, 'N') AS cod_tipo_cliente,
       COALESCE(mc.cod_cliente_principal, '0') AS cod_cliente_principal,
       CAST(NULL AS VARCHAR) AS cod_cliente_transferencia,
       co.coord_x, co.coord_y,
       CAST(NULL AS DATE) AS fecha_baja,
       mc.es_activo, mc.es_activo AS estado,
       mc.fecha_creacion, mc.fecha_modificacion
FROM m_cliente mc
LEFT JOIN m_tipo_cliente tc
  ON mc.cod_compania = tc.cod_compania AND mc.cod_cliente = tc.cod_cliente
 AND lower(tc.tipo_cliente) IN ('a', 'v', 't')
LEFT JOIN coords co
  ON mc.cod_compania = co.cod_compania AND mc.cod_cliente = co.cod_cliente
 AND co.orden = 1
LEFT JOIN m_cuenta_clave cc
  ON mc.cod_compania = cc.cod_compania
 AND mc.cod_cuenta_clave = cc.cod_cuenta_clave
LEFT JOIN m_canal cn
  ON cn.cod_compania = mc.cod_compania AND cn.cod_canal = mc.cod_canal
LEFT JOIN m_giro g
  ON g.cod_compania = mc.cod_compania AND g.cod_giro = mc.cod_giro
JOIN conformed c ON mc.cod_compania = c.cod_compania
"""


def test_m_cliente_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731

    clientes = [
        ("10", "C1", "01", "15001", "SG1", "LP1", "CLIENTE UNO", "KA1", "CH1",
         "G1", "CALLE 1", "DNI", "111", "P1", "T", TS, TS),
        # '00' sucursal → assignment from ANY sucursal; empty postal → NULL
        # eje; tipo filtered out → 'N' default; NULL principal → '0'
        ("10", "C2", "00", "", "SG2", "LP2", "CLIENTE DOS", None, "CHX",
         "G2", "CALLE 2", "RUC", "222", None, "T", TS, TS),
        # no assignment for its own sucursal → NULL coords; NULL postal
        ("10", "C3", "02", None, "SG3", "LP3", "CLIENTE TRES", "KAX", "CH1",
         None, "CALLE 3", "DNI", "333", "P3", "F", TS, TS),
        ("99", "C9", "01", "1", "SG", "LP", "GHOST", "K", "C", "G", "X",
         "D", "9", "0", "T", TS, TS),  # ghost company → conformed drop
    ]
    cli_schema = (
        "cod_compania string, cod_cliente string, cod_sucursal string, "
        "cod_zona_postal string, cod_subgiro string, cod_lista_precio string, "
        "nomb_cliente string, cod_cuenta_clave string, cod_canal string, "
        "cod_giro string, direccion string, tipo_documento_identidad string, "
        "nro_documento_identidad string, cod_cliente_principal string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp"
    )
    asignacion = [
        ("10", "C1", "01", "-77.1", "-12.1", "FV2"),
        ("10", "C1", "01", "-77.2", "-12.2", "FV1"),   # top-1 by fv asc
        ("10", "C1", "03", "-99", "-99", "FV0"),       # other sucursal → no match
        ("10", "C2", "01", "-70.1", "-11.1", "FV2"),
        ("10", "C2", "02", "-70.2", "-11.2", "FV1"),   # '00' matches across both
        ("10", "C3", "03", "-60", "-10", "FV1"),       # C3 is '02' → no match
    ]
    spark.createDataFrame(clientes, cli_schema).write.parquet(stage("m_cliente"))
    spark.createDataFrame(
        asignacion,
        "cod_compania string, cod_cliente string, cod_sucursal string, "
        "coord_x string, coord_y string, cod_fuerza_venta string",
    ).write.parquet(stage("m_asignacion_modulo"))
    spark.createDataFrame(
        [("10", "C1", "A"), ("10", "C2", "X"), ("10", "C3", "v")],
        "cod_compania string, cod_cliente string, tipo_cliente string",
    ).write.parquet(stage("m_tipo_cliente"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))
    spark.createDataFrame(
        [("10", "KA1", "CUENTA CLAVE UNO")],
        "cod_compania string, cod_cuenta_clave string, descripcion string",
    ).write.parquet(stage("m_cuenta_clave"))
    spark.createDataFrame(
        [("10", "CH1", "BODEGA")],
        "cod_compania string, cod_canal string, desc_canal string",
    ).write.parquet(stage("m_canal"))
    spark.createDataFrame(
        [("10", "G1", "ABARROTES"), ("10", "G2", "LICORES")],
        "cod_compania string, cod_giro string, desc_giro string",
    ).write.parquet(stage("m_giro"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves([JobConfig("domain", "m_cliente_lite", 1)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_cliente")).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "m_cliente", "m_asignacion_modulo", "m_tipo_cliente", "m_compania",
        "m_pais", "m_cuenta_clave", "m_canal", "m_giro",
    )})
    odf = con.sql(_MCLIENTE_SQL).df()
    assert_match(sdf, odf, "m_cliente")

    # hand-computed pins
    assert len(sdf) == 3
    c1 = sdf[sdf.cod_cliente == "C1"].iloc[0]
    assert c1["id_eje_territorial"] == "PE|15001"
    assert c1["id_clasificacion_cliente"] == "10|SG|SG1"
    assert (c1["coord_x"], c1["coord_y"]) == ("-77.2", "-12.2")  # FV1 wins
    assert c1["nomb_cuenta_clave"] == "CUENTA CLAVE UNO"
    assert c1["cod_tipo_cliente"] == "A"
    c2 = sdf[sdf.cod_cliente == "C2"].iloc[0]
    assert c2["id_eje_territorial"] is None          # empty postal
    assert c2["cod_tipo_cliente"] == "N"             # 'X' filtered → default
    assert c2["cod_cliente_principal"] == "0"
    assert (c2["coord_x"], c2["coord_y"]) == ("-70.2", "-11.2")  # cross-sucursal
    assert c2["desc_canal_local"] is None and c2["desc_giro_local"] == "LICORES"
    c3 = sdf[sdf.cod_cliente == "C3"].iloc[0]
    assert c3["coord_x"] is None and c3["id_eje_territorial"] is None
    assert c3["tipo_cliente"] == "v" and c3["cod_cuenta_clave"] is None


# ===========================================================================
# 14. t_pedido_detalle — dual-source order-line fact (`code/domain/
#     t_pedido_detalle.py:24-424`): both detail sources conform + pre-agg
#     on the 8-part key, ADES anti-join union, article/procedure joins with
#     the VEN/PRO/EXP/OBS whitelist, then the 7-key re-agg with PRO-split
#     signed measures and package→case / package→volume conversions through
#     the article factors (nullif zero guard) — recomputed level-for-level.
# ===========================================================================

def _tpd_conform_sql(table, doc_col, nro_col, alm_col, docs, qty):
    cajas, botellas, cajas_a, botellas_a = qty
    return f"""
  SELECT b.id_pais, t.cod_compania, t.cod_sucursal,
         t.{alm_col} AS cod_almacen_emisor,
         t.{doc_col} AS cod_documento_transaccion,
         t.{nro_col} AS nro_comprobante,
         t.cod_cliente, t.cod_articulo, t.cod_procedimiento,
         t.fecha_pedido,
         t.{cajas} AS cantidad_cajas, t.{botellas} AS cantidad_botellas,
         t.{cajas_a} AS cantidad_cajas_asignada,
         t.{botellas_a} AS cantidad_botellas_asignada,
         t.fecha_creacion, t.fecha_modificacion
  FROM {table} t
  JOIN bridge b ON t.cod_compania = b.cod_compania
  WHERE strftime(t.fecha_pedido, '%Y%m') IN ({{periods}})
    AND t.{doc_col} IN ({docs})"""


_TPD_KEY = ("cod_compania, cod_sucursal, cod_almacen_emisor, "
            "cod_documento_transaccion, nro_comprobante, cod_cliente, "
            "cod_articulo, cod_procedimiento")

_TPD_PREAGG = f"""
  SELECT {_TPD_KEY},
         MAX(id_pais) AS id_pais, MAX(fecha_pedido) AS fecha_pedido,
         SUM(cantidad_cajas) AS cantidad_cajas,
         SUM(cantidad_botellas) AS cantidad_botellas,
         SUM(cantidad_cajas_asignada) AS cantidad_cajas_asignada,
         SUM(cantidad_botellas_asignada) AS cantidad_botellas_asignada,
         MAX(fecha_creacion) AS fecha_creacion,
         MAX(fecha_modificacion) AS fecha_modificacion,
         0 AS es_eliminado
  FROM {{src}} GROUP BY 1, 2, 3, 4, 5, 6, 7, 8"""

_TPD_MEASURES = [
    ("cant_cajafisica_ped", "<>", "fis"),
    ("cant_cajavolumen_ped", "<>", "vol"),
    ("cant_cajafisica_ped_pro", "=", "fis"),
    ("cant_cajavolumen_ped_pro", "=", "vol"),
    ("cant_cajafisica_asignado_ped", "<>", "fis_a"),
    ("cant_cajavolumen_asignado_ped", "<>", "vol_a"),
    ("cant_cajafisica_asignado_ped_pro", "=", "fis_a"),
    ("cant_cajavolumen_asignado_ped_pro", "=", "vol_a"),
]

_TPD_EXPR = {
    "fis": "(cantidad_cajas + cantidad_botellas / NULLIF(cant_unidad_paquete, 0)) * cant_paquete_caja",
    "vol": "(cantidad_cajas * cant_unidad_paquete + cantidad_botellas) * cant_unidad_volumen",
    "fis_a": "(cantidad_cajas_asignada + cantidad_botellas_asignada / NULLIF(cant_unidad_paquete, 0)) * cant_paquete_caja",
    "vol_a": "(cantidad_cajas_asignada * cant_unidad_paquete + cantidad_botellas_asignada) * cant_unidad_volumen",
}


def _tpd_sql():
    main_conform = _tpd_conform_sql(
        "t_documento_pedido_detalle", "cod_documento_pedido",
        "nro_documento_pedido", "cod_almacen", "'200'",
        ("cant_paquete", "cant_unidad", "cant_paquete_asignado",
         "cant_unidad_asignado"),
    )
    ades_conform = _tpd_conform_sql(
        "t_documento_pedido_ades_detalle", "cod_documento_transaccion",
        "nro_comprobante", "cod_almacen_emisor", "'200', '300'",
        ("cantidad_cajas", "cantidad_botellas", "cantidad_cajas_asignada",
         "cantidad_botellas_asignada"),
    )
    measure_out = ",\n         ".join(
        f"SUM(CASE WHEN op {cmp} 'PRO' THEN 1 ELSE 0 END * sgn * ({_TPD_EXPR[e]}))"
        f" AS {name}"
        for name, cmp, e in _TPD_MEASURES
    )
    cast_out = ",\n       ".join(
        f"CAST({name} AS DECIMAL(38,12)) AS {name}"
        for name, _, _ in _TPD_MEASURES
    )
    return f"""
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
), main AS ({main_conform}
), main_agg AS ({_TPD_PREAGG.format(src="main")}
), ades AS ({ades_conform}
), ades_agg AS ({_TPD_PREAGG.format(src="ades")}
), ades_new AS (
  SELECT * FROM ades_agg a
  WHERE NOT EXISTS (
    SELECT 1 FROM main_agg m
    WHERE m.cod_compania = a.cod_compania AND m.cod_sucursal = a.cod_sucursal
      AND m.cod_almacen_emisor = a.cod_almacen_emisor
      AND m.cod_documento_transaccion = a.cod_documento_transaccion
      AND m.nro_comprobante = a.nro_comprobante
      AND m.cod_cliente = a.cod_cliente AND m.cod_articulo = a.cod_articulo
      AND m.cod_procedimiento = a.cod_procedimiento)
), unioned AS (
  SELECT * FROM main_agg UNION ALL SELECT * FROM ades_new
), joined AS (
  SELECT dpd.*, ma.cant_unidad_paquete, ma.cant_paquete_caja,
         ma.cant_unidad_volumen, upper(mp.cod_tipo_operacion) AS op,
         CASE WHEN upper(dpd.cod_documento_transaccion) = 'NCC'
              THEN -1 ELSE 1 END AS sgn
  FROM unioned dpd
  JOIN m_articulo ma
    ON dpd.cod_compania = ma.cod_compania AND dpd.cod_articulo = ma.cod_articulo
  JOIN m_procedimiento mp
    ON dpd.cod_compania = mp.cod_compania
   AND dpd.cod_documento_transaccion = mp.cod_documento_transaccion
   AND dpd.cod_procedimiento = mp.cod_procedimiento
  WHERE upper(mp.cod_tipo_operacion) IN ('VEN', 'PRO', 'EXP', 'OBS')
), agg AS (
  SELECT cod_compania, cod_sucursal, cod_almacen_emisor,
         cod_documento_transaccion, nro_comprobante, cod_cliente, cod_articulo,
         MAX(id_pais) AS id_pais, MAX(fecha_pedido) AS fecha_pedido,
         {measure_out},
         MAX(fecha_creacion) AS fecha_creacion,
         MAX(fecha_modificacion) AS fecha_modificacion,
         MAX(es_eliminado) AS es_eliminado
  FROM joined GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT CAST(id_pais AS VARCHAR) AS id_pais,
       strftime(fecha_pedido, '%Y%m') AS id_periodo,
       concat_ws('|', trim(cod_compania), trim(cod_sucursal),
                 trim(cod_documento_transaccion), trim(nro_comprobante),
                 trim(cod_cliente)) AS id_pedido,
       concat_ws('|', trim(cod_compania), trim(cod_articulo)) AS id_articulo,
       fecha_pedido,
       {cast_out},
       CAST(fecha_creacion AS DATE) AS fecha_creacion,
       CAST(fecha_modificacion AS DATE) AS fecha_modificacion,
       CAST(es_eliminado AS INT) AS es_eliminado
FROM agg
"""


def test_t_pedido_detalle_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    d = dt.date
    TS1 = dt.datetime(2025, 5, 5, 10)
    TS2 = dt.datetime(2025, 5, 8, 11)

    def mline(comp, suc, alm, doc, nro, cli, art, proc, fecha,
              cajas, bot, cajas_a, bot_a, fc, fm):
        return (comp, suc, alm, doc, nro, cli, art, proc, fecha,
                D(cajas), D(bot), D(cajas_a), D(bot_a), fc, fm)

    main_rows = [
        mline("10", "01", "W1", "200", "N1", "C1", "A1", "P01", d(2025, 5, 5),
              "2", "6", "1", "0", TS1, TS1),
        # same 8-key → pre-agg merges with the line above
        mline("10", "01", "W1", "200", "N1", "C1", "A1", "P01", d(2025, 5, 8),
              "1", "6", "0", "12", TS2, TS2),
        # PRO procedure, same 7-key → merges at the final agg as _pro
        mline("10", "01", "W1", "200", "N1", "C1", "A1", "P02", d(2025, 5, 6),
              "1", "0", "2", "0", TS1, TS1),
        mline("10", "01", "W1", "100", "NX", "C1", "A1", "P01", d(2025, 5, 5),
              "9", "9", "9", "9", TS1, TS1),     # doc 100 → filtered
        mline("10", "01", "W1", "200", "NY", "C1", "A1", "P01", d(2024, 12, 1),
              "9", "9", "9", "9", TS1, TS1),     # out of window
        mline("99", "01", "W1", "200", "NZ", "C1", "A1", "P01", d(2025, 5, 5),
              "9", "9", "9", "9", TS1, TS1),     # ghost company
        # zero-package article → fisica NULL via nullif, volumen survives
        mline("10", "01", "W1", "200", "N2", "C2", "A2", "P01", d(2025, 4, 10),
              "2", "4", "0", "0", TS1, TS1),
        mline("10", "01", "W1", "200", "N3", "C1", "AX", "P01", d(2025, 5, 5),
              "9", "9", "9", "9", TS1, TS1),     # unknown article → inner drop
        mline("10", "01", "W1", "200", "N4", "C1", "A1", "P03", d(2025, 5, 7),
              "9", "9", "9", "9", TS1, TS1),     # DEV op → whitelist drop
    ]
    main_schema = (
        "cod_compania string, cod_sucursal string, cod_almacen string, "
        "cod_documento_pedido string, nro_documento_pedido string, "
        "cod_cliente string, cod_articulo string, cod_procedimiento string, "
        "fecha_pedido date, cant_paquete decimal(20,4), cant_unidad decimal(20,4), "
        "cant_paquete_asignado decimal(20,4), cant_unidad_asignado decimal(20,4), "
        "fecha_creacion timestamp, fecha_modificacion timestamp"
    )
    ades_rows = [
        # duplicate of the main 8-key → anti-joined away
        mline("10", "01", "W1", "200", "N1", "C1", "A1", "P01", d(2025, 5, 9),
              "100", "100", "100", "100", TS2, TS2),
        # genuinely new → unions in through the OBS op
        mline("10", "02", "W2", "300", "N9", "C3", "A1", "P01", d(2025, 5, 11),
              "1", "12", "1", "0", TS2, TS2),
        mline("10", "02", "W2", "400", "NA", "C3", "A1", "P01", d(2025, 5, 11),
              "9", "9", "9", "9", TS2, TS2),     # doc 400 → filtered
        mline("10", "02", "W2", "300", "NB", "C3", "A1", "P01", d(2024, 11, 1),
              "9", "9", "9", "9", TS2, TS2),     # out of window
    ]
    ades_schema = (
        "cod_compania string, cod_sucursal string, cod_almacen_emisor string, "
        "cod_documento_transaccion string, nro_comprobante string, "
        "cod_cliente string, cod_articulo string, cod_procedimiento string, "
        "fecha_pedido date, cantidad_cajas decimal(20,4), "
        "cantidad_botellas decimal(20,4), cantidad_cajas_asignada decimal(20,4), "
        "cantidad_botellas_asignada decimal(20,4), "
        "fecha_creacion timestamp, fecha_modificacion timestamp"
    )
    spark.createDataFrame(main_rows, main_schema).write.parquet(
        stage("t_documento_pedido_detalle")
    )
    spark.createDataFrame(ades_rows, ades_schema).write.parquet(
        stage("t_documento_pedido_ades_detalle")
    )
    spark.createDataFrame(
        [("10", "A1", D("12"), D("2"), D("0.5")), ("10", "A2", D("0"), D("3"), D("2"))],
        "cod_compania string, cod_articulo string, cant_unidad_paquete decimal(10,2), "
        "cant_paquete_caja decimal(10,2), cant_unidad_volumen decimal(10,2)",
    ).write.parquet(stage("m_articulo"))
    spark.createDataFrame(
        [("10", "200", "P01", "VEN"), ("10", "200", "P02", "pro"),
         ("10", "300", "P01", "OBS"), ("10", "200", "P03", "DEV")],
        "cod_compania string, cod_documento_transaccion string, "
        "cod_procedimiento string, cod_tipo_operacion string",
    ).write.parquet(stage("m_procedimiento"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "t_pedido_detalle_lite", 1, periods=3)],
        DOMAIN_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_pedido_detalle")
    ).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "t_documento_pedido_detalle", "t_documento_pedido_ades_detalle",
        "m_articulo", "m_procedimiento", "m_compania", "m_pais",
    )})
    odf = con.sql(
        _tpd_sql().format(periods="'202503', '202504', '202505'")
    ).df()
    assert_match(sdf, odf, "t_pedido_detalle")

    # hand-computed pins: 3 output rows
    assert len(sdf) == 3
    g1 = sdf[sdf.id_pedido == "10|01|200|N1|C1"].iloc[0]
    # non-pro: pre-agg cajas 3, botellas 12 → (3+12/12)*2 = 8 fisica,
    # (3*12+12)*0.5 = 24 volumen; asignado (1,12) → 4 / 12
    assert float(g1["cant_cajafisica_ped"]) == 8.0
    assert float(g1["cant_cajavolumen_ped"]) == 24.0
    assert float(g1["cant_cajafisica_asignado_ped"]) == 4.0
    assert float(g1["cant_cajavolumen_asignado_ped"]) == 12.0
    # pro split (P02: 1 caja, asig 2 cajas)
    assert float(g1["cant_cajafisica_ped_pro"]) == 2.0
    assert float(g1["cant_cajavolumen_ped_pro"]) == 6.0
    assert float(g1["cant_cajafisica_asignado_ped_pro"]) == 4.0
    assert float(g1["cant_cajavolumen_asignado_ped_pro"]) == 12.0
    assert g1["fecha_pedido"] == d(2025, 5, 8) and g1["id_periodo"] == "202505"
    g2 = sdf[sdf.id_pedido == "10|01|200|N2|C2"].iloc[0]
    # zero-package: fisica NULL (null-on-zero division), volumen = 4*2 = 8;
    # the pro fisica is NULL too (0-gate times NULL is NULL), pro volumen 0
    assert pd.isna(g2["cant_cajafisica_ped"])
    assert float(g2["cant_cajavolumen_ped"]) == 8.0
    assert pd.isna(g2["cant_cajafisica_ped_pro"])
    assert float(g2["cant_cajavolumen_ped_pro"]) == 0.0
    g3 = sdf[sdf.id_pedido == "10|02|300|N9|C3"].iloc[0]
    # ADES survivor through OBS: (1+12/12)*2 = 4; (1*12+12)*0.5 = 12
    assert float(g3["cant_cajafisica_ped"]) == 4.0
    assert float(g3["cant_cajavolumen_ped"]) == 12.0
    assert float(g3["cant_cajafisica_asignado_ped"]) == 2.0


# ===========================================================================
# 15. t_visita — visit fact (`code/domain/t_visita.py:20-75`): the 5-part
#     visit identity (widest composite key in the reference), per-key
#     surrogate mints, constant audit flags.
# ===========================================================================

_TVISITA_SQL = """
WITH compania AS (
  SELECT mc.cod_compania, trim(mp.id_pais) AS id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT c.id_pais,
       strftime(t.fecha_visita, '%Y%m') AS id_periodo,
       concat_ws('|', strftime(t.fecha_visita, '%Y%m%d'), trim(t.cod_compania),
                 trim(t.cod_cliente), trim(t.cod_sucursal),
                 trim(t.cod_fuerza_venta)) AS id_visita,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_sucursal)) AS id_sucursal,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_cliente)) AS id_cliente,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_sucursal),
                 trim(t.cod_fuerza_venta)) AS id_fuerza_venta,
       CAST(NULL AS VARCHAR) AS cod_visita,
       CAST(t.fecha_visita AS DATE) AS fecha_visita,
       CAST(1 AS INT) AS es_activo,
       CAST(t.fecha_visita AS TIMESTAMP) AS fecha_creacion,
       t.fecha_modificacion,
       CAST(0 AS INT) AS es_eliminado
FROM t_historico_visita t
JOIN compania c ON t.cod_compania = c.cod_compania
WHERE strftime(t.fecha_visita, '%Y%m') IN ({periods})
"""


def test_t_visita_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    d = dt.date
    rows = [
        ("10", "01", "C1", "FV1", dt.datetime(2025, 5, 4, 9, 30), TS),
        ("10", "02", "C2", "FV2", dt.datetime(2025, 4, 2, 8, 0), TS),
        ("10", "01", "C1", "FV1", dt.datetime(2024, 12, 25, 9, 0), TS),  # out of window
        ("99", "01", "C9", "FV1", dt.datetime(2025, 5, 4, 9, 0), TS),   # ghost company
    ]
    spark.createDataFrame(
        rows,
        "cod_compania string, cod_sucursal string, cod_cliente string, "
        "cod_fuerza_venta string, fecha_visita timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("t_historico_visita"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves([JobConfig("domain", "t_visita_lite", 1, periods=3)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "t_visita")).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "t_historico_visita", "m_compania", "m_pais",
    )})
    odf = con.sql(_TVISITA_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_visita")

    assert len(sdf) == 2
    v1 = sdf[sdf.id_periodo == "202505"].iloc[0]
    assert v1["id_visita"] == "20250504|10|C1|01|FV1"
    assert v1["id_fuerza_venta"] == "10|01|FV1"
    assert v1["fecha_visita"] == d(2025, 5, 4)
    assert v1["es_activo"] == 1 and v1["es_eliminado"] == 0


# ===========================================================================
# 16. m_eje_territorial — geographic hierarchy (`code/domain/
#     m_eje_territorial.py:20-170`): one adjacency row per level, the
#     postal level deduped per (pais, postal) by row_number over cod_ng3
#     DESC, and the deduped district materialized TWICE (NG4 leaf + NG3
#     parent) — union + distinct recomputed in SQL.
# ===========================================================================

_MEJE_SQL = """
WITH p AS (
  SELECT id_pais, cod_pais FROM m_pais
), ng1_rows AS (
  SELECT concat_ws('|', trim(p.id_pais), trim(de.cod_ng1)) AS id_eje_territorial,
         CAST(NULL AS VARCHAR) AS id_eje_territorial_padre,
         p.id_pais,
         trim(de.cod_ng1) AS cod_eje_territorial,
         CAST(NULL AS VARCHAR) AS cod_eje_territorial_ref,
         de.desc_ng1 AS nomb_eje_territorial,
         'NG1' AS cod_tipo_eje_territorial
  FROM m_ng1 de JOIN p ON de.id_pais = p.cod_pais
  WHERE de.cod_ng1 IS NOT NULL
), ng2_rows AS (
  SELECT concat_ws('|', trim(p.id_pais), trim(pr.cod_ng1), trim(pr.cod_ng2)),
         concat_ws('|', trim(p.id_pais), trim(pr.cod_ng1)),
         p.id_pais, trim(pr.cod_ng2), CAST(NULL AS VARCHAR),
         pr.desc_ng2, 'NG2'
  FROM m_ng2 pr JOIN p ON pr.id_pais = p.cod_pais
  WHERE pr.cod_ng2 IS NOT NULL
), postal AS (
  SELECT p.id_pais, di.*,
         ROW_NUMBER() OVER (PARTITION BY p.id_pais, di.cod_zona_postal
                            ORDER BY di.cod_ng3 DESC) AS rn
  FROM m_ng3 di JOIN p ON di.id_pais = p.cod_pais
  WHERE di.cod_zona_postal IS NOT NULL
), postal1 AS (
  SELECT * FROM postal WHERE rn = 1
), ng3_rows AS (
  SELECT concat_ws('|', trim(id_pais), trim(cod_zona_postal), 'NG3'),
         concat_ws('|', trim(id_pais), trim(cod_ng1), trim(cod_ng2)),
         id_pais, trim(cod_zona_postal),
         concat_ws('|', cod_ng3, cod_zona_postal),
         desc_ng3, 'NG3'
  FROM postal1
), ng4_rows AS (
  SELECT concat_ws('|', trim(id_pais), trim(cod_zona_postal)),
         concat_ws('|', trim(id_pais), trim(cod_zona_postal), 'NG3'),
         id_pais, trim(cod_zona_postal),
         concat_ws('|', cod_ng3, cod_zona_postal),
         desc_ng3, 'NG4'
  FROM postal1
), unioned AS (
  SELECT * FROM ng1_rows UNION ALL SELECT * FROM ng2_rows
  UNION ALL SELECT * FROM ng3_rows UNION ALL SELECT * FROM ng4_rows
)
SELECT DISTINCT *, 'A' AS estado, DATE '{as_of}' AS fecha_creacion
FROM unioned
"""


def test_m_eje_territorial_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [("PE", "D1", "DEPARTAMENTO 1"), ("PE", None, "SIN CODIGO"),
         ("XX", "D9", "GHOST")],
        "id_pais string, cod_ng1 string, desc_ng1 string",
    ).write.parquet(stage("m_ng1"))
    spark.createDataFrame(
        [("PE", "D1", "PR1", "PROVINCIA 1"), ("PE", "D1", None, "SIN CODIGO")],
        "id_pais string, cod_ng1 string, cod_ng2 string, desc_ng2 string",
    ).write.parquet(stage("m_ng2"))
    spark.createDataFrame(
        [
            ("PE", "D1", "PR1", "DI1", "15001", "DISTRITO 1"),
            # same postal, higher cod_ng3 → W1 winner over DI1
            ("PE", "D1", "PR1", "DI2", "15001", "DISTRITO 2"),
            ("PE", "D1", "PR1", "DI3", None, "SIN POSTAL"),
            ("XX", "D9", "PR9", "DI9", "9", "GHOST"),
        ],
        "id_pais string, cod_ng1 string, cod_ng2 string, cod_ng3 string, "
        "cod_zona_postal string, desc_ng3 string",
    ).write.parquet(stage("m_ng3"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "m_eje_territorial_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_eje_territorial")
    ).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "m_ng1", "m_ng2", "m_ng3", "m_pais",
    )})
    odf = con.sql(_MEJE_SQL.format(as_of=AS_OF.isoformat())).df()
    # DuckDB positional-union column names come from the first branch —
    # rename to the engine's schema before comparing
    odf.columns = [
        "id_eje_territorial", "id_eje_territorial_padre", "id_pais",
        "cod_eje_territorial", "cod_eje_territorial_ref",
        "nomb_eje_territorial", "cod_tipo_eje_territorial", "estado",
        "fecha_creacion",
    ]
    assert_match(sdf, odf, "m_eje_territorial")

    # pins: NG1 + NG2 + deduped district twice (NG3 parent + NG4 leaf)
    assert len(sdf) == 4
    ng3 = sdf[sdf.cod_tipo_eje_territorial == "NG3"].iloc[0]
    assert ng3["id_eje_territorial"] == "PE|15001|NG3"
    assert ng3["id_eje_territorial_padre"] == "PE|D1|PR1"
    assert ng3["nomb_eje_territorial"] == "DISTRITO 2"      # DI2 wins the W1
    assert ng3["cod_eje_territorial_ref"] == "DI2|15001"
    ng4 = sdf[sdf.cod_tipo_eje_territorial == "NG4"].iloc[0]
    assert ng4["id_eje_territorial"] == "PE|15001"
    assert ng4["id_eje_territorial_padre"] == "PE|15001|NG3"


# ===========================================================================
# 17. dim_estructura_comercial — the 8-self-join hierarchy flatten
#     (`code/analytics/dim_estructura_comercial.py:19-131`): from the module
#     master, parent pointers walk five levels up with per-level
#     responsables and the attention model resolved — one wide row per
#     module, recomputed join-for-join in SQL.
# ===========================================================================

_DEC_SQL = """
SELECT mm.id_modulo AS id_estructura_comercial,
       mm.id_pais,
       CAST(NULL AS VARCHAR) AS cod_fuerza_venta,
       mma.cod_modelo_atencion,
       mp.cod_pais,
       mec_region.cod_estructura_comercial AS cod_region,
       mec_subregion.cod_estructura_comercial AS cod_subregion,
       mec_division.cod_estructura_comercial AS cod_division,
       mec_zona.cod_estructura_comercial AS cod_zona,
       mec_ruta.cod_estructura_comercial AS cod_ruta,
       mm.cod_modulo,
       mrc_ruta.cod_responsable_comercial AS cod_vendedor,
       mrc_ruta.nomb_responsable_comercial AS nomb_vendedor,
       mrc_zona.cod_responsable_comercial AS cod_supervisor,
       mrc_zona.nomb_responsable_comercial AS nomb_supervisor,
       mrc_division.cod_responsable_comercial AS cod_jefe_venta,
       mrc_division.nomb_responsable_comercial AS nomb_jefe_venta,
       CAST(NULL AS VARCHAR) AS desc_fuerza_venta,
       mma.desc_modelo_atencion,
       mec_region.nomb_estructura_comercial AS desc_region,
       mec_subregion.nomb_estructura_comercial AS desc_subregion,
       mec_division.nomb_estructura_comercial AS desc_division,
       mec_zona.nomb_estructura_comercial AS desc_zona,
       mec_ruta.nomb_estructura_comercial AS desc_ruta,
       mm.desc_modulo
FROM m_modulo mm
LEFT JOIN m_pais mp ON mm.id_pais = mp.id_pais
LEFT JOIN m_estructura_comercial mec_ruta
  ON mm.id_estructura_comercial = mec_ruta.id_estructura_comercial
LEFT JOIN m_responsable_comercial mrc_ruta
  ON mec_ruta.id_responsable_comercial = mrc_ruta.id_responsable_comercial
LEFT JOIN m_estructura_comercial mec_zona
  ON mec_ruta.id_estructura_comercial_padre = mec_zona.id_estructura_comercial
LEFT JOIN m_responsable_comercial mrc_zona
  ON mec_zona.id_responsable_comercial = mrc_zona.id_responsable_comercial
LEFT JOIN m_estructura_comercial mec_division
  ON mec_zona.id_estructura_comercial_padre = mec_division.id_estructura_comercial
LEFT JOIN m_responsable_comercial mrc_division
  ON mec_division.id_responsable_comercial = mrc_division.id_responsable_comercial
LEFT JOIN m_estructura_comercial mec_subregion
  ON mec_division.id_estructura_comercial_padre = mec_subregion.id_estructura_comercial
LEFT JOIN m_estructura_comercial mec_region
  ON mec_subregion.id_estructura_comercial_padre = mec_region.id_estructura_comercial
LEFT JOIN m_modelo_atencion mma
  ON mm.id_modelo_atencion = mma.id_modelo_atencion
"""


def test_dim_estructura_comercial_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    spark.createDataFrame(
        [
            ("10|01|M1", "PE", "R1", "MA1", "M1", "MODULO UNO"),
            # ladder breaks at zona (Z2 absent), no responsable on its ruta,
            # unknown attention model
            ("10|01|M2", "PE", "R2", "MAX", "M2", "MODULO DOS"),
            # no country row, no structure at all
            ("10|01|M3", "XX", None, None, "M3", "MODULO TRES"),
        ],
        "id_modulo string, id_pais string, id_estructura_comercial string, "
        "id_modelo_atencion string, cod_modulo string, desc_modulo string",
    ).write.parquet(dom("m_modulo"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")],
        "id_pais string, cod_pais string, desc_pais string",
    ).write.parquet(dom("m_pais"))
    spark.createDataFrame(
        [
            ("R1", "Z1", "RESP_V", "RT1", "RUTA UNO"),
            ("Z1", "D1", "RESP_S", "ZN1", "ZONA UNO"),
            ("D1", "SR1", "RESP_J", "DV1", "DIVISION UNO"),
            ("SR1", "RG1", None, "SR1C", "SUBREGION UNO"),
            ("RG1", None, None, "RG1C", "REGION UNO"),
            ("R2", "Z2", None, "RT2", "RUTA DOS"),
        ],
        "id_estructura_comercial string, id_estructura_comercial_padre string, "
        "id_responsable_comercial string, cod_estructura_comercial string, "
        "nomb_estructura_comercial string",
    ).write.parquet(dom("m_estructura_comercial"))
    spark.createDataFrame(
        [("RESP_V", "V001", "VENDEDOR UNO"), ("RESP_S", "S001", "SUPERVISOR UNO"),
         ("RESP_J", "J001", "JEFE UNO")],
        "id_responsable_comercial string, cod_responsable_comercial string, "
        "nomb_responsable_comercial string",
    ).write.parquet(dom("m_responsable_comercial"))
    spark.createDataFrame(
        [("MA1", "PRE", "PREVENTA")],
        "id_modelo_atencion string, cod_modelo_atencion string, "
        "desc_modelo_atencion string",
    ).write.parquet(dom("m_modelo_atencion"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "dim_estructura_comercial_lite", 1)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "dim_estructura_comercial")
    ).toPandas()

    con = duck_with_views({t: dom(t) for t in (
        "m_modulo", "m_pais", "m_estructura_comercial",
        "m_responsable_comercial", "m_modelo_atencion",
    )})
    odf = con.sql(_DEC_SQL).df()
    assert_match(sdf, odf, "dim_estructura_comercial")

    assert len(sdf) == 3
    m1 = sdf[sdf.cod_modulo == "M1"].iloc[0]
    assert (m1["cod_ruta"], m1["cod_zona"], m1["cod_division"],
            m1["cod_subregion"], m1["cod_region"]) == (
        "RT1", "ZN1", "DV1", "SR1C", "RG1C")
    assert m1["cod_vendedor"] == "V001" and m1["nomb_jefe_venta"] == "JEFE UNO"
    assert m1["desc_modelo_atencion"] == "PREVENTA"
    m2 = sdf[sdf.cod_modulo == "M2"].iloc[0]
    assert m2["cod_ruta"] == "RT2" and m2["cod_zona"] is None
    assert m2["cod_vendedor"] is None and m2["cod_modelo_atencion"] is None
    assert m2["cod_region"] is None
    m3 = sdf[sdf.cod_modulo == "M3"].iloc[0]
    assert m3["cod_pais"] is None and m3["cod_ruta"] is None


# ===========================================================================
# 18. t_saldos_iniciales — opening balances (`code/domain/
#     t_saldos_iniciales.py:40-145`): approver existence gate (left_semi),
#     3-key header⋈detail, package→unit conversion, CPM + purchase-rate
#     valuation on the narrow numeric(30,4) family — recomputed in SQL.
# ===========================================================================

_TSI_SQL = """
WITH gated AS (
  SELECT tti.* FROM t_toma_inventario tti
  WHERE EXISTS (
    SELECT 1 FROM m_empleado e
    WHERE e.cod_compania = tti.cod_compania
      AND e.cod_empleado = tti.cod_empleado_aprobador)
    AND strftime(tti.fecha_inventario, '%Y%m') IN ({periods})
), base AS (
  SELECT tti.id_pais, strftime(tti.fecha_inventario, '%Y%m') AS id_periodo,
         tti.id_compania, tti.id_sucursal, ttid.id_almacen, ttid.id_articulo,
         tti.fecha_inventario, mon.cod_moneda_mn AS moneda_mn,
         CAST(ttid.stock_final AS DECIMAL(30,4)) AS cantidad_cajas,
         CAST(ttid.stock_final * ma.cant_unidad_paquete AS DECIMAL(30,4)) AS unidades,
         tti.estado, tti.usuario_creacion, tti.fecha_creacion,
         tti.usuario_modificacion, tti.fecha_modificacion
  FROM gated tti
  LEFT JOIN m_parametro mon ON tti.id_compania = mon.id_compania
  JOIN t_toma_inventario_detalle ttid
    ON tti.id_sucursal = ttid.id_sucursal
   AND tti.cod_almacen_emisor = ttid.cod_almacen_emisor
   AND tti.fecha_inventario = ttid.fecha_inventario
  JOIN m_articulo ma ON ma.id_articulo = ttid.id_articulo
)
SELECT t.id_pais, t.id_compania, t.id_periodo, t.id_sucursal, t.id_almacen,
       t.id_articulo, t.fecha_inventario,
       t.cantidad_cajas AS cant_cajafisica_inicial,
       t.unidades AS cant_unidades_inicial,
       t.estado,
       CAST(c.imp_cpm AS DECIMAL(30,4)) AS precio_unitario_mn,
       CAST(c.imp_cpm / mtc.tc_compra AS DECIMAL(30,4)) AS precio_unitario_me,
       CAST(t.cantidad_cajas * c.imp_cpm AS DECIMAL(30,4)) AS imp_valorizado_mn,
       CAST(t.cantidad_cajas * c.imp_cpm / mtc.tc_compra AS DECIMAL(30,4)) AS imp_valorizado_me,
       CAST(c.imp_saldo_inicial AS DECIMAL(30,4)) AS imp_saldo_inicial,
       CAST(c.imp_ingreso AS DECIMAL(30,4)) AS imp_valorizado_ingreso,
       CAST(c.imp_salida AS DECIMAL(30,4)) AS imp_valorizado_salida,
       CAST(c.imp_saldo_final AS DECIMAL(30,4)) AS imp_saldo_final,
       t.usuario_creacion, t.fecha_creacion, t.usuario_modificacion,
       t.fecha_modificacion, '0' AS es_eliminado
FROM base t
LEFT JOIN t_cierre_inventario_cpm c
  ON t.id_sucursal = c.id_sucursal AND t.id_articulo = c.id_articulo
 AND t.id_periodo = c.id_periodo
LEFT JOIN m_tipo_cambio mtc
  ON mtc.cod_compania = t.id_compania AND mtc.fecha = t.fecha_inventario
 AND mtc.cod_moneda = t.moneda_mn
"""


def test_t_saldos_iniciales_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    d = dt.date

    def header(suc, alm_e, fecha, aprobador, comp="10"):
        return ("PE", comp, suc, alm_e, fecha, comp, aprobador, "APR",
                "u.load", TS, "u.load", TS)

    spark.createDataFrame(
        [
            header("S1", "AL-E", d(2025, 5, 2), "E1"),
            header("S1", "AL-E", d(2025, 4, 3), "E9"),    # unknown approver
            header("S2", "AL-E", d(2024, 12, 30), "E1"),  # out of window
            header("S2", "ALX", d(2025, 5, 2), "E1"),     # no CPM row
        ],
        "id_pais string, id_compania string, id_sucursal string, "
        "cod_almacen_emisor string, fecha_inventario date, cod_compania string, "
        "cod_empleado_aprobador string, estado string, usuario_creacion string, "
        "fecha_creacion timestamp, usuario_modificacion string, "
        "fecha_modificacion timestamp",
    ).write.parquet(stage("t_toma_inventario"))
    spark.createDataFrame(
        [
            ("S1", "AL-E", d(2025, 5, 2), "A-1", "A1", D("10")),
            ("S1", "AL-E", d(2025, 5, 2), "A-1", "A2", D("4")),
            ("S1", "AL-E", d(2025, 4, 3), "A-1", "A1", D("9")),   # gated header
            ("S2", "ALX", d(2025, 5, 2), "A-2", "A1", D("3")),
            ("S1", "AL-E", d(2025, 5, 9), "A-1", "A1", D("9")),   # no header
            ("S1", "AL-E", d(2025, 5, 2), "A-1", "AX", D("9")),   # unknown article
        ],
        "id_sucursal string, cod_almacen_emisor string, fecha_inventario date, "
        "id_almacen string, id_articulo string, stock_final decimal(20,4)",
    ).write.parquet(stage("t_toma_inventario_detalle"))
    spark.createDataFrame(
        [("A1", D("12")), ("A2", D("6"))],
        "id_articulo string, cant_unidad_paquete decimal(10,2)",
    ).write.parquet(stage("m_articulo"))
    spark.createDataFrame(
        [("10", "E1", "APROBADOR UNO")],
        "cod_compania string, cod_empleado string, nomb_empleado string",
    ).write.parquet(stage("m_empleado"))
    spark.createDataFrame(
        [("S1", "A1", "202505", D("7.0"), D("100.5"), D("200.25"),
          D("50"), D("25"))],
        "id_sucursal string, id_articulo string, id_periodo string, "
        "imp_cpm decimal(20,4), imp_saldo_inicial decimal(20,4), "
        "imp_saldo_final decimal(20,4), imp_ingreso decimal(20,4), "
        "imp_salida decimal(20,4)",
    ).write.parquet(stage("t_cierre_inventario_cpm"))
    spark.createDataFrame(
        [("10", d(2025, 5, 2), "PEN", D("3.5"))],
        "cod_compania string, fecha date, cod_moneda string, tc_compra decimal(12,6)",
    ).write.parquet(stage("m_tipo_cambio"))
    spark.createDataFrame(
        [("10", "PEN")], "id_compania string, cod_moneda_mn string"
    ).write.parquet(stage("m_parametro"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "t_saldos_iniciales_lite", 1, periods=3)],
        DOMAIN_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_saldos_iniciales")
    ).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "t_toma_inventario", "t_toma_inventario_detalle", "m_articulo",
        "m_empleado", "t_cierre_inventario_cpm", "m_tipo_cambio", "m_parametro",
    )})
    odf = con.sql(_TSI_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_saldos_iniciales")

    assert len(sdf) == 3
    r1 = sdf[(sdf.id_articulo == "A1") & (sdf.id_sucursal == "S1")].iloc[0]
    assert float(r1["cant_cajafisica_inicial"]) == 10.0
    assert float(r1["cant_unidades_inicial"]) == 120.0     # 10 × 12
    assert float(r1["precio_unitario_mn"]) == 7.0
    assert float(r1["precio_unitario_me"]) == 2.0          # 7 / 3.5
    assert float(r1["imp_valorizado_mn"]) == 70.0
    assert float(r1["imp_valorizado_me"]) == 20.0
    assert float(r1["imp_saldo_final"]) == 200.25
    r2 = sdf[sdf.id_articulo == "A2"].iloc[0]
    assert float(r2["cant_unidades_inicial"]) == 24.0      # 4 × 6
    assert pd.isna(r2["precio_unitario_mn"])               # no CPM row
    r4 = sdf[sdf.id_sucursal == "S2"].iloc[0]
    assert pd.isna(r4["imp_valorizado_me"])                # CPM null through fx
    assert float(r4["cant_unidades_inicial"]) == 36.0


# ===========================================================================
# 19. t_reparto — delivery fact (`code/domain/t_reparto.py:36-93`):
#     GRA/NIN dispatch filter, latest-movement W1 dedup per delivery id,
#     J8 company join, surrogate mints — recomputed in SQL.
# ===========================================================================

_TREP_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
), filtered AS (
  SELECT *, concat_ws('|', trim(cod_compania), trim(cod_sucursal),
            trim(cod_almacen_emisor_origen), trim(cod_documento_transaccion),
            trim(nro_documento_almacen)) AS id_reparto
  FROM t_movimiento_inventario
  WHERE strftime(fecha_almacen, '%Y%m') IN ({periods})
    AND cod_documento_transaccion IN ('GRA', 'NIN')
), latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id_reparto
               ORDER BY nro_documento_movimiento DESC) AS rn
    FROM filtered)
  WHERE rn = 1
)
SELECT b.id_pais,
       strftime(t.fecha_almacen, '%Y%m') AS id_periodo,
       t.id_reparto,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_transportista)) AS id_transportista,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_vehiculo)) AS id_medio_transporte,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_chofer)) AS id_chofer,
       CAST(t.fecha_emision AS DATE) AS fecha_orden_carga,
       CAST(t.fecha_almacen AS DATE) AS fecha_reparto,
       t.cod_estado_comprobante AS estado_guia,
       t.fecha_creacion, t.fecha_modificacion
FROM latest t
JOIN bridge b ON t.cod_compania = b.cod_compania
"""


def test_t_reparto_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    d = dt.date

    def mov(comp, suc, alm, doc, nro, nro_mov, fecha, transp, veh, chofer,
            estado="EMI"):
        return (comp, suc, alm, doc, nro, nro_mov, fecha, d(2025, 5, 1),
                transp, veh, chofer, estado, TS, TS)

    rows = [
        # two movements for the same delivery → highest nro_mov wins
        mov("10", "01", "AL1", "GRA", "G-1", "005", d(2025, 5, 6), "TR1", "VH1", "CH1"),
        mov("10", "01", "AL1", "GRA", "G-1", "009", d(2025, 5, 7), "TR2", "VH2", "CH2"),
        mov("10", "01", "AL1", "NIN", "N-1", "001", d(2025, 4, 2), "TR1", "VH1", "CH1"),
        mov("10", "01", "AL1", "FAC", "F-1", "001", d(2025, 5, 2), "TR1", "VH1", "CH1"),  # doc filter
        mov("10", "01", "AL1", "GRA", "G-2", "001", d(2024, 11, 2), "TR1", "VH1", "CH1"),  # window
        mov("99", "01", "AL1", "GRA", "G-9", "001", d(2025, 5, 2), "TR1", "VH1", "CH1"),  # ghost comp
    ]
    spark.createDataFrame(
        rows,
        "cod_compania string, cod_sucursal string, cod_almacen_emisor_origen string, "
        "cod_documento_transaccion string, nro_documento_almacen string, "
        "nro_documento_movimiento string, fecha_almacen date, fecha_emision date, "
        "cod_transportista string, cod_vehiculo string, cod_chofer string, "
        "cod_estado_comprobante string, fecha_creacion timestamp, "
        "fecha_modificacion timestamp",
    ).write.parquet(stage("t_movimiento_inventario"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "t_reparto_lite", 1, periods=3)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "t_reparto")).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "t_movimiento_inventario", "m_compania", "m_pais",
    )})
    odf = con.sql(_TREP_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_reparto")

    assert len(sdf) == 2
    g1 = sdf[sdf.id_reparto == "10|01|AL1|GRA|G-1"].iloc[0]
    # movement 009 wins the W1 → TR2/VH2/CH2, fecha 2025-05-07
    assert g1["id_transportista"] == "10|TR2"
    assert g1["id_medio_transporte"] == "10|VH2"
    assert g1["fecha_reparto"] == d(2025, 5, 7)


# ===========================================================================
# 20. m_articulo — product master (`code/domain/m_articulo.py:29-172`):
#     deepening linea→familia→subfamilia join keys, corp-code 0/NULL
#     fallback with the id minted from the RESOLVED code, '000'/DEFAULT
#     coalesces, (linea, familia) classification flags — recomputed in SQL.
# ===========================================================================

_MART_CORP = ("CASE WHEN COALESCE(ma.cod_articulo_corp, 0) = 0 "
              "THEN ma.cod_articulo "
              "ELSE CAST(ma.cod_articulo_corp AS VARCHAR) END")

_MART_SQL = f"""
SELECT concat_ws('|', trim(ma.cod_compania), trim(ma.cod_articulo)) AS id_articulo,
       mp.id_pais,
       ma.cod_compania, ma.cod_articulo,
       {_MART_CORP} AS cod_articulo_corp,
       concat_ws('|', trim(ma.cod_compania), trim({_MART_CORP})) AS id_articulo_corp,
       ma.desc_articulo,
       COALESCE(ml.desc_linea, 'LINEA DEFAULT') AS desc_linea,
       COALESCE(mf.desc_familia, 'FAMILIA DEFAULT') AS desc_familia,
       COALESCE(ms.desc_subfamilia, 'SUBFAMILIA DEFAULT') AS desc_subfamilia,
       COALESCE(mm.cod_marca, '000') AS cod_marca,
       COALESCE(mm.desc_marca, 'MARCA DEFAULT') AS desc_marca,
       COALESCE(mca.desc_categoria, 'CATEGORIA DEFAULT') AS desc_categoria,
       CAST(NULL AS VARCHAR) AS cod_unidad_negocio,
       CAST(NULL AS VARCHAR) AS desc_unidad_negocio,
       CASE WHEN COALESCE(ml.cod_linea, '00') = '03'
             AND COALESCE(mf.cod_familia, '000') = '003' THEN 1 ELSE 0 END AS flg_jarabe,
       CASE WHEN COALESCE(ml.cod_linea, '00') = '04'
             AND COALESCE(mf.cod_familia, '000') = '008' THEN 1 ELSE 0 END AS flg_co2,
       CASE WHEN COALESCE(ml.cod_linea, '00') = '04'
             AND COALESCE(mf.cod_familia, '000') = '001' THEN 1 ELSE 0 END AS flg_azucar,
       CAST(ma.cant_unidad_paquete AS DECIMAL(38,12)) AS cant_unidad_paquete,
       ma.es_activo
FROM m_articulo ma
JOIN m_compania mc ON ma.cod_compania = mc.cod_compania
LEFT JOIN m_pais mp ON mp.cod_pais = mc.cod_pais
LEFT JOIN m_linea ml
  ON ma.cod_compania = ml.cod_compania AND ma.cod_linea = ml.cod_linea
LEFT JOIN m_familia mf
  ON ma.cod_compania = mf.cod_compania AND ma.cod_linea = mf.cod_linea
 AND ma.cod_familia = mf.cod_familia
LEFT JOIN m_subfamilia ms
  ON ma.cod_compania = ms.cod_compania AND ma.cod_linea = ms.cod_linea
 AND ma.cod_familia = ms.cod_familia AND ma.cod_subfamilia = ms.cod_subfamilia
LEFT JOIN m_marca mm
  ON ma.cod_compania = mm.cod_compania AND ma.cod_marca = mm.cod_marca
LEFT JOIN m_categoria mca
  ON ma.cod_compania = mca.cod_compania AND ma.cod_categoria = mca.cod_categoria
"""


def test_m_articulo_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    arts = [
        # NULL corp → own code; full ladder; 03/003 → jarabe flag
        ("10", "A1", None, "AGUA CIELO", "03", "003", "SF1", "MK1", "CT1",
         D("12"), "T"),
        # explicit corp 777; 04/008 → co2; marca missing → defaults
        ("10", "A2", 777, "CO2 TANQUE", "04", "008", "SF2", "MKX", "CT1",
         D("1"), "T"),
        # corp 0 → own code; linea/familia/subfam unknown → all DEFAULTs
        ("10", "A3", 0, "OTRO", "09", "999", "SFX", "MK1", "CTX",
         D("6"), "F"),
        # company with no pais row → id_pais NULL but row SURVIVES (pais left)
        ("99", "A4", None, "SIN PAIS", "03", "003", "SF1", "MK1", "CT1",
         D("3"), "T"),
        # company absent from m_compania → inner drop
        ("88", "A5", None, "GHOST", "03", "003", "SF1", "MK1", "CT1",
         D("3"), "T"),
    ]
    spark.createDataFrame(
        arts,
        "cod_compania string, cod_articulo string, cod_articulo_corp int, "
        "desc_articulo string, cod_linea string, cod_familia string, "
        "cod_subfamilia string, cod_marca string, cod_categoria string, "
        "cant_unidad_paquete decimal(10,2), es_activo string",
    ).write.parquet(stage("m_articulo"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "NOPAIS", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))
    spark.createDataFrame(
        [("10", "03", "JARABES"), ("10", "04", "GASEOSAS"), ("99", "03", "J99")],
        "cod_compania string, cod_linea string, desc_linea string",
    ).write.parquet(stage("m_linea"))
    spark.createDataFrame(
        [("10", "03", "003", "FAMILIA JARABE"), ("10", "04", "008", "FAMILIA CO2"),
         ("99", "03", "003", "F99")],
        "cod_compania string, cod_linea string, cod_familia string, desc_familia string",
    ).write.parquet(stage("m_familia"))
    spark.createDataFrame(
        [("10", "03", "003", "SF1", "SUBFAMILIA UNO"),
         ("10", "04", "008", "SF2", "SUBFAMILIA DOS")],
        "cod_compania string, cod_linea string, cod_familia string, "
        "cod_subfamilia string, desc_subfamilia string",
    ).write.parquet(stage("m_subfamilia"))
    spark.createDataFrame(
        [("10", "MK1", "CIELO")],
        "cod_compania string, cod_marca string, desc_marca string",
    ).write.parquet(stage("m_marca"))
    spark.createDataFrame(
        [("10", "CT1", "BEBIDAS")],
        "cod_compania string, cod_categoria string, desc_categoria string",
    ).write.parquet(stage("m_categoria"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves([JobConfig("domain", "m_articulo_lite", 1)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_articulo")).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "m_articulo", "m_compania", "m_pais", "m_linea", "m_familia",
        "m_subfamilia", "m_marca", "m_categoria",
    )})
    odf = con.sql(_MART_SQL).df()
    assert_match(sdf, odf, "m_articulo")

    assert len(sdf) == 4
    a1 = sdf[sdf.cod_articulo == "A1"].iloc[0]
    assert a1["cod_articulo_corp"] == "A1" and a1["id_articulo_corp"] == "10|A1"
    assert a1["flg_jarabe"] == 1 and a1["flg_co2"] == 0
    assert a1["desc_subfamilia"] == "SUBFAMILIA UNO"
    a2 = sdf[sdf.cod_articulo == "A2"].iloc[0]
    assert a2["cod_articulo_corp"] == "777" and a2["id_articulo_corp"] == "10|777"
    assert a2["flg_co2"] == 1
    assert a2["cod_marca"] == "000" and a2["desc_marca"] == "MARCA DEFAULT"
    a3 = sdf[sdf.cod_articulo == "A3"].iloc[0]
    assert a3["cod_articulo_corp"] == "A3"                # corp 0 falls back
    assert a3["desc_linea"] == "LINEA DEFAULT"
    assert a3["desc_familia"] == "FAMILIA DEFAULT"
    assert a3["flg_jarabe"] == 0
    a4 = sdf[sdf.cod_articulo == "A4"].iloc[0]
    assert a4["id_pais"] is None                          # pais left join miss
    assert a4["desc_linea"] == "J99"


# ===========================================================================
# 21. t_movimiento_inventario — movement header (`code/domain/
#     t_movimiento_inventario.py:24-145`): procedure whitelist through the
#     doc-type bridge as an EXISTS (left_semi — a duplicated bridge row must
#     NOT fan out the fact), transit left join with destination columns +
#     existence flag, '000'/'' coalesce defaults, hard-coded es_eliminado=1.
# ===========================================================================

_TMI_SQL = """
WITH compania AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT c.id_pais,
       strftime(t.fecha_almacen, '%Y%m') AS id_periodo,
       t.id_movimiento_almacen, t.id_movimiento_ingreso,
       t.cod_compania AS id_compania_origen,
       t.id_sucursal AS id_sucursal_origen,
       t.id_almacen AS id_almacen_origen,
       tr.id_compania_destino, tr.id_sucursal_destino, tr.id_almacen_destino,
       t.id_compania_referencia, t.id_sucursal_referencia, t.id_almacen_referencia,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_transportista)) AS id_transportista,
       concat_ws('|', trim(t.cod_compania), trim(t.cod_vehiculo)) AS id_medio_transporte,
       t.id_vendedor, t.id_persona,
       t.id_procedimiento AS id_tipo_procedimiento,
       t.cod_procedimiento,
       t.fecha_emision, t.fecha_liquidacion, t.fecha_almacen,
       t.nro_documento_almacen, t.nro_documento_movimiento,
       COALESCE(t.cod_estado_comprobante, '000') AS cod_estado_comprobante,
       t.nro_serie_alm AS nro_serie_almacen,
       t.nropricoal AS nro_comprobante_pre,
       COALESCE(t.cod_tipo_documento_liquidacion, '000') AS cod_documento_liquidacion,
       t.nro_documento_liquidacion,
       t.cod_documento_transaccion,
       COALESCE(t.cod_documento_transaccion1, '') AS cod_documento_transaccion_ref1,
       t.nro_documento_almacen1 AS nro_documento_almacen_ref1,
       t.cod_tipo_documento_referencia2 AS cod_documento_transaccion_ref2,
       t.nro_documento_almacen_referencia2 AS nro_documento_almacen_ref2,
       tr.estado AS desc_estado_transito,
       CASE WHEN tr.id_documento_almacen IS NULL THEN 0 ELSE 1 END AS tiene_transito,
       t.usuario_creacion, t.fecha_creacion, t.usuario_modificacion,
       t.fecha_modificacion,
       CAST(1 AS INT) AS es_eliminado
FROM t_movimiento_inventario t
JOIN compania c ON t.cod_compania = c.cod_compania
LEFT JOIN t_movimiento_inventario_transito tr
  ON t.id_documento_almacen = tr.id_documento_almacen
WHERE strftime(t.fecha_almacen, '%Y%m') IN ({periods})
  AND EXISTS (
    SELECT 1 FROM m_documento_almacen mda
    JOIN m_documento_transaccion mdt
      ON mda.cod_compania = mdt.cod_compania
     AND mda.cod_transaccion = mdt.cod_documento_transaccion
    WHERE mda.cod_compania = t.cod_compania
      AND mda.cod_transaccion = t.cod_procedimiento)
"""


def test_t_movimiento_inventario_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    d = dt.date

    def mov(idm, comp, proc, fecha, doc_id, estado_comp, liq, doc1):
        return (comp, proc, doc_id, idm, f"{idm}-ING", "S1", "AL1",
                "CR", "SR", "AR", "TR1", "VH1", "VND1", "PRS1", "PROC-1",
                d(2025, 5, 1), d(2025, 5, 2), fecha, f"N-{idm}", f"M-{idm}",
                estado_comp, "SER1", "PRE1", liq, "LIQ-9", "GRA", doc1,
                "NDA1", "R2C", "NDA2", "u.load", TS, "u.load", TS)

    rows = [
        # whitelisted via a DUPLICATED bridge (two doc_trans rows) — must not
        # fan out; has transit row; NULL estado → '000'
        mov("M1", "10", "ING", d(2025, 5, 6), "DOC1", None, "TDL", "DT1"),
        # whitelisted once; no transit; every coalesce source NULL
        mov("M2", "10", "SAL", d(2025, 4, 9), "DOC2", "APR", None, None),
        mov("M3", "10", "XXX", d(2025, 5, 6), "DOC3", "APR", "TDL", "DT1"),   # not whitelisted
        mov("M4", "10", "ING", d(2024, 10, 1), "DOC4", "APR", "TDL", "DT1"),  # out of window
        mov("M5", "99", "ING", d(2025, 5, 6), "DOC5", "APR", "TDL", "DT1"),   # ghost company
    ]
    spark.createDataFrame(
        rows,
        "cod_compania string, cod_procedimiento string, id_documento_almacen string, "
        "id_movimiento_almacen string, id_movimiento_ingreso string, "
        "id_sucursal string, id_almacen string, id_compania_referencia string, "
        "id_sucursal_referencia string, id_almacen_referencia string, "
        "cod_transportista string, cod_vehiculo string, id_vendedor string, "
        "id_persona string, id_procedimiento string, fecha_emision date, "
        "fecha_liquidacion date, fecha_almacen date, nro_documento_almacen string, "
        "nro_documento_movimiento string, cod_estado_comprobante string, "
        "nro_serie_alm string, nropricoal string, "
        "cod_tipo_documento_liquidacion string, nro_documento_liquidacion string, "
        "cod_documento_transaccion string, cod_documento_transaccion1 string, "
        "nro_documento_almacen1 string, cod_tipo_documento_referencia2 string, "
        "nro_documento_almacen_referencia2 string, usuario_creacion string, "
        "fecha_creacion timestamp, usuario_modificacion string, "
        "fecha_modificacion timestamp",
    ).write.parquet(stage("t_movimiento_inventario"))
    spark.createDataFrame(
        [("DOC1", "20", "SD", "AD", "PLI")],
        "id_documento_almacen string, id_compania_destino string, "
        "id_sucursal_destino string, id_almacen_destino string, estado string",
    ).write.parquet(stage("t_movimiento_inventario_transito"))
    spark.createDataFrame(
        [("10", "ING"), ("10", "SAL")],
        "cod_compania string, cod_transaccion string",
    ).write.parquet(stage("m_documento_almacen"))
    spark.createDataFrame(
        [("10", "ING", "INGRESO A"), ("10", "ING", "INGRESO B"),  # dup fan
         ("10", "SAL", "SALIDA")],
        "cod_compania string, cod_documento_transaccion string, descripcion string",
    ).write.parquet(stage("m_documento_transaccion"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "t_movimiento_inventario_lite", 1, periods=3)],
        DOMAIN_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_movimiento_inventario")
    ).toPandas()

    con = duck_with_views({t: stage(t) for t in (
        "t_movimiento_inventario", "t_movimiento_inventario_transito",
        "m_documento_almacen", "m_documento_transaccion", "m_compania", "m_pais",
    )})
    odf = con.sql(_TMI_SQL.format(periods="'202503', '202504', '202505'")).df()
    assert_match(sdf, odf, "t_movimiento_inventario")

    # pins: 2 rows — the duplicated bridge must NOT duplicate M1
    assert len(sdf) == 2
    m1 = sdf[sdf.id_movimiento_almacen == "M1"].iloc[0]
    assert m1["tiene_transito"] == 1 and m1["desc_estado_transito"] == "PLI"
    assert m1["id_almacen_destino"] == "AD"
    assert m1["cod_estado_comprobante"] == "000"          # NULL → default
    assert m1["cod_documento_transaccion_ref1"] == "DT1"
    assert m1["es_eliminado"] == 1                        # faithful constant
    m2 = sdf[sdf.id_movimiento_almacen == "M2"].iloc[0]
    assert m2["tiene_transito"] == 0 and m2["id_compania_destino"] is None
    assert m2["cod_documento_liquidacion"] == "000"
    assert m2["cod_documento_transaccion_ref1"] == ""     # NULL → empty string


# ===========================================================================
# 22. dim_sucursal + dim_clasificacion_cliente — the two remaining dim
#     classes: 2-key company denormalization, and the level-split +
#     two-left-self-join hierarchy flatten.
# ===========================================================================

_DSUC_SQL = """
SELECT CAST(ms.id_sucursal AS VARCHAR) AS id_sucursal,
       CAST(ms.id_pais AS VARCHAR) AS id_pais,
       mc.cod_compania, mc.nomb_compania, mc.cod_tipo_compania,
       ms.cod_sucursal, ms.nomb_sucursal, ms.cod_tipo_sucursal
FROM m_sucursal ms
JOIN m_pais mp ON mp.id_pais = ms.id_pais
JOIN m_compania mc
  ON ms.id_compania = mc.id_compania AND ms.id_pais = mc.id_pais
"""


def test_dim_sucursal_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    spark.createDataFrame(
        [
            ("10|01", "PE", "10", "01", "LIMA NORTE", "DC"),
            ("10|02", "PE", "10", "02", "LIMA SUR", "CD"),
            ("10|03", "XX", "10", "03", "SIN PAIS", "DC"),      # pais miss
            ("20|01", "PE", "20", "01", "SIN COMPANIA", "DC"),  # compania miss
        ],
        "id_sucursal string, id_pais string, id_compania string, "
        "cod_sucursal string, nomb_sucursal string, cod_tipo_sucursal string",
    ).write.parquet(dom("m_sucursal"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(dom("m_pais"))
    spark.createDataFrame(
        [("10", "PE", "10", "AJE PERU", "OP")],
        "id_compania string, id_pais string, cod_compania string, "
        "nomb_compania string, cod_tipo_compania string",
    ).write.parquet(dom("m_compania"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "dim_sucursal_lite", 1)], ANALYTICS_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "dim_sucursal")).toPandas()
    con = duck_with_views({t: dom(t) for t in ("m_sucursal", "m_pais", "m_compania")})
    odf = con.sql(_DSUC_SQL).df()
    assert_match(sdf, odf, "dim_sucursal")
    assert len(sdf) == 2
    assert set(sdf.nomb_compania) == {"AJE PERU"}


_DCC_SQL = """
WITH su AS (
  SELECT id_pais, id_clasificacion_cliente AS id_subgiro,
         id_clasificacion_cliente_padre AS id_giro,
         cod_clasificacion_cliente AS cod_subgiro,
         nomb_clasificacion_cliente AS desc_subgiro
  FROM m_clasificacion_cliente
  WHERE upper(cod_tipo_clasificacion_cliente) = 'SUBGIRO'
), gi AS (
  SELECT id_clasificacion_cliente AS id_giro,
         id_clasificacion_cliente_padre AS id_canal,
         cod_clasificacion_cliente AS cod_giro,
         nomb_clasificacion_cliente AS desc_giro
  FROM m_clasificacion_cliente
  WHERE upper(cod_tipo_clasificacion_cliente) = 'GIRO'
), ca AS (
  SELECT id_clasificacion_cliente AS id_canal,
         cod_clasificacion_cliente AS cod_canal,
         nomb_clasificacion_cliente AS desc_canal
  FROM m_clasificacion_cliente
  WHERE upper(cod_tipo_clasificacion_cliente) = 'CANAL'
)
SELECT su.id_subgiro AS id_clasificacion_cliente, su.id_pais,
       su.cod_subgiro, su.desc_subgiro,
       CAST(NULL AS VARCHAR) AS cod_ocasion_consumo,
       CAST(NULL AS VARCHAR) AS desc_ocasion_consumo,
       gi.cod_giro, gi.desc_giro, ca.cod_canal, ca.desc_canal
FROM su
LEFT JOIN gi ON gi.id_giro = su.id_giro
LEFT JOIN ca ON ca.id_canal = gi.id_canal
"""


def test_dim_clasificacion_cliente_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    spark.createDataFrame(
        [
            # full three-level chain (lowercase tipo → upper() match)
            ("SG1", "G1", "PE", "subgiro", "S001", "BODEGA BARRIO"),
            ("G1", "C1", "PE", "GIRO", "G001", "BODEGAS"),
            ("C1", None, "PE", "Canal", "C001", "TRADICIONAL"),
            # subgiro whose giro is missing → NULL giro AND canal
            ("SG2", "GX", "PE", "SUBGIRO", "S002", "HUERFANO"),
            # giro whose canal is missing → canal NULLs only
            ("SG3", "G2", "PE", "SUBGIRO", "S003", "MEDIO"),
            ("G2", "CX", "PE", "GIRO", "G002", "SIN CANAL"),
            ("X1", None, "PE", "OTRO", "X", "IGNORADO"),  # unknown level
        ],
        "id_clasificacion_cliente string, id_clasificacion_cliente_padre string, "
        "id_pais string, cod_tipo_clasificacion_cliente string, "
        "cod_clasificacion_cliente string, nomb_clasificacion_cliente string",
    ).write.parquet(dom("m_clasificacion_cliente"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "dim_clasificacion_cliente_lite", 1)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "dim_clasificacion_cliente")
    ).toPandas()
    con = duck_with_views({"m_clasificacion_cliente": dom("m_clasificacion_cliente")})
    odf = con.sql(_DCC_SQL).df()
    assert_match(sdf, odf, "dim_clasificacion_cliente")

    assert len(sdf) == 3                       # one row per SUBGIRO
    s1 = sdf[sdf.cod_subgiro == "S001"].iloc[0]
    assert s1["desc_giro"] == "BODEGAS" and s1["desc_canal"] == "TRADICIONAL"
    s2 = sdf[sdf.cod_subgiro == "S002"].iloc[0]
    assert s2["cod_giro"] is None and s2["cod_canal"] is None
    s3 = sdf[sdf.cod_subgiro == "S003"].iloc[0]
    assert s3["desc_giro"] == "SIN CANAL" and s3["cod_canal"] is None


# ===========================================================================
# 23. dim_eje_territorial — geographic flatten (`code/analytics/
#     dim_eje_territorial.py:17-108`): NG4→NG3→NG2→NG1 inner ladder, pais
#     denormalization, postal recovery via split()[1] — recomputed in SQL.
# ===========================================================================

_DEJE_SQL = """
WITH ng4 AS (SELECT * FROM m_eje_territorial WHERE cod_tipo_eje_territorial = 'NG4'),
     ng3 AS (SELECT * FROM m_eje_territorial WHERE cod_tipo_eje_territorial = 'NG3'),
     ng2 AS (SELECT * FROM m_eje_territorial WHERE cod_tipo_eje_territorial = 'NG2'),
     ng1 AS (SELECT * FROM m_eje_territorial WHERE cod_tipo_eje_territorial = 'NG1')
SELECT ng4.id_eje_territorial, mp.id_pais, mp.cod_pais, mp.desc_pais,
       ng1.cod_eje_territorial AS cod_ng1, ng1.nomb_eje_territorial AS desc_ng1,
       ng2.cod_eje_territorial AS cod_ng2, ng2.nomb_eje_territorial AS desc_ng2,
       ng3.cod_eje_territorial AS cod_ng3, ng3.nomb_eje_territorial AS desc_ng3,
       ng4.cod_eje_territorial AS cod_ng4, ng4.nomb_eje_territorial AS desc_ng4,
       split_part(ng4.cod_eje_territorial_ref, '|', 2) AS zona_postal
FROM ng4
JOIN ng3 ON ng3.id_eje_territorial = ng4.id_eje_territorial_padre
JOIN ng2 ON ng2.id_eje_territorial = ng3.id_eje_territorial_padre
JOIN ng1 ON ng1.id_eje_territorial = ng2.id_eje_territorial_padre
JOIN m_pais mp ON ng4.id_pais = mp.id_pais
"""


def test_dim_eje_territorial_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731

    def node(id_, padre, cod, ref, nomb, tipo):
        return (id_, padre, "PE", cod, ref, nomb, tipo)

    spark.createDataFrame(
        [
            node("PE|15001", "PE|15001|NG3", "15001", "DI2|15001", "DISTRITO 2", "NG4"),
            node("PE|15001|NG3", "PE|D1|PR1", "15001", "DI2|15001", "DISTRITO 2", "NG3"),
            node("PE|D1|PR1", "PE|D1", "PR1", None, "PROVINCIA 1", "NG2"),
            node("PE|D1", None, "D1", None, "DEPARTAMENTO 1", "NG1"),
            # orphan postal: its NG3 twin is absent → inner ladder drops it
            node("PE|99999", "PE|99999|NG3", "99999", "DIX|99999", "HUERFANO", "NG4"),
        ],
        "id_eje_territorial string, id_eje_territorial_padre string, "
        "id_pais string, cod_eje_territorial string, cod_eje_territorial_ref string, "
        "nomb_eje_territorial string, cod_tipo_eje_territorial string",
    ).write.parquet(dom("m_eje_territorial"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(dom("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "dim_eje_territorial_lite", 1)], ANALYTICS_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "dim_eje_territorial")
    ).toPandas()
    con = duck_with_views({t: dom(t) for t in ("m_eje_territorial", "m_pais")})
    odf = con.sql(_DEJE_SQL).df()
    assert_match(sdf, odf, "dim_eje_territorial")

    assert len(sdf) == 1
    r = sdf.iloc[0]
    assert r["zona_postal"] == "15001"                 # split()[1] recovery
    assert (r["cod_ng1"], r["cod_ng2"], r["cod_ng3"], r["cod_ng4"]) == (
        "D1", "PR1", "15001", "15001")
    assert r["desc_pais"] == "PERU"


# ===========================================================================
# 24. Small masters + summary: fact_venta_resumen, m_transportista,
#     m_responsable_comercial, m_modulo — value-oracled to finish the
#     hand-written job surface.
# ===========================================================================

_FVR_SQL = """
SELECT id_pais, id_periodo, cod_cliente,
       CAST(COUNT(*) AS BIGINT) AS n_documentos,
       CAST(SUM(CAST(imp_venta AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS imp_venta
FROM t_venta WHERE es_eliminado = 0
GROUP BY 1, 2, 3
"""


def test_fact_venta_resumen_duckdb_differential(spark, lake):
    dom = lambda t: lake.table_path(Layer.DOMAIN, t)  # noqa: E731
    spark.createDataFrame(
        [
            ("PE", "202505", "C1", 0, D("10.5")),
            ("PE", "202505", "C1", 0, D("4.5")),
            ("PE", "202505", "C1", 1, D("99")),   # soft-deleted
            ("PE", "202504", "C2", 0, D("7")),
        ],
        "id_pais string, id_periodo string, cod_cliente string, "
        "es_eliminado int, imp_venta decimal(20,4)",
    ).write.parquet(dom("t_venta"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("analytics", "fact_venta_resumen", 1)], ANALYTICS_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_resumen")
    ).toPandas()
    con = duck_with_views({"t_venta": dom("t_venta")})
    assert_match(sdf, con.sql(_FVR_SQL).df(), "fact_venta_resumen")
    c1 = sdf[sdf.cod_cliente == "C1"].iloc[0]
    assert int(c1["n_documentos"]) == 2 and float(c1["imp_venta"]) == 15.0


_MTR_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT mt.id_transportista, b.id_pais,
       CAST(mt.cod_transportista AS INT) AS cod_transportista,
       mpers.nomb_persona AS nomb_transportista,
       mt.cod_tipo_transportista,
       mtt.descripcion1 AS desc_tipo_transportista,
       mpers.nro_documento AS ruc_transportista,
       CAST(mt.fecha_creacion AS DATE) AS fecha_creacion,
       CAST(mt.fecha_modificacion AS DATE) AS fecha_modificacion
FROM m_transportista mt
JOIN bridge b ON mt.cod_compania = b.cod_compania
JOIN m_persona mpers ON mpers.id_persona = mt.id_transportista
LEFT JOIN m_tipo_transportista mtt
  ON mt.cod_tipo_transportista = mtt.cod_tipo_transportista
 AND mt.cod_compania = mtt.cod_compania
"""


def test_m_transportista_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [
            ("10", "10|T1", "007", "TC", TS, TS),   # int cast 007 → 7
            ("10", "10|T2", "12", "TX", TS, TS),    # unknown type → NULL desc
            ("10", "10|T3", "13", "TC", TS, TS),    # persona missing → drop
            ("99", "99|T9", "14", "TC", TS, TS),    # ghost company
        ],
        "cod_compania string, id_transportista string, cod_transportista string, "
        "cod_tipo_transportista string, fecha_creacion timestamp, "
        "fecha_modificacion timestamp",
    ).write.parquet(stage("m_transportista"))
    spark.createDataFrame(
        [("10|T1", "TRANSPORTES UNO", "20100000001"),
         ("10|T2", "TRANSPORTES DOS", "20100000002")],
        "id_persona string, nomb_persona string, nro_documento string",
    ).write.parquet(stage("m_persona"))
    spark.createDataFrame(
        [("10", "TC", "CARGA PESADA")],
        "cod_compania string, cod_tipo_transportista string, descripcion1 string",
    ).write.parquet(stage("m_tipo_transportista"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "m_transportista_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_transportista")
    ).toPandas()
    con = duck_with_views({t: stage(t) for t in (
        "m_transportista", "m_persona", "m_tipo_transportista", "m_compania", "m_pais",
    )})
    assert_match(sdf, con.sql(_MTR_SQL).df(), "m_transportista")
    assert len(sdf) == 2
    t1 = sdf[sdf.id_transportista == "10|T1"].iloc[0]
    assert int(t1["cod_transportista"]) == 7
    assert t1["desc_tipo_transportista"] == "CARGA PESADA"
    t2 = sdf[sdf.id_transportista == "10|T2"].iloc[0]
    assert t2["desc_tipo_transportista"] is None


_MRC_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT concat_ws('|', trim(mv.cod_compania), trim(mv.cod_vendedor))
         AS id_responsable_comercial,
       b.id_pais,
       trim(mv.cod_vendedor) AS cod_responsable_comercial,
       mpe.nomb_persona AS nomb_responsable_comercial,
       mv.cod_tipo_vendedor AS cod_tipo_responsable_comercial,
       CAST(NULL AS VARCHAR) AS estado,
       CAST(DATE '{as_of}' AS TIMESTAMP) AS fecha_creacion,
       CAST(DATE '{as_of}' AS TIMESTAMP) AS fecha_modificacion
FROM m_vendedor mv
JOIN m_persona mpe
  ON mv.cod_vendedor = mpe.cod_persona AND mv.cod_compania = mpe.cod_compania
JOIN bridge b ON mv.cod_compania = b.cod_compania
"""


def test_m_responsable_comercial_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [(" V1 ", "10", "PRE"), ("V2", "10", "AUT"), ("V3", "99", "PRE")],
        "cod_vendedor string, cod_compania string, cod_tipo_vendedor string",
    ).write.parquet(stage("m_vendedor"))
    spark.createDataFrame(
        [(" V1 ", "10", "JUAN PEREZ"), ("V2", "10", "MARIA LOPEZ"),
         ("V3", "99", "GHOST")],
        "cod_persona string, cod_compania string, nomb_persona string",
    ).write.parquet(stage("m_persona"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS), ("99", "XX", "GHOST", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "m_responsable_comercial_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_responsable_comercial")
    ).toPandas()
    con = duck_with_views({t: stage(t) for t in (
        "m_vendedor", "m_persona", "m_compania", "m_pais",
    )})
    assert_match(
        sdf, con.sql(_MRC_SQL.format(as_of=AS_OF.isoformat())).df(),
        "m_responsable_comercial",
    )
    assert len(sdf) == 2
    v1 = sdf[sdf.nomb_responsable_comercial == "JUAN PEREZ"].iloc[0]
    # join on the raw padded code, mint from the TRIMMED one
    assert v1["id_responsable_comercial"] == "10|V1"
    assert v1["cod_responsable_comercial"] == "V1"


_MMOD_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT mm.id_modulo, b.id_pais,
       concat_ws('|', trim(mm.cod_compania), trim(mm.cod_sucursal)) AS id_sucursal,
       concat_ws('|', trim(mm.cod_compania), trim(mm.cod_sucursal),
                 trim(mm.cod_fuerza_venta), trim(mm.cod_ruta))
         AS id_estructura_comercial,
       concat_ws('|', trim(mm.cod_compania), trim(mrd.cod_modelo_atencion))
         AS id_modelo_atencion,
       mm.cod_modulo, mm.desc_modulo,
       CAST(NULL AS VARCHAR) AS desc_fuerza_venta,
       CAST(NULL AS VARCHAR) AS periodo_visita,
       ms.es_activo AS estado,
       DATE '{as_of}' AS fecha_creacion,
       DATE '{as_of}' AS fecha_modificacion
FROM m_modulo mm
JOIN m_sucursal ms
  ON ms.cod_compania = mm.cod_compania AND ms.cod_sucursal = mm.cod_sucursal
JOIN bridge b ON ms.cod_compania = b.cod_compania
JOIN m_ruta mrd
  ON mrd.cod_compania = mm.cod_compania AND mrd.cod_sucursal = mm.cod_sucursal
 AND mrd.cod_fuerza_venta = mm.cod_fuerza_venta AND mrd.cod_ruta = mm.cod_ruta
"""


def test_m_modulo_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [
            ("10", "01", "F1", "RT1", "10|01|M1", "M1", "MODULO UNO"),
            ("10", "01", "F1", "RTX", "10|01|M2", "M2", "SIN RUTA"),   # ruta miss
            ("10", "09", "F1", "RT1", "10|09|M3", "M3", "SIN SUCURSAL"),
        ],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_ruta string, id_modulo string, cod_modulo string, desc_modulo string",
    ).write.parquet(stage("m_modulo"))
    spark.createDataFrame(
        [("10", "01", "F1", "RT1", "MA-PRE")],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_ruta string, cod_modelo_atencion string",
    ).write.parquet(stage("m_ruta"))
    spark.createDataFrame(
        [("10", "01", "T")],
        "cod_compania string, cod_sucursal string, es_activo string",
    ).write.parquet(stage("m_sucursal"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves([JobConfig("domain", "m_modulo_lite", 1)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_modulo")).toPandas()
    con = duck_with_views({t: stage(t) for t in (
        "m_modulo", "m_ruta", "m_sucursal", "m_compania", "m_pais",
    )})
    assert_match(
        sdf, con.sql(_MMOD_SQL.format(as_of=AS_OF.isoformat())).df(), "m_modulo"
    )
    assert len(sdf) == 1
    m1 = sdf.iloc[0]
    assert m1["id_estructura_comercial"] == "10|01|F1|RT1"
    assert m1["id_modelo_atencion"] == "10|MA-PRE"
    assert m1["estado"] == "T"


# ===========================================================================
# 25. The remaining hand-written jobs: m_tipo_venta (DCV whitelist bridge),
#     m_asignacion_modulo (left-join activity flag), m_clasificacion_cliente
#     (3-level relation expansion), m_pais (left_semi prune), m_compania.
#     With these, EVERY hand-written job has a value-level differential.
# ===========================================================================

_MTV_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT concat_ws('|', trim(d.cod_compania), trim(d.cod_documento_transaccion),
                 trim(d.cod_procedimiento)) AS id_tipo_venta,
       e.id_pais,
       d.cod_procedimiento AS cod_tipo_venta,
       COALESCE(d.desc_procedimiento, 'ninguno') AS nomb_tipo_venta,
       d.cod_tipo_operacion,
       DATE '{as_of}' AS fecha_creacion,
       DATE '{as_of}' AS fecha_modificacion
FROM m_procedimiento d
JOIN m_tipo_documento c
  ON d.cod_compania = c.cod_compania
 AND d.cod_documento_transaccion = c.cod_tipo_documento
JOIN bridge e ON d.cod_compania = e.cod_compania
WHERE EXISTS (
  SELECT 1 FROM m_tipo_transaccion tt
  WHERE tt.cod_tipo_transaccion = 'DCV'
    AND tt.cod_compania = c.cod_compania
    AND tt.cod_documento_transaccion = c.cod_tipo_documento)
"""


def test_m_tipo_venta_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [
            ("10", "FAC", "P01", "VENTA CONTADO", "VEN"),
            ("10", "FAC", "P02", None, "PRO"),          # NULL desc → 'ninguno'
            ("10", "GRA", "P01", "GUIA", "REM"),        # not DCV → dropped
            ("10", "XXX", "P01", "SIN DOC", "VEN"),     # doc type missing
        ],
        "cod_compania string, cod_documento_transaccion string, "
        "cod_procedimiento string, desc_procedimiento string, "
        "cod_tipo_operacion string",
    ).write.parquet(stage("m_procedimiento"))
    spark.createDataFrame(
        [("10", "FAC"), ("10", "GRA")],
        "cod_compania string, cod_tipo_documento string",
    ).write.parquet(stage("m_tipo_documento"))
    spark.createDataFrame(
        [("10", "DCV", "FAC"), ("10", "DCV", "FAC"),    # duplicate whitelist row
         ("10", "DAL", "GRA")],
        "cod_compania string, cod_tipo_transaccion string, "
        "cod_documento_transaccion string",
    ).write.parquet(stage("m_tipo_transaccion"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves([JobConfig("domain", "m_tipo_venta_lite", 1)], DOMAIN_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_tipo_venta")).toPandas()
    con = duck_with_views({t: stage(t) for t in (
        "m_procedimiento", "m_tipo_documento", "m_tipo_transaccion",
        "m_compania", "m_pais",
    )})
    assert_match(
        sdf, con.sql(_MTV_SQL.format(as_of=AS_OF.isoformat())).df(), "m_tipo_venta"
    )
    assert len(sdf) == 2                       # dup whitelist row didn't fan out
    p2 = sdf[sdf.id_tipo_venta == "10|FAC|P02"].iloc[0]
    assert p2["nomb_tipo_venta"] == "ninguno"


_MAM_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
)
SELECT concat_ws('|', trim(mm.cod_compania), trim(mm.cod_sucursal),
                 trim(mm.cod_fuerza_venta), trim(mm.cod_modulo),
                 trim(mm.cod_cliente)) AS id_asignacion_modulo,
       b.id_pais,
       concat_ws('|', trim(suc.cod_compania), trim(suc.cod_sucursal)) AS id_sucursal,
       concat_ws('|', trim(suc.cod_compania), trim(mm.cod_cliente)) AS id_cliente,
       concat_ws('|', trim(mm.cod_compania), trim(mm.cod_sucursal),
                 trim(mm.cod_fuerza_venta), trim(mm.cod_modulo)) AS id_modulo,
       CAST(NULL AS TIMESTAMP) AS fecha_inicio,
       CAST(NULL AS TIMESTAMP) AS fecha_fin,
       CAST(NULL AS VARCHAR) AS frecuencia_visita,
       CAST(NULL AS VARCHAR) AS periodo_visita,
       CASE WHEN mcli.cod_sucursal IS NULL
              OR mm.cod_sucursal = mcli.cod_sucursal THEN 1 ELSE 0
       END AS es_activo,
       CAST(0 AS INT) AS es_eliminado,
       CAST(DATE '{as_of}' AS TIMESTAMP) AS fecha_creacion,
       CAST(DATE '{as_of}' AS TIMESTAMP) AS fecha_modificacion
FROM m_asignacion_modulo mm
LEFT JOIN m_cliente mcli
  ON mm.cod_compania = mcli.cod_compania AND mm.cod_cliente = mcli.cod_cliente
JOIN m_sucursal suc
  ON suc.cod_compania = mm.cod_compania AND suc.cod_sucursal = mm.cod_sucursal
JOIN bridge b ON suc.cod_compania = b.cod_compania
"""


def test_m_asignacion_modulo_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [
            ("10", "01", "F1", "MOD1", "C1"),   # client same sucursal → active
            ("10", "01", "F1", "MOD1", "C2"),   # client other sucursal → 0
            ("10", "01", "F1", "MOD1", "C9"),   # client unknown → active
            ("10", "09", "F1", "MOD1", "C1"),   # sucursal master miss → drop
        ],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_modulo string, cod_cliente string",
    ).write.parquet(stage("m_asignacion_modulo"))
    spark.createDataFrame(
        [("10", "C1", "01"), ("10", "C2", "02")],
        "cod_compania string, cod_cliente string, cod_sucursal string",
    ).write.parquet(stage("m_cliente"))
    spark.createDataFrame(
        [("10", "01", "T")],
        "cod_compania string, cod_sucursal string, es_activo string",
    ).write.parquet(stage("m_sucursal"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "m_asignacion_modulo_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_asignacion_modulo")
    ).toPandas()
    con = duck_with_views({t: stage(t) for t in (
        "m_asignacion_modulo", "m_cliente", "m_sucursal", "m_compania", "m_pais",
    )})
    assert_match(
        sdf, con.sql(_MAM_SQL.format(as_of=AS_OF.isoformat())).df(),
        "m_asignacion_modulo",
    )
    act = {r["id_asignacion_modulo"]: r["es_activo"] for _, r in sdf.iterrows()}
    assert act == {
        "10|01|F1|MOD1|C1": 1, "10|01|F1|MOD1|C2": 0, "10|01|F1|MOD1|C9": 1,
    }


_MCC_SQL = """
WITH bridge AS (
  SELECT mc.cod_compania, mp.id_pais
  FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
), conformed AS (
  SELECT irc.*, b.id_pais
  FROM i_relacion_consumo irc JOIN bridge b ON irc.cod_compania = b.cod_compania
), sg AS (
  SELECT DISTINCT irc.id_pais,
         concat_ws('|', trim(irc.cod_compania), 'SG', trim(irc.cod_subgiro))
           AS id_clasificacion_cliente,
         concat_ws('|', trim(irc.cod_compania), 'GR', trim(irc.cod_giro),
                   trim(irc.cod_canal)) AS id_clasificacion_cliente_padre,
         irc.cod_subgiro AS cod_clasificacion_cliente,
         mv.desc_subgiro AS nomb_clasificacion_cliente,
         'Subgiro' AS cod_tipo_clasificacion_cliente,
         mv.es_activo AS estado
  FROM conformed irc
  JOIN m_subgiro mv
    ON irc.cod_subgiro = mv.cod_subgiro AND irc.cod_compania = mv.cod_compania
), gr AS (
  SELECT DISTINCT irc.id_pais,
         concat_ws('|', trim(irc.cod_compania), 'GR', trim(irc.cod_giro),
                   trim(irc.cod_canal)) AS id_clasificacion_cliente,
         concat_ws('|', trim(irc.cod_compania), 'CN', trim(irc.cod_canal))
           AS id_clasificacion_cliente_padre,
         irc.cod_giro, mv.desc_giro, 'Giro', mv.es_activo
  FROM conformed irc
  JOIN m_giro mv
    ON irc.cod_giro = mv.cod_giro AND irc.cod_compania = mv.cod_compania
), cn AS (
  SELECT DISTINCT irc.id_pais,
         concat_ws('|', trim(irc.cod_compania), 'CN', trim(irc.cod_canal))
           AS id_clasificacion_cliente,
         CAST(NULL AS VARCHAR) AS id_clasificacion_cliente_padre,
         irc.cod_canal, mv.desc_canal, 'Canal', mv.es_activo
  FROM conformed irc
  JOIN m_canal mv
    ON irc.cod_canal = mv.cod_canal AND irc.cod_compania = mv.cod_compania
), unioned AS (
  SELECT * FROM sg UNION ALL SELECT * FROM gr UNION ALL SELECT * FROM cn
)
SELECT id_pais, id_clasificacion_cliente, id_clasificacion_cliente_padre,
       cod_clasificacion_cliente, nomb_clasificacion_cliente,
       cod_tipo_clasificacion_cliente, estado,
       DATE '{as_of}' AS fecha_creacion, DATE '{as_of}' AS fecha_modificacion
FROM unioned
"""


def test_m_clasificacion_cliente_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [
            ("10", "SG1", "G1", "CN1"),
            ("10", "SG1", "G1", "CN1"),   # exact duplicate → distinct
            ("10", "SG2", "G1", "CN1"),   # shares giro/canal → they dedup
            ("10", "SGX", "G2", "CN1"),   # subgiro missing from master
        ],
        "cod_compania string, cod_subgiro string, cod_giro string, cod_canal string",
    ).write.parquet(stage("i_relacion_consumo"))
    spark.createDataFrame(
        [("10", "SG1", "BODEGA BARRIO", "T"), ("10", "SG2", "MINIMARKET", "T")],
        "cod_compania string, cod_subgiro string, desc_subgiro string, es_activo string",
    ).write.parquet(stage("m_subgiro"))
    spark.createDataFrame(
        [("10", "G1", "BODEGAS", "T"), ("10", "G2", "KIOSCOS", "T")],
        "cod_compania string, cod_giro string, desc_giro string, es_activo string",
    ).write.parquet(stage("m_giro"))
    spark.createDataFrame(
        [("10", "CN1", "TRADICIONAL", "T")],
        "cod_compania string, cod_canal string, desc_canal string, es_activo string",
    ).write.parquet(stage("m_canal"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(stage("m_pais"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "m_clasificacion_cliente_lite", 1)], DOMAIN_JOBS, mk
    )
    assert res[0].status == "succeeded", res[0].error
    sdf = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_clasificacion_cliente")
    ).toPandas()
    con = duck_with_views({t: stage(t) for t in (
        "i_relacion_consumo", "m_subgiro", "m_giro", "m_canal",
        "m_compania", "m_pais",
    )})
    assert_match(
        sdf, con.sql(_MCC_SQL.format(as_of=AS_OF.isoformat())).df(),
        "m_clasificacion_cliente",
    )
    # 2 subgiros + 2 giros (G1 deduped, G2 from the SGX relation) + 1 canal
    tipos = sdf.groupby("cod_tipo_clasificacion_cliente").size().to_dict()
    assert tipos == {"Subgiro": 2, "Giro": 2, "Canal": 1}
    sg1 = sdf[sdf.id_clasificacion_cliente == "10|SG|SG1"].iloc[0]
    assert sg1["id_clasificacion_cliente_padre"] == "10|GR|G1|CN1"


_MPAIS_SQL = """
SELECT p.id_pais, p.cod_pais, p.desc_pais
FROM m_pais p
WHERE EXISTS (SELECT 1 FROM m_compania c WHERE c.cod_pais = p.cod_pais)
"""

_MCOMP_SQL = """
SELECT mc.cod_compania AS id_compania,
       CAST(NULL AS VARCHAR) AS id_compania_ref,
       mp.id_pais, mc.cod_compania,
       mc.desc_compania AS nomb_compania,
       CAST(NULL AS VARCHAR) AS cod_tipo_compania,
       mc.es_activo AS estado,
       CAST(mc.fecha_creacion AS DATE) AS fecha_creacion,
       CAST(mc.fecha_modificacion AS DATE) AS fecha_modificacion
FROM m_compania mc JOIN m_pais mp ON mc.cod_pais = mp.cod_pais
"""


def test_m_pais_and_m_compania_duckdb_differential(spark, lake):
    stage = lambda t, inst="pe01": lake.table_path(Layer.STAGE, t, inst)  # noqa: E731
    spark.createDataFrame(
        [("PE", "PE", "PERU"), ("CL", "CL", "CHILE"), ("BO", "BO", "BOLIVIA")],
        "id_pais string, cod_pais string, desc_pais string",
    ).write.parquet(stage("m_pais"))
    spark.createDataFrame(
        [("10", "PE", "AJE PERU", "T", TS, TS), ("30", "CL", "AJE CHILE", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(stage("m_compania"))

    def mk(cfg):
        return JobContext(
            spark=spark, catalog=lake, registry=SchemaRegistry({}), config=cfg,
            as_of=AS_OF,
        )

    res = run_waves(
        [JobConfig("domain", "m_pais", 1), JobConfig("domain", "m_compania", 2)],
        DOMAIN_JOBS, mk,
    )
    assert all(r.status == "succeeded" for r in res), [r.error for r in res]
    con = duck_with_views({t: stage(t) for t in ("m_pais", "m_compania")})
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_pais")).toPandas()
    assert_match(sdf, con.sql(_MPAIS_SQL).df(), "m_pais")
    assert set(sdf.cod_pais) == {"PE", "CL"}   # BOLIVIA pruned (no company)
    sdf = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_compania")).toPandas()
    assert_match(sdf, con.sql(_MCOMP_SQL).df(), "m_compania")
