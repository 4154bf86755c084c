"""Bespoke master/bridge domain jobs (m_transportista, m_responsable_
comercial, m_modulo, m_clasificacion_cliente, m_asignacion_modulo) and their
downstream analytics shapes (dim_sucursal, dim_clasificacion_cliente,
dim_vendedor passthrough, fact_reparto_detalle)."""

import datetime as dt
from decimal import Decimal

from cdk_datalake_analytics_comercial_spark.core.catalog import Layer
from cdk_datalake_analytics_comercial_spark.jobs import ANALYTICS_JOBS, DOMAIN_JOBS
from cdk_datalake_analytics_comercial_spark.runner import JobConfig, JobContext, run_waves
from cdk_datalake_analytics_comercial_spark.sources.registry import SchemaRegistry

AS_OF = dt.date(2025, 5, 15)
TS = dt.datetime(2025, 4, 1)


def _seed_bridge(spark, lake, reg_dict):
    reg_dict.update(
        {
            "m_compania": [
                ("cod_compania", "string"), ("cod_pais", "string"),
                ("desc_compania", "string"), ("es_activo", "string"),
                ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp"),
            ],
            "m_pais": [("id_pais", "string"), ("cod_pais", "string"), ("desc_pais", "string")],
        }
    )
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", TS, TS)],
        "cod_compania string, cod_pais string, desc_compania string, es_activo string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_compania", "pe01"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_pais", "principal"))


def _mk(spark, lake, reg):
    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)
    return mk


def _run_domain(spark, lake, reg, job):
    res = run_waves([JobConfig("domain", job, 1)], DOMAIN_JOBS, _mk(spark, lake, reg))
    assert res[0].status == "succeeded", res[0].error


def _run_analytics(spark, lake, reg, job):
    res = run_waves([JobConfig("analytics", job, 1)], ANALYTICS_JOBS, _mk(spark, lake, reg))
    assert res[0].status == "succeeded", res[0].error


def test_m_transportista_person_and_type_joins(spark, lake):
    """Person master joined on the extraction-minted id; carrier type is a
    LEFT join so untyped carriers keep a NULL description; cod cast int."""
    reg_dict = {
        "m_transportista": [
            ("id_transportista", "string"), ("cod_compania", "string"),
            ("cod_transportista", "string"), ("cod_tipo_transportista", "string"),
            ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp"),
        ],
        "m_persona": [
            ("id_persona", "string"), ("cod_compania", "string"), ("cod_persona", "string"),
            ("nomb_persona", "string"), ("nro_documento", "string"),
        ],
        "m_tipo_transportista": [
            ("cod_compania", "string"), ("cod_tipo_transportista", "string"),
            ("descripcion1", "string"),
        ],
    }
    _seed_bridge(spark, lake, reg_dict)
    spark.createDataFrame(
        [("10|T1", "10", "77", "TER", TS, TS), ("10|T2", "10", "88", "XXX", TS, TS)],
        "id_transportista string, cod_compania string, cod_transportista string, "
        "cod_tipo_transportista string, fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_transportista", "pe01"))
    spark.createDataFrame(
        [("10|T1", "10", "T1", "TRANSPORTES SA", "20100"),
         ("10|T2", "10", "T2", "CARRIER SAC", "20200")],
        "id_persona string, cod_compania string, cod_persona string, nomb_persona string, "
        "nro_documento string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_persona", "pe01"))
    spark.createDataFrame(
        [("10", "TER", "TERCERO")],
        "cod_compania string, cod_tipo_transportista string, descripcion1 string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_tipo_transportista", "pe01"))

    _run_domain(spark, lake, SchemaRegistry(reg_dict), "m_transportista_lite")
    rows = {r["id_transportista"]: r for r in spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_transportista")).collect()}
    t1 = rows["10|T1"]
    assert t1["cod_transportista"] == 77               # integer cast
    assert t1["nomb_transportista"] == "TRANSPORTES SA"
    assert t1["desc_tipo_transportista"] == "TERCERO"
    assert t1["ruc_transportista"] == "20100"
    assert t1["fecha_creacion"] == dt.date(2025, 4, 1)
    assert rows["10|T2"]["desc_tipo_transportista"] is None  # left join miss


def test_m_responsable_comercial_two_key_person_join(spark, lake):
    reg_dict = {
        "m_vendedor": [
            ("cod_compania", "string"), ("cod_vendedor", "string"),
            ("cod_tipo_vendedor", "string"),
        ],
        "m_persona": [
            ("id_persona", "string"), ("cod_compania", "string"), ("cod_persona", "string"),
            ("nomb_persona", "string"), ("nro_documento", "string"),
        ],
    }
    _seed_bridge(spark, lake, reg_dict)
    spark.createDataFrame(
        [("10", " V9 ", "PRE")],
        "cod_compania string, cod_vendedor string, cod_tipo_vendedor string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_vendedor", "pe01"))
    spark.createDataFrame(
        [("10|V9", "10", " V9 ", "JUAN PEREZ", "44556677")],
        "id_persona string, cod_compania string, cod_persona string, nomb_persona string, "
        "nro_documento string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_persona", "pe01"))

    _run_domain(spark, lake, SchemaRegistry(reg_dict), "m_responsable_comercial_lite")
    r = spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_responsable_comercial")).collect()[0]
    assert r["id_responsable_comercial"] == "10|V9"    # trimmed parts
    assert r["cod_responsable_comercial"] == "V9"
    assert r["nomb_responsable_comercial"] == "JUAN PEREZ"
    assert r["estado"] is None                         # placeholder
    assert r["fecha_creacion"] == dt.datetime(2025, 5, 15)  # clock → timestamp

    # dim_vendedor passthrough renames downstream
    _run_analytics(spark, lake, SchemaRegistry(reg_dict), "dim_vendedor_lite")
    d = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "dim_vendedor")).collect()[0]
    assert d["id_vendedor"] == "10|V9"
    assert d["cod_vendedor"] == "V9"
    assert d["nombre_vendedor"] == "JUAN PEREZ"


def test_m_modulo_composite_ids(spark, lake):
    """4-join conformance; composite sucursal/estructura/modelo ids minted
    from the module's own keys plus the ruta's modelo de atención."""
    reg_dict = {
        "m_modulo": [
            ("id_modulo", "string"), ("cod_compania", "string"), ("cod_sucursal", "string"),
            ("cod_fuerza_venta", "string"), ("cod_ruta", "string"), ("cod_modulo", "string"),
            ("desc_modulo", "string"),
        ],
        "m_ruta": [
            ("cod_compania", "string"), ("cod_sucursal", "string"),
            ("cod_fuerza_venta", "string"), ("cod_ruta", "string"),
            ("cod_modelo_atencion", "string"),
        ],
        "m_sucursal": [
            ("cod_compania", "string"), ("cod_sucursal", "string"),
            ("desc_sucursal", "string"), ("es_activo", "string"),
        ],
    }
    _seed_bridge(spark, lake, reg_dict)
    spark.createDataFrame(
        [("10|01|F1|M1", "10", "01", "F1", "R1", "M1", "MODULO NORTE")],
        "id_modulo string, cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_ruta string, cod_modulo string, desc_modulo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_modulo", "pe01"))
    spark.createDataFrame(
        [("10", "01", "F1", "R1", "MA1")],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, cod_ruta string, "
        "cod_modelo_atencion string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_ruta", "pe01"))
    spark.createDataFrame(
        [("10", "01", "SUC LIMA", "T")],
        "cod_compania string, cod_sucursal string, desc_sucursal string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_sucursal", "pe01"))

    _run_domain(spark, lake, SchemaRegistry(reg_dict), "m_modulo_lite")
    r = spark.read.parquet(lake.table_path(Layer.DOMAIN, "m_modulo")).collect()[0]
    assert r["id_modulo"] == "10|01|F1|M1"             # extraction-id passthrough
    assert r["id_sucursal"] == "10|01"
    assert r["id_estructura_comercial"] == "10|01|F1|R1"
    assert r["id_modelo_atencion"] == "10|MA1"         # from the ruta
    assert r["estado"] == "T"                          # sucursal activity flag
    assert r["periodo_visita"] is None
    assert r["fecha_creacion"] == AS_OF


def test_m_clasificacion_cliente_three_levels_and_dim_flatten(spark, lake):
    """Three hierarchy levels from one consumption relation — subgiro→giro→
    canal parent pointers — then the analytics dim flattens them back onto
    one subgiro row via two LEFT self-joins."""
    reg_dict = {
        "i_relacion_consumo": [
            ("cod_compania", "string"), ("cod_canal", "string"), ("cod_giro", "string"),
            ("cod_subgiro", "string"),
        ],
        "m_canal": [("cod_compania", "string"), ("cod_canal", "string"),
                    ("desc_canal", "string"), ("es_activo", "string")],
        "m_giro": [("cod_compania", "string"), ("cod_giro", "string"),
                   ("desc_giro", "string"), ("es_activo", "string")],
        "m_subgiro": [("cod_compania", "string"), ("cod_subgiro", "string"),
                      ("desc_subgiro", "string"), ("es_activo", "string")],
    }
    _seed_bridge(spark, lake, reg_dict)
    spark.createDataFrame(
        # duplicate relation rows → branch distinct() collapses them
        [("10", "C1", "G1", "S1"), ("10", "C1", "G1", "S1")],
        "cod_compania string, cod_canal string, cod_giro string, cod_subgiro string",
    ).write.parquet(lake.table_path(Layer.STAGE, "i_relacion_consumo", "pe01"))
    spark.createDataFrame(
        [("10", "C1", "BODEGA", "T")],
        "cod_compania string, cod_canal string, desc_canal string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_canal", "pe01"))
    spark.createDataFrame(
        [("10", "G1", "ABARROTES", "T")],
        "cod_compania string, cod_giro string, desc_giro string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_giro", "pe01"))
    spark.createDataFrame(
        [("10", "S1", "MINIMARKET", "T")],
        "cod_compania string, cod_subgiro string, desc_subgiro string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_subgiro", "pe01"))

    reg = SchemaRegistry(reg_dict)
    _run_domain(spark, lake, reg, "m_clasificacion_cliente_lite")
    rows = {r["id_clasificacion_cliente"]: r for r in spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_clasificacion_cliente")).collect()}
    assert set(rows) == {"10|SG|S1", "10|GR|G1|C1", "10|CN|C1"}   # one per level
    assert rows["10|SG|S1"]["id_clasificacion_cliente_padre"] == "10|GR|G1|C1"
    assert rows["10|GR|G1|C1"]["id_clasificacion_cliente_padre"] == "10|CN|C1"
    assert rows["10|CN|C1"]["id_clasificacion_cliente_padre"] is None
    assert rows["10|SG|S1"]["cod_tipo_clasificacion_cliente"] == "Subgiro"
    assert rows["10|CN|C1"]["nomb_clasificacion_cliente"] == "BODEGA"

    _run_analytics(spark, lake, reg, "dim_clasificacion_cliente_lite")
    d = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "dim_clasificacion_cliente")).collect()
    assert len(d) == 1                                 # one row per subgiro
    flat = d[0]
    assert flat["id_clasificacion_cliente"] == "10|SG|S1"
    assert flat["desc_subgiro"] == "MINIMARKET"
    assert flat["desc_giro"] == "ABARROTES"
    assert flat["desc_canal"] == "BODEGA"              # walked two levels up
    assert flat["cod_ocasion_consumo"] is None


def test_m_asignacion_modulo_activity_flag(spark, lake):
    """es_activo: 1 when the client has no sucursal or it matches the
    assignment's; 0 when the client lives in another sucursal; the client
    LEFT join keeps assignments for unknown clients active."""
    reg_dict = {
        "m_asignacion_modulo": [
            ("cod_compania", "string"), ("cod_sucursal", "string"),
            ("cod_fuerza_venta", "string"), ("cod_modulo", "string"),
            ("cod_cliente", "string"),
        ],
        "m_cliente": [
            ("cod_compania", "string"), ("cod_cliente", "string"), ("cod_sucursal", "string"),
        ],
        "m_sucursal": [
            ("cod_compania", "string"), ("cod_sucursal", "string"),
            ("desc_sucursal", "string"), ("es_activo", "string"),
        ],
    }
    _seed_bridge(spark, lake, reg_dict)
    spark.createDataFrame(
        [
            ("10", "01", "F1", "M1", "C1"),   # client in same sucursal → 1
            ("10", "01", "F1", "M1", "C2"),   # client in sucursal 02 → 0
            ("10", "01", "F1", "M1", "C3"),   # unknown client → 1 (null guard)
        ],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_modulo string, cod_cliente string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_asignacion_modulo", "pe01"))
    spark.createDataFrame(
        [("10", "C1", "01"), ("10", "C2", "02")],
        "cod_compania string, cod_cliente string, cod_sucursal string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_cliente", "pe01"))
    spark.createDataFrame(
        [("10", "01", "SUC LIMA", "T")],
        "cod_compania string, cod_sucursal string, desc_sucursal string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_sucursal", "pe01"))

    _run_domain(spark, lake, SchemaRegistry(reg_dict), "m_asignacion_modulo_lite")
    rows = {r["id_asignacion_modulo"]: r for r in spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_asignacion_modulo")).collect()}
    assert rows["10|01|F1|M1|C1"]["es_activo"] == 1
    assert rows["10|01|F1|M1|C2"]["es_activo"] == 0    # foreign sucursal
    assert rows["10|01|F1|M1|C3"]["es_activo"] == 1    # null guard
    r = rows["10|01|F1|M1|C1"]
    assert r["id_cliente"] == "10|C1"
    assert r["id_modulo"] == "10|01|F1|M1"
    assert r["es_eliminado"] == 0
    assert r["fecha_inicio"] is None


def test_t_pedido_detalle_signed_splits_and_ades_union(spark, lake):
    """Main '200' docs pre-aggregate; ADES '300' doc unions in after the
    anti-join; the VEN/PRO operation split gates the signed package→case
    and →volume conversions through article factors."""
    reg_dict = {
        "t_documento_pedido_detalle": [
            ("cod_compania", "string"), ("cod_sucursal", "string"), ("cod_almacen", "string"),
            ("cod_documento_pedido", "string"), ("nro_documento_pedido", "string"),
            ("cod_cliente", "string"), ("cod_articulo", "string"),
            ("cod_procedimiento", "string"), ("fecha_pedido", "date"),
            ("cant_paquete", "numeric(38,12)"), ("cant_unidad", "numeric(38,12)"),
            ("cant_paquete_asignado", "numeric(38,12)"),
            ("cant_unidad_asignado", "numeric(38,12)"),
            ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp"),
        ],
        "t_documento_pedido_ades_detalle": [
            ("cod_compania", "string"), ("cod_sucursal", "string"),
            ("cod_almacen_emisor", "string"), ("cod_documento_transaccion", "string"),
            ("nro_comprobante", "string"), ("cod_cliente", "string"),
            ("cod_articulo", "string"), ("cod_procedimiento", "string"),
            ("fecha_pedido", "date"),
            ("cantidad_cajas", "numeric(38,12)"), ("cantidad_botellas", "numeric(38,12)"),
            ("cantidad_cajas_asignada", "numeric(38,12)"),
            ("cantidad_botellas_asignada", "numeric(38,12)"),
            ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp"),
        ],
        "m_articulo": [
            ("cod_compania", "string"), ("cod_articulo", "string"),
            ("cant_unidad_paquete", "numeric(38,12)"), ("cant_paquete_caja", "numeric(38,12)"),
            ("cant_unidad_volumen", "numeric(38,12)"),
        ],
        "m_procedimiento": [
            ("cod_compania", "string"), ("cod_documento_transaccion", "string"),
            ("cod_procedimiento", "string"), ("cod_tipo_operacion", "string"),
        ],
    }
    _seed_bridge(spark, lake, reg_dict)
    D = Decimal
    d = dt.date(2025, 5, 3)
    pts = dt.datetime(2025, 5, 3, 7)
    spark.createDataFrame(
        [
            # two lines, same natural key → pre-aggregate (2 cajas, 12 botellas)
            ("10", "01", "AL1", "200", "N1", "C1", "A1", "P01", d,
             D("1"), D("6"), D("1"), D("0"), pts, pts),
            ("10", "01", "AL1", "200", "N1", "C1", "A1", "P01", d,
             D("1"), D("6"), D("1"), D("0"), pts, pts),
            # non-'200' document → filtered out
            ("10", "01", "AL1", "100", "N2", "C1", "A1", "P01", d,
             D("9"), D("0"), D("0"), D("0"), pts, pts),
        ],
        "cod_compania string, cod_sucursal string, cod_almacen string, "
        "cod_documento_pedido string, nro_documento_pedido string, cod_cliente string, "
        "cod_articulo string, cod_procedimiento string, fecha_pedido date, "
        "cant_paquete decimal(38,12), cant_unidad decimal(38,12), "
        "cant_paquete_asignado decimal(38,12), cant_unidad_asignado decimal(38,12), "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "t_documento_pedido_detalle", "pe01"))
    spark.createDataFrame(
        [
            # same key as the main '200' doc → anti-joined away
            ("10", "01", "AL1", "200", "N1", "C1", "A1", "P01", d,
             D("99"), D("0"), D("0"), D("0"), pts, pts),
            # promo order through the ADES channel → survives, PRO split
            ("10", "01", "AL1", "300", "N3", "C1", "A1", "P02", d,
             D("1"), D("0"), D("0"), D("0"), pts, pts),
        ],
        "cod_compania string, cod_sucursal string, cod_almacen_emisor string, "
        "cod_documento_transaccion string, nro_comprobante string, cod_cliente string, "
        "cod_articulo string, cod_procedimiento string, fecha_pedido date, "
        "cantidad_cajas decimal(38,12), cantidad_botellas decimal(38,12), "
        "cantidad_cajas_asignada decimal(38,12), cantidad_botellas_asignada decimal(38,12), "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "t_documento_pedido_ades_detalle", "pe01"))
    spark.createDataFrame(
        [("10", "A1", D("12"), D("1"), D("2"))],
        "cod_compania string, cod_articulo string, cant_unidad_paquete decimal(38,12), "
        "cant_paquete_caja decimal(38,12), cant_unidad_volumen decimal(38,12)",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_articulo", "pe01"))
    spark.createDataFrame(
        [("10", "200", "P01", "ven"), ("10", "300", "P02", "pro")],
        "cod_compania string, cod_documento_transaccion string, cod_procedimiento string, "
        "cod_tipo_operacion string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_procedimiento", "pe01"))

    res = run_waves(
        [JobConfig("domain", "t_pedido_detalle_lite", 1, periods=2)],
        DOMAIN_JOBS, _mk(spark, lake, SchemaRegistry(reg_dict)),
    )
    assert res[0].status == "succeeded", res[0].error
    rows = {r["id_pedido"]: r for r in spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_pedido_detalle")).collect()}
    assert set(rows) == {"10|01|200|N1|C1", "10|01|300|N3|C1"}   # '100' dropped,
    main = rows["10|01|200|N1|C1"]                               # dup ADES anti-joined
    assert main["id_articulo"] == "10|A1"
    # (2 cajas + 12 botellas/12) * 1 paquete_caja = 3
    assert main["cant_cajafisica_ped"] == Decimal("3.000000000000")
    # (2*12 + 12) * 2 unidad_volumen = 72
    assert main["cant_cajavolumen_ped"] == Decimal("72.000000000000")
    assert main["cant_cajafisica_ped_pro"] == Decimal("0.000000000000")  # VEN ≠ PRO
    # asignado: (2 + 0/12) * 1 = 2
    assert main["cant_cajafisica_asignado_ped"] == Decimal("2.000000000000")
    promo = rows["10|01|300|N3|C1"]
    assert promo["cant_cajafisica_ped_pro"] == Decimal("1.000000000000")
    assert promo["cant_cajafisica_ped"] == Decimal("0.000000000000")     # PRO-gated


def test_t_movimiento_inventario_detalle_direction_and_valuation(spark, lake):
    """Direction sign from the warehouse-document master, directional and
    transit splits, REV kardex fallback, package-total conversion, CPM +
    exchange-rate valuation with null on rate miss."""
    reg_dict = {
        "t_movimiento_inventario_detalle": [
            ("cod_compania", "string"), ("id_sucursal", "string"), ("id_almacen", "string"),
            ("id_articulo", "string"), ("id_movimiento_almacen", "string"),
            ("cod_procedimiento", "string"), ("cod_documento_transaccion", "string"),
            ("nro_documento_almacen", "string"), ("estado", "string"),
            ("operacion_kardex", "string"), ("fecha_almacen", "date"),
            ("cant_cajas", "numeric(38,12)"), ("cant_botellas", "numeric(38,12)"),
            ("cant_unidades", "numeric(38,12)"), ("costo_total", "numeric(38,12)"),
            ("costo_unitario", "numeric(38,12)"), ("id_centro_costo", "string"),
            ("nro_documento_movimiento", "string"), ("nro_linea_comprobante", "string"),
            ("cod_documento_transaccion_ref", "string"),
            ("nro_documento_almacen_ref", "string"), ("cod_estado_comprobante", "string"),
            ("cod_motivo", "string"), ("cod_unidad_articulo", "string"),
            ("nro_secuencia_origen", "string"), ("usuario_creacion", "string"),
            ("fecha_creacion", "timestamp"), ("usuario_modificacion", "string"),
            ("fecha_modificacion", "timestamp"),
        ],
        "m_documento_almacen": [
            ("cod_compania", "string"), ("cod_transaccion", "string"),
            ("cod_operacion_origen", "string"),
        ],
        "m_articulo": [("id_articulo", "string"), ("cant_unidad_paquete", "numeric(38,12)")],
        "t_cierre_inventario_cpm": [
            ("id_sucursal", "string"), ("id_articulo", "string"), ("id_periodo", "string"),
            ("imp_cpm", "numeric(38,12)"), ("imp_saldo_inicial", "numeric(30,4)"),
            ("imp_ingreso", "numeric(30,4)"), ("imp_salida", "numeric(30,4)"),
            ("imp_saldo_final", "numeric(30,4)"),
        ],
        "m_tipo_cambio": [
            ("cod_compania", "string"), ("fecha", "date"), ("cod_moneda", "string"),
            ("tc_compra", "numeric(38,12)"),
        ],
        "m_parametro": [("id_compania", "string"), ("cod_moneda_mn", "string")],
    }
    _seed_bridge(spark, lake, reg_dict)
    D = Decimal
    d1, d2 = dt.date(2025, 5, 3), dt.date(2025, 5, 4)
    mts = dt.datetime(2025, 5, 3, 6)
    tail = (D("10"), "CC1", "M001", "1", None, None, "APR", "MT1", "CJ", "1",
            "ana", mts, "ana", mts)
    spark.createDataFrame(
        [
            # entry: +10 cajas, +5 botellas; doc NIN, approved
            ("10", "10|01", "10|01|AL1", "10|A1", "MOV1", "ING", "NIN", "900", "APR",
             None, d1, D("10"), D("5"), D("125"), D("100"), *tail),
            # exit under REV: kardex falls back to the row's own op; in
            # transit (PLI + GRA); no exchange rate for d2 → ME null
            ("10", "10|01", "10|01|AL1", "10|A1", "MOV2", "REV", "GRA", "901", "PLI",
             "X", d2, D("4"), D("2"), D("50"), D("60"), *tail),
        ],
        "cod_compania string, id_sucursal string, id_almacen string, id_articulo string, "
        "id_movimiento_almacen string, cod_procedimiento string, "
        "cod_documento_transaccion string, nro_documento_almacen string, estado string, "
        "operacion_kardex string, fecha_almacen date, cant_cajas decimal(38,12), "
        "cant_botellas decimal(38,12), cant_unidades decimal(38,12), "
        "costo_total decimal(38,12), costo_unitario decimal(38,12), "
        "id_centro_costo string, nro_documento_movimiento string, "
        "nro_linea_comprobante string, cod_documento_transaccion_ref string, "
        "nro_documento_almacen_ref string, cod_estado_comprobante string, "
        "cod_motivo string, cod_unidad_articulo string, nro_secuencia_origen string, "
        "usuario_creacion string, fecha_creacion timestamp, "
        "usuario_modificacion string, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "t_movimiento_inventario_detalle", "pe01"))
    spark.createDataFrame(
        [("10", "ING", "S"), ("10", "REV", "R")],
        "cod_compania string, cod_transaccion string, cod_operacion_origen string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_documento_almacen", "pe01"))
    spark.createDataFrame(
        [("10|A1", D("5"))], "id_articulo string, cant_unidad_paquete decimal(38,12)"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_articulo", "pe01"))
    spark.createDataFrame(
        [("10|01", "10|A1", "202505", D("2"), D("100"), D("40"), D("50"), D("90"))],
        "id_sucursal string, id_articulo string, id_periodo string, "
        "imp_cpm decimal(38,12), imp_saldo_inicial decimal(30,4), "
        "imp_ingreso decimal(30,4), imp_salida decimal(30,4), "
        "imp_saldo_final decimal(30,4)",
    ).write.parquet(lake.table_path(Layer.STAGE, "t_cierre_inventario_cpm", "pe01"))
    spark.createDataFrame(
        [("10", d1, "PEN", D("4"))],
        "cod_compania string, fecha date, cod_moneda string, tc_compra decimal(38,12)",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_tipo_cambio", "pe01"))
    spark.createDataFrame(
        [("10", "PEN")], "id_compania string, cod_moneda_mn string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_parametro", "pe01"))

    res = run_waves(
        [JobConfig("domain", "t_movimiento_inventario_detalle_lite", 1, periods=2)],
        DOMAIN_JOBS, _mk(spark, lake, SchemaRegistry(reg_dict)),
    )
    assert res[0].status == "succeeded", res[0].error
    rows = {r["id_movimiento_almacen"]: r for r in spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "t_movimiento_inventario_detalle")).collect()}
    entry = rows["MOV1"]
    assert entry["cant_cajafisica"] == Decimal("10.000000000000")         # +S
    assert entry["cant_cajafisica_total"] == Decimal("11.000000000000")   # 10 + 5/5
    assert entry["cant_cajafisica_ingresada"] == Decimal("10.000000000000")
    assert entry["cant_cajafisica_salida"] == Decimal("0.000000000000")
    assert entry["cod_operacion_kardex"] == "S"
    assert entry["cant_unidades_transito"] == Decimal("0.000000000000")   # APR, not PLI
    assert entry["precio_unitario_mn"] == Decimal("2.000000000000")       # CPM
    assert entry["precio_unitario_me"] == Decimal("0.500000000000")       # 2 / 4
    assert entry["imp_valorizado_mn"] == Decimal("20.000000000000")       # 10 * 2
    assert entry["imp_valorizado_me"] == Decimal("5.000000000000")        # 20 / 4
    exit_ = rows["MOV2"]
    assert exit_["cant_cajafisica"] == Decimal("-4.000000000000")         # −R
    assert exit_["cant_cajafisica_total"] == Decimal("-4.400000000000")   # −4 − 2/5
    assert exit_["cant_cajafisica_salida"] == Decimal("4.000000000000")
    assert exit_["imp_total_salida"] == Decimal("60.000000000000")
    assert exit_["cod_operacion_kardex"] == "X"                           # REV fallback
    assert exit_["cant_unidades_transito"] == Decimal("50.000000000000")  # PLI + GRA
    assert exit_["imp_total_transito"] == Decimal("60.000000000000")
    assert exit_["precio_unitario_me"] is None                            # no rate row
    assert exit_["imp_valorizado_me"] is None


def test_dim_sucursal_company_denormalization(spark, lake):
    reg = SchemaRegistry({
        "m_sucursal": [
            ("id_sucursal", "string"), ("id_pais", "string"), ("id_compania", "string"),
            ("cod_sucursal", "string"), ("nomb_sucursal", "string"),
            ("cod_tipo_sucursal", "string"),
        ],
        "m_pais": [("id_pais", "string"), ("cod_pais", "string"), ("desc_pais", "string")],
        "m_compania": [
            ("id_compania", "string"), ("id_pais", "string"), ("cod_compania", "string"),
            ("nomb_compania", "string"), ("cod_tipo_compania", "string"),
        ],
    })
    spark.createDataFrame(
        [("10|01", "PE", "10", "01", "SUC LIMA", None)],
        "id_sucursal string, id_pais string, id_compania string, cod_sucursal string, "
        "nomb_sucursal string, cod_tipo_sucursal string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_sucursal"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_pais"))
    spark.createDataFrame(
        [("10", "PE", "10", "AJE", None)],
        "id_compania string, id_pais string, cod_compania string, nomb_compania string, "
        "cod_tipo_compania string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_compania"))

    _run_analytics(spark, lake, reg, "dim_sucursal_lite")
    r = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "dim_sucursal")).collect()[0]
    assert r["id_sucursal"] == "10|01"
    assert r["nomb_compania"] == "AJE"                 # denormalized company
    assert r["nomb_sucursal"] == "SUC LIMA"
    assert r["cod_tipo_sucursal"] is None


def test_fact_reparto_detalle_two_left_joins(spark, lake):
    """Fulfillment lines keep NULL carrier columns when no delivery
    matched; order attributes arrive via the pedido LEFT join."""
    qty = [
        f"cant_cajavolumen_{n}{s}" if vol else f"cant_cajafisica_{n}{s}"
        for n in ("ped", "asignado_ped", "desp")
        for s in ("", "_pro")
        for vol in (False, True)
    ] + ["cant_caja_fisica_ven", "cant_caja_volumen_ven",
         "cant_caja_fisica_pro", "cant_caja_volumen_pro"]
    reg = SchemaRegistry({
        "t_pedido_cumplimiento": [
            ("id_pais", "string"), ("id_periodo", "string"), ("id_sucursal", "string"),
            ("id_pedido", "string"), ("id_producto", "string"), ("id_reparto", "string"),
            ("fecha_liquidacion", "date"),
            *[(c, "numeric(38,12)") for c in qty],
            ("cod_zona", "string"), ("cod_ruta", "string"),
            ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp"),
        ],
        "t_pedido": [
            ("id_pedido", "string"), ("id_cliente", "string"), ("cod_cliente", "string"),
            ("id_origen_pedido", "string"), ("id_tipo_pedido", "string"),
            ("id_fuerza_venta", "string"), ("id_vendedor", "string"),
            ("id_lista_precio", "string"), ("id_forma_pago", "string"),
            ("desc_region", "string"), ("desc_subregion", "string"),
            ("desc_division", "string"), ("cod_zona", "string"), ("cod_ruta", "string"),
            ("cod_modulo", "string"), ("nro_pedido_ref", "string"),
            ("nro_pedido", "string"), ("fecha_pedido", "date"), ("fecha_entrega", "date"),
        ],
        "t_reparto": [
            ("id_reparto", "string"), ("id_transportista", "string"), ("id_chofer", "string"),
            ("id_medio_transporte", "string"), ("fecha_orden_carga", "date"),
            ("fecha_reparto", "date"), ("estado_guia", "string"),
        ],
    })
    D = Decimal
    d = dt.date(2025, 5, 3)
    ts = dt.datetime(2025, 5, 3, 8)

    def _cum(producto, reparto, ped, desp):
        row = {"id_pais": "PE", "id_periodo": "202505", "id_sucursal": "10|01",
               "id_pedido": "10|01|200|P1|C1", "id_producto": producto,
               "id_reparto": reparto, "fecha_liquidacion": d,
               "cod_zona": "Z1", "cod_ruta": "R1",
               "fecha_creacion": ts, "fecha_modificacion": ts}
        row.update({c: D("0") for c in qty})
        row["cant_cajafisica_ped"] = D(ped)
        row["cant_cajafisica_desp"] = D(desp)
        return row

    ddl = ("id_pais string, id_periodo string, id_sucursal string, id_pedido string, "
           "id_producto string, id_reparto string, fecha_liquidacion date, "
           + ", ".join(f"{c} decimal(38,12)" for c in qty)
           + ", cod_zona string, cod_ruta string, fecha_creacion timestamp, "
           "fecha_modificacion timestamp")
    spark.createDataFrame(
        [_cum("A1", "10|01|AL1|GRA|900", "10", "7"), _cum("A2", None, "5", "0")], ddl
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido_cumplimiento"))
    spark.createDataFrame(
        [("10|01|200|P1|C1", "10|C1", "C1", "10|OR1", "10|TP1", "10|01|F1", "10|V9",
          "10|LP1", "10|CP1", "REGION NORTE", "SUBREGION DEFAULT", None, "Z1", "R1",
          "M1", "SF1", "P1|C1", d, d)],
        "id_pedido string, id_cliente string, cod_cliente string, id_origen_pedido string, "
        "id_tipo_pedido string, id_fuerza_venta string, id_vendedor string, "
        "id_lista_precio string, id_forma_pago string, desc_region string, "
        "desc_subregion string, desc_division string, cod_zona string, cod_ruta string, "
        "cod_modulo string, nro_pedido_ref string, nro_pedido string, "
        "fecha_pedido date, fecha_entrega date",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido"))
    spark.createDataFrame(
        [("10|01|AL1|GRA|900", "10|T1", "10|CH1", "10|V01", d, d, "LIQ")],
        "id_reparto string, id_transportista string, id_chofer string, "
        "id_medio_transporte string, fecha_orden_carga date, fecha_reparto date, "
        "estado_guia string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_reparto"))

    res = run_waves(
        [JobConfig("analytics", "fact_reparto_detalle_lite", 1, periods=2)],
        ANALYTICS_JOBS, _mk(spark, lake, reg),
    )
    assert res[0].status == "succeeded", res[0].error
    rows = {r["id_producto"]: r for r in spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_reparto_detalle")).collect()}
    a1 = rows["A1"]
    assert a1["id_transportista"] == "10|T1"           # delivery matched
    assert a1["estado_guia"] == "LIQ"
    assert a1["id_cliente"] == "10|C1"                 # via pedido left join
    assert a1["id_vendedor"] == "10|V9"
    assert a1["desc_region"] == "REGION NORTE"
    assert a1["nro_pedido"] == "P1|C1"
    assert a1["cant_cajafisica_ped"] == Decimal("10.000000000000")
    # fecha_reparto serves twice (movimiento + almacen, reference :56-58)
    assert a1["fecha_movimiento_inventario"] == d and a1["fecha_almacen"] == d
    a2 = rows["A2"]
    assert a2["id_transportista"] is None              # undispatched line
    assert a2["fecha_almacen"] is None
    assert a2["cant_cajafisica_desp"] == Decimal("0.000000000000")
