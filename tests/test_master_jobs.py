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
        [("10|01|F1|R1|M1", "10", "01", "F1", "R1", "M1", "MODULO NORTE")],
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
    reg = SchemaRegistry({
        "t_pedido_cumplimiento": [
            ("id_pedido", "string"), ("id_reparto", "string"), ("id_producto", "string"),
            ("cod_cliente", "string"), ("cod_zona", "string"), ("cod_ruta", "string"),
            ("fecha_pedido", "date"), ("id_periodo", "string"),
            ("cant_pedida", "decimal(38,12)"), ("cant_despachada", "decimal(38,12)"),
        ],
        "t_pedido": [
            ("id_pedido", "string"), ("cod_cliente", "string"), ("fecha_pedido", "date"),
        ],
        "t_reparto": [
            ("id_reparto", "string"), ("id_transportista", "string"), ("id_chofer", "string"),
            ("id_medio_transporte", "string"), ("fecha_orden_carga", "date"),
            ("fecha_reparto", "date"), ("estado_guia", "string"),
        ],
    })
    D = Decimal
    d = dt.date(2025, 5, 3)
    spark.createDataFrame(
        [
            ("10|01|AL1|200|P1", "10|01|AL1|GRA|900", "A1", "C1", "Z1", "R1", d, "202505",
             D("10"), D("7")),
            ("10|01|AL1|200|P1", None, "A2", "C1", "Z1", "R1", d, "202505", D("5"), D("0")),
        ],
        "id_pedido string, id_reparto string, id_producto string, cod_cliente string, "
        "cod_zona string, cod_ruta string, fecha_pedido date, id_periodo string, "
        "cant_pedida decimal(38,12), cant_despachada decimal(38,12)",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido_cumplimiento"))
    spark.createDataFrame(
        [("10|01|AL1|200|P1", "C1", d)],
        "id_pedido string, cod_cliente string, fecha_pedido date",
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
    assert a1["cod_cliente"] == "C1"                   # via pedido left join
    assert a1["cant_cajafisica_ped"] == Decimal("10.000000000000")
    a2 = rows["A2"]
    assert a2["id_transportista"] is None              # undispatched line
    assert a2["fecha_reparto"] is None
    assert a2["cant_cajafisica_desp"] == Decimal("0.000000000000")
