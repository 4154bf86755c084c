"""Analytics-layer tests: currency resolution cases, priority-ladder dim
dedup, domain→analytics two-layer orchestration."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core.catalog import Layer
from cdk_datalake_analytics_comercial_spark.functions.currency import (
    exchange_rate_me,
    exchange_rate_mn,
)
from cdk_datalake_analytics_comercial_spark.jobs import ANALYTICS_JOBS
from cdk_datalake_analytics_comercial_spark.runner import JobConfig, JobContext, run_waves
from cdk_datalake_analytics_comercial_spark.sources.registry import SchemaRegistry

AS_OF = dt.date(2025, 5, 15)

ONE = Decimal("1.000000")


def test_exchange_rates_all_cases(spark):
    rows = [
        # (cod_moneda, moneda_mn, tc_venta, embedded_mn, embedded_me, case)
        ("PEN", "PEN", Decimal("3.75"), Decimal("9.9"), Decimal("9.9"), "local"),
        ("USD", "PEN", Decimal("3.75"), Decimal("9.9"), Decimal("9.9"), "usd"),
        ("DOL", "PEN", None, Decimal("3.5"), Decimal("0"), "dol_no_rate"),
        ("EUR", "PEN", Decimal("4.10"), Decimal("9.9"), Decimal("9.9"), "third"),
        ("EUR", "PEN", None, Decimal("4.05"), Decimal("0"), "third_no_rate"),
    ]
    df = spark.createDataFrame(
        rows,
        "cod_moneda string, moneda_mn string, tc_venta decimal(12,6), "
        "emb_mn decimal(12,6), emb_me decimal(12,6), caso string",
    )
    out = {
        r["caso"]: (r["mn"], r["me"])
        for r in df.select(
            "caso",
            exchange_rate_mn(
                F.col("cod_moneda"), F.col("moneda_mn"), F.col("tc_venta"), F.col("emb_mn")
            ).alias("mn"),
            exchange_rate_me(
                F.col("cod_moneda"), F.col("tc_venta"), F.col("emb_me")
            ).alias("me"),
        ).collect()
    }
    assert out["local"] == (ONE, Decimal("3.75"))          # local: mn=1, me=day rate
    assert out["usd"] == (Decimal("3.75"), ONE)            # USD doc: me=1
    assert out["dol_no_rate"] == (Decimal("3.5"), ONE)     # fallback embedded; me 1 (DOL)
    assert out["third"] == (Decimal("4.10"), Decimal("4.10"))
    assert out["third_no_rate"] == (Decimal("4.05"), ONE)  # embedded 0 sentinel → 1


def _registry():
    return SchemaRegistry(
        {
            "m_cliente": [
                ("id_cliente", "string"),
                ("id_pais", "string"),
                ("nomb_cliente", "string"),
                ("id_sucursal", "string"),
                ("id_clasificacion_cliente", "string"),
                ("id_eje_territorial", "string"),
                ("id_lista_precio", "string"),
                ("cod_cliente", "string"),
                ("cod_segmento", "string"),
                ("desc_subsegmento", "string"),
                ("cod_cliente_ref", "string"),
                ("cod_cliente_ref2", "string"),
                ("cod_cliente_ref3", "string"),
                ("cod_cliente_ref4", "string"),
                ("cod_tipo_cliente", "string"),
                ("cod_cuenta_clave", "string"),
                ("nomb_cuenta_clave", "string"),
                ("desc_canal_local", "string"),
                ("desc_giro_local", "string"),
                ("direccion", "string"),
                ("nro_documento", "string"),
                ("cod_cliente_principal", "string"),
                ("cod_cliente_transferencia", "string"),
                ("coord_x", "string"),
                ("coord_y", "string"),
                ("fecha_creacion", "timestamp"),
                ("fecha_baja", "date"),
                ("estado", "string"),
            ],
            "m_eje_territorial": [
                ("id_eje_territorial", "string"),
                ("cod_eje_territorial", "string"),
            ],
            "m_asignacion_modulo": [
                ("id_cliente", "string"),
                ("id_modulo", "string"),
                ("frecuencia_visita", "string"),
                ("periodo_visita", "string"),
                ("es_activo", "int"),
                ("es_eliminado", "int"),
            ],
            "m_modulo": [
                ("id_modulo", "string"),
                ("id_modelo_atencion", "string"),
                ("fecha_creacion", "timestamp"),
            ],
            "m_modelo_atencion": [
                ("id_modelo_atencion", "string"),
                ("desc_modelo_atencion", "string"),
            ],
            "t_venta": [
                ("id_venta", "string"),
                ("id_pais", "string"),
                ("id_periodo", "string"),
                ("cod_cliente", "string"),
                ("imp_venta", "numeric(38,12)"),
                ("es_eliminado", "int"),
            ],
        }
    )


def _seed_domain(spark, lake):
    ts = dt.datetime(2025, 4, 1)
    def _cli(cid, nomb, eje):
        return {"id_cliente": cid, "id_pais": "PE", "nomb_cliente": nomb,
                "id_sucursal": "10|01", "id_clasificacion_cliente": "10|SG|SG1",
                "id_eje_territorial": eje, "id_lista_precio": "10|LP1",
                "cod_cliente": cid.split("|")[1], "cod_tipo_cliente": "A",
                "direccion": "AV 1", "nro_documento": "123",
                "cod_cliente_principal": "0", "coord_x": "x", "coord_y": "y",
                "fecha_creacion": ts, "estado": "T"}
    clientes = spark.createDataFrame(
        [_cli("10|C1", "CLIENTE UNO", "PE|15074"), _cli("10|C2", "CLIENTE DOS", None)],
        "id_cliente string, id_pais string, nomb_cliente string, "
        "id_sucursal string, id_clasificacion_cliente string, "
        "id_eje_territorial string, id_lista_precio string, cod_cliente string, "
        "cod_segmento string, desc_subsegmento string, cod_cliente_ref string, "
        "cod_cliente_ref2 string, cod_cliente_ref3 string, cod_cliente_ref4 string, "
        "cod_tipo_cliente string, cod_cuenta_clave string, nomb_cuenta_clave string, "
        "desc_canal_local string, desc_giro_local string, direccion string, "
        "nro_documento string, cod_cliente_principal string, "
        "cod_cliente_transferencia string, coord_x string, coord_y string, "
        "fecha_creacion timestamp, fecha_baja date, estado string",
    )
    eje = spark.createDataFrame(
        [("PE|15074", "15074")],
        "id_eje_territorial string, cod_eje_territorial string",
    )
    asign = spark.createDataFrame(
        [
            # C1: Televenta (prio 4) module newer, Pre Venta (prio 1) → Pre Venta wins
            ("10|C1", "M1", "S1", "P1", 1, 0),
            ("10|C1", "M2", "S2", "P2", 1, 0),
            # C1: inactive Especializado must be ignored
            ("10|C1", "M3", "S3", "P3", 0, 0),
            # C2: no assignment rows at all (left join → nulls)
        ],
        "id_cliente string, id_modulo string, frecuencia_visita string, "
        "periodo_visita string, es_activo int, es_eliminado int",
    )
    modulos = spark.createDataFrame(
        [("M1", "MA_TV", ts), ("M2", "MA_PV", ts - dt.timedelta(days=9)),
         ("M3", "MA_ESP", ts)],
        "id_modulo string, id_modelo_atencion string, fecha_creacion timestamp",
    )
    modelos = spark.createDataFrame(
        [("MA_TV", "Televenta"), ("MA_PV", "Pre Venta"), ("MA_ESP", "Especializado")],
        "id_modelo_atencion string, desc_modelo_atencion string",
    )
    ventas = spark.createDataFrame(
        [
            ("V1", "PE", "202504", "C1", Decimal("100"), 0),
            ("V2", "PE", "202504", "C1", Decimal("50"), 0),
            ("V3", "PE", "202504", "C1", Decimal("999"), 1),  # soft-deleted
            ("V4", "PE", "202505", "C2", Decimal("70"), 0),
        ],
        "id_venta string, id_pais string, id_periodo string, cod_cliente string, "
        "imp_venta decimal(38,12), es_eliminado int",
    )
    clientes.write.parquet(lake.table_path(Layer.DOMAIN, "m_cliente"))
    eje.write.parquet(lake.table_path(Layer.DOMAIN, "m_eje_territorial"))
    asign.write.parquet(lake.table_path(Layer.DOMAIN, "m_asignacion_modulo"))
    modulos.write.parquet(lake.table_path(Layer.DOMAIN, "m_modulo"))
    modelos.write.parquet(lake.table_path(Layer.DOMAIN, "m_modelo_atencion"))
    ventas.write.partitionBy("id_pais", "id_periodo").parquet(
        lake.table_path(Layer.DOMAIN, "t_venta")
    )


def _ctx_factory(spark, lake):
    def mk(cfg: JobConfig) -> JobContext:
        return JobContext(
            spark=spark, catalog=lake, registry=_registry(), config=cfg, as_of=AS_OF
        )

    return mk


def test_analytics_layer_run(spark, lake):
    _seed_domain(spark, lake)
    cfgs = [
        JobConfig("analytics", "dim_cliente_lite", exe_order=1),
        JobConfig("analytics", "fact_venta_resumen", exe_order=1),
    ]
    results = run_waves(cfgs, ANALYTICS_JOBS, _ctx_factory(spark, lake))
    assert all(r.status == "succeeded" for r in results), results

    dim = {r["id_cliente"]: r for r in spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "dim_cliente")).collect()}
    assert dim["10|C1"]["modelo_atencion"] == "Pre Venta"  # priority ladder
    assert dim["10|C1"]["id_estructura_comercial"] == "M2"
    assert dim["10|C2"]["id_estructura_comercial"] is None  # left join preserved
    assert dim["10|C1"]["cod_eje_territorial"] == "15074"  # territorial resolve
    assert dim["10|C2"]["cod_eje_territorial"] is None
    assert dim["10|C1"]["periodo_visita"] == "P2"
    assert dim["10|C1"]["coordx"] == "x"

    fact = {(r["id_periodo"], r["cod_cliente"]): r for r in spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_resumen")).collect()}
    assert fact[("202504", "C1")]["n_documentos"] == 2      # soft-delete excluded
    assert fact[("202504", "C1")]["imp_venta"] == Decimal("150.000000000000")
    assert fact[("202505", "C2")]["n_documentos"] == 1


def test_domain_then_analytics_chain(spark, lake):
    """The reference's orchestration shape (stack _build_orchestration_
    definition: domain SM then analytics SM) as two engine runs sharing one
    catalog: stage fixtures → domain jobs → analytics jobs."""
    from cdk_datalake_analytics_comercial_spark.jobs import DOMAIN_JOBS
    from test_runner_jobs import make_ctx, registry as stage_registry, seed_stage

    seed_stage(spark, lake)
    # worker sizing straight from the reference's config shape (masters
    # G.1X x2, facts wider) and size_jobs=True: the chain must produce
    # identical results under per-job sized sessions
    domain_cfgs = [
        JobConfig("domain", "m_pais", 1, worker_type="G.1X", num_workers=2),
        JobConfig("domain", "m_compania", 1, worker_type="G.1X", num_workers=2),
        JobConfig(
            "domain", "t_venta_lite", 2, periods=3,
            worker_type="G.1X", num_workers=4,
        ),
    ]
    dr = run_waves(domain_cfgs, DOMAIN_JOBS, make_ctx(spark, lake), size_jobs=True)
    assert all(r.status == "succeeded" for r in dr), dr

    ar = run_waves(
        [JobConfig("analytics", "fact_venta_resumen", 1, worker_type="G.2X", num_workers=4)],
        ANALYTICS_JOBS,
        _ctx_factory(spark, lake),
        size_jobs=True,
    )
    assert all(r.status == "succeeded" for r in ar), ar
    fact = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "fact_venta_resumen"))
    rows = {(r["id_periodo"], r["cod_cliente"]): r["imp_venta"] for r in fact.collect()}
    # from seed_stage: C1 202505 (100.5, active), C3 202503 (-10, active);
    # C2's doc is anulled (002 → es_eliminado=1) and must not aggregate
    assert rows == {
        ("202505", "C1"): Decimal("100.500000000000"),
        ("202503", "C3"): Decimal("-10.000000000000"),
    }


def test_fact_cliente_venta_rolling(spark, lake):
    """Full fact_cliente_venta surface: venta⋈detalle⋈dim_producto monthly
    base, 3m AND 12m rangeBetween rollups honoring calendar gaps, A3
    countDistincts, recency vs the injected clock, and the vestigial _nn
    branch landing NULL (cod_unidad_negocio is a placeholder upstream)."""
    D = Decimal
    ventas = [
        ("V1", "PE", "202501", "10", "10|C1", "M1", 0, dt.date(2025, 1, 10)),
        ("V2", "PE", "202502", "10", "10|C1", "M1", 0, dt.date(2025, 2, 10)),
        ("V3", "PE", "202503", "10", "10|C1", "M1", 0, dt.date(2025, 3, 10)),
        ("V4", "PE", "202505", "10", "10|C1", "M1", 0, dt.date(2025, 5, 10)),  # gap: 202504
        ("V5", "PE", "202505", "10", "10|C2", "M1", 0, dt.date(2025, 5, 1)),
        ("V6", "PE", "202505", "10", "10|C2", "M1", 1, dt.date(2025, 5, 2)),   # soft-deleted
    ]
    spark.createDataFrame(
        ventas,
        "id_venta string, id_pais string, id_periodo string, cod_compania string, "
        "id_cliente string, cod_modulo string, es_eliminado int, fecha_liquidacion date",
    ).write.partitionBy("id_pais", "id_periodo").parquet(
        lake.table_path(Layer.DOMAIN, "t_venta")
    )

    def line(vid, periodo, producto, fisica, volumen, neto):
        return (vid, "PE", periodo, producto, D(fisica), D(volumen), D("0"), D("0"),
                D(neto), D("1"), D(neto), D("1"))

    spark.createDataFrame(
        [
            line("V1", "202501", "A1", "1", "30", "10"),
            line("V2", "202502", "A1", "2", "60", "20"),
            line("V3", "202503", "A2", "3", "90", "30"),
            line("V4", "202505", "A1", "5", "150", "50"),
            # V4 has TWO lines of different products/brands → countDistincts
            line("V4", "202505", "A2", "1", "30", "5"),
            line("V5", "202505", "A1", "7", "210", "7"),
            line("V6", "202505", "A1", "8", "240", "8"),   # header soft-deleted
        ],
        "id_venta string, id_pais string, id_periodo string, id_producto string, "
        "cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12), "
        "cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12), "
        "imp_neto_vta_mn decimal(38,12), imp_neto_vta_me decimal(38,12), "
        "imp_cobrar_vta_mn decimal(38,12), imp_cobrar_vta_me decimal(38,12)",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_venta_detalle"))
    spark.createDataFrame(
        [("A1", "CIELO", None), ("A2", "VOLT", None)],
        "id_producto string, desc_marca string, cod_unidad_negocio string",
    ).write.parquet(lake.table_path(Layer.ANALYTICS, "dim_producto"))
    reg = SchemaRegistry({
        "t_venta": [
            ("id_venta", "string"), ("id_pais", "string"), ("id_periodo", "string"),
            ("cod_compania", "string"), ("id_cliente", "string"), ("cod_modulo", "string"),
            ("es_eliminado", "int"), ("fecha_liquidacion", "date"),
        ],
        "t_venta_detalle": [
            ("id_venta", "string"), ("id_pais", "string"), ("id_periodo", "string"),
            ("id_producto", "string"),
            ("cant_caja_fisica_ven", "numeric(38,12)"),
            ("cant_caja_volumen_ven", "numeric(38,12)"),
            ("cant_caja_fisica_pro", "numeric(38,12)"),
            ("cant_caja_volumen_pro", "numeric(38,12)"),
            ("imp_neto_vta_mn", "numeric(38,12)"), ("imp_neto_vta_me", "numeric(38,12)"),
            ("imp_cobrar_vta_mn", "numeric(38,12)"), ("imp_cobrar_vta_me", "numeric(38,12)"),
        ],
        "dim_producto": [
            ("id_producto", "string"), ("desc_marca", "string"),
            ("cod_unidad_negocio", "string"),
        ],
    })

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves(
        [JobConfig("analytics", "fact_cliente_venta_lite", 1, periods=100)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    fact = {
        (r["id_periodo"], r["id_cliente"]): r
        for r in spark.read.parquet(
            lake.table_path(Layer.ANALYTICS, "fact_cliente_venta")).collect()
    }
    c1_0503 = fact[("202503", "10|C1")]
    # trailing 3m window covers 202412..202503 → neto 10+20+30
    assert c1_0503["imp_neto_mn_3meses"] == Decimal("60.000000000000")
    c1_0505 = fact[("202505", "10|C1")]
    # window 202502..202505 (202504 absent) → 20+30+50+5
    assert c1_0505["imp_neto_mn_3meses"] == Decimal("105.000000000000")
    # 12m window reaches back to 202501 → all of C1
    assert c1_0505["imp_neto_mn_12meses"] == Decimal("115.000000000000")
    assert c1_0505["cant_caja_fisica_ven_3meses"] == Decimal("11.000000000000")
    # /30 unit-case conversion: volumen 60+90+150+30 → /30 = 11
    assert c1_0505["cant_caja_unitaria_ven_3meses"] == Decimal("11.000000000000")
    # A3 countDistincts over the CURRENT month: 2 products, 2 brands, 1 venta
    assert c1_0505["cant_producto"] == 2
    assert c1_0505["cant_marca"] == 2
    assert c1_0505["cant_venta"] == 1
    # soft-deleted V6 excluded from C2's month
    c2 = fact[("202505", "10|C2")]
    assert c2["imp_neto_mn_3meses"] == Decimal("7.000000000000")
    # recency vs injected clock (2025-05-15), not wall clock
    assert c2["ult_dia_compra_cliente"] == 14
    # vestigial _nn branch: placeholder cod_unidad_negocio → NULL columns
    assert c2["cant_venta_nn"] is None and c2["imp_neto_mn_3meses_nn"] is None


def test_fact_kpi_full_outer_all_cases(spark, lake):
    """Double full-outer stitch at line grain (fact_kpi_detalle.py): ordered
    +sold, ordered-only, sold-only (order header without that line), and a
    visit that matched nothing — with the reference's id_visita → id_pedido
    and fecha_pedido → fecha_visita fallbacks."""
    D = Decimal
    reg = SchemaRegistry({
        "t_pedido": [
            ("id_pedido", "string"), ("id_pais", "string"), ("id_periodo", "string"),
            ("id_sucursal", "string"), ("id_cliente", "string"),
            ("cod_tipo_documento_pedido", "string"), ("id_vendedor", "string"),
            ("id_supervisor", "string"), ("id_fuerza_venta", "string"),
            ("id_modelo_atencion", "string"), ("id_origen_pedido", "string"),
            ("fecha_pedido", "date"), ("cod_tipo_atencion", "string"),
            ("id_visita", "string"),
        ],
        "t_pedido_detalle": [
            ("id_pedido", "string"), ("id_periodo", "string"), ("id_articulo", "string"),
        ],
        "t_venta": [
            ("id_venta", "string"), ("id_pedido", "string"), ("id_pais", "string"),
            ("id_periodo", "string"), ("id_sucursal", "string"), ("id_cliente", "string"),
            ("id_tipo_venta", "string"), ("cod_documento_venta", "string"),
            ("es_eliminado", "int"),
        ],
        "t_venta_detalle": [
            ("id_venta", "string"), ("id_producto", "string"),
            ("cant_caja_fisica_ven", "numeric(38,12)"),
            ("cant_caja_volumen_ven", "numeric(38,12)"),
            ("cant_caja_fisica_pro", "numeric(38,12)"),
            ("cant_caja_volumen_pro", "numeric(38,12)"),
            ("imp_neto_vta_mn", "numeric(38,12)"), ("imp_neto_vta_me", "numeric(38,12)"),
            ("imp_bruto_vta_mn", "numeric(38,12)"), ("imp_bruto_vta_me", "numeric(38,12)"),
        ],
        "t_visita": [
            ("id_visita", "string"), ("id_pais", "string"), ("id_periodo", "string"),
            ("id_sucursal", "string"), ("id_cliente", "string"), ("fecha_visita", "date"),
        ],
        "m_tipo_venta": [("id_tipo_venta", "string"), ("cod_tipo_operacion", "string")],
    })
    d = dt.date(2025, 5, 2)
    spark.createDataFrame(
        [
            ("P1", "PE", "202505", "10|01", "10|C1", "200", "10|V9", None, "10|01|F1",
             None, "10|OR1", d, None, None),
            # non-'200' order must be gated out of BOTH sides
            ("P8", "PE", "202505", "10|01", "10|C8", "100", "10|V9", None, "10|01|F1",
             None, "10|OR1", d, None, None),
        ],
        "id_pedido string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, cod_tipo_documento_pedido string, id_vendedor string, "
        "id_supervisor string, id_fuerza_venta string, id_modelo_atencion string, "
        "id_origen_pedido string, fecha_pedido date, cod_tipo_atencion string, "
        "id_visita string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido"))
    spark.createDataFrame(
        # P1 ordered A1 (also sold) and A2 (never sold); P8's line is gated
        [("P1", "202505", "A1"), ("P1", "202505", "A2"), ("P8", "202505", "A8")],
        "id_pedido string, id_periodo string, id_articulo string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido_detalle"))
    spark.createDataFrame(
        [("V1", "P1", "PE", "202505", "10|01", "10|C1", "TV1", "FAC", 0)],
        "id_venta string, id_pedido string, id_pais string, id_periodo string, "
        "id_sucursal string, id_cliente string, id_tipo_venta string, "
        "cod_documento_venta string, es_eliminado int",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_venta"))
    spark.createDataFrame(
        # A1: matches the ordered line; A3: sold without an ordered line
        [("V1", "A1", D("7"), D("60"), D("2"), D("30"), D("200"), D("25"),
          D("220"), D("27.5")),
         ("V1", "A3", D("1"), D("30"), D("0"), D("0"), D("10"), D("2"),
          D("11"), D("2.2"))],
        "id_venta string, id_producto string, cant_caja_fisica_ven decimal(38,12), "
        "cant_caja_volumen_ven decimal(38,12), cant_caja_fisica_pro decimal(38,12), "
        "cant_caja_volumen_pro decimal(38,12), imp_neto_vta_mn decimal(38,12), "
        "imp_neto_vta_me decimal(38,12), imp_bruto_vta_mn decimal(38,12), "
        "imp_bruto_vta_me decimal(38,12)",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_venta_detalle"))
    spark.createDataFrame(
        [("VIS1", "PE", "202505", "10|01", "10|C5", dt.date(2025, 5, 9))],
        "id_visita string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, fecha_visita date",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_visita"))
    spark.createDataFrame(
        [("TV1", "VEN"), ("TV9", "DES")],
        "id_tipo_venta string, cod_tipo_operacion string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_tipo_venta"))

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves([JobConfig("analytics", "fact_kpi_lite", 1)], ANALYTICS_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    rows = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "fact_kpi_detalle")).collect()
    by_line = {(r["id_visita"], r["id_producto"]): r for r in rows}
    # 2 ordered lines + 1 sold-only line + 1 unmatched visit, P8 gated out
    assert len(rows) == 4
    both = by_line[("P1", "A1")]
    assert both["cant_cajafisica_vta"] == Decimal("7")
    assert both["cant_cajaunitaria_vta"] == Decimal("2")     # 60 / 30
    assert both["imp_neto_vta_mn"] == Decimal("200")
    assert both["id_cliente"] == "10|C1" and both["id_vendedor"] == "10|V9"
    ordered_only = by_line[("P1", "A2")]
    assert ordered_only["cant_cajafisica_vta"] is None
    assert ordered_only["id_origen_pedido"] == "10|OR1"
    sold_only = by_line[("P1", "A3")]
    assert sold_only["cant_cajafisica_vta"] == Decimal("1")
    assert sold_only["id_vendedor"] is None                   # no pedido line
    assert sold_only["id_cliente"] == "10|C1"                 # venta side fills
    visit_only = by_line[("VIS1", None)]
    assert visit_only["id_cliente"] == "10|C5"
    assert visit_only["id_cliente_visita"] == "10|C5"
    assert visit_only["fecha_pedido"] == dt.date(2025, 5, 9)  # fecha_visita fallback
    # resumen rows fall back id_visita → id_pedido (reference :156)
    assert both["id_visita"] == "P1"


def test_dim_estructura_flatten_from_domain_job(spark, lake):
    """Chain: m_estructura_comercial domain job builds the adjacency; the
    analytics flatten walks a module's parent pointers (ruta → zona, higher
    levels absent → NULL) with the per-level responsables resolved."""
    from cdk_datalake_analytics_comercial_spark.jobs import DOMAIN_JOBS
    from test_runner_jobs import registry as _unused  # noqa: F401

    reg = SchemaRegistry({
        "m_ruta": [("cod_compania", "string"), ("cod_sucursal", "string"),
                    ("cod_fuerza_venta", "string"), ("cod_ruta", "string"),
                    ("cod_zona", "string"), ("cod_vendedor", "string"),
                    ("desc_ruta", "string"), ("es_activo", "string")],
        "m_zona": [("cod_compania", "string"), ("cod_sucursal", "string"),
                    ("cod_zona", "string"), ("cod_region", "string"),
                    ("cod_subregion", "string"), ("cod_centro_distribucion", "string"),
                    ("cod_supervisor", "string"), ("desc_zona", "string"),
                    ("es_activo", "string")],
        "m_division": [("cod_compania", "string"), ("cod_division", "string"),
                        ("desc_division", "string"), ("cod_jefe_venta", "string"),
                        ("es_activo", "string")],
        "m_subregion": [("cod_pais", "string"), ("cod_region", "string"),
                         ("cod_subregion", "string"), ("desc_subregion", "string"),
                         ("es_activo", "string")],
        "m_region": [("cod_pais", "string"), ("cod_region", "string"),
                      ("desc_region", "string"), ("es_activo", "string")],
        "m_compania": [("cod_compania", "string"), ("cod_pais", "string"),
                        ("desc_compania", "string"), ("es_activo", "string"),
                        ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp")],
        "m_pais": [("id_pais", "string"), ("cod_pais", "string"), ("desc_pais", "string")],
        "m_estructura_comercial": [
            ("id_estructura_comercial", "string"), ("id_pais", "string"),
            ("id_sucursal", "string"), ("id_estructura_comercial_padre", "string"),
            ("id_responsable_comercial", "string"), ("cod_estructura_comercial", "string"),
            ("nomb_estructura_comercial", "string"), ("cod_tipo_estructura_comercial", "string"),
            ("estado", "string"), ("fecha_creacion", "date"),
        ],
        "m_modulo": [
            ("id_modulo", "string"), ("id_pais", "string"),
            ("id_estructura_comercial", "string"), ("id_modelo_atencion", "string"),
            ("cod_modulo", "string"), ("desc_modulo", "string"),
        ],
        "m_responsable_comercial": [
            ("id_responsable_comercial", "string"),
            ("cod_responsable_comercial", "string"),
            ("nomb_responsable_comercial", "string"),
        ],
        "m_modelo_atencion": [
            ("id_modelo_atencion", "string"), ("cod_modelo_atencion", "string"),
            ("desc_modelo_atencion", "string"),
        ],
    })
    ts = dt.datetime(2025, 4, 1)
    spark.createDataFrame(
        [("10", "01", "FV1", "R1", "Z1", "VEND1", "RUTA CENTRO", "T")],
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, cod_ruta string, "
        "cod_zona string, cod_vendedor string, desc_ruta string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_ruta", "pe01"))
    spark.createDataFrame(
        [("10", "01", "Z1", "RG1", "SR1", "D1", "SUP1", "ZONA NORTE", "T")],
        "cod_compania string, cod_sucursal string, cod_zona string, cod_region string, "
        "cod_subregion string, cod_centro_distribucion string, cod_supervisor string, "
        "desc_zona string, es_activo string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_zona", "pe01"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", ts, ts)],
        "cod_compania string, cod_pais string, desc_compania string, es_activo string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_compania", "pe01"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_pais", "principal"))

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    dr = run_waves([JobConfig("domain", "m_estructura_comercial_lite", 1)], DOMAIN_JOBS, mk)
    assert dr[0].status == "succeeded", dr[0].error

    # point a module at the REAL ruta row the domain job just minted
    ec = {r["cod_tipo_estructura_comercial"]: r for r in spark.read.parquet(
        lake.table_path(Layer.DOMAIN, "m_estructura_comercial")).collect()}
    ruta_id = ec["Ruta"]["id_estructura_comercial"]
    spark.createDataFrame(
        [("10|01|FV1|M1", "PE", ruta_id, "10|MA1", "M1", "MODULO NORTE")],
        "id_modulo string, id_pais string, id_estructura_comercial string, "
        "id_modelo_atencion string, cod_modulo string, desc_modulo string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_modulo"))
    spark.createDataFrame(
        [("10|VEND1", "VEND1", "VENDEDOR UNO"), ("10|SUP1", "SUP1", "SUPER UNO")],
        "id_responsable_comercial string, cod_responsable_comercial string, "
        "nomb_responsable_comercial string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_responsable_comercial"))
    spark.createDataFrame(
        [("10|MA1", "MA1", "Pre Venta")],
        "id_modelo_atencion string, cod_modelo_atencion string, desc_modelo_atencion string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_modelo_atencion"))
    # reuse the stage m_pais as the domain country dim (same shape)
    spark.read.parquet(lake.table_path(Layer.STAGE, "m_pais", "principal")).write.parquet(
        lake.table_path(Layer.DOMAIN, "m_pais")
    )

    ar = run_waves([JobConfig("analytics", "dim_estructura_comercial_lite", 1)], ANALYTICS_JOBS, mk)
    assert ar[0].status == "succeeded", ar[0].error

    row = spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "dim_estructura_comercial")).collect()[0]
    assert row["id_estructura_comercial"] == "10|01|FV1|M1"   # module IS the key
    assert row["desc_ruta"] == "RUTA CENTRO"
    assert row["desc_zona"] == "ZONA NORTE"        # parent resolved via self-join
    assert row["cod_vendedor"] == "VEND1" and row["nomb_vendedor"] == "VENDEDOR UNO"
    assert row["cod_supervisor"] == "SUP1"
    assert row["desc_division"] is None            # ladder exhausted above zona
    assert row["cod_jefe_venta"] is None
    assert row["desc_modelo_atencion"] == "Pre Venta"
    assert row["cod_pais"] == "PE" and row["cod_modulo"] == "M1"


def test_fact_venta_detalle_volume_conversion(spark, lake):
    """Full serving select: detail ⋈ header ⋈ tipo-venta whitelist (J7 —
    a DES-typed sale is dropped) ⋈ order left join; /30 conversion in exact
    decimal; geography coalesces prefer the sale's own descriptors and fall
    back to the order's."""
    D = Decimal
    money_cols = [
        "imp_neto_vta_mn", "imp_neto_vta_me", "imp_bruto_vta_mn", "imp_bruto_vta_me",
        "imp_dscto_mn", "imp_dscto_me", "imp_desnimp_mn", "imp_desnimp_me",
        "imp_cobrar_vta_mn", "imp_cobrar_vta_me", "imp_paquete_vta_mn",
        "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
        "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
        "imp_valorizado_pro_me",
    ] + [f"imp_impuesto{i}_{c}" for i in range(1, 7) for c in ("mn", "me")]
    reg = SchemaRegistry({
        "t_venta": [
            ("id_venta", "string"), ("id_pais", "string"), ("id_periodo", "string"),
            ("id_sucursal", "string"), ("id_cliente", "string"), ("id_vendedor", "string"),
            ("id_supervisor", "string"), ("id_forma_pago", "string"),
            ("id_fuerza_venta", "string"), ("id_lista_precio", "string"),
            ("id_tipo_venta", "string"), ("id_pedido", "string"),
            ("fecha_emision", "date"), ("fecha_liquidacion", "date"),
            ("fecha_pedido", "date"), ("nro_venta", "string"),
            ("desc_region", "string"), ("desc_subregion", "string"),
            ("desc_division", "string"), ("cod_zona", "string"), ("cod_ruta", "string"),
            ("cod_modulo", "string"), ("es_eliminado", "int"),
        ],
        "t_venta_detalle": [
            ("id_venta", "string"), ("id_producto", "string"),
            ("id_pais", "string"), ("id_periodo", "string"),
            ("cant_caja_fisica_ven", "numeric(38,12)"),
            ("cant_caja_volumen_ven", "numeric(38,12)"),
            ("cant_caja_fisica_pro", "numeric(38,12)"),
            ("cant_caja_volumen_pro", "numeric(38,12)"),
            *[(c, "numeric(38,12)") for c in money_cols],
        ],
        "t_pedido": [
            ("id_pedido", "string"), ("id_modelo_atencion", "string"),
            ("id_origen_pedido", "string"), ("nro_pedido", "string"),
            ("desc_region", "string"), ("desc_subregion", "string"),
            ("desc_division", "string"), ("cod_zona", "string"), ("cod_ruta", "string"),
            ("cod_modulo", "string"),
        ],
        "m_tipo_venta": [("id_tipo_venta", "string"), ("cod_tipo_operacion", "string")],
    })
    d = dt.date(2025, 5, 2)

    def venta_row(vid, tipo, deleted, region):
        return (vid, "PE", "202505", "10|01", "10|C1", "10|V9", None, "10|FP1",
                "10|01|F1", "10|LP1", tipo, "10|01|200|P1|C1", d, d, d, "CP-01",
                region, None, None, None, "R1", "M1", deleted)

    spark.createDataFrame(
        [
            venta_row("V1", "TV1", 0, "REGION NORTE"),  # VEN → kept
            venta_row("V2", "TV1", 1, "REGION NORTE"),  # soft-deleted → dropped
            venta_row("V3", "TV9", 0, "REGION NORTE"),  # DES type → dropped by J7
            venta_row("V4", "TV1", 0, None),            # region from ORDER fallback
        ],
        "id_venta string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, id_vendedor string, id_supervisor string, "
        "id_forma_pago string, id_fuerza_venta string, id_lista_precio string, "
        "id_tipo_venta string, id_pedido string, fecha_emision date, "
        "fecha_liquidacion date, fecha_pedido date, nro_venta string, "
        "desc_region string, desc_subregion string, desc_division string, "
        "cod_zona string, cod_ruta string, cod_modulo string, es_eliminado int",
    ).write.partitionBy("id_pais").parquet(lake.table_path(Layer.DOMAIN, "t_venta"))

    def det_row(vid):
        return (vid, "10|A1", "PE", "202505", D("60"), D("60"), D("0"), D("30"),
                *[D("1")] * len(money_cols))

    spark.createDataFrame(
        [det_row("V1"), det_row("V2"), det_row("V3"), det_row("V4")],
        "id_venta string, id_producto string, id_pais string, id_periodo string, "
        "cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12), "
        "cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12), "
        + ", ".join(f"{c} decimal(38,12)" for c in money_cols),
    ).write.partitionBy("id_pais").parquet(lake.table_path(Layer.DOMAIN, "t_venta_detalle"))
    spark.createDataFrame(
        [("10|01|200|P1|C1", "10|MA1", "10|OR1", "P1|C1", "REGION PEDIDO",
          "SUBREGION PEDIDO", "DIV PEDIDO", "ZP", "RP", "MP")],
        "id_pedido string, id_modelo_atencion string, id_origen_pedido string, "
        "nro_pedido string, desc_region string, desc_subregion string, "
        "desc_division string, cod_zona string, cod_ruta string, cod_modulo string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido"))
    spark.createDataFrame(
        [("TV1", "VEN"), ("TV9", "DES")],
        "id_tipo_venta string, cod_tipo_operacion string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_tipo_venta"))

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves([JobConfig("analytics", "fact_venta_detalle_lite", 1, periods=2)],
                    ANALYTICS_JOBS, mk)
    assert res[0].status == "succeeded", res[0].error
    rows = {r["id_venta"]: r for r in spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_detalle")).collect()}
    # deleted header and DES-typed sale both dropped
    assert set(rows) == {"V1", "V4"}
    v1 = rows["V1"]
    assert v1["cant_cajaunitaria_vta"] == Decimal("2.000000000000")   # 60/30
    assert v1["cant_cajaunitaria_pro"] == Decimal("1.000000000000")   # 30/30
    assert v1["id_modelo_atencion"] == "10|MA1"      # via the order left join
    assert v1["nro_pedido"] == "P1|C1"
    assert v1["desc_region"] == "REGION NORTE"       # sale's own wins
    assert v1["cod_zona"] == "ZP"                    # NULL on the sale → order's
    assert v1["cod_ruta"] == "R1"                    # sale's own wins
    assert v1["imp_dscto_sinimpvta_mn"] == Decimal("1.000000000000")  # renamed
    assert v1["imp_impuesto6_me"] == Decimal("1.000000000000")
    # V4's own region is NULL → the order's backfills
    assert rows["V4"]["desc_region"] == "REGION PEDIDO"


def test_dim_eje_territorial_ladder_from_domain_job(spark, lake):
    """Chain: the m_eje_territorial domain job builds the NG adjacency with
    the pipe-encoded postal ref; the analytics ladder flattens NG4→NG2→NG1
    into one wide row and recovers zona_postal via split().getItem(1)."""
    from cdk_datalake_analytics_comercial_spark.jobs import DOMAIN_JOBS

    reg = SchemaRegistry({
        "m_ng1": [("id_pais", "string"), ("cod_ng1", "string"), ("desc_ng1", "string")],
        "m_ng2": [("id_pais", "string"), ("cod_ng1", "string"), ("cod_ng2", "string"),
                   ("desc_ng2", "string")],
        "m_ng3": [("id_pais", "string"), ("cod_ng1", "string"), ("cod_ng2", "string"),
                   ("cod_ng3", "string"), ("desc_ng3", "string"), ("cod_zona_postal", "string")],
        "m_pais": [("id_pais", "string"), ("cod_pais", "string"), ("desc_pais", "string")],
        "m_compania": [("cod_compania", "string"), ("cod_pais", "string"),
                        ("desc_compania", "string"), ("es_activo", "string"),
                        ("fecha_creacion", "timestamp"), ("fecha_modificacion", "timestamp")],
    })
    ts = dt.datetime(2025, 4, 1)
    spark.createDataFrame(
        [("PE", "D1", "LIMA DEP")], "id_pais string, cod_ng1 string, desc_ng1 string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_ng1", "pe01"))
    spark.createDataFrame(
        [("PE", "D1", "P1", "LIMA PROV")],
        "id_pais string, cod_ng1 string, cod_ng2 string, desc_ng2 string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_ng2", "pe01"))
    spark.createDataFrame(
        [("PE", "D1", "P1", "033", "MIRAFLORES", "15074")],
        "id_pais string, cod_ng1 string, cod_ng2 string, cod_ng3 string, "
        "desc_ng3 string, cod_zona_postal string",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_ng3", "pe01"))
    spark.createDataFrame(
        [("PE", "PE", "PERU")], "id_pais string, cod_pais string, desc_pais string"
    ).write.parquet(lake.table_path(Layer.STAGE, "m_pais", "principal"))
    spark.createDataFrame(
        [("10", "PE", "AJE", "T", ts, ts)],
        "cod_compania string, cod_pais string, desc_compania string, es_activo string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
    ).write.parquet(lake.table_path(Layer.STAGE, "m_compania", "pe01"))

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    dr = run_waves(
        [JobConfig("domain", "m_pais", 1), JobConfig("domain", "m_eje_territorial_lite", 2)],
        DOMAIN_JOBS, mk,
    )
    assert all(r.status == "succeeded" for r in dr), [r.error for r in dr]
    ar = run_waves([JobConfig("analytics", "dim_eje_territorial_lite", 1)], ANALYTICS_JOBS, mk)
    assert ar[0].status == "succeeded", ar[0].error

    rows = spark.read.parquet(lake.table_path(Layer.ANALYTICS, "dim_eje_territorial")).collect()
    assert len(rows) == 1                      # one NG4 leaf → one wide row
    r = rows[0]
    assert r["id_eje_territorial"] == "PE|15074"
    assert (r["cod_ng1"], r["desc_ng1"]) == ("D1", "LIMA DEP")
    assert (r["cod_ng2"], r["desc_ng2"]) == ("P1", "LIMA PROV")
    assert r["desc_ng4"] == "MIRAFLORES"
    assert r["zona_postal"] == "15074"         # split('|')[1] of "033|15074"
    assert r["desc_pais"] == "PERU"


def test_fact_venta_cliente_historico_backfill_and_type_filter(spark, lake):
    """Operation-type whitelist inside the join condition, soft-delete drop,
    and max(coalesce(header, order)) territory backfill with /30 unit
    conversion (reference fact_venta_cliente_historico.py:27-147)."""
    D = Decimal
    money_cols = [
        "imp_neto_vta_me", "imp_bruto_vta_mn", "imp_bruto_vta_me",
        "imp_dscto_mn", "imp_dscto_me", "imp_desnimp_mn", "imp_desnimp_me",
        "imp_cobrar_vta_mn", "imp_cobrar_vta_me", "imp_paquete_vta_mn",
        "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
        "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
        "imp_valorizado_pro_me",
    ] + [f"imp_impuesto{i}_{c}" for i in range(1, 7) for c in ("mn", "me")]
    reg = SchemaRegistry({
        "t_venta": [("id_venta", "string"), ("id_pais", "string"), ("id_periodo", "string"),
                     ("id_sucursal", "string"), ("id_cliente", "string"),
                     ("id_pedido", "string"), ("id_tipo_venta", "string"),
                     ("id_forma_pago", "string"), ("id_lista_precio", "string"),
                     ("desc_region", "string"), ("desc_subregion", "string"),
                     ("desc_division", "string"), ("cod_modulo", "string"),
                     ("cod_zona", "string"), ("cod_ruta", "string"), ("es_eliminado", "int")],
        "t_venta_detalle": [("id_venta", "string"), ("id_producto", "string"),
                             ("id_pais", "string"), ("id_periodo", "string"),
                             ("cant_caja_fisica_ven", "numeric(38,12)"),
                             ("cant_caja_volumen_ven", "numeric(38,12)"),
                             ("cant_caja_fisica_pro", "numeric(38,12)"),
                             ("cant_caja_volumen_pro", "numeric(38,12)"),
                             ("imp_neto_vta_mn", "numeric(38,12)"),
                             *[(c, "numeric(38,12)") for c in money_cols]],
        "t_pedido": [("id_pedido", "string"), ("desc_region", "string"),
                      ("desc_subregion", "string"), ("desc_division", "string"),
                      ("cod_modulo", "string"),
                      ("cod_zona", "string"), ("cod_ruta", "string")],
        "m_tipo_venta": [("id_tipo_venta", "string"), ("cod_tipo_operacion", "string")],
    })

    def venta_row(vid, cliente, pedido, tipo, zona, ruta, deleted):
        return (vid, "PE", "202505", "10|S1", cliente, pedido, tipo, "10|FP1",
                "10|LP1", None, None, None, "M1", zona, ruta, deleted)

    spark.createDataFrame(
        [
            venta_row("V1", "10|C1", "P1", "TV1", None, "R1", 0),
            venta_row("V2", "10|C1", None, "TV2", "Z2", "R2", 0),  # OTR type
            venta_row("V3", "10|C1", None, "TV1", "Z3", "R3", 1),  # deleted
            venta_row("V4", "10|C2", None, "TV1", "Z1", "R1", 0),  # no pedido
        ],
        "id_venta string, id_pais string, id_periodo string, id_sucursal string, "
        "id_cliente string, id_pedido string, id_tipo_venta string, "
        "id_forma_pago string, id_lista_precio string, desc_region string, "
        "desc_subregion string, desc_division string, cod_modulo string, "
        "cod_zona string, cod_ruta string, es_eliminado int",
    ).write.partitionBy("id_pais").parquet(lake.table_path(Layer.DOMAIN, "t_venta"))

    def det_row(vid, producto, fisica, volumen, neto):
        return (vid, producto, "PE", "202505", D(fisica), D(volumen), D("0"),
                D("0"), D(neto), *[D("1")] * len(money_cols))

    spark.createDataFrame(
        [
            det_row("V1", "A1", "5", "45", "100"),
            det_row("V1", "A1", "1", "15", "20"),
            det_row("V2", "A1", "9", "90", "900"),
            det_row("V3", "A1", "9", "90", "900"),
            det_row("V4", "A2", "3", "30", "60"),
        ],
        "id_venta string, id_producto string, id_pais string, id_periodo string, "
        "cant_caja_fisica_ven decimal(38,12), cant_caja_volumen_ven decimal(38,12), "
        "cant_caja_fisica_pro decimal(38,12), cant_caja_volumen_pro decimal(38,12), "
        "imp_neto_vta_mn decimal(38,12), "
        + ", ".join(f"{c} decimal(38,12)" for c in money_cols),
    ).write.partitionBy("id_pais").parquet(lake.table_path(Layer.DOMAIN, "t_venta_detalle"))
    spark.createDataFrame(
        [("P1", "REGION PEDIDO", None, None, "MP", "Z9", None)],
        "id_pedido string, desc_region string, desc_subregion string, "
        "desc_division string, cod_modulo string, cod_zona string, cod_ruta string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "t_pedido"))
    spark.createDataFrame(
        [("TV1", "ven"), ("TV2", "OTR")],   # lowercase proves upper() in the condition
        "id_tipo_venta string, cod_tipo_operacion string",
    ).write.parquet(lake.table_path(Layer.DOMAIN, "m_tipo_venta"))

    def mk(cfg):
        return JobContext(spark=spark, catalog=lake, registry=reg, config=cfg, as_of=AS_OF)

    res = run_waves(
        [JobConfig("analytics", "fact_venta_cliente_historico_lite", 1, periods=2)],
        ANALYTICS_JOBS, mk,
    )
    assert res[0].status == "succeeded", res[0].error
    rows = {r["id_cliente"]: r for r in spark.read.parquet(
        lake.table_path(Layer.ANALYTICS, "fact_venta_cliente_historico")).collect()}
    assert set(rows) == {"10|C1", "10|C2"}     # V2 (OTR) and V3 (deleted) dropped
    c1 = rows["10|C1"]
    assert c1["cod_zona"] == "Z9"              # null header zone backfilled from pedido
    assert c1["cod_ruta"] == "R1"              # header ruta wins over order's null
    assert c1["cant_cajafisica_vta"] == Decimal("6.000000000000")
    assert c1["cant_cajaunitaria_vta"] == Decimal("2.000000000000")   # 60/30
    assert c1["imp_neto_vta_mn"] == Decimal("120.000000000000")
    assert c1["fecha_liquidacion"] == dt.date(2025, 5, 1)
    assert c1["id_forma_pago"] == "10|FP1"         # 7-part serving key
    assert c1["desc_region"] == "REGION PEDIDO"    # order backfills null header
    assert c1["imp_dscto_sinimpvta_mn"] == Decimal("2.000000000000")  # 2 lines × 1
    assert c1["imp_impuesto6_me"] == Decimal("2.000000000000")
    c2 = rows["10|C2"]
    assert c2["cod_zona"] == "Z1"              # no order row: left join, header value
    assert c2["cant_cajaunitaria_vta"] == Decimal("1.000000000000")
