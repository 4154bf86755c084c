"""Domain-layer jobs: the reference's Glue job scripts re-expressed as
engine job callables (SURVEY §3.1 step 4 — straight-line DataFrame programs
ending in one write/merge action).

Each job reads stage tables through the engine reader (multi-instance union
+ empty-schema fallback), transforms declaratively, and lands with a merge
upsert or dynamic partition overwrite. Semantics cite the reference file the
job mirrors; the code is engine-native (Catalog + read_table + cast
projection + merge), not a translation of the Glue controller.

Jobs registered here form the first vertical slices of SURVEY §7.1:
- ``m_pais``      (`code/domain/m_pais.py:14-31`): country master filtered
  to countries that have companies; upsert on id_pais.
- ``m_compania`` (`code/domain/m_compania.py:14-38`): company master joined
  to country for the conformed id; upsert on id_compania / partition id_pais.
- ``t_venta_lite`` (`code/domain/t_venta.py:10-170` shape): period-filtered
  sales fact — surrogate ids, period derivation, left-join enrichment, cast
  projection, dynamic partition overwrite on (id_pais, id_periodo).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.common import period_yyyymm

from ..core.catalog import Layer
from ..functions.casts import cast_projection
from ..functions.currency import exchange_rate_me, exchange_rate_mn
from ..functions.keys import surrogate_key
from ..operators.pruning import period_filter
from ..operators.relational import top1_per_group
from ..runner import JobContext, JobRegistry
from ..sources.reader import read_table
from ..sources.writer import merge_upsert, write_table

DOMAIN_JOBS = JobRegistry()


def company_country_bridge(m_compania, m_pais, m_parametro=None):
    """The conformance bridge every domain job starts from (`m_almacen.py:
    17-18` et al.): company ⋈ country on cod_pais → (cod_compania, id_pais);
    with ``m_parametro``, the company's local-currency code rides along
    (`t_venta.py:28-40`, `t_movimiento_inventario_detalle.py:30-42`).
    One definition so a conformance fix (trim, activity filter) lands
    everywhere at once."""
    mc = m_compania.alias("mc")
    if m_parametro is not None:
        mc = mc.join(
            F.broadcast(m_parametro).alias("mpar"),
            F.col("mpar.id_compania") == F.col("mc.cod_compania"),
            "left",
        )
    cols = [F.col("mc.cod_compania").alias("cod_compania"), F.col("mp.id_pais")]
    if m_parametro is not None:
        cols.append(F.col("mpar.cod_moneda_mn").alias("moneda_mn"))
    return (
        mc.join(
            F.broadcast(m_pais).alias("mp"),
            F.col("mc.cod_pais") == F.col("mp.cod_pais"),
            "inner",
        ).select(*cols)
    )


@DOMAIN_JOBS.register("m_pais")
def job_m_pais(ctx: JobContext) -> None:
    """Country master: keep countries referenced by any company
    (`code/domain/m_pais.py:14-31`; the driver-side isin list there becomes
    a left_semi join — no collect on the data path)."""
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    out = (
        m_pais.join(m_compania.select("cod_pais").distinct(), "cod_pais", "left_semi")
        .select(
            F.col("id_pais").cast("string"),
            F.col("cod_pais").cast("string"),
            F.col("desc_pais").cast("string"),
        )
    )
    merge_upsert(
        ctx.spark, out, ctx.catalog.table_path(Layer.DOMAIN, "m_pais"), keys=["id_pais"]
    )


@DOMAIN_JOBS.register("m_compania")
def job_m_compania(ctx: JobContext) -> None:
    """Company master conformed to the country dim
    (`code/domain/m_compania.py:14-38`): inner join on cod_pais, declared
    output schema, upsert on id_compania partitioned by id_pais."""
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    joined = (
        m_compania.alias("mc")
        .join(m_pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(
            F.col("mc.cod_compania").alias("id_compania"),
            F.lit(None).alias("id_compania_ref"),
            F.col("mp.id_pais").alias("id_pais"),
            F.col("mc.cod_compania").alias("cod_compania"),
            F.col("mc.desc_compania").alias("nomb_compania"),
            F.lit(None).alias("cod_tipo_compania"),
            F.col("mc.es_activo").alias("estado"),
            F.col("mc.fecha_creacion").alias("fecha_creacion"),
            F.col("mc.fecha_modificacion").alias("fecha_modificacion"),
        )
    )
    out = cast_projection(
        joined,
        [
            ("id_compania", "string"),
            ("id_compania_ref", "string"),
            ("id_pais", "string"),
            ("cod_compania", "string"),
            ("nomb_compania", "string"),
            ("cod_tipo_compania", "string"),
            ("estado", "string"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_compania"),
        keys=["id_compania"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("t_pedido_cumplimiento_lite")
def job_t_pedido_cumplimiento_lite(ctx: JobContext) -> None:
    """Order-fulfillment detail — the reference's BIGGEST job
    (`code/domain/t_pedido_detalle_cumplimiento.py`, 539 lines), full shape:

    1. line frames (`:81-186`): main '200' detail ⋈ header (5-key) and the
       ADES mirror ('200'/'300', renamed keys), each stamped with the
       country and the lit(None) placeholder block; ADES lines already in
       the main set dropped by a 5-key left_anti (`:188-198`), union;
    2. dispatch linkage (`:77-79, :200-214`): warehouse movements ranked W1
       per dispatch document (latest nro_documento_movimiento), joined LEFT
       with ``orden == 1`` and the PLI/LIQ state whitelist INSIDE the join
       condition (J7); expected-sale mapping i_relacion_proced_venta ⋈
       m_procedimiento (`:51-69`) joined on (compania, documento,
       tipo_pedido, procedimiento);
    3. per-line rollup (`:216-331`): groupBy the 13-part key (incl. the
       expected venta doc/proc/op) with the reference's 20-column A4
       ``max()`` attribute block and the dispatched quantities GATED on the
       movement existing (`:270-277`);
    4. sold-side resumen (`:333-418`): venta header ⋈ venta detail ⋈ the
       DISTINCT dispatch-doc frame on the NINE-part key (`:361-372` — the
       widest join in the reference), live documents only, NCC sign flip;
    5. final (`:420-534`): rollup ⋈ resumen (12-key LEFT) ⋈ m_articulo,
       groupBy with the dispatch doc coalesced to '' and the SIXTEEN
       Ven/Pro-split unit-converted aggregates (`:454-501` — ordered,
       asignado, despachado, vendido × física/volumen × Ven/Pro).

    Engine deviations, both documented: ``id_pedido`` keeps the HEADER
    5-part convention (the reference mints the almacén into this id ONLY
    here, `:509`, so its own fact join can never match); the Ven/Pro
    dispatch test is case-insensitive (the reference compares the literal
    'Ven'/'Pro' spelling of one source system)."""
    ped_h = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido", registry=ctx.registry
    )
    ped_d = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_detalle",
        registry=ctx.registry,
    )
    ades_h = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_ades", registry=ctx.registry
    )
    ades_d = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_ades_detalle",
        registry=ctx.registry,
    )
    alm = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_movimiento_inventario", registry=ctx.registry
    )
    venta_h = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_venta", registry=ctx.registry
    )
    venta_d = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_venta_detalle",
        registry=ctx.registry,
    )
    irpv_raw = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "i_relacion_proced_venta", registry=ctx.registry
    )
    m_proc = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_procedimiento", registry=ctx.registry
    )
    art = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_articulo", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    compania = (
        comp.alias("mc")
        .join(pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(F.col("mc.cod_compania").alias("cod_compania"), F.col("mp.id_pais"))
    )
    irpv = (
        irpv_raw.alias("irpv")
        .join(
            m_proc.alias("mp"),
            (F.col("irpv.cod_compania") == F.col("mp.cod_compania"))
            & (F.col("irpv.cod_documento_pedido") == F.col("mp.cod_documento_transaccion"))
            & (F.col("irpv.cod_procedimiento_pedido") == F.col("mp.cod_procedimiento")),
            "inner",
        )
        .select(
            F.col("irpv.cod_compania"),
            F.col("irpv.cod_documento_pedido"),
            F.col("irpv.cod_procedimiento_pedido"),
            F.col("irpv.cod_documento_venta"),
            F.col("irpv.cod_procedimiento_venta"),
            F.col("irpv.cod_operacion_venta"),
            F.col("irpv.cod_tipo_pedido"),
            F.col("mp.cod_tipo_operacion"),
        )
    )
    alm = alm.withColumn(
        "orden",
        F.row_number().over(
            Window.partitionBy(
                "cod_compania", "cod_sucursal", "cod_almacen_emisor_origen",
                "cod_documento_transaccion", "nro_documento_almacen",
            ).orderBy(F.col("nro_documento_movimiento").desc())
        ),
    )

    def lines(det, hdr, alm_col, doc_col, nro_col, origen_col, lista_col,
              zona_col, ruta_col, alm_doc_col, doc_filter):
        return (
            det.filter(doc_filter)
            .filter(period_filter(F.col("fecha_pedido"), ctx.periods))
            .alias("d")
            .join(
                hdr.filter(period_filter(F.col("fecha_pedido"), ctx.periods)).alias("h"),
                (F.col("d.cod_compania") == F.col("h.cod_compania"))
                & (F.col("d.cod_sucursal") == F.col("h.cod_sucursal"))
                & (F.col(f"d.{alm_col}") == F.col(f"h.{alm_col}"))
                & (F.col(f"d.{doc_col}") == F.col(f"h.{doc_col}"))
                & (F.col(f"d.{nro_col}") == F.col(f"h.{nro_col}")),
                "inner",
            )
            .join(F.broadcast(compania).alias("mc"),
                  F.col("d.cod_compania") == F.col("mc.cod_compania"), "inner")
            .select(
                F.col("mc.id_pais"),
                period_yyyymm(F.col("h.fecha_pedido")).alias("id_periodo"),
                F.col("d.cod_compania"),
                F.col("d.cod_sucursal"),
                F.col(f"d.{alm_col}").alias("cod_almacen"),
                F.col(f"d.{doc_col}").alias("cod_documento_pedido"),
                F.col(f"d.{nro_col}").alias("nro_documento_pedido"),
                F.col("h.cod_tipo_pedido"),
                F.coalesce(F.col(f"h.{origen_col}"), F.lit("000")).alias("cod_origen_pedido"),
                F.col("h.cod_vendedor"),
                F.lit(None).cast("string").alias("cod_supervisor"),
                F.lit(None).cast("string").alias("cod_jefe_venta"),
                F.col(f"d.{lista_col}").alias("cod_lista_precio"),
                F.col("h.cod_condicion_pago").alias("cod_forma_pago"),
                F.lit(None).cast("string").alias("desc_region"),
                F.lit(None).cast("string").alias("desc_subregion"),
                F.lit(None).cast("string").alias("desc_division"),
                F.col(f"d.{zona_col}").alias("cod_zona"),
                F.col(f"d.{ruta_col}").alias("cod_ruta"),
                F.col("d.cod_modulo"),
                F.col("h.cod_fuerza_venta"),
                F.col(f"d.{alm_doc_col}").alias("cod_documento_almacen"),
                F.col("d.nro_documento_almacen"),
                F.col("d.cod_cliente"),
                F.col("d.id_salesforce").alias("nro_pedido_ref"),
                F.col("d.cod_articulo"),
                F.col("d.cod_procedimiento"),
                F.col("h.fecha_pedido"),
                F.col("h.fecha_entrega"),
                F.col("d.cant_paquete").alias("cantidad_cajas"),
                F.col("d.cant_unidad").alias("cantidad_botellas"),
                F.col("d.cant_paquete_asignado").alias("cantidad_cajas_asignada"),
                F.col("d.cant_unidad_asignado").alias("cantidad_botellas_asignada"),
                F.col("d.fecha_creacion"),
                F.col("d.fecha_modificacion"),
            )
        )

    main = lines(
        ped_d, ped_h, "cod_almacen", "cod_documento_pedido", "nro_documento_pedido",
        "cod_documento_pedido_origen", "cod_lista_precio", "cod_zona", "cod_ruta",
        "cod_documento_almacen", F.col("cod_documento_pedido") == "200",
    )
    # ADES mirror: renamed business keys; cajas/botellas arrive pre-named
    extra = lines(
        ades_d.withColumnRenamed("cantidad_cajas", "cant_paquete")
        .withColumnRenamed("cantidad_botellas", "cant_unidad")
        .withColumnRenamed("cantidad_cajas_asignada", "cant_paquete_asignado")
        .withColumnRenamed("cantidad_botellas_asignada", "cant_unidad_asignado"),
        ades_h, "cod_almacen_emisor", "cod_documento_transaccion", "nro_comprobante",
        "cod_tipo_documento_origen", "cod_lista_precios", "cod_zona_distribucion",
        "cod_ruta_distribucion", "cod_tipo_documento_almacen",
        F.col("cod_documento_transaccion").isin("200", "300"),
    )
    anti_key = ["cod_compania", "cod_sucursal", "cod_almacen",
                "cod_documento_pedido", "nro_documento_pedido"]
    lines_u = main.unionByName(
        extra.join(main.select(*anti_key).distinct(), anti_key, "left_anti")
    )

    es_ven = F.lower(F.col("cod_tipo_operacion")) == "ven"
    es_pro = F.lower(F.col("cod_tipo_operacion")) == "pro"
    rollup_key = [
        "t.id_pais", "t.cod_compania", "t.cod_sucursal", "t.cod_almacen",
        "t.cod_documento_pedido", "t.nro_documento_pedido", "t.cod_cliente",
        "t.cod_articulo", "t.cod_documento_almacen", "t.nro_documento_almacen",
        "irpv.cod_documento_venta", "irpv.cod_procedimiento_venta",
        "irpv.cod_operacion_venta",
    ]
    rollup = (
        lines_u.alias("t")
        .join(
            alm.alias("vtha"),
            (F.col("t.cod_compania") == F.col("vtha.cod_compania"))
            & (F.col("t.cod_sucursal") == F.col("vtha.cod_sucursal"))
            & (F.col("t.cod_almacen") == F.col("vtha.cod_almacen_emisor_origen"))
            & (F.col("t.cod_documento_almacen") == F.col("vtha.cod_documento_transaccion"))
            & (F.col("t.nro_documento_almacen") == F.col("vtha.nro_documento_almacen"))
            & (F.col("vtha.orden") == 1)
            & (F.col("vtha.cod_estado_comprobante").isin("PLI", "LIQ")),
            "left",
        )
        .join(
            F.broadcast(irpv).alias("irpv"),
            (F.col("t.cod_compania") == F.col("irpv.cod_compania"))
            & (F.col("t.cod_documento_pedido") == F.col("irpv.cod_documento_pedido"))
            & (F.col("t.cod_tipo_pedido") == F.col("irpv.cod_tipo_pedido"))
            & (F.col("t.cod_procedimiento") == F.col("irpv.cod_procedimiento_pedido")),
            "left",
        )
        .groupBy(*[F.col(k) for k in rollup_key])
        .agg(
            F.max("t.id_periodo").alias("id_periodo"),
            F.max("t.cod_procedimiento").alias("cod_procedimiento"),
            F.max("t.cod_origen_pedido").alias("cod_origen_pedido"),
            F.max("t.cod_tipo_pedido").alias("cod_tipo_pedido"),
            F.max("t.cod_vendedor").alias("cod_vendedor"),
            F.max("t.cod_lista_precio").alias("cod_lista_precio"),
            F.max("t.cod_forma_pago").alias("cod_forma_pago"),
            F.max("t.cod_zona").alias("cod_zona"),
            F.max("t.cod_ruta").alias("cod_ruta"),
            F.max("t.cod_modulo").alias("cod_modulo"),
            F.max("t.nro_pedido_ref").alias("nro_pedido_ref"),
            F.max("t.cod_fuerza_venta").alias("cod_fuerza_venta"),
            F.max("vtha.cod_transportista").alias("cod_transportista"),
            F.max("vtha.cod_chofer").alias("cod_chofer"),
            F.max("vtha.cod_vehiculo").alias("cod_medio_transporte"),
            F.max("vtha.cod_estado_comprobante").alias("estado_guia"),
            F.max("t.fecha_pedido").alias("fecha_pedido"),
            F.max("t.fecha_entrega").alias("fecha_entrega"),
            F.max("vtha.fecha_emision").alias("fecha_orden_carga"),
            F.max("vtha.fecha_almacen").alias("fecha_movimiento_inventario"),
            F.max("irpv.cod_tipo_operacion").alias("cod_tipo_operacion"),
            F.sum("t.cantidad_cajas").alias("cantidad_cajas"),
            F.sum("t.cantidad_botellas").alias("cantidad_botellas"),
            F.sum("t.cantidad_cajas_asignada").alias("cantidad_cajas_asignada"),
            F.sum("t.cantidad_botellas_asignada").alias("cantidad_botellas_asignada"),
            # dispatched = assigned, but ONLY once a live movement exists
            F.sum(
                F.when(F.col("vtha.cod_documento_transaccion").isNull(), F.lit(0))
                .otherwise(F.col("t.cantidad_cajas_asignada"))
            ).alias("cantidad_cajas_despechado"),
            F.sum(
                F.when(F.col("vtha.cod_documento_transaccion").isNull(), F.lit(0))
                .otherwise(F.col("t.cantidad_botellas_asignada"))
            ).alias("cantidad_botellas_despechado"),
            F.max("t.fecha_creacion").alias("fecha_creacion"),
            F.max("t.fecha_modificacion").alias("fecha_modificacion"),
        )
        .select(
            *[F.col(k.split(".")[1]) for k in rollup_key[:10]],
            "cod_documento_venta", "cod_procedimiento_venta", "cod_operacion_venta",
            "id_periodo", "cod_procedimiento", "cod_origen_pedido", "cod_tipo_pedido",
            "cod_vendedor", "cod_lista_precio", "cod_forma_pago", "cod_zona",
            "cod_ruta", "cod_modulo", "nro_pedido_ref", "cod_fuerza_venta",
            "cod_transportista", "cod_chofer", "cod_medio_transporte", "estado_guia",
            "fecha_pedido", "fecha_entrega", "fecha_orden_carga",
            "fecha_movimiento_inventario", "cod_tipo_operacion",
            "cantidad_cajas", "cantidad_botellas", "cantidad_cajas_asignada",
            "cantidad_botellas_asignada", "cantidad_cajas_despechado",
            "cantidad_botellas_despechado", "fecha_creacion", "fecha_modificacion",
        )
    )

    unico = (
        rollup.where(F.coalesce(F.col("cod_documento_almacen"), F.lit("")) != "")
        .select(
            "cod_compania", "cod_sucursal", "cod_almacen", "cod_documento_pedido",
            "nro_documento_pedido", "cod_documento_almacen", "nro_documento_almacen",
            "cod_documento_venta", "cod_procedimiento_venta", "cod_operacion_venta",
        )
        .distinct()
    )
    resumen = (
        venta_h.alias("vthv")
        .join(
            venta_d.alias("vthvd"),
            (F.col("vthv.cod_compania") == F.col("vthvd.cod_compania"))
            & (F.col("vthv.cod_sucursal") == F.col("vthvd.cod_sucursal"))
            & (F.col("vthv.cod_almacen") == F.col("vthvd.cod_almacen"))
            & (F.col("vthv.cod_documento_venta") == F.col("vthvd.cod_documento_venta"))
            & (F.col("vthv.nro_documento_venta") == F.col("vthvd.nro_documento_venta")),
            "inner",
        )
        .join(
            unico.alias("t"),
            (F.col("vthv.cod_compania") == F.col("t.cod_compania"))
            & (F.col("vthv.cod_sucursal") == F.col("t.cod_sucursal"))
            & (F.col("vthv.cod_almacen") == F.col("t.cod_almacen"))
            & (F.col("vthv.cod_documento_pedido") == F.col("t.cod_documento_pedido"))
            & (F.col("vthv.nro_documento_pedido") == F.col("t.nro_documento_pedido"))
            & (F.col("vthv.cod_documento_almacen") == F.col("t.cod_documento_almacen"))
            & (F.col("vthv.nro_documento_almacen") == F.col("t.nro_documento_almacen"))
            & (F.col("vthv.cod_documento_venta") == F.col("t.cod_documento_venta"))
            & (F.col("vthv.cod_procedimiento") == F.col("t.cod_procedimiento_venta"))
            & (F.col("vthvd.cod_operacion") == F.col("t.cod_operacion_venta")),
            "inner",
        )
        .where(
            ~F.col("vthv.cod_documento_venta").isin("RMD", "CMD")
            & (F.col("vthv.cod_estado_comprobante") != "002")
        )
        .groupBy(
            F.col("vthv.cod_compania"), F.col("vthv.cod_sucursal"),
            F.col("vthv.cod_almacen"), F.col("t.cod_documento_almacen"),
            F.col("t.nro_documento_almacen"), F.col("vthv.cod_documento_pedido"),
            F.col("vthv.nro_documento_pedido"), F.col("vthv.cod_cliente"),
            F.col("vthvd.cod_articulo"), F.col("vthv.cod_documento_venta"),
            F.col("vthv.cod_procedimiento"), F.col("vthvd.cod_operacion"),
        )
        .agg(
            F.max("vthv.fecha_liquidacion").alias("fecha_liquidacion"),
            F.sum(
                F.when(F.col("vthv.cod_documento_venta") == "NCC", F.lit(-1))
                .otherwise(F.lit(1)) * F.col("vthvd.cant_paquete")
            ).alias("cantidad_cajas"),
            F.sum(
                F.when(F.col("vthv.cod_documento_venta") == "NCC", F.lit(-1))
                .otherwise(F.lit(1)) * F.col("vthvd.cant_unidad")
            ).alias("cantidad_botellas"),
        )
    )

    dec = lambda c: c.cast("decimal(20,6)")

    def conv(dispatch, cajas, botellas, fisica: bool):
        if fisica:
            expr = dec(cajas) + dec(botellas) / dec(F.col("m.cant_unidad_paquete"))
        else:
            expr = (
                dec(cajas) * dec(F.col("m.cant_unidad_paquete")) + dec(botellas)
            ) * dec(F.col("m.cant_unidad_volumen"))
        return F.sum(F.when(dispatch, expr).otherwise(F.lit(0)).cast("decimal(38,12)"))

    v_ven = F.lower(F.col("vthv.cod_tipo_operacion")) == "ven"
    v_pro = F.lower(F.col("vthv.cod_tipo_operacion")) == "pro"
    q = {
        "ped": (F.col("vthv.cantidad_cajas"), F.col("vthv.cantidad_botellas")),
        "asignado_ped": (
            F.col("vthv.cantidad_cajas_asignada"), F.col("vthv.cantidad_botellas_asignada")
        ),
        "desp": (
            F.col("vthv.cantidad_cajas_despechado"),
            F.col("vthv.cantidad_botellas_despechado"),
        ),
    }
    aggs = []
    for name, (cajas, bot) in q.items():
        aggs += [
            conv(v_ven, cajas, bot, True).alias(f"cant_cajafisica_{name}"),
            conv(v_ven, cajas, bot, False).alias(f"cant_cajavolumen_{name}"),
            conv(v_pro, cajas, bot, True).alias(f"cant_cajafisica_{name}_pro"),
            conv(v_pro, cajas, bot, False).alias(f"cant_cajavolumen_{name}_pro"),
        ]
    sold = (F.col("t.cantidad_cajas"), F.col("t.cantidad_botellas"))
    aggs += [
        conv(v_ven, *sold, True).alias("cant_caja_fisica_ven"),
        conv(v_ven, *sold, False).alias("cant_caja_volumen_ven"),
        conv(v_pro, *sold, True).alias("cant_caja_fisica_pro"),
        conv(v_pro, *sold, False).alias("cant_caja_volumen_pro"),
    ]
    final = (
        rollup.alias("vthv")
        .join(
            resumen.alias("t"),
            (F.col("vthv.cod_compania") == F.col("t.cod_compania"))
            & (F.col("vthv.cod_sucursal") == F.col("t.cod_sucursal"))
            & (F.col("vthv.cod_almacen") == F.col("t.cod_almacen"))
            & (F.col("vthv.cod_documento_pedido") == F.col("t.cod_documento_pedido"))
            & (F.col("vthv.nro_documento_pedido") == F.col("t.nro_documento_pedido"))
            & (F.col("vthv.cod_cliente") == F.col("t.cod_cliente"))
            & (F.col("vthv.cod_articulo") == F.col("t.cod_articulo"))
            & (F.col("vthv.cod_documento_almacen") == F.col("t.cod_documento_almacen"))
            & (F.col("vthv.nro_documento_almacen") == F.col("t.nro_documento_almacen"))
            & (F.col("vthv.cod_documento_venta") == F.col("t.cod_documento_venta"))
            & (F.col("vthv.cod_procedimiento_venta") == F.col("t.cod_procedimiento"))
            & (F.col("vthv.cod_operacion_venta") == F.col("t.cod_operacion")),
            "left",
        )
        .join(
            F.broadcast(art).alias("m"),
            (F.col("vthv.cod_compania") == F.col("m.cod_compania"))
            & (F.col("vthv.cod_articulo") == F.col("m.cod_articulo")),
            "inner",
        )
        .groupBy(
            F.col("vthv.cod_compania"), F.col("vthv.cod_sucursal"),
            F.col("vthv.cod_almacen"), F.col("vthv.cod_documento_pedido"),
            F.col("vthv.nro_documento_pedido"), F.col("vthv.cod_cliente"),
            F.col("vthv.cod_articulo"),
            F.coalesce(F.col("vthv.cod_documento_almacen"), F.lit("")).alias(
                "cod_documento_almacen"
            ),
            F.coalesce(F.col("vthv.nro_documento_almacen"), F.lit("")).alias(
                "nro_documento_almacen"
            ),
        )
        .agg(
            F.max("vthv.id_pais").alias("id_pais"),
            F.max("vthv.id_periodo").alias("id_periodo"),
            F.max("t.fecha_liquidacion").alias("fecha_liquidacion"),
            *aggs,
            F.max("vthv.fecha_creacion").alias("fecha_creacion"),
            F.max("vthv.fecha_modificacion").alias("fecha_modificacion"),
            # serving extras for the delivery fact (reference reads these
            # from t_pedido; kept here so the fact join stays single-pass)
            F.max("vthv.cod_zona").alias("cod_zona"),
            F.max("vthv.cod_ruta").alias("cod_ruta"),
        )
        .select(
            F.col("id_pais"),
            F.col("id_periodo"),
            surrogate_key(
                F.col("vthv.cod_compania"), F.col("vthv.cod_sucursal")
            ).alias("id_sucursal"),
            # HEADER 5-part convention (see docstring) — NOT the reference's
            # almacén-infixed 6-part (`:509`), which its own fact can't join
            surrogate_key(
                F.col("vthv.cod_compania"), F.col("vthv.cod_sucursal"),
                F.col("vthv.cod_documento_pedido"), F.col("vthv.nro_documento_pedido"),
                F.col("vthv.cod_cliente"),
            ).alias("id_pedido"),
            surrogate_key(F.col("vthv.cod_compania"), F.col("vthv.cod_articulo")).alias(
                "id_producto"
            ),
            F.when(
                F.col("cod_documento_almacen") != "",
                surrogate_key(
                    F.col("vthv.cod_compania"), F.col("vthv.cod_sucursal"),
                    F.col("vthv.cod_almacen"), F.col("cod_documento_almacen"),
                    F.col("nro_documento_almacen"),
                ),
            ).alias("id_reparto"),
            F.col("fecha_liquidacion"),
            *[F.col(f"cant_cajafisica_{n}{s}") for n in q for s in ("", "_pro")],
            *[F.col(f"cant_cajavolumen_{n}{s}") for n in q for s in ("", "_pro")],
            F.col("cant_caja_fisica_ven"), F.col("cant_caja_volumen_ven"),
            F.col("cant_caja_fisica_pro"), F.col("cant_caja_volumen_pro"),
            F.col("cod_zona"), F.col("cod_ruta"),
            F.col("fecha_creacion"), F.col("fecha_modificacion"),
        )
    )
    out = cast_projection(
        final,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_sucursal", "string"),
            ("id_pedido", "string"),
            ("id_producto", "string"),
            ("id_reparto", "string"),
            ("fecha_liquidacion", "date"),
            *[
                (f"cant_cajafisica_{n}{s}", "numeric(38,12)")
                for n in q for s in ("", "_pro")
            ],
            *[
                (f"cant_cajavolumen_{n}{s}", "numeric(38,12)")
                for n in q for s in ("", "_pro")
            ],
            ("cant_caja_fisica_ven", "numeric(38,12)"),
            ("cant_caja_volumen_ven", "numeric(38,12)"),
            ("cant_caja_fisica_pro", "numeric(38,12)"),
            ("cant_caja_volumen_pro", "numeric(38,12)"),
            ("cod_zona", "string"),
            ("cod_ruta", "string"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_pedido_cumplimiento"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_saldos_iniciales_lite")
def job_t_saldos_iniciales_lite(ctx: JobContext) -> None:
    """Opening inventory balances (`code/domain/t_saldos_iniciales.py:
    40-145`): physical count headers filtered to the period window and
    joined to their detail on a 3-key natural key (sucursal, almacén,
    fecha), unit conversion via the article's ``cant_unidad_paquete``,
    valuation from the period-close CPM (cost-per-thousand) table with
    decimal division through the purchase exchange rate (tc_compra,
    `:104-109`) — the job family that uses the narrower ``numeric(30,4)``
    money type (SURVEY §1.2). Headers must carry a KNOWN approving employee
    (`:43-48` — an inner join used purely as an existence gate, expressed
    here as left_semi so no employee columns leak into the row)."""
    toma = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_toma_inventario", registry=ctx.registry, principal_only=True
    )
    det = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_toma_inventario_detalle", registry=ctx.registry, principal_only=True
    )
    cpm = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_cierre_inventario_cpm", registry=ctx.registry, principal_only=True
    )
    art = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_articulo", registry=ctx.registry, principal_only=True)
    empleado = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_empleado", registry=ctx.registry, principal_only=True
    )
    m_parametro = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_parametro", registry=ctx.registry, principal_only=True
    )
    m_tipo_cambio = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_cambio", registry=ctx.registry, principal_only=True
    )

    dec = lambda c: c.cast("decimal(30,4)")
    toma = toma.join(
        F.broadcast(empleado.select(
            F.col("cod_compania"), F.col("cod_empleado").alias("cod_empleado_aprobador")
        )),
        ["cod_compania", "cod_empleado_aprobador"],
        "left_semi",
    )
    moneda = F.broadcast(
        m_parametro.select(
            F.col("id_compania"), F.col("cod_moneda_mn").alias("moneda_mn")
        )
    )
    base = (
        toma.alias("tti")
        .filter(period_filter(F.col("tti.fecha_inventario"), ctx.periods))
        .join(moneda.alias("mon"), F.col("tti.id_compania") == F.col("mon.id_compania"), "left")
        .join(
            det.alias("ttid"),
            (F.col("tti.id_sucursal") == F.col("ttid.id_sucursal"))
            & (F.col("tti.cod_almacen_emisor") == F.col("ttid.cod_almacen_emisor"))
            & (F.col("tti.fecha_inventario") == F.col("ttid.fecha_inventario")),
            "inner",
        )
        .join(
            F.broadcast(art).alias("ma"),
            F.col("ma.id_articulo") == F.col("ttid.id_articulo"),
            "inner",
        )
        .select(
            F.col("tti.id_pais"),
            period_yyyymm(F.col("tti.fecha_inventario")).alias("id_periodo"),
            F.col("tti.id_compania"),
            F.col("tti.id_sucursal"),
            F.col("ttid.id_almacen"),
            F.col("ttid.id_articulo"),
            F.col("tti.fecha_inventario"),
            F.col("mon.moneda_mn"),
            dec(F.col("ttid.stock_final")).alias("cantidad_cajas"),
            dec(F.col("ttid.stock_final") * F.col("ma.cant_unidad_paquete")).alias(
                "unidades"
            ),
            F.col("tti.estado"),
            F.col("tti.usuario_creacion"),
            F.col("tti.fecha_creacion"),
            F.col("tti.usuario_modificacion"),
            F.col("tti.fecha_modificacion"),
            F.lit("0").alias("es_eliminado"),
        )
    )
    out = (
        base.alias("tmp")
        .join(
            cpm.alias("cpm"),
            (F.col("tmp.id_sucursal") == F.col("cpm.id_sucursal"))
            & (F.col("tmp.id_articulo") == F.col("cpm.id_articulo"))
            & (F.col("tmp.id_periodo") == F.col("cpm.id_periodo")),
            "left",
        )
        .join(
            F.broadcast(m_tipo_cambio).alias("mtc"),
            (F.col("mtc.cod_compania") == F.col("tmp.id_compania"))
            & (F.col("mtc.fecha") == F.col("tmp.fecha_inventario"))
            & (F.col("mtc.cod_moneda") == F.col("tmp.moneda_mn")),
            "left",
        )
        .select(
            F.col("tmp.id_pais"),
            F.col("tmp.id_compania"),
            F.col("tmp.id_periodo"),
            F.col("tmp.id_sucursal"),
            F.col("tmp.id_almacen"),
            F.col("tmp.id_articulo"),
            F.col("tmp.fecha_inventario"),
            F.col("tmp.cantidad_cajas").alias("cant_cajafisica_inicial"),
            F.col("tmp.unidades").alias("cant_unidades_inicial"),
            F.col("tmp.estado"),
            dec(F.col("cpm.imp_cpm")).alias("precio_unitario_mn"),
            dec(F.col("cpm.imp_cpm") / F.col("mtc.tc_compra")).alias(
                "precio_unitario_me"
            ),
            dec(F.col("tmp.cantidad_cajas") * F.col("cpm.imp_cpm")).alias(
                "imp_valorizado_mn"
            ),
            dec(
                F.col("tmp.cantidad_cajas") * F.col("cpm.imp_cpm")
                / F.col("mtc.tc_compra")
            ).alias("imp_valorizado_me"),
            dec(F.col("cpm.imp_saldo_inicial")).alias("imp_saldo_inicial"),
            dec(F.col("cpm.imp_ingreso")).alias("imp_valorizado_ingreso"),
            dec(F.col("cpm.imp_salida")).alias("imp_valorizado_salida"),
            dec(F.col("cpm.imp_saldo_final")).alias("imp_saldo_final"),
            F.col("tmp.usuario_creacion"),
            F.col("tmp.fecha_creacion"),
            F.col("tmp.usuario_modificacion"),
            F.col("tmp.fecha_modificacion"),
            F.col("tmp.es_eliminado"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_compania", "string"),
            ("id_periodo", "string"),
            ("id_sucursal", "string"),
            ("id_almacen", "string"),
            ("id_articulo", "string"),
            ("fecha_inventario", "date"),
            ("cant_cajafisica_inicial", "numeric(30,4)"),
            ("cant_unidades_inicial", "numeric(30,4)"),
            ("estado", "string"),
            ("precio_unitario_mn", "numeric(30,4)"),
            ("precio_unitario_me", "numeric(30,4)"),
            ("imp_valorizado_mn", "numeric(30,4)"),
            ("imp_valorizado_me", "numeric(30,4)"),
            ("imp_saldo_inicial", "numeric(30,4)"),
            ("imp_valorizado_ingreso", "numeric(30,4)"),
            ("imp_valorizado_salida", "numeric(30,4)"),
            ("imp_saldo_final", "numeric(30,4)"),
            ("usuario_creacion", "string"),
            ("fecha_creacion", "timestamp"),
            ("usuario_modificacion", "string"),
            ("fecha_modificacion", "timestamp"),
            ("es_eliminado", "string"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_saldos_iniciales"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_reparto_lite")
def job_t_reparto_lite(ctx: JobContext) -> None:
    """Delivery fact (`code/domain/t_reparto.py:36-93`): inventory movements
    filtered to dispatch documents (GRA/NIN) in the period window, the
    latest movement per delivery id kept via W1 over
    ``nro_documento_movimiento desc`` (`t_reparto.py:51-55`), joined to the
    conformed company on the shared column name (J8, `t_reparto.py:59`),
    surrogate ids for transportista/vehículo/chofer, dynamic overwrite."""
    mov = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_movimiento_inventario", registry=ctx.registry
    )
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    conformed = company_country_bridge(comp, pais)
    filtered = mov.filter(
        period_filter(F.col("fecha_almacen"), ctx.periods)
        & F.col("cod_documento_transaccion").isin("GRA", "NIN")
    ).withColumn(
        "id_reparto",
        surrogate_key(
            F.col("cod_compania"),
            F.col("cod_sucursal"),
            F.col("cod_almacen_emisor_origen"),
            F.col("cod_documento_transaccion"),
            F.col("nro_documento_almacen"),
        ),
    )
    latest = top1_per_group(
        filtered,
        partition_by=["id_reparto"],
        order_by=[F.col("nro_documento_movimiento").desc()],
    )
    out = (
        latest.alias("tmi")
        .join(F.broadcast(conformed).alias("mc"), "cod_compania", "inner")
        .select(
            F.col("mc.id_pais"),
            period_yyyymm(F.col("tmi.fecha_almacen")).alias("id_periodo"),
            F.col("tmi.id_reparto"),
            surrogate_key(F.col("tmi.cod_compania"), F.col("tmi.cod_transportista")).alias(
                "id_transportista"
            ),
            surrogate_key(F.col("tmi.cod_compania"), F.col("tmi.cod_vehiculo")).alias(
                "id_medio_transporte"
            ),
            surrogate_key(F.col("tmi.cod_compania"), F.col("tmi.cod_chofer")).alias(
                "id_chofer"
            ),
            F.col("tmi.fecha_emision").alias("fecha_orden_carga"),
            F.col("tmi.fecha_almacen").alias("fecha_reparto"),
            F.col("tmi.cod_estado_comprobante").alias("estado_guia"),
            F.col("tmi.fecha_creacion"),
            F.col("tmi.fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_reparto", "string"),
            ("id_transportista", "string"),
            ("id_medio_transporte", "string"),
            ("id_chofer", "string"),
            ("fecha_orden_carga", "date"),
            ("fecha_reparto", "date"),
            ("estado_guia", "string"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_reparto"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("m_cliente_lite")
def job_m_cliente_lite(ctx: JobContext) -> None:
    """Client master (`code/domain/m_cliente.py:22-156`), keeping its two
    signature join idioms:

    - the **when()-inside-join-key** branch join (`m_cliente.py:26-35`): a
      '00'-sucursal client matches its module assignment on its own
      sucursal, any other client matches on the assignment's sucursal;
    - the **filtered-left-join** on tipo_cliente restricted to
      ``lower(tipo) IN (a, v, t)`` (`m_cliente.py:53-58`), with the W1
      ``orden == 1`` coordinate pick joined by rank predicate (J7);
    - the full attribute surface (`:91-155`): cuenta-clave / canal / giro
      broadcast enrichments, the null-guarded ``id_eje_territorial`` mint
      from the postal code (`:105-117`), the 'SG'-infixed
      ``id_clasificacion_cliente`` (`:118-124`), lit(None) placeholder
      columns, and the coalesce defaults (tipo → 'N', principal → 0).
    """
    cli = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_cliente", registry=ctx.registry)
    asg = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_asignacion_modulo", registry=ctx.registry
    )
    tipo = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_cliente", registry=ctx.registry
    )
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    cuenta = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_cuenta_clave", registry=ctx.registry
    )
    canal = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_canal", registry=ctx.registry)
    giro = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_giro", registry=ctx.registry)

    coords = top1_per_group(
        cli.alias("mcl")
        .join(
            asg.alias("ma"),
            (F.col("mcl.cod_compania") == F.col("ma.cod_compania"))
            & (F.col("mcl.cod_cliente") == F.col("ma.cod_cliente"))
            & (
                F.col("mcl.cod_sucursal")
                == F.when(F.col("mcl.cod_sucursal") == "00", F.col("mcl.cod_sucursal"))
                .otherwise(F.col("ma.cod_sucursal"))
            ),
            "inner",
        )
        .select(
            F.col("mcl.cod_compania"),
            F.col("mcl.cod_sucursal"),
            F.col("mcl.cod_cliente"),
            F.col("ma.coord_x"),
            F.col("ma.coord_y"),
            F.col("ma.cod_fuerza_venta"),
        ),
        partition_by=["cod_compania", "cod_sucursal", "cod_cliente"],
        order_by=[F.col("cod_fuerza_venta").asc()],
        keep=False,
    ).alias("co")

    conformed = (
        comp.alias("mco")
        .join(F.broadcast(pais).alias("mp"), F.col("mco.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(F.col("mco.cod_compania").alias("cod_compania"), F.col("mp.id_pais"))
    )
    out = (
        cli.alias("mc")
        .join(
            tipo.alias("tc"),
            (F.col("mc.cod_compania") == F.col("tc.cod_compania"))
            & (F.col("mc.cod_cliente") == F.col("tc.cod_cliente"))
            & F.lower(F.col("tc.tipo_cliente")).isin("a", "v", "t"),
            "left",
        )
        .join(
            coords,
            (F.col("mc.cod_compania") == F.col("co.cod_compania"))
            & (F.col("mc.cod_cliente") == F.col("co.cod_cliente"))
            & (F.col("co.orden") == 1),
            "left",
        )
        .join(
            F.broadcast(cuenta).alias("cc"),
            (F.col("mc.cod_compania") == F.col("cc.cod_compania"))
            & (F.col("mc.cod_cuenta_clave") == F.col("cc.cod_cuenta_clave")),
            "left",
        )
        .join(
            F.broadcast(canal).alias("cn"),
            (F.col("cn.cod_compania") == F.col("mc.cod_compania"))
            & (F.col("cn.cod_canal") == F.col("mc.cod_canal")),
            "left",
        )
        .join(
            F.broadcast(giro).alias("g"),
            (F.col("g.cod_compania") == F.col("mc.cod_compania"))
            & (F.col("g.cod_giro") == F.col("mc.cod_giro")),
            "left",
        )
        .join(F.broadcast(conformed).alias("c"), ["cod_compania"], "inner")
        .select(
            surrogate_key(F.col("mc.cod_compania"), F.col("mc.cod_cliente")).alias(
                "id_cliente"
            ),
            F.lit(None).cast("string").alias("id_cliente_ref"),
            F.lit(None).cast("string").alias("id_cliente_ref2"),
            F.col("c.id_pais").alias("id_pais"),
            F.col("mc.cod_compania"),
            F.col("mc.cod_sucursal"),
            surrogate_key(F.col("mc.cod_compania"), F.col("mc.cod_sucursal")).alias(
                "id_sucursal"
            ),
            # null-guarded territorial pointer (m_cliente.py:105-117): empty
            # or absent postal code → NULL, else pais|postal
            F.when(
                F.col("mc.cod_zona_postal").isNull()
                | (F.col("mc.cod_zona_postal") == ""),
                F.lit(None).cast("string"),
            )
            .otherwise(
                surrogate_key(
                    F.trim(F.col("c.id_pais")),
                    F.coalesce(F.col("mc.cod_zona_postal"), F.lit("0")),
                )
            )
            .alias("id_eje_territorial"),
            # 'SG'-infixed classification pointer (m_cliente.py:118-124) —
            # matches the subgiro level m_clasificacion_cliente mints
            surrogate_key(
                F.col("mc.cod_compania"), F.lit("SG"), F.col("mc.cod_subgiro")
            ).alias("id_clasificacion_cliente"),
            surrogate_key(F.col("mc.cod_compania"), F.col("mc.cod_lista_precio")).alias(
                "id_lista_precio"
            ),
            F.col("mc.cod_cliente"),
            F.col("mc.nomb_cliente"),
            F.col("cc.cod_cuenta_clave"),
            F.col("cc.descripcion").alias("nomb_cuenta_clave"),
            F.lit(None).cast("string").alias("cod_segmento"),
            F.lit(None).cast("string").alias("desc_subsegmento"),
            F.lit(None).cast("string").alias("cod_cliente_ref"),
            F.lit(None).cast("string").alias("cod_cliente_ref2"),
            F.lit(None).cast("string").alias("cod_cliente_ref3"),
            F.lit(None).cast("string").alias("cod_cliente_ref4"),
            F.col("cn.desc_canal").alias("desc_canal_local"),
            F.col("g.desc_giro").alias("desc_giro_local"),
            F.col("mc.direccion"),
            F.col("mc.tipo_documento_identidad").alias("tipo_documento"),
            F.col("mc.nro_documento_identidad").alias("nro_documento"),
            F.col("tc.tipo_cliente"),
            F.coalesce(F.col("tc.tipo_cliente"), F.lit("N")).alias("cod_tipo_cliente"),
            F.coalesce(F.col("mc.cod_cliente_principal"), F.lit("0")).alias(
                "cod_cliente_principal"
            ),
            F.lit(None).cast("string").alias("cod_cliente_transferencia"),
            F.col("co.coord_x"),
            F.col("co.coord_y"),
            F.lit(None).cast("date").alias("fecha_baja"),
            F.col("mc.es_activo"),
            F.col("mc.es_activo").alias("estado"),
            F.col("mc.fecha_creacion"),
            F.col("mc.fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_cliente", "string"),
            ("id_cliente_ref", "string"),
            ("id_cliente_ref2", "string"),
            ("id_pais", "string"),
            ("cod_compania", "string"),
            ("cod_sucursal", "string"),
            ("id_sucursal", "string"),
            ("id_eje_territorial", "string"),
            ("id_clasificacion_cliente", "string"),
            ("id_lista_precio", "string"),
            ("cod_cliente", "string"),
            ("nomb_cliente", "string"),
            ("cod_cuenta_clave", "string"),
            ("nomb_cuenta_clave", "string"),
            ("cod_segmento", "string"),
            ("desc_subsegmento", "string"),
            ("cod_cliente_ref", "string"),
            ("cod_cliente_ref2", "string"),
            ("cod_cliente_ref3", "string"),
            ("cod_cliente_ref4", "string"),
            ("desc_canal_local", "string"),
            ("desc_giro_local", "string"),
            ("direccion", "string"),
            ("tipo_documento", "string"),
            ("nro_documento", "string"),
            ("tipo_cliente", "string"),
            ("cod_tipo_cliente", "string"),
            ("cod_cliente_principal", "string"),
            ("cod_cliente_transferencia", "string"),
            ("coord_x", "string"),
            ("coord_y", "string"),
            ("fecha_baja", "date"),
            ("es_activo", "string"),
            ("estado", "string"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_cliente"),
        keys=["id_cliente", "cod_sucursal"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_eje_territorial_lite")
def job_m_eje_territorial_lite(ctx: JobContext) -> None:
    """Territorial hierarchy (`code/domain/m_eje_territorial.py:20-170`):
    each geographic level (NG1 departamento → NG2 provincia → NG3/NG4
    distrito/zona-postal) projects to one adjacency row; the postal level is
    deduped per (pais, zona_postal) with the reference's W1 row_number over
    ``cod_ng3 desc`` (several districts can share a postal code); levels
    union + distinct (U1 — expressed as unionByName, SURVEY §7.3.4). The
    reference's ``current_date()`` stamps become the injected clock."""
    ng1 = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_ng1", registry=ctx.registry)
    ng2 = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_ng2", registry=ctx.registry)
    ng3 = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_ng3", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    p = F.broadcast(pais.select("id_pais", "cod_pais")).alias("p")

    common = [
        F.lit("A").alias("estado"),
        F.lit(ctx.as_of).alias("fecha_creacion"),
    ]

    ng1_rows = (
        ng1.alias("de")
        .join(p, F.col("de.id_pais") == F.col("p.cod_pais"), "inner")
        .where(F.col("de.cod_ng1").isNotNull())
        .select(
            surrogate_key(F.col("p.id_pais"), F.col("de.cod_ng1")).alias("id_eje_territorial"),
            F.lit(None).cast("string").alias("id_eje_territorial_padre"),
            F.col("p.id_pais").alias("id_pais"),
            F.trim(F.col("de.cod_ng1")).alias("cod_eje_territorial"),
            F.lit(None).cast("string").alias("cod_eje_territorial_ref"),
            F.col("de.desc_ng1").alias("nomb_eje_territorial"),
            F.lit("NG1").alias("cod_tipo_eje_territorial"),
            *common,
        )
    )
    ng2_rows = (
        ng2.alias("pr")
        .join(p, F.col("pr.id_pais") == F.col("p.cod_pais"), "inner")
        .where(F.col("pr.cod_ng2").isNotNull())
        .select(
            surrogate_key(
                F.col("p.id_pais"), F.col("pr.cod_ng1"), F.col("pr.cod_ng2")
            ).alias("id_eje_territorial"),
            surrogate_key(F.col("p.id_pais"), F.col("pr.cod_ng1")).alias(
                "id_eje_territorial_padre"
            ),
            F.col("p.id_pais").alias("id_pais"),
            F.trim(F.col("pr.cod_ng2")).alias("cod_eje_territorial"),
            F.lit(None).cast("string").alias("cod_eje_territorial_ref"),
            F.col("pr.desc_ng2").alias("nomb_eje_territorial"),
            F.lit("NG2").alias("cod_tipo_eje_territorial"),
            *common,
        )
    )
    postal_base = top1_per_group(
        ng3.alias("di")
        .join(p, F.col("di.id_pais") == F.col("p.cod_pais"), "inner")
        .where(F.col("di.cod_zona_postal").isNotNull()),
        partition_by=[F.col("p.id_pais"), F.col("di.cod_zona_postal")],
        order_by=[F.col("di.cod_ng3").desc()],
    )
    # the deduped postal district materializes TWICE (m_eje_territorial.py:
    # 20-115): as the NG4 leaf (id = pais|postal) and as its NG3 parent
    # (id = pais|postal|NG3 pointing at the provincia) — the reference's
    # districts exist only through their postal code
    ng4_rows = postal_base.select(
        surrogate_key(F.col("p.id_pais"), F.col("di.cod_zona_postal")).alias(
            "id_eje_territorial"
        ),
        surrogate_key(
            F.col("p.id_pais"), F.col("di.cod_zona_postal"), F.lit("NG3")
        ).alias("id_eje_territorial_padre"),
        F.col("p.id_pais").alias("id_pais"),
        F.trim(F.col("di.cod_zona_postal")).alias("cod_eje_territorial"),
        F.concat_ws("|", F.col("di.cod_ng3"), F.col("di.cod_zona_postal")).alias(
            "cod_eje_territorial_ref"
        ),
        F.col("di.desc_ng3").alias("nomb_eje_territorial"),
        F.lit("NG4").alias("cod_tipo_eje_territorial"),
        *common,
    )
    ng3_rows = postal_base.select(
        surrogate_key(
            F.col("p.id_pais"), F.col("di.cod_zona_postal"), F.lit("NG3")
        ).alias("id_eje_territorial"),
        surrogate_key(
            F.col("p.id_pais"),
            F.col("di.cod_ng1"),
            F.col("di.cod_ng2"),
        ).alias("id_eje_territorial_padre"),
        F.col("p.id_pais").alias("id_pais"),
        F.trim(F.col("di.cod_zona_postal")).alias("cod_eje_territorial"),
        F.concat_ws("|", F.col("di.cod_ng3"), F.col("di.cod_zona_postal")).alias(
            "cod_eje_territorial_ref"
        ),
        F.col("di.desc_ng3").alias("nomb_eje_territorial"),
        F.lit("NG3").alias("cod_tipo_eje_territorial"),
        *common,
    )
    out = (
        ng1_rows.unionByName(ng2_rows)
        .unionByName(ng3_rows)
        .unionByName(ng4_rows)
        .distinct()
    )
    out = cast_projection(
        out,
        [
            ("id_eje_territorial", "string"),
            ("id_eje_territorial_padre", "string"),
            ("id_pais", "string"),
            ("cod_eje_territorial", "string"),
            ("cod_eje_territorial_ref", "string"),
            ("nomb_eje_territorial", "string"),
            ("cod_tipo_eje_territorial", "string"),
            ("estado", "string"),
            ("fecha_creacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_eje_territorial"),
        keys=["id_eje_territorial"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_estructura_comercial_lite")
def job_m_estructura_comercial_lite(ctx: JobContext) -> None:
    """Commercial-structure hierarchy (`code/domain/m_estructura_comercial.py:
    20-212`), all FIVE levels: one conformed adjacency row per node —

    - Ruta (`:21-55`): id comp|suc|fv|ruta, parent the zona, responsable the
      vendedor;
    - Zona (`:58-93`): parent is the reference's FIVE-part división pointer
      (comp|suc|region|subregion|centro_distribucion), responsable the
      supervisor;
    - División (`:96-146`): the division master joined to the DISTINCT zona
      geography to recover its sucursal/region/subregion context, parent
      the pais-scoped subregión, responsable the jefe de venta;
    - Subregión / Región (`:148-192`): pais-scoped ids, no sucursal or
      responsable (lit NULL);

    levels union + distinct (U1/U2). The reference stamps
    ``current_date()``; the engine stamps the injected ``ctx.as_of``
    (SURVEY §7.3.7 wall-clock rule)."""
    ruta = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_ruta", registry=ctx.registry)
    zona = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_zona", registry=ctx.registry)
    division = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_division", registry=ctx.registry
    )
    subregion = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_subregion", registry=ctx.registry
    )
    region = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_region", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    conformed = (
        comp.alias("mc")
        .join(F.broadcast(pais).alias("mp"), F.col("mp.cod_pais") == F.col("mc.cod_pais"), "inner")
        .select(F.col("mc.cod_compania").alias("cod_compania"), F.col("mp.id_pais"))
    )
    p_by_code = F.broadcast(pais.select("id_pais", "cod_pais"))
    stamps = [
        F.lit(ctx.as_of).alias("fecha_creacion"),
        F.lit(ctx.as_of).alias("fecha_modificacion"),
    ]
    null_s = F.lit(None).cast("string")

    def node(id_col, pais_col, suc_col, parent_col, resp_col, cod_col, desc_col, tipo, estado_col):
        return [
            id_col.alias("id_estructura_comercial"),
            pais_col.alias("id_pais"),
            suc_col.alias("id_sucursal"),
            parent_col.alias("id_estructura_comercial_padre"),
            resp_col.alias("id_responsable_comercial"),
            cod_col.cast("string").alias("cod_estructura_comercial"),
            desc_col.alias("nomb_estructura_comercial"),
            F.lit(tipo).alias("cod_tipo_estructura_comercial"),
            estado_col.alias("estado"),
            *stamps,
        ]

    rutas = (
        ruta.alias("n")
        .join(F.broadcast(conformed).alias("c"), "cod_compania", "inner")
        .select(*node(
            surrogate_key(F.col("cod_compania"), F.col("cod_sucursal"),
                          F.col("cod_fuerza_venta"), F.col("cod_ruta")),
            F.col("c.id_pais"),
            surrogate_key(F.col("cod_compania"), F.col("cod_sucursal")),
            surrogate_key(F.col("cod_compania"), F.col("cod_sucursal"), F.col("cod_zona")),
            surrogate_key(F.col("cod_compania"), F.col("cod_vendedor")),
            F.col("cod_ruta"), F.col("desc_ruta"), "Ruta", F.col("n.es_activo"),
        ))
    )
    zonas = (
        zona.alias("n")
        .join(F.broadcast(conformed).alias("c"), "cod_compania", "inner")
        .select(*node(
            surrogate_key(F.col("cod_compania"), F.col("cod_sucursal"), F.col("cod_zona")),
            F.col("c.id_pais"),
            surrogate_key(F.col("cod_compania"), F.col("cod_sucursal")),
            # the reference's 5-part división pointer (`:77-83`)
            surrogate_key(
                F.col("cod_compania"), F.col("cod_sucursal"), F.col("cod_region"),
                F.col("cod_subregion"), F.col("cod_centro_distribucion"),
            ),
            surrogate_key(F.col("cod_compania"), F.col("cod_supervisor")),
            F.col("cod_zona"), F.col("desc_zona"), "Zona", F.col("n.es_activo"),
        ))
    )
    zona_geo = zona.select(
        "cod_compania", "cod_sucursal", "cod_centro_distribucion",
        "cod_subregion", "cod_region",
    ).distinct()
    divisiones = (
        division.alias("n")
        .join(
            zona_geo.alias("mzd"),
            (F.col("n.cod_compania") == F.col("mzd.cod_compania"))
            & (F.col("n.cod_division") == F.col("mzd.cod_centro_distribucion")),
            "inner",
        )
        .join(
            F.broadcast(conformed).alias("c"),
            F.col("n.cod_compania") == F.col("c.cod_compania"),
            "inner",
        )
        .select(*node(
            surrogate_key(
                F.col("n.cod_compania"), F.col("mzd.cod_sucursal"),
                F.col("mzd.cod_region"), F.col("mzd.cod_subregion"),
                F.col("n.cod_division"),
            ),
            F.col("c.id_pais"),
            surrogate_key(F.col("n.cod_compania"), F.col("mzd.cod_sucursal")),
            surrogate_key(F.col("c.id_pais"), F.trim(F.col("mzd.cod_region")),
                          F.trim(F.col("mzd.cod_subregion"))),
            surrogate_key(F.col("n.cod_compania"), F.col("n.cod_jefe_venta")),
            F.trim(F.col("n.cod_division")), F.col("n.desc_division"),
            "División", F.col("n.es_activo"),
        ))
    )
    subregiones = (
        subregion.alias("n")
        .join(p_by_code.alias("mp"), F.col("mp.cod_pais") == F.col("n.cod_pais"), "inner")
        .select(*node(
            surrogate_key(F.col("mp.id_pais"), F.trim(F.col("cod_region")),
                          F.trim(F.col("cod_subregion"))),
            F.col("mp.id_pais"), null_s,
            surrogate_key(F.col("mp.id_pais"), F.trim(F.col("cod_region"))),
            null_s,
            F.trim(F.col("cod_subregion")), F.col("n.desc_subregion"),
            "Subregión", F.col("n.es_activo"),
        ))
    )
    regiones = (
        region.alias("n")
        .join(p_by_code.alias("mp"), F.col("mp.cod_pais") == F.col("n.cod_pais"), "inner")
        .select(*node(
            surrogate_key(F.col("mp.id_pais"), F.trim(F.col("cod_region"))),
            F.col("mp.id_pais"), null_s, null_s, null_s,
            F.trim(F.col("cod_region")), F.col("n.desc_region"),
            "Región", F.col("n.es_activo"),
        ))
    )
    out = (
        rutas.unionByName(zonas)
        .unionByName(divisiones)
        .unionByName(subregiones)
        .unionByName(regiones)
        .distinct()
    )
    out = cast_projection(
        out,
        [
            ("id_estructura_comercial", "string"),
            ("id_pais", "string"),
            ("id_sucursal", "string"),
            ("id_estructura_comercial_padre", "string"),
            ("id_responsable_comercial", "string"),
            ("cod_estructura_comercial", "string"),
            ("nomb_estructura_comercial", "string"),
            ("cod_tipo_estructura_comercial", "string"),
            ("estado", "string"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_estructura_comercial"),
        keys=["id_estructura_comercial"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_articulo_lite")
def job_m_articulo_lite(ctx: JobContext) -> None:
    """Product master — the reference's widest dim-conformance ladder
    (`code/domain/m_articulo.py:29-172`: 10 left joins to attribute masters
    over (compania, code) keys, all broadcastable dims). This slice keeps
    every select-list idiom of the original at reduced width —

    - the deepening join keys: linea (2-key) → familia (3-key) →
      subfamilia (4-key, the deepest, `:44-51`) plus the flat marca and
      categoria joins;
    - the corporate-article fallback: ``cod_articulo_corp`` of 0/NULL falls
      back to the article's own code, and the corp id mints from the
      RESOLVED code (`:100-110`);
    - coalesce-to-default attributes ('000' / '<ATTR> DEFAULT', `:113-128`);
    - the (linea, familia) classification flags (flg_jarabe/co2/azucar,
      `:146-163`).

    Absent masters resolve through the empty-schema fallback so the ladder
    never breaks (S3). Upsert on id_articulo partitioned by id_pais."""
    art = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_articulo", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    linea = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_linea", registry=ctx.registry)
    familia = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_familia", registry=ctx.registry)
    subfam = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_subfamilia", registry=ctx.registry
    )
    marca = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_marca", registry=ctx.registry)
    categ = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_categoria", registry=ctx.registry)

    # both branches string-typed: under ANSI the reference's bare form would
    # coerce the article code to the corp column's numeric type and throw
    cod_corp = F.when(
        F.coalesce(F.col("ma.cod_articulo_corp"), F.lit(0)) == 0, F.col("ma.cod_articulo")
    ).otherwise(F.col("ma.cod_articulo_corp").cast("string"))
    lin = F.coalesce(F.col("ml.cod_linea"), F.lit("00"))
    fam = F.coalesce(F.col("mf.cod_familia"), F.lit("000"))

    joined = (
        art.alias("ma")
        .join(comp.alias("mc"), F.col("ma.cod_compania") == F.col("mc.cod_compania"), "inner")
        .join(F.broadcast(pais).alias("mp"), F.col("mp.cod_pais") == F.col("mc.cod_pais"), "left")
        .join(
            F.broadcast(linea).alias("ml"),
            (F.col("ma.cod_compania") == F.col("ml.cod_compania"))
            & (F.col("ma.cod_linea") == F.col("ml.cod_linea")),
            "left",
        )
        .join(
            F.broadcast(familia).alias("mf"),
            (F.col("ma.cod_compania") == F.col("mf.cod_compania"))
            & (F.col("ma.cod_linea") == F.col("mf.cod_linea"))
            & (F.col("ma.cod_familia") == F.col("mf.cod_familia")),
            "left",
        )
        .join(
            F.broadcast(subfam).alias("ms"),
            (F.col("ma.cod_compania") == F.col("ms.cod_compania"))
            & (F.col("ma.cod_linea") == F.col("ms.cod_linea"))
            & (F.col("ma.cod_familia") == F.col("ms.cod_familia"))
            & (F.col("ma.cod_subfamilia") == F.col("ms.cod_subfamilia")),
            "left",
        )
        .join(
            F.broadcast(marca).alias("mm"),
            (F.col("ma.cod_compania") == F.col("mm.cod_compania"))
            & (F.col("ma.cod_marca") == F.col("mm.cod_marca")),
            "left",
        )
        .join(
            F.broadcast(categ).alias("mca"),
            (F.col("ma.cod_compania") == F.col("mca.cod_compania"))
            & (F.col("ma.cod_categoria") == F.col("mca.cod_categoria")),
            "left",
        )
        .select(
            surrogate_key(F.col("ma.cod_compania"), F.col("ma.cod_articulo")).alias(
                "id_articulo"
            ),
            F.col("mp.id_pais").alias("id_pais"),
            F.col("ma.cod_compania"),
            F.col("ma.cod_articulo"),
            cod_corp.alias("cod_articulo_corp"),
            surrogate_key(F.col("ma.cod_compania"), cod_corp).alias("id_articulo_corp"),
            F.col("ma.desc_articulo"),
            F.coalesce(F.col("ml.desc_linea"), F.lit("LINEA DEFAULT")).alias("desc_linea"),
            F.coalesce(F.col("mf.desc_familia"), F.lit("FAMILIA DEFAULT")).alias(
                "desc_familia"
            ),
            F.coalesce(F.col("ms.desc_subfamilia"), F.lit("SUBFAMILIA DEFAULT")).alias(
                "desc_subfamilia"
            ),
            F.coalesce(F.col("mm.cod_marca"), F.lit("000")).alias("cod_marca"),
            F.coalesce(F.col("mm.desc_marca"), F.lit("MARCA DEFAULT")).alias("desc_marca"),
            F.coalesce(F.col("mca.desc_categoria"), F.lit("CATEGORIA DEFAULT")).alias(
                "desc_categoria"
            ),
            # the reference's unidad-negocio master is commented out — the
            # columns land as typed NULL placeholders (m_articulo.py:138-139)
            F.lit(None).cast("string").alias("cod_unidad_negocio"),
            F.lit(None).cast("string").alias("desc_unidad_negocio"),
            F.when((lin == "03") & (fam == "003"), 1).otherwise(0).alias("flg_jarabe"),
            F.when((lin == "04") & (fam == "008"), 1).otherwise(0).alias("flg_co2"),
            F.when((lin == "04") & (fam == "001"), 1).otherwise(0).alias("flg_azucar"),
            F.col("ma.cant_unidad_paquete"),
            F.col("ma.es_activo"),
        )
    )
    out = cast_projection(
        joined,
        [
            ("id_articulo", "string"),
            ("id_pais", "string"),
            ("cod_compania", "string"),
            ("cod_articulo", "string"),
            ("cod_articulo_corp", "string"),
            ("id_articulo_corp", "string"),
            ("desc_articulo", "string"),
            ("desc_linea", "string"),
            ("desc_familia", "string"),
            ("desc_subfamilia", "string"),
            ("cod_marca", "string"),
            ("desc_marca", "string"),
            ("desc_categoria", "string"),
            ("cod_unidad_negocio", "string"),
            ("desc_unidad_negocio", "string"),
            ("flg_jarabe", "int"),
            ("flg_co2", "int"),
            ("flg_azucar", "int"),
            ("cant_unidad_paquete", "numeric(38,12)"),
            ("es_activo", "string"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_articulo"),
        keys=["id_articulo"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("t_venta_detalle_lite")
def job_t_venta_detalle_lite(ctx: JobContext) -> None:
    """Sales line-item fact — the reference's numerically richest job
    (`code/domain/t_venta_detalle.py:170-319`): per (venta, producto)
    conditional aggregates of the form

        sum( dispatch(op-type) × sign-factor × unit-conversion × fx )

    where the sign factor is −1 for credit notes (``NCC``,
    `t_venta_detalle.py:175`), the dispatch splits sale vs promotion rows
    (``cod_tipo_operacion == 'PRO'``), the unit conversion is
    ``(cant_paquete + cant_unidad / cant_unidad_paquete) · cant_paquete_caja``
    and money converts through the venta's resolved exchange rates
    (× tc_mn, ÷ tc_me). Full aggregate surface (`:214-319`): every money
    measure lands as an (mn, me) pair — neto/bruto (valorizado, cobrar),
    dscto/desnimp (descuento, descuento_sinimp), cobrar_vta (repeats the
    cobrar pair under the serving name, as the reference does), paquete
    (cajas × precio_paquete × fx — the reference's `:259-264` drops the
    parenthesis closing the cajas term so precio multiplies only the
    unit fraction; we keep the dimensionally coherent form), sugerido/full
    (lit(0) placeholders `:168-169`), valorizado_pro (the only PRO-dispatch
    money pair), impuesto1-6 (isc, igv, im3-im6). Non-key attributes and
    audit stamps ride along as A4 max-as-representative. Divisions run in
    decimal(20,6) (a fixed cast point — SURVEY §7.3.1: Spark's decimal
    division would otherwise promote/truncate scale differently than other
    engines)."""
    venta = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta", registry=ctx.registry)
    det = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_venta_detalle", registry=ctx.registry
    )
    art = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_articulo", registry=ctx.registry)
    ops = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_operacion", registry=ctx.registry)

    det = det.withColumn(
        "id_venta",
        # FIVE-part: the header mints cod_almacen into id_venta
        # (`t_venta.py:91`) and the detail repeats it (`t_venta_detalle.py`)
        surrogate_key(
            F.col("cod_compania"),
            F.col("cod_sucursal"),
            F.col("cod_almacen"),
            F.col("cod_documento_venta"),
            F.col("nro_documento_venta"),
        ),
    )
    joined = (
        det.alias("d")
        .join(venta.alias("v"), "id_venta", "inner")
        .join(
            F.broadcast(art).alias("ma"),
            (F.col("d.cod_compania") == F.col("ma.cod_compania"))
            & (F.col("d.cod_articulo") == F.col("ma.cod_articulo")),
            "left",
        )
        .join(
            F.broadcast(ops).alias("mo"),
            (F.col("d.cod_compania") == F.col("mo.cod_compania"))
            & (F.col("d.cod_operacion") == F.col("mo.cod_operacion")),
            "left",
        )
    )
    dec = lambda c: c.cast("decimal(20,6)")
    factor = F.when(F.col("v.cod_documento_venta") == "NCC", F.lit(-1)).otherwise(F.lit(1))
    es_pro = F.upper(F.col("mo.cod_tipo_operacion")) == "PRO"
    d_ven = F.when(~es_pro | es_pro.isNull(), F.lit(1)).otherwise(F.lit(0))
    d_pro = F.when(es_pro, F.lit(1)).otherwise(F.lit(0))
    cajas = (
        dec(F.col("d.cant_paquete")) + dec(F.col("d.cant_unidad")) / dec(F.col("ma.cant_unidad_paquete"))
    ) * dec(F.col("ma.cant_paquete_caja"))
    # volume variant (`t_venta_detalle.py:219-230`): packages expand to units
    # first, then scale by the article's unit volume
    volumen = (
        dec(F.col("d.cant_paquete")) * dec(F.col("ma.cant_unidad_paquete"))
        + dec(F.col("d.cant_unidad"))
    ) * dec(F.col("ma.cant_unidad_volumen"))
    def signed(dispatch, expr):
        return F.sum((dispatch * factor * expr).cast("decimal(38,12)"))

    def money_pair(dispatch, src_col, name):
        """The reference's (mn, me) idiom: × tipo_cambio_mn, ÷ tipo_cambio_me."""
        return [
            signed(dispatch, dec(src_col) * dec(F.col("v.tipo_cambio_mn"))).alias(
                f"{name}_mn"
            ),
            signed(dispatch, dec(src_col) / dec(F.col("v.tipo_cambio_me"))).alias(
                f"{name}_me"
            ),
        ]

    money = [
        *money_pair(d_ven, F.col("d.imp_valorizado"), "imp_neto_vta"),
        *money_pair(d_ven, F.col("d.imp_cobrar"), "imp_bruto_vta"),
        *money_pair(d_ven, F.col("d.imp_descuento"), "imp_dscto"),
        *money_pair(d_ven, F.col("d.imp_descuento_sinimp"), "imp_desnimp"),
        *money_pair(d_ven, F.col("d.imp_cobrar"), "imp_cobrar_vta"),
        signed(d_ven, cajas * dec(F.col("d.precio_paquete")) * dec(F.col("v.tipo_cambio_mn"))).alias("imp_paquete_vta_mn"),
        signed(d_ven, cajas * dec(F.col("d.precio_paquete")) / dec(F.col("v.tipo_cambio_me"))).alias("imp_paquete_vta_me"),
        *money_pair(d_ven, F.lit(0), "imp_sugerido"),
        *money_pair(d_ven, F.lit(0), "imp_full_vta"),
        *money_pair(d_pro, F.col("d.imp_valorizado"), "imp_valorizado_pro"),
        *money_pair(d_ven, F.col("d.imp_isc"), "imp_impuesto1"),
        *money_pair(d_ven, F.col("d.imp_igv"), "imp_impuesto2"),
        *money_pair(d_ven, F.col("d.imp_im3"), "imp_impuesto3"),
        *money_pair(d_ven, F.col("d.imp_im4"), "imp_impuesto4"),
        *money_pair(d_ven, F.col("d.imp_im5"), "imp_impuesto5"),
        *money_pair(d_ven, F.col("d.imp_im6"), "imp_impuesto6"),
    ]
    out = (
        joined.groupBy(
            F.col("id_venta"), F.col("d.cod_articulo").alias("id_producto")
        )
        .agg(
            F.max(F.col("v.id_pais")).alias("id_pais"),
            F.max(F.col("v.id_periodo")).alias("id_periodo"),
            signed(d_ven, cajas).alias("cant_caja_fisica_ven"),
            signed(d_pro, cajas).alias("cant_caja_fisica_pro"),
            signed(d_ven, volumen).alias("cant_caja_volumen_ven"),
            signed(d_pro, volumen).alias("cant_caja_volumen_pro"),
            *money,
            F.max(F.col("d.fecha_creacion")).alias("fecha_creacion"),
            F.max(F.col("d.fecha_modificacion")).alias("fecha_modificacion"),
            F.max(F.col("d.es_eliminado")).alias("es_eliminado"),
        )
    )
    money_names = [
        f"{base}_{cur}"
        for base in (
            "imp_neto_vta", "imp_bruto_vta", "imp_dscto", "imp_desnimp",
            "imp_cobrar_vta", "imp_paquete_vta", "imp_sugerido", "imp_full_vta",
            "imp_valorizado_pro", "imp_impuesto1", "imp_impuesto2",
            "imp_impuesto3", "imp_impuesto4", "imp_impuesto5", "imp_impuesto6",
        )
        for cur in ("mn", "me")
    ]
    out = cast_projection(
        out,
        [
            ("id_venta", "string"),
            ("id_producto", "string"),
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("cant_caja_fisica_ven", "numeric(38,12)"),
            ("cant_caja_fisica_pro", "numeric(38,12)"),
            ("cant_caja_volumen_ven", "numeric(38,12)"),
            ("cant_caja_volumen_pro", "numeric(38,12)"),
            *[(n, "numeric(38,12)") for n in money_names],
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
            ("es_eliminado", "string"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_venta_detalle"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_pedido_lite")
def job_t_pedido_lite(ctx: JobContext) -> None:
    """Order fact with the ADES-channel merge (`code/domain/t_pedido.py`),
    full reference shape:

    - TWO header branches — the main '200' documents (`:52-122`) and the
      ADES mirror with renamed business keys ('200'/'300',
      cod_documento_transaccion / nro_comprobante, `:124-192`) — each
      walking the same ladder as t_venta: compania+moneda bridge, zona →
      división (keyed by tp.cod_centro_distribucion here, `:68-73`) →
      región/subregión with DEFAULT coalescing, and the day's exchange-rate
      row on fecha_pedido (`:87-94`; orders carry no currency, so the rate
      resolves from mtc.cod_moneda alone, `:119-120`);
    - the DETAIL pre-aggregation (`:194-268`): per (documento, cliente) the
      detail's attributes collapse A4-style (max) and mint the 5-part
      ``id_pedido`` WITH the client — several clients can share one
      document, so the detail, not the header, owns the order identity;
    - header ⋈ detail-agg inner join per branch (`:270-350`), ADES rows
      already present dropped with a left_anti on id_pedido (`:352-359`),
      remainder unions by name (`:362`), wide cast with the lit(None)
      placeholder block (id_visita, id_modelo_atencion, id_supervisor,
      id_jefe_venta, nro_pedido_ref, cod_tipo_atencion)."""
    pedido = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido", registry=ctx.registry
    )
    ades = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_ades", registry=ctx.registry
    )
    det = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_detalle",
        registry=ctx.registry,
    )
    ades_det = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_ades_detalle",
        registry=ctx.registry,
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    m_parametro = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_parametro", registry=ctx.registry
    )
    m_tipo_cambio = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_cambio", registry=ctx.registry
    )
    m_zona = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_zona", registry=ctx.registry)
    m_region = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_region", registry=ctx.registry, principal_only=True
    )
    m_subregion = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_subregion", registry=ctx.registry, principal_only=True
    )
    m_division = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_division", registry=ctx.registry
    )

    compania = (
        m_compania.alias("mc")
        .join(
            m_parametro.alias("mpar"),
            F.col("mpar.id_compania") == F.col("mc.cod_compania"),
            "left",
        )
        .join(m_pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(
            F.col("mc.cod_compania").alias("cod_compania"),
            F.col("mc.cod_pais").alias("cod_pais"),
            F.col("mp.id_pais").alias("id_pais"),
            F.col("mpar.cod_moneda_mn").alias("moneda_mn"),
        )
    )

    def header(df, doc_col, nro_col, doc_filter, origen_col):
        return (
            df.filter(doc_filter)
            .filter(period_filter(F.col("fecha_pedido"), ctx.periods))
            .alias("tp")
            .join(F.broadcast(compania).alias("c"), ["cod_compania"], "inner")
            .join(
                F.broadcast(m_zona).alias("mzo"),
                (F.col("mzo.cod_compania") == F.col("tp.cod_compania"))
                & (F.col("mzo.cod_sucursal") == F.col("tp.cod_sucursal"))
                & (F.col("mzo.cod_zona") == F.col("tp.cod_zona_distribucion")),
                "left",
            )
            .join(
                F.broadcast(m_division).alias("mcd"),
                (F.col("mcd.cod_division") == F.col("tp.cod_centro_distribucion"))
                & (F.col("mcd.cod_compania") == F.col("tp.cod_compania")),
                "left",
            )
            .join(
                F.broadcast(m_region).alias("mr"),
                (F.col("mr.cod_pais") == F.col("c.cod_pais"))
                & (F.col("mr.cod_region") == F.col("mzo.cod_region")),
                "left",
            )
            .join(
                F.broadcast(m_subregion).alias("msr"),
                (F.col("msr.cod_pais") == F.col("c.cod_pais"))
                & (F.col("msr.cod_region") == F.col("mzo.cod_region"))
                & (F.col("msr.cod_subregion") == F.col("mzo.cod_subregion")),
                "left",
            )
            .join(
                F.broadcast(m_tipo_cambio).alias("mtc"),
                (F.col("mtc.fecha") == F.col("tp.fecha_pedido"))
                & (F.col("mtc.cod_compania") == F.col("tp.cod_compania"))
                & (F.col("mtc.cod_moneda") == F.col("c.moneda_mn")),
                "left",
            )
            .select(
                F.col("c.id_pais"),
                period_yyyymm(F.col("tp.fecha_pedido")).alias("id_periodo"),
                F.col("tp.cod_compania").alias("id_compania"),
                surrogate_key(F.col("tp.cod_compania"), F.col("tp.cod_sucursal")).alias(
                    "id_sucursal"
                ),
                F.col(f"tp.{doc_col}").alias("cod_tipo_documento_pedido"),
                surrogate_key(
                    F.col("tp.cod_compania"),
                    F.col("tp.cod_sucursal"),
                    F.col(f"tp.{doc_col}"),
                    F.col(f"tp.{nro_col}"),
                ).alias("id_documento_pedido"),
                surrogate_key(F.col("tp.cod_compania"), F.col(f"tp.{origen_col}")).alias(
                    "id_origen_pedido"
                ),
                surrogate_key(F.col("tp.cod_compania"), F.col("tp.cod_tipo_pedido")).alias(
                    "id_tipo_pedido"
                ),
                surrogate_key(
                    F.col("tp.cod_compania"),
                    F.col("tp.cod_sucursal"),
                    F.col("tp.cod_fuerza_venta"),
                ).alias("id_fuerza_venta"),
                surrogate_key(F.col("tp.cod_compania"), F.col("tp.cod_vendedor")).alias(
                    "id_vendedor"
                ),
                F.lit(None).cast("string").alias("id_supervisor"),
                F.lit(None).cast("string").alias("id_jefe_venta"),
                surrogate_key(
                    F.col("tp.cod_compania"), F.col("tp.cod_condicion_pago")
                ).alias("id_forma_pago"),
                F.coalesce(F.col("mr.desc_region"), F.lit("REGION DEFAULT")).alias(
                    "desc_region"
                ),
                F.coalesce(F.col("msr.desc_subregion"), F.lit("SUBREGION DEFAULT")).alias(
                    "desc_subregion"
                ),
                F.col("mcd.desc_division"),
                F.col("tp.cod_centro_distribucion").alias("cod_division"),
                F.col("tp.cod_zona_distribucion").alias("cod_zona"),
                F.col("tp.fecha_entrega"),
                F.col("tp.fecha_pedido"),
                F.col("tp.fecha_pedido").alias("fecha_visita"),
                F.col("tp.fecha_creacion"),
                F.col("tp.fecha_modificacion"),
                F.lit(0).alias("es_eliminado"),
                # orders carry no currency of their own — the rate row alone
                # resolves both directions (t_pedido.py:119-120)
                F.when(F.col("mtc.cod_moneda") == F.col("c.moneda_mn"), F.lit(1))
                .otherwise(F.col("mtc.tc_venta"))
                .alias("tipo_cambio_mn"),
                F.when(F.col("mtc.cod_moneda").isin("DOL", "USD"), F.lit(1))
                .otherwise(F.col("mtc.tc_venta"))
                .alias("tipo_cambio_me"),
            )
        )

    def detail_agg(df, doc_col, nro_col, lista_col, ruta_col, doc_filter):
        return (
            df.filter(doc_filter)
            .select(
                surrogate_key(
                    F.col("cod_compania"), F.col("cod_sucursal"),
                    F.col(doc_col), F.col(nro_col),
                ).alias("id_documento_pedido"),
                surrogate_key(
                    F.col("cod_compania"), F.col("cod_sucursal"),
                    F.col(doc_col), F.col(nro_col), F.col("cod_cliente"),
                ).alias("id_pedido"),
                surrogate_key(F.col("cod_compania"), F.col("cod_cliente")).alias(
                    "id_cliente"
                ),
                F.col("cod_cliente"),
                surrogate_key(F.col("cod_compania"), F.col(lista_col)).alias(
                    "id_lista_precio"
                ),
                F.lit(None).cast("string").alias("id_pedido_ref"),
                F.col(ruta_col).alias("cod_ruta"),
                F.col("cod_modulo"),
                surrogate_key(F.col(nro_col), F.col("cod_cliente")).alias("nro_pedido"),
            )
            .groupBy("id_documento_pedido", "id_cliente")
            .agg(
                F.max("nro_pedido").alias("nro_pedido"),
                F.max("cod_cliente").alias("cod_cliente"),
                F.max("cod_ruta").alias("cod_ruta"),
                F.max("cod_modulo").alias("cod_modulo"),
                F.max("id_lista_precio").alias("id_lista_precio"),
                F.max("id_pedido").alias("id_pedido"),
                F.max("id_pedido_ref").alias("id_pedido_ref"),
            )
        )

    def stitch(hdr, dta):
        return hdr.alias("tp").join(
            dta.alias("tpd"),
            F.col("tpd.id_documento_pedido") == F.col("tp.id_documento_pedido"),
            "inner",
        )

    main = stitch(
        header(
            pedido, "cod_documento_pedido", "nro_documento_pedido",
            F.col("cod_documento_pedido") == "200",
            "cod_documento_pedido_origen",
        ),
        detail_agg(
            det, "cod_documento_pedido", "nro_documento_pedido",
            "cod_lista_precio", "cod_ruta",
            F.col("cod_documento_pedido") == "200",
        ),
    )
    extra = stitch(
        header(
            ades, "cod_documento_transaccion", "nro_comprobante",
            F.col("cod_documento_transaccion").isin("200", "300"),
            "cod_tipo_documento_origen",
        ),
        detail_agg(
            ades_det, "cod_documento_transaccion", "nro_comprobante",
            "cod_lista_precios", "cod_ruta_distribucion",
            F.col("cod_documento_transaccion").isin("200", "300"),
        ),
    )
    combined_cols = [
        F.col("tp.id_pais"), F.col("tp.id_periodo"), F.col("tpd.id_pedido"),
        F.col("tpd.id_pedido_ref"), F.col("tp.id_compania"), F.col("tp.id_sucursal"),
        F.col("tp.cod_tipo_documento_pedido"), F.col("tpd.id_cliente"),
        F.col("tpd.cod_cliente"), F.col("tp.id_origen_pedido"),
        F.col("tp.id_tipo_pedido"), F.col("tp.id_fuerza_venta"),
        F.col("tp.id_vendedor"), F.col("tp.id_supervisor"), F.col("tp.id_jefe_venta"),
        F.col("tpd.id_lista_precio"), F.col("tp.id_forma_pago"),
        F.col("tp.desc_region"), F.col("tp.desc_subregion"), F.col("tp.desc_division"),
        F.col("tp.cod_division"), F.col("tp.cod_zona"), F.col("tpd.cod_ruta"),
        F.col("tpd.cod_modulo"), F.col("tpd.nro_pedido"), F.col("tp.fecha_pedido"),
        F.col("tp.fecha_entrega"), F.col("tp.fecha_visita"),
        F.col("tp.tipo_cambio_mn"), F.col("tp.tipo_cambio_me"),
        F.col("tp.fecha_creacion"), F.col("tp.fecha_modificacion"),
        F.col("tp.es_eliminado"),
    ]
    main = main.select(*combined_cols)
    extra = extra.select(*combined_cols)
    extra_new = extra.join(main.select("id_pedido"), "id_pedido", "left_anti")
    unioned = main.unionByName(extra_new)
    out = cast_projection(
        unioned.select(
            "*",
            F.lit(None).cast("string").alias("id_visita"),
            F.lit(None).cast("string").alias("id_modelo_atencion"),
            F.lit(None).cast("string").alias("nro_pedido_ref"),
            F.lit(None).cast("string").alias("cod_tipo_atencion"),
        ),
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_pedido", "string"),
            ("id_pedido_ref", "string"),
            ("id_compania", "string"),
            ("id_sucursal", "string"),
            ("cod_tipo_documento_pedido", "string"),
            ("id_visita", "string"),
            ("id_cliente", "string"),
            ("cod_cliente", "string"),
            ("id_modelo_atencion", "string"),
            ("id_origen_pedido", "string"),
            ("id_tipo_pedido", "string"),
            ("id_fuerza_venta", "string"),
            ("id_vendedor", "string"),
            ("id_supervisor", "string"),
            ("id_jefe_venta", "string"),
            ("id_lista_precio", "string"),
            ("id_forma_pago", "string"),
            ("desc_region", "string"),
            ("desc_subregion", "string"),
            ("desc_division", "string"),
            ("cod_division", "string"),
            ("cod_zona", "string"),
            ("cod_ruta", "string"),
            ("cod_modulo", "string"),
            ("nro_pedido", "string"),
            ("nro_pedido_ref", "string"),
            ("cod_tipo_atencion", "string"),
            ("fecha_pedido", "date"),
            ("fecha_entrega", "date"),
            ("fecha_visita", "date"),
            ("tipo_cambio_mn", "numeric(38,12)"),
            ("tipo_cambio_me", "numeric(38,12)"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
            ("es_eliminado", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_pedido"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_venta_lite")
def job_t_venta_lite(ctx: JobContext) -> None:
    """Sales fact following `code/domain/t_venta.py:10-170`: early period
    filter (P3) on fecha_liquidacion plus the document-class guards (P4 —
    `:45-48`: CMD/RMD excluded, flg_facglob/flg_refact null-coalesced to
    'F'), company master enriched with the local currency from m_parametro
    (`t_venta.py:28-40`), the distribution geography ladder (`:55-80`: zona →
    división joined on the ZONA code `:63-66`, región/subregión on the
    COMPANY's country + zona's region pointers, REGION/SUBREGION DEFAULT
    coalescing), the day's exchange-rate row joined on (fecha_emision,
    compania, moneda_mn) (`t_venta.py:79-85`), rate resolution via
    functions.currency (`t_venta.py:118-119`), the full pipe surrogate id
    block (§1.3, `:91-105` — id_venta is FIVE-part with cod_almacen),
    soft-delete flag for annulled documents, cast projection (P2), dynamic
    partition overwrite on (id_pais, id_periodo) (K1)."""
    venta = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_venta", registry=ctx.registry
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)
    m_parametro = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_parametro", registry=ctx.registry
    )
    m_tipo_cambio = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_cambio", registry=ctx.registry
    )
    m_zona = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_zona", registry=ctx.registry)
    m_region = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_region", registry=ctx.registry, principal_only=True
    )
    m_subregion = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_subregion", registry=ctx.registry, principal_only=True
    )
    m_division = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_division", registry=ctx.registry
    )

    # sargable rewrite of the reference's date_format(...).isin(PERIODOS)
    # (t_venta.py:25) — the range predicate reaches the parquet scan and
    # prunes row groups/files; exact membership preserved (operators.pruning)
    filtered = venta.filter(
        period_filter(F.col("fecha_liquidacion"), ctx.periods)
        & ~F.col("cod_documento_venta").isin("CMD", "RMD")
        & (F.coalesce(F.col("flg_facglob"), F.lit("F")) == "F")
        & (F.coalesce(F.col("flg_refact"), F.lit("F")) == "F")
    )
    compania = (
        m_compania.alias("mc")
        .join(
            m_parametro.alias("mpar"),
            F.col("mpar.id_compania") == F.col("mc.cod_compania"),
            "left",
        )
        .join(m_pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(
            F.col("mc.cod_compania").alias("cod_compania"),
            F.col("mc.cod_pais").alias("cod_pais"),
            F.col("mp.id_pais").alias("id_pais"),
            F.col("mpar.cod_moneda_mn").alias("moneda_mn"),
        )
    )
    enriched = (
        filtered.alias("v")
        # inner per the reference (t_venta.py:49-53): sales rows whose
        # company is absent from the master are dropped, not null-padded —
        # a left here would land them in a NULL id_pais partition
        .join(F.broadcast(compania).alias("c"), ["cod_compania"], "inner")
        .join(
            F.broadcast(m_zona).alias("mzo"),
            (F.col("mzo.cod_compania") == F.col("v.cod_compania"))
            & (F.col("mzo.cod_sucursal") == F.col("v.cod_sucursal"))
            & (F.col("mzo.cod_zona") == F.col("v.cod_zona")),
            "left",
        )
        .join(
            # the reference keys división by the ZONA code (t_venta.py:63-66)
            F.broadcast(m_division).alias("mcd"),
            (F.col("mcd.cod_division") == F.col("mzo.cod_zona"))
            & (F.col("mcd.cod_compania") == F.col("mzo.cod_compania")),
            "left",
        )
        .join(
            F.broadcast(m_region).alias("mr"),
            (F.col("mr.cod_pais") == F.col("c.cod_pais"))
            & (F.col("mr.cod_region") == F.col("mzo.cod_region")),
            "left",
        )
        .join(
            F.broadcast(m_subregion).alias("msr"),
            (F.col("msr.cod_pais") == F.col("c.cod_pais"))
            & (F.col("msr.cod_region") == F.col("mzo.cod_region"))
            & (F.col("msr.cod_subregion") == F.col("mzo.cod_subregion")),
            "left",
        )
        .join(
            F.broadcast(m_tipo_cambio).alias("mtc"),
            (F.col("mtc.fecha") == F.col("v.fecha_emision"))
            & (F.col("mtc.cod_compania") == F.col("c.cod_compania"))
            & (F.col("mtc.cod_moneda") == F.col("c.moneda_mn")),
            "left",
        )
        .select(
            surrogate_key(
                F.col("v.cod_compania"),
                F.col("v.cod_sucursal"),
                F.col("v.cod_almacen"),
                F.col("v.cod_documento_venta"),
                F.col("v.nro_documento_venta"),
            ).alias("id_venta"),
            F.col("c.id_pais").alias("id_pais"),
            period_yyyymm(F.col("v.fecha_liquidacion")).alias("id_periodo"),
            F.col("v.cod_compania"),
            F.col("v.cod_sucursal"),
            # conformed dimension ids minted from the same row, exactly the
            # reference's id block (`t_venta.py:91-95`) — these are what the
            # analytics facts join on downstream
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_sucursal")).alias(
                "id_sucursal"
            ),
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_cliente")).alias(
                "id_cliente"
            ),
            surrogate_key(
                F.col("v.cod_compania"),
                F.col("v.cod_sucursal"),
                F.col("v.cod_documento_pedido"),
                F.col("v.nro_documento_pedido"),
                F.col("v.cod_cliente"),
            ).alias("id_pedido"),
            surrogate_key(
                F.col("v.cod_compania"),
                F.col("v.cod_documento_venta"),
                F.col("v.cod_procedimiento"),
            ).alias("id_tipo_venta"),
            surrogate_key(
                F.col("v.cod_compania"),
                F.col("v.cod_sucursal"),
                F.col("v.cod_fuerza_venta"),
            ).alias("id_fuerza_venta"),
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_vendedor")).alias(
                "id_vendedor"
            ),
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_supervisor")).alias(
                "id_supervisor"
            ),
            F.lit(None).cast("string").alias("id_jefe_venta"),
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_lista_precio")).alias(
                "id_lista_precio"
            ),
            surrogate_key(
                F.col("v.cod_compania"), F.col("v.cod_documento_pedido")
            ).alias("id_tipo_documento"),
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_forma_pago")).alias(
                "id_forma_pago"
            ),
            surrogate_key(F.col("v.cod_compania"), F.col("v.cod_motivo_rechazo")).alias(
                "id_motivo_rechazo"
            ),
            F.lit(None).cast("string").alias("id_motivo_nota_credito"),
            F.col("v.nro_comprobante").alias("nro_venta"),
            F.lit(None).cast("string").alias("nro_venta_ref"),
            F.coalesce(F.col("mr.desc_region"), F.lit("REGION DEFAULT")).alias(
                "desc_region"
            ),
            F.coalesce(F.col("msr.desc_subregion"), F.lit("SUBREGION DEFAULT")).alias(
                "desc_subregion"
            ),
            F.col("mcd.desc_division"),
            F.col("v.cod_zona"),
            F.col("v.cod_ruta"),
            F.col("v.cod_modulo"),
            F.col("v.cod_documento_venta"),
            F.col("v.nro_documento_venta"),
            F.col("v.cod_cliente"),
            F.col("v.cod_moneda"),
            F.when(F.col("v.cod_estado_comprobante") == "002", F.lit(1))
            .otherwise(F.lit(0))
            .alias("es_anulado"),
            F.col("v.fecha_pedido"),
            F.col("v.fecha_creacion"),
            F.col("v.fecha_modificacion"),
            exchange_rate_mn(
                F.col("v.cod_moneda"),
                F.col("c.moneda_mn"),
                F.col("mtc.tc_venta"),
                F.col("v.tipo_cambio_mn"),
            ).alias("tipo_cambio_mn"),
            exchange_rate_me(
                F.col("v.cod_moneda"),
                F.col("mtc.tc_venta"),
                F.col("v.tipo_cambio_me"),
            ).alias("tipo_cambio_me"),
            F.col("v.imp_venta"),
            F.col("v.fecha_liquidacion"),
            F.col("v.fecha_emision"),
            F.when(F.col("v.cod_estado_comprobante") == "002", F.lit(1))
            .otherwise(F.lit(0))
            .alias("es_eliminado"),
        )
    )
    out = cast_projection(
        enriched,
        [
            ("id_venta", "string"),
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("cod_compania", "string"),
            ("cod_sucursal", "string"),
            ("id_sucursal", "string"),
            ("id_cliente", "string"),
            ("id_pedido", "string"),
            ("id_tipo_venta", "string"),
            ("id_fuerza_venta", "string"),
            ("id_vendedor", "string"),
            ("id_supervisor", "string"),
            ("id_jefe_venta", "string"),
            ("id_lista_precio", "string"),
            ("id_tipo_documento", "string"),
            ("id_forma_pago", "string"),
            ("id_motivo_rechazo", "string"),
            ("id_motivo_nota_credito", "string"),
            ("nro_venta", "string"),
            ("nro_venta_ref", "string"),
            ("desc_region", "string"),
            ("desc_subregion", "string"),
            ("desc_division", "string"),
            ("cod_zona", "string"),
            ("cod_ruta", "string"),
            ("cod_modulo", "string"),
            ("cod_documento_venta", "string"),
            ("nro_documento_venta", "string"),
            ("cod_cliente", "string"),
            ("cod_moneda", "string"),
            ("es_anulado", "int"),
            ("fecha_pedido", "date"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
            ("tipo_cambio_mn", "numeric(12,6)"),
            ("tipo_cambio_me", "numeric(12,6)"),
            ("imp_venta", "numeric(38,12)"),
            ("fecha_liquidacion", "date"),
            ("fecha_emision", "date"),
            ("es_eliminado", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_venta"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_visita_lite")
def job_t_visita_lite(ctx: JobContext) -> None:
    """Visit fact (`code/domain/t_visita.py:20-75`): the historic visit
    stream period-filtered on fecha_visita, company bridged to the country
    dim (`:25-32`), and every outgoing key minted as a pipe surrogate —
    including the 5-part visit identity (day|compania|cliente|sucursal|
    fuerza_venta, `:44`), the widest composite key in the reference.
    Constant audit flags (es_activo=1, es_eliminado=0, `:50-53`), cast
    projection, dynamic partition overwrite on (id_pais, id_periodo)."""
    visitas = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_historico_visita", registry=ctx.registry
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    filtered = visitas.filter(period_filter(F.col("fecha_visita"), ctx.periods))
    compania = (
        m_compania.alias("mc")
        .join(m_pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(
            F.col("mc.cod_compania").alias("cod_compania"),
            F.trim(F.col("mp.id_pais")).alias("id_pais"),
        )
    )
    enriched = (
        filtered.alias("tvi")
        .join(F.broadcast(compania).alias("c"), ["cod_compania"], "inner")
        .select(
            F.col("c.id_pais").alias("id_pais"),
            period_yyyymm(F.col("tvi.fecha_visita")).alias("id_periodo"),
            surrogate_key(
                F.date_format(F.col("tvi.fecha_visita"), "yyyyMMdd"),
                F.col("tvi.cod_compania"),
                F.col("tvi.cod_cliente"),
                F.col("tvi.cod_sucursal"),
                F.col("tvi.cod_fuerza_venta"),
            ).alias("id_visita"),
            surrogate_key(F.col("tvi.cod_compania"), F.col("tvi.cod_sucursal")).alias(
                "id_sucursal"
            ),
            surrogate_key(F.col("tvi.cod_compania"), F.col("tvi.cod_cliente")).alias(
                "id_cliente"
            ),
            surrogate_key(
                F.col("tvi.cod_compania"),
                F.col("tvi.cod_sucursal"),
                F.col("tvi.cod_fuerza_venta"),
            ).alias("id_fuerza_venta"),
            F.lit(None).alias("cod_visita"),
            F.col("tvi.fecha_visita").alias("fecha_visita"),
            F.lit(1).alias("es_activo"),
            F.col("tvi.fecha_visita").alias("fecha_creacion"),
            F.col("tvi.fecha_modificacion").alias("fecha_modificacion"),
            F.lit(0).alias("es_eliminado"),
        )
    )
    out = cast_projection(
        enriched,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_visita", "string"),
            ("id_sucursal", "string"),
            ("id_cliente", "string"),
            ("id_fuerza_venta", "string"),
            ("cod_visita", "string"),
            ("fecha_visita", "date"),
            ("es_activo", "int"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
            ("es_eliminado", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_visita"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_movimiento_inventario_lite")
def job_t_movimiento_inventario_lite(ctx: JobContext) -> None:
    """Inventory-movement header (`code/domain/t_movimiento_inventario.py:
    24-145`, full serving width): period filter on fecha_almacen, movements kept
    only when their procedure code is whitelisted by the document-type
    bridge (`:41-56` — the reference inner-joins the bridge and re-selects;
    expressed here as a ``left_semi`` so a duplicated bridge row can never
    fan out the fact), company bridged to country, and a LEFT join to the
    in-transit table yielding destination warehouse columns plus the
    ``tiene_transito`` existence flag (`:99-138`). Coalesce defaults for
    document-state codes ('000', `:125-128`), dynamic partition overwrite
    on (id_pais, id_periodo)."""
    mov = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_movimiento_inventario", registry=ctx.registry
    )
    transito = read_table(
        ctx.spark,
        ctx.catalog,
        Layer.STAGE,
        "t_movimiento_inventario_transito",
        registry=ctx.registry,
    )
    doc_almacen = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_documento_almacen", registry=ctx.registry
    )
    doc_trans = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_documento_transaccion", registry=ctx.registry
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    filtered = mov.filter(period_filter(F.col("fecha_almacen"), ctx.periods))
    whitelist = (
        doc_almacen.alias("mda")
        .join(
            doc_trans.alias("mdt"),
            (F.col("mda.cod_compania") == F.col("mdt.cod_compania"))
            & (F.col("mda.cod_transaccion") == F.col("mdt.cod_documento_transaccion")),
            "inner",
        )
        .select(F.col("mda.cod_compania"), F.col("mda.cod_transaccion"))
    )
    allowed = filtered.join(
        F.broadcast(whitelist),
        (filtered["cod_compania"] == whitelist["cod_compania"])
        & (filtered["cod_procedimiento"] == whitelist["cod_transaccion"]),
        "left_semi",
    )
    compania = (
        m_compania.alias("mc")
        .join(m_pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
        .select(
            F.col("mc.cod_compania").alias("cod_compania"),
            F.col("mp.id_pais").alias("id_pais"),
        )
    )
    enriched = (
        allowed.alias("tmi")
        .join(F.broadcast(compania).alias("c"), ["cod_compania"], "inner")
        .join(
            transito.alias("tmit"),
            F.col("tmi.id_documento_almacen") == F.col("tmit.id_documento_almacen"),
            "left",
        )
        .select(
            F.col("c.id_pais").alias("id_pais"),
            period_yyyymm(F.col("tmi.fecha_almacen")).alias("id_periodo"),
            F.col("tmi.id_movimiento_almacen").alias("id_movimiento_almacen"),
            F.col("tmi.id_movimiento_ingreso"),
            F.col("tmi.cod_compania").alias("id_compania_origen"),
            F.col("tmi.id_sucursal").alias("id_sucursal_origen"),
            F.col("tmi.id_almacen").alias("id_almacen_origen"),
            F.col("tmit.id_compania_destino").alias("id_compania_destino"),
            F.col("tmit.id_sucursal_destino").alias("id_sucursal_destino"),
            F.col("tmit.id_almacen_destino").alias("id_almacen_destino"),
            F.col("tmi.id_compania_referencia"),
            F.col("tmi.id_sucursal_referencia"),
            F.col("tmi.id_almacen_referencia"),
            surrogate_key(
                F.col("tmi.cod_compania"), F.col("tmi.cod_transportista")
            ).alias("id_transportista"),
            surrogate_key(F.col("tmi.cod_compania"), F.col("tmi.cod_vehiculo")).alias(
                "id_medio_transporte"
            ),
            F.col("tmi.id_vendedor"),
            F.col("tmi.id_persona"),
            F.col("tmi.id_procedimiento").alias("id_tipo_procedimiento"),
            F.col("tmi.cod_procedimiento").alias("cod_procedimiento"),
            F.col("tmi.fecha_emision"),
            F.col("tmi.fecha_liquidacion"),
            F.col("tmi.fecha_almacen").alias("fecha_almacen"),
            F.col("tmi.nro_documento_almacen").alias("nro_documento_almacen"),
            F.col("tmi.nro_documento_movimiento"),
            F.coalesce(F.col("tmi.cod_estado_comprobante"), F.lit("000")).alias(
                "cod_estado_comprobante"
            ),
            F.col("tmi.nro_serie_alm").alias("nro_serie_almacen"),
            F.col("tmi.nropricoal").alias("nro_comprobante_pre"),
            F.coalesce(
                F.col("tmi.cod_tipo_documento_liquidacion"), F.lit("000")
            ).alias("cod_documento_liquidacion"),
            F.col("tmi.nro_documento_liquidacion"),
            F.col("tmi.cod_documento_transaccion"),
            F.coalesce(F.col("tmi.cod_documento_transaccion1"), F.lit("")).alias(
                "cod_documento_transaccion_ref1"
            ),
            F.col("tmi.nro_documento_almacen1").alias("nro_documento_almacen_ref1"),
            F.col("tmi.cod_tipo_documento_referencia2").alias(
                "cod_documento_transaccion_ref2"
            ),
            F.col("tmi.nro_documento_almacen_referencia2").alias(
                "nro_documento_almacen_ref2"
            ),
            F.col("tmit.estado").alias("desc_estado_transito"),
            F.when(F.col("tmit.id_documento_almacen").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("tiene_transito"),
            F.col("tmi.usuario_creacion"),
            F.col("tmi.fecha_creacion").alias("fecha_creacion"),
            F.col("tmi.usuario_modificacion"),
            F.col("tmi.fecha_modificacion").alias("fecha_modificacion"),
            # the reference hard-codes es_eliminado = 1 for every movement
            # (t_movimiento_inventario.py:143) — kept faithfully
            F.lit(1).alias("es_eliminado"),
        )
    )
    out = cast_projection(
        enriched,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_movimiento_almacen", "string"),
            ("id_movimiento_ingreso", "string"),
            ("id_compania_origen", "string"),
            ("id_sucursal_origen", "string"),
            ("id_almacen_origen", "string"),
            ("id_compania_destino", "string"),
            ("id_sucursal_destino", "string"),
            ("id_almacen_destino", "string"),
            ("id_compania_referencia", "string"),
            ("id_sucursal_referencia", "string"),
            ("id_almacen_referencia", "string"),
            ("id_transportista", "string"),
            ("id_medio_transporte", "string"),
            ("id_vendedor", "string"),
            ("id_persona", "string"),
            ("id_tipo_procedimiento", "string"),
            ("cod_procedimiento", "string"),
            ("fecha_emision", "date"),
            ("fecha_liquidacion", "date"),
            ("fecha_almacen", "date"),
            ("nro_documento_almacen", "string"),
            ("nro_documento_movimiento", "string"),
            ("cod_estado_comprobante", "string"),
            ("nro_serie_almacen", "string"),
            ("nro_comprobante_pre", "string"),
            ("cod_documento_liquidacion", "string"),
            ("nro_documento_liquidacion", "string"),
            ("cod_documento_transaccion", "string"),
            ("cod_documento_transaccion_ref1", "string"),
            ("nro_documento_almacen_ref1", "string"),
            ("cod_documento_transaccion_ref2", "string"),
            ("nro_documento_almacen_ref2", "string"),
            ("desc_estado_transito", "string"),
            ("tiene_transito", "int"),
            ("usuario_creacion", "string"),
            ("fecha_creacion", "timestamp"),
            ("usuario_modificacion", "string"),
            ("fecha_modificacion", "timestamp"),
            ("es_eliminado", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_movimiento_inventario"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("m_tipo_venta_lite")
def job_m_tipo_venta_lite(ctx: JobContext) -> None:
    """Sales-type dim (`code/domain/m_tipo_venta.py:19-59`): procedure
    master bridged to its document type, conformed to country, and
    restricted to document-sale transactions by an inner join against the
    DCV-filtered transaction-type whitelist (`:19-21,38-43` — the same
    pre-filtered-whitelist shape as t_movimiento_inventario's bridge). The
    3-part pipe id (compania|doc|procedimiento, `:45-51`), the reference's
    'ninguno' description default (`:54`), and its current_date() stamps as
    the injected clock. Upsert on id_tipo_venta partitioned by id_pais."""
    proc = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_procedimiento", registry=ctx.registry
    )
    tipo_doc = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_documento", registry=ctx.registry
    )
    tipo_trans = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_transaccion", registry=ctx.registry
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    dcv = tipo_trans.filter(F.col("cod_tipo_transaccion") == "DCV").select(
        "cod_compania", "cod_documento_transaccion"
    )
    bridge = company_country_bridge(m_compania, m_pais)
    out = (
        proc.alias("d")
        .join(
            tipo_doc.alias("c"),
            (F.col("d.cod_compania") == F.col("c.cod_compania"))
            & (F.col("d.cod_documento_transaccion") == F.col("c.cod_tipo_documento")),
            "inner",
        )
        .join(F.broadcast(bridge).alias("e"), F.col("d.cod_compania") == F.col("e.cod_compania"), "inner")
        .join(
            F.broadcast(dcv).alias("tt"),
            (F.col("c.cod_compania") == F.col("tt.cod_compania"))
            & (F.col("c.cod_tipo_documento") == F.col("tt.cod_documento_transaccion")),
            "left_semi",
        )
        .select(
            surrogate_key(
                F.col("d.cod_compania"),
                F.col("d.cod_documento_transaccion"),
                F.col("d.cod_procedimiento"),
            ).alias("id_tipo_venta"),
            F.col("e.id_pais").alias("id_pais"),
            F.col("d.cod_procedimiento").alias("cod_tipo_venta"),
            F.coalesce(F.col("d.desc_procedimiento"), F.lit("ninguno")).alias(
                "nomb_tipo_venta"
            ),
            F.col("d.cod_tipo_operacion").alias("cod_tipo_operacion"),
            F.lit(ctx.as_of).alias("fecha_creacion"),
            F.lit(ctx.as_of).alias("fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_tipo_venta", "string"),
            ("id_pais", "string"),
            ("cod_tipo_venta", "string"),
            ("nomb_tipo_venta", "string"),
            ("cod_tipo_operacion", "string"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_tipo_venta"),
        keys=["id_tipo_venta"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("t_pedido_detalle_lite")
def job_t_pedido_detalle_lite(ctx: JobContext) -> None:
    """Order-line fact (`code/domain/t_pedido_detalle.py:24-424`, reduced
    measure width): both order-detail sources (main doc '200', ADES docs
    '200'/'300') period-filter, conform to one shape, pre-aggregate on the
    8-part natural key, ADES rows already present anti-join away and the
    remainder unions in by name (`:207-220` — same J4/U2 idiom as t_pedido);
    the union joins article + procedure masters, keeps sale-like operations
    (VEN/PRO/EXP/OBS, `:233`) and re-aggregates with the signed A2 family
    (`:253-365`): NCC credit notes flip sign, PRO (promo) rows split into
    their own measures, and quantities convert package→case
    (``cajas + botellas/unidad_paquete``) and →volume
    (``cajas*unidad_paquete + botellas``) through the article factors.
    ``nullif`` guards the package division exactly like the reference's
    null-on-zero runtime. Write partitioned by (id_pais, id_periodo)."""
    ped = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_detalle", registry=ctx.registry
    )
    ades = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_documento_pedido_ades_detalle",
        registry=ctx.registry,
    )
    art = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_articulo", registry=ctx.registry)
    proc = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_procedimiento", registry=ctx.registry
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    bridge = company_country_bridge(m_compania, m_pais)
    key = ["cod_compania", "cod_sucursal", "cod_almacen_emisor",
           "cod_documento_transaccion", "nro_comprobante", "cod_cliente",
           "cod_articulo", "cod_procedimiento"]

    def conform(df, doc_col, nro_col, alm_col, docs, qty):
        cajas, botellas, cajas_asig, botellas_asig = qty
        return (
            df.filter(period_filter(F.col("fecha_pedido"), ctx.periods))
            .filter(F.col(doc_col).isin(docs))
            .join(F.broadcast(bridge), "cod_compania", "inner")
            .select(
                F.col("id_pais"),
                F.col("cod_compania"),
                F.col("cod_sucursal"),
                F.col(alm_col).alias("cod_almacen_emisor"),
                F.col(doc_col).alias("cod_documento_transaccion"),
                F.col(nro_col).alias("nro_comprobante"),
                F.col("cod_cliente"),
                F.col("cod_articulo"),
                F.col("cod_procedimiento"),
                F.col("fecha_pedido"),
                F.col(cajas).alias("cantidad_cajas"),
                F.col(botellas).alias("cantidad_botellas"),
                F.col(cajas_asig).alias("cantidad_cajas_asignada"),
                F.col(botellas_asig).alias("cantidad_botellas_asignada"),
                F.col("fecha_creacion"),
                F.col("fecha_modificacion"),
                F.lit(0).alias("es_eliminado"),
            )
            .groupBy(*key)
            .agg(
                F.max("id_pais").alias("id_pais"),
                F.max("fecha_pedido").alias("fecha_pedido"),
                F.sum("cantidad_cajas").alias("cantidad_cajas"),
                F.sum("cantidad_botellas").alias("cantidad_botellas"),
                F.sum("cantidad_cajas_asignada").alias("cantidad_cajas_asignada"),
                F.sum("cantidad_botellas_asignada").alias("cantidad_botellas_asignada"),
                F.max("fecha_creacion").alias("fecha_creacion"),
                F.max("fecha_modificacion").alias("fecha_modificacion"),
                F.max("es_eliminado").alias("es_eliminado"),
            )
        )

    main = conform(
        ped, "cod_documento_pedido", "nro_documento_pedido", "cod_almacen", ["200"],
        ("cant_paquete", "cant_unidad", "cant_paquete_asignado", "cant_unidad_asignado"),
    )
    extra = conform(
        ades, "cod_documento_transaccion", "nro_comprobante", "cod_almacen_emisor",
        ["200", "300"],
        ("cantidad_cajas", "cantidad_botellas", "cantidad_cajas_asignada",
         "cantidad_botellas_asignada"),
    )
    extra_new = extra.join(main.select(*key), key, "left_anti")
    unioned = main.unionByName(extra_new)

    sign = F.when(F.upper(F.col("dpd.cod_documento_transaccion")) == "NCC", -1).otherwise(1)
    is_pro = F.upper(F.col("mp.cod_tipo_operacion")) == "PRO"
    # package→case and package→volume conversions through article factors;
    # nullif reproduces the reference's null-on-zero division
    fisica = (
        F.col("dpd.cantidad_cajas")
        + F.col("dpd.cantidad_botellas") / F.nullif(F.col("ma.cant_unidad_paquete"), F.lit(0))
    ) * F.col("ma.cant_paquete_caja")
    volumen = (
        F.col("dpd.cantidad_cajas") * F.col("ma.cant_unidad_paquete")
        + F.col("dpd.cantidad_botellas")
    ) * F.col("ma.cant_unidad_volumen")
    fisica_asig = (
        F.col("dpd.cantidad_cajas_asignada")
        + F.col("dpd.cantidad_botellas_asignada")
        / F.nullif(F.col("ma.cant_unidad_paquete"), F.lit(0))
    ) * F.col("ma.cant_paquete_caja")
    volumen_asig = (
        F.col("dpd.cantidad_cajas_asignada") * F.col("ma.cant_unidad_paquete")
        + F.col("dpd.cantidad_botellas_asignada")
    ) * F.col("ma.cant_unidad_volumen")

    def split(expr, pro: bool):
        gate = F.when(is_pro if pro else ~is_pro, 1).otherwise(0)
        return F.sum(gate * sign * expr)

    out = (
        unioned.alias("dpd")
        .join(
            F.broadcast(art).alias("ma"),
            (F.col("dpd.cod_compania") == F.col("ma.cod_compania"))
            & (F.col("dpd.cod_articulo") == F.col("ma.cod_articulo")),
            "inner",
        )
        .join(
            F.broadcast(proc).alias("mp"),
            (F.col("dpd.cod_compania") == F.col("mp.cod_compania"))
            & (F.col("dpd.cod_documento_transaccion") == F.col("mp.cod_documento_transaccion"))
            & (F.col("dpd.cod_procedimiento") == F.col("mp.cod_procedimiento")),
            "inner",
        )
        .where(F.upper(F.col("mp.cod_tipo_operacion")).isin(["VEN", "PRO", "EXP", "OBS"]))
        .groupBy(*[F.col(f"dpd.{k}") for k in key[:7]])
        .agg(
            F.max("dpd.id_pais").alias("id_pais"),
            F.max("dpd.fecha_pedido").alias("fecha_pedido"),
            split(fisica, False).alias("cant_cajafisica_ped"),
            split(volumen, False).alias("cant_cajavolumen_ped"),
            split(fisica, True).alias("cant_cajafisica_ped_pro"),
            split(volumen, True).alias("cant_cajavolumen_ped_pro"),
            split(fisica_asig, False).alias("cant_cajafisica_asignado_ped"),
            split(volumen_asig, False).alias("cant_cajavolumen_asignado_ped"),
            split(fisica_asig, True).alias("cant_cajafisica_asignado_ped_pro"),
            split(volumen_asig, True).alias("cant_cajavolumen_asignado_ped_pro"),
            F.max("dpd.fecha_creacion").alias("fecha_creacion"),
            F.max("dpd.fecha_modificacion").alias("fecha_modificacion"),
            F.max("dpd.es_eliminado").alias("es_eliminado"),
        )
        .select(
            F.col("id_pais"),
            period_yyyymm(F.col("fecha_pedido")).alias("id_periodo"),
            surrogate_key(
                F.col("cod_compania"), F.col("cod_sucursal"),
                F.col("cod_documento_transaccion"), F.col("nro_comprobante"),
                F.col("cod_cliente"),
            ).alias("id_pedido"),
            surrogate_key(F.col("cod_compania"), F.col("cod_articulo")).alias("id_articulo"),
            F.col("fecha_pedido"),
            F.col("cant_cajafisica_ped"),
            F.col("cant_cajavolumen_ped"),
            F.col("cant_cajafisica_ped_pro"),
            F.col("cant_cajavolumen_ped_pro"),
            F.col("cant_cajafisica_asignado_ped"),
            F.col("cant_cajavolumen_asignado_ped"),
            F.col("cant_cajafisica_asignado_ped_pro"),
            F.col("cant_cajavolumen_asignado_ped_pro"),
            F.col("fecha_creacion").cast("date").alias("fecha_creacion"),
            F.col("fecha_modificacion").cast("date").alias("fecha_modificacion"),
            F.col("es_eliminado"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_pedido", "string"),
            ("id_articulo", "string"),
            ("fecha_pedido", "date"),
            ("cant_cajafisica_ped", "decimal(38,12)"),
            ("cant_cajavolumen_ped", "decimal(38,12)"),
            ("cant_cajafisica_ped_pro", "decimal(38,12)"),
            ("cant_cajavolumen_ped_pro", "decimal(38,12)"),
            ("cant_cajafisica_asignado_ped", "decimal(38,12)"),
            ("cant_cajavolumen_asignado_ped", "decimal(38,12)"),
            ("cant_cajafisica_asignado_ped_pro", "decimal(38,12)"),
            ("cant_cajavolumen_asignado_ped_pro", "decimal(38,12)"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
            ("es_eliminado", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_pedido_detalle"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("t_movimiento_inventario_detalle_lite")
def job_t_movimiento_inventario_detalle_lite(ctx: JobContext) -> None:
    """Inventory-movement detail (`code/domain/t_movimiento_inventario_
    detalle.py:26-236`, full serving width): period filter on fecha_almacen;
    the warehouse-document master supplies the operation direction
    (`cod_operacion_origen` S=entry / R=exit) which signs every quantity
    (`:79-81`) and splits directional ingreso/salida measures (`:82-89`);
    in-transit quantities gate on (estado='PLI' AND doc='GRA') (`:92-93`);
    kardex op falls back to the row's own operation for REV procedures
    (`:94`); package→case totals via the article factor with the
    reference's zero-package guard (`:143-146`); valuation LEFT-joins the
    period-close CPM and the purchase exchange rate with a zero-rate guard
    on the ME conversion (`:163-168`). Write partitioned (id_pais,
    id_periodo)."""
    det = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_movimiento_inventario_detalle",
        registry=ctx.registry,
    )
    doc_almacen = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_documento_almacen", registry=ctx.registry
    )
    art = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_articulo", registry=ctx.registry)
    cpm = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "t_cierre_inventario_cpm", registry=ctx.registry
    )
    tc = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_cambio", registry=ctx.registry
    )
    param = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_parametro", registry=ctx.registry
    )
    m_compania = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
    )
    m_pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    # company bridge carries the local-currency code for the rate join
    bridge = company_country_bridge(m_compania, m_pais, param)
    entrada = F.col("mda.cod_operacion_origen") == "S"
    salida = F.col("mda.cod_operacion_origen") == "R"
    sign = F.when(entrada, 1).otherwise(-1)
    transito = (F.col("tmid.estado") == "PLI") & (
        F.col("tmid.cod_documento_transaccion") == "GRA"
    )
    base = (
        det.alias("tmid")
        .filter(period_filter(F.col("fecha_almacen"), ctx.periods))
        .join(
            F.broadcast(doc_almacen).alias("mda"),
            (F.col("tmid.cod_compania") == F.col("mda.cod_compania"))
            & (F.col("tmid.cod_procedimiento") == F.col("mda.cod_transaccion")),
            "inner",
        )
        .join(F.broadcast(bridge).alias("b"), F.col("tmid.cod_compania") == F.col("b.cod_compania"), "inner")
        .join(
            F.broadcast(art).alias("ma"),
            F.col("tmid.id_articulo") == F.col("ma.id_articulo"),
            "inner",
        )
        .select(
            F.col("b.id_pais"),
            period_yyyymm(F.col("tmid.fecha_almacen")).alias("id_periodo"),
            F.col("tmid.cod_compania").alias("id_compania"),
            F.col("tmid.id_sucursal"),
            F.col("tmid.id_almacen"),
            F.col("tmid.id_articulo"),
            F.col("tmid.id_movimiento_almacen"),
            F.col("tmid.fecha_almacen"),
            F.col("tmid.cod_documento_transaccion"),
            F.col("tmid.nro_documento_almacen"),
            F.col("tmid.cod_procedimiento"),
            F.col("tmid.id_centro_costo"),
            F.col("tmid.nro_documento_movimiento"),
            F.col("tmid.nro_linea_comprobante"),
            F.col("tmid.cod_documento_transaccion_ref"),
            F.col("tmid.nro_documento_almacen_ref"),
            F.col("tmid.cod_estado_comprobante"),
            F.col("tmid.cod_motivo"),
            F.col("tmid.cod_unidad_articulo"),
            F.col("tmid.nro_secuencia_origen"),
            F.col("tmid.usuario_creacion"),
            F.col("tmid.fecha_creacion"),
            F.col("tmid.usuario_modificacion"),
            F.col("tmid.fecha_modificacion"),
            (sign * F.col("tmid.cant_cajas")).alias("cant_cajafisica"),
            (sign * F.col("tmid.cant_botellas")).alias("cant_unidades"),
            (sign * F.col("tmid.cant_unidades")).alias("cant_unidades_total"),
            F.when(entrada, F.col("tmid.cant_cajas")).otherwise(0).alias(
                "cant_cajafisica_ingresada"
            ),
            F.when(salida, F.col("tmid.cant_cajas")).otherwise(0).alias(
                "cant_cajafisica_salida"
            ),
            F.when(entrada, F.col("tmid.cant_botellas")).otherwise(0).alias(
                "cant_unidades_ingresada"
            ),
            F.when(salida, F.col("tmid.cant_botellas")).otherwise(0).alias(
                "cant_unidades_salida"
            ),
            F.when(entrada, F.col("tmid.cant_unidades")).otherwise(0).alias(
                "cant_unidades_total_ingresada"
            ),
            F.when(salida, F.col("tmid.cant_unidades")).otherwise(0).alias(
                "cant_unidades_total_salida"
            ),
            F.col("tmid.costo_unitario"),
            F.when(entrada, F.col("tmid.costo_total")).otherwise(0).alias(
                "imp_total_ingreso"
            ),
            F.when(salida, F.col("tmid.costo_total")).otherwise(0).alias(
                "imp_total_salida"
            ),
            F.when(transito, F.col("tmid.cant_unidades")).otherwise(0).alias(
                "cant_unidades_transito"
            ),
            F.when(transito, F.col("tmid.costo_total")).otherwise(0).alias(
                "imp_total_transito"
            ),
            F.when(
                F.col("tmid.cod_procedimiento") == "REV", F.col("tmid.operacion_kardex")
            )
            .otherwise(F.col("mda.cod_operacion_origen"))
            .alias("cod_operacion_kardex"),
            F.col("tmid.costo_total").alias("imp_total"),
            F.col("ma.cant_unidad_paquete"),
            F.col("b.moneda_mn"),
        )
        .withColumn(
            "cant_cajafisica_total",
            F.when(
                F.col("cant_unidad_paquete") == 0, F.col("cant_cajafisica")
            ).otherwise(
                F.col("cant_cajafisica")
                + F.col("cant_unidades") / F.col("cant_unidad_paquete")
            ),
        )
    )
    out = (
        base.alias("thad")
        .join(
            cpm.alias("c"),
            (F.col("c.id_sucursal") == F.col("thad.id_sucursal"))
            & (F.col("c.id_articulo") == F.col("thad.id_articulo"))
            & (F.col("c.id_periodo") == F.col("thad.id_periodo")),
            "left",
        )
        .join(
            F.broadcast(tc).alias("mtc"),
            (F.col("thad.id_compania") == F.col("mtc.cod_compania"))
            & (F.col("thad.fecha_almacen") == F.col("mtc.fecha"))
            & (F.col("thad.moneda_mn") == F.col("mtc.cod_moneda")),
            "left",
        )
        .select(
            F.col("thad.id_pais"),
            F.col("thad.id_periodo"),
            F.col("thad.id_compania"),
            F.col("thad.id_sucursal"),
            F.col("thad.id_almacen"),
            F.col("thad.id_articulo"),
            F.col("thad.id_movimiento_almacen"),
            F.col("thad.fecha_almacen"),
            F.col("thad.cod_documento_transaccion"),
            F.col("thad.nro_documento_almacen"),
            F.col("thad.cod_procedimiento"),
            F.col("thad.cod_operacion_kardex"),
            F.col("thad.id_centro_costo"),
            F.col("thad.nro_documento_movimiento"),
            F.col("thad.nro_linea_comprobante"),
            F.col("thad.cod_documento_transaccion_ref").alias(
                "cod_documento_transaccion_referencia"
            ),
            F.col("thad.nro_documento_almacen_ref").alias(
                "nro_documento_almacen_referencia"
            ),
            F.col("thad.cod_estado_comprobante"),
            F.col("thad.cod_motivo"),
            F.col("thad.cod_unidad_articulo").alias("cod_unidad_almacen"),
            F.col("thad.nro_secuencia_origen"),
            F.col("thad.cant_cajafisica"),
            F.col("thad.cant_cajafisica_total"),
            F.col("thad.cant_unidades"),
            F.col("thad.cant_unidades_total"),
            F.col("thad.cant_cajafisica_ingresada"),
            F.when(
                F.col("thad.cant_unidad_paquete") == 0,
                F.col("thad.cant_cajafisica_ingresada"),
            )
            .otherwise(
                F.col("thad.cant_cajafisica_ingresada")
                + F.col("thad.cant_unidades_ingresada") / F.col("thad.cant_unidad_paquete")
            )
            .alias("cant_cajafisica_ingresada_total"),
            F.col("thad.cant_cajafisica_salida"),
            F.when(
                F.col("thad.cant_unidad_paquete") == 0,
                F.col("thad.cant_cajafisica_salida"),
            )
            .otherwise(
                F.col("thad.cant_cajafisica_salida")
                + F.col("thad.cant_unidades_salida") / F.col("thad.cant_unidad_paquete")
            )
            .alias("cant_cajafisica_salida_total"),
            F.col("thad.cant_unidades_ingresada"),
            F.col("thad.cant_unidades_salida"),
            F.col("thad.cant_unidades_total_ingresada"),
            F.col("thad.cant_unidades_total_salida"),
            F.col("thad.costo_unitario").alias("imp_unitario"),
            F.col("thad.imp_total"),
            F.col("thad.imp_total_ingreso"),
            F.col("thad.imp_total_salida"),
            F.col("thad.cant_unidades_transito"),
            F.col("thad.imp_total_transito"),
            F.col("c.imp_cpm").alias("precio_unitario_mn"),
            F.when(F.col("mtc.tc_compra") == 0, 0)
            .otherwise(F.col("c.imp_cpm") / F.col("mtc.tc_compra"))
            .alias("precio_unitario_me"),
            (F.col("thad.cant_cajafisica") * F.col("c.imp_cpm")).alias("imp_valorizado_mn"),
            (
                F.col("thad.cant_cajafisica")
                * F.col("c.imp_cpm")
                / F.nullif(F.col("mtc.tc_compra"), F.lit(0))
            ).alias("imp_valorizado_me"),
            F.col("c.imp_saldo_inicial"),
            F.col("c.imp_saldo_final"),
            F.col("c.imp_ingreso").alias("imp_valorizado_ingreso"),
            F.col("c.imp_salida").alias("imp_valorizado_salida"),
            F.col("thad.usuario_creacion"),
            F.col("thad.fecha_creacion"),
            F.col("thad.usuario_modificacion"),
            F.col("thad.fecha_modificacion"),
            # the reference's hard-coded constant (`:173`) — kept faithfully
            F.lit(1).alias("es_eliminado"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_compania", "string"),
            ("id_sucursal", "string"),
            ("id_almacen", "string"),
            ("id_articulo", "string"),
            ("id_movimiento_almacen", "string"),
            ("fecha_almacen", "date"),
            ("cod_documento_transaccion", "string"),
            ("nro_documento_almacen", "string"),
            ("cod_procedimiento", "string"),
            ("cod_operacion_kardex", "string"),
            ("id_centro_costo", "string"),
            ("nro_documento_movimiento", "string"),
            ("nro_linea_comprobante", "string"),
            ("cod_documento_transaccion_referencia", "string"),
            ("nro_documento_almacen_referencia", "string"),
            ("cod_estado_comprobante", "string"),
            ("cod_motivo", "string"),
            ("cod_unidad_almacen", "string"),
            ("nro_secuencia_origen", "string"),
            ("cant_cajafisica", "numeric(38,12)"),
            ("cant_cajafisica_total", "numeric(38,12)"),
            ("cant_unidades", "numeric(38,12)"),
            ("cant_unidades_total", "numeric(38,12)"),
            ("cant_cajafisica_ingresada", "numeric(38,12)"),
            ("cant_cajafisica_ingresada_total", "numeric(38,12)"),
            ("cant_cajafisica_salida", "numeric(38,12)"),
            ("cant_cajafisica_salida_total", "numeric(38,12)"),
            ("cant_unidades_ingresada", "numeric(38,12)"),
            ("cant_unidades_salida", "numeric(38,12)"),
            ("cant_unidades_total_ingresada", "numeric(38,12)"),
            ("cant_unidades_total_salida", "numeric(38,12)"),
            ("imp_unitario", "numeric(38,12)"),
            ("imp_total", "numeric(38,12)"),
            ("imp_total_ingreso", "numeric(38,12)"),
            ("imp_total_salida", "numeric(38,12)"),
            ("cant_unidades_transito", "numeric(38,12)"),
            ("imp_total_transito", "numeric(38,12)"),
            ("precio_unitario_mn", "numeric(38,12)"),
            ("precio_unitario_me", "numeric(38,12)"),
            ("imp_valorizado_mn", "numeric(38,12)"),
            ("imp_valorizado_me", "numeric(38,12)"),
            ("imp_saldo_inicial", "numeric(30,4)"),
            ("imp_saldo_final", "numeric(30,4)"),
            ("imp_valorizado_ingreso", "numeric(30,4)"),
            ("imp_valorizado_salida", "numeric(30,4)"),
            ("usuario_creacion", "string"),
            ("fecha_creacion", "timestamp"),
            ("usuario_modificacion", "string"),
            ("fecha_modificacion", "timestamp"),
            ("es_eliminado", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "t_movimiento_inventario_detalle"),
        partition_by=["id_pais", "id_periodo"],
    )


@DOMAIN_JOBS.register("m_transportista_lite")
def job_m_transportista_lite(ctx: JobContext) -> None:
    """Carrier master (`code/domain/m_transportista.py:20-55`): carrier ⋈
    compania ⋈ pais, person master joined on the extraction-minted
    id (`:24` — id_transportista doubles as id_persona), carrier type
    left-joined on the 2-key (compania, tipo) for its description (`:25-28`).
    cod_transportista keeps the reference's integer cast (`:48`). Upsert on
    id_transportista partitioned by id_pais. All right sides are small
    masters — broadcast."""
    trans = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_transportista", registry=ctx.registry
    )
    persona = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_persona", registry=ctx.registry)
    tipo = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_tipo_transportista", registry=ctx.registry
    )
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    bridge = company_country_bridge(comp, pais)
    out = (
        trans.alias("mt")
        .join(F.broadcast(bridge).alias("b"), F.col("mt.cod_compania") == F.col("b.cod_compania"), "inner")
        .join(
            persona.alias("mpers"),
            F.col("mpers.id_persona") == F.col("mt.id_transportista"),
            "inner",
        )
        .join(
            F.broadcast(tipo).alias("mtt"),
            (F.col("mt.cod_tipo_transportista") == F.col("mtt.cod_tipo_transportista"))
            & (F.col("mt.cod_compania") == F.col("mtt.cod_compania")),
            "left",
        )
        .select(
            F.col("mt.id_transportista"),
            F.col("b.id_pais"),
            F.col("mt.cod_transportista"),
            F.col("mpers.nomb_persona").alias("nomb_transportista"),
            F.col("mt.cod_tipo_transportista"),
            F.col("mtt.descripcion1").alias("desc_tipo_transportista"),
            F.col("mpers.nro_documento").alias("ruc_transportista"),
            F.col("mt.fecha_creacion"),
            F.col("mt.fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_transportista", "string"),
            ("id_pais", "string"),
            ("cod_transportista", "int"),
            ("nomb_transportista", "string"),
            ("cod_tipo_transportista", "string"),
            ("desc_tipo_transportista", "string"),
            ("ruc_transportista", "string"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_transportista"),
        keys=["id_transportista"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_responsable_comercial_lite")
def job_m_responsable_comercial_lite(ctx: JobContext) -> None:
    """Sales-rep master (`code/domain/m_responsable_comercial.py:17-43`):
    vendedor ⋈ persona on the 2-key (vendedor, compania), conformed to
    country; id minted from trimmed compania|vendedor (`:32-35`), estado a
    typed NULL placeholder, current_date() stamps as the injected clock
    cast to timestamp (`:40-42`)."""
    vend = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_vendedor", registry=ctx.registry)
    persona = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_persona", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    bridge = company_country_bridge(comp, pais)
    out = (
        vend.alias("mv")
        .join(
            persona.alias("mpe"),
            (F.col("mv.cod_vendedor") == F.col("mpe.cod_persona"))
            & (F.col("mv.cod_compania") == F.col("mpe.cod_compania")),
            "inner",
        )
        .join(F.broadcast(bridge).alias("b"), F.col("mv.cod_compania") == F.col("b.cod_compania"), "inner")
        .select(
            surrogate_key(
                F.trim(F.col("mv.cod_compania")), F.trim(F.col("mv.cod_vendedor"))
            ).alias("id_responsable_comercial"),
            F.col("b.id_pais"),
            F.trim(F.col("mv.cod_vendedor")).alias("cod_responsable_comercial"),
            F.col("mpe.nomb_persona").alias("nomb_responsable_comercial"),
            F.col("mv.cod_tipo_vendedor").alias("cod_tipo_responsable_comercial"),
            F.lit(None).alias("estado"),
            F.lit(ctx.as_of).alias("fecha_creacion"),
            F.lit(ctx.as_of).alias("fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_responsable_comercial", "string"),
            ("id_pais", "string"),
            ("cod_responsable_comercial", "string"),
            ("nomb_responsable_comercial", "string"),
            ("cod_tipo_responsable_comercial", "string"),
            ("estado", "string"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_responsable_comercial"),
        keys=["id_responsable_comercial"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_modulo_lite")
def job_m_modulo_lite(ctx: JobContext) -> None:
    """Module master (`code/domain/m_modulo.py:18-77`): module ⋈ sucursal
    (2-key) ⋈ compania ⋈ ruta (4-key: compania, sucursal, fuerza_venta,
    ruta) ⋈ pais; composite pipe ids for sucursal (2-part), estructura
    comercial (4-part) and modelo_atencion (from the ruta's modelo,
    `:48-51`); periodo_visita/desc_fuerza_venta kept as NULL placeholders;
    estado from the sucursal activity flag; clock stamps cast to date."""
    mod = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_modulo", registry=ctx.registry)
    ruta = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_ruta", registry=ctx.registry)
    suc = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_sucursal", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    bridge = company_country_bridge(comp, pais)
    out = (
        mod.alias("mm")
        .join(
            suc.alias("ms"),
            (F.col("ms.cod_compania") == F.col("mm.cod_compania"))
            & (F.col("ms.cod_sucursal") == F.col("mm.cod_sucursal")),
            "inner",
        )
        .join(F.broadcast(bridge).alias("b"), F.col("ms.cod_compania") == F.col("b.cod_compania"), "inner")
        .join(
            ruta.alias("mrd"),
            (F.col("mrd.cod_compania") == F.col("mm.cod_compania"))
            & (F.col("mrd.cod_sucursal") == F.col("mm.cod_sucursal"))
            & (F.col("mrd.cod_fuerza_venta") == F.col("mm.cod_fuerza_venta"))
            & (F.col("mrd.cod_ruta") == F.col("mm.cod_ruta")),
            "inner",
        )
        .select(
            F.col("mm.id_modulo"),
            F.col("b.id_pais"),
            surrogate_key(
                F.trim(F.col("mm.cod_compania")), F.trim(F.col("mm.cod_sucursal"))
            ).alias("id_sucursal"),
            surrogate_key(
                F.trim(F.col("mm.cod_compania")),
                F.trim(F.col("mm.cod_sucursal")),
                F.col("mm.cod_fuerza_venta").cast("string"),
                F.col("mm.cod_ruta").cast("string"),
            ).alias("id_estructura_comercial"),
            surrogate_key(
                F.trim(F.col("mm.cod_compania")), F.trim(F.col("mrd.cod_modelo_atencion"))
            ).alias("id_modelo_atencion"),
            F.col("mm.cod_modulo"),
            F.col("mm.desc_modulo"),
            F.lit(None).alias("desc_fuerza_venta"),
            F.lit(None).alias("periodo_visita"),
            F.col("ms.es_activo").alias("estado"),
            F.lit(ctx.as_of).alias("fecha_creacion"),
            F.lit(ctx.as_of).alias("fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_modulo", "string"),
            ("id_pais", "string"),
            ("id_sucursal", "string"),
            ("id_estructura_comercial", "string"),
            ("id_modelo_atencion", "string"),
            ("cod_modulo", "string"),
            ("desc_modulo", "string"),
            ("desc_fuerza_venta", "string"),
            ("periodo_visita", "string"),
            ("estado", "string"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_modulo"),
        keys=["id_modulo"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_clasificacion_cliente_lite")
def job_m_clasificacion_cliente_lite(ctx: JobContext) -> None:
    """Client-classification hierarchy (`code/domain/m_clasificacion_cliente
    .py:18-121`): the consumption-relation bridge expands into three
    levels — subgiro → giro → canal — each a join of the relation against
    its visibility master, each minting a typed pipe id
    (compania|SG/GR/CN|codes) and a parent pointer one level up; the three
    branches dedup independently then union (reference positional union →
    engine unionByName per SURVEY §7.3.4). Upsert on id_clasificacion_cliente
    partitioned by id_pais."""
    rel = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "i_relacion_consumo", registry=ctx.registry
    )
    canal = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_canal", registry=ctx.registry)
    subgiro = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_subgiro", registry=ctx.registry)
    giro = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_giro", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    conformed = rel.alias("irc").join(
        F.broadcast(company_country_bridge(comp, pais)).alias("b"),
        F.col("irc.cod_compania") == F.col("b.cod_compania"),
        "inner",
    )

    def _level(master, join_keys, id_parts, parent_parts, cod_col, desc_col, tipo):
        cond = (F.col(f"irc.{join_keys[0]}") == F.col(f"mv.{join_keys[0]}")) & (
            F.col("irc.cod_compania") == F.col("mv.cod_compania")
        )
        branch = (
            conformed.join(F.broadcast(master).alias("mv"), cond, "inner")
            .select(
                F.col("b.id_pais"),
                surrogate_key(
                    F.trim(F.col("irc.cod_compania")),
                    F.lit(id_parts[0]),
                    *[F.trim(F.col(f"irc.{c}")) for c in id_parts[1:]],
                ).alias("id_clasificacion_cliente"),
                (
                    surrogate_key(
                        F.trim(F.col("irc.cod_compania")),
                        F.lit(parent_parts[0]),
                        *[F.trim(F.col(f"irc.{c}")) for c in parent_parts[1:]],
                    )
                    if parent_parts
                    else F.lit(None)
                ).alias("id_clasificacion_cliente_padre"),
                F.col(f"irc.{cod_col}").alias("cod_clasificacion_cliente"),
                F.col(f"mv.{desc_col}").alias("nomb_clasificacion_cliente"),
                F.lit(tipo).alias("cod_tipo_clasificacion_cliente"),
                F.col("mv.es_activo").alias("estado"),
                F.lit(ctx.as_of).alias("fecha_creacion"),
                F.lit(ctx.as_of).alias("fecha_modificacion"),
            )
            .distinct()
        )
        return branch

    levels = [
        _level(subgiro, ["cod_subgiro"], ["SG", "cod_subgiro"],
               ["GR", "cod_giro", "cod_canal"], "cod_subgiro", "desc_subgiro", "Subgiro"),
        _level(giro, ["cod_giro"], ["GR", "cod_giro", "cod_canal"],
               ["CN", "cod_canal"], "cod_giro", "desc_giro", "Giro"),
        _level(canal, ["cod_canal"], ["CN", "cod_canal"],
               None, "cod_canal", "desc_canal", "Canal"),
    ]
    unioned = levels[0].unionByName(levels[1]).unionByName(levels[2])
    out = cast_projection(
        unioned,
        [
            ("id_pais", "string"),
            ("id_clasificacion_cliente", "string"),
            ("id_clasificacion_cliente_padre", "string"),
            ("cod_clasificacion_cliente", "string"),
            ("nomb_clasificacion_cliente", "string"),
            ("cod_tipo_clasificacion_cliente", "string"),
            ("estado", "string"),
            ("fecha_creacion", "date"),
            ("fecha_modificacion", "date"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_clasificacion_cliente"),
        keys=["id_clasificacion_cliente"],
        partition_by=["id_pais"],
    )


@DOMAIN_JOBS.register("m_asignacion_modulo_lite")
def job_m_asignacion_modulo_lite(ctx: JobContext) -> None:
    """Module-assignment bridge (`code/domain/m_asignacion_modulo.py:19-108`):
    assignment left-joined to the client master on (compania, cliente) so
    unmatched clients still land, conformed through sucursal ⋈ compania ⋈
    pais; 5-part pipe id; es_activo = 1 when the client has no sucursal or
    its sucursal matches the assignment's (`:81-84`); schedule columns kept
    as typed NULLs; clock stamps cast to timestamp."""
    asig = read_table(
        ctx.spark, ctx.catalog, Layer.STAGE, "m_asignacion_modulo", registry=ctx.registry
    )
    cli = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_cliente", registry=ctx.registry)
    suc = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_sucursal", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry, principal_only=True)

    bridge = company_country_bridge(comp, pais)
    out = (
        asig.alias("mm")
        .join(
            cli.alias("mcli"),
            (F.col("mm.cod_compania") == F.col("mcli.cod_compania"))
            & (F.col("mm.cod_cliente") == F.col("mcli.cod_cliente")),
            "left",
        )
        .join(
            F.broadcast(suc).alias("suc"),
            (F.col("suc.cod_compania") == F.col("mm.cod_compania"))
            & (F.col("suc.cod_sucursal") == F.col("mm.cod_sucursal")),
            "inner",
        )
        .join(F.broadcast(bridge).alias("b"), F.col("suc.cod_compania") == F.col("b.cod_compania"), "inner")
        .select(
            surrogate_key(
                F.trim(F.col("mm.cod_compania")),
                F.trim(F.col("mm.cod_sucursal")),
                F.trim(F.col("mm.cod_fuerza_venta")),
                F.trim(F.col("mm.cod_modulo")),
                F.trim(F.col("mm.cod_cliente")),
            ).alias("id_asignacion_modulo"),
            F.col("b.id_pais"),
            surrogate_key(
                F.trim(F.col("suc.cod_compania")), F.trim(F.col("suc.cod_sucursal"))
            ).alias("id_sucursal"),
            surrogate_key(
                F.trim(F.col("suc.cod_compania")), F.trim(F.col("mm.cod_cliente"))
            ).alias("id_cliente"),
            surrogate_key(
                F.trim(F.col("mm.cod_compania")),
                F.trim(F.col("mm.cod_sucursal")),
                F.trim(F.col("mm.cod_fuerza_venta")),
                F.trim(F.col("mm.cod_modulo")),
            ).alias("id_modulo"),
            F.lit(None).alias("fecha_inicio"),
            F.lit(None).alias("fecha_fin"),
            F.lit(None).alias("frecuencia_visita"),
            F.lit(None).alias("periodo_visita"),
            F.when(
                F.col("mcli.cod_sucursal").isNull()
                | (F.col("mm.cod_sucursal") == F.col("mcli.cod_sucursal")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("es_activo"),
            F.lit(0).alias("es_eliminado"),
            F.lit(ctx.as_of).alias("fecha_creacion"),
            F.lit(ctx.as_of).alias("fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_asignacion_modulo", "string"),
            ("id_pais", "string"),
            ("id_sucursal", "string"),
            ("id_cliente", "string"),
            ("id_modulo", "string"),
            ("fecha_inicio", "timestamp"),
            ("fecha_fin", "timestamp"),
            ("frecuencia_visita", "string"),
            ("periodo_visita", "string"),
            ("es_activo", "int"),
            ("es_eliminado", "int"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.DOMAIN, "m_asignacion_modulo"),
        keys=["id_asignacion_modulo"],
        partition_by=["id_pais"],
    )


# The conform-dim family (m_forma_pago, m_tipo_pedido, m_origen_pedido,
# m_medio_transporte, …) is one program with different column lists — the
# engine stamps the jobs out from specs (see dim_factory docstring).
from .dim_factory import CONFORM_DIM_SPECS, make_conform_dim_job  # noqa: E402

for _spec in CONFORM_DIM_SPECS:
    DOMAIN_JOBS.register(f"{_spec.name}_lite")(make_conform_dim_job(_spec))
