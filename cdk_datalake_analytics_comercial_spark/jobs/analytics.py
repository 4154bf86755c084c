"""Analytics-layer jobs: dims and facts over DOMAIN outputs (the reference's
`code/analytics/` scripts — read domain, conform, write analytics).

- ``dim_cliente_lite`` (`code/analytics/dim_cliente.py:19-66` shape): the
  priority-ladder dedup — a ``when`` ladder builds an ordering priority, a
  ``row_number`` window keeps the best assignment per client, joined back
  with the rank predicate inside the join condition (J7/W1).
- ``fact_venta_resumen`` (`code/analytics/fact_venta_cliente_historico.py`
  shape): period-partitioned aggregation of the domain sales fact, dynamic
  partition overwrite on (id_pais, id_periodo).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core.catalog import Layer
from ..functions.casts import cast_projection
from ..operators.relational import rolling_window, top1_per_group
from ..runner import JobContext, JobRegistry
from ..sources.reader import read_table
from ..sources.writer import merge_upsert, write_table

ANALYTICS_JOBS = JobRegistry()


@ANALYTICS_JOBS.register("dim_cliente_lite")
def job_dim_cliente_lite(ctx: JobContext) -> None:
    """Client dim with best-assignment dedup (`dim_cliente.py:19-66`): the
    active assignments walk LEFT joins to their module and its attention
    model (`:23-32`), a when-ladder over the model description builds the
    priority, row_number over (priority asc, module fecha desc) ranks, and
    the top-1 joins into the client master with the rank predicate in the
    join condition (J7/W1, `:62-66`). The best assignment's module lands as
    ``id_estructura_comercial`` (`:79`), the territorial dim resolves
    ``cod_eje_territorial`` (`:69-72, :125`), and the client master's full
    attribute surface rides through (`:74-105`)."""
    clientes = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_cliente", registry=ctx.registry
    )
    asignacion = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_asignacion_modulo", registry=ctx.registry
    )
    modulo = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_modulo", registry=ctx.registry)
    modelo = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_modelo_atencion", registry=ctx.registry
    )
    eje = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_eje_territorial", registry=ctx.registry
    )
    enriched = (
        asignacion.filter((F.col("es_activo") == 1) & (F.col("es_eliminado") == 0))
        .alias("mam")
        .join(
            F.broadcast(modulo).alias("mm"),
            F.col("mm.id_modulo") == F.col("mam.id_modulo"),
            "left",
        )
        .join(
            F.broadcast(modelo).alias("mma"),
            F.col("mma.id_modelo_atencion") == F.col("mm.id_modelo_atencion"),
            "left",
        )
        .select(
            F.col("mam.id_cliente"),
            F.col("mm.id_modulo"),
            F.col("mam.frecuencia_visita"),
            F.col("mam.periodo_visita"),
            F.col("mma.desc_modelo_atencion").alias("modelo_atencion"),
            F.col("mm.fecha_creacion"),
        )
    )
    prioridad = (
        F.when(F.col("modelo_atencion") == "Pre Venta", 1)
        .when(F.col("modelo_atencion") == "Especializado", 2)
        .when(F.col("modelo_atencion") == "Auto Venta", 3)
        .when(F.col("modelo_atencion") == "Televenta", 4)
        .otherwise(5)
    )
    ranked = top1_per_group(
        enriched.withColumn("orden_modelo", prioridad),
        partition_by=["id_cliente"],
        order_by=[F.col("orden_modelo").asc(), F.col("fecha_creacion").desc()],
        keep=False,
    ).alias("a")
    out = (
        clientes.alias("c")
        .join(
            ranked,
            (F.col("c.id_cliente") == F.col("a.id_cliente")) & (F.col("a.orden") == 1),
            "left",
        )
        .join(
            F.broadcast(eje.select("id_eje_territorial", "cod_eje_territorial")).alias(
                "met"
            ),
            F.col("c.id_eje_territorial") == F.col("met.id_eje_territorial"),
            "left",
        )
        .select(
            F.col("c.id_cliente"),
            F.col("c.id_pais"),
            F.col("c.id_sucursal"),
            # the best assignment's module IS the serving structure pointer
            # (dim_cliente.py:79)
            F.col("a.id_modulo").alias("id_estructura_comercial"),
            F.col("c.id_clasificacion_cliente"),
            F.col("c.id_eje_territorial"),
            F.col("c.id_lista_precio"),
            F.col("c.cod_cliente"),
            F.col("c.nomb_cliente"),
            F.col("c.cod_segmento"),
            F.col("c.desc_subsegmento"),
            F.col("c.cod_cliente_ref"),
            F.col("c.cod_cliente_ref2"),
            F.col("c.cod_cliente_ref3"),
            F.col("c.cod_cliente_ref4"),
            F.col("c.cod_tipo_cliente"),
            F.col("c.cod_cuenta_clave"),
            F.col("c.nomb_cuenta_clave"),
            F.col("c.desc_canal_local"),
            F.col("c.desc_giro_local"),
            F.col("c.direccion"),
            F.col("c.nro_documento"),
            F.col("c.cod_cliente_principal"),
            F.col("c.cod_cliente_transferencia"),
            F.col("met.cod_eje_territorial"),
            F.col("c.coord_x").alias("coordx"),
            F.col("c.coord_y").alias("coordy"),
            F.col("a.modelo_atencion"),
            F.col("a.frecuencia_visita"),
            F.col("a.periodo_visita"),
            F.col("c.fecha_creacion"),
            F.col("c.fecha_baja"),
            F.col("c.estado"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_cliente", "string"),
            ("id_pais", "string"),
            ("id_sucursal", "string"),
            ("id_estructura_comercial", "string"),
            ("id_clasificacion_cliente", "string"),
            ("id_eje_territorial", "string"),
            ("id_lista_precio", "string"),
            ("cod_cliente", "string"),
            ("nomb_cliente", "string"),
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
            ("cod_eje_territorial", "string"),
            ("coordx", "string"),
            ("coordy", "string"),
            ("modelo_atencion", "string"),
            ("frecuencia_visita", "string"),
            ("periodo_visita", "string"),
            ("fecha_creacion", "timestamp"),
            ("fecha_baja", "date"),
            ("estado", "string"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "dim_cliente"),
        keys=["id_cliente"],
        partition_by=["id_pais"],
    )


@ANALYTICS_JOBS.register("fact_cliente_venta_lite")
def job_fact_cliente_venta_lite(ctx: JobContext) -> None:
    """Client-month metrics with trailing 3- AND 12-month rollups
    (`code/analytics/fact_cliente_venta.py`), full reference surface:

    - monthly base (`:29-63`): venta ⋈ venta_detalle (live docs in the join
      condition) ⋈ dim_producto (ANALYTICS layer, left) grouped by the
      5-part key (pais, periodo, compania, cliente, modulo) — 8 decimal
      sums incl. the /30 unit-case conversions, countDistinct producto/
      marca/venta (A3), recency vs the injected clock (§7.3.7);
    - the reference computes the 3m/12m rollups as FOUR range self-joins
      (`:86-175`, J5) and stitches them back with four more left joins
      (`:286-320`); here both horizons are rangeBetween windows over the
      SAME partitioning — Catalyst plans ONE shuffle+sort feeding both
      Window nodes and the join-back disappears entirely;
    - the '_nn' branch (`:176-268`): same pipeline gated on
      ``dim_producto.cod_unidad_negocio == '003'`` — a vestigial filter
      (the column is a NULL placeholder upstream, m_articulo.py:138) kept
      faithfully: its five serving columns land NULL, and one left join
      stitches it back (it has different rows, so it cannot fold into the
      window)."""
    venta = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta", registry=ctx.registry)
    detalle = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta_detalle", registry=ctx.registry
    )
    producto = read_table(
        ctx.spark, ctx.catalog, Layer.ANALYTICS, "dim_producto", registry=ctx.registry
    )

    venta = venta.filter(F.col("id_periodo").isin(ctx.periods))
    detalle = detalle.filter(F.col("id_periodo").isin(ctx.periods))
    base = (
        venta.alias("tv")
        .join(
            detalle.alias("tvd"),
            (F.col("tv.id_venta") == F.col("tvd.id_venta"))
            & (F.col("tv.es_eliminado") == 0),
            "inner",
        )
        .join(
            F.broadcast(producto).alias("dp"),
            F.col("tvd.id_producto") == F.col("dp.id_producto"),
            "left",
        )
    )
    KEYS = ["id_pais", "id_periodo", "id_compania", "id_cliente", "cod_modulo"]

    def monthly(src, full: bool):
        aggs = [
            (F.sum("tvd.cant_caja_volumen_ven") / 30).alias("cant_caja_unitaria_ven"),
            F.sum("tvd.imp_neto_vta_mn").alias("imp_neto_mn"),
            F.countDistinct("dp.desc_marca").alias("cant_marca"),
            F.countDistinct("tv.id_venta").alias("cant_venta"),
            F.max("tv.fecha_liquidacion").alias("ult_fecha_compra_cliente"),
        ]
        if full:
            aggs += [
                F.sum("tvd.cant_caja_fisica_ven").alias("cant_caja_fisica_ven"),
                F.sum("tvd.cant_caja_fisica_pro").alias("cant_caja_fisica_pro"),
                (F.sum("tvd.cant_caja_volumen_pro") / 30).alias("cant_caja_unitaria_pro"),
                F.sum("tvd.imp_neto_vta_me").alias("imp_neto_me"),
                F.sum("tvd.imp_cobrar_vta_mn").alias("imp_bruto_mn"),
                F.sum("tvd.imp_cobrar_vta_me").alias("imp_bruto_me"),
                F.countDistinct("tvd.id_producto").alias("cant_producto"),
            ]
        return src.groupBy(
            F.col("tv.id_pais").alias("id_pais"),
            F.col("tv.id_periodo").alias("id_periodo"),
            F.col("tv.cod_compania").alias("id_compania"),
            F.col("tv.id_cliente").alias("id_cliente"),
            F.col("tv.cod_modulo").alias("cod_modulo"),
        ).agg(*aggs)

    GENERAL_ROLL = [
        "cant_caja_fisica_ven", "cant_caja_unitaria_ven", "cant_caja_fisica_pro",
        "cant_caja_unitaria_pro", "imp_neto_mn", "imp_neto_me", "imp_bruto_mn",
        "imp_bruto_me",
    ]
    NN_ROLL = ["cant_caja_unitaria_ven", "imp_neto_mn"]
    roll_keys = ["id_pais", "id_compania", "id_cliente", "cod_modulo"]

    def rolled(df, cols, horizons=(3, 12)):
        for months in horizons:
            df = rolling_window(
                df,
                keys=roll_keys,
                period_col="id_periodo",
                agg_exprs=[
                    (F.coalesce(F.col(c), F.lit(0)), f"{c}_{months}meses") for c in cols
                ],
                months_back=months,
            )
        return df

    general = rolled(monthly(base, full=True), GENERAL_ROLL)
    nn = rolled(
        monthly(base.where(F.col("dp.cod_unidad_negocio") == "003"), full=False),
        NN_ROLL,
    )

    nn_cols = [
        F.col(f"nn.cant_caja_unitaria_ven_12meses").alias("cant_caja_unit_venta_12meses_nn"),
        F.col(f"nn.cant_caja_unitaria_ven_3meses").alias("cant_caja_unit_venta_3meses_nn"),
        F.col(f"nn.imp_neto_mn_12meses").alias("imp_neto_mn_12meses_nn"),
        F.col(f"nn.imp_neto_mn_3meses").alias("imp_neto_mn_3meses_nn"),
        F.col(f"nn.ult_fecha_compra_cliente").alias("ult_fecha_compra_12meses_nn"),
        F.col(f"nn.cant_venta").alias("cant_venta_nn"),
        F.col(f"nn.cant_marca").alias("cant_marca_nn"),
    ]
    out = (
        general.alias("fcv")
        .join(nn.alias("nn"), KEYS, "left")
        .select(
            *[F.col(f"fcv.{k}") for k in KEYS],
            *[F.col(f"fcv.{c}_{m}meses") for c in GENERAL_ROLL for m in (3, 12)],
            F.col("fcv.cant_producto"),
            F.col("fcv.cant_venta"),
            F.col("fcv.cant_marca"),
            F.col("fcv.ult_fecha_compra_cliente"),
            F.datediff(F.lit(ctx.as_of), F.col("fcv.ult_fecha_compra_cliente")).alias(
                "ult_dia_compra_cliente"
            ),
            *nn_cols,
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_compania", "string"),
            ("id_cliente", "string"),
            ("cod_modulo", "string"),
            *[
                (f"{c}_{m}meses", "numeric(38,12)")
                for c in GENERAL_ROLL for m in (3, 12)
            ],
            ("cant_producto", "int"),
            ("cant_venta", "int"),
            ("cant_marca", "int"),
            ("ult_fecha_compra_cliente", "date"),
            ("ult_dia_compra_cliente", "int"),
            ("cant_caja_unit_venta_12meses_nn", "int"),
            ("cant_caja_unit_venta_3meses_nn", "int"),
            ("imp_neto_mn_12meses_nn", "numeric(38,12)"),
            ("imp_neto_mn_3meses_nn", "numeric(38,12)"),
            ("ult_fecha_compra_12meses_nn", "date"),
            ("cant_venta_nn", "int"),
            ("cant_marca_nn", "int"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "fact_cliente_venta"),
        partition_by=["id_pais", "id_periodo"],
    )


@ANALYTICS_JOBS.register("fact_venta_detalle_lite")
def job_fact_venta_detalle_lite(ctx: JobContext) -> None:
    """Line-item serving fact (`code/analytics/fact_venta_detalle.py:26-107`),
    full reference select: detail ⋈ header (inner) ⋈ m_tipo_venta with the
    VEN/EXP/OBS whitelist INSIDE the join condition (J7) ⋈ order header
    (left — contributes id_modelo_atencion/id_origen_pedido/nro_pedido and
    the geography backfills), live documents only; the sale's own territory
    descriptors win with the order's as fallback (`:67-72`), the /30
    case→unit-case volume conversions (`:74,76`), and the entire
    t_venta_detalle money surface rides through. Dynamic overwrite on
    (id_pais, id_periodo)."""
    venta = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta", registry=ctx.registry)
    det = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta_detalle", registry=ctx.registry
    )
    pedido = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_pedido", registry=ctx.registry)
    tipo_venta = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_tipo_venta", registry=ctx.registry
    )

    v = venta.filter(F.col("id_periodo").isin(ctx.periods)).alias("tv")
    d = det.filter(F.col("id_periodo").isin(ctx.periods)).alias("tvd")
    MONEY = [
        "imp_neto_vta_mn", "imp_neto_vta_me", "imp_bruto_vta_mn", "imp_bruto_vta_me",
        "imp_dscto_mn", "imp_dscto_me", "imp_cobrar_vta_mn", "imp_cobrar_vta_me",
        "imp_paquete_vta_mn", "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
        "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
        "imp_valorizado_pro_me",
    ] + [f"imp_impuesto{i}_{c}" for i in range(1, 7) for c in ("mn", "me")]
    out = (
        d.join(v, F.col("tvd.id_venta") == F.col("tv.id_venta"), "inner")
        .join(
            F.broadcast(tipo_venta).alias("mtv"),
            (F.col("tv.id_tipo_venta") == F.col("mtv.id_tipo_venta"))
            & (F.upper(F.col("mtv.cod_tipo_operacion")).isin("VEN", "EXP", "OBS")),
            "inner",
        )
        .join(pedido.alias("tp"), F.col("tv.id_pedido") == F.col("tp.id_pedido"), "left")
        .where(F.col("tv.es_eliminado") == 0)
        .select(
            F.col("tv.id_pais"),
            F.col("tv.id_periodo"),
            F.col("tv.id_sucursal"),
            F.col("tv.id_cliente"),
            F.col("tvd.id_producto"),
            F.col("tv.id_vendedor"),
            F.col("tv.id_supervisor"),
            F.col("tv.id_forma_pago"),
            F.col("tv.id_fuerza_venta"),
            F.col("tp.id_modelo_atencion"),
            F.col("tv.id_lista_precio"),
            F.col("tp.id_origen_pedido"),
            F.col("tv.id_tipo_venta"),
            F.col("tv.id_venta"),
            F.col("tv.id_pedido"),
            F.col("tv.fecha_emision"),
            F.col("tv.fecha_liquidacion"),
            F.col("tv.fecha_pedido"),
            F.col("tv.nro_venta"),
            F.col("tp.nro_pedido"),
            F.coalesce(F.col("tv.desc_region"), F.col("tp.desc_region")).alias(
                "desc_region"
            ),
            F.coalesce(F.col("tv.desc_subregion"), F.col("tp.desc_subregion")).alias(
                "desc_subregion"
            ),
            F.coalesce(F.col("tv.desc_division"), F.col("tp.desc_division")).alias(
                "desc_division"
            ),
            F.coalesce(F.col("tv.cod_zona"), F.col("tp.cod_zona")).alias("cod_zona"),
            F.coalesce(F.col("tv.cod_ruta"), F.col("tp.cod_ruta")).alias("cod_ruta"),
            F.coalesce(F.col("tv.cod_modulo"), F.col("tp.cod_modulo")).alias("cod_modulo"),
            F.col("tvd.cant_caja_fisica_ven").alias("cant_cajafisica_vta"),
            (F.col("tvd.cant_caja_volumen_ven") / 30).alias("cant_cajaunitaria_vta"),
            F.col("tvd.cant_caja_fisica_pro").alias("cant_cajafisica_pro"),
            (F.col("tvd.cant_caja_volumen_pro") / 30).alias("cant_cajaunitaria_pro"),
            F.col("tvd.imp_desnimp_mn").alias("imp_dscto_sinimpvta_mn"),
            F.col("tvd.imp_desnimp_me").alias("imp_dscto_sinimpvta_me"),
            *[F.col(f"tvd.{c}") for c in MONEY],
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_sucursal", "string"),
            ("id_cliente", "string"),
            ("id_producto", "string"),
            ("id_vendedor", "string"),
            ("id_supervisor", "string"),
            ("id_forma_pago", "string"),
            ("id_fuerza_venta", "string"),
            ("id_modelo_atencion", "string"),
            ("id_lista_precio", "string"),
            ("id_origen_pedido", "string"),
            ("id_tipo_venta", "string"),
            ("id_venta", "string"),
            ("id_pedido", "string"),
            ("fecha_emision", "date"),
            ("fecha_liquidacion", "date"),
            ("fecha_pedido", "date"),
            ("nro_venta", "string"),
            ("nro_pedido", "string"),
            ("desc_region", "string"),
            ("desc_subregion", "string"),
            ("desc_division", "string"),
            ("cod_zona", "string"),
            ("cod_ruta", "string"),
            ("cod_modulo", "string"),
            ("cant_cajafisica_vta", "numeric(38,12)"),
            ("cant_cajaunitaria_vta", "numeric(38,12)"),
            ("cant_cajafisica_pro", "numeric(38,12)"),
            ("cant_cajaunitaria_pro", "numeric(38,12)"),
            ("imp_dscto_sinimpvta_mn", "numeric(38,12)"),
            ("imp_dscto_sinimpvta_me", "numeric(38,12)"),
            *[(c, "numeric(38,12)") for c in MONEY],
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "fact_venta_detalle"),
        partition_by=["id_pais", "id_periodo"],
    )


@ANALYTICS_JOBS.register("dim_estructura_comercial_lite")
def job_dim_estructura_comercial_lite(ctx: JobContext) -> None:
    """Full hierarchy flatten (`code/analytics/dim_estructura_comercial.py:
    19-131`): starting from the MODULE master, aliased self-joins of the
    adjacency table walk parent pointers five levels up — ruta → zona →
    división → subregión → región — with each managing level's responsable
    joined alongside (vendedor at ruta, supervisor at zona, jefe at
    división) and the module's attention model resolved; one wide row per
    module with every ancestor's code and name as level columns (J6).
    lit(None) fuerza-venta placeholders kept (`:75,91`). Upsert on
    id_estructura_comercial (= id_modulo, `:73`) partitioned by id_pais."""
    mm = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_modulo", registry=ctx.registry)
    mp = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_pais", registry=ctx.registry)
    mec = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_estructura_comercial", registry=ctx.registry
    )
    mrc = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_responsable_comercial", registry=ctx.registry
    )
    mma = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_modelo_atencion", registry=ctx.registry
    )

    ladder = mm.alias("mm").join(
        F.broadcast(mp).alias("mp"), F.col("mm.id_pais") == F.col("mp.id_pais"), "left"
    )
    # walk: ruta (the module's own structure row) then parent pointers up
    prev = "mm.id_estructura_comercial"
    for level, with_resp in (
        ("ruta", True), ("zona", True), ("division", True),
        ("subregion", False), ("region", False),
    ):
        ladder = ladder.join(
            F.broadcast(mec).alias(f"mec_{level}"),
            F.col(prev) == F.col(f"mec_{level}.id_estructura_comercial"),
            "left",
        )
        if with_resp:
            ladder = ladder.join(
                F.broadcast(mrc).alias(f"mrc_{level}"),
                F.col(f"mec_{level}.id_responsable_comercial")
                == F.col(f"mrc_{level}.id_responsable_comercial"),
                "left",
            )
        prev = f"mec_{level}.id_estructura_comercial_padre"
    out = (
        ladder.join(
            F.broadcast(mma).alias("mma"),
            F.col("mm.id_modelo_atencion") == F.col("mma.id_modelo_atencion"),
            "left",
        )
        .select(
            F.col("mm.id_modulo").alias("id_estructura_comercial"),
            F.col("mm.id_pais"),
            F.lit(None).cast("string").alias("cod_fuerza_venta"),
            F.col("mma.cod_modelo_atencion"),
            F.col("mp.cod_pais"),
            *[
                F.col(f"mec_{lvl}.cod_estructura_comercial").alias(f"cod_{lvl}")
                for lvl in ("region", "subregion", "division", "zona", "ruta")
            ],
            F.col("mm.cod_modulo"),
            F.col("mrc_ruta.cod_responsable_comercial").alias("cod_vendedor"),
            F.col("mrc_ruta.nomb_responsable_comercial").alias("nomb_vendedor"),
            F.col("mrc_zona.cod_responsable_comercial").alias("cod_supervisor"),
            F.col("mrc_zona.nomb_responsable_comercial").alias("nomb_supervisor"),
            F.col("mrc_division.cod_responsable_comercial").alias("cod_jefe_venta"),
            F.col("mrc_division.nomb_responsable_comercial").alias("nomb_jefe_venta"),
            F.lit(None).cast("string").alias("desc_fuerza_venta"),
            F.col("mma.desc_modelo_atencion"),
            *[
                F.col(f"mec_{lvl}.nomb_estructura_comercial").alias(f"desc_{lvl}")
                for lvl in ("region", "subregion", "division", "zona", "ruta")
            ],
            F.col("mm.desc_modulo"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_estructura_comercial", "string"),
            ("id_pais", "string"),
            ("cod_fuerza_venta", "string"),
            ("cod_modelo_atencion", "string"),
            ("cod_pais", "string"),
            *[(f"cod_{l}", "string") for l in ("region", "subregion", "division", "zona", "ruta")],
            ("cod_modulo", "string"),
            ("cod_vendedor", "string"),
            ("nomb_vendedor", "string"),
            ("cod_supervisor", "string"),
            ("nomb_supervisor", "string"),
            ("cod_jefe_venta", "string"),
            ("nomb_jefe_venta", "string"),
            ("desc_fuerza_venta", "string"),
            ("desc_modelo_atencion", "string"),
            *[(f"desc_{l}", "string") for l in ("region", "subregion", "division", "zona", "ruta")],
            ("desc_modulo", "string"),
        ],
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "dim_estructura_comercial"),
        keys=["id_estructura_comercial"],
        partition_by=["id_pais"],
    )


@ANALYTICS_JOBS.register("fact_kpi_lite")
def job_fact_kpi_lite(ctx: JobContext) -> None:
    """Order-vs-sale-vs-visit KPI fact — the reference's double full-outer
    stitch at LINE grain (`code/analytics/fact_kpi_detalle.py`):

    - PEDIDO side (`:29-54`): '200' orders ⋈ their detail lines on
      id_pedido → (pedido, articulo) grain with the header's id block and
      the visit pointers aliased to their _pedido serving names;
    - VENTA side (`:56-97`): the same orders ⋈ t_venta on id_pedido ⋈
      t_venta_detalle on id_venta ⋈ m_tipo_venta restricted to VEN/PRO in
      the join condition (J7), live documents only, CMD/RMD excluded; the
      /30 package→unit-case conversion lands here (`:87,89`);
    - FULL OUTER on (id_pedido, articulo == producto) (`:99-134`, J3) —
      every id coalesces from whichever side exists;
    - second FULL OUTER against t_visita on id_visita (`:136-161`) with the
      reference's fallback chain: id_visita falls back to id_pedido,
      fecha_pedido to fecha_visita, and the three id_cliente_visita_*
      coalesce variants."""
    pedido = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_pedido", registry=ctx.registry)
    pedido_det = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_pedido_detalle", registry=ctx.registry
    )
    venta = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta", registry=ctx.registry)
    venta_det = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta_detalle", registry=ctx.registry
    )
    visita = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_visita", registry=ctx.registry)
    tipo_venta = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_tipo_venta", registry=ctx.registry
    )

    pedido = pedido.filter(F.col("id_periodo").isin(ctx.periods))
    pedido_det = pedido_det.filter(F.col("id_periodo").isin(ctx.periods))

    ped = (
        pedido.alias("tp")
        .join(pedido_det.alias("tpd"), F.col("tp.id_pedido") == F.col("tpd.id_pedido"), "inner")
        .where(F.col("tp.cod_tipo_documento_pedido") == "200")
        .select(
            F.col("tp.id_pais"),
            F.col("tp.id_pedido"),
            F.col("tp.id_periodo"),
            F.col("tp.id_sucursal"),
            F.col("tp.id_cliente"),
            F.col("tpd.id_articulo"),
            F.col("tp.id_vendedor"),
            F.col("tp.id_supervisor"),
            F.col("tp.id_fuerza_venta"),
            F.col("tp.id_modelo_atencion"),
            F.col("tp.id_origen_pedido"),
            F.col("tp.fecha_pedido"),
            F.col("tp.cod_tipo_atencion"),
            F.col("tp.id_visita").alias("id_visita_pedido"),
            F.col("tp.id_cliente").alias("id_cliente_pedido"),
        )
    )
    ven = (
        pedido.alias("tp")
        .join(venta.alias("tv"), F.col("tp.id_pedido") == F.col("tv.id_pedido"), "inner")
        .join(venta_det.alias("tvd"), F.col("tv.id_venta") == F.col("tvd.id_venta"), "inner")
        .join(
            F.broadcast(tipo_venta).alias("mtv"),
            (F.col("tv.id_tipo_venta") == F.col("mtv.id_tipo_venta"))
            & (F.upper(F.col("mtv.cod_tipo_operacion")).isin("VEN", "PRO")),
            "inner",
        )
        .where(
            (F.col("tp.cod_tipo_documento_pedido") == "200")
            & (F.col("tv.es_eliminado") == 0)
            & (~F.col("tv.cod_documento_venta").isin("CMD", "RMD"))
        )
        .select(
            F.col("tv.id_pais"),
            F.col("tv.id_sucursal"),
            F.col("tp.id_periodo"),
            F.col("tv.id_pedido"),
            F.col("tv.id_cliente"),
            F.col("tvd.id_producto"),
            F.col("tvd.cant_caja_fisica_ven").alias("cant_cajafisica_vta"),
            (F.col("tvd.cant_caja_volumen_ven") / 30).alias("cant_cajaunitaria_vta"),
            F.col("tvd.cant_caja_fisica_pro").alias("cant_cajafisica_pro"),
            (F.col("tvd.cant_caja_volumen_pro") / 30).alias("cant_cajaunitaria_pro"),
            F.col("tvd.imp_neto_vta_mn"),
            F.col("tvd.imp_neto_vta_me"),
            F.col("tvd.imp_bruto_vta_mn"),
            F.col("tvd.imp_bruto_vta_me"),
            F.col("tv.id_cliente").alias("id_cliente_venta"),
        )
    )
    resumen = (
        ped.alias("tp")
        .join(
            ven.alias("tv"),
            (F.col("tp.id_pedido") == F.col("tv.id_pedido"))
            & (F.col("tp.id_articulo") == F.col("tv.id_producto")),
            "full",
        )
        .select(
            F.coalesce(F.col("tp.id_pais"), F.col("tv.id_pais")).alias("id_pais"),
            F.coalesce(F.col("tp.id_periodo"), F.col("tv.id_periodo")).alias("id_periodo"),
            F.coalesce(F.col("tp.id_pedido"), F.col("tv.id_pedido")).alias("id_pedido"),
            F.coalesce(F.col("tp.id_sucursal"), F.col("tv.id_sucursal")).alias("id_sucursal"),
            F.coalesce(F.col("tp.id_cliente"), F.col("tv.id_cliente")).alias("id_cliente"),
            F.coalesce(F.col("tp.id_articulo"), F.col("tv.id_producto")).alias("id_articulo"),
            F.col("tp.id_vendedor"),
            F.col("tp.id_supervisor"),
            F.col("tp.id_fuerza_venta"),
            F.col("tp.id_modelo_atencion"),
            F.col("tp.id_origen_pedido"),
            F.col("tp.fecha_pedido"),
            F.col("tp.id_visita_pedido").alias("id_visita"),
            F.col("tp.id_visita_pedido"),
            F.col("tp.id_cliente_pedido"),
            F.col("tp.cod_tipo_atencion"),
            F.col("tp.id_visita_pedido").alias("id_visita_venta"),
            F.col("tv.id_cliente_venta"),
            F.col("tv.cant_cajafisica_vta"),
            F.col("tv.cant_cajaunitaria_vta"),
            F.col("tv.cant_cajafisica_pro"),
            F.col("tv.cant_cajaunitaria_pro"),
            F.col("tv.imp_neto_vta_mn"),
            F.col("tv.imp_neto_vta_me"),
            F.col("tv.imp_bruto_vta_mn"),
            F.col("tv.imp_bruto_vta_me"),
        )
    )
    out = (
        visita.alias("tv")
        .join(
            resumen.alias("tvpr"),
            F.col("tvpr.id_visita") == F.col("tv.id_visita"),
            "full",
        )
        .select(
            F.coalesce(F.col("tv.id_pais"), F.col("tvpr.id_pais")).alias("id_pais"),
            F.coalesce(F.col("tv.id_periodo"), F.col("tvpr.id_periodo")).alias("id_periodo"),
            F.coalesce(F.col("tv.id_sucursal"), F.col("tvpr.id_sucursal")).alias("id_sucursal"),
            F.coalesce(F.col("tv.id_cliente"), F.col("tvpr.id_cliente")).alias("id_cliente"),
            F.col("tvpr.id_articulo").alias("id_producto"),
            F.col("tvpr.id_vendedor"),
            F.col("tvpr.id_supervisor"),
            F.col("tvpr.id_fuerza_venta"),
            F.col("tvpr.id_modelo_atencion"),
            F.col("tvpr.id_origen_pedido"),
            F.coalesce(F.col("tvpr.fecha_pedido"), F.col("tv.fecha_visita")).alias(
                "fecha_pedido"
            ),
            F.col("tvpr.cod_tipo_atencion"),
            F.coalesce(F.col("tv.id_visita"), F.col("tvpr.id_pedido")).alias("id_visita"),
            F.col("tvpr.id_visita_pedido"),
            F.col("tvpr.id_visita_venta"),
            F.col("tv.id_cliente").alias("id_cliente_visita"),
            F.coalesce(F.col("tv.id_cliente"), F.col("tvpr.id_cliente_pedido")).alias(
                "id_cliente_visita_pedido"
            ),
            F.coalesce(F.col("tv.id_cliente"), F.col("tvpr.id_cliente_venta")).alias(
                "id_cliente_visita_venta"
            ),
            F.col("tvpr.cant_cajafisica_vta"),
            F.col("tvpr.cant_cajaunitaria_vta"),
            F.col("tvpr.cant_cajafisica_pro"),
            F.col("tvpr.cant_cajaunitaria_pro"),
            F.col("tvpr.imp_neto_vta_mn"),
            F.col("tvpr.imp_neto_vta_me"),
            F.col("tvpr.imp_bruto_vta_mn"),
            F.col("tvpr.imp_bruto_vta_me"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_sucursal", "string"),
            ("id_cliente", "string"),
            ("id_producto", "string"),
            ("id_vendedor", "string"),
            ("id_supervisor", "string"),
            ("id_fuerza_venta", "string"),
            ("id_modelo_atencion", "string"),
            ("id_origen_pedido", "string"),
            ("fecha_pedido", "date"),
            ("cod_tipo_atencion", "string"),
            ("id_visita", "string"),
            ("id_visita_pedido", "string"),
            ("id_visita_venta", "string"),
            ("id_cliente_visita", "string"),
            ("id_cliente_visita_pedido", "string"),
            ("id_cliente_visita_venta", "string"),
            ("cant_cajafisica_vta", "numeric(38,12)"),
            ("cant_cajaunitaria_vta", "numeric(38,12)"),
            ("cant_cajafisica_pro", "numeric(38,12)"),
            ("cant_cajaunitaria_pro", "numeric(38,12)"),
            ("imp_neto_vta_mn", "numeric(38,12)"),
            ("imp_neto_vta_me", "numeric(38,12)"),
            ("imp_bruto_vta_mn", "numeric(38,12)"),
            ("imp_bruto_vta_me", "numeric(38,12)"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "fact_kpi_detalle"),
        partition_by=["id_pais", "id_periodo"],
    )


@ANALYTICS_JOBS.register("fact_venta_resumen")
def job_fact_venta_resumen(ctx: JobContext) -> None:
    """Period/client sales summary from the domain fact: soft-deletes
    excluded, exact decimal sums, dynamic overwrite of touched periods."""
    venta = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta", registry=ctx.registry)
    out = (
        venta.filter(F.col("es_eliminado") == 0)
        .groupBy("id_pais", "id_periodo", "cod_cliente")
        .agg(
            F.count("*").cast("bigint").alias("n_documentos"),
            F.sum(F.col("imp_venta").cast("decimal(38,12)")).alias("imp_venta"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("cod_cliente", "string"),
            ("n_documentos", "bigint"),
            ("imp_venta", "numeric(38,12)"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "fact_venta_resumen"),
        partition_by=["id_pais", "id_periodo"],
    )


@ANALYTICS_JOBS.register("dim_eje_territorial_lite")
def job_dim_eje_territorial_lite(ctx: JobContext) -> None:
    """Geographic dim flatten (`code/analytics/dim_eje_territorial.py:
    17-108`): per-level slices of the domain adjacency table laddered up
    the parent pointers — the full reference walk NG4 postal → NG3
    distrito → NG2 provincia → NG1 departamento (three inner hops).
    Country join for denormalized pais columns, and the postal code is
    recovered from the pipe-encoded ``cod_eje_territorial_ref`` with
    ``split().getItem(1)`` (`:106`). Upsert on id_eje_territorial,
    partitioned by id_pais."""
    eje = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_eje_territorial", registry=ctx.registry
    )
    pais = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_pais", registry=ctx.registry)

    ng4 = eje.filter(F.col("cod_tipo_eje_territorial") == "NG4").alias("ng4")
    ng3 = eje.filter(F.col("cod_tipo_eje_territorial") == "NG3").alias("ng3")
    ng2 = eje.filter(F.col("cod_tipo_eje_territorial") == "NG2").alias("ng2")
    ng1 = eje.filter(F.col("cod_tipo_eje_territorial") == "NG1").alias("ng1")
    out = (
        ng4.join(
            ng3,
            F.col("ng3.id_eje_territorial") == F.col("ng4.id_eje_territorial_padre"),
            "inner",
        )
        .join(
            ng2,
            F.col("ng2.id_eje_territorial") == F.col("ng3.id_eje_territorial_padre"),
            "inner",
        )
        .join(
            ng1,
            F.col("ng1.id_eje_territorial") == F.col("ng2.id_eje_territorial_padre"),
            "inner",
        )
        .join(
            F.broadcast(pais).alias("mp"),
            F.col("ng4.id_pais") == F.col("mp.id_pais"),
            "inner",
        )
        .select(
            F.col("ng4.id_eje_territorial").cast("string").alias("id_eje_territorial"),
            F.col("mp.id_pais").cast("string").alias("id_pais"),
            F.col("mp.cod_pais").cast("string").alias("cod_pais"),
            F.col("mp.desc_pais").cast("string").alias("desc_pais"),
            F.col("ng1.cod_eje_territorial").cast("string").alias("cod_ng1"),
            F.col("ng1.nomb_eje_territorial").cast("string").alias("desc_ng1"),
            F.col("ng2.cod_eje_territorial").cast("string").alias("cod_ng2"),
            F.col("ng2.nomb_eje_territorial").cast("string").alias("desc_ng2"),
            F.col("ng3.cod_eje_territorial").cast("string").alias("cod_ng3"),
            F.col("ng3.nomb_eje_territorial").cast("string").alias("desc_ng3"),
            F.col("ng4.cod_eje_territorial").cast("string").alias("cod_ng4"),
            F.col("ng4.nomb_eje_territorial").cast("string").alias("desc_ng4"),
            F.split(F.col("ng4.cod_eje_territorial_ref"), r"\|")
            .getItem(1)
            .cast("string")
            .alias("zona_postal"),
        )
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "dim_eje_territorial"),
        keys=["id_eje_territorial"],
        partition_by=["id_pais"],
    )


@ANALYTICS_JOBS.register("fact_venta_cliente_historico_lite")
def job_fact_venta_cliente_historico_lite(ctx: JobContext) -> None:
    """Historic client-sales fact (`code/analytics/fact_venta_cliente_
    historico.py:27-147`, FULL measure surface): detail ⋈ header on
    id_venta, LEFT ⋈ order header, and an inner join against the sales-type
    dim whose operation-code whitelist lives INSIDE the join condition
    (``upper(cod_tipo_operacion).isin('VEN','EXP')``, `:39-44` — J7).
    Soft-deleted headers drop (`:45`); the 7-key groupBy (incl.
    forma_pago/lista_precio) then takes
    ``max(coalesce(header_attr, order_attr))`` as the representative
    territory attributes (`:56-61` — the sale's own region wins, the
    order's backfills) plus decimal sums and the /30 package-to-unit
    conversion (`:63-65`). Partition overwrite on (id_pais, id_periodo)."""
    venta = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta", registry=ctx.registry)
    detalle = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_venta_detalle", registry=ctx.registry
    )
    pedido = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_pedido", registry=ctx.registry
    )
    tipo_venta = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_tipo_venta", registry=ctx.registry
    )

    venta = venta.filter(F.col("id_periodo").isin(ctx.periods))
    detalle = detalle.filter(F.col("id_periodo").isin(ctx.periods))
    out = (
        detalle.alias("tvd")
        .join(venta.alias("tv"), F.col("tvd.id_venta") == F.col("tv.id_venta"), "inner")
        .join(pedido.alias("tp"), F.col("tv.id_pedido") == F.col("tp.id_pedido"), "left")
        .join(
            F.broadcast(tipo_venta).alias("mtv"),
            (F.col("tv.id_tipo_venta") == F.col("mtv.id_tipo_venta"))
            & (F.upper(F.col("mtv.cod_tipo_operacion")).isin(["VEN", "EXP"])),
            "inner",
        )
        .where(F.col("tv.es_eliminado") == 0)
        .groupBy(
            F.col("tv.id_pais"),
            F.col("tv.id_periodo"),
            F.col("tv.id_sucursal"),
            F.col("tv.id_cliente"),
            F.col("tvd.id_producto"),
            F.col("tv.id_forma_pago"),
            F.col("tv.id_lista_precio"),
        )
        .agg(
            *[
                F.max(F.coalesce(F.col(f"tv.{c}"), F.col(f"tp.{c}"))).alias(c)
                for c in ("desc_region", "desc_subregion", "desc_division",
                          "cod_zona", "cod_ruta", "cod_modulo")
            ],
            F.sum("tvd.cant_caja_fisica_ven").alias("cant_cajafisica_vta"),
            (F.sum("tvd.cant_caja_volumen_ven") / 30).alias("cant_cajaunitaria_vta"),
            F.sum("tvd.cant_caja_fisica_pro").alias("cant_cajafisica_pro"),
            (F.sum("tvd.cant_caja_volumen_pro") / 30).alias("cant_cajaunitaria_pro"),
            F.sum("tvd.imp_desnimp_mn").alias("imp_dscto_sinimpvta_mn"),
            F.sum("tvd.imp_desnimp_me").alias("imp_dscto_sinimpvta_me"),
            *[
                F.sum(f"tvd.{c}").alias(c)
                for c in (
                    "imp_neto_vta_mn", "imp_neto_vta_me", "imp_bruto_vta_mn",
                    "imp_bruto_vta_me", "imp_dscto_mn", "imp_dscto_me",
                    "imp_cobrar_vta_mn", "imp_cobrar_vta_me", "imp_paquete_vta_mn",
                    "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
                    "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
                    "imp_valorizado_pro_me",
                )
            ],
            *[
                F.sum(f"tvd.imp_impuesto{i}_{c}").alias(f"imp_impuesto{i}_{c}")
                for i in range(1, 7) for c in ("mn", "me")
            ],
        )
        .select(
            F.col("id_pais").cast("string"),
            F.col("id_periodo").cast("string"),
            F.col("id_sucursal").cast("string"),
            F.col("id_cliente").cast("string"),
            F.col("id_producto").cast("string"),
            F.col("id_forma_pago").cast("string"),
            F.col("id_lista_precio").cast("string"),
            # the reference's period-as-date stamp (`:103`)
            F.to_date(F.col("id_periodo"), "yyyyMM").alias("fecha_liquidacion"),
            *[
                F.col(c).cast("string")
                for c in ("desc_region", "desc_subregion", "desc_division",
                          "cod_zona", "cod_ruta", "cod_modulo")
            ],
            *[
                F.col(c).cast("decimal(38,12)")
                for c in (
                    "cant_cajafisica_vta", "cant_cajaunitaria_vta",
                    "cant_cajafisica_pro", "cant_cajaunitaria_pro",
                    "imp_neto_vta_mn", "imp_neto_vta_me", "imp_bruto_vta_mn",
                    "imp_bruto_vta_me", "imp_dscto_mn", "imp_dscto_me",
                    "imp_dscto_sinimpvta_mn", "imp_dscto_sinimpvta_me",
                    "imp_cobrar_vta_mn", "imp_cobrar_vta_me", "imp_paquete_vta_mn",
                    "imp_paquete_vta_me", "imp_sugerido_mn", "imp_sugerido_me",
                    "imp_full_vta_mn", "imp_full_vta_me", "imp_valorizado_pro_mn",
                    "imp_valorizado_pro_me",
                )
            ],
            *[
                F.col(f"imp_impuesto{i}_{c}").cast("decimal(38,12)")
                for i in range(1, 7) for c in ("mn", "me")
            ],
        )
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "fact_venta_cliente_historico"),
        partition_by=["id_pais", "id_periodo"],
    )


@ANALYTICS_JOBS.register("dim_sucursal_lite")
def job_dim_sucursal_lite(ctx: JobContext) -> None:
    """Branch dim (`code/analytics/dim_sucursal.py:17-44`): domain sucursal
    ⋈ pais ⋈ compania (2-key: id_compania AND id_pais), company attributes
    denormalized onto the branch row. Upsert on id_sucursal partitioned by
    id_pais. Both right sides are small dims — broadcast."""
    suc = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_sucursal", registry=ctx.registry)
    pais = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_pais", registry=ctx.registry)
    comp = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "m_compania", registry=ctx.registry)

    out = (
        suc.alias("ms")
        .join(F.broadcast(pais).alias("mp"), F.col("mp.id_pais") == F.col("ms.id_pais"), "inner")
        .join(
            F.broadcast(comp).alias("mc"),
            (F.col("ms.id_compania") == F.col("mc.id_compania"))
            & (F.col("ms.id_pais") == F.col("mc.id_pais")),
            "inner",
        )
        .select(
            F.col("ms.id_sucursal").cast("string").alias("id_sucursal"),
            F.col("ms.id_pais").cast("string").alias("id_pais"),
            F.col("mc.cod_compania").cast("string").alias("cod_compania"),
            F.col("mc.nomb_compania").cast("string").alias("nomb_compania"),
            F.col("mc.cod_tipo_compania").cast("string").alias("cod_tipo_compania"),
            F.col("ms.cod_sucursal").cast("string").alias("cod_sucursal"),
            F.col("ms.nomb_sucursal").cast("string").alias("nomb_sucursal"),
            F.col("ms.cod_tipo_sucursal").cast("string").alias("cod_tipo_sucursal"),
        )
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "dim_sucursal"),
        keys=["id_sucursal"],
        partition_by=["id_pais"],
    )


@ANALYTICS_JOBS.register("dim_clasificacion_cliente_lite")
def job_dim_clasificacion_cliente_lite(ctx: JobContext) -> None:
    """Client-classification dim (`code/analytics/dim_clasificacion_cliente
    .py:15-81`): the domain hierarchy table splits by level
    (Subgiro/Giro/Canal via upper(tipo)), then subgiro walks its parent
    pointers up two LEFT self-joins — subgiro.parent → giro.id,
    giro.parent → canal.id — flattening the three levels onto one row;
    ocasion-consumo columns are NULL placeholders. One row per subgiro,
    upsert on id_clasificacion_cliente."""
    mcc = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "m_clasificacion_cliente", registry=ctx.registry
    )

    def level(tipo, id_alias, parent_alias, cod_alias, desc_alias):
        branch = mcc.filter(
            F.upper(F.col("cod_tipo_clasificacion_cliente")) == tipo
        ).select(
            F.col("id_pais"),
            F.col("id_clasificacion_cliente").alias(id_alias),
            *(
                [F.col("id_clasificacion_cliente_padre").alias(parent_alias)]
                if parent_alias
                else []
            ),
            F.col("cod_clasificacion_cliente").alias(cod_alias),
            F.col("nomb_clasificacion_cliente").alias(desc_alias),
        )
        return branch

    su = level("SUBGIRO", "id_subgiro", "id_giro", "cod_subgiro", "desc_subgiro")
    gi = level("GIRO", "id_giro", "id_canal", "cod_giro", "desc_giro")
    ca = level("CANAL", "id_canal", None, "cod_canal", "desc_canal")

    out = (
        su.alias("su")
        .join(gi.alias("gi"), F.col("gi.id_giro") == F.col("su.id_giro"), "left")
        .join(ca.alias("ca"), F.col("ca.id_canal") == F.col("gi.id_canal"), "left")
        .select(
            F.col("su.id_subgiro").cast("string").alias("id_clasificacion_cliente"),
            F.col("su.id_pais").cast("string").alias("id_pais"),
            F.col("su.cod_subgiro").cast("string").alias("cod_subgiro"),
            F.col("su.desc_subgiro").cast("string").alias("desc_subgiro"),
            F.lit(None).cast("string").alias("cod_ocasion_consumo"),
            F.lit(None).cast("string").alias("desc_ocasion_consumo"),
            F.col("gi.cod_giro").cast("string").alias("cod_giro"),
            F.col("gi.desc_giro").cast("string").alias("desc_giro"),
            F.col("ca.cod_canal").cast("string").alias("cod_canal"),
            F.col("ca.desc_canal").cast("string").alias("desc_canal"),
        )
    )
    merge_upsert(
        ctx.spark,
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "dim_clasificacion_cliente"),
        keys=["id_clasificacion_cliente"],
        partition_by=["id_pais"],
    )


@ANALYTICS_JOBS.register("fact_reparto_detalle_lite")
def job_fact_reparto_detalle_lite(ctx: JobContext) -> None:
    """Delivery-detail fact (`code/analytics/fact_reparto_detalle.py:21-141`),
    full reference select: the fulfillment detail period-filtered, LEFT ⋈
    order header on id_pedido and LEFT ⋈ delivery header on id_reparto —
    both optional so undispatched order lines still land with NULL carrier
    and order columns; the order side contributes the whole id block +
    geography descriptors, the delivery side the carrier/chofer/medio ids
    and the guide dates (fecha_reparto doubling as fecha_movimiento_
    inventario and fecha_almacen, `:56-58`); all 16 fulfillment quantity
    columns ride through. Full overwrite per the reference's write_table,
    partitioned by (id_pais, id_periodo)."""
    tpdc = read_table(
        ctx.spark, ctx.catalog, Layer.DOMAIN, "t_pedido_cumplimiento", registry=ctx.registry
    )
    tp = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_pedido", registry=ctx.registry)
    tr = read_table(ctx.spark, ctx.catalog, Layer.DOMAIN, "t_reparto", registry=ctx.registry)

    qty_names = [
        f"cant_cajavolumen_{n}{s}" if vol else f"cant_cajafisica_{n}{s}"
        for n in ("ped", "asignado_ped", "desp")
        for s in ("", "_pro")
        for vol in (False, True)
    ]
    out = (
        tpdc.alias("tpdc")
        .filter(F.col("tpdc.id_periodo").isin(ctx.periods))
        .join(tp.alias("tp"), F.col("tp.id_pedido") == F.col("tpdc.id_pedido"), "left")
        .join(tr.alias("tr"), F.col("tr.id_reparto") == F.col("tpdc.id_reparto"), "left")
        .select(
            F.col("tpdc.id_pais"),
            F.col("tpdc.id_periodo"),
            F.col("tpdc.id_reparto"),
            F.col("tpdc.id_pedido"),
            F.col("tpdc.id_producto"),
            F.col("tpdc.id_sucursal"),
            F.col("tr.id_transportista"),
            F.col("tr.id_chofer"),
            F.col("tr.id_medio_transporte"),
            F.col("tp.id_cliente"),
            F.col("tp.cod_cliente"),
            F.col("tp.id_origen_pedido"),
            F.col("tp.id_tipo_pedido"),
            F.col("tp.id_fuerza_venta"),
            F.col("tp.id_vendedor"),
            F.col("tp.id_lista_precio"),
            F.col("tp.id_forma_pago"),
            F.col("tp.desc_region"),
            F.col("tp.desc_subregion"),
            F.col("tp.desc_division"),
            F.col("tp.cod_zona"),
            F.col("tp.cod_ruta"),
            F.col("tp.cod_modulo"),
            F.col("tp.nro_pedido_ref"),
            F.col("tp.fecha_pedido"),
            F.col("tp.fecha_entrega"),
            F.col("tr.fecha_orden_carga"),
            F.col("tr.fecha_reparto").alias("fecha_movimiento_inventario"),
            F.col("tpdc.fecha_liquidacion"),
            F.col("tr.fecha_reparto").alias("fecha_almacen"),
            F.col("tp.nro_pedido"),
            F.col("tr.estado_guia"),
            *[F.col(f"tpdc.{c}") for c in qty_names],
            F.col("tpdc.cant_caja_fisica_ven").alias("cant_cajafisica_ven"),
            F.col("tpdc.cant_caja_volumen_ven").alias("cant_cajavolumen_ven"),
            F.col("tpdc.cant_caja_fisica_pro").alias("cant_cajafisica_pro"),
            F.col("tpdc.cant_caja_volumen_pro").alias("cant_cajavolumen_pro"),
            F.col("tpdc.fecha_creacion"),
            F.col("tpdc.fecha_modificacion"),
        )
    )
    out = cast_projection(
        out,
        [
            ("id_pais", "string"),
            ("id_periodo", "string"),
            ("id_reparto", "string"),
            ("id_pedido", "string"),
            ("id_producto", "string"),
            ("id_sucursal", "string"),
            ("id_transportista", "string"),
            ("id_chofer", "string"),
            ("id_medio_transporte", "string"),
            ("id_cliente", "string"),
            ("cod_cliente", "string"),
            ("id_origen_pedido", "string"),
            ("id_tipo_pedido", "string"),
            ("id_fuerza_venta", "string"),
            ("id_vendedor", "string"),
            ("id_lista_precio", "string"),
            ("id_forma_pago", "string"),
            ("desc_region", "string"),
            ("desc_subregion", "string"),
            ("desc_division", "string"),
            ("cod_zona", "string"),
            ("cod_ruta", "string"),
            ("cod_modulo", "string"),
            ("nro_pedido_ref", "string"),
            ("fecha_pedido", "date"),
            ("fecha_entrega", "date"),
            ("fecha_orden_carga", "date"),
            ("fecha_movimiento_inventario", "date"),
            ("fecha_liquidacion", "date"),
            ("fecha_almacen", "date"),
            ("nro_pedido", "string"),
            ("estado_guia", "string"),
            *[(c, "numeric(38,12)") for c in qty_names],
            ("cant_cajafisica_ven", "numeric(38,12)"),
            ("cant_cajavolumen_ven", "numeric(38,12)"),
            ("cant_cajafisica_pro", "numeric(38,12)"),
            ("cant_cajavolumen_pro", "numeric(38,12)"),
            ("fecha_creacion", "timestamp"),
            ("fecha_modificacion", "timestamp"),
        ],
    )
    write_table(
        out,
        ctx.catalog.table_path(Layer.ANALYTICS, "fact_reparto_detalle"),
        partition_by=["id_pais", "id_periodo"],
    )


# Passthrough dims (dim_forma_pago, dim_tipo_pedido, dim_pais, …) are
# spec-generated — one factory body, one place for merge/partition fixes.
from .dim_factory import PASSTHROUGH_DIM_SPECS, make_passthrough_dim_job  # noqa: E402

for _spec in PASSTHROUGH_DIM_SPECS:
    ANALYTICS_JOBS.register(f"{_spec.name}_lite")(make_passthrough_dim_job(_spec))
