"""Config-driven job factories for the reference's conform-dim family.

A large share of the reference's Glue scripts are the SAME program with
different column lists:

- Domain conform dims (`code/domain/m_forma_pago.py:18-37`,
  `m_tipo_pedido.py`, `m_origen_pedido.py`, `m_medio_transporte.py`, …):
  stage master ⋈ m_compania ⋈ m_pais for the conformed country id, a cast
  projection, upsert on the dim id partitioned by id_pais.
- Analytics passthrough dims (`code/analytics/dim_forma_pago.py:16-29`,
  `dim_tipo_pedido.py`, `dim_pais.py`, `dim_medio_transporte.py`, …):
  read the domain dim, rename/cast, upsert.

The reference stamps these out as separate ~40-line scripts; the engine
expresses the family once as data (the specs below) — the same move the
reference itself makes for its column-cast configuration (DynamoDB
columns_configuration → `transform_default`). One factory body means one
place to fix partitioning or merge semantics for every small dim, and a
spec is auditable against its reference script line-by-line.

Scale note: every dim here is small (thousands of rows); the compania
bridge is broadcast, the upsert rewrites only touched id_pais partitions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import functions as F

from ..core.catalog import Layer
from ..functions.casts import cast_projection
from ..functions.keys import surrogate_key
from ..runner import JobContext
from ..sources.reader import read_table
from ..sources.writer import merge_upsert


@dataclass(frozen=True)
class ConformDimSpec:
    """One domain conform-dim job. ``attrs`` are (stage_col | None, out_name,
    type); None mints a typed-NULL placeholder (`m_sucursal.py:26,33` keeps
    dropped-source columns as lit(None)). The dim id is minted as
    surrogate(compania, *natural_key) exactly like the reference's
    extraction-time pipe ids (SURVEY §1.3), or — when ``natural_key`` is
    None — passed through from the stage id column the way `m_almacen.py:21`
    / `m_fuerza_venta.py:27` / `m_lista_precio.py:26` reuse the
    extraction-minted id."""

    name: str                       # domain table, e.g. "m_forma_pago"
    stage_table: str
    id_col: str                     # e.g. "id_forma_pago"
    natural_key: Sequence[str] | None   # stage cols after compania; None → stage id
    attrs: Sequence[tuple[str | None, str, str]]
    reference: str                  # cited reference script
    date_type: str = "date"         # m_forma_pago casts DateType, others timestamp
    date_source: str = "stage"      # "stage" | "clock" (current_date → ctx.as_of) | "none"
    trim_attrs: Sequence[str] = ()  # stage cols trimmed on the way out (CHAR padding)
    compania_col: str = "cod_compania"  # m_modelo_atencion joins on id_compania
    distinct: bool = False          # m_modelo_atencion dedups before upsert


@dataclass(frozen=True)
class PassthroughDimSpec:
    """One analytics passthrough dim. ``columns`` are (domain_col | None,
    out_name, type); None → lit(NULL) placeholder (dim_pais.py:22)."""

    name: str                       # analytics table, e.g. "dim_forma_pago"
    domain_table: str
    id_col: str
    columns: Sequence[tuple[str | None, str, str]]
    reference: str
    partition_col: str = "id_pais"


def make_conform_dim_job(spec: ConformDimSpec) -> Callable[[JobContext], None]:
    def job(ctx: JobContext) -> None:
        stage = read_table(
            ctx.spark, ctx.catalog, Layer.STAGE, spec.stage_table, registry=ctx.registry
        )
        m_compania = read_table(
            ctx.spark, ctx.catalog, Layer.STAGE, "m_compania", registry=ctx.registry
        )
        m_pais = read_table(
            ctx.spark, ctx.catalog, Layer.STAGE, "m_pais", registry=ctx.registry,
            principal_only=True
        )
        bridge = (
            m_compania.alias("mc")
            .join(m_pais.alias("mp"), F.col("mc.cod_pais") == F.col("mp.cod_pais"), "inner")
            .select(
                F.col("mc.cod_compania").alias("cod_compania"),
                F.col("mp.id_pais").alias("id_pais"),
            )
        )
        if spec.natural_key is None:
            id_expr = F.col(f"st.{spec.id_col}")
        else:
            id_expr = surrogate_key(
                F.col(f"st.{spec.compania_col}"),
                *[F.col(f"st.{k}") for k in spec.natural_key],
            )

        def attr_expr(src: str | None) -> F.Column:
            if src is None:
                return F.lit(None)
            c = F.col(f"st.{src}")
            return F.trim(c) if src in spec.trim_attrs else c

        if spec.date_source == "stage":
            dates = [
                F.col("st.fecha_creacion").alias("fecha_creacion"),
                F.col("st.fecha_modificacion").alias("fecha_modificacion"),
            ]
        elif spec.date_source == "clock":
            dates = [
                F.lit(ctx.as_of).alias("fecha_creacion"),
                F.lit(ctx.as_of).alias("fecha_modificacion"),
            ]
        else:
            dates = []

        picked = (
            stage.alias("st")
            .join(
                F.broadcast(bridge).alias("b"),
                F.col(f"st.{spec.compania_col}") == F.col("b.cod_compania"),
                "inner",
            )
            .select(
                id_expr.alias(spec.id_col),
                F.col("b.id_pais").alias("id_pais"),
                *[attr_expr(src).alias(out) for src, out, _ in spec.attrs],
                *dates,
            )
        )
        out = cast_projection(
            picked,
            [
                (spec.id_col, "string"),
                ("id_pais", "string"),
                *[(out, typ) for _, out, typ in spec.attrs],
                *(
                    [("fecha_creacion", spec.date_type), ("fecha_modificacion", spec.date_type)]
                    if dates
                    else []
                ),
            ],
        )
        if spec.distinct:
            out = out.distinct()
        merge_upsert(
            ctx.spark,
            out,
            ctx.catalog.table_path(Layer.DOMAIN, spec.name),
            keys=[spec.id_col],
            partition_by=["id_pais"],
        )

    job.__name__ = f"job_{spec.name}_lite"
    job.__doc__ = (
        f"Conform dim ({spec.reference}): stage ⋈ compania ⋈ pais, cast "
        f"projection, upsert on {spec.id_col} partitioned by id_pais. "
        f"Generated by dim_factory.make_conform_dim_job."
    )
    return job


def make_passthrough_dim_job(spec: PassthroughDimSpec) -> Callable[[JobContext], None]:
    def job(ctx: JobContext) -> None:
        dom = read_table(
            ctx.spark, ctx.catalog, Layer.DOMAIN, spec.domain_table, registry=ctx.registry
        )
        out = dom.select(
            *[
                (F.col(src) if src is not None else F.lit(None))
                .cast(typ)
                .alias(out_name)
                for src, out_name, typ in spec.columns
            ]
        )
        merge_upsert(
            ctx.spark,
            out,
            ctx.catalog.table_path(Layer.ANALYTICS, spec.name),
            keys=[spec.id_col],
            partition_by=[spec.partition_col],
        )

    job.__name__ = f"job_{spec.name}_lite"
    job.__doc__ = (
        f"Passthrough dim ({spec.reference}): domain {spec.domain_table} → "
        f"rename/cast → upsert on {spec.id_col}. Generated by "
        f"dim_factory.make_passthrough_dim_job."
    )
    return job


CONFORM_DIM_SPECS = [
    ConformDimSpec(
        name="m_forma_pago",
        stage_table="m_condicion_pago",
        id_col="id_forma_pago",
        natural_key=["cod_forma_pago"],
        attrs=[
            ("cod_forma_pago", "cod_forma_pago", "string"),
            ("desc_forma_pago", "nomb_forma_pago", "string"),
        ],
        reference="code/domain/m_forma_pago.py:18-37",
        date_type="date",
    ),
    ConformDimSpec(
        name="m_tipo_pedido",
        stage_table="m_tipo_pedido",
        id_col="id_tipo_pedido",
        natural_key=["cod_tipo_pedido"],
        attrs=[
            ("cod_tipo_pedido", "cod_tipo_pedido", "string"),
            ("desc_tipo_pedido", "nomb_tipo_pedido", "string"),
        ],
        reference="code/domain/m_tipo_pedido.py",
        date_type="timestamp",
    ),
    ConformDimSpec(
        name="m_origen_pedido",
        stage_table="m_origen_pedido",
        id_col="id_origen_pedido",
        natural_key=["cod_origen_pedido"],
        attrs=[
            ("cod_origen_pedido", "cod_origen_pedido", "string"),
            ("desc_origen_pedido", "nomb_origen_pedido", "string"),
        ],
        reference="code/domain/m_origen_pedido.py",
        date_type="timestamp",
    ),
    ConformDimSpec(
        name="m_medio_transporte",
        stage_table="m_vehiculo",
        id_col="id_medio_transporte",
        natural_key=["cod_medio_transporte"],
        attrs=[
            ("cod_medio_transporte", "cod_medio_transporte", "string"),
            ("cod_tipo_medio_transporte", "cod_tipo_medio_transporte", "string"),
            ("desc_tipo_medio_transporte", "desc_tipo_medio_transporte", "string"),
            ("cant_peso_maximo", "cant_peso_maximo", "int"),
            ("cant_tarimas_camion", "cant_tarimas", "numeric(38,12)"),
        ],
        reference="code/domain/m_medio_transporte.py",
        date_type="timestamp",
    ),
    ConformDimSpec(
        name="m_almacen",
        stage_table="m_almacen",
        id_col="id_almacen",
        natural_key=None,               # extraction-minted id passthrough (:21)
        attrs=[
            ("cod_compania", "id_compania", "string"),
            ("id_sucursal", "id_sucursal", "string"),
            ("cod_almacen", "cod_almacen", "string"),
            ("desc_almacen", "desc_almacen", "string"),
            ("tipo_almacen", "desc_tipo_almacen", "string"),
        ],
        reference="code/domain/m_almacen.py:15-29",
        date_source="none",             # reference emits no stamps
    ),
    ConformDimSpec(
        name="m_fuerza_venta",
        stage_table="m_fuerza_venta",
        id_col="id_fuerza_venta",
        natural_key=None,
        attrs=[
            ("cod_fuerza_venta", "cod_fuerza_venta", "string"),
            ("desc_fuerza_venta", "desc_fuerza_venta", "string"),
        ],
        trim_attrs=("cod_fuerza_venta",),   # CHAR-padded source code (:29)
        reference="code/domain/m_fuerza_venta.py:19-33",
        date_source="none",
    ),
    ConformDimSpec(
        name="m_lista_precio",
        stage_table="m_lista_precio",
        id_col="id_lista_precio",
        natural_key=None,
        attrs=[
            ("cod_lista_precio", "cod_lista_precio", "string"),
            ("desc_lista_precio", "nomb_lista_precio", "string"),
        ],
        trim_attrs=("cod_lista_precio",),
        reference="code/domain/m_lista_precio.py:18-35",
        date_source="clock",            # current_date() stamps (:30-31)
        date_type="date",
    ),
    ConformDimSpec(
        name="m_sucursal",
        stage_table="m_sucursal",
        id_col="id_sucursal",
        natural_key=["cod_sucursal"],   # concat_ws compania|sucursal (:25)
        attrs=[
            (None, "id_sucursal_ref", "string"),    # dropped Salesforce source (:26-27)
            ("cod_compania", "id_compania", "string"),
            ("cod_sucursal", "cod_sucursal", "string"),
            ("desc_sucursal", "nomb_sucursal", "string"),
            (None, "cod_tipo_sucursal", "string"),
            ("es_activo", "estado", "string"),
        ],
        reference="code/domain/m_sucursal.py:15-37",
        date_source="stage",
        date_type="date",
    ),
    ConformDimSpec(
        name="m_modelo_atencion",
        stage_table="m_modelo_atencion",
        id_col="id_modelo_atencion",
        natural_key=["cod_modelo_atencion"],
        compania_col="id_compania",     # stage carries id_compania, not cod (:20)
        attrs=[
            ("cod_modelo_atencion", "cod_modelo_atencion", "string"),
            ("desc_modelo_atencion", "desc_modelo_atencion", "string"),
        ],
        reference="code/domain/m_modelo_atencion.py:16-48",
        date_source="clock",
        date_type="date",
        distinct=True,                  # reference dedups the conformed set (:39)
    ),
]

PASSTHROUGH_DIM_SPECS = [
    PassthroughDimSpec(
        name="dim_forma_pago",
        domain_table="m_forma_pago",
        id_col="id_forma_pago",
        columns=[
            ("id_forma_pago", "id_forma_pago", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_forma_pago", "cod_forma_pago", "string"),
            ("nomb_forma_pago", "desc_forma_pago", "string"),
        ],
        reference="code/analytics/dim_forma_pago.py:16-29",
    ),
    PassthroughDimSpec(
        name="dim_tipo_pedido",
        domain_table="m_tipo_pedido",
        id_col="id_tipo_pedido",
        columns=[
            ("id_tipo_pedido", "id_tipo_pedido", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_tipo_pedido", "cod_tipo_pedido", "string"),
            ("nomb_tipo_pedido", "desc_tipo_pedido", "string"),
        ],
        reference="code/analytics/dim_tipo_pedido.py",
    ),
    PassthroughDimSpec(
        name="dim_origen_pedido",
        domain_table="m_origen_pedido",
        id_col="id_origen_pedido",
        columns=[
            ("id_origen_pedido", "id_origen_pedido", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_origen_pedido", "cod_origen_pedido", "string"),
            ("nomb_origen_pedido", "desc_origen_pedido", "string"),
        ],
        reference="code/analytics/dim_origen_pedido.py",
    ),
    PassthroughDimSpec(
        name="dim_medio_transporte",
        domain_table="m_medio_transporte",
        id_col="id_medio_transporte",
        columns=[
            ("id_medio_transporte", "id_medio_transporte", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_medio_transporte", "cod_medio_transporte", "string"),
            ("cod_tipo_medio_transporte", "cod_tipo_medio_transporte", "string"),
            ("desc_tipo_medio_transporte", "desc_tipo_medio_transporte", "string"),
            ("cant_peso_maximo", "cant_peso_maximo", "int"),
            ("cant_tarimas", "cant_tarimas", "decimal(38,12)"),
        ],
        reference="code/analytics/dim_medio_transporte.py",
    ),
    PassthroughDimSpec(
        name="dim_pais",
        domain_table="m_pais",
        id_col="id_pais",
        columns=[
            ("id_pais", "id_pais", "string"),
            ("cod_pais", "cod_pais", "string"),
            ("desc_pais", "desc_pais", "string"),
            (None, "desc_pais_comercial", "string"),
        ],
        reference="code/analytics/dim_pais.py:16-25",
    ),
    PassthroughDimSpec(
        name="dim_producto",
        domain_table="m_articulo",
        id_col="id_producto",
        columns=[
            ("id_articulo", "id_producto", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_articulo", "cod_producto", "string"),
            ("desc_articulo", "desc_producto", "string"),
            ("desc_linea", "desc_linea", "string"),
            ("desc_familia", "desc_familia", "string"),
            ("desc_marca", "desc_marca", "string"),
            ("cod_unidad_negocio", "cod_unidad_negocio", "string"),
            ("desc_unidad_negocio", "desc_unidad_negocio", "string"),
        ],
        reference="code/analytics/dim_producto.py:17-45 (reduced attr width)",
    ),
    PassthroughDimSpec(
        name="dim_fuerza_venta",
        domain_table="m_fuerza_venta",
        id_col="id_fuerza_venta",
        columns=[
            ("id_fuerza_venta", "id_fuerza_venta", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_fuerza_venta", "cod_fuerza_venta", "string"),
            ("desc_fuerza_venta", "desc_fuerza_venta", "string"),
        ],
        reference="code/analytics/dim_fuerza_venta.py:17-26",
    ),
    PassthroughDimSpec(
        name="dim_lista_precio",
        domain_table="m_lista_precio",
        id_col="id_lista_precio",
        columns=[
            ("id_lista_precio", "id_lista_precio", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_lista_precio", "cod_lista_precio", "string"),
            ("nomb_lista_precio", "desc_lista_precio", "string"),
        ],
        reference="code/analytics/dim_lista_precio.py:18-27",
    ),
    PassthroughDimSpec(
        name="dim_transportista",
        domain_table="m_transportista",
        id_col="id_transportista",
        columns=[
            ("id_transportista", "id_transportista", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_transportista", "cod_transportista", "string"),
            ("nomb_transportista", "nomb_transportista", "string"),
            ("cod_tipo_transportista", "cod_tipo_transportista", "string"),
            ("desc_tipo_transportista", "desc_tipo_transportista", "string"),
            ("ruc_transportista", "ruc_transportista", "string"),
        ],
        reference="code/analytics/dim_transportista.py:16-28",
    ),
    PassthroughDimSpec(
        name="dim_vendedor",
        domain_table="m_responsable_comercial",
        id_col="id_vendedor",
        columns=[
            ("id_responsable_comercial", "id_vendedor", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_responsable_comercial", "cod_vendedor", "string"),
            ("nomb_responsable_comercial", "nombre_vendedor", "string"),
        ],
        reference="code/analytics/dim_vendedor.py:16-24",
    ),
    PassthroughDimSpec(
        name="dim_tipo_venta",
        domain_table="m_tipo_venta",
        id_col="id_tipo_venta",
        columns=[
            ("id_tipo_venta", "id_tipo_venta", "string"),
            ("id_pais", "id_pais", "string"),
            ("cod_tipo_venta", "cod_tipo_venta", "string"),
            ("nomb_tipo_venta", "desc_tipo_venta", "string"),
            ("cod_tipo_operacion", "cod_tipo_operacion", "string"),
        ],
        reference="code/analytics/dim_tipo_venta.py",
    ),
]
