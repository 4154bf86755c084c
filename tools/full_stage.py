"""One coherent stage-layer universe covering EVERY table the 31 domain jobs
read — company "10" in country PE, branch 01, client C1, article A1, May 2025.

Each entry: table → (schema DDL, rows, instance). The registry derives from
the DDL, so jobs whose inputs are deliberately left empty still resolve via
the S3 empty-schema fallback. Values are chosen so every domain job emits at
least one row (the analytics wave then reads real, non-empty domain tables —
the full layer-contract graph resolves end to end).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal as D

TS = dt.datetime(2025, 4, 1, 12, 0)
MAY = dt.date(2025, 5, 2)
MAY2 = dt.date(2025, 5, 3)

# table → (schema_ddl, rows, instance)
STAGE_TABLES: dict[str, tuple[str, list, str]] = {
    "m_pais": (
        "id_pais string, cod_pais string, desc_pais string",
        [("PE", "PE", "PERU")],
        "principal",
    ),
    "m_compania": (
        "cod_compania string, cod_pais string, desc_compania string, es_activo string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "PE", "AJE PERU", "T", TS, TS)],
        "pe01",
    ),
    "m_parametro": (
        "id_compania string, cod_moneda_mn string",
        [("10", "PEN")],
        "pe01",
    ),
    "m_tipo_cambio": (
        "cod_compania string, cod_moneda string, fecha date, "
        "tc_venta decimal(12,6), tc_compra decimal(12,6)",
        [("10", "PEN", dt.date(2025, 5, 1), D("3.75"), D("4"))],
        "pe01",
    ),
    # ---- article + attribute masters --------------------------------------
    "m_articulo": (
        "id_articulo string, cod_compania string, cod_articulo string, "
        "cod_articulo_corp int, desc_articulo string, cod_linea string, "
        "cod_familia string, cod_subfamilia string, cod_marca string, "
        "cod_categoria string, cant_unidad_paquete decimal(38,12), "
        "cant_paquete_caja decimal(38,12), cant_unidad_volumen decimal(38,12), "
        "es_activo string",
        [("10|A1", "10", "A1", 0, "AGUA 1L", "L1", "F1", "S1", "M1", "C1",
          D("10"), D("2"), D("2"), "T")],
        "pe01",
    ),
    "m_linea": (
        "cod_compania string, cod_linea string, desc_linea string",
        [("10", "L1", "BEBIDAS")],
        "pe01",
    ),
    "m_familia": (
        "cod_compania string, cod_linea string, cod_familia string, desc_familia string",
        [("10", "L1", "F1", "AGUAS")],
        "pe01",
    ),
    "m_subfamilia": (
        "cod_compania string, cod_linea string, cod_familia string, "
        "cod_subfamilia string, desc_subfamilia string",
        [("10", "L1", "F1", "S1", "AGUAS SIN GAS")],
        "pe01",
    ),
    "m_marca": (
        "cod_compania string, cod_marca string, desc_marca string",
        [("10", "M1", "CIELO")],
        "pe01",
    ),
    "m_categoria": (
        "cod_compania string, cod_categoria string, desc_categoria string",
        [("10", "C1", "AGUA EMBOTELLADA")],
        "pe01",
    ),
    # ---- commercial structure ---------------------------------------------
    "m_ruta": (
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_ruta string, cod_zona string, cod_vendedor string, desc_ruta string, "
        "cod_modelo_atencion string, es_activo string",
        [("10", "01", "F1", "R1", "Z1", "V9", "RUTA CENTRO", "MA1", "T")],
        "pe01",
    ),
    "m_zona": (
        "cod_compania string, cod_sucursal string, cod_zona string, cod_region string, "
        "cod_subregion string, cod_centro_distribucion string, cod_supervisor string, "
        "desc_zona string, es_activo string",
        [("10", "01", "Z1", "RG1", "SR1", "Z1", "SUP1", "ZONA NORTE", "T")],
        "pe01",
    ),
    "m_region": (
        "cod_pais string, cod_region string, desc_region string, es_activo string",
        [("PE", "RG1", "REGION NORTE", "T")],
        "pe01",
    ),
    "m_subregion": (
        "cod_pais string, cod_region string, cod_subregion string, "
        "desc_subregion string, es_activo string",
        [("PE", "RG1", "SR1", "SUBREGION LIMA", "T")],
        "pe01",
    ),
    "m_division": (
        "cod_compania string, cod_division string, desc_division string, "
        "cod_jefe_venta string, es_activo string",
        [("10", "Z1", "DIVISION CENTRO", "JV1", "T")],
        "pe01",
    ),
    "m_modulo": (
        "id_modulo string, cod_compania string, cod_sucursal string, "
        "cod_fuerza_venta string, cod_ruta string, cod_modulo string, desc_modulo string",
        # extraction id is compania|sucursal|fuerza_venta|modulo (NO ruta —
        # datalake_tables_bigmagic.csv ID_COLUMN for m_modulo), matching the
        # 4-part id m_asignacion_modulo mints for its module pointer
        [("10|01|F1|M1", "10", "01", "F1", "R1", "M1", "MODULO NORTE")],
        "pe01",
    ),
    "m_asignacion_modulo": (
        "cod_compania string, cod_sucursal string, cod_fuerza_venta string, "
        "cod_modulo string, cod_cliente string, coord_x string, coord_y string",
        [("10", "01", "F1", "M1", "C1", "x1", "y1")],
        "pe01",
    ),
    # ---- territorial hierarchy --------------------------------------------
    "m_ng1": (
        "id_pais string, cod_ng1 string, desc_ng1 string",
        [("PE", "D1", "LIMA DEP")],
        "pe01",
    ),
    "m_ng2": (
        "id_pais string, cod_ng1 string, cod_ng2 string, desc_ng2 string",
        [("PE", "D1", "P1", "LIMA PROV")],
        "pe01",
    ),
    "m_ng3": (
        "id_pais string, cod_ng1 string, cod_ng2 string, cod_ng3 string, "
        "desc_ng3 string, cod_zona_postal string",
        [("PE", "D1", "P1", "033", "MIRAFLORES", "15074")],
        "pe01",
    ),
    # ---- clients ----------------------------------------------------------
    "m_cliente": (
        "cod_compania string, cod_sucursal string, cod_cliente string, "
        "nomb_cliente string, es_activo string, cod_cuenta_clave string, "
        "cod_canal string, cod_giro string, cod_subgiro string, "
        "cod_zona_postal string, cod_lista_precio string, direccion string, "
        "tipo_documento_identidad string, nro_documento_identidad string, "
        "cod_cliente_principal string, fecha_creacion timestamp, "
        "fecha_modificacion timestamp",
        [("10", "01", "C1", "BODEGA CENTRAL", "T", "K1", "CN1", "G1", "SG1",
          "15074", "LP1", "AV LIMA 123", "DNI", "44556677", None, TS, TS)],
        "pe01",
    ),
    "m_cuenta_clave": (
        "cod_compania string, cod_cuenta_clave string, descripcion string",
        [("10", "K1", "CUENTA CLAVE AJE")],
        "pe01",
    ),
    "m_tipo_cliente": (
        "cod_compania string, cod_cliente string, tipo_cliente string",
        [("10", "C1", "A")],
        "pe01",
    ),
    "i_relacion_proced_venta": (
        "cod_compania string, cod_documento_pedido string, "
        "cod_procedimiento_pedido string, cod_documento_venta string, "
        "cod_procedimiento_venta string, cod_operacion_venta string, "
        "cod_tipo_pedido string",
        [("10", "200", "P01", "FAC", "PR1", "OPV", "TP1")],
        "pe01",
    ),
    "i_relacion_consumo": (
        "cod_compania string, cod_canal string, cod_giro string, cod_subgiro string",
        [("10", "CN1", "G1", "SG1")],
        "pe01",
    ),
    "m_canal": (
        "cod_compania string, cod_canal string, desc_canal string, es_activo string",
        [("10", "CN1", "BODEGA", "T")],
        "pe01",
    ),
    "m_giro": (
        "cod_compania string, cod_giro string, desc_giro string, es_activo string",
        [("10", "G1", "ABARROTES", "T")],
        "pe01",
    ),
    "m_subgiro": (
        "cod_compania string, cod_subgiro string, desc_subgiro string, es_activo string",
        [("10", "SG1", "MINIMARKET", "T")],
        "pe01",
    ),
    # ---- small conform-dim sources ----------------------------------------
    "m_condicion_pago": (
        "cod_compania string, cod_forma_pago string, desc_forma_pago string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "CONT", "CONTADO", TS, TS)],
        "pe01",
    ),
    "m_tipo_pedido": (
        "cod_compania string, cod_tipo_pedido string, desc_tipo_pedido string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "TP1", "PEDIDO REGULAR", TS, TS)],
        "pe01",
    ),
    "m_origen_pedido": (
        "cod_compania string, cod_origen_pedido string, desc_origen_pedido string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "OP1", "CAMPO", TS, TS)],
        "pe01",
    ),
    "m_vehiculo": (
        "cod_compania string, cod_medio_transporte string, "
        "cod_tipo_medio_transporte string, desc_tipo_medio_transporte string, "
        "cant_peso_maximo int, cant_tarimas_camion decimal(38,12), "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "V01", "CAM", "CAMION 10T", 10000, D("12"), TS, TS)],
        "pe01",
    ),
    "m_almacen": (
        "id_almacen string, cod_compania string, id_sucursal string, cod_almacen string, "
        "desc_almacen string, tipo_almacen string",
        [("10|01|AL1", "10", "10|01", "AL1", "ALMACEN CENTRAL", "PROPIO")],
        "pe01",
    ),
    "m_fuerza_venta": (
        "id_fuerza_venta string, cod_compania string, cod_fuerza_venta string, "
        "desc_fuerza_venta string",
        [("10|F1", "10", " F1 ", "PREVENTA")],
        "pe01",
    ),
    "m_lista_precio": (
        "id_lista_precio string, cod_compania string, cod_lista_precio string, "
        "desc_lista_precio string",
        [("10|LP1", "10", "LP1 ", "LISTA GENERAL")],
        "pe01",
    ),
    "m_sucursal": (
        "cod_compania string, cod_sucursal string, desc_sucursal string, "
        "es_activo string, fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "01", "SUCURSAL LIMA", "T", TS, TS)],
        "pe01",
    ),
    "m_modelo_atencion": (
        "id_compania string, cod_modelo_atencion string, desc_modelo_atencion string",
        [("10", "MA1", "Pre Venta")],
        "pe01",
    ),
    # ---- people / carriers ------------------------------------------------
    "m_persona": (
        "id_persona string, cod_compania string, cod_persona string, "
        "nomb_persona string, nro_documento string",
        [("10|T1", "10", "T1", "TRANSPORTES SA", "20100"),
         ("10|V9", "10", "V9", "JUAN PEREZ", "44556677")],
        "pe01",
    ),
    "m_transportista": (
        "id_transportista string, cod_compania string, cod_transportista string, "
        "cod_tipo_transportista string, fecha_creacion timestamp, "
        "fecha_modificacion timestamp",
        [("10|T1", "10", "77", "TER", TS, TS)],
        "pe01",
    ),
    "m_tipo_transportista": (
        "cod_compania string, cod_tipo_transportista string, descripcion1 string",
        [("10", "TER", "TERCERO")],
        "pe01",
    ),
    "m_vendedor": (
        "cod_compania string, cod_vendedor string, cod_tipo_vendedor string",
        [("10", "V9", "PRE")],
        "pe01",
    ),
    # ---- procedure / document-type bridges --------------------------------
    "m_procedimiento": (
        "cod_compania string, cod_documento_transaccion string, cod_procedimiento string, "
        "desc_procedimiento string, cod_tipo_operacion string",
        [("10", "FAC", "PR1", "VENTA CONTADO", "ven"),
         ("10", "200", "P01", "PEDIDO VENTA", "ven"),
         ("10", "300", "P02", "PEDIDO PROMO", "pro")],
        "pe01",
    ),
    "m_tipo_documento": (
        "cod_compania string, cod_tipo_documento string",
        [("10", "FAC")],
        "pe01",
    ),
    "m_tipo_transaccion": (
        "cod_compania string, cod_tipo_transaccion string, cod_documento_transaccion string",
        [("10", "DCV", "FAC")],
        "pe01",
    ),
    "m_operacion": (
        "cod_compania string, cod_operacion string, cod_tipo_operacion string",
        [("10", "OPV", "Ven"), ("10", "OPP", "Pro")],
        "pe01",
    ),
    # ---- sales documents --------------------------------------------------
    "t_documento_venta": (
        "cod_compania string, cod_sucursal string, cod_documento_venta string, "
        "nro_documento_venta string, cod_documento_pedido string, "
        "nro_documento_pedido string, cod_procedimiento string, cod_cliente string, "
        "cod_zona string, cod_ruta string, cod_moneda string, "
        "tipo_cambio_mn decimal(12,6), tipo_cambio_me decimal(12,6), "
        "imp_venta decimal(38,12), cod_estado_comprobante string, "
        "fecha_liquidacion date, fecha_emision date, "
        "cod_almacen string, cod_fuerza_venta string, cod_vendedor string, "
        "cod_supervisor string, cod_lista_precio string, cod_forma_pago string, "
        "cod_motivo_rechazo string, cod_modulo string, nro_comprobante string, "
        "fecha_pedido date, flg_facglob string, flg_refact string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp, "
        "cod_documento_almacen string, nro_documento_almacen string",
        [("10", "01", "FAC", "0001", "200", "N1", "PR1", "C1", "Z1", "R1", "PEN",
          D("9.9"), D("0"), D("100.5"), "001", MAY, dt.date(2025, 5, 1),
          "AL1", "F1", "V9", "SUP1", "LP1", "FP1", "MR1", "M1", "CP-0001",
          dt.date(2025, 4, 30), "F", "F", TS, TS, "GRA", "900")],
        "pe01",
    ),
    "t_documento_venta_detalle": (
        "cod_compania string, cod_sucursal string, cod_almacen string, "
        "cod_documento_venta string, nro_documento_venta string, "
        "cod_documento_pedido string, nro_documento_pedido string, "
        "cod_articulo string, cod_operacion string, "
        "cant_paquete decimal(38,12), cant_unidad decimal(38,12), "
        "imp_valorizado decimal(38,12), imp_cobrar decimal(38,12), "
        "imp_descuento decimal(38,12), imp_descuento_sinimp decimal(38,12), "
        "precio_paquete decimal(38,12), imp_isc decimal(38,12), "
        "imp_igv decimal(38,12), imp_im3 decimal(38,12), imp_im4 decimal(38,12), "
        "imp_im5 decimal(38,12), imp_im6 decimal(38,12), "
        "fecha_creacion timestamp, fecha_modificacion timestamp, es_eliminado string",
        [("10", "01", "AL1", "FAC", "0001", "200", "N1", "A1", "OPV",
          D("3"), D("5"), D("100"), D("110"), D("10"), D("8"), D("20"),
          D("1"), D("2"), D("0"), D("0"), D("0"), D("0"), TS, TS, "F")],
        "pe01",
    ),
    # ---- order documents --------------------------------------------------
    "t_documento_pedido": (
        "cod_compania string, cod_sucursal string, cod_documento_pedido string, "
        "nro_documento_pedido string, cod_cliente string, cod_zona_distribucion string, "
        "fecha_pedido date, cod_almacen string, cod_documento_pedido_origen string, "
        "cod_tipo_pedido string, cod_fuerza_venta string, cod_vendedor string, "
        "cod_condicion_pago string, cod_centro_distribucion string, "
        "fecha_entrega date, fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "01", "200", "N1", "C1", "Z1", MAY, "AL1", "OR1", "TP1", "F1",
          "V9", "CP1", "Z1", MAY, TS, TS)],
        "pe01",
    ),
    "t_documento_pedido_ades": (
        "cod_compania string, cod_sucursal string, cod_documento_transaccion string, "
        "nro_comprobante string, cod_cliente string, cod_zona_distribucion string, "
        "fecha_pedido date, cod_almacen_emisor string, cod_tipo_documento_origen string, "
        "cod_tipo_pedido string, cod_fuerza_venta string, cod_vendedor string, "
        "cod_condicion_pago string, cod_centro_distribucion string, "
        "fecha_entrega date, fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "01", "300", "N3", "C1", "Z1", MAY, "AL1", "OR1", "TP1", "F1",
          "V9", "CP1", "Z1", MAY, TS, TS)],
        "pe01",
    ),
    "t_documento_pedido_detalle": (
        "cod_compania string, cod_sucursal string, cod_almacen string, "
        "cod_documento_pedido string, nro_documento_pedido string, cod_cliente string, "
        "cod_articulo string, cod_procedimiento string, cod_zona string, cod_ruta string, "
        "cod_documento_almacen string, nro_documento_almacen string, fecha_pedido date, "
        "cant_paquete decimal(38,12), cant_unidad decimal(38,12), "
        "cant_paquete_asignado decimal(38,12), cant_unidad_asignado decimal(38,12), "
        "cod_lista_precio string, cod_modulo string, id_salesforce string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "01", "AL1", "200", "N1", "C1", "A1", "P01", "Z1", "R1",
          "GRA", "900", MAY, D("2"), D("10"), D("2"), D("0"), "LP1", "M1",
          "SF1", TS, TS)],
        "pe01",
    ),
    "t_documento_pedido_ades_detalle": (
        "cod_compania string, cod_sucursal string, cod_almacen_emisor string, "
        "cod_documento_transaccion string, nro_comprobante string, cod_cliente string, "
        "cod_articulo string, cod_procedimiento string, fecha_pedido date, "
        "cantidad_cajas decimal(38,12), cantidad_botellas decimal(38,12), "
        "cantidad_cajas_asignada decimal(38,12), cantidad_botellas_asignada decimal(38,12), "
        "cod_lista_precios string, cod_ruta_distribucion string, cod_modulo string, "
        "cod_tipo_documento_almacen string, nro_documento_almacen string, "
        "id_salesforce string, cod_zona_distribucion string, "
        "fecha_creacion timestamp, fecha_modificacion timestamp",
        [("10", "01", "AL1", "300", "N3", "C1", "A1", "P02", MAY,
          D("1"), D("0"), D("0"), D("0"), "LP1", "R1", "M1",
          None, None, "SF3", "Z1", TS, TS)],
        "pe01",
    ),
    # ---- visits -----------------------------------------------------------
    "t_historico_visita": (
        "cod_compania string, cod_sucursal string, cod_cliente string, "
        "cod_fuerza_venta string, fecha_visita date, fecha_modificacion timestamp",
        [("10", "01", "C1", "F1", dt.date(2025, 5, 10), TS)],
        "pe01",
    ),
    # ---- inventory --------------------------------------------------------
    "t_movimiento_inventario": (
        "id_movimiento_almacen string, id_movimiento_ingreso string, "
        "id_documento_almacen string, "
        "cod_compania string, cod_sucursal string, id_sucursal string, "
        "id_almacen string, cod_almacen_emisor_origen string, "
        "cod_documento_transaccion string, nro_documento_almacen string, "
        "nro_documento_movimiento string, cod_procedimiento string, "
        "cod_transportista string, cod_vehiculo string, cod_chofer string, "
        "cod_estado_comprobante string, fecha_emision date, fecha_almacen date, "
        "fecha_creacion timestamp, fecha_modificacion timestamp, "
        "id_compania_referencia string, id_sucursal_referencia string, "
        "id_almacen_referencia string, id_vendedor string, id_persona string, "
        "id_procedimiento string, fecha_liquidacion date, nro_serie_alm string, "
        "nropricoal string, cod_tipo_documento_liquidacion string, "
        "nro_documento_liquidacion string, cod_documento_transaccion1 string, "
        "nro_documento_almacen1 string, cod_tipo_documento_referencia2 string, "
        "nro_documento_almacen_referencia2 string, usuario_creacion string, "
        "usuario_modificacion string",
        [("MV1", "MI1", "DA1", "10", "01", "10|01", "10|01|AL1", "AL1", "GRA", "900",
          "M001", "ING", "77", "V01", "CH1", "PLI", MAY, MAY, TS, TS,
          None, None, None, "10|V9", "10|P1", "10|ING", MAY, "S01", "PC1",
          None, None, None, None, None, None, "ana", "ana")],
        "pe01",
    ),
    "t_movimiento_inventario_transito": (
        "id_documento_almacen string, id_compania_destino string, "
        "id_sucursal_destino string, id_almacen_destino string, estado string",
        [("DA1", "10", "10|02", "10|02|AL2", "EN TRANSITO")],
        "pe01",
    ),
    "m_documento_almacen": (
        "cod_compania string, cod_transaccion string, cod_operacion_origen string",
        [("10", "ING", "S")],
        "pe01",
    ),
    "m_documento_transaccion": (
        "cod_compania string, cod_documento_transaccion string",
        [("10", "ING")],
        "pe01",
    ),
    "t_movimiento_inventario_detalle": (
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
        [("10", "10|01", "10|01|AL1", "10|A1", "MV1", "ING", "NIN", "900", "APR",
          None, dt.date(2025, 5, 1), D("10"), D("5"), D("125"), D("100"), D("10"),
          "CC1", "M001", "1", None, None, "APR", "MT1", "CJ", "1",
          "ana", TS, "ana", TS)],
        "pe01",
    ),
    "t_toma_inventario": (
        "id_pais string, id_compania string, cod_compania string, id_sucursal string, "
        "cod_almacen_emisor string, fecha_inventario date, estado string, "
        "cod_empleado_aprobador string, usuario_creacion string, "
        "fecha_creacion timestamp, usuario_modificacion string, "
        "fecha_modificacion timestamp",
        [("PE", "10", "10", "10|01", "ALM1", dt.date(2025, 5, 1), "APROBADO",
          "E1", "ana", TS, "ana", TS)],
        "pe01",
    ),
    "m_empleado": (
        "cod_compania string, cod_empleado string, nomb_empleado string",
        [("10", "E1", "ANA APROBADORA")],
        "pe01",
    ),
    "t_toma_inventario_detalle": (
        "id_sucursal string, cod_almacen_emisor string, id_almacen string, "
        "id_articulo string, fecha_inventario date, stock_final decimal(30,4)",
        [("10|01", "ALM1", "10|ALM1", "10|A1", dt.date(2025, 5, 1), D("5"))],
        "pe01",
    ),
    "t_cierre_inventario_cpm": (
        "id_sucursal string, id_articulo string, id_periodo string, "
        "imp_cpm decimal(30,4), imp_saldo_inicial decimal(30,4), "
        "imp_ingreso decimal(30,4), imp_salida decimal(30,4), "
        "imp_saldo_final decimal(30,4)",
        [("10|01", "10|A1", "202505", D("12.5"), D("100"), D("40"), D("50"), D("90"))],
        "pe01",
    ),
}


def full_registry_dict() -> dict[str, list[tuple[str, str]]]:
    """Registry entries derived from the DDL strings (name/type pairs)."""
    out: dict[str, list[tuple[str, str]]] = {}
    for table, (ddl, _rows, _inst) in STAGE_TABLES.items():
        cols = []
        for part in ddl.split(", "):
            name, typ = part.strip().split(" ", 1)
            cols.append((name, typ))
        out[table] = cols
    return out


def seed_full_stage(spark, lake) -> None:
    from cdk_datalake_analytics_comercial_spark.core.catalog import Layer

    for table, (ddl, rows, instance) in STAGE_TABLES.items():
        spark.createDataFrame(rows, ddl).write.mode("overwrite").parquet(
            lake.table_path(Layer.STAGE, table, instance)
        )
