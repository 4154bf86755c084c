"""Export-sink tests: delete-preaction SQL synthesis and the CSV.gz raw
sink; the live JDBC write needs a warehouse and is exercised when a test URL
is provided (none in this container)."""

import glob

from cdk_datalake_analytics_comercial_spark.sources.export import (
    build_delete_preaction,
    collect_partition_values,
)
from cdk_datalake_analytics_comercial_spark.sources.reader import read_csv
from cdk_datalake_analytics_comercial_spark.sources.writer import write_csv_gzip


def test_build_delete_preaction():
    sql = build_delete_preaction(
        "analytics.fact_venta",
        {"id_pais": ["PE", "CL"], "id_periodo": ["202504", "202505"]},
    )
    assert sql == (
        "DELETE FROM analytics.fact_venta "
        "WHERE id_pais IN ('CL', 'PE') AND id_periodo IN ('202504', '202505')"
    )


def test_build_delete_preaction_quoting_and_empty():
    sql = build_delete_preaction("t", {"k": ["o'brien"]})
    assert sql == "DELETE FROM t WHERE k IN ('o''brien')"
    assert build_delete_preaction("t", {"k": []}) is None
    assert build_delete_preaction("t", {}) is None


def test_collect_partition_values(spark):
    df = spark.createDataFrame(
        [("PE", "202504"), ("PE", "202505"), ("CL", "202504")],
        "id_pais string, id_periodo string",
    )
    vals = collect_partition_values(df, ["id_pais", "id_periodo"])
    assert sorted(vals["id_pais"]) == ["CL", "PE"]
    assert sorted(vals["id_periodo"]) == ["202504", "202505"]


def test_csv_gzip_roundtrip(spark, tmp_path):
    path = str(tmp_path / "raw_csv")
    df = spark.createDataFrame([(1, "a;b"), (2, None)], "id int, v string")
    write_csv_gzip(df, path)
    assert glob.glob(f"{path}/*.csv.gz")
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a;b"), (2, None)]


def test_read_csv_semicolon(spark, tmp_path):
    p = tmp_path / "conf.csv"
    p.write_text("layer;procedure;exe_order\ndomain;m_pais;1\ndomain;m_compania;2\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["layer", "procedure", "exe_order"]
    assert df.count() == 2
    assert dict(df.dtypes)["exe_order"] == "int"


# ---------------------------------------------------------------------------
# Config-interpreted column transforms (loadt_stage_to_redshift.py §2.10/§3.3)

import datetime as dt

from cdk_datalake_analytics_comercial_spark.sources.column_spec import (
    ColumnSpec,
    apply_column_specs,
    date_filter_column,
    magic_period_filter,
    parse_column_specs_csv,
)

AS_OF = dt.date(2025, 5, 15)


def test_apply_column_specs_one_projection(spark):
    df = spark.createDataFrame(
        [("10", "  X  ", dt.date(2025, 5, 2), dt.datetime(2025, 5, 2, 13, 4, 5))],
        "id_compania string, codigo string, fecha date, hora timestamp",
    )
    specs = [
        ColumnSpec("id_compania", "id_compania", "varchar"),
        ColumnSpec("codigo", "codigo", "character varying"),
        ColumnSpec(None, "origen", "varchar", literal="BIGMAGIC"),
        ColumnSpec("codigo", "anulado", "varchar", literal="null"),
        ColumnSpec("fecha", "fecha_magic", "integer",
                   function="convert_fecha_bigmagic", is_date_filter=True),
        ColumnSpec("hora", "hora_magic", "varchar", function="convert_hora_bigmagic"),
        ColumnSpec(None, "fecha_carga", "integer", function="get_date"),
        ColumnSpec(None, "fecha_carga_ts", "timestamp", function="get_date"),
        ColumnSpec("id_compania", "importe", "numeric(16,4)"),
    ]
    out = apply_column_specs(df, specs, AS_OF)
    assert out.columns == ["id_compania", "codigo", "origen", "anulado",
                           "fecha_magic", "hora_magic", "fecha_carga",
                           "fecha_carga_ts", "importe"]
    r = out.collect()[0]
    assert r["origen"] == "BIGMAGIC"                 # literal override
    assert r["anulado"] is None                      # "null" literal → typed NULL
    # 2025-05-02 is 6331 days after 2008-01-01 → + 733042
    assert r["fecha_magic"] == 6331 + 733042
    assert r["hora_magic"] == "130405"               # HHMMSS encoding
    assert r["fecha_carga"] == 20250515              # injected clock as int
    assert r["fecha_carga_ts"] == dt.datetime(2025, 5, 15)
    assert str(out.schema["importe"].dataType) == "DecimalType(16,4)"
    # engine shape: ONE Project over the scan, not a withColumn stack
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("Project") == 1


def test_magic_period_filter_range(spark):
    specs = [ColumnSpec("f", "fecha_magic", "integer",
                        function="convert_fecha_bigmagic", is_date_filter=True)]
    assert date_filter_column(specs) == "fecha_magic"
    from cdk_datalake_analytics_comercial_spark.core.magic_dates import (
        py_date_to_magic_2008,
    )
    df = spark.createDataFrame(
        [(py_date_to_magic_2008(dt.date(2025, 4, 10)),),
         (py_date_to_magic_2008(dt.date(2025, 5, 2)),),
         (py_date_to_magic_2008(dt.date(2025, 2, 1)),)],   # outside window
        "fecha_magic int",
    )
    kept = magic_period_filter(df, specs, ["202504", "202505"]).collect()
    assert len(kept) == 2


def test_parse_column_specs_csv():
    text = (
        "TABLA_STAGE;PAIS;COLUMNA;COLUMNA_DESTINO;TIPO_DATO_DESTINO;"
        "LITERAL_DESTINO;FUNCION;ES_FILTRO_FECHA\n"
        "t_venta;PE;fecha_liquidacion;fecha;integer;;convert_fecha_bigmagic;SI\n"
        "t_venta;PE;imp_venta;importe;numeric(18,4);;;\n"
        "m_cliente;PE;;origen;varchar;STAGE;;\n"
    )
    specs = parse_column_specs_csv(text)
    assert set(specs) == {("t_venta", "PE"), ("m_cliente", "PE")}
    venta = specs[("t_venta", "PE")]
    assert venta[0].function == "convert_fecha_bigmagic" and venta[0].is_date_filter
    assert venta[1].function == "default" and venta[1].target_type == "numeric(18,4)"
    assert specs[("m_cliente", "PE")][0].source is None
    assert specs[("m_cliente", "PE")][0].literal == "STAGE"
