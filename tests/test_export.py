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
