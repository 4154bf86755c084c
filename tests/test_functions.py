"""Unit tests for the fn_transform_* expression library, the cast
interpreter, and surrogate keys (SURVEY §2.9-2.10, §1.3)."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.functions import casts, keys, transforms


def test_clear_string(spark):
    df = spark.createDataFrame(
        [("  hi  ",), ("",), ("   ",), (None,)], "s string"
    )
    out = [r[0] for r in df.select(transforms.fn_transform_ClearString(F.col("s"))).collect()]
    assert out == ["hi", None, None, None]


def test_concatenate(spark):
    df = spark.createDataFrame([(" a ", "b", 3)], "x string, y string, z int")
    out = df.select(
        transforms.fn_transform_Concatenate(F.col("x"), F.col("y"), F.col("z")).alias("k")
    ).collect()
    assert out[0]["k"] == "a|b|3"


def test_date_and_datetime(spark):
    df = spark.createDataFrame([("2024-03-05", "20240305")], "iso string, compact string")
    row = df.select(
        transforms.fn_transform_Date(F.col("iso")).alias("d1"),
        transforms.fn_transform_Date(F.col("compact"), "yyyyMMdd").alias("d2"),
        transforms.fn_transform_Datetime(F.lit("2024-03-05 10:11:12")).alias("ts"),
    ).collect()[0]
    assert row["d1"] == dt.date(2024, 3, 5)
    assert row["d2"] == dt.date(2024, 3, 5)
    assert row["ts"] == dt.datetime(2024, 3, 5, 10, 11, 12)


def test_date_magic_family(spark):
    from cdk_datalake_analytics_comercial_spark.core import magic_dates as md

    magic = md.py_date_to_magic_2008(dt.date(2024, 3, 5))
    df = spark.createDataFrame([(magic, 101112)], "d int, t int")
    row = df.select(
        transforms.fn_transform_DateMagic(F.col("d")).alias("d"),
        transforms.fn_transform_DatetimeMagic(F.col("d"), F.col("t")).alias("ts"),
        transforms.fn_transform_PeriodMagic(F.col("d")).alias("p"),
    ).collect()[0]
    assert row["d"] == dt.date(2024, 3, 5)
    assert row["ts"] == dt.datetime(2024, 3, 5, 10, 11, 12)
    assert row["p"] == "202403"


def test_case_mapping(spark):
    df = spark.createDataFrame([("A",), (" B ",), ("Z",), (None,)], "s string")
    col = transforms.fn_transform_Case(F.col("s"), {"A": "alpha", "B": "beta"}, default="other")
    out = [r[0] for r in df.select(col).collect()]
    assert out == ["alpha", "beta", "other", "other"]


def test_transform_default(spark):
    df = spark.createDataFrame([("12", "x")], "n string, s string")
    row = df.select(
        casts.transform_default(F.col("n"), "integer").alias("i"),
        casts.transform_default(F.col("n"), "numeric(10,2)").alias("d"),
        casts.transform_default(F.col("s"), "varchar", literal="null").alias("nl"),
        casts.transform_default(F.col("s"), "varchar", literal="fixed").alias("lit"),
    ).collect()[0]
    assert row["i"] == 12
    assert row["d"] == Decimal("12.00")
    assert row["nl"] is None
    assert row["lit"] == "fixed"


def test_cast_projection(spark):
    df = spark.createDataFrame([(1, "2.5", "2024-01-02")], "a int, b string, c string")
    out = casts.cast_projection(
        df, [("a", "string"), ("b", "numeric(10,3)"), ("c", "date")]
    )
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "decimal(10,3)",
        "date",
    ]
    row = out.collect()[0]
    assert row["a"] == "1" and row["b"] == Decimal("2.500") and row["c"] == dt.date(2024, 1, 2)


def test_decimal_sum_order_invariant(spark):
    # float sums drift with partitioning; decimal sums must not
    vals = [(float(f"0.{i}1"),) for i in range(1, 200)]
    df1 = spark.createDataFrame(vals, "v double").repartition(1)
    df7 = spark.createDataFrame(list(reversed(vals)), "v double").repartition(7)
    s1 = df1.select(casts.decimal_sum(F.col("v")).alias("s")).collect()[0]["s"]
    s7 = df7.select(casts.decimal_sum(F.col("v")).alias("s")).collect()[0]["s"]
    assert s1 == s7


def test_surrogate_key(spark):
    df = spark.createDataFrame([(" 01 ", "AB", 7)], "c1 string, c2 string, c3 int")
    row = df.select(keys.surrogate_key("c1", "c2", "c3").alias("k")).collect()[0]
    assert row["k"] == "01|AB|7"
