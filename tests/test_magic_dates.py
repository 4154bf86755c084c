"""Unit tests for the BigMagic date/time codecs (SURVEY §1.4: two pivots,
733042/2008-01-01 and 693596/1900-01-01, kept as separate codecs)."""

import datetime as dt

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core import magic_dates as md


def test_py_codecs_roundtrip():
    for d in (dt.date(2008, 1, 1), dt.date(2024, 2, 29), dt.date(1999, 12, 31)):
        assert md.py_magic_2008_to_date(md.py_date_to_magic_2008(d)) == d
        assert md.py_magic_1900_to_date(md.py_date_to_magic_1900(d)) == d


def test_py_codec_pivot_values():
    # the pivot encodes as exactly the offset (datediff == 0)
    assert md.py_date_to_magic_2008(dt.date(2008, 1, 1)) == 733042
    assert md.py_date_to_magic_1900(dt.date(1900, 1, 1)) == 693596
    # one day later → +1 (the reference's day-count convention)
    assert md.py_date_to_magic_2008(dt.date(2008, 1, 2)) == 733043


def test_column_codecs_match_python(spark):
    dates = [dt.date(2008, 1, 1), dt.date(2020, 6, 15), dt.date(1995, 3, 3)]
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    out = df.select(
        md.date_to_magic_2008(F.col("d")).alias("m2008"),
        md.date_to_magic_1900(F.col("d")).alias("m1900"),
        md.magic_2008_to_date(md.date_to_magic_2008(F.col("d"))).alias("rt2008"),
        md.magic_1900_to_date(md.date_to_magic_1900(F.col("d"))).alias("rt1900"),
        F.col("d"),
    ).collect()
    for row in out:
        assert row["m2008"] == md.py_date_to_magic_2008(row["d"])
        assert row["m1900"] == md.py_date_to_magic_1900(row["d"])
        assert row["rt2008"] == row["d"]
        assert row["rt1900"] == row["d"]


def test_time_hhmmss(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 9, 5, 7),), (dt.datetime(2024, 1, 1, 23, 59, 59),)],
        "ts timestamp",
    )
    out = df.select(
        md.time_to_hhmmss(F.col("ts")).alias("t"),
        md.hhmmss_to_time_str(md.time_to_hhmmss(F.col("ts"))).alias("s"),
    ).collect()
    assert out[0]["t"] == 90507
    assert out[0]["s"] == "09:05:07"
    assert out[1]["t"] == 235959
    assert out[1]["s"] == "23:59:59"
