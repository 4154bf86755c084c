"""Relational idiom tests: top1_per_group, rolling range-join vs the
rangeBetween-window rewrite (SURVEY §7.1 step 6 equivalence test)."""

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators import relational as R


def test_top1_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 3, "y"), ("b", 2, "z")], "k string, v int, p string"
    )
    out = R.top1_per_group(df, ["k"], [F.col("v").desc()])
    got = {r["k"]: (r["v"], r["p"]) for r in out.collect()}
    assert got == {"a": (3, "y"), "b": (2, "z")}
    ranked = R.top1_per_group(df, ["k"], [F.col("v").desc()], keep=False)
    assert "orden" in ranked.columns and ranked.count() == 3


ROLL_ROWS = [
    # (key, period, v) one row per (key, period) — pre-aggregated
    ("c1", "202410", 10.0),
    ("c1", "202411", 20.0),
    ("c1", "202412", 30.0),
    ("c1", "202501", 40.0),
    ("c1", "202503", 50.0),   # gap: 202502 missing
    ("c2", "202501", 5.0),
]


def test_rolling_join_and_window_equivalent(spark):
    df = spark.createDataFrame(ROLL_ROWS, "k string, per string, v double")
    joined = R.rolling_range_join(
        df, ["k"], "per", [F.sum("past.v").alias("s3")], months_back=2
    )
    windowed = R.rolling_window(df, ["k"], "per", [(F.col("v"), "s3")], months_back=2)
    a = {(r["k"], r["per"]): r["s3"] for r in joined.collect()}
    b = {(r["k"], r["per"]): r["s3"] for r in windowed.collect()}
    assert a == b
    # hand-checked values: trailing 3 calendar months inclusive, gaps honored
    assert a[("c1", "202412")] == 60.0
    assert a[("c1", "202501")] == 90.0
    assert a[("c1", "202503")] == 90.0  # 202501 + 202503 (202502 absent)
    assert a[("c2", "202501")] == 5.0
