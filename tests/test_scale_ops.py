"""Scale-utility tests: sargable period filters (semantics + pushdown) and
skew-salted aggregation/join equivalence."""

import datetime as dt

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core import magic_dates as md
from cdk_datalake_analytics_comercial_spark.operators import skew
from cdk_datalake_analytics_comercial_spark.operators.pruning import (
    magic_period_filter,
    period_filter,
)


def dates_df(spark):
    rows = [
        (1, dt.date(2025, 2, 28)),
        (2, dt.date(2025, 3, 1)),
        (3, dt.date(2025, 4, 15)),
        (4, dt.date(2025, 5, 31)),
        (5, dt.date(2025, 6, 1)),
    ]
    return spark.createDataFrame(rows, "id int, d date")


def test_period_filter_contiguous(spark):
    out = dates_df(spark).filter(period_filter(F.col("d"), ["202503", "202504", "202505"]))
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]


def test_period_filter_with_gap(spark):
    # gap: 202504 missing — exact membership must still hold
    out = dates_df(spark).filter(period_filter(F.col("d"), ["202503", "202505"]))
    assert sorted(r["id"] for r in out.collect()) == [2, 4]


def test_period_filter_empty(spark):
    assert dates_df(spark).filter(period_filter(F.col("d"), [])).count() == 0


def test_period_filter_is_pushed_to_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    dates_df(spark).write.parquet(path)
    df = spark.read.parquet(path).filter(
        period_filter(F.col("d"), ["202503", "202504", "202505"])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the range bounds must reach the parquet scan
    assert "GreaterThanOrEqual(d" in plan and "LessThanOrEqual(d" in plan


def test_magic_period_filter(spark):
    rows = [
        (1, md.py_date_to_magic_2008(dt.date(2025, 2, 28))),
        (2, md.py_date_to_magic_2008(dt.date(2025, 3, 10))),
        (3, md.py_date_to_magic_2008(dt.date(2025, 5, 31))),
        (4, md.py_date_to_magic_2008(dt.date(2025, 6, 1))),
    ]
    df = spark.createDataFrame(rows, "id int, fecha int")
    out = df.filter(magic_period_filter(F.col("fecha"), ["202503", "202504", "202505"]))
    assert sorted(r["id"] for r in out.collect()) == [2, 3]
    # gapped list
    out2 = df.filter(magic_period_filter(F.col("fecha"), ["202502", "202505"]))
    assert sorted(r["id"] for r in out2.collect()) == [1, 3]


def skewed_df(spark):
    # one hot key (k=hot, 900 rows) + uniform tail
    rows = [(i, "hot" if i < 900 else f"k{i % 37}", float(i % 10)) for i in range(1200)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_salted_agg_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r["k"]): (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["total"], r["n"])
        for r in skew.salted_agg(
            df,
            ["k"],
            [F.sum("v").alias("_s"), F.count("*").alias("_c")],
            [F.sum("_s").alias("total"), F.sum("_c").alias("n")],
            salt_from="id",
        ).collect()
    }
    assert plain == salted


def test_replicated_skew_join_matches_plain(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k5", "B")], "k string, attr string"
    )
    plain = sorted(
        tuple(r) for r in big.join(small, "k", "inner").select("k", "id", "attr").collect()
    )
    salted = sorted(
        tuple(r)
        for r in skew.replicated_skew_join(big, small, ["k"], salt_from="id")
        .select("k", "id", "attr")
        .collect()
    )
    assert plain == salted
    # left join keeps unmatched big rows exactly once
    plain_l = big.join(small, "k", "left").count()
    salted_l = skew.replicated_skew_join(big, small, ["k"], how="left", salt_from="id").count()
    assert plain_l == salted_l == 1200


# --------------------------------------------------------------------------
# Approximate aggregates — the 100 TB alternates for exact countDistinct /
# exact grouped percentiles. Not on the oracle-checked query surface
# (sketches are engine-specific by design); these tests pin the error
# contract that makes them substitutable at scale.


def test_approx_count_distinct_error_bound(spark):
    from cdk_datalake_analytics_comercial_spark.plans.common import t

    d = t(spark, "/root/testdata/sf0.01", "lineitem")
    row = d.select(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    # HLL++ at rsd=2%: generous 3-sigma-ish bound
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06


def test_approx_percentile_vs_exact(spark):
    from cdk_datalake_analytics_comercial_spark.plans.common import t

    d = t(spark, "/root/testdata/sf0.01", "lineitem")
    row = d.select(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01
