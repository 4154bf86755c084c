"""Bucketed-join tests: two tables bucketed on the join key sort-merge-join
with NO Exchange on either side; aggregation on the bucket key also skips
its shuffle."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("vb")
    )
    write_bucketed(a, "bk_a", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "a"))
    write_bucketed(b, "bk_b", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "b"))
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    ta, tb = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k", "inner")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_no_shuffle(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_bucketed(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 1000


def test_unbucketed_join_does_shuffle(spark, bucketed_pair, tmp_path):
    """Control: the same join over plain parquet has Exchanges."""
    ta, _ = bucketed_pair
    plain = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("vc"))
    plain.write.parquet(str(tmp_path / "plain"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, ta).join(spark.read.parquet(str(tmp_path / "plain")), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the unbucketed side must shuffle
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
