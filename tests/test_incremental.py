"""Incremental view maintenance tests: a rollup maintained purely from the
txlog change feed must equal a full recompute at every version — through
inserts, updates (both images), deletes, and group birth/death."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators.incremental import (
    maintain_agg,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def full_agg(df):
    return df.groupBy("grp").agg(
        F.sum("amount").alias("amount"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def as_map(df):
    return {
        r["grp"]: (round(r["amount"], 6), r["n_rows"]) for r in df.collect()
    }


def test_cdf_maintained_rollup_equals_recompute(spark, tmp_path):
    p = str(tmp_path / "base")
    v1 = [("k1", "a", 10.0), ("k2", "a", 20.0), ("k3", "b", 30.0)]
    TX.tx_write(
        spark,
        spark.createDataFrame(v1, "id string, grp string, amount double"),
        p,
    )
    agg = full_agg(TX.tx_read(spark, p, 1))

    # v2: update k1 (a: 10→15), insert k4 (new group c), delete k3 (group
    # b dies)
    v2 = [("k1", "a", 15.0), ("k2", "a", 20.0), ("k4", "c", 5.0)]
    TX.tx_write(
        spark,
        spark.createDataFrame(v2, "id string, grp string, amount double"),
        p,
    )
    cdf = TX.tx_diff(spark, p, ["id"], v_from=1, v_to=2, images="split")
    types = {r["_change_type"] for r in cdf.collect()}
    assert types == {"insert", "delete", "update_preimage", "update_postimage"}

    agg = maintain_agg(agg, cdf, ["grp"], ["amount"])
    assert as_map(agg) == as_map(full_agg(TX.tx_read(spark, p, 2)))
    assert "b" not in as_map(agg)  # dead group disappeared, like recompute

    # v3: group b reborn, another update in a
    v3 = [("k1", "a", 18.0), ("k2", "a", 20.0), ("k4", "c", 5.0), ("k5", "b", 7.0)]
    TX.tx_write(
        spark,
        spark.createDataFrame(v3, "id string, grp string, amount double"),
        p,
    )
    cdf = TX.tx_diff(spark, p, ["id"], v_from=2, v_to=3, images="split")
    agg = maintain_agg(agg, cdf, ["grp"], ["amount"])
    assert as_map(agg) == as_map(full_agg(TX.tx_read(spark, p, 3)))


def test_split_images_carry_both_sides(spark, tmp_path):
    p = str(tmp_path / "base2")
    TX.tx_write(
        spark,
        spark.createDataFrame([("k", "g", 1.0)], "id string, grp string, amount double"),
        p,
    )
    TX.tx_write(
        spark,
        spark.createDataFrame([("k", "g", 9.0)], "id string, grp string, amount double"),
        p,
    )
    rows = {
        r["_change_type"]: r["amount"]
        for r in TX.tx_diff(spark, p, ["id"], 1, 2, images="split").collect()
    }
    assert rows == {"update_preimage": 1.0, "update_postimage": 9.0}
    # compact mode unchanged: one update row, post-image
    compact = TX.tx_diff(spark, p, ["id"], 1, 2).collect()
    assert [(r["_change_type"], r["amount"]) for r in compact] == [("update", 9.0)]


def test_maintainer_rejects_compact_feed(spark, tmp_path):
    p = str(tmp_path / "base3")
    TX.tx_write(
        spark,
        spark.createDataFrame([("k", "g", 1.0)], "id string, grp string, amount double"),
        p,
    )
    TX.tx_write(
        spark,
        spark.createDataFrame([("k", "g", 2.0)], "id string, grp string, amount double"),
        p,
    )
    compact = TX.tx_diff(spark, p, ["id"], 1, 2)  # has "update" rows
    agg = full_agg(TX.tx_read(spark, p, 1))
    with pytest.raises(ValueError, match="split"):
        maintain_agg(agg, compact, ["grp"], ["amount"])


def test_streaming_cdc_drives_incremental_rollup(spark, tmp_path):
    """The full pipeline story: CDC stream → txlog versions → split-image
    CDF per version → rollup maintained incrementally. The maintained
    rollup must equal a recompute of the final snapshot, while only ever
    aggregating per-version deltas."""
    from pyspark.sql import types as T

    from cdk_datalake_analytics_comercial_spark.streaming.sink import merge_stream

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        merge_stream(
            stream, tgt, keys=["id"], checkpoint=str(tmp_path / "ck"),
            precedence="seq", txlog=True,
        )

    spark.createDataFrame(
        [(1, 1, "a", 10.0), (2, 1, "b", 20.0)], schema
    ).write.mode("append").parquet(src)
    run()
    # bootstrap the rollup from v1 (the only full-scan ever needed)
    agg = (
        TX.tx_read(spark, tgt, 1)
        .groupBy("grp")
        .agg(
            F.sum("amount").alias("amount"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    spark.createDataFrame(
        [(1, 2, "a", 11.0), (3, 1, "a", 5.0)], schema
    ).write.mode("append").parquet(src)
    run()
    assert TX.current_version(spark, tgt) == 2
    cdf = TX.tx_diff(spark, tgt, ["id"], 1, 2, images="split")
    agg = maintain_agg(agg, cdf, ["grp"], ["amount"])
    expect = {
        r["grp"]: (r["amount"], r["n_rows"])
        for r in TX.tx_read(spark, tgt, 2)
        .groupBy("grp")
        .agg(
            F.sum("amount").alias("amount"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .collect()
    }
    got = {r["grp"]: (r["amount"], r["n_rows"]) for r in agg.collect()}
    assert got == expect == {"a": (16.0, 2), "b": (20.0, 1)}


def test_streaming_poison_batch_rejected_atomically(spark, tmp_path):
    """CHECK constraints on the streaming sink: a poison micro-batch fails
    the query BEFORE anything lands; the table stays at its last good
    version and a restart after removing the bad input resumes from the
    same checkpoint."""
    import glob
    import os

    import pytest
    from pyspark.sql import types as T

    from cdk_datalake_analytics_comercial_spark.streaming.sink import merge_stream

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    checks = {"positive_amount": "amount > 0"}

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        merge_stream(
            stream, tgt, keys=["id"], checkpoint=str(tmp_path / "ck"),
            precedence="seq", txlog=True, checks=checks,
        )

    spark.createDataFrame([(1, 1, 10.0)], schema).write.mode("append").parquet(src)
    run()
    assert TX.current_version(spark, tgt) == 1

    poison = str(tmp_path / "poison.parquet")
    spark.createDataFrame([(2, 1, -5.0)], schema).write.parquet(poison)
    for f in glob.glob(f"{poison}/part-*.parquet"):
        os.rename(f, os.path.join(src, os.path.basename(f)))
    with pytest.raises(Exception, match="positive_amount"):
        run()
    # nothing committed by the failed batch
    assert TX.current_version(spark, tgt) == 1

    # operator removes the poison file; restart drains cleanly
    for f in glob.glob(os.path.join(src, "part-*")):
        os.remove(f)
    spark.createDataFrame([(3, 1, 7.0)], schema).write.mode("append").parquet(src)
    run()
    got = {r["id"]: r["amount"] for r in TX.tx_read(spark, tgt).collect()}
    assert got == {1: 10.0, 3: 7.0}


def test_apply_agg_delta_rejects_unknown_change_types(spark):
    """ADVICE r4: calling cdf_agg_delta/apply_agg_delta directly (not via
    maintain_agg) must still fail loudly on unknown _change_type values —
    the _n_bad column the delta carries is CHECKED at apply time, not
    silently dropped."""
    from cdk_datalake_analytics_comercial_spark.operators.incremental import (
        apply_agg_delta,
        cdf_agg_delta,
    )

    agg = spark.createDataFrame(
        [("a", 10.0, 2)], "grp string, amount double, n_rows long"
    )
    bad_feed = spark.createDataFrame(
        [("k1", "a", 5.0, "insert"), ("k2", "a", 7.0, "upsert")],
        "id string, grp string, amount double, _change_type string",
    )
    delta = cdf_agg_delta(bad_feed, ["grp"], ["amount"])
    with pytest.raises(ValueError, match="non-split-image"):
        apply_agg_delta(agg, delta, ["grp"], ["amount"]).collect()

    good_feed = bad_feed.filter("_change_type = 'insert'")
    out = apply_agg_delta(
        agg, cdf_agg_delta(good_feed, ["grp"], ["amount"]), ["grp"], ["amount"]
    )
    assert as_map(out) == {"a": (15.0, 3)}
