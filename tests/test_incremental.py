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


def test_hll_distinct_maintained_from_cdf_equals_recompute(spark, tmp_path):
    """VERDICT r4 #7: per-group approx COUNT(DISTINCT) maintained as HLL
    register state through the streaming-CDC chain. Register merge is max,
    so the maintained estimate must be BIT-IDENTICAL to a recompute at
    every version (insert-only + value-preserving-update feed)."""
    from cdk_datalake_analytics_comercial_spark.operators.incremental import (
        maintain_hll_distinct,
    )
    from cdk_datalake_analytics_comercial_spark.operators.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_registers,
    )

    p = str(tmp_path / "hllbase")
    v1 = [(f"k{i}", "a" if i % 3 else "b", f"u{i % 40}", 1.0) for i in range(60)]
    TX.tx_write(
        spark,
        spark.createDataFrame(v1, "id string, grp string, user string, amt double"),
        p,
    )
    state = hll_registers(TX.tx_read(spark, p, 1), ["grp"], "user")

    def est(regs):
        return {
            r["grp"]: (r["hll_buckets_used"], r["hll_estimate"])
            for r in hll_estimate_from_registers(regs, ["grp"]).collect()
        }

    def recompute(version):
        return {
            r["grp"]: (r["hll_buckets_used"], r["hll_estimate"])
            for r in hll_distinct(
                TX.tx_read(spark, p, version), ["grp"], "user"
            ).collect()
        }

    assert est(state) == recompute(1)

    # v2: new rows with new AND repeated users, plus updates that change
    # amt but NOT the counted value column
    v2 = v1[:50] + [
        (f"k{i}", "a" if i % 3 else "b", f"u{i % 55}", 2.0) for i in range(60, 90)
    ]
    v2 = [(i_, g, u, 9.0 if i_ == "k3" else a) for (i_, g, u, a) in v2]
    TX.tx_write(
        spark,
        spark.createDataFrame(v2, "id string, grp string, user string, amt double"),
        p,
    )
    cdf = TX.tx_diff(spark, p, ["id"], v_from=1, v_to=2, images="split")
    types = {r["_change_type"] for r in cdf.collect()}
    assert "delete" in types and "update_preimage" in types
    # deletes present -> refused loudly (the stated IVM boundary)
    import pytest

    with pytest.raises(ValueError, match="DELETE"):
        maintain_hll_distinct(state, cdf, ["grp"], "user").collect()

    # drop the deletes (e.g. an append+update-only ingest), maintain, and
    # the estimate must equal the recompute of the same logical content
    feed = cdf.filter(F.col("_change_type") != "delete")
    state2 = maintain_hll_distinct(state, feed, ["grp"], "user")
    base2 = TX.tx_read(spark, p, 1).unionByName(
        TX.tx_read(spark, p, 2).join(
            TX.tx_read(spark, p, 1).select("id"), "id", "left_anti"
        )
    )
    expect = {
        r["grp"]: (r["hll_buckets_used"], r["hll_estimate"])
        for r in hll_distinct(base2, ["grp"], "user").collect()
    }
    assert est(state2) == expect

    # a feed whose update CHANGES the counted value is refused
    bad = spark.createDataFrame(
        [
            ("k1", "a", "u1", "update_preimage"),
            ("k1", "a", "uX", "update_postimage"),
        ],
        "id string, grp string, user string, _change_type string",
    )
    with pytest.raises(ValueError, match="cannot forget"):
        maintain_hll_distinct(state, bad, ["grp"], "user").collect()


def test_hll_maintenance_error_contract(spark):
    """The maintained estimate inherits the sketch's own error contract:
    |est - truth| / truth within ~3 standard errors (3 * 1.04/sqrt(m),
    ~19.5% at p=8) on a 5000-distinct insert-only feed applied in two
    batches."""
    from cdk_datalake_analytics_comercial_spark.operators.incremental import (
        maintain_hll_distinct,
    )
    from cdk_datalake_analytics_comercial_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    rows1 = [("g", f"user-{i}") for i in range(2500)]
    rows2 = [("g", f"user-{i}") for i in range(2000, 5000)]
    base = spark.createDataFrame(rows1, "grp string, user string")
    state = hll_registers(base, ["grp"], "user")
    feed = spark.createDataFrame(
        [(g, u, "insert") for g, u in rows2],
        "grp string, user string, _change_type string",
    )
    state = maintain_hll_distinct(state, feed, ["grp"], "user")
    got = hll_estimate_from_registers(state, ["grp"]).collect()[0]["hll_estimate"]
    assert abs(got - 5000) / 5000 < 3 * 1.04 / (256 ** 0.5), got
