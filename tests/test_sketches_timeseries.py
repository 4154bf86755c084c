"""KMV sketch and time-series gap-fill/forward-fill operator tests."""

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators.sketches import kmv_distinct
from cdk_datalake_analytics_comercial_spark.operators.timeseries import (
    forward_fill,
    month_grid,
)


def test_kmv_unsaturated_is_exact(spark):
    # fewer distinct values than k → the sketch IS the exact count
    df = spark.createDataFrame(
        [("g", f"v{i % 10}") for i in range(100)], "grp string, val string"
    )
    row = kmv_distinct(df, ["grp"], "val", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["kmv_estimate"] == 10.0


def test_kmv_saturated_estimate_accuracy(spark):
    # 2000 distinct values, k=64 → estimate should land within the sketch's
    # expected relative error band (~1/sqrt(k-1) ≈ 12.6%; allow 3 sigma)
    df = spark.createDataFrame(
        [("g", f"value_{i}") for i in range(2000)], "grp string, val string"
    )
    row = kmv_distinct(df, ["grp"], "val", k=64).collect()[0]
    assert row["n_kept"] == 64
    assert abs(row["kmv_estimate"] - 2000) / 2000 < 0.38
    # duplicates never change the sketch (distinct-first contract)
    dup = df.union(df).union(df)
    row2 = kmv_distinct(dup, ["grp"], "val", k=64).collect()[0]
    assert row2["kmv_estimate"] == row["kmv_estimate"]


def test_kmv_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(500)] + [("b", f"x{i}") for i in range(5)],
        "grp string, val string",
    )
    out = {r["grp"]: r for r in kmv_distinct(df, ["grp"], "val", k=64).collect()}
    assert out["b"]["kmv_estimate"] == 5.0  # unsaturated group stays exact
    assert abs(out["a"]["kmv_estimate"] - 500) / 500 < 0.38


def test_month_grid_is_dense(spark):
    keys = spark.createDataFrame([("k1",), ("k2",)], "nation string")
    obs = spark.createDataFrame(
        [("k1", "2020-01-15"), ("k2", "2020-05-02")], "nation string, d string"
    ).select("nation", F.date_trunc("month", F.col("d").cast("timestamp")).alias("month"))
    grid = month_grid(keys, obs, "month")
    rows = grid.collect()
    assert len(rows) == 2 * 5  # Jan..May inclusive × 2 keys
    months = sorted({r["month"].month for r in rows})
    assert months == [1, 2, 3, 4, 5]


def test_forward_fill_carries_last_observation(spark):
    df = spark.createDataFrame(
        [
            ("k", 1, None),
            ("k", 2, 10.0),
            ("k", 3, None),
            ("k", 4, None),
            ("k", 5, 20.0),
            ("k", 6, None),
        ],
        "key string, t int, v double",
    )
    out = forward_fill(df, ["key"], "t", "v", "filled")
    got = {r["t"]: r["filled"] for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: 10.0, 4: 10.0, 5: 20.0, 6: 20.0}


def test_cube_gid_semantics(spark):
    # the gid=3 grand-total row of the cube equals the raw count; gid bit
    # order is (leftmost col = MSB) on both engines (oracle-checked too)
    from cdk_datalake_analytics_comercial_spark.plans.relational import (
        q_cube_status_priority,
    )

    out = q_cube_status_priority(spark, "/root/testdata/sf0.001").collect()
    total = [r for r in out if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["status"] == "<ALL>" and total[0]["priority"] == "<ALL>"
    n = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert total[0]["n_orders"] == n
    # gid=1 rows aggregate over priority only (status is concrete)
    by_status = [r for r in out if r["gid"] == 1]
    assert all(r["priority"] == "<ALL>" and r["status"] != "<ALL>" for r in by_status)
    assert sum(r["n_orders"] for r in by_status) == n


def test_hll_estimate_accuracy_and_merge_semantics(spark):
    from cdk_datalake_analytics_comercial_spark.operators.sketches import (
        hll_distinct,
    )

    # 2000 distinct values, m=256 registers → RSE ≈ 1.04/16 = 6.5%; 3σ
    df = spark.createDataFrame(
        [("g", f"value_{i}") for i in range(2000)], "grp string, val string"
    )
    row = hll_distinct(df, ["grp"], "val", p=8).collect()[0]
    assert abs(row["hll_estimate"] - 2000) / 2000 < 0.20
    # duplicates never move a register (distinct-first + max semantics)
    row2 = hll_distinct(df.union(df), ["grp"], "val", p=8).collect()[0]
    assert row2["hll_estimate"] == row["hll_estimate"]


def test_hll_small_range_linear_counting(spark):
    from cdk_datalake_analytics_comercial_spark.operators.sketches import (
        hll_distinct,
    )

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(30)], "grp string, val string"
    )
    row = hll_distinct(df, ["grp"], "val", p=8).collect()[0]
    # linear counting regime: near-exact for n << m
    assert abs(row["hll_estimate"] - 30) <= 3
    assert row["hll_buckets_used"] <= 30


def test_interpolate_linear_blends_and_leaves_edges_null(spark):
    from cdk_datalake_analytics_comercial_spark.operators.timeseries import (
        interpolate_linear,
    )

    # uneven spacing: gap of 3 units then 1; observations at t=1 (10),
    # t=4 (40), t=5 (nulls trailing)
    df = spark.createDataFrame(
        [
            ("k", "2020-01-01 00:00:01", None),   # leading gap → null
            ("k", "2020-01-01 00:00:02", 10.0),
            ("k", "2020-01-01 00:00:03", None),   # 1/3 of the way 10→40
            ("k", "2020-01-01 00:00:04", None),   # 2/3
            ("k", "2020-01-01 00:00:05", 40.0),
            ("k", "2020-01-01 00:00:06", None),   # trailing gap → null
        ],
        "key string, ts string, v double",
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {
        r["ts"].second: r["filled"]
        for r in interpolate_linear(df, ["key"], "ts", "v", "filled").collect()
    }
    assert out[1] is None and out[6] is None
    assert out[2] == 10.0 and out[5] == 40.0
    assert out[3] == 20.0 and out[4] == 30.0  # time-weighted thirds


def test_assume_distinct_matches_default_path(spark):
    """assume_distinct=True over a pre-distincted (group, value) grain must
    reproduce the default path exactly, for both sketch families — the
    shared-grain rewrite in the registry queries relies on it."""
    from cdk_datalake_analytics_comercial_spark.operators.sketches import (
        hll_distinct,
    )

    rows = [(g, v % 37) for g in ("a", "b") for v in range(200)] * 3
    df = spark.createDataFrame(rows, "g string, v long")
    dv = df.distinct()
    for fn, kw in ((kmv_distinct, dict(k=16)), (hll_distinct, dict(p=6))):
        base = sorted(map(tuple, fn(df, ["g"], "v", **kw).collect()))
        fast = sorted(
            map(tuple, fn(dv, ["g"], "v", assume_distinct=True, **kw).collect())
        )
        assert base == fast, fn.__name__
