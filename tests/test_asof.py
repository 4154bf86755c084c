"""As-of join tests: backward/forward direction, inclusive tie semantics,
tolerance, per-key isolation, and the no-join-operator plan contract."""

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators.asof import asof_join


def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, 1),
            ("a", 20, 2),
            ("a", 5, 3),   # before any right row
            ("b", 15, 4),
            ("c", 50, 5),  # key with no right rows at all
        ],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 100.0),  # equal-ts: inclusive for backward
            ("a", 18, 200.0),
            ("b", 1, 300.0),
            ("b", 16, 400.0),
        ],
        "k string, t long, v double",
    )
    return left, right


def run(spark, **kw):
    left, right = frames(spark)
    rows = asof_join(
        left, right, on="t", by=["k"], value_cols=["v"], **kw
    ).collect()
    return {r["lid"]: (r["t_asof"], r["v_asof"]) for r in rows}


def test_backward_inclusive(spark):
    got = run(spark)
    assert got[1] == (10, 100.0)   # equal ts matches
    assert got[2] == (18, 200.0)   # latest ≤ 20
    assert got[3] == (None, None)  # nothing before t=5
    assert got[4] == (1, 300.0)    # b: latest ≤ 15 is t=1
    assert got[5] == (None, None)  # key c has no right rows


def test_forward_inclusive(spark):
    got = run(spark, direction="forward")
    assert got[1] == (10, 100.0)   # equal ts matches forward too
    assert got[2] == (None, None)  # nothing ≥ 20 for key a
    assert got[3] == (10, 100.0)   # earliest ≥ 5
    assert got[4] == (16, 400.0)   # earliest ≥ 15


def test_backward_tolerance_nulls_far_matches(spark):
    got = run(spark, tolerance=3)
    assert got[1] == (10, 100.0)   # distance 0
    assert got[2] == (18, 200.0)   # distance 2 ≤ 3
    assert got[4] == (None, None)  # distance 14 > 3 → nulled


def test_left_rows_and_columns_preserved(spark):
    left, right = frames(spark)
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"])
    assert out.count() == left.count()
    assert out.columns == ["k", "t", "lid", "t_asof", "v_asof"]


def test_plan_has_no_join_and_single_shuffle(spark):
    left, right = frames(spark)
    plan = (
        asof_join(left, right, on="t", by=["k"], value_cols=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # union-window form: no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Property check against the canonical implementation: pandas
    merge_asof over 60 random (key, time) layouts — backward and forward,
    with unique right (key, t) as the operator requires."""
    import random

    import pandas as pd

    rng = random.Random(42)
    for trial in range(3):
        left = [
            (rng.choice("abc"), rng.randrange(0, 50), i)
            for i in range(20)
        ]
        seen = set()
        right = []
        for j in range(15):
            k, t = rng.choice("abc"), rng.randrange(0, 50)
            if (k, t) in seen:
                continue
            seen.add((k, t))
            right.append((k, t, float(j)))
        ldf = spark.createDataFrame(left, "k string, t long, lid long")
        rdf = spark.createDataFrame(right, "k string, t long, v double")
        lpd = pd.DataFrame(left, columns=["k", "t", "lid"]).sort_values("t")
        rpd = pd.DataFrame(right, columns=["k", "t", "v"]).sort_values("t")

        for direction in ("backward", "forward"):
            got = {
                r["lid"]: r["v_asof"]
                for r in asof_join(
                    ldf, rdf, on="t", by=["k"], value_cols=["v"],
                    direction=direction,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd, rpd, on="t", by="k", direction=direction
            )
            exp = {
                int(r.lid): (None if pd.isna(r.v) else float(r.v))
                for r in exp_df.itertuples()
            }
            assert got == exp, (trial, direction)
