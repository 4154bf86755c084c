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


# ---------------------------------------------------------------------------
# Tie sensitivity (SURVEY §7.3.2): what happens to W1/A4 when the ordering
# key or the representative value is duplicated.


def _tie_df(spark, n_part):
    # 3 rows per key that TIE on the ordering column `v`; `p` distinguishes
    # them; the physical layout is varied via repartition to surface any
    # partitioning-dependent pick
    rows = [(k, 7, f"p{i}") for k in ("a", "b", "c") for i in range(3)]
    return spark.createDataFrame(rows, "k string, v int, p string").repartition(n_part)


def test_top1_with_unique_tiebreak_is_layout_invariant(spark):
    # the engine idiom (and every q_* using W1) always appends a unique
    # column to the ordering — with it, the winner is identical across
    # physical layouts
    outs = []
    for n_part in (1, 3, 16):
        out = R.top1_per_group(
            _tie_df(spark, n_part), ["k"], [F.col("v").desc(), F.col("p").desc()]
        )
        outs.append(sorted((r["k"], r["v"], r["p"]) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == [("a", 7, "p2"), ("b", 7, "p2"), ("c", 7, "p2")]


def test_top1_without_tiebreak_nondeterminism_is_bounded(spark):
    # WITHOUT a total order (the reference's own pattern in several jobs,
    # e.g. row_number ordered by a non-unique date) the picked row is
    # layout-dependent — Spark does not promise which tied row wins. The
    # contract we pin: exactly one row per key, and it is one of the tied
    # rows (no invention, no loss). This documents the nondeterminism the
    # reference inherits wherever it omits a tiebreak.
    for n_part in (1, 3, 16):
        out = R.top1_per_group(_tie_df(spark, n_part), ["k"], [F.col("v").desc()])
        rows = out.collect()
        assert sorted(r["k"] for r in rows) == ["a", "b", "c"]
        assert all(r["v"] == 7 and r["p"] in {"p0", "p1", "p2"} for r in rows)


def test_max_representative_is_layout_invariant_under_ties(spark):
    # A4 (max-as-representative) is an algebraic aggregate: duplicated
    # maxima cannot make it nondeterministic — identical output across
    # layouts, including when whole rows are duplicated
    rows = [
        ("o1", "R", 5), ("o1", "R", 5), ("o1", "A", 9),
        ("o2", "N", 1), ("o2", "N", 1),
    ]
    outs = []
    for n_part in (1, 4, 16):
        df = spark.createDataFrame(rows, "k string, flag string, q int").repartition(
            n_part
        )
        agg = df.groupBy("k").agg(
            F.max("flag").alias("flag"), F.sum("q").alias("q"), F.count("*").alias("n")
        )
        outs.append(sorted(tuple(r) for r in agg.collect()))
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == [("o1", "R", 19, 3), ("o2", "N", 2, 2)]


def test_registry_w1_queries_carry_unique_tiebreaks(spark):
    # every W1 query in the registry must order by a unique key last —
    # latest_order_per_customer ties on o_orderdate are broken by
    # o_orderkey; duplicate-date fixtures stay deterministic end to end
    import datetime as dt

    from cdk_datalake_analytics_comercial_spark.operators.relational import (
        top1_per_group,
    )

    d = dt.date(2025, 5, 1)
    dup = spark.createDataFrame(
        [(1, 100, d, 10.0), (1, 200, d, 20.0), (1, 300, d, 30.0)],
        "o_custkey long, o_orderkey long, o_orderdate date, o_totalprice double",
    )
    for n_part in (1, 8):
        out = top1_per_group(
            dup.repartition(n_part),
            partition_by=["o_custkey"],
            order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        ).collect()
        assert len(out) == 1 and out[0]["o_orderkey"] == 300
