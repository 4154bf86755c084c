"""Data-quality check tests with PLANTED violations — each check must count
exactly the rows we corrupted, and a clean table must report zero."""

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators import dq


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]["violations"]


def test_not_null_counts_rows_with_any_null(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None), (None, None)], "k int, v string"
    )
    assert one(dq.check_not_null(df, "t", ["k", "v"])) == 3
    assert one(dq.check_not_null(df, "t", ["k"])) == 2


def test_unique_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (3, 1)], "a int, b int"
    )
    assert one(dq.check_unique(df, "t", ["a", "b"])) == 2  # triple → 2 extras
    clean = spark.createDataFrame([(1,), (2,)], "a int")
    assert one(dq.check_unique(clean, "t", ["a"])) == 0


def test_unique_empty_table_is_zero_not_null(spark):
    empty = spark.createDataFrame([], "a int")
    assert one(dq.check_unique(empty, "t", ["a"])) == 0


def test_referential_counts_orphans_ignores_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 99), (4, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk int")
    assert one(dq.check_referential(child, "t", "fk", parent, "pk")) == 1


def test_accepted_values_and_range(spark):
    df = spark.createDataFrame(
        [("O", 5.0), ("F", -1.0), ("X", 51.0), (None, None)],
        "st string, q double",
    )
    assert one(dq.check_accepted_values(df, "t", "st", ["O", "F"])) == 2
    assert one(dq.check_range(df, "t", "q", 0.0, 50.0)) == 2  # -1 and 51


def test_report_unions_all_checks(spark):
    df = spark.createDataFrame([(1,), (1,)], "a int")
    rep = dq.dq_report(
        [dq.check_unique(df, "t", ["a"]), dq.check_not_null(df, "t", ["a"])]
    ).collect()
    assert {(r["check"], r["violations"]) for r in rep} == {
        ("unique(a)", 1),
        ("not_null(a)", 0),
    }


def test_fused_row_checks_single_scan_matches_individual(spark):
    df = spark.createDataFrame(
        [(1, "O", 0.1), (None, "X", 0.9), (3, None, None)],
        "k int, st string, d double",
    )
    fused = {
        (r["check"], r["violations"])
        for r in dq.fused_row_checks(
            df,
            "t",
            [
                dq.not_null_cond(["k"]),
                dq.accepted_values_cond("st", ["O", "F"]),
                dq.range_cond("d", 0.0, 0.5),
            ],
        ).collect()
    }
    assert fused == {
        ("not_null(k)", 1),
        ("accepted_values(st)", 2),
        ("range(d)", 1),
    }
    # plan: exactly one scan of the table feeds all three counts
    plan = dq.fused_row_checks(
        df, "t", [dq.not_null_cond(["k"]), dq.range_cond("d", 0.0, 0.5)]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") <= 1
