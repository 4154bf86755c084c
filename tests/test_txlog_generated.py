"""Generated columns (Delta GENERATED ALWAYS AS twin): omitted on write →
computed; supplied → must equal the generated value; UPDATE post-images
and MERGE winners validated; declarations pin rename/drop; survive clone.
Where Delta recomputes on UPDATE, this engine validates-or-refuses."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tbl(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, 20), (2, 30, 40)], "k long, a long, total long"
    ).withColumn("total", F.expr("a + k"))
    TX.tx_write(spark, df, p)
    TX.tx_add_generated_column(spark, p, "total", "a + k")
    return p


def test_omitted_generated_column_is_computed(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    TX.tx_write(
        spark,
        spark.createDataFrame([(3, 100)], "k long, a long"),
        p,
        mode="append",
    )
    assert rows(TX.tx_read(spark, p).select("k", "a", "total")) == [
        (1, 10, 11),
        (2, 30, 32),
        (3, 100, 103),
    ]


def test_supplied_generated_value_must_match(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    ok = spark.createDataFrame([(4, 5, 9)], "k long, a long, total long")
    TX.tx_write(spark, ok, p, mode="append")
    bad = spark.createDataFrame([(5, 5, 99)], "k long, a long, total long")
    with pytest.raises(TX.TxCheckViolation, match="generated.total"):
        TX.tx_write(spark, bad, p, mode="append")
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (2,), (4,)]


def test_declaration_validates_existing_rows(spark, tmp_path):
    p = str(tmp_path / "t2")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, 2, 999)], "k long, a long, total long"),
        p,
    )
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_add_generated_column(spark, p, "total", "a + k")
    with pytest.raises(ValueError, match="not in the table schema"):
        TX.tx_add_generated_column(spark, p, "nope", "a + k")


def test_update_and_merge_validate_the_invariant(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    # consistent update (both sides) passes — on both DML paths
    TX.tx_update(
        spark, p, where={"k": (1, 1)},
        assignments={"a": F.lit(50), "total": F.lit(51)},
    )
    with pytest.raises(TX.TxCheckViolation, match="generated.total"):
        TX.tx_update(
            spark, p, where={"k": (2, 2)}, assignments={"a": F.lit(7)}
        )
    with pytest.raises(TX.TxCheckViolation, match="generated.total"):
        TX.tx_update(
            spark, p, where={"k": (2, 2)}, assignments={"a": F.lit(7)},
            use_dv=True,
        )
    # merge winners validate too
    bad = spark.createDataFrame([(2, 1, 2)], "k long, a long, total long")
    with pytest.raises(TX.TxCheckViolation, match="generated.total"):
        TX.tx_merge(spark, bad, p, keys=["k"])
    good = spark.createDataFrame([(2, 1, 3)], "k long, a long, total long")
    TX.tx_merge(spark, good, p, keys=["k"])
    assert rows(TX.tx_read(spark, p).select("k", "a", "total")) == [
        (1, 50, 51),
        (2, 1, 3),
    ]


def test_generated_pins_rename_and_drop(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    for col in ("total", "a", "k"):
        with pytest.raises(ValueError, match="generated"):
            TX.tx_rename_column(spark, p, col, "zzz")
        with pytest.raises(ValueError, match="generated"):
            TX.tx_drop_column(spark, p, col)
    TX.tx_drop_generated(spark, p, "total")
    TX.tx_rename_column(spark, p, "total", "sum_ak")  # free again
    assert "sum_ak" in TX.tx_read(spark, p).columns


def test_generated_survives_clone(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    dst = str(tmp_path / "clone")
    TX.tx_clone(spark, p, dst)
    TX.tx_write(
        spark, spark.createDataFrame([(9, 1)], "k long, a long"), dst,
        mode="append",
    )
    assert (9, 1, 10) in rows(TX.tx_read(spark, dst).select("k", "a", "total"))
