"""Row tracking: stable materialized row ids (identity-allocator backed)
that survive OPTIMIZE and DML rewrites, and the row-keyed CDF that pairs
changes exactly across them."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def _table(spark, p, n=8):
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}", i % 2) for i in range(n)], "k long, v string, part long"
        ),
        p,
    )


def test_enable_backfills_unique_ids_and_allocates_on_append(spark, tmp_path):
    p = str(tmp_path / "rt1")
    _table(spark, p)
    TX.tx_enable_row_tracking(spark, p)
    ids = [r["_row_id"] for r in TX.tx_read(spark, p).collect()]
    assert sorted(ids) == list(range(1, 9))
    TX.tx_write(
        spark,
        spark.createDataFrame([(100, "new", 0)], "k long, v string, part long"),
        p,
        mode="append",
    )
    ids2 = sorted(r["_row_id"] for r in TX.tx_read(spark, p).collect())
    assert ids2 == list(range(1, 10))  # fresh id, no reuse


def test_optimize_emits_zero_row_changes(spark, tmp_path):
    """THE row-tracking payoff: a compaction between two versions is
    invisible to the row-keyed CDF — no downstream recompute triggered by
    a maintenance rewrite."""
    p = str(tmp_path / "rt2")
    _table(spark, p)
    TX.tx_enable_row_tracking(spark, p)
    v_before = TX.current_version(spark, p)
    TX.tx_compact(spark, p, n_files=2)
    assert TX.tx_diff_rows(spark, p, v_before).count() == 0


def test_update_pairs_exactly_across_a_compaction(spark, tmp_path):
    p = str(tmp_path / "rt3")
    _table(spark, p)
    TX.tx_enable_row_tracking(spark, p)
    v0 = TX.current_version(spark, p)
    TX.tx_update(spark, p, where={"k": (3, 3)}, assignments={"v": F.lit("patched")})
    TX.tx_compact(spark, p, n_files=2)  # rewrite EVERY file
    changes = TX.tx_diff_rows(spark, p, v0, images="split").collect()
    # exactly one updated row -> one pre + one post image, nothing else
    by_type = {}
    for r in changes:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert set(by_type) == {"update_preimage", "update_postimage"}
    assert [r["v"] for r in by_type["update_preimage"]] == ["v3"]
    assert [r["v"] for r in by_type["update_postimage"]] == ["patched"]
    # the pair shares the stable row id
    assert (
        by_type["update_preimage"][0]["_row_id"]
        == by_type["update_postimage"][0]["_row_id"]
    )


def test_dv_delete_emits_exact_delete_rows(spark, tmp_path):
    p = str(tmp_path / "rt4")
    _table(spark, p)
    TX.tx_enable_row_tracking(spark, p)
    v0 = TX.current_version(spark, p)
    TX.tx_delete(spark, p, where={"k": (6, 10**9)}, use_dv=True)
    changes = TX.tx_diff_rows(spark, p, v0).collect()
    assert sorted(r["k"] for r in changes) == [6, 7]
    assert {r["_change_type"] for r in changes} == {"delete"}


def test_explicit_null_row_id_refuses(spark, tmp_path):
    p = str(tmp_path / "rt5")
    _table(spark, p, n=2)
    TX.tx_enable_row_tracking(spark, p)
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_write(
            spark,
            spark.createDataFrame(
                [(9, "x", 0, None)], "k long, v string, part long, _row_id long"
            ),
            p,
            mode="append",
        )


def test_enable_refuses_existing_column_and_diff_requires_enable(spark, tmp_path):
    p = str(tmp_path / "rt6")
    _table(spark, p, n=2)
    with pytest.raises(ValueError, match="not enabled"):
        TX.tx_diff_rows(spark, p, 1)
    with pytest.raises(ValueError, match="already exists"):
        TX.tx_enable_row_tracking(spark, p, col="v")


def test_ivm_over_row_keyed_cdf_survives_optimize(spark, tmp_path):
    """The row-tracking + IVM payoff, end to end: an aggregate maintained
    from tx_diff_rows stays recompute-equal through update/delete/append
    AND an interleaved OPTIMIZE — the compaction contributes zero change
    rows, so the maintainer does zero work for it (where a rewrite-blind
    feed would have to re-emit every row as delete+insert)."""
    from cdk_datalake_analytics_comercial_spark.operators.incremental import (
        maintain_agg,
    )

    p = str(tmp_path / "rt7")
    _table(spark, p)  # k 0..7, part = k % 2
    TX.tx_enable_row_tracking(spark, p)
    v0 = TX.current_version(spark, p)
    agg = (
        TX.tx_read(spark, p)
        .groupBy("part")
        .agg(
            F.sum("k").alias("k"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )

    # a real mutation burst with a compaction in the middle
    TX.tx_update(spark, p, where={"k": (2, 2)}, assignments={"k": F.lit(200)})
    TX.tx_compact(spark, p, n_files=2)
    TX.tx_delete(spark, p, where={"k": (5, 5)})
    TX.tx_write(
        spark,
        spark.createDataFrame([(50, "x", 0)], "k long, v string, part long"),
        p,
        mode="append",
    )
    v1 = TX.current_version(spark, p)

    cdf = TX.tx_diff_rows(spark, p, v0, v1, images="split")
    # the compaction is invisible: only the 3 real mutations appear
    assert sorted(
        (r["_change_type"], r["k"]) for r in cdf.select("_change_type", "k").collect()
    ) == [
        ("delete", 5),
        ("insert", 50),
        ("update_postimage", 200),
        ("update_preimage", 2),
    ]
    maintained = maintain_agg(agg, cdf, ["part"], ["k"])
    recomputed = (
        TX.tx_read(spark, p)
        .groupBy("part")
        .agg(F.sum("k").alias("k"), F.count(F.lit(1)).alias("n_rows"))
    )
    assert sorted(tuple(r) for r in maintained.collect()) == sorted(
        tuple(r) for r in recomputed.collect()
    )
