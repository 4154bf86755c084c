"""Streamed CDF consumption (streaming/cdf.py): the CDC-fanout pattern on
a LIVE change feed — a rollup maintained from tx_diff batches equals a
full recompute after appends, UPDATES (merge), and DELETES (deletion
vectors), exactly-once across restarts and replays. This is the feed the
append-only streaming source cannot provide (it must skip change
commits); the CDF drain consumes them."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators.incremental import (
    maintain_agg,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX
from cdk_datalake_analytics_comercial_spark.streaming.cdf import (
    drain_cdf,
    drain_cdf_available,
)


def _src(spark, rows):
    return spark.createDataFrame(rows, "id long, region string, amount long")


def _fold(changes, state):
    if state is None:  # first drain: the snapshot arrives as insert rows
        return changes.groupBy("region").agg(
            F.sum("amount").alias("amount"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    return maintain_agg(state, changes, ["region"], ["amount"], "n_rows")


def _recompute(spark, a):
    return sorted(
        (r.region, r.amount, r.n_rows)
        for r in TX.tx_read(spark, a)
        .groupBy("region")
        .agg(F.sum("amount").alias("amount"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )


def _rollup(spark, b):
    return sorted(
        (r.region, r.amount, r.n_rows) for r in TX.tx_read(spark, b).collect()
    )


def test_cdf_fanout_equals_recompute_through_updates_and_deletes(
    spark, tmp_path
):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    TX.tx_write(
        spark, _src(spark, [(1, "us", 10), (2, "eu", 20), (3, "us", 5)]), a
    )

    args = (spark, a, b, _fold, ["id"])
    assert drain_cdf(*args) == (0, 1)
    assert _rollup(spark, b) == _recompute(spark, a)

    # replay / crash-restart: nothing new → no-op, rollup unchanged
    assert drain_cdf(*args) is None
    v_b = TX.current_version(spark, b)
    assert _rollup(spark, b) == _recompute(spark, a)
    assert TX.current_version(spark, b) == v_b

    # appends + an UPDATE (merge rewrites id=2's amount) + a DV DELETE —
    # the change commits the append-only streaming source must skip
    TX.tx_write(spark, _src(spark, [(4, "ap", 7)]), a, mode="append")
    TX.tx_merge(
        spark, _src(spark, [(2, "eu", 99), (5, "eu", 1)]), a, keys=["id"]
    )
    TX.tx_delete(spark, a, where={"id": (3, 3)}, use_dv=True)
    assert drain_cdf_available(*args) >= 1
    assert _rollup(spark, b) == _recompute(spark, a)

    # a group whose rows all vanish disappears from the rollup
    TX.tx_delete(spark, a, where={"id": (4, 4)}, use_dv=True)
    drain_cdf_available(*args)
    assert _rollup(spark, b) == _recompute(spark, a)
    assert all(r[0] != "ap" for r in _rollup(spark, b))


def test_cdf_drain_racing_replays_commit_once(spark, tmp_path, monkeypatch):
    """Two maintainers drain the same range concurrently: the claim loser's
    txn mark check makes its commit a no-op — the contribution is applied
    exactly once (offset and data are ONE atomic commit)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    TX.tx_write(spark, _src(spark, [(1, "us", 10)]), a)
    drain_cdf(spark, a, b, _fold, ["id"])
    TX.tx_write(spark, _src(spark, [(2, "us", 5)]), a, mode="append")

    orig = TX._create_no_overwrite
    state = {"raced": False}

    def racy(sp, dst, text):
        if not state["raced"] and "/b/" in dst.replace("\\", "/"):
            state["raced"] = True
            drain_cdf(spark, a, b, _fold, ["id"])  # the competing drain
            return False  # and our claim loses
        return orig(sp, dst, text)

    monkeypatch.setattr(TX, "_create_no_overwrite", racy)
    drain_cdf(spark, a, b, _fold, ["id"])
    assert _rollup(spark, b) == _recompute(spark, a) == [("us", 15, 2)]


def test_cdf_drain_requires_source(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        drain_cdf(
            spark, str(tmp_path / "nope"), str(tmp_path / "b"), _fold, ["id"]
        )


def test_drain_cdf_row_keyed_skips_optimize(spark, tmp_path):
    """keys=None drains on the source's tracked row id: an OPTIMIZE
    between drains contributes ZERO change rows (the fold sees an empty
    feed for that range), and the maintained rollup stays recompute-equal
    through a mutation burst around it — including an UPDATE of the
    logical key itself, which a key-based diff would see as
    delete+insert of two different entities."""
    src = str(tmp_path / "src")
    snk = str(tmp_path / "snk")
    TX.tx_write(
        spark,
        _src(spark, [(1, "eu", 10), (2, "us", 20), (3, "eu", 30)]),
        src,
    )
    TX.tx_enable_row_tracking(spark, src)
    seen: list[int] = []

    def fold(changes, state):
        if state is not None:
            seen.append(changes.count())
        return _fold(changes, state)

    args = (spark, src, snk, fold, None)
    assert drain_cdf(*args) is not None  # snapshot drain
    # maintenance rewrite only: the row-keyed feed must be EMPTY
    TX.tx_compact(spark, src, n_files=2)
    assert drain_cdf(*args) is not None
    assert seen[-1] == 0
    # real mutations incl. an id (logical-key) update, then another
    # compaction inside the same drained range
    TX.tx_update(
        spark, src, where={"id": (2, 2)}, assignments={"id": F.lit(99)}
    )
    TX.tx_write(spark, _src(spark, [(4, "ap", 5)]), src, mode="append")
    TX.tx_compact(spark, src, n_files=1)
    assert drain_cdf(*args) is not None
    assert seen[-1] == 3  # update pre+post (id 2->99, same row id) + insert
    assert sorted(
        (r.region, r.amount, r.n_rows) for r in TX.tx_read(spark, snk).collect()
    ) == _recompute(spark, src)
