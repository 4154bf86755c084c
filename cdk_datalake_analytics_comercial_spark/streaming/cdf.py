"""Streamed change-data-feed consumption with exactly-once offsets.

Delta's ``readStream.option("readChangeFeed", "true")`` streams
pre-materialized ``_change_data`` files. txlog has no materialized change
files — its CDF (`sources.txlog.tx_diff`) is a keyed snapshot diff, a
full DataFrame job that Catalyst plans and distributes. Pushing that
through the row-based Python Data Source would serialize it through a
single-process reader; instead, the streamed form here is an incremental
DRAIN: each call computes the change feed from the sink's recorded offset
to the source's current version, hands it to the caller's fold, and
commits the fold output TOGETHER with the new offset in one atomic txlog
commit (the offset is an idempotent-writer ``txn`` mark on the sink, so a
replay after any crash or lost scheduler state is a no-op — the same
exactly-once contract a Structured Streaming checkpoint gives, carried by
the SINK table itself).

The cost model is the IVM one (`operators/incremental.py`): the diff
shuffles both snapshots once on the keys, then the fold is proportional
to the CHANGED rows. Unlike the append-only txlog streaming source
(`streaming/source.py`), this path consumes UPDATES and DELETES —
rewrite commits, DV deletes, merges — because the diff is computed from
snapshots, not from the commit's file actions.

Retention contract (same as Delta CDF): the source's log must retain the
offset version — schedule drains more often than ``tx_vacuum`` prunes.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import txlog as TX


def drain_cdf(
    spark: SparkSession,
    source: str,
    sink: str,
    fold: Callable[[DataFrame, DataFrame | None], DataFrame],
    keys: list[str] | None,
    app: str = "cdf-maintainer",
    images: str = "split",
) -> tuple[int, int] | None:
    """One exactly-once maintenance step. Returns the consumed version
    range ``(v_from, v_to]`` or ``None`` when the source has nothing new.

    ``fold(changes, state)`` receives the change feed (split-image CDF
    rows; on the very first drain, the full source snapshot as
    ``insert`` rows) and the sink's prior state (``None`` on the first
    drain), and returns the NEW sink snapshot, which is committed with
    ``txn=(app, v_to)``. A racing or replayed drain of the same range
    commits nothing (txn high-water mark) — the offset and the data are
    one atomic commit, so there is no window where one moved without the
    other.

    ``keys=None`` diffs on the source's TRACKED ROW ID
    (:func:`~..sources.txlog.tx_enable_row_tracking`): maintenance
    rewrites (OPTIMIZE) between drains then contribute ZERO change rows —
    a key-based diff on a rewritten table is already value-correct, but
    only the row-keyed feed lets the fold skip them as the no-ops they
    are, and it stays exact when the logical key itself is updated."""
    cur = TX.current_version(spark, source)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {source}")
    last = TX.tx_txn_version(spark, sink, app)
    if last is not None and last >= cur:
        return None  # caught up (or a replay raced ahead)
    if last is None:
        changes = TX.tx_read(spark, source, version=cur).withColumn(
            "_change_type", F.lit("insert")
        )
        state: DataFrame | None = None
        v_from = 0
    elif keys is None:
        changes = TX.tx_diff_rows(
            spark, source, v_from=last, v_to=cur, images=images
        )
        state = TX.tx_read(spark, sink)
        v_from = last
    else:
        changes = TX.tx_diff(
            spark, source, keys, v_from=last, v_to=cur, images=images
        )
        state = TX.tx_read(spark, sink)
        v_from = last
    new_state = fold(changes, state)
    TX.tx_write(spark, new_state, sink, mode="overwrite", txn=(app, cur))
    return (v_from, cur)


def drain_cdf_available(
    spark: SparkSession,
    source: str,
    sink: str,
    fold: Callable[[DataFrame, DataFrame | None], DataFrame],
    keys: list[str],
    app: str = "cdf-maintainer",
    images: str = "split",
    max_steps: int = 1000,
) -> int:
    """Drain until caught up (``Trigger.AvailableNow`` shape): repeat
    :func:`drain_cdf` while the source keeps advancing. Returns the number
    of maintenance commits made."""
    steps = 0
    while steps < max_steps:
        if drain_cdf(spark, source, sink, fold, keys, app, images) is None:
            return steps
        steps += 1
    raise RuntimeError(
        f"cdf drain did not catch up within {max_steps} steps — is a "
        f"writer outpacing the maintainer?"
    )
