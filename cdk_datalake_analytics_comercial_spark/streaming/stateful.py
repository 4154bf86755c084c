"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in windowed aggregations (:mod:`.windows`) cover
time-bucketed counts, a *custom* per-key state machine needs the
arbitrary-state API: the engine keeps one state blob per group key across
micro-batches, with timeout-driven eviction bounding state exactly like a
watermark.

``running_user_totals`` — the demonstrator: per-user lifetime totals
(events, value sum, last-seen) that update on every micro-batch and emit the
current value (output mode "update"). State per key is O(1); keys
partition across executors by groupBy hash, so the operator scales like any
keyed aggregation.

NOTE: deliberately no ``from __future__ import annotations`` — the state
function signature is inspected like a pandas UDF's.
"""

import datetime as dt
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, sum_value double, last_seen timestamp"
STATE_SCHEMA = "n long, s double, last long"


def _update_user_totals(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last_us = state.get
    else:
        n, s, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["event_time"].max().value // 1000))
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-user running totals over a stream (or batch-equivalent test
    stream); state persists across micro-batches."""
    from .windows import with_event_time

    e = with_event_time(df, ts_col).select("user_id", "event_time", "value")
    return e.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(stream_df: DataFrame, query_name: str, timeout_s: int = 120):
    """Drive the stateful operator with an availableNow trigger into a
    memory sink (update mode) and block until drained."""
    q = (
        running_user_totals(stream_df)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
