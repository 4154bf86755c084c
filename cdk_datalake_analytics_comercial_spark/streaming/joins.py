"""Stream-stream joins with watermark-bounded state.

The remaining Structured Streaming join surface: correlate two live event
streams (e.g. clicks with the error that preceded them) without unbounded
state. Spark requires BOTH streams to carry watermarks and the join
condition to include a time-range predicate — together they let the state
store evict rows once no future match is possible.

Scale notes: stream-stream join state partitions by the equi-join key
(same skew/salting story as a batch shuffle join); state size is bounded
by (watermark horizon × arrival rate) per side, independent of stream
lifetime. The time-range predicate is what makes eviction possible — an
unconstrained stream-stream join would hold every row forever and is
rejected by Spark in append mode.

Like the window builders, these transformations accept batch DataFrames
too — the equivalence tests run the same builder both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import with_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
    left_prefix: str = "l",
    right_prefix: str = "r",
) -> DataFrame:
    """Inner interval join: left rows matched with right rows of the same
    ``key`` whose event time lies in ``[left.time - lookback, left.time]``.

    Emits ``<prefix>_event_id/<prefix>_time`` pairs plus the key — the
    standard "which right event preceded this left event (within the
    horizon)" correlation.
    """
    l = (
        with_event_time(left)
        .withWatermark("event_time", watermark)
        .select(
            F.col("event_id").alias(f"{left_prefix}_event_id"),
            F.col(key),
            F.col("event_time").alias(f"{left_prefix}_time"),
        )
    )
    r = (
        with_event_time(right)
        .withWatermark("event_time", watermark)
        .select(
            F.col("event_id").alias(f"{right_prefix}_event_id"),
            F.col(key).alias(f"_{key}_r"),
            F.col("event_time").alias(f"{right_prefix}_time"),
        )
    )
    lt, rt = F.col(f"{left_prefix}_time"), F.col(f"{right_prefix}_time")
    cond = (
        (F.col(key) == F.col(f"_{key}_r"))
        & (rt >= lt - F.expr(f"INTERVAL {lookback}"))
        & (rt <= lt)
    )
    return l.join(r, cond, "inner").select(
        key,
        f"{left_prefix}_event_id",
        f"{left_prefix}_time",
        f"{right_prefix}_event_id",
        f"{right_prefix}_time",
    )
