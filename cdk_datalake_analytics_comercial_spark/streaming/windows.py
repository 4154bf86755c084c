"""Structured Streaming windowed aggregations over event streams.

The reference is batch-only (SURVEY §2.11): late data is handled by
recomputing the last N periods. This module is the engine's streaming
extension — the same windowed semantics as :mod:`..plans.events` expressed
as Structured Streaming transformations, so a pipeline can move from
period-reprocessing batch to incremental streaming without changing logic:

- tumbling / sliding windows: ``F.window(ts, size, slide)`` + watermark —
  state is bounded by (watermark horizon / slide) windows per key.
- session windows: ``F.session_window(ts, gap)`` — Spark's native gap-based
  session state (the batch twin is the lag+cumsum sessionization in
  ``plans.events.q_events_sessions``).

All functions accept either a streaming or a batch DataFrame (the
transformations are identical — only the sink differs), which is how the
equivalence tests work: run the same builder over ``readStream`` +
``trigger(availableNow)`` into a memory sink and over a plain batch read,
and compare results.

Scale notes: a watermark bounds state; aggregations shuffle on
(window, keys) — at 1000 executors the state store partitions by the same
key, so skewed keys salt exactly like batch. Output mode "update" for
dashboards, "append" (watermark-closed windows only) for exactly-once
downstream tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to a proper timestamp.

    The ``events`` fixture carries parquet TIMESTAMP(NANOS) read as
    nanosecond longs (session conf ``nanosAsLong``); real streams carry
    timestamps already. Emits ``event_time`` (timestamp).
    """
    if dict(df.dtypes).get(ts_col) == "bigint":
        sec = F.col(ts_col).cast("double") / F.lit(1e9)
        return df.withColumn("event_time", F.timestamp_seconds(sec))
    return df.withColumn("event_time", F.col(ts_col).cast("timestamp"))


def tumbling_counts(
    df: DataFrame,
    window_size: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Per-window, per-key counts and sums with a watermark for late data."""
    keys = keys if keys is not None else ["event_type"]
    e = with_event_time(df, ts_col).withWatermark("event_time", watermark)
    return (
        e.groupBy(F.window("event_time", window_size).alias("win"), *keys)
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Sliding windows: each event lands in size/slide windows."""
    keys = keys if keys is not None else ["event_type"]
    e = with_event_time(df, ts_col).withWatermark("event_time", watermark)
    return (
        e.groupBy(F.window("event_time", window_size, slide).alias("win"), *keys)
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_aggregates(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Native gap-based session windows per key (``F.session_window``)."""
    e = with_event_time(df, ts_col).withWatermark("event_time", watermark)
    return (
        e.groupBy(F.session_window("event_time", gap).alias("sess"), F.col(key))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


def run_availablenow_to_memory(
    stream_df: DataFrame, builder, query_name: str, timeout_s: int = 120
):
    """Run ``builder(stream_df)`` as an availableNow streaming query into a
    memory sink and block until done — the batch-equivalence test harness
    (process everything available, then stop; same semantics a periodic
    incremental run would have)."""
    q = (
        builder(stream_df)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
