"""Time-series regularization: calendar gap-fill and forward-fill.

A reporting/training pipeline over event-shaped data needs *dense* series
(a month with no sales is a 0-revenue row, not a missing row) — the
reference sidesteps this because its periods come pre-enumerated from a
parameter table (`m_parametro`, SURVEY §2.11); here the grid is derived
from the data itself.

Scale shape: the period grid is (distinct keys) × (months in range) —
metadata-sized next to the fact table — built with one tiny broadcast
cross join; nothing is collected to the driver. The forward fill is one
window shuffle on the series key, running-frame ``last(ignorenulls)``
(no self-join, no per-gap iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def month_grid(keys: DataFrame, bounded: DataFrame, time_col: str) -> DataFrame:
    """Dense (key × month) grid: every key crossed with every calendar
    month between the global min and max of ``bounded[time_col]``. The
    month axis comes from one row of aggregated bounds exploded through
    ``sequence(lo, hi, interval 1 month)`` — plan-side, never collected."""
    bounds = bounded.agg(
        F.min(time_col).alias("lo"), F.max(time_col).alias("hi")
    )
    months = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias(time_col)
    )
    return keys.crossJoin(F.broadcast(months))


def forward_fill(
    df: DataFrame, key_cols: list[str], order_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Carry the last non-null ``value_col`` forward within each key's
    order — the standard dense-series repair after a gap-filling join.
    Leading gaps (no prior observation) stay null by design."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def interpolate_linear(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Linear interpolation across gaps: a null ``value_col`` STRICTLY
    BETWEEN two observations becomes the time-weighted blend
    ``prev + (next − prev)·(t − t_prev)/(t_next − t_prev)``; leading and
    trailing gaps (only one side observed) stay null — interpolation never
    invents a trend beyond the data (pair with :func:`forward_fill` when
    carry-out is wanted).

    ``time_col`` must be castable to long (timestamp/date/numeric); the
    weight uses actual elapsed time, so unevenly spaced observations
    interpolate correctly. Two window passes over ONE shuffle partitioning
    (backward-looking ``last`` + forward-looking ``first``, same key+order
    spec — Spark reuses the sort)."""
    t = F.col(time_col).cast("timestamp").cast("long")
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col(value_col).isNotNull(), t)
    prev_v = F.last(value_col, ignorenulls=True).over(wb)
    prev_t = F.last(obs_t, ignorenulls=True).over(wb)
    next_v = F.first(value_col, ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)
    blend = prev_v + (next_v - prev_v) * (
        (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    out = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
        .when(prev_v.isNull() | next_v.isNull(), F.lit(None).cast("double"))
        .otherwise(blend)
    )
    return df.withColumn(out_col, F.round(out, 6))
