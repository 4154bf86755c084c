"""Scan-pruning helpers: period predicates that parquet/Delta can act on.

The reference filters stage reads with
``date_format(col("fecha_liquidacion"), "yyyyMM").isin(PERIODOS)``
(`code/domain/t_venta.py:25`) — correct, but a black box to min/max pruning:
the function call hides the raw column, so neither parquet row-group stats
nor partition values can prune (SURVEY §4a / §7.3.6).

:func:`period_filter` rewrites the intent as BOTH predicates:

- a sargable date-range ``col BETWEEN min_day AND max_day`` derived from the
  period list — pushed to the scan, prunes row groups / files / partitions;
- the exact ``date_format(col).isin(periods)`` — evaluated post-scan, keeps
  semantics identical when the period list has gaps.

At 100 TB this is the difference between scanning 3 months and scanning the
table. The same helper covers BigMagic integer date columns (the encoded
bounds are monotone in the date, so the range predicate is exact).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import magic_dates
from ..core.periods import period_bounds


def _bounds(periods: list[str]) -> tuple[dt.date, dt.date]:
    ps = sorted(periods)
    return period_bounds(ps[0])[0], period_bounds(ps[-1])[1]


def period_filter(col: Column, periods: list[str]) -> Column:
    """Sargable period-membership predicate over a date/timestamp column."""
    if not periods:
        return F.lit(False)
    lo, hi = _bounds(periods)
    rng = col.cast("date").between(F.lit(lo), F.lit(hi))
    if _is_contiguous(periods):
        return rng
    # residual membership via integer date arithmetic — byte-identical to
    # date_format(col,'yyyyMM') for 4-digit years, no per-row formatter
    return rng & (F.year(col) * 100 + F.month(col)).cast("string").isin(periods)


def magic_period_filter(col: Column, periods: list[str], pivot: str = "2008") -> Column:
    """Same, over a BigMagic integer date column (the encoding is monotone,
    so integer BETWEEN bounds are exact — the reference's
    ``get_dates_filter`` path, `common_jobs_functions.py:405-424`)."""
    if not periods:
        return F.lit(False)
    lo, hi = _bounds(periods)
    enc = (
        magic_dates.py_date_to_magic_2008
        if pivot == "2008"
        else magic_dates.py_date_to_magic_1900
    )
    rng = col.cast("long").between(F.lit(enc(lo)), F.lit(enc(hi)))
    if _is_contiguous(periods):
        return rng
    dec = (
        magic_dates.magic_2008_to_date if pivot == "2008" else magic_dates.magic_1900_to_date
    )
    d = dec(col)
    return rng & (F.year(d) * 100 + F.month(d)).cast("string").isin(periods)


def _is_contiguous(periods: list[str]) -> bool:
    """True when the period list is a gap-free month run — the common case
    (``get_periods`` output), where the range predicate alone is exact."""
    ps = sorted(periods)
    idx = [int(p[:4]) * 12 + int(p[4:6]) for p in ps]
    return all(b - a == 1 for a, b in zip(idx, idx[1:]))
