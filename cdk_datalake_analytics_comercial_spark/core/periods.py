"""Period (``yyyyMM``) incremental-processing utilities.

The reference simulates incremental processing by recomputing the last N
monthly periods every run (`common_jobs_functions.py:368-378` ``get_periods``;
``PERIODS`` job arg `:42,64`) and overwriting those partitions dynamically.
Outputs here are pure Python — no wall-clock dependence: callers must inject
``as_of`` (SURVEY §7.3.7) for reproducibility.
"""

from __future__ import annotations

import datetime as dt


def period_of(d: dt.date) -> str:
    """``yyyyMM`` string of a date (reference: `date_format(col,'yyyyMM')`,
    `t_venta.py:88`)."""
    return f"{d.year:04d}{d.month:02d}"


def _shift_month(year: int, month: int, delta: int) -> tuple[int, int]:
    m = (year * 12 + (month - 1)) + delta
    return m // 12, m % 12 + 1


def get_periods(n: int, as_of: dt.date) -> list[str]:
    """Last ``n`` monthly periods ending at ``as_of``'s month, ascending.

    Mirrors `common_jobs_functions.py:368-378` with an injected clock.
    ``get_periods(3, 2025-05-15) -> ['202503','202504','202505']``.
    """
    if n <= 0:
        return []
    out = []
    for delta in range(-(n - 1), 1):
        y, m = _shift_month(as_of.year, as_of.month, delta)
        out.append(f"{y:04d}{m:02d}")
    return out


def get_previous_period(period: str, k: int = 1) -> str:
    """Period ``k`` months before ``period`` (reference
    ``get_previous_period``, `common_jobs_functions.py:380-403`)."""
    y, m = int(period[:4]), int(period[4:6])
    y2, m2 = _shift_month(y, m, -k)
    return f"{y2:04d}{m2:02d}"


def period_bounds(period: str) -> tuple[dt.date, dt.date]:
    """First and last date of a ``yyyyMM`` period."""
    y, m = int(period[:4]), int(period[4:6])
    first = dt.date(y, m, 1)
    y2, m2 = _shift_month(y, m, 1)
    last = dt.date(y2, m2, 1) - dt.timedelta(days=1)
    return first, last


def get_dates_filter(periods: list[str]) -> tuple[dt.date, dt.date]:
    """Date range [min, max] covering a period list — the reference derives a
    BigMagic-int date filter from it (`common_jobs_functions.py:405-424`);
    pair with :mod:`.magic_dates` for the encoded bounds."""
    firsts_lasts = [period_bounds(p) for p in sorted(periods)]
    return firsts_lasts[0][0], firsts_lasts[-1][1]
