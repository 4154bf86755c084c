"""Unit tests for the period (yyyyMM) incremental-processing utilities
(reference get_periods/get_previous_period, common_jobs_functions.py:358-424)."""

import datetime as dt

from cdk_datalake_analytics_comercial_spark.core.periods import (
    get_dates_filter,
    get_periods,
    get_previous_period,
    period_bounds,
    period_of,
)


def test_period_of():
    assert period_of(dt.date(2025, 5, 15)) == "202505"
    assert period_of(dt.date(1999, 12, 1)) == "199912"


def test_get_periods_basic():
    assert get_periods(3, dt.date(2025, 5, 15)) == ["202503", "202504", "202505"]
    assert get_periods(1, dt.date(2025, 5, 15)) == ["202505"]
    assert get_periods(0, dt.date(2025, 5, 15)) == []


def test_get_periods_year_boundary():
    assert get_periods(3, dt.date(2025, 1, 10)) == ["202411", "202412", "202501"]
    # reference fact jobs use 100 periods — must span many years cleanly
    ps = get_periods(100, dt.date(2025, 1, 10))
    assert len(ps) == 100
    assert ps[0] == "201610"
    assert ps[-1] == "202501"
    assert ps == sorted(ps)


def test_get_previous_period():
    assert get_previous_period("202501") == "202412"
    assert get_previous_period("202506", 6) == "202412"
    assert get_previous_period("202506", 18) == "202312"


def test_period_bounds():
    assert period_bounds("202502") == (dt.date(2025, 2, 1), dt.date(2025, 2, 28))
    assert period_bounds("202412") == (dt.date(2024, 12, 1), dt.date(2024, 12, 31))
    assert period_bounds("202402") == (dt.date(2024, 2, 1), dt.date(2024, 2, 29))


def test_get_dates_filter():
    lo, hi = get_dates_filter(["202501", "202503", "202502"])
    assert lo == dt.date(2025, 1, 1)
    assert hi == dt.date(2025, 3, 31)
