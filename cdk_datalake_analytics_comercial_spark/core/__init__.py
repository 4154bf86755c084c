from .session import get_spark, stop_spark
from .catalog import Catalog, Layer
from .periods import get_periods, get_previous_period, period_of, get_dates_filter
from . import magic_dates

__all__ = [
    "get_spark",
    "stop_spark",
    "Catalog",
    "Layer",
    "get_periods",
    "get_previous_period",
    "period_of",
    "get_dates_filter",
    "magic_dates",
]
