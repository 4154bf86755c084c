"""BigMagic legacy date/time codecs (ERP integer encodings) as Column exprs.

The reference ships two distinct integer-date pivots (SURVEY §1.4) — keep
them as separately named, separately tested codecs (SURVEY §7.3.8):

- pivot 2008-01-01 with offset 733042: `common_jobs_functions.py:405-424`
  (``get_dates_filter``) and `code/redshift/loadt_stage_to_redshift.py:80-96`
  (``transform_convert_fecha_bigmagic``).
- pivot 1900-01-01 with offset 693596: extractor
  (`utils/extract_data/load_with_query_python.py:244-258`).

Times encode as integer/str ``HHMMSS`` (`loadt_stage_to_redshift.py:98-104`).

All codecs are pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

PIVOT_2008 = dt.date(2008, 1, 1)
OFFSET_2008 = 733042
PIVOT_1900 = dt.date(1900, 1, 1)
OFFSET_1900 = 693596


def date_to_magic_2008(col: Column) -> Column:
    """date → BigMagic int (`loadt_stage_to_redshift.py:80-96`)."""
    return (F.datediff(col, F.lit("2008-01-01")) + F.lit(OFFSET_2008)).cast("int")


def magic_2008_to_date(col: Column) -> Column:
    return F.date_add(F.lit("2008-01-01"), (col.cast("int") - F.lit(OFFSET_2008)))


def date_to_magic_1900(col: Column) -> Column:
    """date → BigMagic int, extractor pivot
    (`load_with_query_python.py:244-258`)."""
    return (F.datediff(col, F.lit("1900-01-01")) + F.lit(OFFSET_1900)).cast("int")


def magic_1900_to_date(col: Column) -> Column:
    return F.date_add(F.lit("1900-01-01"), (col.cast("int") - F.lit(OFFSET_1900)))


def time_to_hhmmss(col: Column) -> Column:
    """timestamp → integer ``HHMMSS`` (`loadt_stage_to_redshift.py:98-104`)."""
    return F.date_format(col, "HHmmss").cast("int")


def hhmmss_to_time_str(col: Column) -> Column:
    """integer ``HHMMSS`` → ``HH:mm:ss`` string (inverse of the above)."""
    padded = F.lpad(col.cast("string"), 6, "0")
    return F.concat_ws(
        ":",
        F.substring(padded, 1, 2),
        F.substring(padded, 3, 2),
        F.substring(padded, 5, 2),
    )


# Pure-Python mirrors for driver-side filter synthesis (get_dates_filter path).

def py_date_to_magic_2008(d: dt.date) -> int:
    return (d - PIVOT_2008).days + OFFSET_2008


def py_magic_2008_to_date(v: int) -> dt.date:
    return PIVOT_2008 + dt.timedelta(days=v - OFFSET_2008)


def py_date_to_magic_1900(d: dt.date) -> int:
    return (d - PIVOT_1900).days + OFFSET_1900


def py_magic_1900_to_date(v: int) -> dt.date:
    return PIVOT_1900 + dt.timedelta(days=v - OFFSET_1900)
