"""The ``fn_transform_*`` named expression library.

The reference's stage ingestion applies a family of column transforms whose
names and arity are visible in the schema registry
(`utils/download_dynamodb/datalake_columns_bigmagic.csv`; SURVEY §2.10):
``fn_transform_ClearString`` (1330 uses), ``Concatenate`` (234),
``DatetimeMagic`` (222), ``Datetime`` (207), ``DateMagic`` (87), ``Date``
(28), ``ByteMagic`` (7), ``Case`` (5), ``PeriodMagic`` (3). All are
trim/concat/date-arithmetic compositions — pure Column functions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import magic_dates


def fn_transform_ClearString(col: Column) -> Column:
    """Trim whitespace; empty string → NULL. The dominant stage transform
    (1330 column uses); mirrors the extraction SQL's ``rtrim(ltrim(...))``
    (`utils/download_dynamodb/datalake_tables_bigmagic.csv`)."""
    t = F.trim(col.cast("string"))
    return F.when(t == "", F.lit(None).cast("string")).otherwise(t)


def fn_transform_Concatenate(*cols: Column, sep: str = "|") -> Column:
    """Pipe-concatenate trimmed parts — the surrogate-key builder convention
    (`t_venta.py:89`, extraction ``ID_COLUMN`` expressions)."""
    return F.concat_ws(sep, *[F.trim(c.cast("string")) for c in cols])


def fn_transform_Date(col: Column, fmt: str | None = None) -> Column:
    """String/num → date (`loadt_stage_to_redshift.py` transform family)."""
    return F.to_date(col.cast("string"), fmt) if fmt else F.to_date(col)


def fn_transform_Datetime(col: Column, fmt: str | None = None) -> Column:
    return F.to_timestamp(col.cast("string"), fmt) if fmt else F.to_timestamp(col)


def fn_transform_DateMagic(col: Column) -> Column:
    """BigMagic integer (2008 pivot) → date (SURVEY §1.4)."""
    return magic_dates.magic_2008_to_date(col)


def fn_transform_DatetimeMagic(date_col: Column, time_col: Column) -> Column:
    """BigMagic (int date, int HHMMSS time) pair → timestamp."""
    d = magic_dates.magic_2008_to_date(date_col)
    t = magic_dates.hhmmss_to_time_str(time_col)
    return F.to_timestamp(F.concat_ws(" ", d.cast("string"), t))


def fn_transform_PeriodMagic(col: Column) -> Column:
    """BigMagic integer date → ``yyyyMM`` period string."""
    return F.date_format(magic_dates.magic_2008_to_date(col), "yyyyMM")


def fn_transform_ByteMagic(col: Column) -> Column:
    """Legacy byte flag → trimmed string ('1'/'0'-style); NULL-safe."""
    return fn_transform_ClearString(col.cast("string"))


def fn_transform_Case(col: Column, mapping: dict[str, str], default=None) -> Column:
    """Value-remap via a ``when`` ladder (reference ``fn_transform_Case``)."""
    expr = None
    for k, v in mapping.items():
        cond = F.trim(col.cast("string")) == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return F.lit(default).cast("string")
    return expr.otherwise(F.lit(default).cast("string"))


TRANSFORM_DISPATCH = {
    "fn_transform_ClearString": fn_transform_ClearString,
    "fn_transform_Concatenate": fn_transform_Concatenate,
    "fn_transform_Date": fn_transform_Date,
    "fn_transform_Datetime": fn_transform_Datetime,
    "fn_transform_DateMagic": fn_transform_DateMagic,
    "fn_transform_DatetimeMagic": fn_transform_DatetimeMagic,
    "fn_transform_PeriodMagic": fn_transform_PeriodMagic,
    "fn_transform_ByteMagic": fn_transform_ByteMagic,
    "fn_transform_Case": fn_transform_Case,
}
