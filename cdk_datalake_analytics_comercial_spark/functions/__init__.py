from .transforms import (
    fn_transform_ClearString,
    fn_transform_Concatenate,
    fn_transform_Date,
    fn_transform_DateMagic,
    fn_transform_Datetime,
    fn_transform_DatetimeMagic,
    fn_transform_PeriodMagic,
    fn_transform_ByteMagic,
    fn_transform_Case,
    TRANSFORM_DISPATCH,
)
from .casts import transform_default, cast_projection, decimal_sum
from .keys import surrogate_key

__all__ = [
    "fn_transform_ClearString",
    "fn_transform_Concatenate",
    "fn_transform_Date",
    "fn_transform_DateMagic",
    "fn_transform_Datetime",
    "fn_transform_DatetimeMagic",
    "fn_transform_PeriodMagic",
    "fn_transform_ByteMagic",
    "fn_transform_Case",
    "TRANSFORM_DISPATCH",
    "transform_default",
    "cast_projection",
    "decimal_sum",
    "surrogate_key",
]
