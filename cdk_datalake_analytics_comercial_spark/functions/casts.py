"""Cast interpreter + declared-schema projection.

- ``transform_default`` mirrors the reference's config-interpreted cast
  (`loadt_stage_to_redshift.py:40-78`): cast to a named target type
  (varchar/integer/numeric(p,s)/smallint/bigint/boolean/double), or a literal
  override (``"null"`` → typed NULL).
- ``cast_projection`` is the final cast-projection every reference job ends
  with (`t_venta.py:127-166`, `t_venta_detalle.py:320-362`): project + cast
  every column to the declared output schema.
- ``decimal_sum`` standardizes the engine's exact-arithmetic aggregation
  policy (SURVEY §7.3.1 decimal semantics): sum in DecimalType, surface as a
  fixed-scale value — bit-identical across engines, no float summation-order
  drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the Redshift/SQL type-name family the reference's interpreter accepts
# (`loadt_stage_to_redshift.py:49-72`); string types may carry a (n) length
_STRING_TYPES = ("varchar varying", "character varying", "character", "varchar", "text")
_EXACT_ALIASES = {
    "smallint": "int",
    "double precision": "double",
}


def _normalize_type(t: str) -> str:
    t = t.strip().lower()
    for s in _STRING_TYPES:
        if t == s or t.startswith(s + "("):
            return "string"
    if t in _EXACT_ALIASES:
        return _EXACT_ALIASES[t]
    if t.startswith("numeric"):
        return "decimal" + t[len("numeric"):]
    return t


def transform_default(col: Column, target_type: str, literal=...) -> Column:
    """Cast ``col`` to ``target_type``; ``literal`` overrides the value
    (``"null"``/None → typed NULL), per `loadt_stage_to_redshift.py:40-78`."""
    t = _normalize_type(target_type)
    if literal is not ...:
        if literal is None or (isinstance(literal, str) and literal.lower() == "null"):
            return F.lit(None).cast(t)
        return F.lit(literal).cast(t)
    return col.cast(t)


def cast_projection(df: DataFrame, schema: list[tuple[str, str]]) -> DataFrame:
    """``select(col(c).cast(t) for c, t in schema)`` — the declared-output
    contract ending every job (reference P2)."""
    return df.select(*[F.col(c).cast(_normalize_type(t)).alias(c) for c, t in schema])


def decimal_sum(col: Column, scale: int = 6, out: str = "double") -> Column:
    """Exact decimal sum of a (possibly double) measure.

    Casting each addend to ``decimal(38, scale)`` before summing makes the
    result independent of partitioning/summation order (decimal addition is
    associative; float addition is not) — required for hash-exact differential
    testing against the DuckDB oracle and good hygiene for money math
    (reference measures are ``numeric(38,12)``, `t_venta.py:160-161`).
    """
    s = F.sum(col.cast(f"decimal(38,{scale})"))
    return s.cast(out) if out else s
