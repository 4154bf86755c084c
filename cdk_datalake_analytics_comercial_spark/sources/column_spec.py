"""Config-interpreted column transforms for the warehouse export — the
engine twin of `code/redshift/loadt_stage_to_redshift.py` (SURVEY §2.10 and
§3.3): per-column specs from a ``;``-CSV drive a transform dispatcher
(``default`` cast / literal override, BigMagic date + time encodings,
injected current date), a magic-date period filter, and the final
rename-strip projection.

Engine-shape differences from the reference (same semantics):

- The reference applies one ``withColumn`` per spec row
  (`loadt_stage_to_redshift.py:222-251`), then keeps/strips a
  ``_redshifttarget`` suffix to find the produced columns (`:283-286`).
  Each ``withColumn`` adds a Project node; 50 columns → 50 stacked
  projections for the analyzer to collapse. The engine builds every spec as
  a Column expression and emits ONE ``select`` — no suffix bookkeeping, one
  Project, same output.
- ``transform_get_date`` reads the wall clock (`:106-123`); the engine
  takes the injected ``as_of`` (SURVEY §7.3.7 reproducibility).
"""

from __future__ import annotations

import csv
import datetime as dt
import io
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import magic_dates
from ..functions.casts import _normalize_type, transform_default


@dataclass(frozen=True)
class ColumnSpec:
    """One row of ``stage_columns_to_load.csv`` (`loadt_stage_to_redshift
    .py:168-185`): COLUMNA → COLUMNA_DESTINO via FUNCION/TIPO_DATO_DESTINO;
    LITERAL_DESTINO overrides the value; ES_FILTRO_FECHA marks the column
    the magic-date period filter applies to."""

    source: str | None              # COLUMNA (None/"" for pure literals)
    target: str                     # COLUMNA_DESTINO
    target_type: str                # TIPO_DATO_DESTINO
    literal: str | None = None      # LITERAL_DESTINO
    function: str = "default"       # FUNCION (default when empty, `:230-234`)
    is_date_filter: bool = False    # ES_FILTRO_FECHA == "SI"


def spec_expr(spec: ColumnSpec, as_of: dt.date) -> Column:
    """The spec's transform as a Column expression (dispatcher
    `loadt_stage_to_redshift.py:125-138`)."""
    fn = (spec.function or "default").lower()
    src = F.col(spec.source) if spec.source else F.lit(None)
    if fn == "default":
        if spec.literal is not None and spec.literal != "":
            return transform_default(src, spec.target_type, literal=spec.literal)
        return transform_default(src, spec.target_type)
    if fn == "convert_fecha_bigmagic":
        # date → days-since-2008 BigMagic int (`:80-96`)
        return magic_dates.date_to_magic_2008(F.to_date(src)).cast("int")
    if fn == "convert_hora_bigmagic":
        # timestamp → 'HHMMSS' string via positional arithmetic (`:98-104`)
        return magic_dates.time_to_hhmmss(src).cast("string")
    if fn == "get_date":
        # injected clock in the target representation (`:106-123`)
        t = _normalize_type(spec.target_type)
        stamp = F.lit(as_of.strftime("%Y%m%d"))
        if t == "string":
            return stamp
        if t in ("int", "integer", "bigint"):
            return stamp.cast(t)
        if t == "date":
            return F.to_date(stamp, "yyyyMMdd")
        if t == "timestamp":
            return F.to_timestamp(stamp, "yyyyMMdd")
        # numeric/decimal targets: honor the declared type (the reference
        # leaves the column out entirely here — a silent contract hole)
        return stamp.cast(t)
    raise ValueError(f"unknown column function: {spec.function!r}")


def apply_column_specs(
    df: DataFrame, specs: list[ColumnSpec], as_of: dt.date
) -> DataFrame:
    """All specs as ONE projection, output columns named/ordered per spec
    (replaces the reference's withColumn loop + ``_redshifttarget``
    keep/strip, `loadt_stage_to_redshift.py:222-251,283-286`)."""
    return df.select(*[spec_expr(s, as_of).alias(s.target) for s in specs])


def date_filter_column(specs: list[ColumnSpec]) -> str | None:
    """Target name of the ES_FILTRO_FECHA column (`:245-247`), if any."""
    for s in specs:
        if s.is_date_filter:
            return s.target
    return None


def magic_period_filter(
    df: DataFrame, specs: list[ColumnSpec], periods: list[str]
) -> DataFrame:
    """Transactional-table period restriction (`:267-270`): the date-filter
    column holds BigMagic ints; keep rows whose encoded day falls inside the
    period window. Expressed as a RANGE over the encoded bounds (BigMagic
    ints are monotone in the date) so the predicate is sargable — the
    reference materializes the full ``isin`` day list."""
    col = date_filter_column(specs)
    if col is None or not periods:
        return df
    from ..core.periods import get_dates_filter

    lo, hi = get_dates_filter(periods)
    return df.filter(
        F.col(col).between(
            magic_dates.py_date_to_magic_2008(lo), magic_dates.py_date_to_magic_2008(hi)
        )
    )


def parse_column_specs_csv(text: str) -> dict[tuple[str, str], list[ColumnSpec]]:
    """Parse ``stage_columns_to_load.csv`` (``;``-delimited, columns
    TABLA_STAGE;PAIS;COLUMNA;COLUMNA_DESTINO;TIPO_DATO_DESTINO;
    LITERAL_DESTINO;FUNCION;ES_FILTRO_FECHA) → {(tabla, pais): [specs]}."""
    out: dict[tuple[str, str], list[ColumnSpec]] = {}
    for r in csv.DictReader(io.StringIO(text), delimiter=";"):
        key = (r["TABLA_STAGE"], r["PAIS"])
        out.setdefault(key, []).append(
            ColumnSpec(
                source=r.get("COLUMNA") or None,
                target=r["COLUMNA_DESTINO"],
                target_type=r["TIPO_DATO_DESTINO"],
                literal=r.get("LITERAL_DESTINO") or None,
                function=(r.get("FUNCION") or "default"),
                is_date_filter=(r.get("ES_FILTRO_FECHA") or "").lower() == "si",
            )
        )
    return out
