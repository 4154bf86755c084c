"""Exchange-rate resolution — the reference's currency conversion idiom.

`code/domain/t_venta.py:118-119`: each sale resolves two rates against the
company's local currency (``moneda_mn`` from ``m_parametro``) and the
day's exchange-rate row (``m_tipo_cambio`` joined on (fecha_emision,
compania, moneda_mn)):

- **local-currency rate** (``tipo_cambio_mn``): 1 when the document is
  already in local currency, else the day's sell rate; the document's own
  embedded rate is the fallback when no rate row exists.
- **foreign-currency rate** (``tipo_cambio_me``): 1 when the document is in
  dollars (DOL/USD), else the day's sell rate; fallback to the document's
  embedded rate with 0 treated as 1 (legacy sentinel).

Pure Column builders — unit-tested over all three currency cases the
fixtures require (local / USD / third currency with and without a matching
rate row, FIXTURES.md coverage goals).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exchange_rate_mn(
    cod_moneda: Column,
    moneda_mn: Column,
    tc_venta: Column,
    embedded_rate: Column,
) -> Column:
    """Local-currency conversion rate (`t_venta.py:118`)."""
    return F.coalesce(
        F.when(cod_moneda == moneda_mn, F.lit(1).cast("decimal(12,6)")).otherwise(
            tc_venta.cast("decimal(12,6)")
        ),
        embedded_rate.cast("decimal(12,6)"),
    )


def exchange_rate_me(
    cod_moneda: Column,
    tc_venta: Column,
    embedded_rate: Column,
) -> Column:
    """Foreign (dollar) conversion rate (`t_venta.py:119`); embedded 0 is a
    legacy "no rate" sentinel → 1."""
    return F.coalesce(
        F.when(cod_moneda.isin("DOL", "USD"), F.lit(1).cast("decimal(12,6)")).otherwise(
            tc_venta.cast("decimal(12,6)")
        ),
        F.when(embedded_rate == 0, F.lit(1).cast("decimal(12,6)")).otherwise(
            embedded_rate.cast("decimal(12,6)")
        ),
    )
