"""Relational operator idioms of the reference, as reusable builders.

- ``top1_per_group``: the reference's sole window pattern (W1, SURVEY §2.6):
  ``row_number().over(partitionBy(keys).orderBy(order))`` → keep ``orden==1``
  (`t_pedido_detalle_cumplimiento.py:72-79`, `m_cliente.py:41-48`,
  `dim_cliente.py:46-56`).
- ``rolling_range_join``: the reference's rolling N-month metric idiom (J5):
  a non-equi self-join ``past.period BETWEEN add_months(cur.period,-N) AND
  cur.period`` (`fact_cliente_venta.py:87-95,131-139`).
- ``rolling_window``: the idiomatic Spark rewrite —
  ``Window.partitionBy(keys).orderBy(month_index).rangeBetween(-N, 0)`` —
  one shuffle instead of a join, result-equivalent when every (key, period)
  appears at most once (SURVEY §7.1 step 6 calls for the equivalence test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: list[Column],
    rank_col: str = "orden",
    keep: bool = True,
) -> DataFrame:
    """row_number per group; ``keep=True`` filters to the top row and drops
    the rank column, else the ranked frame is returned (the reference also
    uses ``orden`` inside later join conditions, J7)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    if keep:
        return ranked.filter(F.col(rank_col) == 1).drop(rank_col)
    return ranked


def _month_index(period_col: Column) -> Column:
    """yyyyMM string → linear month index (supports rangeBetween frames)."""
    y = F.substring(period_col, 1, 4).cast("int")
    m = F.substring(period_col, 5, 2).cast("int")
    return y * 12 + m - 1


def rolling_range_join(
    df: DataFrame,
    keys: list[str],
    period_col: str,
    aggs: list[Column],
    months_back: int,
) -> DataFrame:
    """Rolling aggregate via range self-join (reference J5 idiom).

    ``df`` must be pre-aggregated to one row per (keys, period). Returns one
    row per (keys, period) with ``aggs`` computed over the trailing
    ``months_back``-month window (inclusive).
    """
    cur = df.select(*keys, period_col).distinct().alias("cur")
    past = df.alias("past")
    cond = None
    for k in keys:
        eq = F.col(f"cur.{k}") == F.col(f"past.{k}")
        cond = eq if cond is None else (cond & eq)
    ci = _month_index(F.col(f"cur.{period_col}"))
    pi = _month_index(F.col(f"past.{period_col}"))
    cond = cond & pi.between(ci - months_back, ci)
    joined = cur.join(past, cond, "inner")
    return joined.groupBy(
        *[F.col(f"cur.{k}").alias(k) for k in keys],
        F.col(f"cur.{period_col}").alias(period_col),
    ).agg(*aggs)


def rolling_window(
    df: DataFrame,
    keys: list[str],
    period_col: str,
    agg_exprs: list[tuple[Column, str]],
    months_back: int,
) -> DataFrame:
    """Idiomatic rewrite of :func:`rolling_range_join`: a rangeBetween window
    over a linear month index — single shuffle, no join. ``agg_exprs`` is a
    list of (aggregate-over-window Column-builder input, output name) where
    the input column is aggregated with ``sum`` over the frame; for custom
    aggregates pass fully-built window columns via ``withColumn`` directly.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(_month_index(F.col(period_col)))
        .rangeBetween(-months_back, 0)
    )
    out = df
    for col, name in agg_exprs:
        out = out.withColumn(name, F.sum(col).over(w))
    return out


def top1_per_group_agg(
    df: DataFrame,
    partition_by: list[str],
    order_desc: list[str],
) -> DataFrame:
    """Scale rewrite of :func:`top1_per_group` for ALL-DESCENDING orders:
    ``max(struct(order_cols..., rest...))`` per key.

    The window form shuffles EVERY row to its key's partition before
    ranking; the struct-max form is an ordinary aggregate, so the map side
    combines down to one candidate row per key per partition and the
    shuffle carries |keys| rows instead of |rows| — the difference between
    shuffling a 100 TB fact and shuffling its key space. Struct comparison
    is field-by-field, so the order columns lead the struct and the
    remaining columns ride behind (they also serve as the deterministic
    tie-break; give the order a unique suffix column — e.g. the id — for
    result-identical equivalence with the window form, since row_number
    under order ties is arbitrary while struct-max falls through to the
    payload)."""
    rest = [c for c in df.columns if c not in partition_by and c not in order_desc]
    packed = F.struct(
        *[F.col(c) for c in order_desc], *[F.col(c) for c in rest]
    )
    out = df.groupBy(*partition_by).agg(F.max(packed).alias("_top"))
    return out.select(
        *partition_by,
        *[F.col(f"_top.{c}").alias(c) for c in order_desc + rest],
    )
