"""As-of (point-in-time) join — for each left row, the latest right row at
or before it (``backward``), or earliest at-or-after (``forward``), per key.

Spark has no native as-of join (pandas has ``merge_asof``; DuckDB has ASOF
JOIN — which serves as this operator's differential oracle). The naive
translations both fail at scale:

- range join (``l.ts >= r.ts``) + row_number: the join explodes to one row
  per (left, earlier-right) pair — quadratic per key before the window
  prunes it back.
- per-key ``applyInPandas`` + ``merge_asof``: correct, but moves the whole
  corpus through Python.

This implementation is the UNION-WINDOW form: tag both sides, union them,
and run ONE ``last(payload, ignorenulls=True)`` window ordered by
(time, side) per key — each left row picks up the payload of the nearest
preceding right row. Cost: a single shuffle on the key for the combined
rows, no join operator at all, no row explosion, whole-stage codegen
throughout. Skew = key skew of the inputs themselves (saltable upstream).

Tie semantics: at equal timestamps the right row sorts BEFORE the left row
(side 0 < 1), so matches are inclusive — same as DuckDB's ``ON r.ts <=
l.ts``. The right side must be unique per (key, time); pre-dedup with W1
otherwise (duplicate right rows at one instant make any engine's pick
arbitrary).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, enriched with ``value_cols`` from
    the nearest right row per ``by`` key (NULLs when none qualifies).

    ``on`` must be an orderable column present on both sides (use integer
    epoch micros for cross-engine exactness). ``tolerance`` (same units as
    ``on``) bounds the match distance; matches farther than that are
    nulled. Matched value columns are emitted as ``<col><suffix>``; the
    matched right timestamp as ``<on><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    by = list(by)
    payload = F.struct(
        F.col(on).cast("long").alias("_t"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(on).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    left_cols = left.columns
    l = left.select(
        "*",
        F.col(on).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
    )
    # right rows carry no left columns; left rows carry a null payload —
    # unionByName with allowMissingColumns pads both.
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    picked = u.withColumn("_hit", F.last("_p", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )

    hit = F.col("_hit")
    if tolerance is not None:
        dist = (
            (F.col("_ts") - hit["_t"])
            if direction == "backward"
            else (hit["_t"] - F.col("_ts"))
        )
        hit = F.when(dist <= F.lit(tolerance), F.col("_hit"))

    out = picked.select(
        *left_cols,
        hit["_t"].alias(f"{on}{suffix}"),
        *[hit[c].alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
