"""Skew-mitigation utilities: salted aggregation and salted broadcast-side
replication join.

AQE's skew-join splitting (on by default in the engine session) handles
sort-merge-join skew at runtime; these helpers cover the two places AQE
does not reach:

- :func:`salted_agg` — a hot grouping key concentrates a groupBy's shuffle
  into one reducer. Two-stage aggregation (partial per (key, salt), final
  per key) spreads the hot key over ``n_salts`` reducers. Only *algebraic*
  aggregates compose (sum/count/min/max — pass the merge expression).
- :func:`replicated_skew_join` — broadcast-replicate the small side to every
  salt of the big side's hot keys; equivalent to a plain equi-join for any
  key distribution, at the cost of small-side duplication (bounded by
  ``n_salts``).

Salting is deterministic (hash of a stable id column, not rand()) so reruns
and retried tasks agree — important for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str | Column, n_salts: int) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salts) derived from a stable
    column (row id / natural key remainder), not ``rand()``."""
    c = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return df.withColumn("_salt", F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_from: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) with ``partial_aggs``,
    then groupBy(keys) with ``final_aggs`` over the partial columns.

    Example::

        salted_agg(df, ["k"],
                   [F.sum("v").alias("_s"), F.count("*").alias("_c")],
                   [F.sum("_s").alias("total"), F.sum("_c").alias("n")],
                   salt_from="id")
    """
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_from: str | Column = None,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side: salt the big side,
    replicate the small side across all salts, join on keys + salt.

    ``salt_from`` defaults to the join key tuple hashed with a row-varying
    component is NOT possible deterministically — pass a stable unique big-
    side column (e.g. its row id); falling back to the first join key keeps
    correctness but not skew-spread for a single hot key.
    """
    if salt_from is None:
        salt_from = on[0]
    b = with_salt(big, salt_from, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, on + ["_salt"], how)
    return out.drop("_salt")
