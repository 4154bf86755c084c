"""Data-quality expectation checks — the lakehouse "expectations" pattern
(dbt tests / Delta constraints / Deequ-style validation) the reference
lacks entirely: its jobs trust upstream uniqueness (SURVEY §7.3.3 notes the
merge precondition is *assumed*). A serious pipeline validates it.

Each check returns a ONE-ROW DataFrame ``(check, table_name, violations)``
so a report is a cheap unionByName of independent aggregates; all checks
are single-pass aggregations (count of failures), never row dumps — at
100 TB you page the violation COUNT to a dashboard and drill down with a
targeted query, you don't materialize the violating rows by default.

Scale shapes:
- not-null / accepted-values / range: map-side conditional count, one
  partial-agg shuffle of ONE row per partition.
- uniqueness: groupBy(keys) count>1 — one shuffle on the keys (the same
  shuffle a dedup would pay; at scale run it on the merge keys you already
  cluster by).
- referential integrity: child left-anti parent on the FK — broadcastable
  when the parent is a dim; count of orphans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(check: str, table_name: str, violations: Column, df: DataFrame) -> DataFrame:
    return df.agg(violations.cast("bigint").alias("violations")).select(
        F.lit(check).alias("check"),
        F.lit(table_name).alias("table_name"),
        "violations",
    )


def check_not_null(df: DataFrame, table_name: str, cols: list[str]) -> DataFrame:
    """Rows where ANY of ``cols`` is null."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return _one(
        f"not_null({','.join(cols)})",
        table_name,
        F.count(F.when(cond, F.lit(1))),
        df,
    )


def check_unique(df: DataFrame, table_name: str, keys: list[str]) -> DataFrame:
    """Rows beyond the first per key tuple (0 = keys are unique)."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") - 1).alias("extra"))
        .select(F.coalesce(F.col("extra"), F.lit(0)).alias("extra"))
    )
    return dups.select(
        F.lit(f"unique({','.join(keys)})").alias("check"),
        F.lit(table_name).alias("table_name"),
        F.col("extra").cast("bigint").alias("violations"),
    )


def check_referential(
    child: DataFrame,
    table_name: str,
    fk: str,
    parent: DataFrame,
    pk: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose non-null FK has no matching parent PK (orphans)."""
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.filter(F.col(fk).isNotNull()).join(keys, fk, "left_anti")
    return _one(f"ref({fk}->{pk})", table_name, F.count(F.lit(1)), orphans)


def check_accepted_values(
    df: DataFrame, table_name: str, col: str, allowed: list
) -> DataFrame:
    """Rows whose ``col`` is outside the allowed set (nulls violate too)."""
    bad = ~F.col(col).isin(allowed) | F.col(col).isNull()
    return _one(
        f"accepted_values({col})", table_name, F.count(F.when(bad, F.lit(1))), df
    )


def check_range(
    df: DataFrame, table_name: str, col: str, lo=None, hi=None
) -> DataFrame:
    """Non-null values outside [lo, hi]."""
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < F.lit(lo))
    if hi is not None:
        bad = bad | (c > F.lit(hi))
    return _one(
        f"range({col})", table_name, F.count(F.when(c.isNotNull() & bad, F.lit(1))), df
    )


def not_null_cond(cols: list[str]) -> tuple[str, Column]:
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return f"not_null({','.join(cols)})", cond


def accepted_values_cond(col: str, allowed: list) -> tuple[str, Column]:
    return (
        f"accepted_values({col})",
        ~F.col(col).isin(allowed) | F.col(col).isNull(),
    )


def range_cond(col: str, lo=None, hi=None) -> tuple[str, Column]:
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < F.lit(lo))
    if hi is not None:
        bad = bad | (c > F.lit(hi))
    return f"range({col})", c.isNotNull() & bad


def fused_row_checks(
    df: DataFrame, table_name: str, checks: list[tuple[str, Column]]
) -> DataFrame:
    """ALL row-level checks for one table in ONE scan — every check is a
    conditional count in a single aggregate, then the one result row
    explodes into report rows. At 100 TB this is the difference between N
    full table scans and one; only groupBy-shaped checks (uniqueness) still
    need their own pass."""
    aggs = [
        F.count(F.when(cond, F.lit(1))).cast("bigint").alias(f"_c{i}")
        for i, (_, cond) in enumerate(checks)
    ]
    packed = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"), F.col(f"_c{i}").alias("violations")
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return (
        df.agg(*aggs)
        .select(F.explode(packed).alias("e"))
        .select(
            F.col("e.check").alias("check"),
            F.lit(table_name).alias("table_name"),
            F.col("e.violations").alias("violations"),
        )
    )


def fused_table_checks(
    df: DataFrame,
    table_name: str,
    row_checks: list[tuple[str, Column]] | None = None,
    unique_keys: list[str] | None = None,
    refs: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """EVERY check for one table in ONE scan — row-level conditional
    counts, the uniqueness check, and referential-integrity orphan counts
    all ride a single pass over ``df``.

    How each family fuses (results identical to the standalone checks):

    - row-level (``row_checks``, as for :func:`fused_row_checks`): a
      conditional count per check. Summing per-group counts over the
      uniqueness grain equals the whole-table count (the groups partition
      the rows).
    - uniqueness (``unique_keys``): the groupBy this check needs anyway
      becomes the single exchange of the whole report; every other count
      re-aggregates from its grain.
    - referential integrity (``refs`` = ``(fk, parent_keys, check_name)``
      with ``parent_keys`` a one-column frame of parent PK values): instead
      of one left-anti join + count per FK (a separate child scan each),
      LEFT-join the distinct parent keys (broadcast — they are dim-sized)
      with a presence marker and count ``fk IS NOT NULL AND marker IS
      NULL``. Join keys are distinct so cardinality is unchanged and the
      orphan count is exactly the anti-join count.

    At 100 TB this turns 1 + |refs| + (1 if unique) fact-table scans into
    one; the parent sides are only ever scanned for their key column.
    Without ``unique_keys`` the plan is a pure map-side aggregation (one
    one-row exchange), with them it is the same single exchange the
    uniqueness check alone would pay."""
    row_checks = row_checks or []
    refs = refs or []
    joined = df
    markers: list[tuple[str, Column]] = []
    for i, (fk, parent_keys, check_name) in enumerate(refs):
        m = f"_dq_m{i}"
        pk_col = parent_keys.columns[0]
        keys = (
            parent_keys.select(F.col(pk_col).alias(fk))
            .distinct()
            .select(fk, F.lit(1).alias(m))
        )
        joined = joined.join(F.broadcast(keys), fk, "left")
        markers.append(
            (check_name, F.col(fk).isNotNull() & F.col(m).isNull())
        )
    conds = [(name, cond) for name, cond in row_checks] + markers
    aggs = [
        F.count(F.when(cond, F.lit(1))).cast("bigint").alias(f"_c{i}")
        for i, (_, cond) in enumerate(conds)
    ]
    if unique_keys:
        grain = joined.groupBy(*unique_keys).agg(
            F.count(F.lit(1)).alias("_n"), *aggs
        )
        aggs_total = [
            F.sum(F.col(f"_c{i}")).cast("bigint").alias(f"_c{i}")
            for i in range(len(conds))
        ]
        one = grain.agg(
            F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
            .cast("bigint")
            .alias("_uq"),
            *aggs_total,
        )
        names = [name for name, _ in conds]
        packed = F.array(
            *[
                F.struct(
                    F.lit(name).alias("check"), F.col(f"_c{i}").alias("violations")
                )
                for i, name in enumerate(names)
            ],
            F.struct(
                F.lit(f"unique({','.join(unique_keys)})").alias("check"),
                F.col("_uq").alias("violations"),
            ),
        )
    else:
        one = joined.agg(*aggs)
        packed = F.array(
            *[
                F.struct(
                    F.lit(name).alias("check"), F.col(f"_c{i}").alias("violations")
                )
                for i, (name, _) in enumerate(conds)
            ]
        )
    return one.select(F.explode(packed).alias("e")).select(
        F.col("e.check").alias("check"),
        F.lit(table_name).alias("table_name"),
        F.col("e.violations").alias("violations"),
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into the violations report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
