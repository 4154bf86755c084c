"""Mergeable-sketch operators with oracle-portable determinism.

The built-in ``approx_count_distinct`` (HLL++) is the right default on a
cluster, but its sketch is engine-specific — no external system can
reproduce the estimate, so it can only ever be rows-checked. The KMV
(k-minimum-values) sketch here is the portable alternative: the hash is
the engine's shared 60-bit md5 prefix (`operators/dedup.py` portable
mode), so DuckDB rebuilds the identical sketch and the differential
harness hash-matches the *estimate itself*, not just row counts.

Reference parity note: the reference has no sketch layer (its distinct
counts are exact, `fact_kpi_detalle.py` COUNT DISTINCT style); this module
is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# hashes are 60-bit md5 prefixes: uniform on [0, 2^60)
_HASH_SPACE = float(2**60)


def portable_hash60(col: Column) -> Column:
    """Shared 60-bit hash (15 md5 hex digits — exact in long): the same
    construction every portable-mode sketch in this engine uses, bit-equal
    to DuckDB's shift-sum twin."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    assume_distinct: bool = False,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via the k-minimum-values
    sketch: keep the k smallest distinct hash values per group; if the
    sketch saturated, the k-th smallest hash at fraction f of the hash
    space estimates (k-1)/f distinct values; an unsaturated sketch IS the
    exact count.

    Output: group cols + ``n_kept`` (sketch fill), ``kth_hash`` (the
    sketch boundary), ``kmv_estimate``.

    Scale shape: one distinct shuffle on (group, value) then one bounded
    window shuffle on the group key — per-group state after the filter is
    ≤ k rows regardless of cardinality, which is the point: the sketch
    (k longs) is what a 1000-executor rollup ships per group, not the
    value set. The two shuffles share the group-key partitioning. KMV
    sketches are also trivially mergeable (union the hash sets, re-take
    the k smallest) — re-aggregation to coarser groups never rescans.

    ``assume_distinct=True`` skips the internal (group, value) distinct —
    for callers that already hold the distinct grain (e.g. a query whose
    exact-count twin shares it), avoiding a redundant exchange; the sketch
    itself is duplicate-insensitive either way (top-k over hashes)."""
    vals = df.select(*group_cols, F.col(value_col).alias("_v"))
    if not assume_distinct:
        vals = vals.distinct()
    hashed = vals.withColumn("_h", portable_hash60(F.col("_v")))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_h").asc(), F.col("_v").asc()
    )
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(_HASH_SPACE))
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.max("_h").alias("kth_hash"),
        )
        .withColumn("kmv_estimate", F.round(est, 4))
    )


def hll_alpha(m: int) -> float:
    """Flajolet's bias-correction constant for m ≥ 128."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    assume_distinct: bool = False,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via a REAL HyperLogLog
    (Flajolet et al. 2007) built on the portable hash, so — unlike the
    engine-opaque ``approx_count_distinct`` sketch — DuckDB reproduces the
    registers and the ESTIMATE hash-matches in the differential harness.

    Register math is kept integer-exact so partition order cannot perturb
    the result: the harmonic denominator Σ 2^(−M_j) is computed as the
    INTEGER Σ 2^(53−M_j) (every term and the sum fit in int64), divided
    once at the end. Relative standard error ≈ 1.04/√m (m = 2^p; 6.5%
    at the default p=8). Small-range linear counting applies below 2.5·m
    with empty registers.

    Scale shape: two partial-aggregating shuffles — (group, bucket) max
    then group sum — with state m registers per group, CONSTANT in the
    number of distinct values (the entire point vs KMV's k rows is that m
    never grows and registers merge by max, so re-aggregation to coarser
    groups is a max over registers).

    ``assume_distinct=True`` skips the internal (group, value) distinct —
    registers merge by max, so duplicates never change the estimate; the
    distinct exists only to shrink the register-aggregation input, and a
    caller already holding the distinct grain saves that exchange."""
    regs = hll_registers(df, group_cols, value_col, p, assume_distinct)
    return hll_estimate_from_registers(regs, group_cols, p)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    assume_distinct: bool = False,
) -> DataFrame:
    """The per-group HLL register state: ``group_cols + (_bucket, _reg)``
    rows, one per NON-EMPTY register (≤ 2^p per group). This is the
    mergeable representation — two register sets merge by
    ``groupBy(group, _bucket).max(_reg)``, which is what incremental view
    maintenance persists between change-feed applications
    (`operators/incremental.py`)."""
    m = 1 << p
    vals = df.select(*group_cols, F.col(value_col).alias("_v"))
    if not assume_distinct:
        vals = vals.distinct()
    hashed = vals.withColumn("_h", portable_hash60(F.col("_v")))
    # bucket = low p bits; rho = leading-zero rank of the remaining 60−p
    # bits + 1 (conv-to-binary length is an exact integer bit_length)
    w = F.shiftright(F.col("_h"), p)
    rho = F.when(
        w > 0, F.lit(61 - p) - F.length(F.conv(w, 10, 2))
    ).otherwise(F.lit(61 - p)).cast("int")
    return (
        hashed.select(
            *group_cols,
            F.col("_h").bitwiseAND(m - 1).alias("_bucket"),
            rho.alias("_rho"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_reg"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Estimate from a :func:`hll_registers` state — the second stage of
    :func:`hll_distinct`, exposed so maintained register state produces
    estimates identical to a recompute."""
    m = 1 << p
    rmax = 61 - p  # max register value; scale exponent keeps shifts ≥ 0
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - _reg)")).alias("_s_int"),
        F.count(F.lit(1)).cast("long").alias("_present"),
    )
    denom_int = (
        (F.lit(m).cast("long") - F.col("_present"))
        * F.lit(1 << rmax).cast("long")
        + F.col("_s_int")
    )
    raw = (
        F.lit(hll_alpha(m) * m * m * float(1 << rmax)) / denom_int.cast("double")
    )
    zeros = F.lit(m).cast("long") - F.col("_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("_present").alias("hll_buckets_used"),
        F.round(est, 4).alias("hll_estimate"),
    )
