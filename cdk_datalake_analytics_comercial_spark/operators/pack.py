"""Sequence packing: assign documents to fixed-token-budget bins (context
windows) for LLM training-data preparation.

A training pipeline concatenates documents into fixed-size model contexts
(e.g. 2048/8192 tokens); the packing step decides which documents land in
which context. This operator implements deterministic *offset packing*: lay
the documents end-to-end in a defined order and cut every ``budget`` tokens —
``bin_id = floor(start_offset / budget)`` where ``start_offset`` is the
cumulative token count of all preceding documents. A document whose tokens
straddle a cut belongs to the bin where it starts (the trainer splits or
pads at read time); the assignment is a pure function of (order, token
counts), so it is reproducible across engines and reruns.

Scale design (100 TB):
- The cumulative sum runs as ONE window per stratum
  (``Window.partitionBy(strata).orderBy(order)``) — a single shuffle on the
  stratum key, and each stratum sorts independently. Stratifying by
  (lang, source) — how training mixtures are defined anyway — keeps every
  partition's sort bounded; this is the intended cluster shape.
- An UNSTRATIFIED call is a single global window partition — the classic
  scale anti-pattern (every row through one task). The operator therefore
  *requires* strata; for a truly global stream, do the standard two-pass
  prefix sum instead: per-partition token totals (tiny: one row per
  partition) → driver-side exclusive scan → broadcast the per-partition
  base offsets back and cumsum within partitions. The strata version covers
  every mixture-defined corpus without that machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    strata: list[str],
) -> DataFrame:
    """Add ``bin_id`` and ``bin_offset`` columns: the context-window index
    and the document's token offset inside it, packing in ``order_col``
    order independently per stratum.

    ``order_col`` must be unique within a stratum (document ids are) —
    ties would make the cumulative sum nondeterministic.
    """
    if not strata:
        raise ValueError(
            "pack_sequences requires strata; a global window does not scale "
            "(see module docstring for the two-pass global alternative)"
        )
    w = (
        Window.partitionBy(*strata)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("_start", start)
        .withColumn(
            "bin_id",
            F.floor(F.col("_start") / F.lit(budget)).cast("bigint"),
        )
        .withColumn("bin_offset", F.pmod(F.col("_start"), F.lit(budget)).cast("bigint"))
        .drop("_start")
    )
