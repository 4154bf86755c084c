"""Streaming dedup-on-ingest: exact-duplicate suppression for a document
stream, the incremental twin of ``operators.dedup.exact_dedup``.

A training-data ingest pipeline dedups continuously, not per-batch: the
stream carries (id, text, event-time), each document is fingerprinted with
the SAME normalized-content hash the batch operator uses
(``operators.text.fingerprint``), and duplicates are dropped with
``dropDuplicatesWithinWatermark`` — Spark keeps one state row per distinct
fingerprint seen inside the watermark horizon and emits only the first
arrival.

Scale notes (100 TB/day ingest):
- State is keyed by the 128-bit fingerprint and bounded by the watermark
  horizon (exact global dedup over an unbounded stream is impossible with
  bounded state — the horizon IS the dedup window; a nightly batch
  ``exact_dedup`` over the landed table closes the long-range tail).
- The state store partitions on the fingerprint hash — uniform by
  construction, no skew even when one document floods the stream (its
  duplicates all hit one partition, but they reduce to ONE state row).
- The builders take batch or streaming frames alike, so the availableNow ≡
  batch equivalence tests of ``tests/test_streaming.py`` apply — with the
  caveat that batch ``dropDuplicates`` keeps an arbitrary member per group
  while the stream keeps the FIRST arrival; the equivalence is on the
  surviving fingerprint set, which is what dedup guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import text as T
from .windows import with_event_time


def fingerprinted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the batch-identical normalized-content fingerprint."""
    from pyspark.sql import functions as F

    return df.withColumn("fp", T.fingerprint(F.col(text_col)))


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup within the watermark horizon.

    Streaming: ``dropDuplicatesWithinWatermark`` evicts fingerprint state
    once the watermark passes it. Batch frames take the plain
    ``dropDuplicates`` path (same surviving-fingerprint semantics) so one
    builder serves both sides of the equivalence test.
    """
    e = fingerprinted(with_event_time(df, ts_col), text_col)
    if e.isStreaming:
        return e.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
            ["fp"]
        )
    return e.dropDuplicates(["fp"])


def near_dedup_ingest(
    stream: DataFrame,
    survivors_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous NEAR-duplicate dedup on ingest: each micro-batch is
    MinHash-sketched once, probed against the txlog fingerprint index at
    ``index_path`` via :func:`operators.dedup.minhash_dedup_incremental`,
    and the surviving documents + their fingerprints land in two txlog
    tables. History always wins; the index never recomputes.

    Delivery semantics (exactly-once-in-effect under at-least-once
    replay): both tables are written with ``tx_merge`` on the document id
    — idempotent per batch — and the index probe EXCLUDES rows whose ids
    are in the incoming batch, so a replayed batch sees exactly the index
    its first run saw (its own fingerprints, committed by the interrupted
    attempt, cannot make replayed documents self-match or shadow their
    in-batch comparisons). Either table committing before a crash
    therefore converges on restart.

    Scale notes: state lives in the index table, not the state store —
    the stream itself is stateless and restarts cheaply; the per-batch
    cost is one sketch pass over the batch plus a band-bucket probe join
    against the index (broadcastable batch side). Unlike the watermark-
    bounded exact :func:`dedup_stream`, the horizon here is the whole
    indexed history."""
    from ..operators.dedup import minhash_dedup_incremental
    from ..sources.txlog import current_version, tx_merge, tx_read

    from pyspark.sql import functions as F

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        idx = None
        if current_version(spark, index_path) is not None:
            idx = tx_read(spark, index_path).join(
                batch.select(F.col(id_col).alias("id")).distinct(),
                "id",
                "left_anti",
            )
        surv, rows = minhash_dedup_incremental(
            batch, idx, text_col, id_col,
            threshold=threshold, num_hashes=num_hashes, bands=bands, k=k,
        )
        tx_merge(spark, surv, survivors_path, [id_col])
        tx_merge(spark, rows, index_path, ["id"])

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
