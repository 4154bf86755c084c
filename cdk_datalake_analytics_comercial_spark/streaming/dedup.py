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
