"""Benchmark decontamination: n-gram overlap between a training corpus and
a held-out evaluation/benchmark set.

The standard LLM-corpus hygiene step (GPT-3, Brown et al. 2020, App. C;
"The Pile", Gao et al. 2021 §6; Llama 2, Touvron et al. 2023 §A.6): any
training document sharing a k-token shingle with the benchmark text is
flagged (and usually dropped) so eval scores measure generalization, not
memorization. k = 13 is the literature default for natural text; short-doc
corpora want smaller k.

Scale design (the 100 TB story):
- The benchmark side is SMALL by construction (eval sets are MBs, the
  corpus is TBs) — its distinct shingle-key set is broadcast, so the
  corpus-side semi-join is map-side only and the corpus NEVER shuffles.
- Shingles are joined as 8-byte integer keys (``dedup.shingle_keys``:
  xxhash64 default, 60-bit md5 prefix in portable/oracle mode), not
  strings.
- Only HIT rows (corpus shingles that matched the benchmark set) reach the
  one ``groupBy(doc_id)`` shuffle; clean documents are filtered out
  map-side, so the shuffle volume is bounded by contamination, which is
  rare by definition. (``dedup.spread_rows`` may add a local raw-row
  exchange when the scan has fewer splits than cores — skipped by its own
  contract at cluster scale, where the corpus still never shuffles.)
- ``decontaminate`` removes flagged docs with a broadcast left-anti join —
  again no corpus shuffle.

Reference parity note: the reference engine has no decontamination
operator; this is part of the training-data extension surface
(SURVEY §7.1 step 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from . import text as T


def benchmark_shingle_set(
    bench: DataFrame,
    text_col: str = "text",
    k: int = 13,
    portable: bool = False,
) -> DataFrame:
    """Distinct shingle keys of the benchmark set — one column ``s`` (long).

    One shuffle over the (small) benchmark side only; the result is the
    broadcast build side for :func:`contamination_overlap`.
    """
    # hash AFTER the explode over distinct shingle strings (flat codegen'd
    # Project, dedup.shingle_key_of) rather than per-element inside the
    # interpreted transform — identical key set, see exploded_shingle_keys
    return (
        bench.select(
            F.explode(
                F.array_distinct(T.shingles(F.col(text_col), k))
            ).alias("_t")
        )
        .select(dedup.shingle_key_of(F.col("_t"), portable).alias("s"))
        .distinct()
    )


def contamination_overlap(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    portable: bool = False,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document overlap stats against the benchmark shingle set.

    Returns one row per CONTAMINATED document (≥ 1 shingle shared with the
    benchmark): ``(id_col, n_shingles, n_hit, contamination)`` where
    ``n_hit`` counts the document's distinct shingles present in the
    benchmark set and ``contamination = n_hit / n_shingles``. Documents
    with zero overlap produce no row — at corpus scale the clean set is
    ~everything, and emitting it would turn a tiny result into a
    corpus-sized one; recover it with :func:`decontaminate` or an anti-join.
    """
    bench_sh = benchmark_shingle_set(bench, text_col, k, portable)
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)

    doc_sh = dedup.exploded_shingle_keys(
        docs, text_col, id_col, k, portable
    ).select(
        F.col("id").alias(id_col),
        F.col("n").alias("n_shingles"),
        "s",
    )

    hits = doc_sh.join(bench_sh, "s", "left_semi")
    return (
        hits.groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("contamination"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    max_contamination: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """The clean corpus: drop documents whose contamination exceeds
    ``max_contamination`` (default: any overlap at all drops the doc,
    the GPT-3 policy). Flagged ids are a tiny set → broadcast anti-join,
    corpus stays unshuffled."""
    flagged = contamination_overlap(
        docs, bench, text_col, id_col, k, portable
    ).filter(F.col("contamination") > max_contamination)
    return docs.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )
