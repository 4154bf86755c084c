"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Column functions (JVM-side, codegen);
no Python UDFs. Designed over the ``documents`` table
(doc_id, text, lang, source, n_chars) but parameterized by column name.

Operators: normalization, tokenization + token counting (whitespace and a
BPE-ish regex), quality scoring (length/punct/stopword ratios), language ID
(stopword-hit heuristic), document fingerprinting (md5 whole-doc + min-shingle
fingerprint — md5 keeps the fingerprints engine-portable for differential
testing), repetition signals and chunking.

The quality/repetition rule shapes follow the public corpus-curation
literature: C4's heuristic filters (Raffel et al., "Exploring the limits of
transfer learning with a unified text-to-text transformer", JMLR 2020 §2.2)
and Gopher's repetition/quality rules (Rae et al., "Scaling language
models: methods, analysis & insights from training Gopher", 2021, App. A).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .expr import let
from ..core.barrier import shared_barrier

# A BPE-ish tokenizer regex: word pieces, numbers, or single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}


def normalize(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    t = normalize(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: word pieces + numbers + punctuation marks."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def quality_features(col: Column) -> dict[str, Column]:
    """Raw quality signals: char length, token count, mean token length,
    punctuation ratio, uppercase ratio, English stopword ratio."""
    n_chars = F.length(col)
    n_tokens = token_count(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(col, F.lit(r"[A-Z]"), 0))
    toks = tokens(col)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, sw))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))),
        "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
        "upper_ratio": (n_upper.cast("double") / F.greatest(n_chars, F.lit(1))),
        "stopword_hits": n_stop,
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score from the raw signals — a simple,
    deterministic linear blend (document-filtering heuristic in the style of
    C4/Gopher rules: enough tokens, sane token length, not punctuation soup).

    The token count is let-bound so the tokenization pipeline runs once per
    row (the naive composition re-evaluates it per referencing signal).
    """

    def build(nt: Column) -> Column:
        n_chars = F.length(col)
        mtl = n_chars.cast("double") / F.greatest(nt, F.lit(1).cast("bigint"))
        n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
        pr = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
        len_ok = F.least(nt.cast("double") / F.lit(20.0), F.lit(1.0))
        tok_ok = F.when((mtl >= 3) & (mtl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
        punct_ok = F.when(pr <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
        return F.round((len_ok + tok_ok + punct_ok) / F.lit(3.0), 6)

    return let(token_count(col).cast("bigint"), build)


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of tokens that hit the ``lang`` stopword list (with
    multiplicity) — the language-ID signal."""
    toks = tokens(col)
    sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits across the registered
    languages; ties and zero hits → 'und'. Deterministic (tie-break by
    language code order).

    Tokenization runs ONCE per row (let-bound), and the per-language hit
    counts are materialized into a bound array before the argmax ladder —
    the naive form re-tokenizes per language and the when-ladder then
    duplicates those subtrees (~8 full tokenizations per row, ~7× slower
    measured at sf0.1)."""
    langs = sorted(STOPWORDS)

    def hits_in(toks: Column, lang: str) -> Column:
        sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda tk: F.array_contains(sw, tk)))

    def count_hits(toks: Column) -> Column:
        return F.array(*[hits_in(toks, lang) for lang in langs])

    def pick(hs: Column) -> Column:
        best = F.lit(langs[0])
        best_h = F.element_at(hs, 1)
        for i, lang in enumerate(langs[1:], start=2):
            h = F.element_at(hs, i)
            take = h > best_h
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_h = F.when(take, h).otherwise(best_h)
        return F.when(best_h > 0, best).otherwise(F.lit("und"))

    return let(let(tokens(col), count_hits), pick)


def shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles (array<string>) of the normalized text; documents
    shorter than k words yield a single whole-text shingle.

    Built as a zip_with chain over k shifted slices of the (let-bound) token
    array: O(k) array passes per row. The naive
    ``transform(sequence, i -> concat_ws(slice(toks, i+1, k)))`` form
    re-evaluates the tokenization per shingle (HOF lambdas re-run captured
    subtrees per element) — ~10× slower.
    """

    def build(toks: Column) -> Column:
        n = F.size(toks)
        m = n - (k - 1)
        sh = F.slice(toks, 1, m)
        for i in range(1, k):
            sh = F.zip_with(
                sh, F.slice(toks, i + 1, m), lambda a, b: F.concat_ws(" ", a, b)
            )
        return F.when(n <= k, F.array(F.concat_ws(" ", toks))).otherwise(sh)

    return let(tokens(col), build)


def line_stats(col: Column) -> Column:
    """struct(n_lines, n_distinct_lines) over the document's non-empty
    lines — the raw material for Gopher-style repetition filters
    (``dup_line_fraction = 1 - distinct/total``). Pure Column expressions
    over one let-bound split; no shuffle, no UDF."""

    def build(ls: Column) -> Column:
        return F.struct(
            F.size(ls).alias("n_lines"),
            F.size(F.array_distinct(ls)).alias("n_distinct_lines"),
        )

    return let(
        F.filter(F.split(col, "\n"), lambda l: F.trim(l) != ""), build
    )


def repetition_stats(col: Column, k: int = 2) -> Column:
    """``struct(top, n)`` — count of the most frequent k-shingle and the
    total shingle count of ONE document, via an Arrow kernel over the
    JVM-built shingle array (``operators._vectorized.
    make_repetition_stats_udf``). Row-local by construction: the metric
    depends only on the document's own array, so no explode, no shuffle —
    the exploded groupBy staging it replaces shuffled the entire token
    stream twice (guide §8: decide per-row facts without moving the
    corpus)."""
    from ._vectorized import make_repetition_stats_udf

    return make_repetition_stats_udf()(shingles(col, k))


def chunk_tokens(col: Column, size: int, stride: int) -> Column:
    """Overlapping token-window chunks for long-document splitting:
    array<struct(start, n_tokens, chunk)> with window ``size`` and step
    ``stride`` over the whitespace tokens. Chunk count is the standard
    ``ceil(max(n - size, 0) / stride) + 1`` (always ≥ 1; the last window
    may be short). Pure integer arithmetic + array slices per row — no
    shuffle, no UDF; the chunk explosion happens in the caller so Spark
    sizes partitions on the EXPLODED rows (a chunk array of a 1M-token doc
    is fine, 1M one-row-per-chunk inputs are finer)."""

    def build(tk: Column) -> Column:
        n = F.size(tk)
        n_chunks = (
            F.floor(
                (F.greatest(n - size, F.lit(0)) + F.lit(stride - 1)) / F.lit(stride)
            )
            + 1
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: let(
                (i * stride).cast("int"),
                lambda s: F.struct(
                    s.alias("start"),
                    F.least(F.lit(size), n - s).alias("n_tokens"),
                    F.concat_ws(" ", F.slice(tk, s + 1, size)).alias("chunk"),
                ),
            ),
        )

    return let(tokens(col), build)


def fingerprint(col: Column) -> Column:
    """Whole-document fingerprint: md5 of normalized text (content hash;
    md5 chosen for engine portability in differential tests)."""
    return F.md5(normalize(col))


def min_shingle_fingerprint(col: Column, k: int = 3) -> Column:
    """Robust fingerprint: lexicographic min of shingle md5s — a 1-hash
    MinHash; stable under small edits away from the minimal shingle."""
    return F.array_min(F.transform(shingles(col, k), F.md5))


# --------------------------------------------------------------------------
# Vocabulary, keyword extraction, and hashed linear quality scoring.

# Knuth's multiplicative constant — spreads small bucket indices over the
# weight range; products stay < 2^42 so the arithmetic is exact BIGINT in
# any engine.
_KNUTH = 2654435761


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-token corpus stats: ``(tok, tf, df)`` — total occurrences and
    document frequency. One shuffle to the (doc, token) grain (which also
    dedups for df), one tiny shuffle over the vocabulary."""
    per_doc = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return per_doc.groupBy("tok").agg(
        F.sum("tf").alias("tf"), F.count(F.lit(1)).alias("df")
    )


def vocab_topk(df: DataFrame, n: int = 100, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``n`` corpus vocabulary with dense ids: ``(vocab_id, tok, tf,
    df)`` ordered by total frequency (token string breaks ties — total
    order, deterministic cutoff). The global sort is a TakeOrdered over the
    *aggregated* vocabulary (|vocab| rows, not corpus rows); the ranking
    window runs on the n surviving rows only."""
    top = token_stats(df, text_col, id_col).orderBy(
        F.desc("tf"), F.asc("tok")
    ).limit(n)
    w = Window.orderBy(F.desc("tf"), F.asc("tok"))
    return top.select(
        F.row_number().over(w).alias("vocab_id"), "tok", "tf", "df"
    )


def tfidf_keywords(
    df: DataFrame, top_per_doc: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keyword extraction: top tokens by a tf/df relevance
    score (term frequency damped by corpus document frequency).

    The score is ``tf / (1 + df)`` — the RATIONAL cousin of tf-idf, chosen
    over ``tf·ln(N/df)`` deliberately: IEEE division of small integers is
    exactly rounded and bit-identical across engines, while ``ln`` is only
    accurate to ~1 ulp and engine-dependent, which would make differential
    hash comparison flaky. Ranking (score desc, token asc) is therefore a
    total, engine-portable order.

    Plan: one shuffle to (doc, token), vocabulary df re-aggregated from
    that grain and broadcast back, per-doc ranking window rides the
    existing (doc, token) partitioning. ``per_doc`` has TWO consumers
    (the df re-aggregation and the score join) and AQE does not reuse
    the exchange across them, so the tokenize+explode+partial-agg
    pipeline would run twice — the lazy localCheckpoint materializes it
    once (measured −25% CPU at sf0.1)."""
    per_doc = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(shared_barrier)
    )
    dfreq = per_doc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = per_doc.join(F.broadcast(dfreq), "tok").withColumn(
        "score", F.round(F.col("tf") / (F.lit(1) + F.col("df")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_per_doc)
        .select(id_col, "rank", "tok", "tf", "df", "score")
    )


def rarity_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-informed per-document RARITY score — the engine's
    perplexity-filtering analogue: each distinct token scores
    ``N_docs / (1 + df)`` (inverse document frequency in RATIONAL form —
    ln-free for the same engine-exactness reason as ``tfidf_keywords``),
    and a document reports the mean and max over its token types. Both
    tails are filter candidates, exactly like LM-perplexity filtering:
    high mean = jargon/garbage-heavy, low mean = stopword soup.

    Exactness: per-token scores are 6dp-rounded doubles (one IEEE
    division); the per-doc mean is computed ENTIRELY in integers — the
    exact decimal(38,6) sum's scaled integer S (millionths), then
    round-half-up(S/n) as ``(2S + n) div 2n`` — because a final
    ``ROUND(double, 6)`` is NOT engine-portable (the two engines' double
    rounding can differ by the 6th decimal at half-ulp boundaries;
    observed at sf0.1). The only float op on the mean is one exact
    division by 10^6 at the end — bit-identical everywhere.

    Plan: explode → (doc, token) agg; df re-aggregated from that grain and
    broadcast back with the scalar doc count; one final per-doc agg. Two
    data shuffles; vocabulary and the scalar ride broadcasts. ``per_doc``
    feeds both the df re-aggregation and the score join — same
    two-consumer shape as ``tfidf_keywords``, so the lazy localCheckpoint
    keeps the tokenize pipeline single-run."""
    per_doc = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(shared_barrier)
    )
    dfreq = per_doc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(
        F.countDistinct(F.col(id_col)).alias("_n_docs")
    )
    scored = (
        per_doc.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            F.round(
                F.col("_n_docs").cast("double") / (F.lit(1) + F.col("df")), 6
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (F.sum(F.col("_score").cast("decimal(38,6)")) * F.lit(1000000))
        .cast("long")
        .alias("_s_e6"),
        F.max("_score").alias("max_rarity"),
    )
    mean_e6 = F.expr("(2 * _s_e6 + n_types) div (2 * n_types)")
    return agg.select(
        id_col,
        "n_types",
        (mean_e6.cast("double") / F.lit(1000000.0)).alias("mean_rarity"),
        "max_rarity",
    )


def hashed_linear_score(
    col: Column, n_buckets: int = 1024
) -> Column:
    """fastText-style hashed linear model margin, shuffle-free.

    Each token hashes (portable 60-bit md5 prefix) into one of
    ``n_buckets`` feature buckets; bucket ``j`` carries the deterministic
    weight ``((j·_KNUTH) mod 1000 − 500) / 1000`` — a fixed pseudo-random
    model standing in for trained weights (swap in a real weight table via
    :func:`hashed_linear_score_from_weights` semantics without changing the
    plan shape). The margin is the integer weight sum divided once at the
    end, so it is exact and engine-portable. Pure per-row Column
    expression: the corpus never shuffles and never leaves the JVM."""

    def weight(tok: Column) -> Column:
        bucket = F.pmod(
            F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        )
        return F.pmod(bucket * F.lit(_KNUTH), F.lit(1000)) - F.lit(500)

    total = F.aggregate(
        F.filter(tokens(col), lambda t: t != ""),
        F.lit(0).cast("long"),
        lambda acc, t: acc + weight(t),
    )
    return total / F.lit(1000.0)


# --------------------------------------------------------------------------
# PII detection / redaction (C4-style corpus scrubbing).

# Patterns restricted to the syntax subset Java regex and RE2 share (no
# backrefs, no lookaround) so the DuckDB oracle applies the IDENTICAL
# patterns. Order matters: email before phone (an email's digits must not
# be half-eaten by the phone pass).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?", "<PHONE>"),
    ("idnum", r"\b[0-9]{9,}\b", "<ID>"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts — pure Column expressions, shuffle-free."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact(col: Column) -> Column:
    """Redact all PII patterns (in declaration order) with typed tokens."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out
