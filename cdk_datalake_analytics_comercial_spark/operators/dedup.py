"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Sketch lineage (public literature): MinHash resemblance sketches and banded
LSH follow Broder, "On the resemblance and containment of documents" (1997)
and the banding analysis in Leskovec/Rajaraman/Ullman, *Mining of Massive
Datasets* ch. 3; SimHash per Charikar, "Similarity estimation techniques
from rounding algorithms" (STOC 2002) with the pigeonhole band rotation of
Manku/Jain/Sarma, "Detecting near-duplicates for web crawling" (WWW 2007);
corpus-scale near-dedup motivation per Lee et al., "Deduplicating training
data makes language models better" (ACL 2022).

Scale design: every variant is expressed as DataFrame ops whose shuffles are
bounded — candidate generation always goes through a *bucketing* key
(content hash, LSH band hash, SimHash prefix) so the quadratic verification
join only runs inside small buckets, never across the corpus. All sketch math
uses built-in higher-order functions (JVM-side); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as T
from ..core.barrier import shared_barrier

# Mersenne prime modulus for the universal-hash family h_i(x) = (a_i x + b_i)
# mod p. 2^31-1 keeps every product a*x < 2^62 — exact in long arithmetic, no
# decimal intermediates (~50× cheaper per op, and higher-order functions run
# interpreted, so per-op cost matters).
_MERSENNE_P = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a simple LCG (no RNG imports; stable
    across runs and engines)."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        a = state % (_MERSENNE_P - 1) + 1
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def shingle_keys(col: Column, k: int = 3, portable: bool = False) -> Column:
    """Full-width shingle keys for inverted-index joins.

    Unlike :func:`shingle_hashes` (31-bit, constrained to the universal-hash
    domain the MinHash params need), posting keys only need WIDTH: raw
    xxhash64 (64-bit) by default, the 60-bit md5 prefix in portable mode —
    collision probability ≈ |vocab|²/2⁶⁰, i.e. zero at corpus scale, so
    set operations over the keys are exact in practice while the shuffle
    carries 8-byte longs instead of ~20-byte shingle strings (measured
    ~1.4× end-to-end on the Jaccard pair join at sf0.1)."""
    return F.transform(T.shingles(col, k), lambda s: shingle_key_of(s, portable))


def shingle_key_of(s: Column, portable: bool = False) -> Column:
    """Full-width key of ONE shingle string (the element function of
    :func:`shingle_keys`). Exposed flat so consumers that explode the
    shingle array can hash in a regular Project — whole-stage codegen —
    instead of per-element inside a higher-order ``transform``, which
    Spark always evaluates interpreted (measured 2.6× on the portable
    md5 path at sf0.1, guide §1.2 step 2 / §4.1: prefer codegen'd
    built-ins)."""
    if portable:
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return F.xxhash64(s)


def exploded_shingle_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """``(id, n, s)`` — one row per DISTINCT shingle per document, with the
    document's distinct-shingle count ``n`` riding along.

    Equivalent to exploding ``array_distinct(shingle_keys(...))`` but the
    hash runs AFTER the explode, over the distinct shingle *strings*, as a
    flat codegen'd Project (:func:`shingle_key_of`): hashing the distinct
    strings yields exactly the set of distinct hashes (a deterministic
    function maps equal inputs to equal outputs), so values, ``n``, and
    row count are identical — only the per-element interpreted-HOF cost is
    gone. The ``spread_rows`` exchange stays BELOW the projection so the
    hashing parallelizes over every core on small scan splits."""
    return (
        spread_rows(df, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(T.shingles(F.col(text_col), k)).alias("_ss"),
        )
        .select("id", F.size("_ss").alias("n"), F.explode("_ss").alias("_t"))
        .select("id", "n", shingle_key_of(F.col("_t"), portable).alias("s"))
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized content hash; keeps the min-id row per
    group. One shuffle on a 128-bit hash — no skew beyond true duplicates."""
    hashed = df.withColumn("_fp", T.fingerprint(F.col(text_col)))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """Sub-document (paragraph/line-level) exact dedup with positional
    reassembly — the CCNet/RefinedWeb pipeline stage that removes the
    boilerplate repeated ACROSS documents while keeping each document's
    unique remainder. This corpus has no line structure, so "paragraphs"
    are consecutive ``chunk_words``-word windows (the standard fallback
    for unstructured text).

    Per doc: tokenize → fixed windows → md5 fingerprint per chunk → keep
    the globally FIRST occurrence of each fingerprint (min (doc, position)
    — deterministic) → reassemble surviving chunks in document order.
    Docs whose every chunk was seen earlier vanish (fully-boilerplate).

    Scale shape: one shuffle on the 128-bit chunk fingerprint (first-wins
    needs a global group per fingerprint — irreducible for exact
    sub-document dedup) + one shuffle back on doc id for reassembly. No
    joins against the corpus, no skew beyond true boilerplate chunks (a
    hot chunk's group is exactly its duplication factor).

    Output: ``(id_col, clean_text, n_kept, n_dropped)``."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_words + 1, chunk_words), " "
        ),
    )
    exploded = df.select(
        F.col(id_col), n_chunks.alias("_n_chunks"), F.posexplode(chunks)
    ).select(
        id_col,
        "_n_chunks",
        F.col("pos").alias("_idx"),
        F.col("col").alias("_chunk"),
        F.md5(F.encode(F.col("col"), "utf-8")).alias("_fp"),
    )
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc(), F.col("_idx").asc())
    kept = exploded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_chunk"))),
                lambda s: s["_chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        (F.first("_n_chunks").cast("bigint") - F.count(F.lit(1))).alias(
            "n_dropped"
        ),
    )


def shingle_hashes(col: Column, k: int = 3, portable: bool = False) -> Column:
    """Shingles → stable integers in [0, 2^31-1).

    Default: xxhash64 (seed 42, native JVM) — deterministic across
    runs/partitions, ~10× cheaper per op than an md5+hex-parse. Sketches
    built on it are verified by exact Jaccard over the shingle *strings*, so
    the hash function never needs to be reproduced by another engine.

    ``portable=True``: first 60 bits of md5, mod the Mersenne prime — md5 is
    the cross-engine common denominator, so a SQL engine (the DuckDB oracle)
    can recompute the identical hash stream and therefore the identical
    MinHash/SimHash sketches. Slightly costlier per shingle; used by the
    oracle-checked query registry, while the xxhash64 path remains the
    cluster default."""
    if portable:
        def one(s: Column) -> Column:
            return F.pmod(
                F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
                F.lit(_MERSENNE_P),
            )
    else:
        def one(s: Column) -> Column:
            return F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))

    return F.transform(T.shingles(col, k), one)


def minhash_signature(col: Column, num_hashes: int = 64, k: int = 3) -> Column:
    """MinHash signature (array<long>) straight from a text column.

    NOTE: the outer ``transform`` evaluates its lambda once per hash
    function, and the shingle-hash subtree lives in the lambda body — so the
    md5 pipeline runs ``num_hashes`` times per row. Fine for one-off use;
    hot paths must materialize the hash array first and call
    :func:`minhash_signature_from_hashes` (what ``minhash_lsh_candidates``
    does)."""
    return minhash_signature_from_hashes(shingle_hashes(col, k), num_hashes)


def minhash_signature_from_hashes(hashes: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from a precomputed hash-array column: the (a, b)
    params ride as a literal array; per element it's two long ops and a mod —
    all JVM-side."""
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _hash_params(num_hashes)
        ]
    )
    return F.transform(
        params,
        lambda p: F.array_min(
            F.transform(hashes, lambda x: (x * p["a"] + p["b"]) % F.lit(_MERSENNE_P))
        ),
    )


def spread_rows(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition raw rows BEFORE a CPU-heavy projection so the per-row
    work (regex tokenize, md5, sketching) runs on every core, not on the
    scan's split count — a small corpus arrives as 1-2 parquet splits and
    would otherwise compute single-threaded (measured: the whole portable
    jaccard pipeline 2.75s → 1.9s at sf0.1 from this alone).

    The spread is SKIPPED when the scan already has at least
    ``defaultParallelism`` splits — at cluster scale a 100 TB corpus has
    thousands of splits and the extra raw-text shuffle would be pure cost.
    Projections must sit ABOVE the exchange (``spread_rows(df).select``,
    never ``df.select(...).repartition``) or the compute stays on the map
    side of the shuffle and the spread buys nothing."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(F.col(key_col))


def hashed_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, _h: array<long>) — distinct shingle hashes per doc, spread over
    the full core count (:func:`spread_rows` ahead of the projection).

    CAUTION for consumers: the hash pipeline lives in the projection, so a
    consumer that references ``_h`` repeatedly via *Column expressions*
    (``minhash_signature_from_hashes``, ``simhash_from_hashes``) must put
    its own barrier (``localCheckpoint``/cache) between, or Catalyst's
    CollapseProject inlines the whole pipeline per reference (10-60×
    measured). Every in-repo consumer reads ``_h`` exactly once (the Arrow
    kernels) or checkpoints first."""
    return spread_rows(df, id_col).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingle_hashes(F.col(text_col), k, portable)).alias("_h"),
    )


def minhash_signature_pandas(num_hashes: int = 64):
    """Vectorized MinHash signature as an Arrow-batched pandas UDF:
    ``array<long> hashes -> array<long> signature``.

    Bit-identical to :func:`minhash_signature_from_hashes` (same (a,b)
    params, same Mersenne modulus) but one numpy broadcast per batch instead
    of ``num_hashes`` interpreted array passes per row. The HOF variant
    stays for engine-portable contexts; this is the hot-path default.
    """
    from ._vectorized import make_minhash_sig_udf

    return make_minhash_sig_udf(_hash_params(num_hashes), _MERSENNE_P)


def fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """``(id, hs, sig)`` fingerprint rows for a corpus batch.

    Portable path: ONE fused Arrow kernel (``make_fingerprint_udf``)
    computes the md5 shingle hashes AND the MinHash signature per batch —
    the md5 previously ran per element inside an interpreted higher-order
    ``transform`` (guide §4.1/§4.2: hand whole batches to native code).
    Values are bit-identical to the Column pipeline (same hex-prefix
    arithmetic, same first-occurrence ``array_distinct`` over the hash
    values, same (a,b) signature params). Non-portable path keeps the
    JVM xxhash64 pipeline (cheap there, and xxhash64 is not reproducible
    in the Python worker)."""
    if not portable:
        hashed = hashed_shingles(df, text_col, id_col, k, portable)
        return hashed.select(
            "id",
            F.col("_h").alias("hs"),
            minhash_signature_pandas(num_hashes)(F.col("_h")).alias("sig"),
        )
    from ._vectorized import make_fingerprint_udf

    udf = make_fingerprint_udf(_hash_params(num_hashes), _MERSENNE_P)
    return (
        spread_rows(df, id_col)
        .select(
            F.col(id_col).alias("id"),
            T.shingles(F.col(text_col), k).alias("_ss"),
        )
        .select("id", udf(F.col("_ss")).alias("_fp"))
        .select(
            "id",
            F.col("_fp.hs").alias("hs"),
            F.col("_fp.sig").alias("sig"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    hashed: DataFrame | None = None,
    portable: bool = False,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over MinHash signatures.

    rows/bands = 4 → threshold ≈ (1/16)^(1/4) ≈ 0.5 Jaccard. Pipeline:
    signature → band hashes → explode → self-join per (band, hash) bucket →
    distinct pairs (id_a < id_b). The join key includes the band index so
    buckets stay small; the cross-corpus shuffle is on band-hash only.

    ``hashed`` (from :func:`hashed_shingles`) lets callers share the shingle
    pipeline with a verify stage; ``sig`` (an ``(id, sig)`` frame, e.g. from
    :func:`fingerprints`) skips signature computation entirely.
    ``portable=True`` buckets on the *raw*
    signature band (array<long> join key, exact — no murmur3 to reproduce)
    so a SQL oracle can rebuild the identical candidate set; the default
    hashes each band to a 4-byte key (smaller shuffle at cluster scale).
    """
    rows = num_hashes // bands
    if sig is None:
        if hashed is not None:
            sig = hashed.select(
                "id", minhash_signature_pandas(num_hashes)(F.col("_h")).alias("sig")
            )
        else:
            sig = fingerprints(
                df, text_col, id_col, num_hashes, k, portable
            ).select("id", "sig")
    if portable:
        band_key = lambda b: F.slice(F.col("sig"), b * rows + 1, rows)  # noqa: E731
    else:
        band_key = lambda b: F.hash(F.slice(F.col("sig"), b * rows + 1, rows))  # noqa: E731
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band", "band_hash"),
    )
    # materialize once: the self-join would otherwise evaluate the whole
    # signature pipeline twice (higher-order funcs run interpreted — costly).
    # Deliberately a SELF-JOIN, not a collect_set bucket-group: the banded
    # side is rows×bands surrogates (tiny next to the corpus), so AQE
    # broadcasts one side and the join costs no shuffle; measured 2× faster
    # than the bucket-group at sf0.1, and at cluster scale AQE flips the
    # same plan to a shuffle join keyed on (band, band_hash) which is the
    # bucket-group's shuffle anyway.
    banded = banded.transform(shared_barrier)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """MinHash LSH dedup: candidates → exact-Jaccard verify → drop the higher
    id of each confirmed pair (connected-components-lite: a row survives iff
    it is not the greater member of any duplicate pair).

    The shingle pipeline runs ONCE per doc: one materialized
    :func:`fingerprints` pass (fused hash+signature Arrow kernel on the
    portable path) feeds both the banding stage and the verify stage, where
    Jaccard is computed per candidate pair with ``array_intersect`` over the
    31-bit hash sets (collision error ≈ |shingles|²/2³¹ — negligible; the
    oracle-checked exact string variant is :func:`ngram_jaccard_pairs`).
    ``portable=True`` selects the md5-derived shingle hash + raw-band
    bucketing so the whole pipeline is reproducible in the DuckDB oracle."""
    fp = fingerprints(
        df, text_col, id_col, num_hashes, k, portable
    ).transform(shared_barrier)
    cand = minhash_lsh_candidates(
        df,
        text_col,
        id_col,
        num_hashes,
        bands,
        k,
        sig=fp.select("id", "sig"),
        portable=portable,
    )
    # verify per candidate pair only (the LSH point: the Jaccard computation
    # never sees the full corpus cross product)
    from .expr import let

    ha = fp.select(F.col("id").alias("id_a"), F.col("hs").alias("_ha"))
    hb = fp.select(F.col("id").alias("id_b"), F.col("hs").alias("_hb"))
    jaccard = let(
        F.size(F.array_intersect(F.col("_ha"), F.col("_hb"))).cast("double"),
        lambda inter: inter / (F.size("_ha") + F.size("_hb") - inter),
    )
    verified = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select("id_a", "id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# --------------------------------------------------------------------------
# incremental dedup against a persisted fingerprint index.
#
# At 100 TB you do not re-minhash the corpus per ingest: the historical
# batches live as an (id, hs, sig) fingerprint table (txlog/parquet — ~5-10%
# of text volume) and each NEW batch is sketched once, probed against the
# index's band buckets, and the survivors' fingerprints are APPENDED. The
# index side never recomputes and never rescans its text. Reference pattern:
# Broder-style sketch stores in web-crawl dedup (Manku et al., WWW 2007 §4,
# "a Hamming-distance store queried by each newly crawled page").


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Fingerprint-index rows ``(id, hs: array<long>, sig: array<long>)``
    for a corpus batch — what an incremental dedup pipeline persists.
    ``hs`` (the distinct shingle hashes) enables exact-Jaccard verification
    of future candidates without the original text; drop it and pass
    ``verify="estimate"`` to :func:`minhash_dedup_incremental` if index
    size matters more than verification exactness."""
    return fingerprints(df, text_col, id_col, num_hashes, k, portable)


def band_keys(
    idx: DataFrame, num_hashes: int = 64, bands: int = 16, portable: bool = False
) -> DataFrame:
    """Explode index rows to ``(id, band, band_hash)`` probe keys. Persist
    this (txlog ``cluster_by`` on band_hash, or bucketed parquet) to make
    the incremental probe join bucket-colocated — the new batch's keys then
    shuffle to the index's layout and the index moves nothing."""
    rows = num_hashes // bands
    if portable:
        band_key = lambda b: F.slice(F.col("sig"), b * rows + 1, rows)  # noqa: E731
    else:
        band_key = lambda b: F.hash(F.slice(F.col("sig"), b * rows + 1, rows))  # noqa: E731
    return idx.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band", "band_hash"),
    )


def minhash_dedup_incremental(
    new_df: DataFrame,
    index_df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    portable: bool = False,
    verify: str = "exact",
    index_banded: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against itself and a fingerprint index, without
    touching historical text. Returns ``(survivors, new_index_rows)``:
    ``survivors`` are the new rows to keep, ``new_index_rows`` their
    ``(id, hs, sig)`` fingerprints to APPEND to the index table.

    Semantics — history always wins: a new doc verified-similar to ANY
    indexed doc is dropped regardless of id order; within the batch the
    smaller id wins (so with monotonically increasing ids across batches,
    one increment reproduces :func:`minhash_dedup` over the union,
    restricted to the new rows). The index is assumed deduped (its own
    survivors), so index-index pairs never arise.

    ``verify="exact"`` computes true Jaccard from the stored shingle-hash
    sets; ``"estimate"`` compares signature components only (index may omit
    ``hs``) — the standard sketch-store tradeoff. ``index_banded`` accepts
    a pre-exploded :func:`band_keys` table so a persisted, band-clustered
    index skips the explode entirely.

    Scale shape: ONE sketch pass over the new batch; the only corpus-sized
    join is new-keys × index-keys on (band, band_hash) — bucket-bounded,
    broadcastable when the new batch is small (AQE picks it), and the
    verification join touches candidate pairs only."""
    if verify not in ("exact", "estimate"):
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    if index_df is not None and index_banded is None:
        # the index frame feeds BOTH the banding join and the verify union;
        # without a barrier each consumer re-executes its plan — for a
        # freshly fingerprinted index (q_dedup_incremental's shape) that is
        # the whole md5+MinHash kernel over the history corpus TWICE
        # (guide §2.4/§5: materialize shared subtrees once). When a
        # pre-banded layout is supplied the frame has one consumer and
        # streams through unbarriered.
        index_df = index_df.transform(shared_barrier)
    new_idx = minhash_index(
        new_df, text_col, id_col, num_hashes, k, portable
    ).transform(shared_barrier)
    nb = band_keys(new_idx, num_hashes, bands, portable).transform(shared_barrier)

    # candidate (loser, other) pairs: loser is always the new-batch doc
    a, b = nb.alias("a"), nb.alias("b")
    cand_new = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") > F.col("b.id")),
        "inner",
    ).select(F.col("a.id").alias("loser"), F.col("b.id").alias("other"))
    cand = cand_new
    if index_df is not None or index_banded is not None:
        ob = (
            index_banded
            if index_banded is not None
            else band_keys(index_df, num_hashes, bands, portable)
        )
        cand_old = nb.alias("a").join(
            ob.alias("o"),
            (F.col("a.band") == F.col("o.band"))
            & (F.col("a.band_hash") == F.col("o.band_hash")),
            "inner",
        ).select(F.col("a.id").alias("loser"), F.col("o.id").alias("other"))
        cand = cand.unionByName(cand_old)
    cand = cand.distinct()

    if verify == "exact":
        feats = new_idx.select("id", F.col("hs").alias("_f"))
        if index_df is not None:
            feats = feats.unionByName(index_df.select("id", F.col("hs").alias("_f")))
        from .expr import let

        score = let(
            F.size(F.array_intersect(F.col("_fl"), F.col("_fo"))).cast("double"),
            lambda inter: inter / (F.size("_fl") + F.size("_fo") - inter),
        )
    else:
        feats = new_idx.select("id", F.col("sig").alias("_f"))
        if index_df is not None:
            feats = feats.unionByName(index_df.select("id", F.col("sig").alias("_f")))
        score = (
            F.size(
                F.filter(
                    F.zip_with(F.col("_fl"), F.col("_fo"), lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).cast("double")
            / F.lit(float(num_hashes))
        )
    fl = feats.select(F.col("id").alias("loser"), F.col("_f").alias("_fl"))
    fo = feats.select(F.col("id").alias("other"), F.col("_f").alias("_fo"))
    losers = (
        cand.join(fl, "loser")
        .join(fo, "other")
        .filter(score >= F.lit(threshold))
        .select(F.col("loser").alias(id_col))
        .distinct()
    )
    survivors = new_df.join(losers, id_col, "left_anti")
    new_rows = new_idx.join(
        losers.withColumnRenamed(id_col, "id"), "id", "left_anti"
    )
    return survivors, new_rows


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    portable: bool = False,
    max_postings: int | None = 1024,
    return_dropped: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    Without ``candidates``: inverted-index join — explode distinct shingle
    keys (full-width hashes, :func:`shingle_keys` — the shuffle carries
    8-byte longs, not shingle strings), count common, |A∪B| = |A|+|B|−common.
    With ``candidates`` (id_a, id_b): restricted to those pairs (the LSH
    verify path). Returns (id_a, id_b, jaccard) with jaccard ≥ threshold.
    ``portable=True`` keys on the md5-derived hash so the SQL oracle can
    rebuild the identical postings.

    ``max_postings`` is the SCALE CONTRACT (default 1024): a shingle
    shared by m documents contributes m²/2 pairs from ONE reducer — one
    boilerplate sentence across a 100 TB corpus would otherwise build an
    m-element array in a single task and go quadratic. Shingles whose
    document frequency exceeds the cap are DROPPED from the index before
    any per-shingle array materializes (standard CCNet-style df capping:
    ubiquitous shingles carry no dedup signal; pairs that relied on them
    lose only that contribution, everything else is exact). The observed
    max df on the synthetic corpus is 25 at sf0.1 (~250 extrapolated at
    sf1), so the default cap is invisible at every tested scale;
    ``max_postings=None`` restores the uncapped exact semantics.
    ``return_dropped=True`` additionally returns the accounting frame
    ``(s, df)`` of capped-out shingles as ``(pairs, dropped)``.
    """
    # distinct-shingle rows with the hash computed post-explode in a flat
    # codegen'd Project (see exploded_shingle_keys) — same (id, n, s) rows
    # as the array-side hashing shape, ~2.6× cheaper on the md5 path
    exploded = exploded_shingle_keys(df, text_col, id_col, k, portable)
    dropped = None
    if max_postings is not None:
        # FUSED df-cap (guide §2.3/§2.4; r13 verdict #3): the df count and
        # the postings aggregation group by the SAME key, so one window
        # (count over partition-by-s — no orderBy, one hash exchange +
        # spillable sort) replaces the r13 shape's second full shuffle of
        # the exploded stream, its anti-join, and the localCheckpoint
        # barrier. Over-cap shingles are dropped BEFORE the collect_set
        # below, which then reuses the window's hash(s) clustering with no
        # further exchange — so no per-shingle array ever exceeds the cap
        # and the exploded stream shuffles ONCE. A hot shingle's rows land
        # in one spillable window group (disk-bounded, like any groupBy on
        # the same key), never in an m-element in-memory array.
        from pyspark.sql import Window as _W

        win = _W.partitionBy("s")
        counted = exploded.withColumn(
            "df", F.count(F.lit(1)).over(win)
        )
        if return_dropped:
            counted = counted.transform(shared_barrier)
            dropped = (
                counted.filter(F.col("df") > max_postings)
                .groupBy("s")
                .agg(F.first("df").alias("df"))
            )
        exploded = counted.filter(F.col("df") <= max_postings).drop("df")
    # inverted index WITHOUT a self-join: group the postings per shingle,
    # keep only shingles shared by ≥2 docs (the overwhelming majority have
    # one posting and drop here), generate the ordered id pairs per shingle
    # JVM-side, count pair occurrences = |A ∩ B|. One shuffle on the shingle
    # + one on the pair — the self-join formulation shuffles both exploded
    # sides and was ~4× slower at sf0.1. Each doc's shingle count rides
    # along as a struct field (4 bytes/posting), so |A|,|B| arrive with the
    # pair and the union size needs NO size-lookup joins afterwards (those
    # were two more O(corpus) shuffles).
    postings = (
        exploded.groupBy("s")
        .agg(F.sort_array(F.collect_set(F.struct("id", "n"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    x["n"].alias("n_a"),
                    y["id"].alias("id_b"),
                    y["n"].alias("n_b"),
                ),
            ),
        )
    )
    common = (
        postings.select(F.explode(pair_structs).alias("p"))
        # n_a/n_b are functionally dependent on the ids — grouping on all
        # four keeps the aggregate a single pass with no post-join
        .groupBy(
            F.col("p.id_a").alias("id_a"),
            F.col("p.n_a").alias("n_a"),
            F.col("p.id_b").alias("id_b"),
            F.col("p.n_b").alias("n_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    out = (
        common.select(
            "id_a",
            "id_b",
            (
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if return_dropped:
        return out, dropped
    return out


def simhash(col: Column, num_bits: int = 31, k: int = 3) -> Column:
    """SimHash of the document: per-bit majority vote over shingle hashes.

    For each bit position, the fingerprint bit is 1 iff more than half the
    shingle hashes have that bit set (equivalent to the classic ±1 vote sum
    being positive). The bit loop runs in Python with literal shift amounts
    (Spark's ``shiftright`` needs a literal); per-bit counting is a JVM-side
    ``filter``+``size`` over the hash array.
    """
    return simhash_from_hashes(shingle_hashes(col, k), num_bits)


def simhash_from_hashes(hashes: Column, num_bits: int = 31) -> Column:
    """SimHash from a precomputed hash array. The expression references
    ``hashes`` ~num_bits times — pass a *materialized column* (behind a
    shuffle/cache barrier), not the raw hashing expression, or Catalyst's
    CollapseProject will duplicate the md5 pipeline into every bit."""
    bits = min(num_bits, 31)  # shingle hashes are 31-bit
    n = F.size(hashes)

    def ones_at(i: int) -> Column:
        # one-arg lambda (a two-arg lambda would receive the element index)
        return F.size(
            F.filter(hashes, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1)
        )

    fp = F.lit(0).cast("long")
    for i in range(bits):
        ones = ones_at(i)
        fp = fp.bitwiseOR(
            F.when(ones * 2 > n, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_bits: int = 31,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash with pigeonhole band-bucketing.

    The fingerprint is split into ``max_hamming + 1`` disjoint bit bands; a
    pair with hamming ≤ ``max_hamming`` has fewer differing bits than bands,
    so by pigeonhole it agrees on at least one *full* band — bucketing on
    (band index, band bits) gives **guaranteed recall** while candidate
    pairs still only form inside small buckets (the classic web-dedup
    rotation/block scheme). Cost: each doc explodes into ``bands`` bucket
    rows; the cross-corpus shuffle key is (band, band_bits).
    """
    bands = max_hamming + 1
    width = num_bits // bands
    # materialize the hash array behind a shuffle barrier so the shingle
    # pipeline runs once per doc (simhash_from_hashes references it ~num_bits
    # times)
    from ._vectorized import make_simhash_udf

    hashed = hashed_shingles(df, text_col, id_col, portable=portable)
    fp = hashed.select("id", make_simhash_udf(num_bits)(F.col("_h")).alias("fp"))

    def band_bits(i: int) -> Column:
        # band i covers bits [i*width, (i+1)*width); the last band absorbs
        # the remainder bits so every bit belongs to exactly one band
        w = width + (num_bits - bands * width if i == bands - 1 else 0)
        return F.shiftrightunsigned(F.col("fp"), i * width).bitwiseAND(
            F.lit((1 << w) - 1).cast("long")
        )

    banded = fp.select(
        "id",
        "fp",
        F.posexplode(F.array(*[band_bits(i) for i in range(bands)])).alias(
            "band", "bits"
        ),
    ).transform(shared_barrier)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Brute-force pair join — correct baseline; at corpus scale route through
    :mod:`.similarity` LSH buckets first and feed the pairs in here.
    """
    from .similarity import cosine

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"), "inner")
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
