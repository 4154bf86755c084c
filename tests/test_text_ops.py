"""Text-analysis operator tests: tokenization, shingles, quality, lang-id,
fingerprints — with Python-computed expectations."""

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators import text as T


def one(spark, s, col):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_normalize_and_tokens(spark):
    assert one(spark, "  Hello,  WORLD!42 ", T.normalize(F.col("text"))) == "hello world 42"
    assert one(spark, "Hello, world!", T.tokens(F.col("text"))) == ["hello", "world"]


def test_token_count(spark):
    assert one(spark, "one two three", T.token_count(F.col("text"))) == 3
    assert one(spark, "", T.token_count(F.col("text"))) == 0
    assert one(spark, "!!!", T.token_count(F.col("text"))) == 0


def test_bpe_token_count(spark):
    # "don't stop 42x" → don | ' | t | stop | 42 | x = 6
    assert one(spark, "don't stop 42x", T.bpe_token_count(F.col("text"))) == 6


def test_shingles_basic(spark):
    got = one(spark, "a b c d e", T.shingles(F.col("text"), 3))
    assert got == ["a b c", "b c d", "c d e"]


def test_shingles_short_doc(spark):
    # shorter than k → single whole-text shingle
    assert one(spark, "a b", T.shingles(F.col("text"), 3)) == ["a b"]
    assert one(spark, "a b c", T.shingles(F.col("text"), 3)) == ["a b c"]


def test_lang_id(spark):
    en = "the cat and the dog went to the house in the garden"
    es = "el perro y la casa de los vecinos en la calle por la tarde"
    und = "zzz qqq xxx"
    assert one(spark, en, T.lang_id(F.col("text"))) == "en"
    assert one(spark, es, T.lang_id(F.col("text"))) == "es"
    assert one(spark, und, T.lang_id(F.col("text"))) == "und"


def test_quality_score_bounds(spark):
    good = "this is a reasonably long document with many normal words in it and more"
    junk = "!!! ??? ... ;;; ::: @@@"
    g = one(spark, good, T.quality_score(F.col("text")))
    j = one(spark, junk, T.quality_score(F.col("text")))
    assert 0.0 <= j < g <= 1.0


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [("Hello,   World!",), ("hello world",)], "text string"
    )
    fps = [r[0] for r in df.select(T.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_min_shingle_fingerprint_stability(spark):
    # edit far from the minimal shingle keeps the fingerprint; the min of a
    # superset that includes all original shingles can only stay or decrease
    base = "alpha beta gamma delta epsilon zeta eta theta"
    edited = base + " iota"
    a = one(spark, base, T.min_shingle_fingerprint(F.col("text")))
    b = one(spark, edited, T.min_shingle_fingerprint(F.col("text")))
    assert b <= a


def test_line_stats_dup_lines(spark):
    text = "alpha beta\nalpha beta\ngamma\n\n   \ngamma"
    df = spark.createDataFrame([(text,)], "text string")
    r = df.select(T.line_stats(F.col("text")).alias("s")).collect()[0]["s"]
    # 4 non-empty lines (two blanks dropped), 2 distinct
    assert r["n_lines"] == 4
    assert r["n_distinct_lines"] == 2


def test_line_stats_empty_text(spark):
    df = spark.createDataFrame([("",), ("\n\n",)], "text string")
    rows = df.select(T.line_stats(F.col("text")).alias("s")).collect()
    for r in rows:
        assert r["s"]["n_lines"] == 0


def test_pack_sequences_hand_computed(spark):
    from cdk_datalake_analytics_comercial_spark.operators.pack import pack_sequences

    rows = [
        # lang a: tokens 1000, 1000, 500, 2048 → starts 0, 1000, 2000, 2500
        (1, "a", 1000), (2, "a", 1000), (3, "a", 500), (4, "a", 2048),
        # lang b independent: starts 0, 2047
        (5, "b", 2047), (6, "b", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df, "n_tokens", "doc_id", 2048, ["lang"]).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (0, 1000)
    assert out[3] == (0, 2000)        # starts at 2000, straddles the cut
    assert out[4] == (1, 452)         # 2500 = 2048 + 452
    assert out[5] == (0, 0)           # lang b packs from zero
    assert out[6] == (0, 2047)


def test_pack_sequences_requires_strata(spark):
    import pytest as _pytest

    from cdk_datalake_analytics_comercial_spark.operators.pack import pack_sequences

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with _pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", "doc_id", 2048, [])


def test_chunk_tokens_hand_computed(spark):
    # 10 tokens, size 4, stride 3 → chunks at 0,3,6,9: ceil((10-4)/3)+1 = 3? 
    # ceil(6/3)+1 = 3 chunks (starts 0, 3, 6); last covers tokens 7-10
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(text,)], "text string")
    rows = df.select(
        F.posexplode(T.chunk_tokens(F.col("text"), 4, 3)).alias("i", "c")
    ).collect()
    got = [(r["i"], r["c"]["start"], r["c"]["n_tokens"], r["c"]["chunk"]) for r in rows]
    assert got == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (1, 3, 4, "w3 w4 w5 w6"),
        (2, 6, 4, "w6 w7 w8 w9"),
    ]


def test_chunk_tokens_short_doc_single_chunk(spark):
    df = spark.createDataFrame([("a b",), ("",)], "text string")
    rows = df.select(
        F.size(T.chunk_tokens(F.col("text"), 256, 128)).alias("n")
    ).collect()
    assert [r["n"] for r in rows] == [1, 1]


def test_chunk_tokens_exact_boundary(spark):
    # n == size → exactly one chunk
    text = " ".join(f"w{i}" for i in range(4))
    df = spark.createDataFrame([(text,)], "text string")
    rows = df.select(
        F.posexplode(T.chunk_tokens(F.col("text"), 4, 3)).alias("i", "c")
    ).collect()
    assert len(rows) == 1 and rows[0]["c"]["n_tokens"] == 4


def test_corpus_filter_drops_each_rule(spark, tmp_path):
    import shutil

    from cdk_datalake_analytics_comercial_spark.plans.docs import q_corpus_filter

    rows = [
        (1, "en", "good " + " ".join(f"word{i}" for i in range(50)), "web", 0),
        (2, "en", "tiny doc", "web", 0),                     # < 10 tokens
        (3, "en", "\n".join(["same line here always ok"] * 40), "web", 0),  # dup lines
        (4, "en", " ".join(["a"] * 60), "web", 0),           # mean token len 1
        (5, "en", " ".join(["pneumonoultramicroscopicx"] * 30), "web", 0),  # len 25
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.write.parquet(d + "/documents.parquet")
    out = q_corpus_filter(spark, d)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1]
    shutil.rmtree(d)


def test_doc_length_histogram_buckets(spark, tmp_path):
    import shutil

    from cdk_datalake_analytics_comercial_spark.plans.docs import (
        q_doc_length_histogram,
    )

    rows = [
        (1, "en", " ".join(["w"] * 1), "web", 0),    # 1 token  → bucket 1
        (2, "en", " ".join(["w"] * 3), "web", 0),    # 3 tokens → bucket 2
        (3, "en", " ".join(["w"] * 4), "web", 0),    # 4 tokens → bucket 3
        (4, "en", " ".join(["w"] * 7), "web", 0),    # 7 tokens → bucket 3
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    )
    d = str(tmp_path / "docs2")
    df.write.parquet(d + "/documents.parquet")
    hist = {
        r["log2_bucket"]: (r["n_docs"], r["total_tokens"])
        for r in q_doc_length_histogram(spark, d).collect()
    }
    assert hist == {1: (1, 1), 2: (1, 3), 3: (2, 11)}
    shutil.rmtree(d)


# --------------------------------------------------------------------------
# PII detection / redaction.


def test_pii_counts_and_redaction(spark):
    from cdk_datalake_analytics_comercial_spark.operators import text as TX

    rows = [
        (0, "mail me at jane.doe+x@corp.example.com today"),
        (1, "call +51-555-0042 or 1-800-555-1234 now"),
        (2, "ssn-ish 123456789 stays, short 12345678 stays put"),
        (3, "clean text with no sensitive bits"),
        (4, "combo a@b.io +1-222-3333 987654321"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    counts = TX.pii_counts(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *[v.alias(k) for k, v in counts.items()],
            TX.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_idnum"]) == (1, 0, 0)
    assert out[0]["red"] == "mail me at <EMAIL> today"
    assert out[1]["n_phone"] == 2
    assert out[1]["red"] == "call <PHONE> or <PHONE> now"
    # only the ≥9-digit standalone run is an id
    assert out[2]["n_idnum"] == 1
    assert out[2]["red"] == "ssn-ish <ID> stays, short 12345678 stays put"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_idnum"]) == (0, 0, 0)
    assert out[3]["red"] == rows[3][1]
    assert out[4]["red"] == "combo <EMAIL> <PHONE> <ID>"


def test_repetition_stats_matches_explode_groupby(spark):
    """The Arrow repetition kernel must reproduce the explode→groupBy
    staging it replaced: top = count of the most frequent bigram, n =
    total bigram count, including the short-doc whole-text fallback."""
    from pyspark.sql import functions as F

    from cdk_datalake_analytics_comercial_spark.operators import text as T

    docs = [
        "a b a b a b c",          # repeated bigrams
        "one",                    # < k tokens -> single whole-text shingle
        "x y",                    # exactly k tokens
        "u v w x y z",            # all-distinct bigrams
        "r r r r r r r r",        # one bigram repeated
    ]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    ref = (
        df.select("doc_id", F.explode(T.shingles(F.col("text"), 2)).alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").cast("bigint").alias("top"),
            F.sum("count").cast("bigint").alias("n"),
        )
    )
    got = df.select(
        "doc_id", T.repetition_stats(F.col("text"), 2).alias("st")
    ).select("doc_id", F.col("st.top").alias("top"), F.col("st.n").alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
