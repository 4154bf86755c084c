"""Vocabulary / keyword-extraction / hashed-linear-scoring tests against
hand-computed expectations, plus the shuffle-free plan contract for the
classifier."""

from collections import Counter

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators import text as T


DOCS = [
    "apple banana apple cherry",
    "banana cherry cherry date",
    "apple date elder fig",
]


def docs_df(spark):
    return spark.createDataFrame(
        list(enumerate(DOCS)), "doc_id long, text string"
    )


def py_stats():
    tf = Counter()
    df = Counter()
    for d in DOCS:
        toks = d.split()
        tf.update(toks)
        df.update(set(toks))
    return tf, df


def test_vocab_topk_counts_and_order(spark):
    tf, df = py_stats()
    rows = T.vocab_topk(docs_df(spark), n=4).collect()
    # expected order: tf desc, token asc
    exp = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert [(r["tok"], r["tf"], r["df"]) for r in rows] == [
        (tok, n, df[tok]) for tok, n in exp
    ]
    assert [r["vocab_id"] for r in rows] == [1, 2, 3, 4]


def test_tfidf_keywords_ranking(spark):
    tf, df = py_stats()
    rows = T.tfidf_keywords(docs_df(spark), top_per_doc=2).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rank"])):
        by_doc.setdefault(r["doc_id"], []).append(r["tok"])
    # doc 0: apple tf=2 df=2 → 2/3; banana 1/3, cherry 1/4
    assert by_doc[0] == ["apple", "banana"]
    # doc 1: cherry tf=2 df=2 → 2/3; banana/date tf=1: banana df=2 → 1/3,
    # date df=2 → 1/3 — tie broken by token asc
    assert by_doc[1] == ["cherry", "banana"]
    # doc 2: all tf=1: elder/fig df=1 → 1/2 beat apple/date 1/3; token asc
    assert by_doc[2] == ["elder", "fig"]
    for r in rows:
        assert r["score"] == round(r["tf"] / (1 + r["df"]), 6)


def test_hashed_linear_score_matches_python(spark):
    def py_weight(tok):
        import hashlib

        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return ((h % 1024) * 2654435761) % 1000 - 500

    out = (
        docs_df(spark)
        .select("doc_id", T.hashed_linear_score(F.col("text")).alias("m"))
        .collect()
    )
    got = {r["doc_id"]: r["m"] for r in out}
    for i, d in enumerate(DOCS):
        assert got[i] == sum(py_weight(t) for t in d.split()) / 1000.0


def test_hashed_linear_score_empty_doc_is_zero(spark):
    df = spark.createDataFrame([(0, ""), (1, "   !!! ")], "doc_id long, text string")
    out = {r["doc_id"]: r["m"] for r in df.select(
        "doc_id", T.hashed_linear_score(F.col("text")).alias("m")).collect()}
    assert out == {0: 0.0, 1: 0.0}


def test_classifier_plan_is_shuffle_free(spark):
    df = docs_df(spark)
    plan = (
        df.select("doc_id", T.hashed_linear_score(F.col("text")).alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
