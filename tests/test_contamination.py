"""Decontamination operator tests: overlap stats vs a hand-computed shingle
intersection, the drop policy, threshold behavior, and the broadcast plan
contract (corpus side never shuffles for the semi-join)."""

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators import contamination as C


def docs_df(spark, docs, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def py_shingles(text, k):
    toks = text.lower().split()
    if len(toks) <= k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


CORPUS = [
    "alpha beta gamma delta epsilon zeta",          # shares a 3-gram run w/ bench
    "one two three four five six seven",            # clean
    "the quick brown fox jumps over fences",        # shares the bench prefix
    "totally unrelated content about nothing",      # clean
]
BENCH = [
    "alpha beta gamma delta something else",
    "the quick brown fox sleeps",
]


def expected_overlap(k=3):
    bench_sh = set()
    for b in BENCH:
        bench_sh |= py_shingles(b, k)
    out = {}
    for i, d in enumerate(CORPUS):
        sh = py_shingles(d, k)
        hit = len(sh & bench_sh)
        if hit:
            out[i] = (len(sh), hit)
    return out


def test_overlap_matches_python_set_intersection(spark):
    corpus = docs_df(spark, CORPUS)
    bench = docs_df(spark, BENCH, start=100)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contamination"])
        for r in C.contamination_overlap(corpus, bench, k=3).collect()
    }
    exp = expected_overlap(k=3)
    assert set(got) == set(exp)
    for i, (n_sh, n_hit) in exp.items():
        assert got[i][0] == n_sh
        assert got[i][1] == n_hit
        assert got[i][2] == round(n_hit / n_sh, 6)


def test_portable_and_default_hashing_agree(spark):
    corpus = docs_df(spark, CORPUS)
    bench = docs_df(spark, BENCH, start=100)
    a = sorted(
        C.contamination_overlap(corpus, bench, k=3, portable=False).collect()
    )
    b = sorted(
        C.contamination_overlap(corpus, bench, k=3, portable=True).collect()
    )
    assert a == b


def test_decontaminate_drops_exactly_the_flagged_docs(spark):
    corpus = docs_df(spark, CORPUS)
    bench = docs_df(spark, BENCH, start=100)
    clean = C.decontaminate(corpus, bench, k=3)
    ids = sorted(r["doc_id"] for r in clean.collect())
    assert ids == sorted(set(range(len(CORPUS))) - set(expected_overlap(k=3)))


def test_decontaminate_threshold_keeps_lightly_contaminated(spark):
    corpus = docs_df(spark, CORPUS)
    bench = docs_df(spark, BENCH, start=100)
    # with a permissive threshold every doc survives
    clean = C.decontaminate(corpus, bench, k=3, max_contamination=1.0)
    assert clean.count() == len(CORPUS)


def test_large_k_short_docs_whole_text_shingle(spark):
    # docs shorter than k collapse to a single whole-text shingle — an exact
    # full-document match is still caught at any k
    corpus = docs_df(spark, ["tiny doc", "other doc"])
    bench = docs_df(spark, ["tiny doc"], start=100)
    got = C.contamination_overlap(corpus, bench, k=13).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 0
    assert got[0]["n_shingles"] == 1 and got[0]["n_hit"] == 1


def test_bench_semi_join_is_broadcast(spark):
    corpus = docs_df(spark, CORPUS)
    bench = docs_df(spark, BENCH, start=100)
    plan = C.contamination_overlap(corpus, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
