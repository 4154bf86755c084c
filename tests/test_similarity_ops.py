"""Similarity-search tests: brute-force cosine top-k against a numpy oracle;
LSH bucket variant sanity (self-bucket always matches)."""

import math

from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.operators import similarity as S


def py_cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.9, 0.1, 0.0]),
    (4, [0.5, 0.5, 0.5, 0.5]),
    (5, [-1.0, 0.0, 0.0, 0.0]),
]


def vec_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_bruteforce_topk_matches_python(spark):
    df = vec_df(spark)
    out = S.cosine_topk_bruteforce(df, df, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"], r["cosine"]))
    vd = dict(VECS)
    for qid, lst in got.items():
        lst.sort()
        expected = sorted(
            ((py_cosine(vd[qid], vd[cid]), -cid) for cid in vd if cid != qid),
            reverse=True,
        )[:2]
        for (rank, cid, cos), (ecos, neg_ecid) in zip(lst, expected):
            assert cid == -neg_ecid
            assert abs(cos - ecos) < 1e-5
    assert set(got) == set(vd)
    assert all(len(v) == 2 for v in got.values())


def test_lsh_bucket_topk_subset_of_bruteforce(spark):
    df = vec_df(spark)
    exact = {
        (r["query_id"], r["corpus_id"]): r["cosine"]
        for r in S.cosine_topk_bruteforce(df, df, k=5).collect()
    }
    approx = S.lsh_bucket_topk(df, df, dim=4, k=5, n_planes=2).collect()
    # approx hits carry the integer-scaled (round(x*1e6)) cosine — within
    # quantization distance of the float value, not bit-equal to it
    for r in approx:
        key = (r["query_id"], r["corpus_id"])
        assert key in exact
        assert abs(r["cosine"] - exact[key]) < 1e-5


def test_dot_and_norm(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    row = df.select(
        S.dot(F.col("a"), F.col("b")).alias("d"),
        S.norm(F.col("a")).alias("n"),
        S.cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert row["d"] == 32.0
    assert abs(row["n"] - math.sqrt(14)) < 1e-9
    assert abs(row["c"] - py_cosine([1, 2, 3], [4, 5, 6])) < 1e-9


def test_ivf_topk_subset_of_bruteforce(spark):
    df = vec_df(spark)
    exact = {
        (r["query_id"], r["corpus_id"]): r["cosine"]
        for r in S.cosine_topk_bruteforce(df, df, k=5).collect()
    }
    approx = S.ivf_topk(df, df, dim=4, k=5, n_cells=2).collect()
    assert len(approx) > 0
    for r in approx:
        key = (r["query_id"], r["corpus_id"])
        assert key in exact                        # every hit is a real pair
        assert abs(r["cosine"] - exact[key]) < 1e-5  # integer-scaled cosine


def test_ivf_centroids_deterministic(spark):
    df = vec_df(spark)
    c1 = S.ivf_centroids(df, dim=4, n_cells=2)
    c2 = S.ivf_centroids(df, dim=4, n_cells=2)
    assert c1 == c2
    assert len(c1) == 2 and all(len(row) == 4 for row in c1)


def test_ivf_same_cell_query_finds_itself_neighbors(spark):
    # a query identical to a corpus vector lands in the same cell, so its
    # nearest true neighbor (cosine 1 clone) is always found
    rows = VECS + [(6, [1.0, 0.0, 0.0, 0.0])]   # clone of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["query_id"], r["rank"]): r["corpus_id"]
        for r in S.ivf_topk(df, df.filter("vec_id = 6"), dim=4, k=1, n_cells=2).collect()
    }
    assert got[(6, 1)] == 0                       # the clone is rank-1


def test_blockdist_equals_blockwise_allpairs(spark):
    # the distributed block-pair decomposition must reproduce the collect-
    # based kernel's output exactly (ids AND bit-identical cosines), for
    # block counts both smaller and larger than the corpus spread
    rows = [(i, [float(((i * 7 + j * 3) % 11) - 5) / 5.0 for j in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.cosine_pairs_blockwise(df, threshold=0.3).collect()
    }
    assert want  # fixture must actually produce qualifying pairs
    for n_blocks in (1, 3, 8, 64):
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in S.cosine_pairs_blockdist(
                df, threshold=0.3, n_blocks=n_blocks
            ).collect()
        }
        assert got == want, f"n_blocks={n_blocks}"


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    # probing more cells can only ADD candidates: the n_probe=2 hit set must
    # contain the n_probe=1 hits' pairs or better them; with n_cells=2 and
    # n_probe=2 the search is exhaustive and must equal brute force exactly
    df = vec_df(spark)
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in S.cosine_topk_bruteforce(df, df, k=2).collect()
    }
    full = {
        (r["query_id"], r["corpus_id"])
        for r in S.ivf_topk(df, df, dim=4, k=2, n_cells=2, n_probe=2).collect()
    }
    assert full == exact
    single = S.ivf_topk(df, df, dim=4, k=2, n_cells=2, n_probe=1).collect()
    # per query, multi-probe returns at least as many hits
    from collections import Counter

    c1 = Counter(r["query_id"] for r in single)
    c2 = Counter(q for q, _ in full)
    for qid, n in c1.items():
        assert c2[qid] >= n


def test_multiprobe_recall_dominates_single_probe(spark):
    """Probing 2 cells must recover at least as many true neighbors as 1
    cell (per query, the candidate set strictly grows)."""
    from cdk_datalake_analytics_comercial_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )
    from cdk_datalake_analytics_comercial_spark.plans.common import t as tt
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    e = tt(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["corpus_id"])
        for r in cosine_topk_bruteforce(e, q, k=5).collect()
    }
    got1 = {
        (r["query_id"], r["corpus_id"])
        for r in ivf_topk(e, q, dim=64, k=5, n_cells=8, n_probe=1).collect()
    }
    got2 = {
        (r["query_id"], r["corpus_id"])
        for r in ivf_topk(e, q, dim=64, k=5, n_cells=8, n_probe=2).collect()
    }
    assert len(got2 & truth) >= len(got1 & truth)


def test_pq_topk_recall_and_determinism(spark):
    """PQ ADC is lossy but must (a) be deterministic across runs and
    (b) recover a reasonable fraction of the exact top-5 on the toy set."""
    from cdk_datalake_analytics_comercial_spark.operators.similarity import (
        cosine_topk_bruteforce,
        pq_topk,
    )
    from cdk_datalake_analytics_comercial_spark.plans.common import t as tt
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    e = tt(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, pq_topk(e, q, dim=64, k=5, n_sub=16, n_cent=16).collect()))
    b = sorted(map(tuple, pq_topk(e, q, dim=64, k=5, n_sub=16, n_cent=16).collect()))
    assert a == b  # deterministic: training, codes, ranking

    # PQ approximates L2 — compare against the exact L2 top-5 (comparing
    # to cosine truth on random vectors is a metric mismatch)
    import numpy as np

    rows_ = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows_])
    X = np.array([r["embedding"] for r in rows_], dtype=np.float64)
    truth = set()
    for qid in range(10):
        qv = X[ids == qid][0]
        d = ((X - qv) ** 2).sum(axis=1)
        order = [
            int(ids[i]) for i in np.lexsort((ids, d)) if ids[i] != qid
        ][:5]
        truth |= {(qid, c) for c in order}
    got = {(r[0], r[1]) for r in a}
    # 4 bytes per 64-dim vector is heavy compression: demand a floor
    assert len(got & truth) / len(truth) >= 0.3


def test_ivfpq_subset_of_pq_candidates(spark):
    """IVF-PQ hits are PQ hits restricted to the query's cell: every
    (query, corpus) pair IVF-PQ returns must carry the same ADC distance
    PQ computes for it (same codebooks, same integer math)."""
    from cdk_datalake_analytics_comercial_spark.operators.similarity import (
        ivf_pq_topk,
        pq_topk,
    )
    from cdk_datalake_analytics_comercial_spark.plans.common import t as tt
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    e = tt(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    full = {
        (r["query_id"], r["corpus_id"]): r["d2"]
        for r in pq_topk(e, q, dim=64, k=500, n_sub=16, n_cent=16).collect()
    }
    got = ivf_pq_topk(e, q, dim=64, k=5, n_cells=4, n_sub=16, n_cent=16).collect()
    assert got
    for r in got:
        key = (r["query_id"], r["corpus_id"])
        assert key in full and full[key] == r["d2"]


def test_ivfpq_residual_matches_numpy_rederivation(spark):
    """Residual IVF-PQ against a from-scratch numpy re-derivation: retrain
    both quantizers with the shared trainers, assign cells and residual
    codes for the whole corpus, compute every equal-cell ADC distance, and
    demand the operator's top-5 (with the (d2, corpus_id) tie-break) match
    EXACTLY — this exercises the Spark plumbing (cell assignment, code UDF,
    broadcast join, ranking) end-to-end, not just the trainer."""
    import numpy as np

    from cdk_datalake_analytics_comercial_spark.operators.similarity import (
        ivf_pq_residual_topk,
        lloyd_centroids,
        quantize,
        residual_codebooks_from_sample,
    )
    from cdk_datalake_analytics_comercial_spark.plans.common import t as tt

    sf = "/root/testdata/sf0.001"
    e = tt(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    n_cells, n_sub, n_cent, dim, k = 4, 16, 16, 64, 5
    sub = dim // n_sub

    rows_ = sorted(e.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    ids = np.array([r["vec_id"] for r in rows_])
    x = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows_])

    cents_int = np.array(
        [[quantize(v) for v in row] for row in lloyd_centroids(x[:4096], n_cells, 3)],
        dtype=np.int64,
    )
    rcb = np.array(
        residual_codebooks_from_sample(x[:4096], cents_int.tolist(), n_sub, n_cent),
        dtype=np.int64,
    )
    # int-scaled corpus (same rounding as int_scaled/quantize), cells, codes
    xi = np.array([[quantize(v) for v in row] for row in x], dtype=np.int64)
    cell = ((xi[:, None, :] - cents_int[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    R = xi - cents_int[cell]
    codes = np.empty((len(xi), n_sub), dtype=np.int64)
    for s in range(n_sub):
        diff = R[:, s * sub : (s + 1) * sub][:, None, :] - rcb[s][None, :, :]
        codes[:, s] = (diff * diff).sum(axis=2).argmin(axis=1)

    expected = {}
    for qi in range(5):
        qrow = np.where(ids == qi)[0][0]
        qr = R[qrow]
        cand = [
            i for i in range(len(ids)) if cell[i] == cell[qrow] and ids[i] != qi
        ]
        scored = []
        for i in cand:
            d2 = 0
            for s in range(n_sub):
                d = qr[s * sub : (s + 1) * sub] - rcb[s][codes[i, s]]
                d2 += int((d * d).sum())
            scored.append((d2, int(ids[i])))
        scored.sort()
        expected[qi] = [
            (qi, cid, d2, r + 1) for r, (d2, cid) in enumerate(scored[:k])
        ]

    got = ivf_pq_residual_topk(
        e, q, dim=dim, k=k, n_cells=n_cells, n_sub=n_sub, n_cent=n_cent
    ).collect()
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_by_q.setdefault(r["query_id"], []).append(
            (r["query_id"], r["corpus_id"], r["d2"], r["rank"])
        )
    assert got_by_q == expected


def test_blockwise_guard_rejects_oversized_corpus(spark):
    """cosine_pairs_blockwise materializes the corpus on the driver — its
    documented-small contract is now ENFORCED: oversize input fails fast
    with a pointer to the distributed variant, not a driver OOM."""
    import pytest

    df = spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.1)] * 4).alias("embedding"),
    )
    with pytest.raises(ValueError, match="driver-side bound"):
        S.cosine_pairs_blockwise(df, max_rows=5)
    # within bounds still works
    assert S.cosine_pairs_blockwise(df, max_rows=6, threshold=0.5).count() > 0


def test_pq_topk_guard_rejects_oversized_query_side(spark):
    import pytest

    corpus = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 3).cast("float")] * 8).alias("embedding"),
    )
    queries = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * 8).alias("embedding"),
    )
    with pytest.raises(ValueError, match="driver-side bound"):
        S.pq_topk(corpus, queries, dim=8, max_queries=3)


def test_lsh_multitable_dominates_single_table(spark):
    """Every single-table candidate pair is also a multi-table candidate
    (table 0 is the same plane set), so multi-table recall can only be
    >= — and its result must carry identical cosines for shared pairs."""
    from cdk_datalake_analytics_comercial_spark.operators.similarity import (
        lsh_bucket_topk,
        lsh_multitable_topk,
    )
    from cdk_datalake_analytics_comercial_spark.plans.common import t as tt

    sf = "/root/testdata/sf0.001"
    e = tt(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    single = lsh_bucket_topk(e, q, dim=64, k=200, n_planes=6).collect()
    multi = lsh_multitable_topk(
        e, q, dim=64, k=200, n_planes=6, n_tables=4
    ).collect()
    # k far above bucket size → both return their FULL candidate sets
    s_pairs = {(r["query_id"], r["corpus_id"]): r["cosine"] for r in single}
    m_pairs = {(r["query_id"], r["corpus_id"]): r["cosine"] for r in multi}
    assert set(s_pairs) <= set(m_pairs)
    assert len(m_pairs) > len(s_pairs)  # extra tables surfaced new candidates
    for pair, cos in s_pairs.items():
        assert m_pairs[pair] == cos


def test_rerank_exact_recovers_true_topk_from_shortlist(spark):
    """Two-stage retrieval: re-ranking ANY shortlist that contains the
    true neighbors by exact distance must return exactly the brute-force
    top-k — and re-ranking a PQ shortlist can only improve (or tie) the
    raw ADC ranking's recall."""
    import numpy as np

    rng = np.random.default_rng(3)
    C = rng.standard_normal((4, 8))
    X = C[rng.integers(0, 4, size=120)] + 0.1 * rng.standard_normal((120, 8))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 5)

    # exact truth (L2) in numpy, excluding self
    def true_topk(qid, k=3):
        d = ((X - X[qid]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(X)), d))
        return [int(i) for i in order if i != qid][:k]

    # a generous exact shortlist (top-20 cosine) re-ranked by L2 equals
    # the true L2 top-3
    shortlist = S.cosine_topk_bruteforce(df, q, k=20)
    rr = S.rerank_exact(shortlist, df, q, k=3, metric="l2")
    got = {}
    for r in rr.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"]))
    for qid in range(5):
        ranked = [cid for _, cid in sorted(got[qid])]
        assert ranked == true_topk(qid), (qid, ranked, true_topk(qid))

    # PQ shortlist-25 -> exact re-rank: recall >= raw PQ top-3 recall
    def recall(out, k=3):
        byq = {}
        for r in out.collect():
            byq.setdefault(r["query_id"], set()).add(r["corpus_id"])
        return sum(
            len(byq.get(qid, set()) & set(true_topk(qid))) for qid in range(5)
        ) / (3 * 5)

    raw = S.pq_topk(df, q, dim=8, k=3, n_sub=4, n_cent=8)
    two_stage = S.rerank_exact(
        S.pq_topk(df, q, dim=8, k=25, n_sub=4, n_cent=8), df, q, k=3, metric="l2"
    )
    assert recall(two_stage) >= recall(raw)

    # cosine metric path: re-ranking the full corpus as a "shortlist"
    # reproduces brute-force exactly
    allpairs = df.crossJoin(q.select(F.col("vec_id").alias("query_id"))).select(
        "query_id", F.col("vec_id").alias("corpus_id")
    ).filter("query_id != corpus_id")
    rr_cos = S.rerank_exact(allpairs, df, q, k=2, metric="cosine")
    bf = S.cosine_topk_bruteforce(df, q, k=2)
    assert sorted(
        (r["query_id"], r["rank"], r["corpus_id"]) for r in rr_cos.collect()
    ) == sorted((r["query_id"], r["rank"], r["corpus_id"]) for r in bf.collect())


# --------------------------------------------------------------------------
# persisted IVF index (build / append / search)


def test_ivf_index_search_matches_inmemory(spark, tmp_path):
    """Searching the persisted index must return exactly what ivf_topk
    returns with the same centroids — persistence changes no results."""
    df = vec_df(spark)
    path = str(tmp_path / "ivf")
    S.ivf_build_index(spark, df, path, dim=4, n_cells=3)
    cents = S._load_centroids(spark, path)
    for n_probe in (1, 2):
        got = sorted(
            map(
                tuple,
                S.ivf_search_index(spark, df, path, k=2, n_probe=n_probe)
                .drop("cosine")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                S.ivf_topk(
                    df, df, dim=4, k=2, n_cells=3, n_probe=n_probe, centroids=cents
                )
                .drop("cosine")
                .collect(),
            )
        )
        assert got == want and got


def test_ivf_index_append_without_retrain(spark, tmp_path):
    """Appending assigns with the frozen centroids: search results equal a
    fresh assignment of the full corpus under the SAME centroids, and the
    centroids table is untouched by the append."""
    old = spark.createDataFrame(VECS[:4], "vec_id long, embedding array<float>")
    new = spark.createDataFrame(VECS[4:], "vec_id long, embedding array<float>")
    full = vec_df(spark)
    path = str(tmp_path / "ivf")
    S.ivf_build_index(spark, old, path, dim=4, n_cells=3)
    cents_before = S._load_centroids(spark, path)
    S.ivf_append_index(spark, new, path)
    assert S._load_centroids(spark, path) == cents_before
    got = sorted(
        map(
            tuple,
            S.ivf_search_index(spark, full, path, k=2, n_probe=2)
            .drop("cosine")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            S.ivf_topk(
                full, full, dim=4, k=2, n_cells=3, n_probe=2, centroids=cents_before
            )
            .drop("cosine")
            .collect(),
        )
    )
    assert got == want


def test_ivf_index_is_cell_partitioned_and_versioned(spark, tmp_path):
    """The cells table is hive-partitioned by cell (probe-side file
    pruning) and the append created a new txlog version (time travel
    back to the pre-append index works)."""
    import os

    from cdk_datalake_analytics_comercial_spark.sources import txlog as X

    old = spark.createDataFrame(VECS[:4], "vec_id long, embedding array<float>")
    new = spark.createDataFrame(VECS[4:], "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf")
    S.ivf_build_index(spark, old, path, dim=4, n_cells=3)
    v0 = X.current_version(spark, f"{path}/cells")
    S.ivf_append_index(spark, new, path)
    assert X.current_version(spark, f"{path}/cells") > v0
    assert X.tx_read(spark, f"{path}/cells", version=v0).count() == 4
    assert X.tx_read(spark, f"{path}/cells").count() == len(VECS)
    data_root = os.path.join(path, "cells", "data")
    batches = os.listdir(data_root)
    assert any(
        d.startswith("cell=") for b in batches for d in os.listdir(os.path.join(data_root, b))
    )


# --------------------------------------------------------------------------
# persisted IVF-PQ index (build / append / search / rerank)


def test_ivfpq_index_search_matches_inmemory(spark, tmp_path):
    """THE equivalence contract: searching the persisted codes table at
    n_probe=1 returns exactly what ivf_pq_residual_topk computes in
    memory — the quantizers train from the same deterministic sample, so
    persistence changes no results."""
    df = vec_df(spark)
    path = str(tmp_path / "ivfpq")
    S.ivf_pq_build_index(spark, df, path, dim=4, n_cells=3, n_sub=2, n_cent=4)
    got = sorted(
        map(tuple, S.ivf_pq_search_index(spark, df, path, k=2).collect())
    )
    want = sorted(
        map(
            tuple,
            S.ivf_pq_residual_topk(
                df, df, dim=4, k=2, n_cells=3, n_sub=2, n_cent=4
            ).collect(),
        )
    )
    assert got == want and got


def test_ivfpq_index_append_frozen_quantizers(spark, tmp_path):
    """Appending encodes with the FROZEN quantizers: search over the
    appended index equals a fresh encode of the full corpus under the
    same quantizers, and centroids/codebooks tables are untouched."""
    old = spark.createDataFrame(VECS[:4], "vec_id long, embedding array<float>")
    new = spark.createDataFrame(VECS[4:], "vec_id long, embedding array<float>")
    full = vec_df(spark)
    path, path2 = str(tmp_path / "a"), str(tmp_path / "b")
    S.ivf_pq_build_index(spark, old, path, dim=4, n_cells=3, n_sub=2, n_cent=4)
    meta_before = S._load_pq_index_meta(spark, path)
    S.ivf_pq_append_index(spark, new, path)
    meta_after = S._load_pq_index_meta(spark, path)
    assert meta_before[0] == meta_after[0]  # centroids frozen
    assert (meta_before[1] == meta_after[1]).all()  # codebooks frozen
    # reference: an index built from OLD's quantizers over the full corpus
    # — emulate by encoding full with the frozen meta via a second index
    # built from old, then appending the rest (already done) vs searching
    got = sorted(
        map(tuple, S.ivf_pq_search_index(spark, full, path, k=2, n_probe=2).collect())
    )
    S.ivf_pq_build_index(spark, old, path2, dim=4, n_cells=3, n_sub=2, n_cent=4)
    S.ivf_pq_append_index(spark, new, path2)
    want = sorted(
        map(tuple, S.ivf_pq_search_index(spark, full, path2, k=2, n_probe=2).collect())
    )
    assert got == want and got


def test_ivfpq_index_rerank_refine(spark, tmp_path):
    """store_raw=True + rerank: ADC shortlist re-ranked by exact
    integer-grid L2 equals reranking the same shortlist by hand; without
    store_raw the rerank request fails loudly."""
    import pytest as _pt

    df = vec_df(spark)
    p_raw = str(tmp_path / "with_raw")
    p_bare = str(tmp_path / "bare")
    S.ivf_pq_build_index(
        spark, df, p_raw, dim=4, n_cells=1, n_sub=2, n_cent=4, store_raw=True
    )
    S.ivf_pq_build_index(spark, df, p_bare, dim=4, n_cells=1, n_sub=2, n_cent=4)
    got = S.ivf_pq_search_index(spark, df, p_raw, k=2, rerank=4)
    # n_cells=1 → shortlist is ADC over the whole corpus; rerank=4 then
    # exact top-2 must equal the exact integer-grid brute-force ranking
    want = S.rerank_exact(
        S.ivf_pq_search_index(spark, df, p_raw, k=4).select(
            "query_id", "corpus_id"
        ),
        df,
        df,
        k=2,
        metric="l2",
        integer_scaled=True,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    with _pt.raises(ValueError, match="store_raw"):
        S.ivf_pq_search_index(spark, df, p_bare, k=2, rerank=4).collect()


def test_ivfpq_index_codes_partitioned_by_cell(spark, tmp_path):
    import os

    df = vec_df(spark)
    path = str(tmp_path / "ivfpq")
    S.ivf_pq_build_index(spark, df, path, dim=4, n_cells=3, n_sub=2, n_cent=4)
    data_root = os.path.join(path, "codes", "data")
    batches = os.listdir(data_root)
    assert any(
        d.startswith("cell=")
        for b in batches
        for d in os.listdir(os.path.join(data_root, b))
    )


def test_search_index_cache_keyed_by_corpus_content(spark, tmp_path, monkeypatch):
    """The build-once cache of q_emb_ivfpq_search_index must key on the
    corpus CONTENT (size+mtime fingerprint), not just the path — a corpus
    regenerated in place must trigger a rebuild, never silently reuse the
    stale index built from the old vectors."""
    import glob
    import os
    import shutil
    import tempfile

    from cdk_datalake_analytics_comercial_spark.plans.docs import (
        q_emb_ivfpq_search_index,
    )

    sf_dir = tmp_path / "sfX"
    sf_dir.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/embeddings.parquet",
        sf_dir / "embeddings.parquet",
    )
    # route the index scratch space into this test's tmp dir
    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path / "scratch"))
    os.makedirs(str(tmp_path / "scratch"), exist_ok=True)

    first = sorted(
        tuple(r) for r in q_emb_ivfpq_search_index(spark, str(sf_dir)).collect()
    )
    built = glob.glob(str(tmp_path / "scratch" / "spark_graft_ivfpq_*"))
    assert len(built) == 1
    # same content → same key → reuse (no second index dir)
    q_emb_ivfpq_search_index(spark, str(sf_dir)).collect()
    assert len(glob.glob(str(tmp_path / "scratch" / "spark_graft_ivfpq_*"))) == 1
    # "regenerate" the corpus in place: same path, new mtime → new key
    os.utime(sf_dir / "embeddings.parquet", (1, 1))
    again = sorted(
        tuple(r) for r in q_emb_ivfpq_search_index(spark, str(sf_dir)).collect()
    )
    assert len(glob.glob(str(tmp_path / "scratch" / "spark_graft_ivfpq_*"))) == 2
    assert again == first  # identical bytes → identical results
