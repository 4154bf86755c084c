"""Recall@k report for the ANN tiers against exact brute-force truth.

Each approximate tier is scored against the exact top-k in the metric it
targets: sign-LSH approximates COSINE; IVF / PQ / IVF-PQ / residual IVF-PQ
approximate L2 (squared). Ground truth is computed driver-side in numpy
over the full embedding table (fine at report scale; the tiers themselves
are the distributed paths).

Two fixtures (VERDICT r4 #3):

- ``[sf_dir]``: the driver's synthetic embeddings — RANDOM vectors, i.e.
  the worst case for every sub-linear tier (no neighborhood structure);
  useful as a floor, useless for parameter guidance.
- ``--clustered [n] [centers]``: a Gaussian-mixture corpus (default 2000
  vectors, 16 centers, dim 64, within-cluster sigma 0.15 vs unit center
  scale) — the shape production embeddings actually have. Parameter
  guidance in SCALE.md comes from THIS fixture.

Usage: python tools/recall_report.py [sf_dir | --clustered]  (markdown to stdout)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

K = 5
N_QUERIES = 20
DIM = 64


def clustered_fixture(spark, n=2000, centers=16, dim=DIM, sigma=0.15, seed=7):
    """Gaussian-mixture embeddings as a (vec_id, embedding, label) frame —
    same schema as the testdata table. Centers ~ N(0,1); points = center
    + N(0, sigma). sigma=0.15 gives well-separated but overlapping-tail
    clusters (typical of encoder output after normalization)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    C = rng.standard_normal((centers, dim))
    assign = rng.integers(0, centers, size=n)
    X = C[assign] + sigma * rng.standard_normal((n, dim))
    rows = [
        (int(i), [float(x) for x in X[i]], f"c{assign[i]}") for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )


def main():
    import numpy as np

    clustered = len(sys.argv) > 1 and sys.argv[1] == "--clustered"

    from pyspark.sql import functions as F

    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.operators import similarity as S
    from cdk_datalake_analytics_comercial_spark.plans.common import t

    spark = get_spark("recall-report")
    if clustered:
        n_vec = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
        n_centers = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        sf_dir = f"clustered fixture: {n_vec} vecs, {n_centers} Gaussian centers"
        e = clustered_fixture(spark, n=n_vec, centers=n_centers).cache()
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)

    rows = sorted(e.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    n = len(ids)

    def exact_topk(metric):
        truth = {}
        norms = np.sqrt((X * X).sum(axis=1))
        for qid in range(N_QUERIES):
            qv = X[ids == qid][0]
            if metric == "l2":
                d = ((X - qv) ** 2).sum(axis=1)
                order = np.lexsort((ids, d))
            else:  # cosine: higher is better
                sim = (X @ qv) / (norms * np.sqrt((qv * qv).sum()))
                order = np.lexsort((ids, -sim))
            truth[qid] = [int(ids[i]) for i in order if ids[i] != qid][:K]
        return truth

    truth_l2 = exact_topk("l2")
    truth_cos = exact_topk("cos")

    def recall(df, truth, cid_col="corpus_id"):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r[cid_col])
        hits = sum(
            len(got.get(qid, set()) & set(t_)) for qid, t_ in truth.items()
        )
        return hits / (K * len(truth))

    # Recommended defaults (the parameter guidance SCALE.md publishes):
    # cells ~= true cluster count (or sqrt(n) when unknown), probe 4;
    # LSH 6 planes with 8 OR-tables; PQ 16 subquantizers x 16 centroids.
    cells = 16
    probes = 4
    tables = 8
    tiers = [
        (
            "sign-LSH (6 planes, 1 table)",
            "cosine",
            lambda: S.lsh_bucket_topk(e, q, dim=DIM, k=K, n_planes=6),
            truth_cos,
        ),
        (
            f"sign-LSH multi-table (6 planes x {tables} tables)",
            "cosine",
            lambda: S.lsh_multitable_topk(
                e, q, dim=DIM, k=K, n_planes=6, n_tables=tables
            ),
            truth_cos,
        ),
        (
            f"IVF ({cells} cells, 1 probe)",
            "L2",
            lambda: S.ivf_topk(e, q, dim=DIM, k=K, n_cells=cells),
            truth_l2,
        ),
        (
            f"IVF multi-probe ({cells} cells, {probes} probes)",
            "L2",
            lambda: S.ivf_topk(e, q, dim=DIM, k=K, n_cells=cells, n_probe=probes),
            truth_l2,
        ),
        (
            "PQ ADC (16x16)",
            "L2",
            lambda: S.pq_topk(e, q, dim=DIM, k=K, n_sub=16, n_cent=16),
            truth_l2,
        ),
        (
            f"IVF-PQ non-residual ({cells} cells, 16x16)",
            "L2",
            lambda: S.ivf_pq_topk(
                e, q, dim=DIM, k=K, n_cells=cells, n_sub=16, n_cent=16
            ),
            truth_l2,
        ),
        (
            f"IVF-PQ residual ({cells} cells, 16x16)",
            "L2",
            lambda: S.ivf_pq_residual_topk(
                e, q, dim=DIM, k=K, n_cells=cells, n_sub=16, n_cent=16
            ),
            truth_l2,
        ),
        (
            "PQ ADC shortlist-50 -> exact re-rank",
            "L2",
            lambda: S.rerank_exact(
                S.pq_topk(e, q, dim=DIM, k=50, n_sub=16, n_cent=16),
                e, q, k=K, metric="l2",
            ),
            truth_l2,
        ),
        (
            f"IVF-PQ residual shortlist-50 -> exact re-rank ({cells} cells)",
            "L2",
            lambda: S.rerank_exact(
                S.ivf_pq_residual_topk(
                    e, q, dim=DIM, k=50, n_cells=cells, n_sub=16, n_cent=16
                ),
                e, q, k=K, metric="l2",
            ),
            truth_l2,
        ),
        (
            "exact brute-force (baseline)",
            "cosine",
            lambda: S.cosine_topk_bruteforce(e, q, k=K),
            truth_cos,
        ),
    ]

    print(f"### ANN recall@{K} vs exact truth — {n} vectors, "
          f"{N_QUERIES} queries, dim 64 ({sf_dir})\n")
    print("| tier | metric | recall@5 | wall (s) |")
    print("|---|---|---|---|")
    for name, metric, fn, truth in tiers:
        t0 = time.time()
        r = recall(fn(), truth)
        dt = time.time() - t0
        print(f"| {name} | {metric} | {r:.3f} | {dt:.1f} |")


if __name__ == "__main__":
    main()
