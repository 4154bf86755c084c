"""Recall@k report for the ANN tiers against exact brute-force truth.

Each approximate tier is scored against the exact top-k in the metric it
targets: sign-LSH approximates COSINE; IVF / PQ / IVF-PQ / residual IVF-PQ
approximate L2 (squared). Ground truth is computed driver-side in numpy
over the full embedding table (fine at report scale; the tiers themselves
are the distributed paths).

Usage: python tools/recall_report.py [sf_dir]   (writes markdown to stdout)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

K = 5
N_QUERIES = 20


def main():
    import numpy as np

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.operators import similarity as S
    from cdk_datalake_analytics_comercial_spark.plans.common import t

    spark = get_spark("recall-report")
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

    tiers = [
        (
            "sign-LSH (6 planes)",
            "cosine",
            lambda: S.lsh_bucket_topk(e, q, dim=64, k=K, n_planes=6),
            truth_cos,
        ),
        (
            "sign-LSH multi-table (6 planes x 4 tables)",
            "cosine",
            lambda: S.lsh_multitable_topk(e, q, dim=64, k=K, n_planes=6, n_tables=4),
            truth_cos,
        ),
        (
            "IVF (8 cells, 1 probe)",
            "L2",
            lambda: S.ivf_topk(e, q, dim=64, k=K, n_cells=8),
            truth_l2,
        ),
        (
            "IVF multi-probe (8 cells, 2 probes)",
            "L2",
            lambda: S.ivf_topk(e, q, dim=64, k=K, n_cells=8, n_probe=2),
            truth_l2,
        ),
        (
            "PQ ADC (16×16)",
            "L2",
            lambda: S.pq_topk(e, q, dim=64, k=K, n_sub=16, n_cent=16),
            truth_l2,
        ),
        (
            "IVF-PQ non-residual (8 cells, 16×16)",
            "L2",
            lambda: S.ivf_pq_topk(e, q, dim=64, k=K, n_cells=8, n_sub=16, n_cent=16),
            truth_l2,
        ),
        (
            "IVF-PQ residual (8 cells, 16×16)",
            "L2",
            lambda: S.ivf_pq_residual_topk(
                e, q, dim=64, k=K, n_cells=8, n_sub=16, n_cent=16
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
