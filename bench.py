"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed against the ``noop`` sink so the *full* plan runs
(a count() would let Catalyst prune the projections away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the operator families that dominate 100 TB workloads —
# wide aggregation, join chains, windows, rolling metrics, dedup sketches,
# text analysis, similarity search, event sessionization.
HEADLINE = [
    "pricing_summary",
    "sales_enrichment",
    "multikey_join",
    "rolling_3m_window",
    "rolling_12m_window",
    "top1_join",
    "nation_stats",
    "brand_revenue",
    "monthly_share",
    "period_pruned_sales",
    "salted_agg",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "text_token_stats",
    "text_lang_id",
    "text_quality",
    "text_repetition",
    "doc_pack",
    "doc_chunks",
    "corpus_filter",
    "doc_length_histogram",
    "decontam_overlap",
    "stratified_fixed_k",
    "tfidf_keywords",
    "quality_classifier",
    "pii_scrub",
    "dq_report",
    "emb_cosine_topk",
    "emb_pq_topk",
    "emb_ivfpq_topk",
    "emb_ivfpq_residual_topk",
    "emb_lsh_multitable",
    "emb_near_dup",
    "events_tumbling",
    "events_sliding",
    "events_sessions",
    "events_asof_error",
    "events_funnel",
    "events_hll_users",
    "small_quantity_revenue",
    "sales_rollup",
    "late_orders_exists",
    "latest_order_agg",
    "status_priority_pivot",
    "customer_value_deciles",
    "cube_status_priority",
    "order_timeline",
    "monthly_gap_fill",
    "monthly_interpolate",
    "approx_distinct_kmv",
    "approx_distinct_hll",
]


def main() -> None:
    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.plans import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing + the Python (Arrow UDF) worker pool so
    # per-query times measure the plans, not one-time process startup
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd

    spark.range(64).repartition(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # three passes per query, keep the min (timeit-style): damps transient
    # host noise — the machine is multi-tenant and single runs vary 2-3×
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    _append_history(timings, total, sf)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


def _append_history(timings: dict[str, float], total: float, sf: str) -> None:
    """Persist per-query history (BENCH_HISTORY.jsonl next to this file) and
    emit a regression diff vs the previous same-sf entry to stderr — the
    single JSON line on stdout stays the driver contract. Host noise is
    ±50%, so only ≥2× moves are flagged."""
    import datetime
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    hist_path = os.path.join(here, "BENCH_HISTORY.jsonl")
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=here,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        sha = ""
    prev = None
    try:
        with open(hist_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("sf") == sf:
                    prev = rec
    except FileNotFoundError:
        pass
    try:
        with open(hist_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
                            timespec="seconds"
                        ),
                        "sha": sha,
                        "sf": sf,
                        "total": total,
                        "queries": timings,
                    }
                )
                + "\n"
            )
    except OSError:
        return
    if prev:
        moved = []
        for name, sec in timings.items():
            old = prev.get("queries", {}).get(name)
            if old and old > 0 and (sec >= 2 * old or sec <= old / 2):
                moved.append(f"{name}: {old}s -> {sec}s")
        if moved:
            print(
                "bench delta vs "
                + (prev.get("sha") or prev.get("ts", "prev"))
                + ": "
                + "; ".join(moved),
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
