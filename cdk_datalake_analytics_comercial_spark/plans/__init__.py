"""Query plan registry: every implemented operator from SURVEY.md §2 (plus
the training-data extensions) exposed as a named query over the synthetic
testdata tables, with a DuckDB oracle SQL where SQL can express it.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name] -> str``
feed ``__spark_entry__.py`` directly.
"""

from . import relational, docs, events

QUERIES = {}
ORACLES = {}
for mod in (relational, docs, events):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# Queries a bounded-sample differential run should hit FIRST: the ones the
# round-3 driver sample did not cover (plus round-4 additions). Everything
# is verified by tools/check_correctness.py at two scales regardless
# (CORRECTNESS_LOCAL_r04_*.json); this ordering just steers any
# enumeration-order sampler toward the least-externally-confirmed entries.
_SAMPLE_FIRST = [
    "emb_ivfpq_residual_topk",
    "emb_lsh_multitable",
    "approx_distinct_hll",
    "events_hll_users",
    "monthly_interpolate",
    "stratified_fixed_k",
    "quality_classifier",
    "pii_scrub",
    "dq_report",
    "emb_cosine_topk",
    "emb_near_dup",
    "emb_clusters",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "emb_ivf_multiprobe",
    "emb_pq_topk",
    "emb_ivfpq_topk",
    "multimodal_features",
    "multimodal_audio",
    "multimodal_frames",
    "multimodal_resize",
    "events_tumbling",
    "events_sliding",
    "events_sessions",
    "events_funnel",
    "events_next_after_error",
    "events_asof_error",
    "dedup_minhash",
    "dedup_simhash_pairs",
]
QUERIES = {
    **{k: QUERIES[k] for k in _SAMPLE_FIRST if k in QUERIES},
    **{k: v for k, v in QUERIES.items() if k not in _SAMPLE_FIRST},
}

__all__ = ["QUERIES", "ORACLES"]
