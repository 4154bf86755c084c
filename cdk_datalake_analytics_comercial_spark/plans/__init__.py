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

# Queries a bounded-sample differential run should hit FIRST (the driver
# samples the first 50 in enumeration order): the 7 with no driver row in
# ANY of rounds 1-6, then this round's new queries, then the least-
# recently-sampled (last seen r2-r4). Everything is verified by
# tools/check_correctness.py at two scales regardless
# (CORRECTNESS_LOCAL_r*); this ordering just steers the bounded sampler
# toward the least-externally-confirmed entries.
_SAMPLE_FIRST = [
    # new in round 13 (never driver-sampled)
    "sql_merge_evolution",
    "sql_copy_into",
    "sql_generated_pruning",
    "sql_widening_lifecycle",
    "sql_delete_exists",
    # new in round 12 (never driver-sampled)
    "sql_merge_conditional",
    "sql_replace_where",
    "sql_convert_in_place",
    "sql_delete_in_subquery",
    # new in round 11 (driver-sampled once at most)
    "sql_txlog_dml",
    "sql_insert_overwrite_dynamic",
    "sql_time_travel",
    "sql_ddl_lifecycle",
    "sql_zorder_pruning",
    # new in round 10
    "txlog_changes_batch",
    "sql_pushdown_lookup",
    # new in round 9 (driver-sampled once at most)
    "sql_regional_supplier_volume",
    "sql_txlog_snapshot",
    # new in round 8 (driver-sampled once at most)
    "dedup_incremental_probe",
    "multimodal_mp3_decode",
    # never driver-sampled in rounds 1-6
    "disjunctive_revenue",
    "idle_rich_customers",
    "promo_revenue_share",
    "corpus_shuffle",
    "length_bucket_batches",
    "temperature_mix",
    "emb_ivfpq_search_index",
    # new in round 7
    "top_supplier",
    "part_promo_suppliers",
    "waiting_suppliers",
    "multimodal_mp4_probe",
    "multimodal_mp4_keyframes",
    "multimodal_mp3_probe",
    "dedup_paragraphs",
    # least-recently driver-sampled (r2-r4)
    "approx_distinct_hll",
    "brand_revenue",
    "cast_projection",
    "dedup_minhash",
    "dedup_simhash_pairs",
    "dq_report",
    "emb_clusters",
    "emb_cosine_topk",
    "emb_ivf_multiprobe",
    "emb_ivf_topk",
    "emb_ivfpq_residual_topk",
    "emb_ivfpq_topk",
    "emb_lsh_multitable",
    "emb_lsh_topk",
    "emb_near_dup",
    "emb_pq_topk",
    "events_asof_error",
    "events_funnel",
    "events_hll_users",
    "events_next_after_error",
    "events_sessions",
    "events_sliding",
    "events_tumbling",
    "fn_transforms",
    "full_outer_coalesce",
    "hierarchy_flatten",
    "latest_order_per_customer",
    "left_anti",
    "magic_dates",
    "max_representative",
    "monthly_interpolate",
    "monthly_share",
    "multikey_join",
    "multimodal_audio",
    "multimodal_features",
    "multimodal_frames",
]
QUERIES = {
    **{k: QUERIES[k] for k in _SAMPLE_FIRST if k in QUERIES},
    **{k: v for k, v in QUERIES.items() if k not in _SAMPLE_FIRST},
}

__all__ = ["QUERIES", "ORACLES"]
