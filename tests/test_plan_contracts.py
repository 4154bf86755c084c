"""Physical-plan contracts for the driver-contract queries.

Correctness tests prove the VALUES; these prove the PLANS — the properties
that decide whether a query survives a 100× scale-up: filters reaching the
parquet scan, column pruning, small dims broadcast instead of shuffled,
map-side partial aggregation, no accidental cartesian/nested-loop joins,
and the rolling-window rewrite actually removing shuffles. A regression in
any of these keeps tests green at sf0.001 while quietly wrecking the
1000-executor plan, so they are pinned here.
"""

from __future__ import annotations

import pytest

from cdk_datalake_analytics_comercial_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


# Cross joins that are CORRECT at scale: both sides are metadata-sized by
# construction and the product IS the intended output (not an accidental
# join-degeneration). Anything not listed here still hard-fails.
INTENTIONAL_CROSS = {
    # dense calendar grid: (distinct keys) × (months between global min/max
    # — derived from ONE aggregated row exploded); the product is the gap-
    # filled axis itself, |keys|·|months| rows, broadcast NLJ on purpose
    "monthly_gap_fill",
    "monthly_interpolate",  # same grid construction, interpolation on top
    # scalar-broadcast crossJoins: the build side is ONE aggregated row
    # (anchor date / corpus doc count), so the "nested loop" is a linear
    # stream-side pass — the standard Spark idiom for decorrelated scalars
    "customer_rfm",
    "doc_rarity",
    "orders_abc_pareto",
    "idle_rich_customers",  # scalar avg balance: 1-row build side
    "temperature_mix",  # scalar max-group count: 1-row build side
    "part_affinity",  # scalar order count: 1-row build side (r11 — the
    # eager .count() during plan build became the anchor crossJoin)
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_nested_loop_join(spark, name):
    """No query may degenerate into CartesianProduct/BroadcastNestedLoopJoin
    — the two shapes that are quadratic at scale. Every non-equi predicate
    (range self-joins, when()-in-key, LSH band matches) must ride on an
    extractable equi component. The only exemptions are the explicitly
    intentional bounded-grid cross joins in INTENTIONAL_CROSS."""
    if name in INTENTIONAL_CROSS:
        pytest.skip("intentional bounded-grid cross join (see INTENTIONAL_CROSS)")
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_gap_fill_grid_sides_are_bounded(spark):
    """The exempted cross join's inputs must stay metadata-sized: the month
    axis comes from ONE aggregated row (bounds) exploded — if someone
    rewires it to explode per fact row, this catches it."""
    from cdk_datalake_analytics_comercial_spark.plans.relational import (
        q_monthly_gap_fill,
    )

    plan = (
        q_monthly_gap_fill(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the broadcast side of the NLJ is the exploded-bounds month axis
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # months derive from a global min/max aggregate (single-row input)
    assert "Generate explode" in plan or "Generate" in plan


def test_period_filter_pushdown_and_column_pruning(spark):
    """The sargable period rewrite reaches the parquet scan as a range and
    unused wide columns (l_comment) are pruned from ReadSchema."""
    plan = _plan(spark, "period_pruned_sales")
    assert "PushedFilters: [" in plan
    # upper bound plans as LessThan(next-month) or LessThanOrEqual(last-day)
    assert "GreaterThanOrEqual" in plan and "LessThan" in plan
    assert "l_comment" not in plan


def test_small_dims_broadcast(spark):
    """Star-join enrichments must broadcast the dims, never shuffle the fact
    side: ≥1 BroadcastHashJoin in brand_revenue, all 3 dim joins broadcast
    in sales_enrichment, and no SortMergeJoin anywhere in either."""
    br = _plan(spark, "brand_revenue")
    se = _plan(spark, "sales_enrichment")
    assert br.count("BroadcastHashJoin") >= 1
    assert se.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in se


def test_partial_aggregation_split(spark):
    """pricing_summary must show the map-side combine: a partial
    HashAggregate below the exchange and a final one above (2 nodes), plus
    the scan-level filter pushdown."""
    plan = _plan(spark, "pricing_summary")
    assert plan.count("HashAggregate") == 2
    assert "PushedFilters: [" in plan


def test_rolling_window_rewrite_halves_shuffles(spark):
    """The rangeBetween window form of the rolling 3-month metric must plan
    strictly fewer exchanges than the reference's range self-join form —
    that delta is the point of the rewrite (J5 → W, SCALE.md)."""
    join_form = _plan(spark, "rolling_3m").count("Exchange")
    window_form = _plan(spark, "rolling_3m_window").count("Exchange")
    assert window_form < join_form
    assert window_form <= 3


def test_hash_sample_is_shuffle_free(spark):
    """Deterministic md5-threshold sampling is a pure partition-local
    filter: zero exchanges in the plan."""
    assert _plan(spark, "stratified_sample").count("Exchange") == 0


def test_quantiles_single_shuffle(spark):
    """Grouped exact percentiles: one exchange on the group key, partial +
    final aggregate pair."""
    plan = _plan(spark, "doc_quantiles")
    assert plan.count("Exchange") == 1
    assert plan.count("ObjectHashAggregate") == 2


def test_emb_near_dup_never_collects_to_driver(spark):
    """The all-pairs near-dup plan must build without any driver-side
    materialization (the 100 TB bar: no corpus collect). Building the plan
    with DataFrame.collect patched to raise proves the operator is fully
    lazy; the physical plan must carry the grouped-pandas kernel."""
    from unittest import mock

    from pyspark.sql import DataFrame

    with mock.patch.object(
        DataFrame, "collect",
        side_effect=AssertionError("driver-side collect in plan build"),
    ):
        df = QUERIES["emb_near_dup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_scan_prunes_to_payload_columns(spark):
    """The mapInPandas decode stages must not widen the parquet scan: only
    (doc_id, text) reach the documents ReadSchema — lang/source/etc. stay
    pruned even though the table carries them."""
    for name in ("multimodal_features", "multimodal_audio", "multimodal_frames"):
        plan = _plan(spark, name)
        scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scan, name
        assert "lang" not in scan[0] and "source" not in scan[0], (name, scan[0])
        assert "doc_id" in scan[0] and "text" in scan[0]


def test_embedding_scan_prunes_to_vector_columns(spark):
    for name in ("emb_near_dup", "emb_lsh_topk", "emb_cosine_topk"):
        plan = _plan(spark, name)
        scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scans, name
        for ln in scans:
            assert "vec_id" in ln and "embedding" in ln, (name, ln)


def test_doc_pack_single_window_shuffle(spark):
    """Sequence packing is ONE stratum-keyed exchange feeding the window —
    a second exchange would mean the cumsum re-partitioned needlessly."""
    plan = _plan(spark, "doc_pack")
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan


def test_doc_chunks_shuffle_free(spark):
    """Chunk math is per-row: the whole query must run without any
    exchange (scan → project → explode → project)."""
    plan = _plan(spark, "doc_chunks")
    assert "Exchange" not in plan, plan


def test_corpus_filter_shuffle_free_single_scan(spark):
    """The survivor filter composes per-row signals only — no exchange, and
    unused wide columns (text payload siblings) never reach the output."""
    plan = _plan(spark, "corpus_filter")
    assert "Exchange" not in plan, plan


def test_text_repetition_two_aggregate_shuffles(spark):
    """The bigram mode is explode → (doc,gram) agg → (doc) agg: two
    aggregate exchanges plus the line-stats join — bounded, never a self
    join. Allow ≤4 exchanges (AQE may add a join-side exchange)."""
    plan = _plan(spark, "text_repetition")
    assert plan.count("Exchange") <= 4, plan
    assert "CartesianProduct" not in plan


def test_query_builders_never_run_eager_actions(spark, monkeypatch):
    """Building a query plan must be FREE: no .count()/.collect()/
    .take() inside any registry builder (an eager action during plan
    build runs a full Spark job before the query even starts — the
    part_affinity n_orders count the r10 verdict flagged). Scalar
    anchors are the 1-row broadcast crossJoin idiom instead. Builders
    with a legitimate driver-side materialization step (fixture build,
    persisted index construction) are excluded and documented below."""
    from pyspark.sql import DataFrame

    # these builders materialize a FIXTURE or persisted index on first
    # call (cached across calls), which is driver-side by design — the
    # query plan itself is still action-free on the cache-hit path
    fixture_builders = {
        name
        for name in QUERIES
        if name.startswith(("sql_", "txlog_", "emb_ivfpq_search"))
        or "incremental" in name
    }

    def boom(self, *a, **k):
        raise AssertionError("eager action during plan build")

    for action in ("count", "collect", "take", "head", "first", "toPandas"):
        monkeypatch.setattr(DataFrame, action, boom)
    for name in sorted(QUERIES):
        if name in fixture_builders:
            continue
        QUERIES[name](spark, SF)  # must not raise


def test_top1_agg_twin_combines_map_side(spark):
    """The struct-max W1 rewrite must plan a partial_max BEFORE its
    exchange (shuffle carries one candidate per key per map partition),
    while the window form necessarily shuffles every row un-aggregated."""
    agg_plan = _plan(spark, "latest_order_agg")
    assert "partial_max(struct" in agg_plan
    win_plan = _plan(spark, "latest_order_per_customer")
    assert "partial_" not in win_plan and "RunningWindowFunction" in win_plan or "Window" in win_plan
