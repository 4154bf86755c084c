"""Physical-plan audit over the whole query registry.

For every ``queries()`` entry, compiles the plan at the given sf dir (no
execution) and reports the scale-relevant shape: shuffle count, join
strategies, parquet filter pushdown, whole-stage-codegen spans, and
Python/Arrow stages. Writes PLAN_AUDIT.md — the artifact behind the
"would this plan survive 100×?" review (plan-contract tests pin the
invariants; this shows the whole surface at a glance).

Usage: python tools/plan_report.py [sf_dir] [out_md]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def audit_plan(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchanges": count(r"Exchange hashpartitioning")
        + count(r"Exchange rangepartitioning"),
        "broadcasts": count(r"BroadcastExchange"),
        "bhj": count(r"BroadcastHashJoin"),
        "smj": count(r"SortMergeJoin"),
        "shj": count(r"ShuffledHashJoin"),
        "bnlj": count(r"BroadcastNestedLoopJoin") + count(r"CartesianProduct"),
        "pushed": count(r"PushedFilters: \[[^\]]"),
        # codegen spans print as "WholeStageCodegen (n)" in formatted mode
        # and as "*(n)" operator prefixes in toString() — count distinct ids
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python": count(r"ArrowEvalPython")
        + count(r"MapInPandas")
        + count(r"FlatMapGroupsInPandas")
        + count(r"BatchEvalPython"),
    }


# Bounded-grid cross joins declared intentional (mirror of
# tests/test_plan_contracts.INTENTIONAL_CROSS): both sides metadata-sized
# by construction, the product IS the intended output.
INTENTIONAL_CROSS = {
    "monthly_gap_fill": "keys × exploded-bounds month axis (dense calendar grid)",
    "monthly_interpolate": "keys × exploded-bounds month axis (dense calendar grid)",
    "customer_rfm": "scalar anchor date: 1-row broadcast crossJoin (O(n) stream side)",
    "doc_rarity": "scalar corpus doc count: 1-row broadcast crossJoin (O(n) stream side)",
    "orders_abc_pareto": "scalar revenue total: 1-row broadcast crossJoin (O(n) stream side)",
    "idle_rich_customers": "scalar avg balance: 1-row broadcast crossJoin (O(n) stream side)",
    "temperature_mix": "scalar max-group count: 1-row broadcast crossJoin (5-row stream side)",
    "part_affinity": "scalar order count: 1-row broadcast crossJoin (O(n) stream side; replaced the r10 eager .count())",
}

# Queries whose result comes from a DRIVER LOOP over checkpointed rounds
# (connected components): the converged DataFrame compiles to a checkpoint
# scan with ~zero shuffles, which would misreport the real cost. These rows
# are audited as `iterative`: per-ROUND shape × the round bound.
ITERATIVE = {
    "dedup_clusters": ("connected_components", 25),
    "dedup_canonical": ("connected_components", 25),
    "emb_clusters": ("connected_components", 25),
}


def cc_round_audit(spark) -> dict:
    """Physical-plan shape of ONE connected-components round (the unit the
    driver loop repeats ≤max_iter times) — compiled from
    operators.graph.cc_round on a representative edge/label pair."""
    from pyspark.sql import functions as F

    from cdk_datalake_analytics_comercial_spark.operators.graph import cc_round

    edges = spark.range(8).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % 8).alias("v")
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # compile at the AT-SCALE shape: with the demo's tiny inputs Spark
    # would broadcast every side, under-reporting the shuffles a real
    # round pays
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = cc_round(edges, labels)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return audit_plan(plan)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.md"

    from cdk_datalake_analytics_comercial_spark.core import get_spark
    from cdk_datalake_analytics_comercial_spark.plans import QUERIES

    spark = get_spark()
    round_audit = cc_round_audit(spark)
    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit_plan(plan)
            if name in ITERATIVE:
                op, bound = ITERATIVE[name]
                a = dict(round_audit)
                a["iterative"] = f"{op} ≤{bound} rounds"
            rows.append((name, a))
        except Exception as exc:  # pragma: no cover - report, don't die
            rows.append((name, {"error": str(exc)[:80]}))

    lines = [
        "# PLAN_AUDIT — physical-plan shape of every registry query",
        "",
        f"Compiled (not executed) against `{sf}`. Columns: shuffle exchanges,",
        "broadcast exchanges, join strategy counts (BHJ/SMJ/SHJ), quadratic",
        "joins (BNLJ+cartesian — must be 0), scans with pushed filters,",
        "whole-stage-codegen spans, Python/Arrow stages (deliberate kernels",
        "only). Regenerate: `python tools/plan_report.py`.",
        "",
        "Driver-loop queries are marked `iterative`: their numbers are the",
        "PER-ROUND plan shape (one Hash-Min + pointer-jump round), repeated",
        "up to the stated round bound — the converged DataFrame is a",
        "checkpoint scan whose 0-shuffle plan would misstate the cost.",
        "",
        "Queries that barrier a shared subtree behind a lazy localCheckpoint",
        "(the r13 shared-subtree materializations) compile that subtree to a",
        "single `Scan ExistingRDD` node, so its internal scans/exchanges/",
        "pushed filters are NOT counted here — the committed",
        "plans/r13/<query>_{before,after}.txt files carry the full shapes.",
        "",
        "| query | mode | shuffles | bcast | BHJ | SMJ | SHJ | quadratic | pushed | codegen | python |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | ERROR: {a['error']} | | | | | | | | | |")
            continue
        mode = f"iterative ({a['iterative']})" if "iterative" in a else "1-shot"
        lines.append(
            f"| {name} | {mode} | {a['exchanges']} | {a['broadcasts']} | {a['bhj']} | "
            f"{a['smj']} | {a['shj']} | {a['bnlj']} | {a['pushed']} | "
            f"{a['codegen']} | {a['python']} |"
        )
    total_quad = sum(
        a.get("bnlj", 0) for name, a in rows if name not in INTENTIONAL_CROSS
    )
    intentional = sum(
        a.get("bnlj", 0) for name, a in rows if name in INTENTIONAL_CROSS
    )
    lines += [
        "",
        f"Total quadratic joins across the registry: **{total_quad}** "
        "(enforced 0 by tests/test_plan_contracts.py)"
        + (
            f", plus {intentional} INTENTIONAL bounded-grid cross join(s): "
            + "; ".join(f"{k} — {v}" for k, v in INTENTIONAL_CROSS.items())
            + " (sides proven metadata-sized by "
            "tests/test_plan_contracts.test_gap_fill_grid_sides_are_bounded)."
            if intentional
            else "."
        ),
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}: {len(rows)} queries, quadratic={total_quad}")


if __name__ == "__main__":
    main()
