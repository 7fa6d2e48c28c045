#!/usr/bin/env python
"""Regenerate PLANS.md: curated `.explain("formatted")` excerpts for
flagship queries, so the physical plan shapes the SCALE.md narrative
describes are inspectable without running anything. Usage::

    python scripts/dump_plans.py   # rewrites PLANS.md at the repo root
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamicqueryengine_spark import (  # noqa: E402
    RuleDefinition,
    apply_rule,
    get_spark,
)
from dynamicqueryengine_spark.sources.registry import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
MAX_LINES = 48

SHOWCASES = [
    (
        "Rule filter: pushdown + pruning",
        "Compiled rule predicates reach the parquet scan as PushedFilters; "
        "ReadSchema carries only referenced columns. One stage, no shuffle.",
        "rule_pushdown",
    ),
    (
        "join_revenue_by_nation: broadcast star join",
        "Three dimension broadcasts, fact streams, ONE aggregation "
        "exchange — the star-join plan that scales with the fact scan.",
        "join_revenue_by_nation",
    ),
    (
        "events_dau_wau: explode-to-covered-days (r5 fix)",
        "The trailing-week distinct is a Generate(explode(sequence)) + "
        "hash aggregation — no BroadcastNestedLoopJoin anywhere (the r4 "
        "theta-join planned one).",
        "events_dau_wau",
    ),
    (
        "agg_rollup_returnflag_status: one-scan Expand",
        "ROLLUP = a single Expand (3 projections/row) over ONE scan "
        "feeding one aggregation — never a per-grouping union of scans.",
        "agg_rollup_returnflag_status",
    ),
    (
        "events_trailing_week_sum: interval RANGE frame",
        "Per-user running frame over pre-aggregated days: one keyed "
        "window exchange, frame evaluated incrementally — no self-join.",
        "events_trailing_week_sum",
    ),
    (
        "ann_topk_ivfpq: cell-equijoined ADC scan",
        "The PQ code scan hash-joins the broadcast query+LUT side on the "
        "IVF cell id — candidates bounded by probed cells, never the "
        "flat all-pairs nested loop.",
        "ann_topk_ivfpq",
    ),
    (
        "docs_bpe_encode: shuffle-free tokenizer apply",
        "Frozen-merge BPE is pure scan-time projection: the only exchange "
        "is the deliberate round-robin spread of the single-file input.",
        "docs_bpe_encode",
    ),
    (
        "quality_constraint_report: one-pass contract + FK anti-join",
        "Row-level checks and uniqueness share one aggregation pass "
        "(multi-distinct via Expand); the FK check is the single keyed "
        "anti-join.",
        "quality_constraint_report",
    ),
    (
        "events_peak_concurrency: bucketed sweep-line running sum (r6 fix)",
        "The boundary stream's running sum is a two-level prefix sum: the "
        "big Window is hashpartitioned by time bucket (_bkt); the only "
        "single-partition exchanges feed the buckets-row offset window "
        "and the 1-row bounds broadcast — never the full stream (r5 "
        "flagged the global orderBy window this replaces).",
        "events_peak_concurrency",
    ),
    (
        "agg_grouping_sets_mixed: arbitrary sets, one Expand (r6)",
        "GROUPING SETS {(rf,ls),(prio),()} over the lineitem⋈orders join "
        "compiles to ONE Expand into a single hash aggregate — one scan "
        "of each table, never a per-set union of GROUP BYs.",
        "agg_grouping_sets_mixed",
    ),
    (
        "join_market_share_q8: 5-dim star with single-pass ratio (r7)",
        "Four broadcast hash joins feed the lineitem scan (part/supplier/"
        "nation/region filtered FIRST), the only wide shuffles are the "
        "two fact equijoins, and the market share is a conditional-sum / "
        "total-sum ratio in ONE aggregation — no self-join, no second "
        "scan.",
        "join_market_share_q8",
    ),
    (
        "events_attribution_time_decay: per-user range equijoin (r7)",
        "Purchases ⋈ touches joins ON user_id (hash equijoin) with the "
        "7-day ts band as a residual predicate — never a nested loop — "
        "then one per-purchase window normalizes the exact power-of-two "
        "weights and the aggregate lands on the channel space.",
        "events_attribution_time_decay",
    ),
    (
        "docs_paragraph_dedup: map-side chunking + fingerprint rollup (r9)",
        "Word-chunk 'paragraphs' are a pure Generate(explode) map stage "
        "over the scan; the duplicated-fraction rollup is two "
        "fingerprint-keyed aggregations and one per-doc aggregation — "
        "no windows, no cartesian anywhere.",
        "docs_paragraph_dedup",
    ),
    (
        "docs_lm_perplexity: bigram-LM scoring with keyed model joins (r9)",
        "The LM's bigram/context tables join the scoring stream on "
        "(prev,cur)/(prev) — broadcast hash joins here; the only "
        "nested-loop is the single-row vocab-size scalar. Per-doc sums "
        "run over integer micro-nats, so the rollup is a plain exact "
        "hash aggregate.",
        "docs_lm_perplexity",
    ),
    (
        "agg_important_parts_q11: HAVING vs scalar fraction (r9)",
        "The grand total aggregates FROM the per-part result and AQE "
        "reuses the per-part exchange — one physical lineitem pass "
        "feeding both branches, threshold compared in exact scaled "
        "decimal.",
        "agg_important_parts_q11",
    ),
    (
        "join_vt_stats_advisor: manifest-stats-chosen broadcast (r9)",
        "The cost-based advisor read both tables' manifest bytes and "
        "hinted the kilobyte dim side broadcast — a BroadcastHashJoin "
        "with no shuffle of the fact scan, chosen from metadata Catalyst "
        "cannot see behind a plain parquet read.",
        "join_vt_stats_advisor",
    ),
    (
        "events_approx_aggregates: sampled aggregate, map-side cut (r9)",
        "The deterministic hash-Bernoulli sample is a Filter directly on "
        "the scan — unsampled rows never reach the single aggregation "
        "exchange; the Horvitz-Thompson estimate and its standard errors "
        "are plain projections after the aggregate.",
        "events_approx_aggregates",
    ),
    (
        "join_local_supplier_volume_q5: 6-table snowflake, dims all broadcast (r12)",
        "Five BroadcastHashJoins and zero sort-merge joins: region→nation→"
        "customer→supplier chain broadcasts around the lineitem probe, the "
        "one-year window pushes to the orders scan, and the cross-dimension "
        "c_nationkey = s_nationkey equality rides IN the supplier join "
        "condition so Catalyst can reorder the chain.",
        "join_local_supplier_volume_q5",
    ),
    (
        "Column-mapped read: pushdown through the rename alias (r12)",
        "After RENAME COLUMN (metadata-only), the LOGICAL predicate "
        "reaches the parquet scan translated to the PHYSICAL name "
        "(PushedFilters on `value`, not `amount`), ReadSchema carries "
        "only physical columns, and the rename's projection collapses "
        "into the scan — a rename costs nothing at read time.",
        "mapped_read_pushdown",
    ),
]


def main() -> None:
    spark = get_spark(
        "plan-dump", cpus="4",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = [
        "# PLANS — flagship physical plans (`.explain(\"formatted\")`)",
        "",
        "Generated by `scripts/dump_plans.py` at sf0.001 (plan SHAPES are",
        "scale-invariant; AQE may re-plan sizes at runtime). Excerpts are",
        f"trimmed to {MAX_LINES} lines; SCALE.md carries the full rationale.",
        "",
    ]
    for title, blurb, key in SHOWCASES:
        if key == "rule_pushdown":
            rule = {
                "Conditions": {
                    "Conditions": [
                        {"Property": "c_acctbal", "Operator": "GreaterThan",
                         "Value": 1000},
                        {"Property": "c_mktsegment", "Operator": "NotNull"},
                    ]
                }
            }
            df = apply_rule(
                load_table(spark, SF_DIR, "customer"),
                RuleDefinition.from_dict(rule),
            ).select("c_custkey", "c_mktsegment")
        elif key == "mapped_read_pushdown":
            import tempfile

            from dynamicqueryengine_spark.sources.versioned import (
                vt_optimize,
                vt_read,
                vt_rename_column,
                vt_write,
            )

            t = os.path.join(tempfile.mkdtemp(prefix="plans_cm_"), "t")
            ev = load_table(spark, SF_DIR, "events").select(
                "event_id", "event_type", "value"
            )
            vt_write(spark, t, ev)
            vt_optimize(spark, t, ["value"], n_partitions=2)
            vt_rename_column(t, "value", "amount")
            df = vt_read(spark, t, predicate=("amount", ">=", 100.0))
        else:
            df = qs[key](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines = plan.rstrip().splitlines()
        if len(lines) > MAX_LINES:
            lines = lines[:MAX_LINES] + [
                f"... ({len(plan.splitlines()) - MAX_LINES} more lines)"
            ]
        out += [f"## {title}", "", blurb, "", "```", *lines, "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
