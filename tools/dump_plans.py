"""Dump formatted physical plans of key queries to PLANS.md — evidence that
the engine produces the plans you'd want at scale (pushdown, pruning,
broadcast chains, partial aggregation, no stray exchanges).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEEP_MARKERS = (
    "PushedFilters", "ReadSchema", "PartitionFilters", "WholeStageCodegen",
    "HashAggregate", "Exchange", "BroadcastHashJoin", "SortMergeJoin",
    "BroadcastNestedLoopJoin", "TakeOrderedAndProject", "Window", "Scan",
    "ReusedExchange", "BroadcastExchange",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark.sources.registry import register_sources
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_sources(spark, sf_dir)

    targets = {
        "q1_pricing_summary (scan pushdown + partial/final agg)": battery._Q1,
        "q5_region_revenue (broadcast dimension chain)": battery._Q5,
        "q3_top_orders (join + TakeOrderedAndProject)": battery._Q3,
        "q_window_rank (single window exchange)": battery._QWIN,
        "q_semi_anti (subqueries -> semi/anti hash joins)": battery._QSEMI,
        "q6_forecast_revenue (every predicate in PushedFilters, one "
        "global agg)": battery._Q6,
        "q19_disjunctive_brackets (OR brackets stay residual on an "
        "equi-join — no nested-loop fallback)": battery._Q19,
        "q2_min_cost_supplier (derived partsupp; correlated min-cost "
        "rewritten to aggregate+join — broadcast dims, no nested loop)":
            battery._Q2,
        "q9_product_profit (6-table profit join: all-broadcast chain, "
        "zero sort-merge)": battery._Q9,
    }
    # DataFrame-built operators: explain through the battery callables
    df_targets = {
        "sample_deterministic (md5-range filter evaluated at the scan)":
            lambda: battery.queries()["sample_deterministic"](spark, sf_dir),
        "text_chunks (HOF chunking: one scan, zero exchanges)":
            lambda: battery.queries()["text_chunks"](spark, sf_dir),
        "pipeline_joint_dedup tail (CC join shape)":
            lambda: battery.queries()["dedup_embedding_cosine"](spark, sf_dir),
        "text_redact_pii (regex projection next to the scan, no exchange)":
            lambda: battery.queries()["text_redact_pii"](spark, sf_dir),
        "text_repetition (codegen HOF projection, no exchange)":
            lambda: battery.queries()["text_repetition"](spark, sf_dir),
        "text_decontaminate (broadcast eval-gram semi shape)":
            lambda: battery.queries()["text_decontaminate"](spark, sf_dir),
        "text_boilerplate_lines (line-keyed agg + join back + doc reassembly)":
            lambda: battery.queries()["text_boilerplate_lines"](spark, sf_dir),
        "embedding_random_projection (fold projection, no exchange)":
            lambda: battery.queries()["embedding_random_projection"](
                spark, sf_dir),
        "text_dup_spans (positional grams -> df agg -> merged-interval window)":
            lambda: battery.queries()["text_dup_spans"](spark, sf_dir),
        "sample_shuffle_shards (scan-side shard expr + per-shard window)":
            lambda: battery.queries()["sample_shuffle_shards"](spark, sf_dir),
        # r12: global sketch top-k must plan as TakeOrderedAndProject
        # (never a 1-partition window); the BNLJs are the 1-row
        # theta/exact contract joins (plan_lint BNLJ_OK)
        "sketch_theta_ops (distinct+truncate KMV builds; global union "
        "as TakeOrderedAndProject; 1-row contract crossJoins)":
            lambda: battery.queries()["sketch_theta_ops"](spark, sf_dir),
        # r12: the rn <= cap filter must plan as map-side
        # WindowGroupLimit (partial top-k before the exchange)
        "sample_cap_per_source (per-key cap: WindowGroupLimit partial "
        "top-k, one exchange per mode)":
            lambda: battery.queries()["sample_cap_per_source"](
                spark, sf_dir),
        # r9: the entry is now a recall CONTRACT — the inner window branch
        # is still the r4 expression-local ivf rewrite (scan ->
        # assignment projection -> ONE Exchange per cogroup branch); the
        # BNLJ above it is the allowlisted exact ground-truth reference
        # over the bounded query set (plan_lint BNLJ_OK)
        "ann_ivf_topk (recall contract: ivf cogroup branches unchanged; "
        "BNLJ = the bounded exact reference side)":
            lambda: battery.queries()["ann_ivf_topk"](spark, sf_dir),
        "embedding_quantize_int8 (single codegen projection, zero exchanges)":
            lambda: battery.queries()["embedding_quantize_int8"](
                spark, sf_dir),
        "text_bm25_topk (term-filter at the scan, 1-row broadcast stats, "
        "small final window)":
            lambda: battery.queries()["text_bm25_topk"](spark, sf_dir),
        "sketch_hll_rollup (two-level mergeable sketch: partial HLL pairs "
        "around each exchange)":
            lambda: battery.queries()["sketch_hll_rollup"](spark, sf_dir),
        # the final assignment pass of Lloyd's: centroids live inside the
        # projection (no BroadcastExchange, no join), so the only shuffle
        # anywhere in an iteration is the (cid, dim) partial/final agg
        "embedding_kmeans (literal-centroid assignment: zero exchanges "
        "in the scoring pass)":
            lambda: battery.queries()["embedding_kmeans"](spark, sf_dir),
        "text_remove_dup_spans (gram-keyed agg + covered-position anti-"
        "join + per-doc reassembly)":
            lambda: battery.queries()["text_remove_dup_spans"](
                spark, sf_dir),
        "text_gopher_rules (all seven rule thresholds in one codegen "
        "projection next to the scan, zero exchanges)":
            lambda: battery.queries()["text_gopher_rules"](spark, sf_dir),
        "text_pack_global (range exchange + per-slice window; NO global "
        "single-partition sort anywhere)":
            lambda: battery.queries()["text_pack_global"](spark, sf_dir),
        "sample_dsir_weights (k-bucket model as literal array: scoring "
        "is one scan, zero exchanges)":
            lambda: battery.queries()["sample_dsir_weights"](spark, sf_dir),
        "text_remove_dup_spans_char (char-gram agg + interval-merge "
        "window + substring-fold rebuild; no k-wide explode)":
            lambda: battery.queries()["text_remove_dup_spans_char"](
                spark, sf_dir),
        "dedup_minhash_incremental (batch bands probe the history band "
        "index; history text touched only for candidate verification)":
            lambda: battery.queries()["dedup_minhash_incremental"](
                spark, sf_dir),
        "sample_leakage_split (component join + md5-range split "
        "expression — no extra shuffle beyond the CC join)":
            lambda: battery.queries()["sample_leakage_split"](
                spark, sf_dir),
        "layout_bucketed_join (co-located fact-fact join: SortMergeJoin "
        "over bucketed scans — ZERO join-side Exchange; the only "
        "shuffle is the final aggregation pair)":
            lambda: battery.queries()["layout_bucketed_join"](
                spark, sf_dir),
        "eval_auc (exact Mann-Whitney AUC: one corpus agg to the "
        "distinct-score table + the two-phase prefix — never a "
        "single-task sort)":
            lambda: battery.queries()["eval_auc"](spark, sf_dir),
        "sketch_ams_f2 (AMS F2: the r sign sums are aggregate "
        "EXPRESSIONS over one scan — no per-row explode; the Generate "
        "reshapes only the statistics row)":
            lambda: battery.queries()["sketch_ams_f2"](spark, sf_dir),
        # r15 showcases
        "layout_hilbert (Hilbert walk: pure codegen bitwise rounds — "
        "ZERO exchanges, zero joins, one scan projection)":
            lambda: battery.queries()["layout_hilbert"](spark, sf_dir),
        "geo_radius_join (grid-blocked spatial join: 9x scan-side "
        "neighbor fanout + ONE cell equi-join, broadcast at this "
        "scale — all-pairs never happens)":
            lambda: battery.queries()["geo_radius_join"](spark, sf_dir),
        "ts_acf (one key window produces ALL lag leads; the lag sums "
        "are aggregate expressions — one partial/final pair)":
            lambda: battery.queries()["ts_acf"](spark, sf_dir),
        "inc_cdc_apply (CDC winners as ONE max_by aggregation pair + a "
        "broadcast anti-join — no window sort over the changelog)":
            lambda: battery.queries()["inc_cdc_apply"](spark, sf_dir),
        "eval_mcc (one scan, ONE map-side-combinable aggregation pair "
        "to four exact confusion cells — nothing else)":
            lambda: battery.queries()["eval_mcc"](spark, sf_dir),
        "ts_ewma (one key window serves every unrolled lag column — "
        "pure codegen weight chain, no per-lag pass)":
            lambda: battery.queries()["ts_ewma"](spark, sf_dir),
    }
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    out = ["# PLANS — formatted physical plans at sf0.1 (evidence)",
           "",
           "Generated by tools/dump_plans.py. Highlights: filters reach the",
           "parquet scan (PushedFilters), reads are column-pruned",
           "(ReadSchema), dimension joins broadcast, aggregates split",
           "partial/final around a single exchange.", ""]
    def emit(title: str, df) -> None:
        plan = df._jdf.queryExecution().explainString(
            jvm_mode.fromString("formatted"))
        kept = [ln for ln in plan.splitlines()
                if any(m in ln for m in KEEP_MARKERS)]
        out.append(f"## {title}\n")
        out.append("```")
        out.extend(ln.rstrip()[:200] for ln in kept)
        out.append("```")
        out.append("")

    for title, sql in targets.items():
        emit(title, spark.sql(sql))
    for title, fn in df_targets.items():
        emit(title, fn())
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
