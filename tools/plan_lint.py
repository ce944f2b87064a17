"""Plan-lint the WHOLE battery: build every queries() entry and flag
scale anti-patterns in its physical plan — the automated complement to
PLANS.md's curated evidence. Prints one JSON line.

Flags:
- CartesianProduct            unconditional all-pairs join
- BroadcastNestedLoopJoin     non-equi fallback (allowlisted where it is
                              a deliberate 1-row broadcast aggregate or a
                              bounded contract row)
- BatchEvalPython             row-at-a-time Python UDF in the data plane
                              (Arrow variants MapInPandas / ArrowEval /
                              FlatMapGroupsInPandas are the sanctioned
                              escape hatches and are NOT flagged)

Entries that EXECUTE during build (materializations, streaming
availableNow runs, engine-backed models) return their final read plan;
the lint sees the read side only — their write paths are covered by the
oracle gates instead.

Usage: python tools/plan_lint.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BroadcastNestedLoopJoin allowlist: deliberate tiny-side shapes, each a
# 1-row broadcast aggregate / contract row / scalar threshold join whose
# build side is provably bounded (see the entry's docstring).
BNLJ_OK = {
    "q15_top_supplier",          # scalar MAX(total_revenue) threshold row
    "q22_global_sales_opportunity",  # scalar avg-acctbal subquery row
    "q11_important_stock",       # scalar total-stock threshold row
    "q20_excess_inventory",      # correlated agg rewritten w/ scalar rows
    "q_scalar_subquery",         # the scalar-subquery pattern itself
    "text_bm25_topk",            # 1-row corpus stats broadcast
    "text_tfidf_terms",          # 1-row N (corpus size) broadcast
    "text_chi2_terms",           # 1-row N (corpus size) broadcast
    "ann_brp_recall",            # 1-row recall contract aggregate
    "ann_pq_recall",             # 1-row recall contract aggregate
    "ann_recall_report",         # 1-row recall contract aggregate
    "dedup_simhash_contract",    # 1-row contract aggregate
    "embedding_dequant_error",   # 1-row error-bound aggregate
    "sketch_hll_rollup",         # 2% contract vs exact: 1-row compare
    "q_approx_distinct",         # approx-vs-exact 1-row contract
    "q_approx_quantiles",        # approx-vs-exact contract rows
    "sample_boundary",           # boundary contract rows
    "dedup_semantic_kmeans",     # 1-row trained-recall contract
    "dedup_semantic_incremental",  # 1-row contract aggregate
    "pipeline_text_cluster",     # silhouette-style 1-row stats join
    "dq_source_freshness",       # pinned-clock 1-row threshold join
    "stats_welch_ttest",         # 1-row stats x 1-row stats crossJoin
    "eval_cohens_kappa",         # 1-row totals x 1-row prodsum crossJoin
    "dq_cramers_v",              # 1-row cell stats x 1-row level counts
                                 # (welch pattern; cells checkpointed)
    # deliberate ALL-PAIRS shapes (first full-battery sweep, r8):
    "q_theta_join",              # non-equi theta join IS the tested semantics
    "dedup_embedding_cosine",    # exact all-pairs baseline (quadratic
                                 # guardrail raises above 200k rows)
    "ann_cosine_topk",           # brute-force exact baseline by contract;
                                 # scale paths are ivf/pq/brp entries
    "ann_ivf_topk",              # r9 recall contract: the BNLJ is its
                                 # exact brute-force REFERENCE side
                                 # (cosine_topk over the 500-row corpus);
                                 # the operator under test joins on cell id
    "ann_pq_topk",               # bounded query batch x codes ADC scoring
                                 # + r9 contract exact-L2 reference
    "ann_ivf_pq_recall",         # r9 IVFADC contract: BNLJ is the exact
                                 # brute-force reference over the bounded
                                 # query set; the operator joins on cid
    "streaming_vector_admission",  # r9: the entry runs exact=True (the
                                 # deterministic oracle-gated reference
                                 # mode — broadcast batch x history
                                 # threshold screen); the scale path is
                                 # blocked cross_cosine_pairs (cell-id
                                 # equi-join), equivalence-tested
    "dedup_semantic_blocked",    # the blocked path joins on cell id; the
                                 # BNLJ is its subset-of-EXACT contract
                                 # reference over the bounded test corpus
    "ann_ivf_pq_durable",        # r10 durable-index contract: BNLJ is the
                                 # exact brute-force reference over the
                                 # bounded 100-query set + the 1-row
                                 # disk==memory / recall contract joins;
                                 # the operator itself joins on cid
    "sketch_qdigest_rollup",     # r10 quantile-sketch contract: BNLJ is
                                 # the crossJoin of 1-row aggregates
                                 # (n, mass, three rank counts); the
                                 # sketch itself is groupBy+applyInPandas
    "graph_triangles",           # r11 contract: BNLJ is the crossJoin of
                                 # 1-row aggregates (n_edges, total,
                                 # per-node incidence sum); the counting
                                 # itself is two equi-joins on apex and
                                 # (b, c)
    "sketch_heavy_hitters",      # r11 contract: BNLJ is the crossJoin of
                                 # the 1-row build/merge (dec, n) stats
                                 # onto the summary rows; the sketch is
                                 # one shuffle + same-partitioning window
    "sketch_heavy_bytes",        # same shape, weighted mass
    "sketch_theta_ops",          # r12 contract: BNLJs are the 1-row
                                 # theta/exact stats crossJoins (set-op
                                 # theta row, exact distinct counts);
                                 # the sketch itself is one distinct +
                                 # per-group window / global top-k
    "text_collocations_pmi",     # r13: the BNLJ is the crossJoin of the
                                 # 1-row total-token count onto the
                                 # support-filtered pair rows (linear,
                                 # one side is a single broadcast row);
                                 # pair/unigram joins are equi
}


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    n_clean = 0
    for name, fn in battery.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - lint must not die mid-sweep
            errors[name] = str(exc)[:200]
            continue
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            hits.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            hits.append("BatchEvalPython")
        if hits:
            flagged[name] = hits
        else:
            n_clean += 1
    print(json.dumps({
        "sf_dir": sf_dir,
        "clean": n_clean,
        "flagged": flagged,
        "errors": errors,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
