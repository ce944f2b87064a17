"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints JSON
lines: an early detail line with the per-query warm/cold maps, then the
warm map re-printed as short per-chunk lines (each a complete parseable
JSON object, so a bounded tail capture keeps whole chunks — r17), then a
COMPACT final line {"metric": "headline_queries_wall", "value": W,
"value_cold": C, "unit": "sec", "n_queries": N, "sf": ...} sized to always
fit a bounded tail capture (the driver parses the LAST line).

Headline set = the heavy end of the battery: the TPC-H-style pass-through
suite + the data-movement materializations + the M6 extension operators.
Each query executes to completion via a count/collect action.

Load-resistance (round-9 verdict #1): the recorded artifact is now
load-resistant BY CONSTRUCTION, not by after-the-fact adjudication —
(a) before starting Spark the harness waits (up to --loadavg-wait sec,
default 300) for 1-min loadavg to drop below --loadavg-max (default 2.0
on a 32-cpu host); if it never does, it proceeds but stamps
loadavg_gate="failed" in both JSON lines so a loaded run is marked at the
source; (b) the warm headline is the MIN per query across --runs warm
passes (default 2), so a transient load spike inflates at most one pass's
copy of each query, never the recorded number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q7_volume_by_nation_year",
    "q10_returned_items",
    "q_window_rank",
    "q_rollup",
    "q_events_lag",
    "q_sessionize",
    "mat_table",
    "inc_merge",
    "inc_merge_partitioned",
    "inc_delete_insert",
    "snapshot_scd2",
    "streaming_window_counts",
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    # ann_ivf_topk_raw (bench-only, defined below) replaces the battery's
    # ann_ivf_topk CONTRACT entry in the headline (round-9 verdict #1b):
    # the contract's wall measures its linear ground-truth pass + recall
    # join, not the operator — the raw shape is the exact operator call the
    # contract wraps (ivf_topk full-table self-search, n_cells=16,
    # nprobe=3), comparable to the r8 headline line (4.66s cold).
    "ann_ivf_topk_raw",
    "text_stats",
    "pipeline_clean_corpus",
    "pipeline_joint_dedup",
    "q_asof_join",
    "rollup_hypertable",
    "embedding_kmeans",
    "text_remove_dup_spans",
    "pipeline_text_cluster",
    "text_gopher_rules",
    "text_pack_global",
    "sample_dsir_weights",
    "pipeline_pretrain_corpus",
    # round 7 additions
    "text_remove_dup_spans_char",
    "dedup_minhash_incremental",
    "sample_leakage_split",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "text_wordlm_logprob",
    # round 8 additions
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "dedup_minhash_groups",
    # round 9 additions: the previously-unbenched r7/r8 entries
    "q4_order_priority",
    "q12_priority_classes",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_excess_inventory",
    "streaming_interval_join",
    "streaming_enrich",
    "multimodal_decode_real",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    "multimodal_resize",
    # round 10 additions: the new coverage entries
    "q_cube",
    "q_unpivot",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    # round 11: the multiLine quote-all CSV gate (the treacherous one)
    "source_csv_roundtrip",
    "graph_pagerank",
    # round 11 addition: mergeable MG heavy hitters (full corpus, ~2s)
    "sketch_heavy_hitters",
    # graph_triangles is deliberately NOT here: its fixed 2000-node fold
    # is density-SATURATED at sf0.1 (14% density, 3.6M triangles), so a
    # headline line would measure a pathological clique-like graph, not
    # the operator; realistic-sparsity scaling evidence lives in
    # tools/scale_probe.py (triangles_x1/x10)
    # ann_ivf_pq_recall / ann_ivf_pq_durable are deliberately NOT here:
    # CONTRACT entries (index build + brute-force ground truth + probe
    # configs), so their wall measures the verification harness, not the
    # operator — the ivf_pq operator cost shows up in scale probes.
    # sketch_theta_ops is deliberately NOT here for the same reason: the
    # entry carries exact countDistinct references for every scope, so
    # its wall is ~half verifier; the sketch itself is one distinct +
    # truncate pass (strictly cheaper than the gated MG line above).
    # streaming_bloom_members / streaming_theta_distinct /
    # streaming_priority_sample / streaming_pca_gram are NOT here:
    # streaming maintenance entries pay checkpoint + micro-batch drain
    # apparatus; their operator cost is bitmap/sketch/state-bounded by
    # construction (unit-test-pinned sizes).
    # round 13: Bloom-accelerated exact blocklist anti-join — a pure
    # operator line (the oracle is an external plain anti-join; no
    # in-entry verifier). sketch_bloom_filter is deliberately NOT here:
    # its output enumerates the per-row exact truth column (contract
    # apparatus), and its probe cost is a strict subset of this line.
    "dedup_bloom_blocklist",
    # round 13: sorted-neighborhood blocking — pure operator line (rank
    # + bucket join + levenshtein verify; oracle is external SQL)
    "dedup_sorted_neighborhood",
    # round 13: ANALYZE-side statistics — both pure operator lines
    # (oracles are external SQL replays)
    "stats_equi_depth_histogram",
    "dq_profile_table",
    # round 13 late batch: all three are pure operator lines (oracles
    # are external SQL replays; no in-entry verifier) — DLT priority
    # sampling (grouped WindowGroupLimit + global TakeOrdered), PMI
    # collocation mining (scan-side bigrams + two aggs), and the
    # hypertable gapfill+locf (one corpus agg + metadata-scale grid)
    "sample_priority_topk",
    "text_collocations_pmi",
    "ts_gapfill_locf",
    # round 13 late batch: robust MAD outlier sweep — pure operator
    # line (exact lower medians, one shuffle; oracle is external SQL)
    "dq_outliers_mad",
    # embedding_pca_gram is deliberately NOT here: its exact mode is
    # the ORACLE apparatus (d^2-explode + DECIMAL sums exist to be
    # SQL-replayable); the production path is the mapInPandas
    # partial-gram fast mode, benched as embedding_pca_gram_fast
    # below (the ann_ivf_topk_raw split).
    "embedding_pca_gram_fast",
    # round 13 late batch: one-pass Pearson cov/corr matrix over four
    # lineitem numerics (stacked gram + broadcast diagonal joins;
    # oracle is an independently formulated per-pair SQL replay)
    "stats_correlation_matrix",
    # round 14: exact Mann-Whitney AUC (two-phase prefix over distinct
    # scores), chi-square drift (reference-quantile buckets), AMS F2
    # sketch + estimate, interpolation gapfill, chi-square term
    # selection, and RAKE keywords — the streaming AMS line stays
    # outside like the other sketch-maintenance entries
    "eval_auc",
    "dq_drift_chi2",
    "sketch_ams_f2",
    "ts_gapfill_interpolate",
    "text_chi2_terms",
    "text_rake_keywords",
    # round 14 batch 2: per-series OLS trend, calibration curve,
    # Simpson mixture diversity, OOV quality scoring, FS record linkage
    "ts_trend_ols",
    "eval_calibration",
    "stats_diversity_simpson",
    "text_oov_rate",
    "link_fellegi_sunter",
    # round 14: bucketed co-located join — the write-once/join-forever
    # strategy line (pays two bucketed writes + the shuffle-free join)
    "layout_bucketed_join",
    # round 15: all ten are pure operator lines (oracles are external
    # SQL / pinned-twin replays; no in-entry verifier) — exact KS drift,
    # Benford digit profile, Welch t, per-class confusion report,
    # ranked-retrieval metrics, ACF, CUSUM changepoint, OHLC rollup,
    # Hilbert layout key, CDC changelog apply
    "dq_ks_test",
    "dq_benford",
    "stats_welch_ttest",
    "eval_f1_multiclass",
    "eval_rank_metrics",
    "ts_acf",
    "ts_cusum",
    "ts_ohlc",
    "layout_hilbert",
    "inc_cdc_apply",
    # round 15 batch 2: grid-blocked spatial radius join, seasonal
    # decomposition (streaming_cdc_apply stays outside like the other
    # foreachBatch maintenance entries — checkpoint apparatus)
    "geo_radius_join",
    "ts_decompose",
    # round 15 batch 3: labeling-QA agreement + embedding-centroid
    # drift — both pure operator lines
    "eval_cohens_kappa",
    "dq_embedding_drift",
    # round 15 batch 4: rolling z-score anomaly bands (pure operator)
    "ts_zscore_anomaly",
    # round 16: rank-sum shift screen, categorical association,
    # Matthews correlation, sliding-window EWMA — all pure operator
    # lines (streaming_cdc_tombstones stays outside like the other
    # foreachBatch maintenance entries — checkpoint apparatus)
    "stats_mannwhitney",
    "dq_cramers_v",
    "eval_mcc",
    "ts_ewma",
]


def _ann_ivf_topk_raw(spark, sf_dir: str):
    """Bench-only raw-operator shape: the exact ivf_topk call that the
    ann_ivf_topk battery contract wraps, WITHOUT the contract's ground
    truth + recall join — so the headline line tracks the operator, not
    the verifier. NOT a battery entry (no oracle); correctness for this
    operator is gated by ann_ivf_topk in CORRECTNESS_r*.json."""
    from dbt_extrica_spark.extensions import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return similarity.ivf_topk(emb, "vec_id", "embedding", k=5,
                               n_cells=16, nprobe=3)


def _embedding_pca_gram_fast(spark, sf_dir: str):
    """Bench-only raw-operator shape: the mapInPandas partial-gram
    FAST path over the same embeddings corpus the embedding_pca_gram
    battery contract covers in exact mode — so the headline tracks the
    production operator, not the d^2-explode oracle apparatus. NOT a
    battery entry (float accumulation order varies with partitioning);
    correctness is gated by embedding_pca_gram's exact oracle plus the
    fast~=exact equivalence unit test."""
    from dbt_extrica_spark.extensions import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return similarity.gram_matrix(emb, "embedding", method="fast")


BENCH_ONLY = {"ann_ivf_topk_raw": _ann_ivf_topk_raw,
              "embedding_pca_gram_fast": _embedding_pca_gram_fast}


def _loadavg_gate(max_load: float, wait_sec: float) -> dict:
    """Wait for a quiet host (1-min loadavg <= max_load), up to wait_sec.
    Never refuses outright — the driver needs SOME artifact — but stamps
    the gate outcome so a run recorded under load carries the mark."""
    waited = 0.0
    start = os.getloadavg()[0]
    while os.getloadavg()[0] > max_load and waited < wait_sec:
        print(f"# loadavg {os.getloadavg()[0]:.2f} > {max_load} — waiting "
              f"({waited:.0f}/{wait_sec:.0f}s)", file=sys.stderr)
        time.sleep(15.0)
        waited += 15.0
    final = os.getloadavg()[0]
    ok = final <= max_load
    if not ok:
        print(f"# WARNING: loadavg still {final:.2f} > {max_load} after "
              f"{waited:.0f}s — proceeding; timings will overstate",
              file=sys.stderr)
    return {"loadavg_gate": "ok" if ok else "failed",
            "loadavg_at_gate": round(final, 2),
            "gate_waited_sec": round(waited, 1),
            "loadavg_before_gate": round(start, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")),
                    help="warm passes; recorded warm value is min-per-query")
    ap.add_argument("--loadavg-max", type=float,
                    default=float(os.environ.get(
                        "SPARK_GRAFT_BENCH_LOADMAX", "2.0")))
    ap.add_argument("--loadavg-wait", type=float,
                    default=float(os.environ.get(
                        "SPARK_GRAFT_BENCH_LOADWAIT", "300")))
    args = ap.parse_args()
    runs = max(1, args.runs)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    gate = _loadavg_gate(args.loadavg_max, args.loadavg_wait)

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(battery.queries())
    qs.update(BENCH_ONLY)

    # One cold pass, then `runs` warm passes:
    # - pass 1 ("cold"): first invocation in the process — includes codegen
    #   JIT, parquet footer reads, Arrow/py4j init, HOF interpreter
    #   classloads. This pass doubles as the warmup (no separate untimed
    #   warmup list, so nothing is silently flattered and a warmup failure
    #   fails the bench loudly).
    # - passes 2..runs+1 ("warm"): steady-state throughput with a hot JVM;
    #   the recorded warm map is the per-query MIN across the warm passes,
    #   so a transient host-load spike can inflate at most one pass.
    # clearCache between queries keeps each timing cold-CACHE (no
    # cross-query CacheManager hits) in every pass; only JIT/page-cache
    # state differs between the passes.
    def run_pass(label: str) -> tuple[dict[str, float], float]:
        timings: dict[str, float] = {}
        total = 0.0
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            timings[name] = round(dt, 3)
            total += dt
            print(f"# [{label}] {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
            spark.catalog.clearCache()
        return timings, total

    load_start = os.getloadavg()
    cold, cold_total = run_pass("cold")
    warm_passes = [run_pass(f"warm{i + 1}") for i in range(runs)]
    warm = {name: min(p[0][name] for p in warm_passes) for name in HEADLINE}
    warm_total = round(sum(warm.values()), 3)
    load_end = os.getloadavg()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Detailed per-query record first (an EARLY line — may exceed a tail
    # capture window; that's fine, it's for humans and archaeology) ...
    print(json.dumps({
        "metric": "headline_queries_detail",
        "queries": warm,
        "queries_cold": cold,
        "warm_pass_totals": [round(p[1], 3) for p in warm_passes],
        "runs": runs,
        "sf": sf_val,
        "loadavg_start": round(load_start[0], 2),
        "loadavg_end": round(load_end[0], 2),
        **gate,
    }))
    # ... then the same WARM per-query map again as short chunked lines
    # (r16 verdict item "what's wrong" #1: the single ~10 KB detail line
    # outgrows a bounded tail capture, so round-over-round per-query
    # comparison saw nothing — only the compact final line parsed, and
    # the visible detail fragment was the COLD map. Each chunk line is a
    # complete JSON object well under 1 KB, so a ~2 KB tail window always
    # holds the final line plus the last chunks intact, and any larger
    # capture holds all of them.) Timing methodology unchanged; this only
    # re-prints already-recorded numbers.
    chunk = 22
    parts = [HEADLINE[i:i + chunk] for i in range(0, len(HEADLINE), chunk)]
    for i, names in enumerate(parts):
        print(json.dumps({
            "metric": "headline_queries_part",
            "part": i + 1,
            "parts": len(parts),
            "unit": "sec",
            "queries": {name: warm[name] for name in names},
        }))
    # ... then a COMPACT final line with no per-query maps, so the LAST
    # line always fits any tail-capture window and stays parseable
    # (round-7 verdict item #1: BENCH_r07.json was parsed:null because the
    # single fat line outgrew the driver's tail window).
    print(json.dumps({
        "metric": "headline_queries_wall",
        "value": warm_total,
        "value_cold": round(cold_total, 3),
        "unit": "sec",
        "n_queries": len(HEADLINE),
        "runs": runs,
        "sf": sf_val,
        "loadavg": round(max(load_start[0], load_end[0]), 2),
        "loadavg_gate": gate["loadavg_gate"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
