"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Headline set = the heavy end of the battery: the TPC-H-style pass-through
suite + the data-movement materializations + the M6 extension operators.
Each query executes to completion via a count/collect action.
"""

from __future__ import annotations

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
    "ann_ivf_topk",
    "text_stats",
    "pipeline_clean_corpus",
    "q_asof_join",
    "rollup_hypertable",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = battery.queries()

    # untimed warmups absorb one-time costs (codegen JIT, parquet footer
    # reads, Arrow/py4j init, higher-order-function interpreter classloads)
    # so timings reflect steady-state throughput. The extension operators
    # exercise distinct JVM paths (lambda eval, array kernels, Pandas UDF),
    # so they warm on the tiny sf0.001 copies of the same tables — measured
    # ~4-5s of first-invocation JIT per heavy operator otherwise.
    # NB: tiny-scale (sf0.001) warmups were measured insufficient — the JVM
    # only C2-compiles the lambda interpreter loops after enough iterations,
    # so the heavy operators warm at bench scale (still untimed).
    qs["q1_pricing_summary"](spark, sf_dir).count()
    for wq in ("dedup_minhash", "pipeline_clean_corpus",
               "ann_cosine_topk", "ann_ivf_topk"):
        try:
            qs[wq](spark, sf_dir).count()
        except Exception:
            pass
    # drop persisted intermediates accumulated by the warmup invocations —
    # leftover cached tables cause GC pressure that distorts later timings
    spark.catalog.clearCache()

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
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark.catalog.clearCache()

    print(json.dumps({
        "metric": "headline_queries_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
