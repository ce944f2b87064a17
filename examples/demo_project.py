"""Runnable end-to-end demo: what a reference (dbt-extrica) user's project
looks like on this engine.

    python examples/demo_project.py [sf_dir]

Builds staging views, an incremental fact with merge semantics, an SCD-2
snapshot, a data-quality report, and the M6 corpus-cleaning pipeline; prints
a compact summary of each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_extrica_spark import Engine, Model, get_spark  # noqa: E402
from dbt_extrica_spark import testing  # noqa: E402
from dbt_extrica_spark.extensions import pipeline  # noqa: E402
from dbt_extrica_spark.plans.model import Project  # noqa: E402
from dbt_extrica_spark.plans.runner import run_project  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="demo_project")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, schema="demo")
    eng.register_sources(sf_dir)

    # --- a small model DAG, run in dependency order -----------------------
    models = [
        Model("stg_orders",
              sql="SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate"
                  " FROM {source:orders}",
              config={"materialized": "view"}),
        Model("fct_daily_revenue",
              sql="SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,"
                  " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
                  " AS revenue FROM {ref:stg_orders} GROUP BY 1",
              config={"materialized": "table",
                      "partition_by": ["d"]}),
    ]
    run_project(eng, Project(models), threads=2)
    print("fct_daily_revenue:", eng.table("fct_daily_revenue").count(), "days")

    # --- incremental merge: re-running folds new data in ------------------
    inc = {"materialized": "incremental", "incremental_strategy": "merge",
           "unique_key": "event_id"}
    eng.materialize(Model("events_latest",
                          sql="SELECT event_id, event_type, value FROM"
                              " {source:events}", config=inc))
    eng.materialize(Model("events_latest",
                          sql="SELECT event_id, event_type, value * 1.0 AS"
                              " value FROM {source:events}", config=inc))
    print("events_latest:", eng.table("events_latest").count(), "rows")

    # --- SCD-2 snapshot ----------------------------------------------------
    eng.materialize(Model(
        "events_history",
        sql="SELECT event_id, event_type, value, ts FROM {source:events}",
        config={"materialized": "snapshot", "unique_key": "event_id",
                "strategy": "timestamp", "updated_at": "ts"}))
    print("events_history:", eng.table("events_history").count(), "versions")

    # --- data-quality report ----------------------------------------------
    report = testing.run_checks(spark, [
        {"check": "unique", "table": eng.relation("events_latest")
         .render_unquoted(), "column": "event_id"},
        {"check": "not_null", "table": eng.relation("events_latest")
         .render_unquoted(), "column": "event_id"},
    ])
    report.show(truncate=False)

    # --- M6: corpus cleaning ----------------------------------------------
    docs = spark.table(eng.sources["documents"].render_unquoted())
    cleaned = pipeline.clean_corpus(docs)
    print("clean corpus:", cleaned.count(), "docs,",
          cleaned.agg({"est_llm_tokens": "sum"}).collect()[0][0], "est tokens")

    # --- M6: pretraining curation + leakage-safe split ---------------------
    from dbt_extrica_spark.extensions import dedup, sampling, similarity

    # the synthetic corpus has no sentence punctuation, so give the C4
    # line gate something to keep (same prep as the battery entry)
    prepped = docs.select(
        "doc_id", "source",
        F.concat(F.col("text"),
                 F.lit(" and that is the end of the document.")
                 ).alias("text"))
    packed = pipeline.pretrain_corpus(prepped)
    last = packed.orderBy("doc_id", ascending=False).first()
    stream_tokens = (last["offset"] + last["n_tokens"]) if last else 0
    print("pretrain corpus:", packed.count(), "docs packed,",
          stream_tokens, "tokens in the stream")

    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                      threshold=0.6)
    split = sampling.leakage_safe_split(
        docs, "doc_id", pairs, {"train": 0.8, "val": 0.1, "test": 0.1})
    dist = {r["split"]: r["n"] for r in
            split.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    print("leakage-safe split:", dist)

    # --- M6: persisted vector index ----------------------------------------
    emb = spark.table(eng.sources["embeddings"].render_unquoted())
    cents, posts = similarity.ivf_index_build(emb, "vec_id", "embedding",
                                              n_cells=16)
    hits = similarity.ivf_index_query(
        emb.limit(20), cents, posts, "vec_id", "embedding", k=3, nprobe=4,
        exclude_self=True)  # demo queries the index with its own members
    print("ivf index: queried 20 vectors,", hits.count(), "neighbors")

    print("catalog:", list(eng.generate_docs()["relations"]))
    eng.close()
    spark.stop()


if __name__ == "__main__":
    main()
