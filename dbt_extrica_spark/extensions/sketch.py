"""[EXTENSION] Count-Min Sketch over token streams.

A CMS answers "how often does token X appear?" in O(width x depth) space with
a one-sided error (estimate >= true count) — the sketch a 100 TB pipeline
keeps per shard and merges by cell-wise addition (the counts table IS the
sketch; merging shards = UNION ALL + re-aggregate).

Hash family is md5-derived (first 8 hex chars -> int), so the construction
is reproducible in any engine with md5 — which is what makes the DuckDB
oracle possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_expr(token_col: str, seed: int, width: int) -> str:
    return (
        f"CAST(conv(substring(md5(concat({token_col}, '#', {seed})), 1, 8),"
        f" 16, 10) AS BIGINT) % {width}"
    )


def token_stream(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("token")
    ).where(F.length("token") > 0)


def count_min_sketch(tokens: DataFrame, width: int = 256,
                     depth: int = 4) -> DataFrame:
    """Build the sketch: (d, bucket, c) counts — depth x width cells."""
    rows = tokens.select(
        F.explode(F.expr(
            "array(" + ", ".join(
                f"named_struct('d', {d}, 'bucket', {_bucket_expr('token', d, width)})"
                for d in range(depth)
            ) + ")"
        )).alias("cell")
    )
    return (
        rows.select(F.col("cell.d").alias("d"),
                    F.col("cell.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_estimates(tokens: DataFrame, width: int = 256,
                  depth: int = 4) -> DataFrame:
    """Per distinct token: CMS estimate (min over rows) alongside the exact
    count — estimate >= exact always; equality when no collisions."""
    sketch = count_min_sketch(tokens, width, depth)
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact"))
    probes = exact.select(
        "token", "exact",
        F.explode(F.expr(
            "array(" + ", ".join(
                f"named_struct('d', {d}, 'bucket', {_bucket_expr('token', d, width)})"
                for d in range(depth)
            ) + ")"
        )).alias("cell"),
    ).select("token", "exact",
             F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["d", "bucket"])
        .groupBy("token", "exact")
        .agg(F.min("c").cast("bigint").alias("estimate"))
    )


def hll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               split_col: str, lg_k: int = 12) -> DataFrame:
    """Mergeable distinct-count rollup via Datasketches HLL
    (hll_sketch_agg / hll_union_agg, Spark 3.5+): build one sketch per
    (group, split) — e.g. per (event_type, day) — then MERGE the split
    sketches per group and estimate.

    This two-level shape is the 100 TB pattern: fine-grained sketches are
    tiny (2^lg_k bytes), persist alongside rollup tables, and re-aggregate
    to any coarser grouping WITHOUT rescanning raw data — the sketch analog
    of the rollup-cascade operator. Returns group_cols + (distinct_est
    bigint); the estimate obeys standard HLL error (~1.04/sqrt(2^lg_k),
    well under 2% at lg_k=12)."""
    per_split = (
        df.groupBy(*group_cols, split_col)
        .agg(F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("__sk"))
    )
    return (
        per_split.groupBy(*group_cols)
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(__sk, false))")
             .cast("bigint").alias("distinct_est"))
    )
