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
