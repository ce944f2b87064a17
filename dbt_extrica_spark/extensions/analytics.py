"""[EXTENSION] Event-analytics operators: ordered funnels and retention
cohorts — the queries a dbt events model exists to serve.

Both are pure DataFrame compositions (joins + aggregations, no UDFs) and
both define time as integer MICROSECONDS (``unix_micros``), so the DuckDB
oracles compare integers rather than engine-specific timestamp precisions
(the test parquet stores nanoseconds; Spark reads microseconds).

Scale: each funnel step is one groupBy(user) aggregation joined to the
previous step's (user, ts) table — k steps = k shuffles on user_id, each
shrinking (funnels are monotone). Retention is two aggregations on
(user) then (cohort, offset). All shuffle keys are the natural ones; AQE
handles the skewed-user case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel: a user completes step i when an event of
    ``steps[i]`` occurs STRICTLY AFTER their completion time of step i-1
    (first-touch semantics: completion time = the earliest qualifying
    event). Returns (step, event_type, n_users) with step 1-indexed.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    ev = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        F.col(type_col).alias("etype"),
    )
    counts: list[tuple[int, str, int]] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        matched = ev.where(F.col("etype") == step)
        if prev is not None:
            matched = (
                matched.join(prev, on="user_id")
                .where(F.col("t_us") > F.col("prev_t_us"))
            )
        cur = matched.groupBy("user_id").agg(
            F.min("t_us").alias("prev_t_us"))
        cur = cur.persist()
        counts.append((i + 1, step, cur.count()))
        if prev is not None:
            prev.unpersist()
        prev = cur
    if prev is not None:
        prev.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        counts, "step int, event_type string, n_users bigint")


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_date, day_offset) the number of distinct cohort users active
    that day. Returns (cohort_date DATE, day_offset INT, n_users BIGINT);
    day 0 row counts the full cohort."""
    # integer division (Spark `div` == DuckDB `//` for positives): a
    # double-division + cast would ROUND in DuckDB but truncate in Spark
    ev = df.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"unix_micros(`{ts_col}`) div 86400000000").alias("day_idx"),
    )
    first = ev.groupBy("user_id").agg(F.min("day_idx").alias("cohort_idx"))
    joined = (
        ev.join(first, on="user_id")
        .select(
            "user_id", "cohort_idx",
            (F.col("day_idx") - F.col("cohort_idx")).cast("int")
            .alias("day_offset"),
        )
        .distinct()
    )
    if max_offset is not None:
        joined = joined.where(F.col("day_offset") <= max_offset)
    return (
        joined.groupBy("cohort_idx", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"),
                       F.col("cohort_idx").cast("int")).alias("cohort_date"),
            "day_offset",
            F.col("n_users").cast("bigint").alias("n_users"),
        )
    )
