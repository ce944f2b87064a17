"""As-of join — a custom operator the Spark DataFrame API lacks (SURVEY
brief: "when the reference has an operator Spark lacks (e.g., as-of join),
implement it as a composition of existing DataFrame ops").

``asof_join(left, right, ...)``: for every left row, attach the latest right
row whose timestamp is <= the left row's (per key, optionally within a
tolerance). The classic point-in-time / trades-vs-quotes join.

Implementation: union both sides tagged, one window pass per key ordered by
(ts, side) with ``last(..., ignorenulls=True)`` carrying right-side values
forward, then keep left rows. ONE shuffle on the key — no range/theta join
explosion, no per-key loops; scales like any windowed aggregation and AQE
handles key skew."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Point-in-interval (range) join: left rows matched to right intervals
    with ``start <= point <= end`` (inclusive), optionally per ``by`` keys.

    A plain non-equi join plans as BroadcastNestedLoop (quadratic). This
    bucketizes: each interval explodes into the fixed-width buckets it
    covers, the point joins its single bucket as an EQUI key, and the exact
    BETWEEN predicate filters within the bucket. Shuffle cost ∝ rows ×
    intervals-per-bucket instead of |left| × |right|. Choose bucket_width
    near the typical interval length."""
    keys = list(by or [])
    w = float(bucket_width)
    r_b = right.withColumn(
        "__b",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / w).cast("long"),
            F.floor(F.col(end_col) / w).cast("long"),
        )),
    )
    l_b = left.withColumn("__b", F.floor(F.col(point_col) / w).cast("long"))
    cond = [l_b["__b"] == r_b["__b"]] + [
        l_b[k] == r_b[k] for k in keys
    ]
    out = (
        l_b.join(r_b, on=cond, how="inner")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
    )
    keep = [l_b[c] for c in left.columns] + [
        r_b[c] for c in right.columns if c not in set(keys)
    ]
    return out.select(*keep)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the most recent right row with
    ``right.on <= left.on`` per ``by`` key (ties: the right row counts —
    ASOF >= semantics). Unmatched left rows keep NULL right values.

    value_cols defaults to all right columns except key/timestamp.
    """
    keys = [by] if isinstance(by, str) else list(by)
    vals = value_cols or [
        c for c in right.columns if c not in set(keys) | {on}
    ]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
          for c in vals],
        F.lit(None).cast("timestamp").alias("__r_ts"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(on),
        *[F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes if c not in set(keys) | {on}],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in vals],
        F.col(on).cast("timestamp").alias("__r_ts"),
    ).select(*[f"`{c}`" for c in l_tag.columns])  # align column order

    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts -> ties match (>=)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
          for c in vals],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__f_ts"),
    )
    out = filled.where(F.col("__is_left") == 1)
    keep_match = F.lit(True)
    if tolerance_seconds is not None:
        keep_match = (
            F.unix_micros(F.col(on).cast("timestamp"))
            - F.unix_micros(F.col("__f_ts"))
        ) <= tolerance_seconds * 1_000_000
    sel = [F.col(c) for c in left.columns]
    for c in vals:
        sel.append(
            F.when(keep_match, F.col(f"__f_{c}"))
            .otherwise(F.lit(None)).alias(f"{c}{suffix}")
        )
    return out.select(*sel)
