"""Skew mitigation utilities: salted aggregation and salted joins.

AQE's skew-join handling (on by default, session.py) covers sort-merge joins
at runtime; these helpers cover the cases AQE can't re-plan — skewed
groupBy keys, and broadcast-side salting when one hot key dominates — as
explicit, composable DataFrame transforms.

Pattern (100 TB posture): a hot key that would pin one reducer gets split
across ``salt_buckets`` sub-keys in a first partial pass, then the partials
combine in a second (tiny) pass. Two shuffles of balanced partitions beat
one shuffle with a straggler by a wide margin at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__dbt_salt"


def with_salt(df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Deterministic row salt in [0, salt_buckets): derived from a hash of
    the whole row (no RNG -> reruns produce identical plans/results)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
               F.lit(salt_buckets)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> 'fn(input)' where fn ∈ {count, sum, min,
    max}. Phase 1 aggregates on (group_cols + salt); phase 2 combines
    partials on group_cols alone (count -> sum of partial counts, etc.).
    Exactly the partial/final split Catalyst does for hash aggregates, made
    explicit so the FIRST shuffle is salt-spread."""
    combiner = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = with_salt(df, salt_buckets)
    phase1 = []
    phase2 = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn not in combiner:
            raise ValueError(f"salted_agg supports {sorted(combiner)}, got {fn!r}")
        partial = f"__p_{out}"
        phase1.append(F.expr(f"{fn}({arg})").alias(partial))
        phase2.append(F.expr(f"{combiner[fn]}(`{partial}`)").alias(out))
    step1 = salted.groupBy(*group_cols, SALT_COL).agg(*phase1)
    return step1.groupBy(*group_cols).agg(*phase2)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a salt;
    the right side is exploded ``salt_buckets``× so every (key, salt) pair
    finds its match. Join keys become (on + salt) -> hot keys spread over
    ``salt_buckets`` reducers.

    Right-side replication costs ``salt_buckets``× its size — use when the
    right side is small-ish but too big (or wrong-shaped) to broadcast."""
    # the salt must NOT derive from the join key (same key -> same salt would
    # defeat the spread); a row-position salt balances hot keys evenly
    salted_left = left.withColumn(
        SALT_COL,
        F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )
    exploded_right = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    return salted_left.join(exploded_right, on=on + [SALT_COL], how=how) \
        .drop(SALT_COL)
