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
        # strip exactly ONE closing paren: the argument may itself contain
        # nested calls (e.g. sum(CAST(x AS DECIMAL(18,4)))) — rstrip(')')
        # would eat the nested closers too
        arg = arg.strip()
        if not arg.endswith(")"):
            raise ValueError(f"malformed agg spec {spec!r}")
        arg = arg[:-1].strip()
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


def probe_key_skew(df: DataFrame, group_cols: list[str],
                   sample_mod: int = 100) -> float:
    """Estimate the hottest group key's share of rows from a deterministic
    1/``sample_mod`` hash sample (no RNG — reruns probe identically).
    Costs one scan of the sample + a tiny shuffle; at 100 TB this is the
    cheap pre-pass that decides whether the main aggregation needs
    salting at all."""
    probe = df.where(
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
               F.lit(sample_mod)) == 0
    )
    top = (
        probe.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("mx"), F.sum("__n").alias("total"))
        .first()
    )
    if top is None or not top.total:
        return 0.0
    return float(top.mx) / float(top.total)


def auto_salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    skew_threshold: float = 0.2,
    salt_buckets: int = 16,
    sample_mod: int = 100,
) -> DataFrame:
    """Skew-adaptive aggregation: probe the hottest key's row share on a
    deterministic hash sample; above ``skew_threshold`` use the two-phase
    salted plan, otherwise the plain single-shuffle aggregate (same
    result either way — only the physical shape changes).

    This covers the case AQE cannot re-plan (skewed groupBy keys pin one
    reducer); join skew is left to AQE's runtime skew-join splitting."""
    if probe_key_skew(df, group_cols, sample_mod) >= skew_threshold:
        return salted_agg(df, group_cols, aggs, salt_buckets)
    exprs = [F.expr(spec).alias(out) for out, spec in aggs.items()]
    return df.groupBy(*group_cols).agg(*exprs)
