"""[EXTENSION] Probabilistic record linkage — Fellegi-Sunter scoring
over blocked candidate pairs.

The classic (Fellegi & Sunter, JASA 1969) decision model behind every
production entity-resolution system (Splink, dedupe.io, hospital MPI
matchers): per comparison field f, agreement multiplies the match
likelihood by m_f/u_f (m = P(agree | same entity), u = P(agree |
different entities)) and disagreement by (1-m_f)/(1-u_f); the product
over fields is the likelihood ratio that thresholds into
match / possible / non_match.

Two repo conventions applied:

- RATIO ranking, never ln(): the textbook formulation sums log2 weights,
  but log differs in the last ulp across libm implementations — the
  product of literal ratios is the SAME ordering computed with only
  IEEE multiplications in a fixed field order, so every score replays
  bit-for-bit in SQL (the PMI-collocations policy).
- Blocking is someone else's job: this scores PAIRS, and the repo
  already ships three candidate-pair families (LSH bands, semantic
  cells, sorted neighborhood) plus plain equality blocking — all-pairs
  never happens here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fellegi_sunter_score(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    fields: list[tuple[str, float, float]],
    upper: float = 20.0,
    lower: float = 0.2,
) -> DataFrame:
    """Score candidate ``pairs`` (id_a, id_b) against ``records`` with
    the Fellegi-Sunter likelihood ratio over ``fields`` = a list of
    (column, m, u) with 0 < u < m < 1 (validated up front — an inverted
    m/u silently flips the decision's direction).

    Agreement is exact equality on the field; a NULL on EITHER side is
    "no information" and contributes factor 1.0 (the standard FS
    missing-data treatment — neither evidence for nor against).
    ``score >= upper`` -> 'match', ``score <= lower`` -> 'non_match',
    else 'possible' (the clerical-review band).

    Returns (id_a, id_b, score, decision, n_agreements).

    Scale shape: two id-keyed joins attach the field tuples to each
    pair side (the pair table is blocking-bounded, never all-pairs);
    the score is a scan-side product of literal ratios — no shuffle
    beyond the joins."""
    if not fields:
        raise ValueError("fellegi_sunter_score needs at least one field")
    for col, m, u in fields:
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"field {col!r}: need 0 < u < m < 1 (match probability "
                f"above chance), got m={m}, u={u}")
    if not (0.0 < lower < upper):
        raise ValueError(f"need 0 < lower < upper, got "
                         f"lower={lower}, upper={upper}")
    cols = [c for c, _, _ in fields]

    def side(alias: str) -> DataFrame:
        return records.select(
            F.col(id_col).alias(alias),
            *[F.col(c).alias(f"{alias}_{c}") for c in cols])

    j = (pairs.select("id_a", "id_b")
         .join(side("id_a"), on="id_a")
         .join(side("id_b"), on="id_b"))
    score = F.lit(1.0)
    agree_n = F.lit(0)
    for c, m, u in fields:
        a, b = F.col(f"id_a_{c}"), F.col(f"id_b_{c}")
        agree = a.isNotNull() & b.isNotNull() & (a == b)
        disagree = a.isNotNull() & b.isNotNull() & (a != b)
        # fixed multiplication order (field list order) — deterministic
        score = score * (F.when(agree, F.lit(m / u))
                         .when(disagree, F.lit((1.0 - m) / (1.0 - u)))
                         .otherwise(F.lit(1.0)))
        agree_n = agree_n + agree.cast("int")
    decision = (F.when(score >= upper, F.lit("match"))
                .when(score <= lower, F.lit("non_match"))
                .otherwise(F.lit("possible")))
    return j.select("id_a", "id_b", score.alias("score"),
                    decision.alias("decision"),
                    agree_n.cast("int").alias("n_agreements"))


def equality_blocking_pairs(records: DataFrame, id_col: str,
                            block_cols: list[str],
                            max_block_size: int | None = None,
                            oversize: str = "raise") -> DataFrame:
    """Plain equality blocking: candidate pairs = all (id_a < id_b)
    within each ``block_cols`` group — the fourth, simplest blocking
    family beside LSH bands / semantic cells / sorted neighborhood,
    right when a trusted coarse key (zip code, nation+segment) exists.
    Rows with a NULL in any block column generate no candidates (no
    block identity). The pair count is sum over blocks of k*(k-1)/2 —
    choose block columns so blocks stay small; the join is one
    block-keyed equi-join, never a cartesian.

    ``max_block_size`` guards the quadratic fanout (the skew story: ONE
    block holding 30% of a 100 TB corpus is 4.5% of all-pairs — the
    exact blowup blocking exists to prevent). When set, per-block
    counts come from one block-keyed aggregation (key-sized, shares the
    join's shuffle key) and blocks larger than the cap follow
    ``oversize``:

    - ``'raise'`` (default): raise_error IN-SCAN on the first oversized
      block — the silently-degraded-recall failure mode is opt-in only;
    - ``'cap'``: deterministically keep the ``max_block_size`` records
      with the smallest (xxhash64(id), id) per oversized block — a
      hash-uniform, rerun-stable subsample. The row_number window sorts
      each block in one task, but its input is the narrow (id, block)
      projection and the oversized block is precisely what was about to
      fan out k^2 pairs — an O(k log k) sort of ids strictly undercuts
      the O(k^2) explosion it prevents.
    """
    if not block_cols:
        raise ValueError("equality_blocking_pairs needs block columns")
    if oversize not in ("raise", "cap"):
        raise ValueError(f"oversize must be 'raise' or 'cap', "
                         f"got {oversize!r}")
    if max_block_size is not None and max_block_size < 1:
        raise ValueError(f"max_block_size must be >= 1, "
                         f"got {max_block_size}")
    base = records.select(F.col(id_col).alias("__id"), *block_cols)
    for c in block_cols:
        base = base.where(F.col(c).isNotNull())
    if max_block_size is not None:
        if oversize == "raise":
            sizes = (base.groupBy(*block_cols)
                     .agg(F.count(F.lit(1)).alias("__bn")))
            # the guard lives in a FILTER (not a dropped projection —
            # Catalyst would prune an unused raise_error column away)
            guard = F.when(
                F.col("__bn") > max_block_size,
                F.expr(
                    "raise_error(concat('equality_blocking_pairs: a "
                    f"block exceeds max_block_size={int(max_block_size)}"
                    " (n=', CAST(__bn AS STRING), ') — widen the block "
                    "key or pass oversize=cap'))").isNull(),
            ).otherwise(F.lit(True))
            base = (base.join(sizes, on=block_cols)
                    .where(guard)
                    .drop("__bn"))
        else:
            from pyspark.sql.window import Window
            w = (Window.partitionBy(*block_cols)
                 .orderBy(F.xxhash64(F.col("__id").cast("string")),
                          F.col("__id")))
            base = (base.withColumn("__r", F.row_number().over(w))
                    .where(F.col("__r") <= max_block_size)
                    .drop("__r"))
    a = base.select(F.col("__id").alias("id_a"),
                    *[F.col(c).alias(f"__ba_{c}") for c in block_cols])
    b = base.select(F.col("__id").alias("id_b"),
                    *[F.col(c).alias(f"__bb_{c}") for c in block_cols])
    cond = [F.col(f"__ba_{c}") == F.col(f"__bb_{c}") for c in block_cols]
    cond.append(F.col("id_a") < F.col("id_b"))
    return a.join(b, on=cond).select("id_a", "id_b")
