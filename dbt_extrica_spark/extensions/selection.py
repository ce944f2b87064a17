"""[EXTENSION] Data selection for pretraining corpora: DSIR importance
weighting (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") re-expressed Spark-first.

DSIR scores every raw document by how target-like its hashed n-gram
profile is: two bag-of-hashed-ngram unigram models (target corpus vs raw
corpus, Laplace-smoothed over ``k`` buckets) give a per-bucket log ratio
``log p_target(b) - log p_raw(b)``; a document's log importance weight is
the sum of that ratio over its n-gram occurrences. Selection then keeps
documents with probability proportional to exp(weight) — here via the
deterministic ``sampling.weighted_sample`` filter, keeping the whole
pipeline RNG-free.

Scale shape (the 100 TB design):
- bucket counting is one explode + groupBy(bucket) with map-side partial
  aggregation — the shuffle carries at most ``k`` rows per partition;
- the learned model is exactly ``k`` log-ratios — bounded driver-side
  model state (the ivf/kmeans centroid-table shape), embedded back as a
  literal array (or broadcast-joined past the literal budget);
- scoring is ONE scan of the raw corpus, a per-row sequential fold —
  no shuffle, no Python.

Exactness: bucket counts are integers; the k log-ratios are computed
driver-side in IEEE doubles and QUANTIZED to DECIMAL(20,12) before
re-entering the plan, so each document's weight is a finite decimal sum —
order-independent, engine-identical, and replayable in pure Python (how
the battery oracle pins it, via the pinned xxh64).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, functions as F

# past this many buckets the literal array would bloat the plan; route
# scoring through a broadcast join instead (same budget idea as ivf)
_LR_LITERAL_BUDGET = 16_384

_Q12 = Decimal("1e-12")


def _feats_expr(text_col: str, bigrams: bool = True) -> str:
    """Hashed-feature stream of a document: lowercased whitespace unigrams
    plus (optionally) adjacent bigrams joined by a single space — the
    DSIR paper's feature space, as one codegen'd array expression."""
    toks = (f"filter(split(trim(lower(coalesce({text_col}, ''))),"
            f" '\\\\s+'), x -> x <> '')")
    if not bigrams:
        return toks
    bi = (f"zip_with(slice({toks}, 1, greatest(size({toks}) - 1, 0)),"
          f" slice({toks}, 2, greatest(size({toks}) - 1, 0)),"
          f" (a, b) -> concat(a, ' ', b))")
    return f"concat({toks}, {bi})"


def _bucket_counts(df: DataFrame, text_col: str, k: int,
                   bigrams: bool) -> dict[int, int]:
    """Exact per-bucket n-gram occurrence counts — explode + count with
    map-side combine; the result is <= k rows of bounded model state."""
    rows = (
        df.select(F.explode(F.expr(_feats_expr(text_col, bigrams)))
                  .alias("f"))
        .select(F.expr(f"CAST(pmod(xxhash64(f), {k}) AS INT)").alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return {int(r["b"]): int(r["c"]) for r in rows}


def _bucket_counts_tagged(
        df: DataFrame, target_pred, text_col: str, k: int,
        bigrams: bool) -> tuple[dict[int, int], dict[int, int]]:
    """BOTH models' per-bucket counts in ONE explode+groupBy pass when the
    target corpus is a row-filter of the raw corpus: ``c`` counts every
    occurrence, ``ct`` conditionally counts occurrences from rows
    satisfying ``target_pred`` — value-identical to two `_bucket_counts`
    calls on (df.where(pred), df) but the corpus is scanned, exploded and
    shuffled once instead of twice. A NULL predicate row counts toward
    raw only, exactly as ``where`` would drop it from the target side."""
    pred = target_pred if isinstance(target_pred, F.Column) \
        else F.expr(target_pred)
    rows = (
        df.select(pred.cast("boolean").alias("__t"),
                  F.explode(F.expr(_feats_expr(text_col, bigrams)))
                  .alias("f"))
        .select("__t",
                F.expr(f"CAST(pmod(xxhash64(f), {k}) AS INT)").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"),
             F.sum(F.when(F.col("__t"), F.lit(1)).otherwise(F.lit(0)))
             .alias("ct"))
        .collect()
    )
    tc = {int(r["b"]): int(r["ct"]) for r in rows if int(r["ct"]) != 0}
    rc = {int(r["b"]): int(r["c"]) for r in rows}
    return tc, rc


def _logratios_from_counts(tc: dict[int, int], rc: dict[int, int],
                           k: int) -> list[Decimal]:
    t_tot = sum(tc.values()) + k
    r_tot = sum(rc.values()) + k
    out = []
    for b in range(k):
        lr = (math.log((tc.get(b, 0) + 1) / t_tot)
              - math.log((rc.get(b, 0) + 1) / r_tot))
        out.append(Decimal(repr(lr)).quantize(_Q12, ROUND_HALF_UP))
    return out


def dsir_logratios(target: DataFrame, raw: DataFrame, text_col: str,
                   k: int = 1024, bigrams: bool = True) -> list[Decimal]:
    """The learned DSIR model: per-bucket
    ``log p_target(b) - log p_raw(b)`` under Laplace(+1) smoothing,
    quantized to 12 decimal places (HALF_UP) so downstream sums are exact
    decimal arithmetic. Two distributed count jobs; k-entry result."""
    tc = _bucket_counts(target, text_col, k, bigrams)
    rc = _bucket_counts(raw, text_col, k, bigrams)
    return _logratios_from_counts(tc, rc, k)


def dsir_logratios_within(corpus: DataFrame, target_pred, text_col: str,
                          k: int = 1024,
                          bigrams: bool = True) -> list[Decimal]:
    """`dsir_logratios` for the common case where the target corpus is
    ``corpus.where(target_pred)``: ONE tagged count job instead of two
    full corpus scans. Exact-integer counts, so the k log-ratios are
    bit-identical to the two-scan path."""
    tc, rc = _bucket_counts_tagged(corpus, target_pred, text_col, k,
                                   bigrams)
    return _logratios_from_counts(tc, rc, k)


def _fold_expr(lrs: list[Decimal], feats_sql: str, k: int) -> str:
    """The literal-path scoring expression: a sequential DECIMAL fold of
    logratio[bucket(f)] over the feature array ``feats_sql`` (a SQL
    fragment — a staged column name or the inline feature expression)."""
    arr = "array(" + ", ".join(
        f"CAST('{lr}' AS DECIMAL(20,12))" for lr in lrs) + ")"
    return (
        f"aggregate({feats_sql}, CAST(0 AS DECIMAL(28,12)), (acc, f) ->"
        f" CAST(acc + element_at({arr},"
        f" CAST(pmod(xxhash64(f), {k}) AS INT) + 1)"
        f" AS DECIMAL(28,12)))"
    )


def dsir_score_col(lrs: list[Decimal], text_col: str, k: int,
                   bigrams: bool = True) -> F.Column:
    """The per-document log weight as a COLUMN over the corpus itself —
    lets a caller that already holds the corpus attach the score without
    the (id -> weight) join that `dsir_logweights` + join would cost.
    Literal path only: past the literal budget the caller needs the
    broadcast-join shape of `dsir_logweights`."""
    if k > _LR_LITERAL_BUDGET:
        raise ValueError(
            f"dsir_score_col is the literal path; k={k} exceeds the "
            f"literal budget {_LR_LITERAL_BUDGET} — use dsir_logweights")
    return F.expr(
        _fold_expr(lrs, _feats_expr(text_col, bigrams), k)).cast("double")


def dsir_logweights(raw: DataFrame, target: DataFrame | None, id_col: str,
                    text_col: str, k: int = 1024,
                    bigrams: bool = True,
                    target_predicate=None) -> DataFrame:
    """Per-document DSIR log importance weight over the raw corpus:
    ``sum over n-gram occurrences of logratio[bucket(ngram)]``.

    Calling is EAGER (the count jobs learn the k-bucket model); scoring
    itself is one scan with a sequential decimal fold per row — exact,
    partitioning-independent. Returns (id, n_feats, log_weight DOUBLE);
    the weight is a finite 12-dp decimal rendered as double, so it is
    bit-identical across engines.

    ``target_predicate`` (Column or SQL string): when the target corpus
    is ``raw.where(target_predicate)``, pass the predicate instead of a
    ``target`` DataFrame — the two model-count jobs fuse into ONE tagged
    pass over the corpus, with bit-identical counts and weights."""
    if target_predicate is not None:
        if target is not None:
            raise ValueError(
                "dsir_logweights: pass target OR target_predicate")
        lrs = dsir_logratios_within(raw, target_predicate, text_col,
                                    k=k, bigrams=bigrams)
    else:
        lrs = dsir_logratios(target, raw, text_col, k=k, bigrams=bigrams)
    # stage the feature array: referenced by both the count and the fold/
    # explode, and Catalyst does no CSE across lambda expressions
    staged = raw.select(
        F.col(id_col).alias("id"),
        F.expr(_feats_expr(text_col, bigrams)).alias("__feats"))
    if k <= _LR_LITERAL_BUDGET:
        return staged.select(
            "id",
            F.expr("size(__feats)").cast("int").alias("n_feats"),
            F.expr(_fold_expr(lrs, "__feats", k))
            .cast("double").alias("log_weight"),
        )
    # broadcast path: per-bucket decimal sums are order-independent, so
    # the join+groupBy result equals the sequential fold exactly
    spark = raw.sparkSession
    lr_df = spark.createDataFrame(
        [(int(b), lrs[b]) for b in range(k)],
        "b INT, lr DECIMAL(20,12)")
    exploded = staged.select(
        "id",
        F.expr("size(__feats)").cast("int").alias("n_feats"),
        F.explode_outer(F.col("__feats")).alias("f"),
    ).withColumn(
        # explode_outer emits f=NULL for a zero-feature doc, and Spark's
        # xxhash64(NULL) returns the SEED (42) — a valid bucket — which
        # would join a real log-ratio. NULL the bucket instead so the
        # left join misses and the doc sums to 0, matching the literal
        # path's fold over an empty array exactly.
        "b", F.expr(f"IF(f IS NULL, CAST(NULL AS INT),"
                    f" CAST(pmod(xxhash64(f), {k}) AS INT))"))
    return (
        exploded.join(F.broadcast(lr_df), on="b", how="left")
        .groupBy("id", "n_feats")
        .agg(F.coalesce(F.sum(F.col("lr").cast("decimal(28,12)")),
                        F.lit(0).cast("decimal(28,12)"))
             .cast("double").alias("log_weight"))
    )


def dsir_select(raw: DataFrame, target: DataFrame, id_col: str,
                text_col: str, k: int = 1024, bigrams: bool = True,
                temperature: float = 1.0, salt: str = "") -> DataFrame:
    """Importance RESAMPLING: keep each raw document with probability
    ``min(1, exp(log_weight / temperature))`` via the deterministic md5
    filter — target-like documents survive, off-distribution ones are
    thinned proportionally. RNG-free end to end; composes the learned
    weights with sampling.weighted_sample's per-row threshold."""
    from . import sampling

    weights = dsir_logweights(raw, target, id_col, text_col,
                              k=k, bigrams=bigrams)
    probs = weights.withColumn(
        "keep_prob",
        F.least(F.lit(1.0),
                F.exp(F.col("log_weight") / F.lit(float(temperature)))))
    return sampling.weighted_sample(probs, "id", "keep_prob", salt=salt)
