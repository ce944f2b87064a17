"""[EXTENSION] In-engine quality-classifier training: full-batch logistic
regression over document features — the model a pretraining pipeline trains
to route/filter documents (e.g. a "looks like reference corpus" scorer),
here runnable at corpus scale without leaving the engine.

EXACTNESS DESIGN (the kmeans_lloyd recipe applied to supervised training):
every step is partitioning-independent and bit-replayable in pure Python —

- the link function is the ALGEBRAIC sigmoid s(z) = (1 + z / (1 + |z|)) / 2
  instead of 1/(1+exp(-z)): exp() is not correctly rounded and differs by
  ulps across libms (JVM vs CPython), while +, -, *, /, abs all are IEEE
  correctly-rounded everywhere. Same monotone S-shape, same decision
  boundary family; gradients use the residual (s - y) directly (the
  quasi-likelihood update), so no transcendental ever enters the math;
- per-row terms fold in a FIXED feature order (sequential adds);
- cross-row gradient sums route through DECIMAL(18,9) (order-independent;
  features are documented to be bounded in [-1, 1] so terms fit);
- the weight update runs driver-side on exactly-collected decimals.

Driver state per iteration: one row of J+2 aggregates. At 100 TB each
iteration is one scan + one partial/final aggregation — the same bounded-
model-state loop shape as kmeans_lloyd and bpe_train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _z_expr(feature_cols: list[str], w: list[float], b: float) -> str:
    # fixed-order sequential sum: b + w0*x0 + w1*x1 + ...
    z = f"CAST({b!r} AS DOUBLE)"
    for name, wj in zip(feature_cols, w):
        z = f"({z} + CAST({wj!r} AS DOUBLE) * `{name}`)"
    return z


def _sig_expr(z: str) -> str:
    return f"((1D + ({z}) / (1D + abs({z}))) / 2D)"


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 15,
) -> list[float]:
    """Train [bias, w_0..w_J-1] by full-batch gradient descent with the
    algebraic-sigmoid link (module docstring). Features MUST be bounded in
    [-1, 1] (ratios, capped scores) — that bound is what lets the decimal
    gradient sums stay exact. Rows with a NULL label or NULL feature are
    excluded up front. Deterministic: zero init, fixed lr and iteration
    count, no RNG, partitioning-independent sums."""
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.where(cond)
    j = len(feature_cols)
    w = [0.0] * j
    b = 0.0
    for _ in range(iters):
        z = _z_expr(feature_cols, w, b)
        resid = (f"({_sig_expr(z)} - CAST(`{label_col}` AS DOUBLE))")
        # the residual is STAGED into a projection below the aggregate:
        # referenced by J+1 gradient sums, it would otherwise re-evaluate
        # the linear term + sigmoid once per gradient column per row
        pre = base.select(F.expr(resid).alias("__r"),
                          *[F.col(c) for c in feature_cols])
        aggs = [F.expr("SUM(CAST(__r AS DECIMAL(18,9)))").alias("gb"),
                F.count(F.lit(1)).alias("n")]
        for i, c in enumerate(feature_cols):
            aggs.append(F.expr(
                f"SUM(CAST(__r * `{c}` AS DECIMAL(18,9)))"
            ).alias(f"g{i}"))
        row = pre.agg(*aggs).collect()[0]  # J+2 driver values per iter
        n = float(row["n"])
        if n == 0:
            return [b] + w
        b = b - lr * float(row["gb"]) / n
        w = [wj - lr * float(row[f"g{i}"]) / n
             for i, wj in enumerate(w)]
    return [b] + w


def logreg_score(df: DataFrame, feature_cols: list[str],
                 weights: list[float], out_col: str = "score") -> DataFrame:
    """Apply trained weights: adds ``out_col`` (the algebraic-sigmoid
    score in [0, 1]) and ``{out_col}_pred`` (score >= 0.5). One codegen'd
    projection; NULL features yield NULL score."""
    z = _z_expr(feature_cols, list(weights[1:]), float(weights[0]))
    return df.withColumn(out_col, F.expr(_sig_expr(z)).cast("double")) \
        .withColumn(f"{out_col}_pred",
                    (F.col(out_col) >= 0.5).cast("boolean"))


def quality_feature_exprs(text_col: str) -> "dict[str, F.Column]":
    """The bounded-in-[0,1] feature slice of textstats.stat_exprs — the
    documented-safe feature set for logreg_train's decimal gradients."""
    from . import textstats

    st = textstats.stat_exprs(text_col)
    return {
        "f_alpha": st["alpha_ratio"],
        "f_digit": st["digit_ratio"],
        "f_punct": st["punct_ratio"],
        "f_upper": st["upper_ratio"],
        "f_distinct": st["distinct_token_ratio"],
        "f_len": F.least(st["n_tokens"] / 100.0, F.lit(1.0)).cast("double"),
    }
