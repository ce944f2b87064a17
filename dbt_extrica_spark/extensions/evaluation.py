"""[EXTENSION] Model-evaluation metrics over cluster-scale score tables.

The quality-classifier loop (extensions/classify.py) and any
learned-filter pipeline need their eval metrics to run WHERE the scores
are — a 100 TB corpus scored by a quality model produces a score table
far too large to collect, and ROC-AUC is THE threshold-free metric those
pipelines track.

Design rules, same as the rest of the repo:

- EXACT, not sampled: AUC here is the exact Mann-Whitney U statistic
  (ties counted half), not a trapezoid over binned thresholds.
- Integer-exact until the last op: the numerator accumulates as
  2*U = sum(pos_c * (2 * cum_neg_below + neg_c_at)) in DECIMAL(38,0),
  so the only floating-point operation in the whole metric is ONE
  correctly-rounded IEEE division — the result replays bit-for-bit in
  any engine (the priority-sampling convention; no pow/ln anywhere).
- No global sort: the global mode ranks the DISTINCT-score table with
  the shared two-phase prefix machinery (cleaning.global_running_sum —
  range partition + per-partition window + a one-row-per-partition
  driver prefix), so no single task ever sees more than its slice.
  The grouped mode partitions its windows by the group key instead —
  the per-segment eval shape (AUC per language, per source, per day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def roc_auc(df: DataFrame, score_col: str, label_col: str,
            group_cols: list[str] | None = None,
            partitions: int | None = None) -> DataFrame:
    """Exact ROC-AUC (area under the ROC curve) of ``score_col`` against
    the binary ``label_col`` — equivalently the Mann-Whitney statistic
    P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg).

    Labels must be 0/1 (NULL label or score rows raise in-scan — a
    silently dropped row would bias the metric, the priority-sample
    policy). Returns one row (``auc``, ``n_pos``, ``n_neg``) — or one
    per group with ``group_cols`` — with ``auc`` NULL when a side is
    empty (single-class input has no ranking to score).

    Exactness: group by distinct score first (pos_c, neg_c per score),
    prefix-sum the negatives in score order, then
    2*U = sum(pos_c * (2 * cum_neg_below + neg_c_at)) — every term an
    exact integer (DECIMAL(38,0) against the 1e12-row worst case) —
    and auc = 2U / (2 * n_pos * n_neg), one IEEE division.

    Scale shape: ONE corpus aggregation to the distinct-score table,
    then either the two-phase global prefix (global mode — never a
    1-task window) or group-partitioned windows (grouped mode), then
    one statistics-sized aggregation. The corpus is scanned once."""
    from .cleaning import global_running_sum

    groups = list(group_cols or [])
    reserved = {"auc", "n_pos", "n_neg", "__s", "__y", "__posc", "__negc",
                "__cumn", "__u2"}
    clash = reserved & set(groups)
    if clash:
        raise ValueError(f"roc_auc: group columns {sorted(clash)} collide "
                         f"with reserved working/output names")
    y = F.col(label_col).cast("bigint")
    # Guard the RAW column before the bigint cast (mg_build's
    # raw-before-cast rule): a fractional label like 0.9 truncates to 0
    # and would silently pass a post-cast isin(0,1) check.
    rd = F.col(label_col).cast("double")
    checked = F.when(
        F.col(score_col).isNull() | rd.isNull() | ~rd.isin(0.0, 1.0),
        F.expr("raise_error('roc_auc: score_col must be non-null and "
               "label_col must be 0/1 non-null')").cast("bigint"),
    ).otherwise(y)
    per_score = (df.select(*groups,
                           F.col(score_col).alias("__s"),
                           checked.alias("__y"))
                 .groupBy(*groups, "__s")
                 .agg(F.sum("__y").cast("bigint").alias("__posc"),
                      (F.count(F.lit(1)) - F.sum("__y"))
                      .cast("bigint").alias("__negc")))
    if groups:
        w = (Window.partitionBy(*groups).orderBy("__s")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = per_score.withColumn(
            "__cumn", F.sum("__negc").over(w))
    else:
        # distinct scores are unique rows, so the order is already total
        cum = global_running_sum(per_score, ["__s"], "__negc",
                                 partitions, out_col="__cumn")
    # inclusive prefix -> "strictly below" = cum - at; ties count half:
    # pos_c * (2*below + at) keeps everything integral (2*U)
    u2 = (F.col("__posc").cast("decimal(38,0)")
          * (2 * (F.col("__cumn") - F.col("__negc")) + F.col("__negc")))
    out = (cum.groupBy(*groups)
           .agg(F.sum(u2).alias("__u2"),
                F.sum("__posc").cast("bigint").alias("n_pos"),
                F.sum("__negc").cast("bigint").alias("n_neg")))
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__u2").cast("double")
        / (2.0 * F.col("n_pos") * F.col("n_neg")))
    return out.select(*groups, auc.alias("auc"), "n_pos", "n_neg")


def calibration_curve(df: DataFrame, score_col: str, label_col: str,
                      buckets: int = 10, scale: float = 1e9,
                      partitions: int | None = None) -> DataFrame:
    """Reliability diagram / calibration table: bucket predictions on
    the score's own equi-depth quantile boundaries and report each
    bucket's observed positive rate beside its mean score — THE
    diagnostic for "does a 0.9 from this quality classifier mean 90%?",
    the companion to :func:`roc_auc` (which is calibration-blind).

    Boundaries use the chi2_drift rule: breakpoint i = the score at
    global rank ceil(i*n/B) (shared two-phase rank, B-1 collected
    literals), bucket(s) = #breakpoints < s. Counts are exact integers;
    mean_score accumulates as FLOOR(score * scale) in DECIMAL(38,0)
    (order-free) so both output doubles are single IEEE divisions —
    bit-replayable. Labels must be 0/1 non-null (raises in-scan, the
    roc_auc guard).

    Returns (bucket, n, n_pos, pos_rate, mean_score).

    Scale shape: one two-phase rank + ONE aggregation over the rank
    phase's reified slice — the corpus is scanned ONCE (r16: the final
    aggregation previously re-derived ``base`` from the source, paying
    a second corpus scan and a second evaluation of the label guard;
    it now reads the checkpointed ranked table the breakpoint pass
    already materialized)."""
    from .cleaning import global_running_sum

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    y = F.col(label_col).cast("bigint")
    # Raw-before-cast label guard — see roc_auc.
    rd = F.col(label_col).cast("double")
    checked = F.when(
        F.col(score_col).isNull() | rd.isNull() | ~rd.isin(0.0, 1.0),
        F.expr("raise_error('calibration_curve: score_col must be "
               "non-null and label_col must be 0/1 non-null')")
        .cast("bigint"),
    ).otherwise(y)
    base = df.select(F.col(score_col).cast("double").alias("__s"),
                     checked.alias("__y"))
    ranked, n = global_running_sum(
        base.select("__s", "__y"), ["__s", "__y"], None, partitions,
        out_col="__rank", return_total=True)
    if n == 0:
        raise ValueError("calibration_curve: no rows")
    ks = sorted({-(-i * n // buckets) for i in range(1, buckets)})
    bps = [r["__s"] for r in
           (ranked.where(F.col("__rank").isin(ks))
            .groupBy("__s").agg(F.min("__rank").alias("r"))
            .orderBy("r").collect())]
    arr = F.array(*[F.lit(b).cast("double") for b in bps])
    sc = float(scale)
    return (ranked
            .select(F.size(F.filter(arr, lambda b: b < F.col("__s")))
                    .alias("bucket"), "__s", "__y")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("__y").cast("bigint").alias("n_pos"),
                 F.sum(F.floor(F.col("__s") * F.lit(sc))
                       .cast("decimal(38,0)")).alias("__ssum"))
            .select("bucket", "n", "n_pos",
                    (F.col("n_pos").cast("double")
                     / F.col("n").cast("double")).alias("pos_rate"),
                    (F.col("__ssum").cast("double") / F.lit(sc)
                     / F.col("n").cast("double")).alias("mean_score")))


def matthews_corr(df: DataFrame, pred_col: str, label_col: str) -> DataFrame:
    """Matthews correlation coefficient for a BINARY classifier — the
    single-number confusion summary that stays honest under class
    imbalance (accuracy and F1 both saturate when one class dominates;
    MCC is the full fourfold point correlation): the recommended
    headline metric for quality-filter classifiers where the "bad"
    class is rare.

    MCC = (TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)).

    Exactness: the four cells are exact bigint counts off ONE
    aggregation; numerator and denominator are FIXED chains of IEEE
    ops on the double-cast cells (cast FIRST — cell products pass 2^63
    on a 100 TB corpus; each product/subtraction is then one
    correctly-rounded op), sqrt is exactly rounded, so the double
    replays verbatim in SQL. A zero denominator (any margin empty)
    yields NULL mcc — deterministic, never NaN (the roc_auc
    convention). Both columns validate RAW-before-cast as strict 0/1
    non-null in-scan (a fractional 0.9 must raise, not truncate).

    Returns one row: (n, tp, tn, fp, fn, mcc).

    Scale shape: one scan, ONE map-side-combinable aggregation — four
    conditional counts; nothing after it exceeds one row."""
    def checked01(col: str, what: str) -> F.Column:
        raw = F.col(col).cast("double")
        return F.when(
            raw.isNull() | ~raw.isin(0.0, 1.0),
            F.expr(f"raise_error('matthews_corr: {what} must be 0/1 "
                   "non-null')").cast("bigint"),
        ).otherwise(F.col(col).cast("bigint"))

    p, y = checked01(pred_col, "pred_col"), checked01(label_col,
                                                     "label_col")
    cells = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((p == 1) & (y == 1)).cast("bigint")).alias("tp"),
        F.sum(((p == 0) & (y == 0)).cast("bigint")).alias("tn"),
        F.sum(((p == 1) & (y == 0)).cast("bigint")).alias("fp"),
        F.sum(((p == 0) & (y == 1)).cast("bigint")).alias("fn"))
    tp, tn = F.col("tp").cast("double"), F.col("tn").cast("double")
    fp, fn = F.col("fp").cast("double"), F.col("fn").cast("double")
    num = tp * tn - fp * fn
    den2 = ((tp + fp) * (tp + fn)) * ((tn + fp) * (tn + fn))
    mcc = F.when(den2 > 0, num / F.sqrt(den2))
    return cells.select("n", "tp", "tn", "fp", "fn", mcc.alias("mcc"))


def classification_report(df: DataFrame, pred_col: str, label_col: str,
                          group_cols: list[str] | None = None) -> DataFrame:
    """Per-class confusion statistics for a multiclass classifier:
    one row per observed class with ``n_true`` (support), ``n_pred``
    (times predicted), ``tp``, and precision / recall / f1 — the
    companion to :func:`roc_auc` for HARD predictions (quality-tier
    labels, language ids, topic buckets).

    Exactness: tp / n_true / n_pred are exact integers off ONE
    aggregation; precision = tp/n_pred, recall = tp/n_true and
    f1 = 2*tp/(n_true + n_pred) are each a single IEEE division
    (the harmonic mean simplifies to that form — no intermediate
    precision*recall product to de-round), so every double replays
    verbatim in SQL. A class never predicted has NULL precision
    (0/0 is undefined, not 0 — deterministic NULL, the trend_ols
    convention); f1 is NULL only when tp, n_true and n_pred are all
    unreachable (n_true + n_pred = 0 cannot occur for an emitted row).
    NULL predictions or labels raise in-scan (a dropped row would
    inflate every per-class rate).

    The class set = distinct values of label UNION prediction, so a
    hallucinated class (predicted but never true) still surfaces with
    recall NULL — the row a monitoring gate needs to see.

    Returns (group..., class, n_true, n_pred, tp, precision, recall,
    f1).

    Scale shape: one scan -> one (group, label, pred) aggregation
    (map-side combined), then two class-keyed re-aggregations of the
    statistics table — everything after the first agg is
    classes^2-bounded, never data-sized."""
    groups = list(group_cols or [])
    reserved = {"class", "n_true", "n_pred", "tp", "precision", "recall",
                "f1", "__p", "__y"}
    clash = reserved & set(groups)
    if clash:
        raise ValueError(f"classification_report: group columns "
                         f"{sorted(clash)} collide with reserved names")
    p = F.col(pred_col).cast("string")
    y = F.col(label_col).cast("string")
    checked = F.when(
        p.isNull() | y.isNull(),
        F.expr("raise_error('classification_report: pred_col and "
               "label_col must be non-null')").cast("string"),
    ).otherwise(p)
    cells = (df.select(*groups, checked.alias("__p"), y.alias("__y"))
             .groupBy(*groups, "__p", "__y")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    by_true = (cells.groupBy(*groups, F.col("__y").alias("class"))
               .agg(F.sum("n").cast("bigint").alias("n_true"),
                    F.sum(F.when(F.col("__p") == F.col("__y"),
                                 F.col("n")).otherwise(F.lit(0)))
                    .cast("bigint").alias("tp")))
    by_pred = (cells.groupBy(*groups, F.col("__p").alias("class"))
               .agg(F.sum("n").cast("bigint").alias("n_pred")))
    out = (by_true.join(by_pred, on=groups + ["class"], how="full")
           .select(*groups, "class",
                   F.coalesce("n_true", F.lit(0)).alias("n_true"),
                   F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
                   F.coalesce("tp", F.lit(0)).alias("tp")))
    prec = F.when(F.col("n_pred") > 0,
                  F.col("tp").cast("double") / F.col("n_pred"))
    rec = F.when(F.col("n_true") > 0,
                 F.col("tp").cast("double") / F.col("n_true"))
    f1 = (2.0 * F.col("tp").cast("double")
          / (F.col("n_true") + F.col("n_pred")))
    return out.select(*groups, "class", "n_true", "n_pred", "tp",
                      prec.alias("precision"), rec.alias("recall"),
                      f1.alias("f1"))


# LCM(1..20): every 1/rank precision term at k <= 20 is exact in this
# fixed-point base, so the AP sum is order-free integer arithmetic.
_RANK_LCM = 232792560


def rank_metrics(df: DataFrame, query_col: str, rank_col: str,
                 rel_col: str, k: int = 10) -> DataFrame:
    """Per-query ranked-retrieval metrics over a (query, rank,
    relevant) table — the offline eval for the repo's ANN / BM25 / TF-IDF
    retrieval operators: precision@k, reciprocal rank (MRR's per-query
    term) and average precision (MAP's per-query term), truncated at
    ``k``.

    Exactness: ranks must be 1..n unique per query (validated in-scan —
    a duplicated rank silently double-counts a position). AP's
    precision-at-hit terms cum_rel(r)/r are accumulated as exact
    integers in base LCM(1..20) (every denominator r <= k <= 20 divides
    it), so the sum is order-free and ap = sum / (LCM * n_rel_at_k) is
    ONE IEEE division; rr = 1/first_hit_rank and p_at_k = hits/k are
    single divisions too. Queries with no relevant result in the top-k
    read ap/rr NULL (nothing to rank), p_at_k = 0.

    Returns (query, n_rel_k, p_at_k, rr, ap).

    Scale shape: one scan filtered to rank <= k, one query-partitioned
    window for the cumulative hit count (k rows per query), one
    query-keyed aggregation. Never data-sized beyond queries x k."""
    if not (1 <= k <= 20):
        raise ValueError(f"k must be in 1..20 (the exact-LCM bound), "
                         f"got {k}")
    rel = F.col(rel_col).cast("bigint")
    r = F.col(rank_col).cast("bigint")
    checked = F.when(
        r.isNull() | rel.isNull() | ~rel.isin(0, 1) | (r < 1),
        F.expr("raise_error('rank_metrics: rank must be a positive "
               "integer and rel 0/1, both non-null')").cast("bigint"),
    ).otherwise(rel)
    top = (df.select(F.col(query_col).alias("query"),
                     r.alias("__r"), checked.alias("__rel"))
           .where(F.col("__r") <= k))
    w = (Window.partitionBy("query").orderBy("__r")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dup = F.when(
        F.count(F.lit(1)).over(
            Window.partitionBy("query", "__r")) > 1,
        F.expr("raise_error('rank_metrics: duplicate rank within a "
               "query')").cast("bigint"),
    ).otherwise(F.sum("__rel").over(w))
    scored = top.withColumn("__cum", dup)
    # LCM div r is EXACT integer division (every r <= k divides the
    # LCM), so the AP numerator never leaves integer arithmetic
    ap_term = F.when(
        F.col("__rel") == 1,
        (F.col("__cum") * F.expr(f"{_RANK_LCM}L div __r"))
        .cast("decimal(38,0)"),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    first_hit = F.min(F.when(F.col("__rel") == 1, F.col("__r")))
    agg = (scored.groupBy("query")
           .agg(F.sum("__rel").cast("bigint").alias("n_rel_k"),
                F.sum(ap_term).alias("__apn"),
                first_hit.alias("__fh")))
    return agg.select(
        "query", "n_rel_k",
        (F.col("n_rel_k").cast("double") / float(k)).alias("p_at_k"),
        F.when(F.col("__fh").isNotNull(),
               1.0 / F.col("__fh").cast("double")).alias("rr"),
        F.when(F.col("n_rel_k") > 0,
               F.col("__apn").cast("double")
               / (float(_RANK_LCM) * F.col("n_rel_k").cast("double")))
        .alias("ap"))


def cohens_kappa(df: DataFrame, pred_col: str, label_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two raters /
    a classifier and gold labels: kappa = (p_o - p_e) / (1 - p_e) with
    p_o the observed agreement rate and p_e the expected-by-chance rate
    from the marginals. THE inter-annotator metric a labeling pipeline
    tracks before trusting a quality-classifier training set (raw
    agreement rewards majority-class collusion; kappa doesn't).

    Exactness: off the same one-aggregation confusion cells as
    :func:`classification_report` — n, the diagonal sum, and the
    marginal product sum sum_c(n_pred_c * n_true_c) are exact integers
    (DECIMAL(38,0) for the product sum), p_o = diag/n and
    p_e = prodsum/n^2 are each ONE division, and kappa is a fixed
    (p_o - p_e) / (1 - p_e) chain — every double replays verbatim.
    Perfect chance-agreement (p_e = 1: both sides constant and equal)
    yields NULL kappa (the 0/0 case — deterministic, not NaN). NULL
    pred/label raises in-scan (the classification_report guard).

    Returns one row: (n, p_o, p_e, kappa).

    Scale shape: one (pred, label) aggregation (map-side combined,
    classes^2 rows out), one classes-keyed re-aggregation pair, one
    statistics-row finish."""
    p = F.col(pred_col).cast("string")
    y = F.col(label_col).cast("string")
    checked = F.when(
        p.isNull() | y.isNull(),
        F.expr("raise_error('cohens_kappa: pred_col and label_col "
               "must be non-null')").cast("string"),
    ).otherwise(p)
    # the cells table feeds totals, both marginals AND the product sum —
    # checkpoint it (classes^2 rows, model state) so the corpus
    # aggregates ONCE, not once per downstream reference (the
    # chi2_terms convention)
    cells = (df.select(checked.alias("__p"), y.alias("__y"))
             .groupBy("__p", "__y")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
             .localCheckpoint(eager=True))
    # marginals per class on the cells table (classes^2 rows)
    by_true = (cells.groupBy(F.col("__y").alias("c"))
               .agg(F.sum("n").cast("bigint").alias("n_true")))
    by_pred = (cells.groupBy(F.col("__p").alias("c"))
               .agg(F.sum("n").cast("bigint").alias("n_pred")))
    marg = (by_true.join(by_pred, on="c", how="full")
            .select((F.coalesce("n_true", F.lit(0))
                     .cast("decimal(38,0)")
                     * F.coalesce("n_pred", F.lit(0))).alias("__pr")))
    totals = cells.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("__p") == F.col("__y"), F.col("n"))
              .otherwise(F.lit(0))).cast("bigint").alias("__diag"))
    prod = marg.agg(F.sum("__pr").alias("__ps"))
    both = totals.crossJoin(prod)
    nd = F.col("n").cast("double")
    po = F.col("__diag").cast("double") / nd
    pe = F.col("__ps").cast("double") / (nd * nd)
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe))
    return both.select("n", po.alias("p_o"), pe.alias("p_e"),
                       kappa.alias("kappa"))
