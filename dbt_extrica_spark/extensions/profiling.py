"""[EXTENSION] Table statistics: equi-depth histograms and one-pass
column profiling — the ANALYZE-side of the engine.

Equi-depth histograms are what cost-based optimizers (Trino, Spark CBO)
and skew diagnostics keep per column: B buckets holding (almost) equal
ROW counts, so bucket width adapts to density and selectivity estimates
stay honest under skew — exactly where equi-WIDTH histograms collapse.
The build reuses the repo's two-phase distributed global rank
(cleaning.global_running_sum): never a single-task window, so a 100 TB
column ranks at n/partitions rows per task.

Column profiling is the data-quality sweep a pipeline runs on every new
source: per column — row count, nulls, exact distincts, min/max — in
ONE stacked scan (column name becomes a row key), so profiling k
columns costs one shuffle, not k jobs.

Everything here is deterministic and SQL-replayable (the battery
oracles are verbatim SQL), and each operator returns a DataFrame —
stats ARE tables, persistable alongside the data they describe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def equi_depth_histogram(df: DataFrame, value_col: str, id_col: str,
                         buckets: int = 10,
                         partitions: int | None = None) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of ``value_col``: exactly
    ``buckets`` buckets of near-equal row count (sizes differ by at most
    one), each with its value range and exact distinct count. NULL
    values are excluded (they carry no order); profile_columns reports
    them.

    Bucket assignment is DETERMINISTIC and replayable in plain SQL:
    rank rows by (value, id) — the id tie-break totalizes duplicate
    values — and bucket = (rank - 1) * B div n. (This spreads the
    +/-1-row remainder evenly across buckets instead of front-loading
    it like SQL NTILE; the oracle replays the formula itself, not
    NTILE.) Duplicate values may therefore straddle a boundary — the
    equi-depth contract is about bucket MASS, not value disjointness;
    lo/hi ranges still nest monotonically.

    Scale shape: ONE two-phase global rank (range partition +
    per-partition window + a one-row-per-partition driver prefix — the
    global_running_sum machinery) and ONE bucket-keyed aggregation.
    Returns (bucket, n_rows, lo, hi, n_distinct) with bucket 0-based."""
    from .cleaning import global_running_sum

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    base = (df.select(F.col(value_col).alias("v"), F.col(id_col).alias("i"))
            .where(F.col("v").isNotNull()))
    # the helper's driver prefix already knows the grand total — taking
    # it back avoids a whole extra pass just to learn n (review finding)
    ranked, n = global_running_sum(base, ["v", "i"], None, partitions,
                                   out_col="__rank", return_total=True)
    if n == 0:
        return (ranked.select(
            F.lit(0).alias("bucket"),
            F.lit(0).cast("bigint").alias("n_rows"),
            F.col("v").alias("lo"), F.col("v").alias("hi"),
            F.lit(0).cast("bigint").alias("n_distinct"))
            .limit(0))
    return (ranked
            .withColumn("bucket", F.expr(
                f"CAST((__rank - 1) * {buckets} div {n} AS INT)"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.min("v").alias("lo"),
                 F.max("v").alias("hi"),
                 F.countDistinct("v").cast("bigint").alias("n_distinct")))


def correlation_matrix(df: DataFrame, columns: list[str],
                       scale: float = 1e6) -> DataFrame:
    """Pairwise Pearson covariance/correlation over numeric columns —
    the ANALYZE-side dependence statistic (CBO selectivity of
    correlated predicates, feature redundancy screening). ONE pass,
    NO row blowup: the d(d+1)/2 pair products, d sums, and the count
    are d(d+1)/2 + d + 1 aggregate EXPRESSIONS over the scan (a
    stacked-explode gram would multiply the corpus by d^2 rows first —
    the first bench cut of this operator did, and paid 6x for it);
    each term fixed-points as FLOOR(term * scale) (deterministic IEEE,
    the quantize_int8 convention) and sums in DECIMAL(38,0)
    (order-free, exact at any n); everything after is single
    correctly-rounded IEEE ops (div, mul, sub, sqrt — sqrt IS exactly
    rounded per IEEE-754, unlike ln/pow), so the whole matrix replays
    verbatim in SQL.

    Rows with ANY NULL among ``columns`` are excluded (complete-case
    Pearson). A constant column has variance 0 -> its correlations are
    NULL (not NaN — deterministic across engines). ``scale`` is the
    fixed-point granularity: max|v_i * v_j| * scale must fit 2^63
    (ANSI Spark raises loudly past it); 1e6 suits business numerics up
    to ~1e5.

    Returns upper-triangle rows (col_i, col_j, n, cov, corr).

    Scale shape: one scan + one partial/final aggregation to a single
    stats row; the pair reshape explodes THAT row. The expression
    count grows O(d^2) — fine for the tens-of-columns ANALYZE case;
    for wide embedding vectors use similarity.gram_matrix (stacked
    explode scales in d, and its fast mode avoids the blowup
    entirely)."""
    if len(columns) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    if len(set(columns)) != len(columns):
        raise ValueError(f"duplicate column names in {columns}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in the DataFrame: {missing}")
    complete = df.where(F.expr(" AND ".join(
        f"`{c}` IS NOT NULL" for c in columns)))
    sc = float(scale)

    def fx(expr: F.Column) -> F.Column:
        return (F.sum(F.floor(expr * F.lit(sc)).cast("decimal(38,0)"))
                .cast("double") / F.lit(sc))

    cd = {c: F.col(c).cast("double") for c in columns}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i, ci in enumerate(columns):
        aggs.append(fx(cd[ci]).alias(f"s{i}"))
        for j in range(i, len(columns)):
            aggs.append(fx(cd[ci] * cd[columns[j]]).alias(f"g{i}_{j}"))
    stats = complete.agg(*aggs)
    nd = F.col("n").cast("double")
    rows = []
    for i, ci in enumerate(columns):
        mu_i = F.col(f"s{i}") / nd
        var_i = F.col(f"g{i}_{i}") / nd - mu_i * mu_i
        for j in range(i, len(columns)):
            mu_j = F.col(f"s{j}") / nd
            var_j = F.col(f"g{j}_{j}") / nd - mu_j * mu_j
            cov = F.col(f"g{i}_{j}") / nd - mu_i * mu_j
            vv = var_i * var_j
            rows.append(F.struct(
                F.lit(ci).alias("col_i"),
                F.lit(columns[j]).alias("col_j"),
                F.col("n").alias("n"),
                cov.alias("cov"),
                F.when(vv > 0, cov / F.sqrt(vv)).alias("corr")))
    return (stats.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def mad_outliers(df: DataFrame, value_col: str, id_col: str,
                 group_cols: list[str], k: float = 3.0,
                 return_rows: bool = False) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation:
    a row is an outlier when ``|v - median| > k * MAD`` — the
    Hampel-filter rule that, unlike z-scores, no single extreme value
    can poison (mean AND stddev both chase the outlier they are
    supposed to catch; the median and MAD do not).

    Both statistics are EXACT lower medians (percentile_disc(0.5): the
    value at rank ceil(n/2) of the (value, id)-totalized order — an
    integer rank selection, no interpolation arithmetic), so every
    median, MAD, deviation, and flag replays verbatim in plain SQL.
    NULL values are excluded (profile_columns reports them). A group
    whose majority value repeats exactly has MAD 0 — then every
    deviating row flags, the standard MAD degeneracy (use the
    histogram's bucket ranges when that bites).

    Returns per-group (group..., n, median, mad, n_outliers); with
    ``return_rows=True`` instead returns the flagged rows
    (group..., id, value, deviation).

    Scale shape: ONE shuffle on the group key — both rank passes, both
    median selections, and the flag are windows over the SAME
    partitioning, so Catalyst plans a single exchange; the group-sized
    summary aggregation reuses it. Rank-by-sort within a group is the
    per-group sort every exact-median needs; for a single monster group
    use equi_depth_histogram (two-phase global rank) instead."""
    from pyspark.sql.window import Window

    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    # name-collision guard (the global_running_sum convention): the
    # pipeline writes these columns with withColumn — a same-named
    # group/id/value column would be silently clobbered mid-pipeline
    reserved = {"median", "mad", "deviation", "__i", "__v", "__n",
                "__rn", "__rn2", "__dev", "__flag"}
    clash = reserved & ({value_col, id_col} | set(group_cols))
    if clash:
        raise ValueError(f"mad_outliers: column names {sorted(clash)} "
                         f"collide with reserved internal/output names "
                         f"{sorted(reserved)}")
    if len(set(group_cols)) != len(group_cols):
        raise ValueError(f"duplicate group_cols in {group_cols}")
    v = F.col(value_col).cast("double")
    base = (df.select(*group_cols, F.col(id_col).alias("__i"),
                      v.alias("__v"))
            .where(F.col("__v").isNotNull()))
    wg = Window.partitionBy(*group_cols)
    w1 = wg.orderBy(F.col("__v").asc(), F.col("__i").asc())
    mid = "(__n + 1) div 2"  # ceil(n/2): the lower-median rank
    d = (base
         .withColumn("__rn", F.row_number().over(w1))
         .withColumn("__n", F.count(F.lit(1)).over(wg))
         .withColumn("median", F.max(F.when(
             F.expr(f"__rn = {mid}"), F.col("__v"))).over(wg))
         .withColumn("__dev", F.abs(F.col("__v") - F.col("median"))))
    w2 = wg.orderBy(F.col("__dev").asc(), F.col("__i").asc())
    d = (d
         .withColumn("__rn2", F.row_number().over(w2))
         .withColumn("mad", F.max(F.when(
             F.expr(f"__rn2 = {mid}"), F.col("__dev"))).over(wg))
         .withColumn("__flag", F.col("__dev") > F.lit(float(k)) *
                     F.col("mad")))
    if return_rows:
        return (d.where("__flag")
                .select(*group_cols, F.col("__i").alias(id_col),
                        F.col("__v").alias(value_col),
                        F.col("__dev").alias("deviation")))
    return (d.groupBy(*group_cols)
            .agg(F.max("__n").cast("bigint").alias("n"),
                 F.max("median").alias("median"),
                 F.max("mad").alias("mad"),
                 F.coalesce(F.sum(F.col("__flag").cast("bigint")),
                            F.lit(0)).cast("bigint").alias("n_outliers")))


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass column profile: per column — total rows, nulls, exact
    distinct non-null values, min/max (as strings, so heterogeneous
    column types stack into one result table; numeric min/max therefore
    follow STRING collation here — use equi_depth_histogram for typed
    numeric ranges).

    Scale shape: the columns STACK into (col_name, value) rows via one
    explode — so profiling k columns is ONE scan + ONE aggregation
    keyed on col_name (k groups), not k separate jobs over a 100 TB
    table. Returns (col_name, n_rows, n_nulls, n_distinct, min_str,
    max_str)."""
    if not columns:
        raise ValueError("columns must be non-empty")
    if len(set(columns)) != len(columns):
        # duplicates would merge into one col_name group and silently
        # double every count
        raise ValueError(f"duplicate column names in {columns}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        # also the injection guard: only names that literally exist in
        # the schema ever reach the SQL text below
        raise ValueError(f"columns not in the DataFrame: {missing}")
    pairs = ", ".join(
        f"named_struct('c', '{c}', 'v', CAST(`{c}` AS STRING))"
        for c in columns)
    stacked = df.select(
        F.explode(F.expr(f"array({pairs})")).alias("cell"))
    return (stacked
            .select(F.col("cell.c").alias("col_name"),
                    F.col("cell.v").alias("v"))
            .groupBy("col_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.sum(F.col("v").isNull().cast("bigint"))
                 .cast("bigint").alias("n_nulls"),
                 F.countDistinct("v").cast("bigint").alias("n_distinct"),
                 F.min("v").alias("min_str"),
                 F.max("v").alias("max_str")))


def chi2_drift(ref: DataFrame, cur: DataFrame, value_col: str,
               id_col: str, buckets: int = 10,
               partitions: int | None = None) -> DataFrame:
    """Two-sample distribution-drift detector: bucket both tables on the
    REFERENCE's equi-depth quantile boundaries and score the shift with
    the chi-square homogeneity statistic — the monitoring check a
    pipeline runs when a new crawl/snapshot arrives ("does this month's
    value distribution still look like the corpus the model was tuned
    on?"). Chi-square rather than PSI deliberately: PSI needs ln(),
    which differs in the last ulp across libm implementations, while
    chi-square is pure +-*/ off exact integer counts — the statistic
    replays bit-for-bit in any engine (the correlation_matrix
    convention) and ranks drifts identically.

    Boundaries: breakpoint i (i = 1..B-1) is the reference value at
    global rank ceil(i*n/B). The value at any global rank depends only
    on the VALUE HISTOGRAM (the id tie-break orders rows within equal
    values, never across them), so the rank pass runs over distinct
    values: one map-side-combinable count aggregation, then the shared
    two-phase prefix over the (vocabulary-sized) counts — the ks_test
    shape. The value at rank k is the v whose cumulative span
    (cum - c, cum] contains k; collected as B-1 literals (model
    state). Bucket(x) = #{breakpoints < x} for BOTH tables — buckets
    are value intervals, so duplicates never straddle and the rule is
    one scan-side expression over a literal array.

    Returns one row per bucket (bucket, ref_n, cur_n, ref_frac,
    cur_frac, chi2_part); sum(chi2_part) is the statistic with B-1
    degrees of freedom. NULL values carry no position and are excluded
    (profile_columns reports them).

    ``id_col`` is accepted and IGNORED since r16: the histogram route
    derives boundaries from the value distribution alone, so the old
    row-rank tie-break column is no longer consulted. Kept in the
    signature for API compatibility with pre-r16 callers.

    Scale shape: one value-count aggregation + one distinct-values-sized
    two-phase prefix over the reference + ONE aggregation per table
    (bucket assignment is scan-side) + a B-row reshape. (Before r16 the
    prefix ranked every reference ROW — a corpus-sized range shuffle,
    sort and localCheckpoint to learn B-1 order statistics; the
    histogram route moves and reifies only distinct values, and the
    scan prunes to the value column alone.)"""
    from .cleaning import global_running_sum

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    vcounts = (ref.select(F.col(value_col).alias("v"))
               .where(F.col("v").isNotNull())
               .groupBy("v")
               .agg(F.count(F.lit(1)).cast("bigint").alias("__c")))
    ranked, n = global_running_sum(vcounts, ["v"], "__c", partitions,
                                   out_col="__cum", return_total=True)
    if n == 0:
        raise ValueError("chi2_drift: reference has no non-null values")
    ks = sorted({-(-i * n // buckets) for i in range(1, buckets)})  # ceil
    ks_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in ks])
    # value at rank k = the v with cum - c < k <= cum; a v spanning
    # several breakpoints is still ONE boundary literal (the old
    # row-rank path merged such duplicates through its groupBy(v)), and
    # ordering by v equals ordering by first covered rank
    bps = [r["v"] for r in
           (ranked.where(F.exists(
                ks_arr,
                lambda k: (k > F.col("__cum") - F.col("__c"))
                & (k <= F.col("__cum"))))
            .select("v").orderBy("v").collect())]  # <= B-1 rows
    vt = ref.schema[value_col].dataType.simpleString()
    arr = F.array(*[F.lit(b).cast(vt) for b in bps])
    bucket = F.size(F.filter(arr, lambda b: b < F.col("v")))

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(F.col(value_col).alias("v"))
                .where(F.col("v").isNotNull())
                .select(bucket.alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("bigint").alias(name)))

    spine = (ref.sparkSession.range(len(bps) + 1)
             .select(F.col("id").cast("int").alias("bucket")))
    both = (spine
            .join(counts(ref, "ref_n"), on="bucket", how="left")
            .join(counts(cur, "cur_n"), on="bucket", how="left")
            .select("bucket",
                    F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
                    F.coalesce("cur_n", F.lit(0)).alias("cur_n")))
    # the chi-square arithmetic needs the grand totals on every row —
    # a window over <= B rows (statistics-sized, never corpus)
    w = Window.partitionBy()
    rt = F.sum("ref_n").over(w).cast("double")
    ct = F.sum("cur_n").over(w).cast("double")
    bt = (F.col("ref_n") + F.col("cur_n")).cast("double")
    nn = rt + ct
    e_ref = bt * rt / nn
    e_cur = bt * ct / nn
    part = ((F.col("ref_n") - e_ref) * (F.col("ref_n") - e_ref) / e_ref
            + (F.col("cur_n") - e_cur) * (F.col("cur_n") - e_cur) / e_cur)
    return both.select(
        "bucket", "ref_n", "cur_n",
        (F.col("ref_n") / rt).alias("ref_frac"),
        (F.col("cur_n") / ct).alias("cur_frac"),
        F.when(bt > 0, part).otherwise(F.lit(0.0)).alias("chi2_part"))


def diversity_simpson(df: DataFrame, cat_col: str,
                      group_cols: list[str] | None = None) -> DataFrame:
    """Simpson diversity of a categorical column per group — the
    data-mixture balance statistic ("is this corpus slice dominated by
    one source/domain?") a pretraining-mixture builder tracks beside
    cap_per_key's enforcement knob. Simpson rather than Shannon
    deliberately: Shannon entropy needs ln() (libm last-ulp divergence),
    while Simpson's index is pure integer products + one division —
    bit-replayable (the chi2_drift convention) and ranks imbalance the
    same way.

    Returns (group..., n, n_categories, simpson, gini_simpson,
    effective_categories): simpson = sum(c_i^2)/n^2 = P(two draws land
    in the same category), gini_simpson = 1 - simpson, and
    effective_categories = n^2/sum(c_i^2) (inverse Simpson — "this mix
    behaves like K equally-sized sources"). NULL categories carry no
    identity and are excluded.

    Scale shape: one (group, category)-keyed aggregation + one
    group-keyed reduction of the (tiny) per-category counts — the
    second aggregation is vocabulary-sized, never corpus-sized."""
    groups = list(group_cols or [])
    reserved = {"n", "n_categories", "simpson", "gini_simpson",
                "effective_categories", "__c", "__cat"}
    clash = reserved & (set(groups) | {cat_col})
    if clash:
        raise ValueError(f"diversity_simpson: columns {sorted(clash)} "
                         "collide with reserved working/output names")
    counts = (df.where(F.col(cat_col).isNotNull())
              .groupBy(*groups, F.col(cat_col).alias("__cat"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("__c")))
    agg = (counts.groupBy(*groups)
           .agg(F.sum("__c").cast("bigint").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_categories"),
                F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__c"))
                .alias("__ss")))
    n2 = F.col("n").cast("double") * F.col("n").cast("double")
    ss = F.col("__ss").cast("double")
    return agg.select(*groups, "n", "n_categories",
                      (ss / n2).alias("simpson"),
                      (F.lit(1.0) - ss / n2).alias("gini_simpson"),
                      (n2 / ss).alias("effective_categories"))


def _tagged_value_counts(ref: DataFrame, cur: DataFrame,
                         value_col: str) -> DataFrame:
    """(v, __rc, __cc) distinct-value counts of both tables via ONE
    tagged-union aggregation — the shared first phase of ks_test and
    mannwhitney_u. Value-identical to the former per-table groupBy +
    full outer merge (rows NULL on one side coalesced to 0), but with
    a single shuffle and no join stage."""
    tagged = (ref.select(F.col(value_col).alias("v"),
                         F.lit(1).cast("bigint").alias("__isr"))
              .where(F.col("v").isNotNull())
              .unionByName(
                  cur.select(F.col(value_col).alias("v"),
                             F.lit(0).cast("bigint").alias("__isr"))
                  .where(F.col("v").isNotNull())))
    return (tagged.groupBy("v")
            .agg(F.sum("__isr").cast("bigint").alias("__rc"),
                 (F.count(F.lit(1)) - F.sum("__isr"))
                 .cast("bigint").alias("__cc")))


def ks_test(ref: DataFrame, cur: DataFrame, value_col: str,
            partitions: int | None = None) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the binning-free
    companion to :func:`chi2_drift`: D = max over observed values of
    |ECDF_ref(v) - ECDF_cur(v)|, sensitive to location/shape shifts a
    fixed bucketing can smear. Use chi2 for the per-bucket diagnosis,
    KS for the single sharpest number.

    Exactness: with n_r/n_c the sample sizes, D's candidate at value v
    is |cum_ref(v) * n_c - cum_cur(v) * n_r| / (n_r * n_c) — the
    numerator is an exact integer per distinct value, the max is an
    integer max, and the statistic is ONE IEEE division at the end, so
    it replays bit-for-bit in any engine (the chi2_drift convention —
    and the reason this is the classical D rather than a p-value: the
    asymptotic p needs exp()). NULLs carry no position and are
    excluded (profile_columns reports them).

    Returns one row: (d_stat, at_value, n_ref, n_cur) with ``at_value``
    the SMALLEST value attaining the max (deterministic tie-break).

    Scale shape: a tagged union of both tables into ONE distinct-value
    count aggregation (one shuffle instead of two groupBys plus a full
    outer merge — the r16 optimization), then the shared two-phase
    global prefix computing BOTH cumulative counts off one range
    shuffle (never a 1-task window), one max-of-struct reduction.
    Everything after the first agg is distinct-values-sized.
    """
    from .cleaning import global_running_sums

    merged = _tagged_value_counts(ref, cur, value_col)
    # grand totals fall out of the driver prefix the two-phase rank
    # already computes — literals, never a global one-task window
    ranked, (n_r, n_c) = global_running_sums(
        merged, ["v"], ["__rc", "__cc"], partitions,
        out_cols=["__cumr", "__cumc"])
    num = F.abs(F.col("__cumr") * F.lit(int(n_c))
                - F.col("__cumc") * F.lit(int(n_r)))
    best = (ranked
            .select(num.alias("__num"), F.col("v"))
            .agg(F.max("__num").alias("__m"),
                 F.min_by(
                     F.col("v"),
                     F.struct((-F.col("__num")).alias("a"),
                              F.col("v").alias("b"))).alias("at_value")))
    d = (F.col("__m").cast("double") / float(n_r * n_c)
         if (n_r > 0 and n_c > 0)
         else F.lit(None).cast("double"))  # a side is empty: no ECDF
    return best.select(
        d.alias("d_stat"), "at_value",
        F.lit(int(n_r)).cast("bigint").alias("n_ref"),
        F.lit(int(n_c)).cast("bigint").alias("n_cur"))


# Benford expected first-digit shares: log10(1 + 1/d) PRECOMPUTED as
# literals (repr-exact doubles) — the ln-free way to ship the law's
# constants into both engines identically.
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829993, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit profile against Benford's law — the
    classic anomaly screen for machine-generated / fabricated numeric
    columns (amounts, counts, sizes): naturally occurring multi-scale
    magnitudes follow P(d) = log10(1 + 1/d); fabricated ones rarely do.

    The digit comes from the INTEGER rendering: values with
    floor(|v|) >= 1 contribute the first character of the BIGINT cast
    (bigint-to-string is identical across engines; double-to-string is
    NOT — scientific-notation thresholds differ, so sub-1 values are
    out of scope by contract and excluded, as are NULLs and zeros).
    Benford screening applies to magnitude-spanning positives anyway.
    Magnitudes at or above 2^63 are ALSO out of contract and filtered
    EXPLICITLY (|v| < 9.223372036854776e18): without the filter the
    non-ANSI bigint cast would NULL them Spark-side (silently dropping
    the row from counts AND total) while an ANSI oracle engine errors
    on the same cast — the explicit shared filter keeps both engines
    on the identical row set.

    Returns 9 rows (digit, n, share, expected, dev) with
    dev = share - expected; counts exact integers, share ONE division,
    expected a literal — every double replays (chi2_drift convention).
    The chi-square-style statistic is sum over digits of
    n_total * dev^2 / expected if a single number is wanted — left to
    the caller since a 9-row cross-digit sum would be order-sensitive.

    Scale shape: one scan-side digit expression + ONE 9-group
    aggregation; the digit spine join is 9 rows."""
    v = F.abs(F.col(value_col).cast("double"))
    digit = F.substring(
        F.floor(v).cast("bigint").cast("string"), 1, 1).cast("int")
    # 2^63 as a double — the first magnitude the bigint cast cannot
    # represent; see the contract note in the docstring
    counted = (df.where(F.col(value_col).isNotNull() & (v >= 1.0)
                        & (v < F.lit(9.223372036854776e18)))
               .select(digit.alias("digit"))
               .groupBy("digit")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    spine = (df.sparkSession.range(1, 10)
             .select(F.col("id").cast("int").alias("digit")))
    expected = F.element_at(
        F.array(*[F.lit(BENFORD_P[d]) for d in range(1, 10)]),
        F.col("digit"))
    w = Window.partitionBy()
    total = F.sum(F.coalesce("n", F.lit(0))).over(w)
    share = F.when(total > 0,
                   F.coalesce("n", F.lit(0)).cast("double")
                   / total.cast("double"))
    return (spine.join(counted, on="digit", how="left")
            .select("digit",
                    F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
                    share.alias("share"),
                    expected.alias("expected"),
                    (share - expected).alias("dev")))


def welch_ttest(ref: DataFrame, cur: DataFrame, value_col: str,
                scale: float = 1e6) -> DataFrame:
    """Two-sample Welch t-test statistic (unequal variances — the
    default any modern stats package recommends over Student's t) on a
    numeric column of two table snapshots: the mean-shift significance
    screen beside :func:`ks_test` (shape) and :func:`chi2_drift`
    (bucket mix). Reports the t statistic and the Welch-Satterthwaite
    degrees of freedom; the p-value needs the t CDF (incomplete beta —
    transcendental), so thresholds are on |t| by contract, exactly as
    the chi2 entry thresholds on the statistic.

    Exactness (the trend_ols convention): each side's n / sum /
    sum-of-squares accumulate as FLOOR(term * scale) DECIMAL(38,0) —
    order-free — and t = (m1 - m2) / sqrt(v1/n1 + v2/n2) plus the
    Welch-Satterthwaite df are FIXED chains of correctly-rounded IEEE
    ops (sqrt included), so both doubles replay verbatim in SQL.
    Variances use the n-1 sample denominator; a side with n < 2 or
    zero combined variance yields NULL t/df (no test). NULLs excluded.

    Returns one row: (n_ref, n_cur, mean_ref, mean_cur, t_stat, df).

    Scale shape: ONE aggregation per table (map-side combined,
    statistics out), a 1x1 cross join of the two statistic rows."""
    sc = float(scale)

    def stats(df: DataFrame, tag: str) -> DataFrame:
        x = F.col(value_col).cast("double")
        fx = lambda e: (F.sum(F.floor(e * F.lit(sc))  # noqa: E731
                              .cast("decimal(38,0)")))
        return (df.where(x.isNotNull())
                .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_{tag}"),
                     fx(x).alias(f"__s_{tag}"),
                     fx(x * x).alias(f"__ss_{tag}")))

    both = stats(ref, "ref").crossJoin(stats(cur, "cur"))

    def side(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"__s_{tag}").cast("double") / F.lit(sc)
        ss = F.col(f"__ss_{tag}").cast("double") / F.lit(sc)
        m = s / n
        # sample variance, n-1 denominator
        var = F.when(F.col(f"n_{tag}") > 1, (ss - n * m * m) / (n - 1.0))
        return n, m, var

    n1, m1, v1 = side("ref")
    n2, m2, v2 = side("cur")
    se2 = v1 / n1 + v2 / n2
    t = F.when(se2 > 0, (m1 - m2) / F.sqrt(se2))
    dof = F.when(
        se2 > 0,
        (se2 * se2) / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                       + (v2 / n2) * (v2 / n2) / (n2 - 1.0)))
    return both.select(
        "n_ref", "n_cur", m1.alias("mean_ref"), m2.alias("mean_cur"),
        t.alias("t_stat"), dof.alias("df"))


def mannwhitney_u(ref: DataFrame, cur: DataFrame, value_col: str,
                  partitions: int | None = None) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) — the
    RANK-based mean-shift screen beside :func:`welch_ttest` (moments)
    and :func:`ks_test` (shape): robust to outliers and monotone
    transforms, the standard recommendation when the metric is skewed
    (latencies, prices, token counts). Reports U for the ref side and
    the tie-corrected normal-approximation z; the p-value needs the
    normal CDF (erf — transcendental), so thresholds are on |z| by
    contract, the welch_ttest convention. No continuity correction
    (documented contract — scipy's default 0.5 shift is a presentation
    choice the caller can apply to z's numerator).

    Exactness: with average ranks, 2*R_ref = sum over distinct values
    of n_ref(v) * (2*below(v) + c(v) + 1) — an exact integer off the
    shared two-phase prefix (below = combined count before v, c =
    combined count at v); the tie term T = sum(c^3 - c) is integral
    too; both accumulate as DECIMAL(38,0). Then 2*U = 2*R_ref -
    n_r*(n_r+1), var = n_r*n_c*(N(N-1)(N+1) - T) / (12*N*(N-1)), and
    z = (U - n_r*n_c/2)/sqrt(var) is a FIXED chain of correctly-rounded
    IEEE ops — both doubles replay verbatim in SQL while the integer
    parts stay below 2^53 (the exact-double envelope; at larger scales
    the statistic is still deterministic per engine). All-tied samples
    (var = 0) and an empty side yield NULL u/z. NULLs are excluded.

    Returns one row: (n_ref, n_cur, u_stat, z).

    Scale shape: a tagged union of both tables into ONE distinct-value
    count aggregation (one shuffle instead of two groupBys plus a full
    outer merge — the r16 optimization), then the shared two-phase
    prefix computing BOTH cumulative counts off one range shuffle
    (never a 1-task window), ONE statistics reduction — everything
    after the first agg is distinct-values-sized (the ks_test shape)."""
    from .cleaning import global_running_sums

    merged = _tagged_value_counts(ref, cur, value_col)
    c = F.col("__rc") + F.col("__cc")
    ranked, (n_r, n_c) = global_running_sums(
        merged, ["v"], ["__rc", "__cc"], partitions,
        out_cols=["__cumr", "__cumc"])
    below = F.col("__cumr") + F.col("__cumc") - c
    stats = ranked.agg(
        F.sum((F.col("__rc") * (2 * below + c + 1))
              .cast("decimal(38,0)")).alias("__r2"),
        F.sum((c * c * c - c).cast("decimal(38,0)")).alias("__t"))
    n1, n2 = int(n_r), int(n_c)
    nn = n1 + n2
    if n1 == 0 or n2 == 0:
        u = F.lit(None).cast("double")
        z = F.lit(None).cast("double")
    else:
        # 2*U stays integral (DECIMAL); every division below is one
        # IEEE op in a fixed order. Integer literals enter as DECIMAL
        # FACTORS (n1 * (n1+1) as one Python int would overflow the
        # bigint literal at ~3e9 rows; each factor alone fits to 9.2e18
        # and the decimal product is exact)
        u2 = (F.col("__r2")
              - F.lit(n1).cast("decimal(38,0)") * F.lit(n1 + 1))
        u = u2.cast("double") / F.lit(2.0)
        var = (F.lit(float(n1) * float(n2))
               * ((F.lit(nn).cast("decimal(38,0)") * F.lit(nn - 1)
                   * F.lit(nn + 1) - F.col("__t")).cast("double"))
               / F.lit(12.0 * nn * (nn - 1)))
        z = F.when(var > 0,
                   (u2.cast("double") - F.lit(float(n1) * float(n2)))
                   / F.lit(2.0) / F.sqrt(var))
    return stats.select(
        F.lit(n1).cast("bigint").alias("n_ref"),
        F.lit(n2).cast("bigint").alias("n_cur"),
        u.alias("u_stat"), z.alias("z"))


def cramers_v(df: DataFrame, a_col: str, b_col: str,
              scale: float = 1e12) -> DataFrame:
    """Cramér's V association between two CATEGORICAL columns — the
    [0, 1]-normalized chi-square the profiling family needs beside
    :func:`chi2_drift` (numeric drift) and :func:`benford_digits`
    (digit mix): "are source and language independent?", "does the
    quality tier depend on the crawl?" — the screen for redundant
    or leaking categorical features.

    chi2 uses the observed-cells-only identity chi2 = N*(S - 1) with
    S = sum over observed cells of n_ij^2/(r_i*c_j) — zero cells
    contribute exactly their expected mass through the -1, so only the
    distinct observed pairs are ever materialized. Each cell term is
    one IEEE division of exact counts (cast to double FIRST — r*c can
    pass 2^63 on a 100 TB corpus); terms accumulate as
    FLOOR(term * scale) DECIMAL(38,0) — order-free, so chi2 and
    V = sqrt(chi2 / (N * min(R-1, C-1))) replay bit-for-bit in SQL
    (the fixed-point convention; the floor grid means a
    near-independence chi2 can read a hair below 0 — clamped to 0 so
    sqrt stays real, documented). NULL categories are excluded (they
    are a missingness fact, not a level — profile_columns reports
    them); single-level inputs (min(R-1, C-1) = 0) yield NULL v.

    Returns one row: (n, levels_a, levels_b, chi2, v).

    Scale shape: ONE (a, b)-keyed count aggregation (distinct-pairs
    out), marginals re-aggregated FROM the cells (statistics-sized),
    two broadcast-shaped joins back onto the cells, one 1-row
    reduction. The corpus is scanned once."""
    sc = float(scale)
    # CHECKPOINT the cells (the cohens_kappa convention): they are
    # level-product-bounded model state, and every downstream branch
    # (marginals, join, level counts) re-derives them lazily — without
    # the checkpoint the corpus would scan once PER BRANCH (measured:
    # 5 scans), with it exactly once
    base = (df.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
            .groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
            .localCheckpoint(eager=True))
    rows_m = base.groupBy("__a").agg(F.sum("__n").alias("__r"))
    cols_m = base.groupBy("__b").agg(F.sum("__n").alias("__c"))
    joined = base.join(rows_m, on="__a").join(cols_m, on="__b")
    term = (F.col("__n").cast("double") * F.col("__n").cast("double")
            / (F.col("__r").cast("double") * F.col("__c").cast("double")))
    # level counts are the marginal tables' row counts — 1-row
    # aggregates cross-joined back (the welch_ttest statistics-side
    # pattern), NOT countDistinct over the cells: the distinct
    # aggregation would Expand the cells 2x and re-shuffle them twice
    agg = (joined.agg(
        F.sum(F.floor(term * F.lit(sc)).cast("decimal(38,0)"))
        .alias("__s"),
        F.sum("__n").cast("decimal(38,0)").alias("__nn"))
        .crossJoin(rows_m.agg(
            F.count(F.lit(1)).cast("bigint").alias("levels_a")))
        .crossJoin(cols_m.agg(
            F.count(F.lit(1)).cast("bigint").alias("levels_b"))))
    nd = F.col("__nn").cast("double")
    s = F.col("__s").cast("double") / F.lit(sc)
    chi2 = F.greatest(nd * (s - F.lit(1.0)), F.lit(0.0))
    dmin = F.when(F.col("levels_a") < F.col("levels_b"),
                  F.col("levels_a")).otherwise(F.col("levels_b")) - 1
    v = F.when((dmin > 0) & (F.col("__nn") > 0),
               F.sqrt(chi2 / (nd * dmin.cast("double"))))
    return agg.select(
        F.col("__nn").cast("bigint").alias("n"),
        "levels_a", "levels_b", chi2.alias("chi2"), v.alias("v"))


def embedding_drift(ref: DataFrame, cur: DataFrame, vec_col: str,
                    scale: float = 1e9) -> DataFrame:
    """Embedding-distribution drift between two snapshots: the cosine
    similarity of the two MEAN vectors plus both mean-vector norms —
    the cheap first-line monitor for "did the embedding model or the
    corpus shift under my ANN index?" (a centroid move is the failure
    mode that silently rots IVF cell assignments). Deliberately
    centroid-based: a full covariance drift is gram-matrix territory
    (similarity.gram_matrix) — this is the per-ingest cheap check.

    Exactness: per-dimension sums accumulate FLOOR(x * scale) in
    DECIMAL(38,0) (order-free) via ONE posexplode aggregation per side;
    the d-dimensional dot/norm reductions then run over the (d-row)
    statistics join in DECIMAL, and cosine = dot / (sqrt(nref) *
    sqrt(ncur)) is a fixed IEEE chain — every double replays. Vector
    dimensions are pinned in-scan (the gram_matrix guard — a
    mixed-dimension corpus poisons the build loudly, never silently).
    A zero mean vector on either side yields NULL cosine.

    Returns one row: (n_ref, n_cur, dim, cosine, norm_ref, norm_cur).

    Scale shape: one scan + one dimension-keyed aggregation per side
    (d rows out — model state), a d-row join, a 1-row finish.
    (r16 note: a single-aggregation rewrite — d per-dimension sums as
    aggregate expressions + a 1x1 stats crossJoin, the welch pattern —
    was built and MEASURED SLOWER on the battery line, 1.30s -> 2.91s
    warm-min: the 3·d-term DECIMAL expression chains dominate planning/
    codegen while the posexplode's d-group shuffle is already partial-
    aggregated map-side. Kept the explode shape deliberately.)"""
    sc = float(scale)

    def side(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(vec_col)
        checked = F.when(
            v.isNull() | (F.size(v) == 0),
            F.expr(f"raise_error('embedding_drift: {vec_col} must be "
                   "non-null and non-empty')").cast("int"),
        ).otherwise(F.size(v))
        base = (df.select(checked.alias("__d"),
                          F.posexplode(v).alias("__i", "__x"))
                .select("__d", "__i",
                        F.floor(F.col("__x").cast("double") * F.lit(sc))
                        .cast("decimal(38,0)").alias("__xf")))
        dims = (base.groupBy("__i")
                .agg(F.sum("__xf").alias(f"__s_{tag}"),
                     F.count(F.lit(1)).cast("bigint").alias(f"__n_{tag}"),
                     F.min("__d").alias("__dmin"),
                     F.max("__d").alias("__dmax")))
        guard = F.when(
            F.col("__dmin") != F.col("__dmax"),
            F.expr(f"raise_error('embedding_drift: {vec_col} has mixed "
                   "vector dimensions')").cast("bigint"),
        ).otherwise(F.col(f"__n_{tag}"))
        return dims.select("__i", f"__s_{tag}",
                           guard.alias(f"__n_{tag}"))

    # FULL join: a dimension present on one side only means the two
    # snapshots have different vector dimensionalities — raise, never
    # silently truncate the dot product to the shared prefix
    j = side(ref, "r").join(side(cur, "c"), on="__i", how="full")
    mismatch = F.when(
        F.col("__s_r").isNull() | F.col("__s_c").isNull(),
        F.expr("raise_error('embedding_drift: ref and cur vector "
               "dimensions differ')").cast("decimal(38,0)"),
    ).otherwise(F.col("__s_r"))
    j = j.select(F.col("__i"), mismatch.alias("__s_r"),
                 "__n_r", "__s_c", "__n_c")
    # per-dimension means in DECIMAL-exact numerators: mean_i = s_i / n;
    # fold the /n and /scale into the final chain so the reductions
    # stay integer sums
    agg = j.agg(
        F.max("__n_r").alias("n_ref"), F.max("__n_c").alias("n_cur"),
        F.count(F.lit(1)).cast("int").alias("dim"),
        F.sum(F.col("__s_r") * F.col("__s_c")).alias("__dot"),
        F.sum(F.col("__s_r") * F.col("__s_r")).alias("__rr"),
        F.sum(F.col("__s_c") * F.col("__s_c")).alias("__cc"))
    cosine = F.when(
        (F.col("__rr") > 0) & (F.col("__cc") > 0),
        F.col("__dot").cast("double")
        / (F.sqrt(F.col("__rr").cast("double"))
           * F.sqrt(F.col("__cc").cast("double"))))
    norm_r = (F.sqrt(F.col("__rr").cast("double"))
              / F.lit(sc) / F.col("n_ref").cast("double"))
    norm_c = (F.sqrt(F.col("__cc").cast("double"))
              / F.lit(sc) / F.col("n_cur").cast("double"))
    return agg.select("n_ref", "n_cur", "dim", cosine.alias("cosine"),
                      norm_r.alias("norm_ref"), norm_c.alias("norm_cur"))
