"""[EXTENSION] Time-series gap filling — the hypertable-style
``time_bucket_gapfill(...) + locf()`` surface (TimescaleDB semantics:
a dense bucket grid per series key, missing buckets materialized, the
last observed aggregate carried forward).

Composition of built-in DataFrame ops only (no UDFs):

1. ONE corpus-scale aggregation per (key, bucket) — the only pass that
   touches the raw data;
2. the dense grid = distinct keys x an exploded bucket ``sequence`` —
   metadata-scale (keys x buckets rows), generated scan-side off the
   aggregated keys, never off the corpus;
3. a grid-sized left join + one ``last(..., ignorenulls=True)`` window
   per key for the carry-forward.

At 100 TB the raw table is read exactly once; everything after the
aggregate is proportional to |keys| x |buckets|, which is the rollup's
own output size. The window partitions on the series key — same key
space as the join, no second corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_BUCKETS = {"day", "hour", "week", "month"}

_STEP = {"day": "interval 1 day", "hour": "interval 1 hour",
         "week": "interval 7 day", "month": "interval 1 month"}


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    start: str,
    end: str,
    bucket: str = "day",
    aggs: dict[str, F.Column] | None = None,
    locf_cols: list[str] | None = None,
    interpolate_cols: list[str] | None = None,
) -> DataFrame:
    """Dense per-key time grid with last-observation-carried-forward.

    ``aggs`` maps output column name -> aggregate Column evaluated per
    (key, bucket) group (default: ``n = count(*)``). ``locf_cols`` names
    the agg outputs to carry forward into gap buckets (default: all of
    them); each gains a ``<name>_locf`` column. Every grid row also
    carries ``filled`` (true = no source rows in that bucket). Gap
    buckets read NULL for every raw agg column (coalesce to taste);
    locf columns read the previous observed value, or NULL before the
    first observation — TimescaleDB locf semantics. ``interpolate_cols``
    names agg outputs to LINEARLY interpolate instead (TimescaleDB
    ``interpolate()``): each gains ``<name>_interp`` = the agg value
    where it is non-NULL, else prev + (next - prev) * (t - t_prev) /
    (t_next - t_prev) between the NEAREST non-NULL aggregate values
    (NULL-aggregate buckets — gap or observed — interpolate alike), and
    NULL outside the observed range. The arithmetic is subtraction /
    multiplication / ONE division over exact epoch-second integers and
    the agg doubles — every op correctly-rounded IEEE, so the filled
    series replays bit-for-bit in SQL (the correlation_matrix
    convention; no splines, which would need transcendentals).

    ``start``/``end`` are inclusive ISO timestamps (explicit, like
    TimescaleDB's gapfill arguments — deriving the range from the data
    would make the output schema depend on which partitions happened to
    arrive). Keys are the DISTINCT keys present in the aggregate; a key
    with no rows anywhere has no series to fill. Rows with a NULL
    ``ts_col`` are excluded up front (no bucket to land in).
    """
    import datetime as _dt

    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}, "
                         f"got {bucket!r}")
    # validate up front (the profile_columns convention): only
    # parsed-and-reformatted ISO timestamps ever reach the SQL text,
    # and a reversed range fails HERE, not inside sequence() at runtime
    try:
        t0, t1 = (_dt.datetime.fromisoformat(x) for x in (start, end))
    except ValueError as exc:
        raise ValueError(f"start/end must be ISO timestamps: {exc}")
    if t0 > t1:
        raise ValueError(f"start {start!r} is after end {end!r}")
    start, end = t0.isoformat(sep=" "), t1.isoformat(sep=" ")
    aggs = dict(aggs) if aggs else {"n": F.count(F.lit(1)).cast("bigint")}
    reserved = {"__k", "__cnt", "bucket", "filled"}
    # key_col lands verbatim in the output beside 'bucket'/'filled', so
    # a key named either yields duplicate output columns (ambiguous
    # downstream selects — an advisor finding); ts_col is rejected on
    # the same set for symmetry (it feeds the reserved 'bucket')
    clash = sorted(reserved & (set(aggs) | {key_col, ts_col})) + sorted(
        f"{c}_locf" for c in aggs if f"{c}_locf" in aggs)
    if clash:
        raise ValueError(f"agg/key/ts names {clash} collide with "
                         f"gapfill's reserved columns {sorted(reserved)}")
    locf_cols = list(aggs) if locf_cols is None else list(locf_cols)
    interpolate_cols = list(interpolate_cols or [])
    unknown = [c for c in locf_cols if c not in aggs] + [
        c for c in interpolate_cols if c not in aggs]
    if unknown:
        raise ValueError(f"locf/interpolate cols not in aggs: {unknown}")
    iclash = sorted({f"{c}_interp" for c in interpolate_cols} & set(aggs))
    if iclash:
        raise ValueError(f"agg names {iclash} collide with generated "
                         "_interp output columns")

    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    # the rollup feeds BOTH the key list and the grid join — checkpoint
    # the keys-x-buckets-sized result so the corpus aggregates once,
    # not once per reference
    # __cnt drives the filled flag: an observed bucket whose user
    # aggregate is legitimately NULL (e.g. max over all-NULL values)
    # must NOT read as a gap (a review reproduced locf carrying the
    # previous bucket's value over an observed one)
    # NULL-timestamp rows have no bucket to land in: filter them
    # EXPLICITLY (they used to fall out silently at the grid join via
    # NULL-never-equals — same outcome, now stated; an advisor finding)
    df = df.where(F.col(ts_col).isNotNull())
    agg = (df.groupBy(F.col(key_col).alias("__k"), b)
           .agg(*[v.alias(k) for k, v in aggs.items()],
                F.count(F.lit(1)).alias("__cnt"))
           .localCheckpoint(eager=True))

    # dense grid: distinct keys x the bucket spine, exploded scan-side
    # off the (tiny) key list — sequence() is end-INCLUSIVE, and start
    # is snapped to its bucket so grid buckets align with date_trunc
    spine = (f"sequence(date_trunc('{bucket}', timestamp'{start}'), "
             f"timestamp'{end}', {_STEP[bucket]})")
    grid = (agg.select(F.col("__k")).distinct()
            .withColumn("bucket", F.explode(F.expr(spine))))

    out = grid.join(agg, on=["__k", "bucket"], how="left")
    w = (Window.partitionBy("__k").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = F.col("__cnt").isNull().alias("filled")
    cols = [F.col("__k").alias(key_col), F.col("bucket"), filled]
    for name in aggs:
        cols.append(F.col(name))
    for name in locf_cols:
        cols.append(F.last(F.col(name), ignorenulls=True).over(w)
                    .alias(f"{name}_locf"))
    # interpolation windows sit on the SAME key partitioning as the
    # locf window and the grid join — still one metadata-scale shuffle
    wp = (Window.partitionBy("__k").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    wn = (Window.partitionBy("__k").orderBy("bucket")
          .rowsBetween(1, Window.unboundedFollowing))

    # CALENDAR-field epoch, not instant epoch: unix_timestamp() is
    # session-timezone dependent — across a DST transition day buckets
    # sit 82800/90000 s apart as instants while the DuckDB oracle's
    # naive epoch() yields uniform 86400 s days, skewing (t-pt)/(nt-pt)
    # (an advisor finding). Rebuilding t from the LOCAL calendar fields
    # (date + wall-clock time-of-day) is invariant to the session tz
    # and matches naive-timestamp epoch arithmetic exactly.
    def naive_epoch(c: str) -> F.Column:
        return (F.datediff(F.col(c), F.lit("1970-01-01"))
                .cast("bigint") * 86400
                + F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c))

    t = naive_epoch("bucket").cast("double")
    for name in interpolate_cols:
        v = F.col(name).cast("double")
        obs_t = F.when(v.isNotNull(), naive_epoch("bucket"))
        pv = F.last(v, ignorenulls=True).over(wp)
        pt = F.last(obs_t, ignorenulls=True).over(wp).cast("double")
        nv = F.first(v, ignorenulls=True).over(wn)
        nt = F.first(obs_t, ignorenulls=True).over(wn).cast("double")
        interp = F.coalesce(
            v, pv + (nv - pv) * ((t - pt) / (nt - pt)))
        cols.append(interp.alias(f"{name}_interp"))
    return out.select(*cols)


def trend_ols(df: DataFrame, x_col: str, y_col: str,
              group_cols: list[str] | None = None,
              scale: float = 1e6) -> DataFrame:
    """Per-group ordinary-least-squares trend: slope / intercept / r2 of
    y over x from the five closed-form sums — the "is this series
    drifting?" statistic a monitoring rollup keeps per key (TimescaleDB
    ships it as stats_agg/slope; this is that surface), computed in ONE
    aggregation pass.

    Exactness (the correlation_matrix convention): Sx, Sy, Sxx, Sxy,
    Syy each accumulate as FLOOR(term * scale) in DECIMAL(38,0) —
    order-free, engine-exact — and the closed forms
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
    intercept = (Sy - slope*Sx) / n,
    r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))
    are then single correctly-rounded IEEE ops, so every double replays
    verbatim in SQL. A constant x (zero variance) yields NULL slope/
    intercept/r2 — deterministic, not NaN; a constant y yields NULL r2.
    Rows with NULL x or y are excluded (complete-case).

    Returns (group..., n, slope, intercept, r2).

    Scale shape: one scan, one partial/final aggregation pair per group
    — statistics out, never data."""
    groups = list(group_cols or [])
    reserved = {"n", "slope", "intercept", "r2"}
    clash = reserved & set(groups)
    if clash:
        raise ValueError(f"trend_ols: group columns {sorted(clash)} "
                         f"collide with output names {sorted(reserved)}")
    sc = float(scale)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")

    def fx(expr: F.Column) -> F.Column:
        return (F.sum(F.floor(expr * F.lit(sc)).cast("decimal(38,0)"))
                .cast("double") / F.lit(sc))

    stats = (df.where(x.isNotNull() & y.isNotNull())
             .groupBy(*groups)
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  fx(x).alias("__sx"), fx(y).alias("__sy"),
                  fx(x * x).alias("__sxx"), fx(x * y).alias("__sxy"),
                  fx(y * y).alias("__syy")))
    nd = F.col("n").cast("double")
    dx = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = nd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when(dx > 0, cov / dx)
    intercept = F.when(dx > 0,
                       (F.col("__sy") - (cov / dx) * F.col("__sx")) / nd)
    r2 = F.when((dx > 0) & (dy > 0), cov * cov / (dx * dy))
    return stats.select(*groups, "n", slope.alias("slope"),
                        intercept.alias("intercept"), r2.alias("r2"))


def acf(df: DataFrame, key_col: str, order_col: str, value_col: str,
        max_lag: int = 5, scale: float = 1e6) -> DataFrame:
    """Per-series sample autocorrelation function at lags 1..``max_lag``
    — the seasonality / persistence diagnostic a monitoring rollup
    keeps beside :func:`trend_ols` (TimescaleDB pairs stats_agg with it;
    statsmodels calls it acf): r_k = sum_{t<=n-k}((x_t - m)(x_{t+k} - m))
    / sum((x_t - m)^2) with m the series mean.

    Exactness (the trend_ols convention): the lag cross-sums A_k =
    sum(x_t * x_{t+k}) and the edge sums B_k = sum_{t<=n-k} x_t,
    C_k = sum_{t>k} x_t accumulate as FLOOR(term * scale) in
    DECIMAL(38,0) — order-free — alongside the series' n / S / SS; the
    closed form r_k = (A_k - m*(B_k + C_k) + (n-k)*m^2) / (SS - n*m^2)
    is then a FIXED chain of IEEE ops (m = S/n computed once), so every
    double replays verbatim in SQL. A constant series (zero variance)
    yields NULL acf — deterministic, not NaN. Rows with NULL value are
    excluded BEFORE lagging (complete-case in the compacted order, the
    statsmodels treatment of explicitly-dropped missings); series
    shorter than k+1 rows yield no row for lag k.

    Returns (key, lag, n, acf).

    Scale shape: ONE key-partitioned window shuffle produces all
    max_lag lead columns at once (same partitioning for every lag),
    then one key-keyed aggregation emits the statistics row; the
    (key, lag) reshape explodes only statistics. Never data x lag."""
    from pyspark.sql.window import Window

    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    sc = float(scale)
    x = F.col(value_col).cast("double")
    w = Window.partitionBy("__k").orderBy("__o")
    base = (df.where(x.isNotNull())
            .select(F.col(key_col).alias("__k"),
                    F.col(order_col).alias("__o"), x.alias("__x")))
    for k in range(1, max_lag + 1):
        base = base.withColumn(f"__l{k}", F.lead("__x", k).over(w))

    def fx(expr: F.Column) -> F.Column:
        return F.sum(F.when(
            expr.isNotNull(),
            F.floor(expr * F.lit(sc)).cast("decimal(38,0)"))
            .otherwise(F.lit(0).cast("decimal(38,0)")))

    aggs = [F.count(F.lit(1)).cast("bigint").alias("n"),
            fx(F.col("__x")).alias("__s"),
            fx(F.col("__x") * F.col("__x")).alias("__ss")]
    for k in range(1, max_lag + 1):
        lk = F.col(f"__l{k}")
        aggs += [
            fx(F.col("__x") * lk).alias(f"__a{k}"),
            fx(F.when(lk.isNotNull(), F.col("__x"))).alias(f"__b{k}"),
            fx(lk).alias(f"__c{k}"),
            F.sum(lk.isNotNull().cast("bigint")).alias(f"__n{k}"),
        ]
    stats = base.groupBy("__k").agg(*aggs)
    nd = F.col("n").cast("double")
    m = (F.col("__s").cast("double") / F.lit(sc)) / nd
    denom = F.col("__ss").cast("double") / F.lit(sc) - nd * m * m
    rows = []
    for k in range(1, max_lag + 1):
        numer = (F.col(f"__a{k}").cast("double") / F.lit(sc)
                 - m * ((F.col(f"__b{k}").cast("double") / F.lit(sc))
                        + (F.col(f"__c{k}").cast("double") / F.lit(sc)))
                 + F.col(f"__n{k}").cast("double") * m * m)
        rows.append(F.struct(
            F.lit(k).alias("lag"),
            F.col(f"__n{k}").alias("pairs"),
            F.when(denom > 0, numer / denom).alias("acf")))
    exploded = (stats.select(F.col("__k").alias(key_col), "n",
                             F.explode(F.array(*rows)).alias("c"))
                .where(F.col("c.pairs") > 0))
    return exploded.select(key_col, F.col("c.lag").alias("lag"), "n",
                           F.col("c.acf").alias("acf"))


def cusum_changepoint(df: DataFrame, key_col: str, order_col: str,
                      value_col: str, scale: float = 1e6) -> DataFrame:
    """Per-series CUSUM changepoint scan (Page 1954 / the standard
    offline mean-shift screen): S_t = sum_{i<=t}(x_i - m) with m the
    series mean; the changepoint estimate is the position maximizing
    |S_t| and the score is max|S_t| scaled by the series' dispersion —
    the "did this metric's level shift, and where?" monitor beside
    :func:`trend_ols` (drift) and :func:`acf` (seasonality).

    Exactness: prefix sums accumulate the FLOOR(x * scale) fixed-point
    integers (order-free per prefix; the per-key window is a
    deterministic total order on (order, value)), S_t = P_t - t*(T/n)
    with T the exact total, and the reported ``stat`` =
    max|S_t| / sqrt(n * msd) where msd = SS/n - m^2 — sqrt is
    correctly-rounded IEEE, so the score replays verbatim (the
    Welch-t convention). Constant series score NULL (no dispersion,
    nothing to shift). NULL values are excluded up front.

    Returns (key, n, cp_pos, cp_order, max_abs_cusum, stat) — cp_pos
    the 1-based position of the max (earliest on ties: deterministic),
    cp_order that row's order value.

    Scale shape: one key-partitioned window (prefix position + prefix
    sum share it), one key aggregation with max_by for the argmax —
    two key-keyed exchanges total, no collect."""
    from pyspark.sql.window import Window

    sc = float(scale)
    x = F.col(value_col).cast("double")
    base = (df.where(x.isNotNull())
            .select(F.col(key_col).alias("__k"),
                    F.col(order_col).alias("__o"),
                    F.floor(x * F.lit(sc)).cast("decimal(38,0)")
                    .alias("__xf"),
                    F.floor(x * x * F.lit(sc)).cast("decimal(38,0)")
                    .alias("__xxf")))
    w = (Window.partitionBy("__k").orderBy("__o", "__xf")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (base
           .withColumn("__t", F.count(F.lit(1)).over(w))
           .withColumn("__p", F.sum("__xf").over(w)))
    # the integer argmax |S_t| = |P_t*n - t*T|/(scale*n) needs the
    # series totals on every row — aggregate the (key-sized) totals and
    # rejoin over the SAME key partitioning (clearing the /n keeps the
    # argmax comparison exact-integer)
    tot = (pre.groupBy("__k")
           .agg(F.max("__t").cast("bigint").alias("n"),
                F.sum("__xf").alias("__tot"),
                F.sum("__xxf").alias("__sstot")))
    scored = (pre.join(tot, on="__k")
              .withColumn("__dev", F.abs(
                  F.col("__p") * F.col("n") - F.col("__t") * F.col("__tot"))))
    best = (scored.groupBy("__k")
            .agg(F.max("n").cast("bigint").alias("n"),
                 F.max("__tot").alias("__tot"),
                 F.max("__sstot").alias("__sstot"),
                 F.max("__dev").alias("__mdev"),
                 F.min_by(
                     F.struct(F.col("__t").alias("pos"),
                              F.col("__o").alias("ord")),
                     F.struct((-F.col("__dev")).alias("a"),
                              F.col("__t").alias("b"))).alias("__at")))
    nd = F.col("n").cast("double")
    m = (F.col("__tot").cast("double") / F.lit(sc)) / nd
    msd = (F.col("__sstot").cast("double") / F.lit(sc)) / nd - m * m
    # max|S_t| in value units: __mdev is scale*n*|S_t|
    mdev = F.col("__mdev").cast("double") / F.lit(sc) / nd
    stat = F.when(msd > 0, mdev / F.sqrt(nd * msd))
    return best.select(
        F.col("__k").alias(key_col), "n",
        F.col("__at.pos").cast("bigint").alias("cp_pos"),
        F.col("__at.ord").alias("cp_order"),
        mdev.alias("max_abs_cusum"),
        stat.alias("stat"))


def ohlc_downsample(df: DataFrame, ts_col: str, key_col: str,
                    value_col: str, bucket: str = "day") -> DataFrame:
    """OHLC (open/high/low/close) downsample per series key and time
    bucket — the candlestick rollup every tick/metric store ships
    (TimescaleDB ohlc(), InfluxDB aggregateWindow): open = value at the
    EARLIEST row in the bucket, close = at the LATEST, high/low = the
    extremes.

    Determinism: open/close tie-break on (ts, value) lexicographically
    (min/max over a two-field struct — same-timestamp duplicates pick
    the smaller/larger value), so the result is well-defined even on
    tick data with collided timestamps; every output is an input value,
    no arithmetic at all. NULL values and NULL timestamps are excluded.

    Returns (key, bucket, n, open, high, low, close).

    Scale shape: ONE aggregation over one scan — min/max of structs are
    ordinary map-side-combinable aggregates; no window, no join."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}, "
                         f"got {bucket!r}")
    v = F.col(value_col).cast("double")
    base = (df.where(v.isNotNull() & F.col(ts_col).isNotNull())
            .select(F.col(key_col).alias("__k"),
                    F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
                    F.col(ts_col).alias("__ts"), v.alias("__v")))
    return (base.groupBy(F.col("__k").alias(key_col), "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.min(F.struct("__ts", "__v")).alias("__o"),
                 F.max("__v").alias("high"),
                 F.min("__v").alias("low"),
                 F.max(F.struct("__ts", "__v")).alias("__c"))
            .select(key_col, "bucket", "n",
                    F.col("__o.__v").alias("open"), "high", "low",
                    F.col("__c.__v").alias("close")))


def decompose_seasonal(df: DataFrame, key_col: str, order_col: str,
                       value_col: str, period: int,
                       scale: float = 1e6) -> DataFrame:
    """Classical additive seasonal decomposition per series —
    x = trend + seasonal + residual (the moving-average method every
    stats package ships as its default decompose; STL's loess needs
    iterative weighted regressions and is out of the replayable-SQL
    envelope by design):

    - ``trend`` = centered moving average over ``period`` rows (period
      ODD and >= 3 enforced — the even case needs the 2xMA half-weight
      trick and a deterministic replacement exists by just picking the
      odd neighbor); NULL where the window is incomplete (series
      edges);
    - ``seasonal`` = per-phase mean of the detrended values (phase =
      0-based row position mod period), CENTERED by subtracting the
      mean of the phase means so seasonals sum to ~0 (the classical
      identifiability convention);
    - ``residual`` = x - trend - seasonal (NULL wherever trend is).

    Exactness: every mean is a fixed-point FLOOR(term * scale)
    DECIMAL(38,0) sum (order-free) followed by ONE division chain in a
    fixed order, so all three components replay bit-for-bit in SQL
    (the trend_ols convention). Rows with NULL values are excluded up
    front (complete-case; the row-position phase is assigned AFTER
    exclusion so the seasonal grid stays dense).

    Returns (key, order, x, phase, trend, seasonal, residual).

    Scale shape: one key-partitioned window shuffle (row position +
    moving sum + count share it), one (key, phase)-keyed aggregation
    (p rows per key — statistics-sized), a key-sized window for the
    centering, one broadcast-shaped join back. The corpus shuffles
    once."""
    from pyspark.sql.window import Window

    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be an odd integer >= 3, "
                         f"got {period}")
    half = period // 2
    sc = float(scale)
    x = F.col(value_col).cast("double")
    base = (df.where(x.isNotNull())
            .select(F.col(key_col).alias("__k"),
                    F.col(order_col).alias("__o"), x.alias("__x")))
    wo = Window.partitionBy("__k").orderBy("__o")
    wt = wo.rowsBetween(-half, half)
    xf = F.floor(F.col("__x") * F.lit(sc)).cast("decimal(38,0)")
    pre = (base
           .withColumn("__rn", F.row_number().over(wo))
           .withColumn("__wc", F.count(F.lit(1)).over(wt))
           .withColumn("__ws", F.sum(xf).over(wt)))
    trend = F.when(
        F.col("__wc") == period,
        (F.col("__ws").cast("double") / F.lit(sc)) / float(period))
    pre = (pre.withColumn("trend", trend)
           .withColumn("__ph", (F.col("__rn") - 1) % period)
           .withColumn("__det", F.col("__x") - F.col("trend")))
    det_f = F.when(
        F.col("__det").isNotNull(),
        F.floor(F.col("__det") * F.lit(sc)).cast("decimal(38,0)"))
    smeans = (pre.groupBy("__k", "__ph")
              .agg(F.sum(det_f).alias("__ds"),
                   F.sum(F.col("__det").isNotNull().cast("bigint"))
                   .alias("__dn")))
    smean = F.when(
        F.col("__dn") > 0,
        (F.col("__ds").cast("double") / F.lit(sc))
        / F.col("__dn").cast("double"))
    smeans = smeans.select("__k", "__ph", smean.alias("__sm"))
    # centering over the <= period phase means — a key-sized window
    wk = Window.partitionBy("__k")
    sm_f = F.when(F.col("__sm").isNotNull(),
                  F.floor(F.col("__sm") * F.lit(sc)).cast("decimal(38,0)"))
    centered = (smeans
                .withColumn("__gs", F.sum(sm_f).over(wk))
                .withColumn("__gn", F.sum(
                    F.col("__sm").isNotNull().cast("bigint")).over(wk))
                .select("__k", "__ph",
                        (F.col("__sm")
                         - (F.col("__gs").cast("double") / F.lit(sc))
                         / F.col("__gn").cast("double"))
                        .alias("seasonal")))
    out = pre.join(centered, on=["__k", "__ph"], how="left")
    return out.select(
        F.col("__k").alias(key_col), F.col("__o").alias(order_col),
        F.col("__x").alias(value_col),
        F.col("__ph").cast("int").alias("phase"),
        "trend", "seasonal",
        (F.col("__x") - F.col("trend") - F.col("seasonal"))
        .alias("residual"))


def zscore_anomalies(df: DataFrame, key_col: str, order_col: str,
                     value_col: str, window: int = 7, k: float = 3.0,
                     scale: float = 1e6) -> DataFrame:
    """Rolling z-score anomaly flags per series — the classic
    "is this point k sigmas off its own recent level?" monitor
    (Datadog/Grafana anomaly bands, the online twin of
    :func:`cusum_changepoint`'s offline scan): z_t = (x_t - m_t) / s_t
    with m_t/s_t the mean / sample stddev of the TRAILING ``window``
    PRIOR points (the current point is excluded — an anomaly must not
    mask itself by inflating its own baseline).

    Exactness (the trend_ols convention): the rolling sums accumulate
    FLOOR(x * scale) fixed-point integers over the window frame
    (order-free within the frame), m/s/z are a fixed chain of exactly
    rounded IEEE ops (one sqrt); z is NULL until ``window`` prior
    points exist and when the trailing window has zero variance (a
    flat baseline has no sigma to score against — deterministic NULL,
    and a level JUMP off a flat baseline is cusum/gapfill territory).
    Rows with NULL values are excluded up front (complete-case; the
    trailing frame is over OBSERVED points, the Hampel convention).

    Returns (key, order, x, mean, std, z, is_anomaly).

    Scale shape: ONE key-partitioned window shuffle (both rolling sums
    and the count share the frame), scan-side arithmetic after — the
    corpus shuffles once, no join."""
    from pyspark.sql.window import Window

    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not (k > 0):
        raise ValueError(f"k must be > 0, got {k}")
    sc = float(scale)
    x = F.col(value_col).cast("double")
    base = (df.where(x.isNotNull())
            .select(F.col(key_col).alias("__k"),
                    F.col(order_col).alias("__o"), x.alias("__x")))
    xf = F.floor(F.col("__x") * F.lit(sc)).cast("decimal(38,0)")
    xxf = F.floor(F.col("__x") * F.col("__x") * F.lit(sc)) \
        .cast("decimal(38,0)")
    wt = (Window.partitionBy("__k").orderBy("__o")
          .rowsBetween(-window, -1))
    pre = (base
           .withColumn("__wc", F.count(F.lit(1)).over(wt))
           .withColumn("__ws", F.sum(xf).over(wt))
           .withColumn("__wss", F.sum(xxf).over(wt)))
    nd = F.lit(float(window))
    m = (F.col("__ws").cast("double") / F.lit(sc)) / nd
    # sample variance over the window, n-1 denominator (the Welch
    # convention)
    var = ((F.col("__wss").cast("double") / F.lit(sc)) - nd * m * m) \
        / (nd - 1.0)
    full = F.col("__wc") == window
    z = F.when(full & (var > 0), (F.col("__x") - m) / F.sqrt(var))
    return pre.select(
        F.col("__k").alias(key_col), F.col("__o").alias(order_col),
        F.col("__x").alias(value_col),
        F.when(full, m).alias("mean"),
        F.when(full & (var > 0), F.sqrt(var)).alias("std"),
        z.alias("z"),
        F.when(full & (var > 0), F.abs(z) > F.lit(float(k)))
        .alias("is_anomaly"))


def ewma(df: DataFrame, key_col: str, order_col: str, value_col: str,
         alpha: float = 0.5, window: int = 16) -> DataFrame:
    """Per-series exponentially weighted moving average over a sliding
    ``window`` of trailing points — the standard smoother a monitoring
    rollup keeps beside :func:`zscore_anomalies` (bands) and
    :func:`trend_ols` (drift): recent points dominate, old points
    decay geometrically.

    Semantics: the recursion y = (1-a)*y_prev + a*x REPLAYED over the
    trailing ``window`` points only, initialized at the window's
    oldest point (the pandas ``ewm(adjust=False)`` update with a
    bounded restart) — for rows earlier than a full window the
    recursion starts at the series head, so the first row is exactly
    x_0. Truncation is the scale contract: true EWMA is inherently
    sequential state; the trailing-window replay bounds every row's
    dependence at ``window`` lags while the dropped tail carries
    weight (1-a)^window (~1e-5 at the defaults) — the same
    window-bounding argument as zscore_anomalies.

    Exactness: the closed form is y_t = sum_j w_j * lag_j(x) with
    PRECOMPUTED Python-float weights (w_j = a*(1-a)^j for trailing
    lags, (1-a)^j for the window-opening lag), evaluated as ONE fixed
    left-to-right chain of correctly-rounded IEEE ops per row — the
    weights ship to SQL as repr-exact literals, so every double
    replays verbatim in any engine (the Benford-literal convention:
    no transcendental ever evaluates in-engine).

    NULL values raise in-scan (a silently skipped point would shift
    every later lag — resample/gapfill first, the zscore contract).

    Returns (key, order, x, ewma).

    Scale shape: ONE key-partitioned window shuffle serves every lag
    (pure codegen lead/lag columns — no per-lag pass, no explode);
    rows never leave their key partition."""
    from pyspark.sql.window import Window

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    a = float(alpha)
    # w_tail[j]: weight of lag j when it is NOT the oldest point in
    # scope; w_open[j]: weight when lag j opens the (possibly partial)
    # window — the recursion's initialization lands there.
    w_tail = [a * (1.0 - a) ** j for j in range(window)]
    w_open = [(1.0 - a) ** j for j in range(window)]
    x = F.col(value_col).cast("double")
    checked = F.when(
        x.isNull(),
        F.expr(f"raise_error('ewma: {value_col} must be non-null — "
               "gapfill first')").cast("double"),
    ).otherwise(x)
    w = Window.partitionBy("__k").orderBy("__o")
    base = (df.select(F.col(key_col).alias("__k"),
                      F.col(order_col).alias("__o"),
                      checked.alias("__x"))
            .withColumn("__rn", F.row_number().over(w)))
    for j in range(1, window):
        base = base.withColumn(f"__l{j}", F.lag("__x", j).over(w))
    # opening lag index = min(rn - 1, window - 1); fixed j-ascending
    # summation order so both engines add in the same sequence
    open_j = F.least(F.col("__rn") - 1, F.lit(window - 1))
    total = None
    for j in range(window):
        xj = F.col("__x") if j == 0 else F.col(f"__l{j}")
        wj = F.when(open_j == j, F.lit(w_open[j])).otherwise(
            F.lit(w_tail[j]))
        term = F.when(xj.isNull(), F.lit(0.0)).otherwise(wj * xj)
        total = term if total is None else total + term
    return base.select(F.col("__k").alias(key_col),
                       F.col("__o").alias(order_col),
                       F.col("__x").alias("x"),
                       total.alias("ewma"))
