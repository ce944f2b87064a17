"""[EXTENSION] Deterministic sampling for training-data pipelines.

``TABLESAMPLE``/``df.sample`` are RNG-based — engine-dependent and
non-reproducible across runs, which disqualifies them for dataset
versioning. These operators derive membership from ``md5(id)`` instead:

- the same row lands in the same sample/split on ANY engine and at any
  scale (the oracle reproduces every operator exactly);
- sampling is a pure per-row filter — no shuffle, pushes through scans;
- thresholds compare the first 8 hex chars of the digest as STRINGS
  (lowercase hex order == numeric order), so no 64-bit arithmetic or
  hex-parsing portability hazards.

All three are Catalyst-native single expressions; at 100 TB a sample is
exactly one scan with the filter evaluated next to the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_HEX_SPACE = 16 ** 8  # first 8 hex chars of the md5 digest


def _bucket_expr(id_col: str, salt: str = "") -> F.Column:
    """First 8 hex chars of md5(salt || id) — a uniform [0, 16^8) draw,
    represented as a lowercase hex string (lexicographic == numeric)."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    return F.substring(F.md5(key), 1, 8)


def _threshold(rate: float) -> str:
    """8-hex-char cutoff for ``rate`` — only meaningful for rates strictly
    inside (0, 1); 16^8 itself would format to 9 chars and break the
    lexicographic compare, so the boundary cases are handled by
    ``_member_cond``/callers, never by this string."""
    t = max(0, min(_HEX_SPACE - 1, int(rate * _HEX_SPACE)))
    return format(t, "08x")


def _member_cond(bucket: F.Column, rate: float) -> F.Column:
    """Membership predicate for a cumulative rate. Boundary-exact: a rate
    that rounds to >= 16^8 admits every bucket (rate 1.0 must keep ALL
    rows — comparing against the 9-char '100000000' string would instead
    drop every bucket not starting with '0'), and <= 0 admits none."""
    t = int(rate * _HEX_SPACE)
    if t >= _HEX_SPACE:
        return F.lit(True)
    if t <= 0:
        return F.lit(False)
    return bucket < F.lit(format(t, "08x"))


def deterministic_sample(df: DataFrame, id_col: str, rate: float,
                         salt: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of the id: stable
    across engines, runs, partitionings, and scale. ``salt`` derives
    independent samples from the same ids."""
    return df.where(_member_cond(_bucket_expr(id_col, salt), rate))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/val/test …) by
    hash range; weights are normalized. Deterministic and disjoint —
    the membership contract a dataset version needs."""
    total = sum(weights.values())
    expr = None
    acc = 0.0
    items = list(weights.items())
    bucket = _bucket_expr(id_col, salt)
    for name, w in items[:-1]:
        acc += w / total
        # _member_cond, not a raw string compare: a cumulative weight that
        # reaches 1.0 before the last split (e.g. a zero-weight tail) must
        # capture every remaining row, not just buckets < '100000000'.
        cond = _member_cond(bucket, acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def shuffle_assignment(df: DataFrame, id_col: str, n_shards: int,
                       salt: str = "") -> DataFrame:
    """Deterministic global reshuffle for training-data writes: assign
    every row a shard in [0, n_shards) and a dense position within the
    shard, both pure functions of md5(salt || id) — the write order a
    pretraining run reads is then reproducible on any engine, at any
    parallelism, across dataset versions (re-salting gives an independent
    permutation of the SAME corpus).

    Scale shape: the shard is a per-row expression next to the scan; the
    in-shard position is one row_number window per shard — n_shards
    independent tasks, each sorting corpus/n_shards rows (pick n_shards ~
    cluster cores x small constant). No global single-task ordering
    anywhere. Writers then ``repartitionByRange(shard, shard_pos)`` or
    ``partitionBy(shard)`` and emit files whose order is the permutation.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # first 8 hex chars -> int; conv() is exact for 32-bit values (no
    # 64-bit signed-overflow hazard), modulo spreads uniformly
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
             % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("shard_pos",
                    (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h")
    )


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      n_per_stratum: int, salt: str = "") -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), picked by hash order with the id as tie-break — deterministic
    'take the first n of a stable shuffle' per group. One shuffle on the
    stratum key."""
    w = Window.partitionBy(strata_col).orderBy(
        _bucket_expr(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def leakage_safe_split(df: DataFrame, id_col: str, pairs: DataFrame,
                       weights: dict[str, float], salt: str = "",
                       split_col: str = "split") -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: the duplicate-pair graph (from ANY pair producer —
    minhash, simhash, n-gram Jaccard, embedding cosine, or their union)
    is closed into connected components, and the hash-range draw is made
    ONCE per COMPONENT — every member doc inherits its component's split.
    A plain per-doc hash_split puts two near-identical docs in train and
    test with probability 2·p·(1-p); this is the standard
    contamination-control fix (group-aware splitting).

    Returns (id, component, split): ``component`` is the min reachable id
    through the pair graph (singletons are their own component), so the
    assignment is deterministic, engine-reproducible, and stable under
    re-runs as long as the pair graph is.

    Scale shape: connected components is the iterative min-propagation
    over the (small) pair set; the split itself is one expression over
    md5(salt || component) — no extra shuffle beyond the component join.
    """
    from . import dedup

    comp = dedup.connected_components(
        pairs.select("id_a", "id_b")).withColumnRenamed("id", "__id")
    base = df.select(F.col(id_col).alias("__id"))
    withcomp = (
        base.join(comp, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("component", F.col("__id")).alias("component"),
        )
    )
    return hash_split(withcomp, "component", weights, salt=salt,
                      split_col=split_col)


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    salt: str = "") -> DataFrame:
    """Per-row importance sampling: keep each row with probability equal
    to its ``weight_col`` value in [0, 1] — the quality-weighted /
    length-weighted downsampling step of a data-mixture pass, as a
    deterministic hash filter rather than RNG (same row, same verdict on
    any engine/run/partitioning).

    Membership: md5 bucket < printf('%08x', floor(weight * 16^8)) — the
    same 8-hex-char string compare as deterministic_sample, with the
    threshold built PER ROW from the weight column (format_string and
    printf render identical lowercase hex in Spark and the oracle
    engine). weight >= 1 keeps the row unconditionally (the 9-char hex
    boundary hazard), weight <= 0 or NULL drops it. One scan, pure
    filter, pushes to the reader."""
    bucket = _bucket_expr(id_col, salt)
    w = F.col(weight_col).cast("double")
    thr = F.format_string(
        "%08x", F.floor(w * F.lit(float(_HEX_SPACE))).cast("bigint"))
    return df.where(
        w.isNotNull() & ((w >= 1.0) | ((w > 0.0) & (bucket < thr))))


def priority_sample(df: DataFrame, id_col: str, weight_col: str, k: int,
                    group_cols: list[str] | None = None,
                    salt: str = "") -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup): keep the ``k`` rows
    with the largest priority ``q = w / u``, where ``u`` is a uniform
    (0, 1] draw — the weight-aware fixed-SIZE sample beside
    weighted_sample's per-row rate filter (that one keeps a random
    NUMBER of rows; a mixture builder usually needs exactly k), with
    the standard subset-sum estimator attached: ``est_weight =
    max(w, tau)`` (tau = the (k+1)-th priority, 0 when the population
    has <= k rows) makes ``sum(est_weight)`` over any weight-subset an
    unbiased estimate of that subset's true mass.

    Deterministic like every sampler here: ``u = (h + 1) / 2^32`` with
    ``h`` the first 8 md5 hex chars of ``salt || id`` — an exact-double
    integer, so the priority is ONE correctly-rounded IEEE division and
    replays bit-for-bit on any engine (no pow/ln, which differ in the
    last ulp across libm implementations — the reason this is DLT
    priority sampling and not Efraimidis–Spirakis u^(1/w) reservoir
    sampling). Weights must be positive: NULL/<=0 raises in-scan (a
    silently dropped row would skew the estimator, same policy as
    mg_build's weight guard).

    Returns the sampled rows + (priority, est_weight, sample_rank).

    Scale shape: with ``group_cols``, one shuffle on the group key and
    a rank-truncated window — InferWindowGroupLimit prunes each map
    task to k+1 rows per group BEFORE the exchange. Without, a global
    orderBy(...).limit(k+1) plans as TakeOrderedAndProject (per-task
    top-(k+1) heaps, never a single-task sort); the follow-up window
    ranks only the <= k+1 survivors."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # same reserved-name collision policy as mad_outliers (an advisor
    # finding): withColumn would silently CLOBBER an input column named
    # 'priority' (and if that column were weight_col, the estimator
    # would then read priorities as weights)
    clash = {"priority", "sample_rank", "est_weight"} & set(df.columns)
    if clash:
        raise ValueError(f"priority_sample: input columns {sorted(clash)} "
                         "collide with reserved output names "
                         "['priority', 'sample_rank', 'est_weight']")
    ranked = df.withColumn("priority",
                           _priority_expr(id_col, weight_col, salt))
    if not group_cols:
        # global top-(k+1): TakeOrderedAndProject, then rank the tiny
        # survivor set (<= k+1 rows — the 1-partition window is bounded)
        ranked = ranked.orderBy(F.col("priority").desc(),
                                F.col(id_col).asc()).limit(k + 1)
    return _rank_and_estimate(ranked, id_col, weight_col, k, group_cols)


def _priority_expr(id_col: str, weight_col: str, salt: str) -> F.Column:
    """The DLT priority q = w / u, u = (first-8-md5-hex + 1) / 2^32 —
    one correctly-rounded IEEE division off exact-double operands, so
    it replays bit-for-bit on any engine. Weights must be positive:
    NULL/<=0 raises in-scan."""
    raw = F.col(weight_col)
    w = raw.cast("double")
    # isnan too: NaN fails every comparison (NaN <= 0 is false) but
    # SORTS ABOVE every double in Spark, so an unguarded NaN weight
    # would take sample_rank 1 and poison every est_weight sum — the
    # exact silent skew this guard exists to prevent
    w = F.when(
        raw.isNull() | F.isnan(w) | (w <= 0.0),
        F.expr("raise_error('priority_sample: weight_col must be "
               "positive, non-null and non-NaN')").cast("double"),
    ).otherwise(w)
    h = F.conv(_bucket_expr(id_col, salt), 16, 10).cast("bigint")
    return w / ((h + F.lit(1)).cast("double") / F.lit(float(_HEX_SPACE)))


def _rank_and_estimate(ranked: DataFrame, id_col: str, weight_col: str,
                       k: int, group_cols: list[str] | None) -> DataFrame:
    """Shared selection/estimation tail: rank rows carrying a
    ``priority`` column by (priority DESC, id), keep the top k, attach
    est_weight = max(w, tau) with tau = the (k+1)-th priority (0 when
    fewer than k+1 rows exist). Used by priority_sample directly and by
    priority_sample_finalize over a maintained top-(k+1) state table —
    ONE derivation, so batch and streaming cannot drift."""
    order = [F.col("priority").desc(), F.col(id_col).asc()]
    if group_cols:
        wnd = Window.partitionBy(*group_cols).orderBy(*order)
        tau_w = Window.partitionBy(*group_cols)
    else:
        wnd = Window.orderBy(*order)
        tau_w = Window.partitionBy()
    out = (ranked.withColumn("sample_rank", F.row_number().over(wnd))
           .where(F.col("sample_rank") <= k + 1))
    tau = F.max(F.when(F.col("sample_rank") == k + 1,
                       F.col("priority"))).over(tau_w)
    return (out
            .withColumn("est_weight",
                        F.greatest(F.col(weight_col).cast("double"),
                                   F.coalesce(tau, F.lit(0.0))))
            .where(F.col("sample_rank") <= k))


def priority_state(df: DataFrame, id_col: str, weight_col: str, k: int,
                   group_cols: list[str] | None = None,
                   salt: str = "") -> DataFrame:
    """MERGEABLE priority-sample state: the top-(k+1) rows per group by
    (priority DESC, id), as (group..., id, weight, priority). Top-(k+1)
    is BATCH-INVARIANT under union + re-truncation (any row among the
    global top-(k+1) is necessarily among its own shard's top-(k+1) —
    the theta-union argument), so per-shard/per-batch states folded
    through :func:`priority_state_merge` equal the state built over all
    rows at once, and :func:`priority_sample_finalize` on the merged
    state equals :func:`priority_sample` on the full data bit-for-bit.
    k+1 (not k) rows are kept so tau — the (k+1)-th priority the
    estimator needs — survives the truncation."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = list(group_cols or [])
    # the state schema is (group..., id, weight, priority): an id or
    # group column named 'weight'/'priority' would emit duplicate
    # column names (same advisor finding as priority_sample's guard)
    clash = {"priority", "weight"} & ({id_col} | set(groups))
    if weight_col == "priority":
        # withColumn('priority', ...) lands before the weight select,
        # so a weight_col named 'priority' would read the priorities
        clash.add("priority")
    if clash:
        raise ValueError(f"priority_state: id/group columns {sorted(clash)} "
                         "collide with the state's reserved "
                         "['weight', 'priority'] columns")
    d = df.withColumn("priority", _priority_expr(id_col, weight_col, salt))
    sel = groups + [F.col(id_col),
                    F.col(weight_col).cast("double").alias("weight"),
                    F.col("priority")]
    return _truncate_state(d.select(*sel), id_col, k, groups)


def priority_state_merge(states: DataFrame, id_col: str, k: int,
                         group_cols: list[str] | None = None) -> DataFrame:
    """Fold a UNION of priority states back to top-(k+1) per group.
    Exact duplicate rows (at-least-once re-delivery: same id, same
    weight -> identical priority) collapse first, so the merge is
    idempotent; the same id with a DIFFERENT weight is two candidate
    rows — ids are assumed to be unique row identities upstream."""
    return _truncate_state(states.dropDuplicates(), id_col, k,
                           list(group_cols or []))


def _truncate_state(d: DataFrame, id_col: str, k: int,
                    groups: list[str]) -> DataFrame:
    order = [F.col("priority").desc(), F.col(id_col).asc()]
    if not groups:
        # global: no ranks are needed here, so orderBy + limit plans as
        # TakeOrderedAndProject (per-task top-(k+1) heaps) — a global
        # row_number window would sort everything in ONE task
        return d.orderBy(*order).limit(k + 1)
    wnd = Window.partitionBy(*groups).orderBy(*order)
    return (d.withColumn("__rn", F.row_number().over(wnd))
            .where(F.col("__rn") <= k + 1).drop("__rn"))


def priority_sample_finalize(state: DataFrame, id_col: str, k: int,
                             group_cols: list[str] | None = None
                             ) -> DataFrame:
    """Derive the final sample (sample_rank <= k rows + est_weight)
    from a maintained top-(k+1) state table — the read side of the
    streaming maintenance loop. State tables are <= k+1 rows per group,
    so the windows here are state-sized, never corpus-sized."""
    return _rank_and_estimate(state, id_col, "weight", k,
                              list(group_cols or []) or None)


def cap_per_key(df: DataFrame, id_col: str, key_col: str, cap: int,
                order_col: str | None = None, salt: str = "") -> DataFrame:
    """Per-key contribution cap: keep AT MOST ``cap`` rows per
    ``key_col`` — the domain-cap rule a pretraining mixture applies so
    no single domain/site dominates the corpus (the count-based
    complement to mixture_sample's rate knob). Preference is
    deterministic: with ``order_col``, the cap keeps the HIGHEST values
    (quality-score semantics, ties broken by id ascending); without
    one, preference is ``md5(salt || id)`` ascending — an unbiased,
    engine-reproducible pseudo-random draw (same convention as every
    sampler here, so the oracle replays it in plain SQL).

    Returns the surviving rows with a ``key_rank`` column (1-based
    preference rank within the key).

    Scale shape: ONE shuffle on key_col + a rank-truncated window —
    Spark's InferWindowGroupLimit turns the rn <= cap filter into
    map-side WindowGroupLimit partial top-k, so a skewed key (one
    domain with 100M rows) prunes to ``cap`` rows per map task BEFORE
    the exchange instead of sorting the whole domain in one task."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if order_col is not None:
        order = [F.col(order_col).desc(), F.col(id_col).asc()]
    else:
        order = [_bucket_expr(id_col, salt).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (df.withColumn("key_rank", F.row_number().over(w))
            .where(F.col("key_rank") <= cap))
