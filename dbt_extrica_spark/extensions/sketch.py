"""[EXTENSION] Count-Min Sketch over token streams.

A CMS answers "how often does token X appear?" in O(width x depth) space with
a one-sided error (estimate >= true count) — the sketch a 100 TB pipeline
keeps per shard and merges by cell-wise addition (the counts table IS the
sketch; merging shards = UNION ALL + re-aggregate).

Hash family is md5-derived (first 8 hex chars -> int), so the construction
is reproducible in any engine with md5 — which is what makes the DuckDB
oracle possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_expr(token_col: str, seed: int, width: int) -> str:
    return (
        f"CAST(conv(substring(md5(concat({token_col}, '#', {seed})), 1, 8),"
        f" 16, 10) AS BIGINT) % {width}"
    )


def token_stream(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("token")
    ).where(F.length("token") > 0)


def count_min_sketch(tokens: DataFrame, width: int = 256,
                     depth: int = 4) -> DataFrame:
    """Build the sketch: (d, bucket, c) counts — depth x width cells."""
    rows = tokens.select(
        F.explode(F.expr(
            "array(" + ", ".join(
                f"named_struct('d', {d}, 'bucket', {_bucket_expr('token', d, width)})"
                for d in range(depth)
            ) + ")"
        )).alias("cell")
    )
    return (
        rows.select(F.col("cell.d").alias("d"),
                    F.col("cell.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_estimates(tokens: DataFrame, width: int = 256,
                  depth: int = 4) -> DataFrame:
    """Per distinct token: CMS estimate (min over rows) alongside the exact
    count — estimate >= exact always; equality when no collisions."""
    sketch = count_min_sketch(tokens, width, depth)
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact"))
    probes = exact.select(
        "token", "exact",
        F.explode(F.expr(
            "array(" + ", ".join(
                f"named_struct('d', {d}, 'bucket', {_bucket_expr('token', d, width)})"
                for d in range(depth)
            ) + ")"
        )).alias("cell"),
    ).select("token", "exact",
             F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["d", "bucket"])
        .groupBy("token", "exact")
        .agg(F.min("c").cast("bigint").alias("estimate"))
    )


def hll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               split_col: str, lg_k: int = 12) -> DataFrame:
    """Mergeable distinct-count rollup via Datasketches HLL
    (hll_sketch_agg / hll_union_agg, Spark 3.5+): build one sketch per
    (group, split) — e.g. per (event_type, day) — then MERGE the split
    sketches per group and estimate.

    This two-level shape is the 100 TB pattern: fine-grained sketches are
    tiny (2^lg_k bytes), persist alongside rollup tables, and re-aggregate
    to any coarser grouping WITHOUT rescanning raw data — the sketch analog
    of the rollup-cascade operator. Returns group_cols + (distinct_est
    bigint); the estimate obeys standard HLL error (~1.04/sqrt(2^lg_k),
    well under 2% at lg_k=12)."""
    per_split = (
        df.groupBy(*group_cols, split_col)
        .agg(F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("__sk"))
    )
    return (
        per_split.groupBy(*group_cols)
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(__sk, false))")
             .cast("bigint").alias("distinct_est"))
    )


# ---------------------------------------------------------------------------
# Misra-Gries: DETERMINISTIC mergeable heavy-hitters summary (Misra &
# Gries '82; mergeability per Agarwal et al., "Mergeable Summaries",
# PODS'12) — completes the mergeable-sketch family (CMS: frequencies,
# HLL: distincts, q-digest: quantiles, MG: heavy hitters).
#
# This implementation is the ORDER-FREE equivalent of the streaming
# algorithm: per group, exact token counts are truncated to the top k by
# subtracting the (k+1)-th largest count (ties broken by token, so the
# summary is bit-replayable on any cluster layout and reproducible in
# any SQL engine — which is what makes the DuckDB oracle possible).
# Guarantees, with D = the sum of every decrement applied along the
# build/merge chain: 0 <= exact - est <= D for every token (est = 0 when
# absent), and D <= n/(k+1) because each group's decrement is its
# (k+1)-th largest count <= n_group/(k+1). Hence every token with
# exact > n/(k+1) SURVIVES the merge — the classic MG guarantee.
#
# Shape at 100 TB: the per-group count is one partial-aggregated shuffle
# (map-side combine does the heavy lifting) + one window over the SAME
# partitioning (no second exchange); the merge input is summaries
# (<= k rows per group, never data), so the single-task merge window is
# sketch-sized — the q-digest-merge shape.
# ---------------------------------------------------------------------------

def _mg_truncate(counts: DataFrame, token_col: str,
                 group_cols: list[str], k: int):
    """Shared truncate-to-k: rank per group by (cnt desc, token), subtract
    the (k+1)-th largest. Returns (summary, stats) where stats is ONE row
    (dec = sum of per-group decrements, n = total count mass)."""
    from pyspark.sql import Window

    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col("cnt").desc(), F.col(token_col).asc())
        wg = Window.partitionBy(*group_cols)
    else:
        w = Window.orderBy(F.col("cnt").desc(), F.col(token_col).asc())
        wg = Window.partitionBy(F.lit(1))
    # summary and stats both consume ranked; they are returned as
    # separate lazy plans (no internal persist — an operator-owned
    # checkpoint would leak blocks the caller can't release, and
    # measured locally it costs more than the re-scan). A caller
    # collecting BOTH against a huge corpus should persist the token
    # counts upstream or rely on AQE exchange reuse.
    ranked = (counts.withColumn("rn", F.row_number().over(w))
              .withColumn("ck1", F.max(
                  F.when(F.col("rn") == k + 1, F.col("cnt"))
                  .otherwise(F.lit(0))).over(wg)))
    summary = (ranked
               .where((F.col("rn") <= k) & (F.col("cnt") > F.col("ck1")))
               .select(*group_cols, token_col,
                       (F.col("cnt") - F.col("ck1")).cast("bigint")
                       .alias("est")))
    stats = ranked.agg(
        F.coalesce(F.sum(F.when(F.col("rn") == k + 1, F.col("cnt"))),
                   F.lit(0)).cast("bigint").alias("dec"),
        F.sum("cnt").cast("bigint").alias("n"))
    return summary, stats


def mg_build(df: DataFrame, token_col: str, group_cols: list[str],
             k: int = 64, return_stats: bool = False,
             weight_col: str | None = None):
    """Per-group Misra-Gries summary: (group..., token, est bigint) with
    at most k rows per group, est = exact_in_group - (k+1)-th largest
    count (dropped when <= 0). Deterministic: count ties are broken by
    token ascending. ``return_stats=True`` additionally returns a 1-row
    (dec, n) DataFrame — the build stage's total decrement and the total
    count mass — computed from the SAME ranked pass (no re-scan).

    ``weight_col`` generalizes to WEIGHTED heavy hitters (heavy BYTES /
    heavy cost instead of heavy count): cnt = sum of the non-negative
    integer weights, and every guarantee holds verbatim with n = total
    weight mass — 0 <= exact - est <= D, D*(k+1) <= n, items above
    n/(k+1) always survive. The mergeable-summaries decrement argument
    only needs additivity, not unit weights. NULL or negative weights
    would silently break the guarantee (F.sum skips NULLs; negative
    mass inverts the bound), so they RAISE in-scan (a zero-extra-pass
    raise_error guard on the weight expression). The guard checks the
    RAW column, before any cast: cast('bigint') truncates toward zero,
    so a fractional DOUBLE weight (0.9, or -0.9) would otherwise slip
    past a post-cast negative/null check while silently losing mass —
    non-integral weights raise too (every double >= 2^53 is exactly
    integral, so the floor comparison cannot false-positive on large
    integer weights)."""
    if weight_col is None:
        agg = F.count(F.lit(1))
    else:
        raw = F.col(weight_col)
        rd = raw.cast("double")
        w = raw.cast("bigint")
        guarded = F.when(
            raw.isNull() | w.isNull() | (rd < 0) | (rd != F.floor(rd)),
            F.expr("raise_error('mg_build: weight_col must be "
                   "non-negative, non-null and integral')")
            .cast("bigint")
        ).otherwise(w)
        agg = F.sum(guarded)
    counts = (df.groupBy(*group_cols, token_col)
              .agg(agg.cast("bigint").alias("cnt")))
    summary, stats = _mg_truncate(counts, token_col, group_cols, k)
    return (summary, stats) if return_stats else summary


def mg_merge(summaries: DataFrame, token_col: str, k: int = 64,
             return_stats: bool = False):
    """Merge per-group MG summaries into ONE (token, est) summary:
    token-wise est sum, then one truncate-to-k with the same decrement
    rule. The input is sketch-sized (<= k rows per group), so the
    single-partition window is a bounded task — the q-digest /
    HLL-rollup merge shape, never data-sized. ``return_stats=True``
    additionally returns the merge stage's 1-row (dec, n)."""
    summed = (summaries.groupBy(token_col)
              .agg(F.sum("est").cast("bigint").alias("cnt")))
    summary, stats = _mg_truncate(summed, token_col, [], k)
    return (summary, stats) if return_stats else summary


# ---------------------------------------------------------------------------
# Q-digest: DETERMINISTIC mergeable quantile sketch (Shrivastava et al.,
# SenSys'04) — completes the mergeable-sketch family (CMS: frequencies,
# HLL: distincts, q-digest: quantiles). Unlike KLL/t-digest it uses no
# randomness, so build -> merge -> query replays bit-identically on any
# cluster layout, and the per-group digest is <= 3k nodes regardless of
# data size. Rank-error bound: |rank(estimate) - q*n| <= log2(U)/k * n.
#
# Shape at 100 TB: one applyInPandas per group builds each shard/month
# digest from its own partition of values (Arrow-batched); merging is
# UNION ALL + node-wise count sum + one sketch-sized recompress — the
# merged input is digests, never data.
# ---------------------------------------------------------------------------

def _qd_compress(counts: dict, n: int, k: int, bits: int) -> dict:
    """Canonical bottom-up q-digest compression (deterministic: levels
    leaf->root, node ids ascending). Node ids are heap indices (root=1,
    leaf for value v = 2^bits + v)."""
    thr = max(1, n // k)
    for level in range(bits, 0, -1):
        lo, hi = 1 << level, 1 << (level + 1)
        for node in sorted(x for x in counts if lo <= x < hi):
            c = counts.get(node, 0)
            if c == 0:
                continue
            sib = node ^ 1
            if c + counts.get(sib, 0) + counts.get(node >> 1, 0) <= thr:
                counts[node >> 1] = (counts.get(node >> 1, 0) + c
                                     + counts.pop(sib, 0))
                counts.pop(node, None)
    return {nd: c for nd, c in counts.items() if c > 0}


def _qd_quantile(counts: dict, n: int, q: float, bits: int) -> int:
    """Standard q-digest quantile: walk nodes in increasing range-upper-
    bound order (smaller ranges first on ties), accumulate counts, report
    the upper bound where the accumulated rank crosses ceil(q*n)."""
    import math

    items = []
    for node, c in counts.items():
        level = node.bit_length() - 1
        size = 1 << (bits - level)
        lo = (node - (1 << level)) * size
        items.append((lo + size - 1, size, c))
    items.sort()
    target = max(1, math.ceil(q * n))
    acc = 0
    for hi, _, c in items:
        acc += c
        if acc >= target:
            return hi
    return items[-1][0]


def qdigest_build(df: DataFrame, value_col: str, group_cols: list[str],
                  k: int = 1024, bits: int = 25) -> DataFrame:
    """Per-group q-digest over a non-negative integer column in
    [0, 2^bits): returns (group..., node bigint, cnt bigint) — the
    digest AS A TABLE, the repo's mergeable-sketch convention (CMS
    counts table, HLL register table). Out-of-range or negative values
    RAISE (a silently clamped digest answers wrong quantiles)."""
    import pandas as pd

    limit = 1 << bits

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vals = pdf[value_col]
        if len(vals) and (int(vals.min()) < 0 or int(vals.max()) >= limit):
            raise ValueError(
                f"qdigest_build: {value_col} outside [0, 2^{bits})")
        counts: dict = {}
        for v, c in vals.value_counts().items():
            counts[limit + int(v)] = int(c)
        n = int(len(vals))
        counts = _qd_compress(counts, n, k, bits)
        out = pd.DataFrame({"node": list(counts), "cnt": list(counts.values())})
        for g in group_cols:
            out[g] = pdf[g].iloc[0]
        return out[group_cols + ["node", "cnt"]]

    gtypes = ", ".join(f"{g} {dict(df.select(group_cols + [value_col]).dtypes)[g]}"
                       for g in group_cols)
    schema = (gtypes + ", " if gtypes else "") + "node bigint, cnt bigint"
    return (df.select(*group_cols, value_col)
            .groupBy(*group_cols).applyInPandas(build, schema=schema))


def qdigest_merge(digests: DataFrame, k: int = 1024,
                  bits: int = 25) -> DataFrame:
    """Merge per-group digests into ONE digest (node, cnt): node-wise
    count sum, then one recompress under the combined n. The recompress
    input is sketch-sized (sum of digest sizes), never data-sized — a
    single bounded task, the HLL-rollup merge shape."""
    import pandas as pd

    summed = digests.groupBy("node").agg(F.sum("cnt").alias("cnt"))

    def recompress(pdf: "pd.DataFrame") -> "pd.DataFrame":
        counts = {int(r.node): int(r.cnt) for r in pdf.itertuples()}
        n = sum(counts.values())
        counts = _qd_compress(counts, n, k, bits)
        return pd.DataFrame({"node": list(counts),
                             "cnt": list(counts.values())})

    return (summed.withColumn("__one", F.lit(1))
            .groupBy("__one")
            .applyInPandas(lambda pdf: recompress(pdf),
                           schema="node bigint, cnt bigint"))


def qdigest_quantiles(digest: DataFrame, qs: list[float],
                      bits: int = 25) -> dict:
    """Quantile estimates from a digest table. Collects the digest —
    sketch-sized model state (<= 3k rows), the same bounded-collect
    class as centroids/codebooks."""
    rows = digest.collect()
    counts = {int(r["node"]): int(r["cnt"]) for r in rows}
    n = sum(counts.values())
    return {q: _qd_quantile(counts, n, q, bits) for q in qs}


# ---------------------------------------------------------------------------
# Theta/KMV sketch: DETERMINISTIC mergeable distinct-count sketch with SET
# ALGEBRA (Beyer et al. SIGMOD'07 KMV; Dasgupta et al. "Theta Sketch
# Framework", the Apache DataSketches formulation). Completes the
# mergeable-sketch family's missing axis: CMS answers frequencies, HLL
# answers |A| (and union via max-merge), q-digest quantiles, MG heavy
# hitters — but only a theta sketch answers |A ∩ B| / |A \ B| across
# shards without re-scanning data. The sketch of a set is its k SMALLEST
# distinct xxhash64 values ("k minimum values"): union = merge + re-
# truncate (exactly the HLL/q-digest shape), and any full sketch bounds a
# uniform sample region {h < kth} that intersections/differences are
# estimated from.
#
# Determinism (the battery's oracle requirement): no RNG anywhere — the
# hash is Spark's xxhash64 at seed 42 over CAST(item AS STRING) (the
# string path is the one with pinned pure-Python parity,
# functions/xxh64.py + tests/test_xxh64.py), and every estimate is pure
# INTEGER arithmetic: with num(h) = h + 2^63 + 1 (the 1-based unsigned
# rank of a signed-bigint hash, i.e. num/2^64 = the fraction of hash
# space at or below h),
#   est_full  = floor((k-1) * 2^64 / num(kth))          (KMV estimator)
#   est_inter = floor(|C| * 2^64 / theta_num),  C = common hashes
#               strictly below theta = min(kth over the FULL sides)
# computed with DECIMAL(38,0) `div` — no float division, so build ->
# merge -> estimate replays bit-identically on any cluster layout and in
# the pure-Python oracle. Relative standard error ~ 1/sqrt(k-2).
#
# Shape at 100 TB: build is one distinct + per-group window (or global
# top-k, which plans as TakeOrderedAndProject — no single-partition
# shuffle); merges are UNION ALL + re-truncate over sketch-sized input
# (<= k rows per side, broadcastable); set ops join two <= k-row sketches.
# Driver never sees data-plane rows.
_THETA_HALF = 9223372036854775809  # 2^63 + 1: num(h) = h + THIS


def _theta_truncate(hashes: DataFrame, group_cols: list[str],
                    k: int) -> DataFrame:
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy("h")
        return (hashes.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= k).drop("__rn"))
    # global sketch: top-k by ascending hash plans as
    # TakeOrderedAndProject — never a 1-partition window
    return hashes.orderBy("h").limit(k)


def theta_build(df: DataFrame, item_col: str, group_cols: list[str],
                k: int = 64) -> DataFrame:
    """Per-group theta/KMV sketch: (group..., h bigint) with the k
    smallest DISTINCT ``xxhash64(CAST(item AS STRING))`` values per
    group (all of them when a group has < k distinct). The string cast
    is deliberate: it routes every key type through the hash path whose
    pure-Python replica is parity-pinned, so oracles replay the sketch
    outside Spark."""
    hashes = (df.select(*group_cols,
                        F.xxhash64(F.col(item_col).cast("string"))
                        .alias("h"))
              .distinct())
    return _theta_truncate(hashes, group_cols, k)


def theta_union(sketches: DataFrame, group_cols: list[str],
                k: int) -> DataFrame:
    """Merge sketch rows (any number of sketches UNIONed into one
    DataFrame) into one sketch per group (or ONE global sketch with
    group_cols=[]): distinct hashes, re-truncate to the k smallest.
    Input is sketch-sized — <= k rows per constituent sketch — so this
    is the cheap merge shape, never data-sized."""
    return _theta_truncate(sketches.select(*group_cols, "h").distinct(),
                           group_cols, k)


def theta_estimate(sketch: DataFrame, group_cols: list[str],
                   k: int) -> DataFrame:
    """Distinct-count estimates from sketches: (group..., n_hashes,
    theta_h, est). A non-full sketch (n_hashes < k) holds EVERY distinct
    hash, so est = n_hashes exactly; a full one uses the integer KMV
    estimator on the k-th smallest hash. est is exact integer arithmetic
    (DECIMAL(38,0) div), bit-replayable."""
    agg = [F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
           F.max("h").alias("theta_h")]
    stats = (sketch.groupBy(*group_cols).agg(*agg) if group_cols
             else sketch.agg(*agg))
    est_full = F.expr(
        f"CAST({(k - 1) * (1 << 64)} AS DECIMAL(38,0)) div"
        f" (CAST(theta_h AS DECIMAL(38,0)) + {_THETA_HALF})")
    return stats.select(
        *group_cols, "n_hashes", "theta_h",
        F.when(F.col("n_hashes") < k, F.col("n_hashes"))
        .otherwise(est_full).cast("bigint").alias("est"))


def theta_set_op(a: DataFrame, b: DataFrame, k: int,
                 op: str = "intersect") -> DataFrame:
    """|A ∩ B| (op='intersect') or |A \\ B| (op='difference') estimated
    from two GLOBAL sketches (columns: h). Theta rule: the sample
    region is {h strictly below theta}, theta = the smallest k-th hash
    among the FULL input sketches (no full side -> both sketches hold
    every hash and the answer is exact). Returns one row:
    (n_candidates bigint, theta_h bigint nullable, est bigint).

    The two 1-row stats sides join via crossJoin — bounded model state,
    the lint-allowlisted 1-row pattern, never data-sized."""
    if op not in ("intersect", "difference"):
        raise ValueError(f"op must be intersect|difference, got {op!r}")
    sa = a.agg(F.count(F.lit(1)).alias("na"),
               F.max("h").alias("ka"))
    sb = b.agg(F.count(F.lit(1)).alias("nb"),
               F.max("h").alias("kb"))
    stats = sa.crossJoin(sb).select(
        F.when(F.col("na") >= k,
               F.col("ka")).alias("ta"),
        F.when(F.col("nb") >= k, F.col("kb")).alias("tb"),
    ).select(F.least("ta", "tb").alias("theta_h"))
    joined = (a.join(b.select("h"), on="h", how="inner") if op == "intersect"
              else a.join(b.select("h"), on="h", how="left_anti"))
    cand = (joined.crossJoin(F.broadcast(stats))
            .where(F.col("theta_h").isNull() |
                   (F.col("h") < F.col("theta_h"))))
    est_sampled = F.expr(
        f"CAST(n_candidates AS DECIMAL(38,0)) * {1 << 64} div"
        f" (CAST(theta_h AS DECIMAL(38,0)) + {_THETA_HALF})")
    # global agg (not groupBy) so ZERO candidates still yields one row
    # (n_candidates=0, est=0). theta_h comes from the 1-row STATS side,
    # not the candidate rows — deriving it from candidates (min/first)
    # would report NULL whenever the candidate set is empty, silently
    # relabeling a sampled zero as exact mode (caught by the hypothesis
    # property test: two full sketches with disjoint sample regions)
    return (cand.agg(F.count(F.lit(1)).cast("bigint")
                     .alias("n_candidates"))
            .crossJoin(F.broadcast(stats))
            .select(
                "n_candidates", "theta_h",
                F.when(F.col("theta_h").isNull(), F.col("n_candidates"))
                .otherwise(est_sampled).cast("bigint").alias("est")))


# ---------------------------------------------------------------------------
# Bloom filter: DETERMINISTIC mergeable MEMBERSHIP sketch (Bloom, CACM'70;
# mergeability: bitwise OR of same-parameter filters is exactly the filter
# of the union). Completes the mergeable-sketch family's membership axis:
# CMS answers frequencies, HLL/theta distincts and set algebra, q-digest
# quantiles, MG heavy hitters — a Bloom filter answers "is X in the set?"
# with no false negatives and a bounded false-positive rate
# (~(1 - e^(-kn/m))^k for n items, m bits, k hashes).
#
# The pipeline op this exists for at 100 TB: BLOCKLIST FILTERING. An
# anti-join of a 100 TB corpus against a large blocklist shuffles the
# corpus on the join key; the Bloom form broadcasts a megabyte-scale
# bitmap and prunes map-side — only the (tiny) maybe-member candidate set
# pays an exact join, and the final result is EXACT because Bloom has no
# false negatives (bloom_blocklist_anti_join below).
#
# Determinism (the battery's oracle requirement): the hash family is the
# CMS's md5-derived construction (first 8 hex chars -> int, seed appended
# to the key), bit positions land in 63-BIT words (bit index 0..62 — the
# sign bit is never set, so the bitmap replays verbatim in any engine
# with md5 + integer bit ops; DuckDB raises on a signed 1<<63, Spark
# wraps it — 63-bit words sidestep both). The sketch IS a table
# (group..., word bigint, bits bigint), the repo's mergeable-sketch
# convention: merge = word-wise bit_or, persist/ship like any rollup.
# ---------------------------------------------------------------------------

_BLOOM_WORD = 63  # bits per bitmap word; see block comment


def _bloom_pos_expr(item_col: str, seed: int, m_bits: int) -> str:
    """Bit position of hash ``seed`` for an item — the CMS hash family
    (_bucket_expr) verbatim, range [0, m_bits)."""
    return _bucket_expr(item_col, seed, m_bits)


def bloom_build(df: DataFrame, item_col: str, group_cols: list[str] | None
                = None, m_bits: int = 1 << 20,
                n_hashes: int = 5) -> DataFrame:
    """Per-group Bloom filter over ``item_col`` (cast to string): returns
    (group..., word bigint, bits bigint) — the SET bitmap words only
    (sparse; absent word = all-zero). One projection + one partial-
    aggregated shuffle on (group, word): at most
    ceil(m_bits/63) * n_groups output rows regardless of input size."""
    group_cols = group_cols or []
    item = f"CAST({item_col} AS STRING)"
    positions = df.select(
        *group_cols,
        F.explode(F.expr(
            "array(" + ", ".join(_bloom_pos_expr(item, j, m_bits)
                                 for j in range(n_hashes)) + ")"
        )).alias("pos"))
    return (positions
            .select(*group_cols,
                    F.expr(f"pos div {_BLOOM_WORD}").alias("word"),
                    F.expr(f"shiftleft(CAST(1 AS BIGINT),"
                           f" CAST(pos % {_BLOOM_WORD} AS INT))")
                    .alias("mask"))
            .groupBy(*group_cols, "word")
            .agg(F.expr("bit_or(mask)").alias("bits")))


def bloom_union(sketches: DataFrame,
                group_cols: list[str] | None = None) -> DataFrame:
    """Merge Bloom sketch tables built with the SAME (m_bits, n_hashes):
    word-wise bitwise OR — exactly the filter of the union of the input
    sets. Input is sketch-sized (<= ceil(m_bits/63) rows per sketch)."""
    group_cols = group_cols or []
    return (sketches.groupBy(*group_cols, "word")
            .agg(F.expr("bit_or(bits)").alias("bits")))


def bloom_contains(df: DataFrame, item_col: str, bloom: DataFrame,
                   m_bits: int = 1 << 20, n_hashes: int = 5,
                   result_col: str = "maybe_member",
                   group_cols: list[str] | None = None) -> DataFrame:
    """Append ``result_col`` (boolean): True iff EVERY hash position of
    the item is set in the filter — i.e. "maybe in the set" (false
    positives possible at the configured rate, false negatives never).

    ``group_cols`` probes a PER-GROUP bitmap table (e.g. the durable
    table streaming_bloom_maintenance keeps): each probe row joins its
    own group's words — the join key is (group..., word). Without it, a
    grouped bitmap is REJECTED loudly: the same word index appears once
    per group, so a word-only join would fan probe rows out and compute
    membership from a mix of groups' bits.

    Scale shape: n_hashes BROADCAST hash joins on the word index — the
    probe side never shuffles (the bitmap is <= ceil(m_bits/63) rows,
    megabytes at m_bits = 2^24), so a 100 TB probe stays map-side.
    MATERIALIZE the bitmap once before probing (localCheckpoint /
    persist / a written table — the model-state convention): each hash
    join broadcasts ``bloom``, and an unmaterialized build plan would
    re-scan the blocklist n_hashes times (the per-join word alias
    defeats exchange reuse)."""
    group_cols = group_cols or []
    extra = set(bloom.columns) - {"word", "bits"} - set(group_cols)
    if extra:
        raise ValueError(
            f"bloom table carries non-key columns {sorted(extra)}: pass "
            f"group_cols=[...] so each probe row joins its own group's "
            f"words, or filter the sketch to one group first — a "
            f"word-only join against a grouped bitmap fans out and "
            f"mixes groups' bits")
    item = f"CAST({item_col} AS STRING)"
    out = df
    checks = []
    for j in range(n_hashes):
        wcol, mcol, bcol = f"__w{j}", f"__m{j}", f"__b{j}"
        out = (out
               .withColumn(wcol, F.expr(
                   f"({_bloom_pos_expr(item, j, m_bits)})"
                   f" div {_BLOOM_WORD}"))
               .withColumn(mcol, F.expr(
                   f"shiftleft(CAST(1 AS BIGINT), CAST"
                   f"(({_bloom_pos_expr(item, j, m_bits)})"
                   f" % {_BLOOM_WORD} AS INT))"))
               .join(F.broadcast(bloom.select(
                   *group_cols,
                   F.col("word").alias(wcol),
                   F.col("bits").alias(bcol))),
                   on=[*group_cols, wcol], how="left"))
        checks.append(F.col(bcol).isNotNull() &
                      (F.col(bcol).bitwiseAND(F.col(mcol)) == F.col(mcol)))
    member = checks[0]
    for c in checks[1:]:
        member = member & c
    drop = [c for j in range(n_hashes) for c in (f"__w{j}", f"__m{j}",
                                                 f"__b{j}")]
    return out.withColumn(result_col, member).drop(*drop)


def bloom_blocklist_anti_join(df: DataFrame, item_col: str,
                              blocklist: DataFrame, block_col: str,
                              m_bits: int = 1 << 20,
                              n_hashes: int = 5) -> DataFrame:
    """EXACT anti-join accelerated by a Bloom pre-filter: rows whose
    item misses ANY hash bit are DEFINITELY clean (no false negatives)
    and pass through map-side with zero shuffle; only the maybe-member
    candidates — |true hits| + the false-positive sliver — pay the
    exact anti-join against the blocklist. Result is bit-identical to a
    plain LEFT ANTI JOIN (the battery oracle replays it as one), but at
    100 TB the shuffle/broadcast volume drops from the corpus to the
    candidate set."""
    # built ONCE and checkpointed (sketch-sized model state, the
    # theta/centroid convention): every word-probe join broadcasts the
    # bitmap, and leaving it lazy would re-scan the blocklist once per
    # hash AND once per output branch
    bloom = bloom_build(blocklist.select(block_col), block_col,
                        m_bits=m_bits, n_hashes=n_hashes) \
        .localCheckpoint(eager=True)
    flagged = bloom_contains(
        df, item_col, bloom,
        m_bits=m_bits, n_hashes=n_hashes, result_col="__maybe")
    clean = flagged.where(~F.col("__maybe")).drop("__maybe")
    maybe = flagged.where(F.col("__maybe")).drop("__maybe")
    verified = maybe.join(
        blocklist.select(F.col(block_col).alias("__bk")).distinct(),
        on=F.col(item_col).cast("string").eqNullSafe(
            F.col("__bk").cast("string")),
        how="left_anti")
    return clean.unionByName(verified)


# --- AMS / Tug-of-War second-moment (F2) sketch ---------------------------
# AMS (Alon-Matias-Szegedy, STOC'96): r independent +-1 estimators; each
# keeps z_d = sum over the stream of sign_d(item), and E[z^2] = F2 =
# sum over distinct keys of count^2 — the SELF-JOIN SIZE, the statistic
# a cost-based optimizer wants before committing to a join order and the
# skew-detection scalar ("how concentrated is this key column?"). The
# sketch is LINEAR (z vectors add), so it merges by plain summation and
# maintains under streaming with bit-for-bit batch-invariance (the gram
# argument: integer addition is associative/commutative). Signs come
# from the CMS md5 hash-family convention (first 8 hex chars -> int,
# block seed appended to the item), bit-sliced 32 estimators per hash,
# so every z replays verbatim in any engine with md5 — the property
# the battery oracle checks cell by cell.


def _ams_hash_expr(item_col: str, block: int) -> str:
    """One md5-derived 32-bit word per BLOCK of 32 estimators — each
    estimator's sign is one BIT of the word, so r estimators cost
    ceil(r/32) md5 calls per row, not r (the first cut hashed once per
    estimator and the md5s were ~4x the whole operator's runtime)."""
    return (
        f"CAST(conv(substring(md5(concat({item_col}, '@', {block})), 1, 8),"
        f" 16, 10) AS BIGINT)"
    )


def ams_build(df: DataFrame, item_col: str,
              group_cols: list[str] | None = None,
              r: int = 16) -> DataFrame:
    """Build the AMS F2 sketch: (group..., d, z) with d in 0..r-1 and
    z_d = sum of sign_d(item) — r bigint cells per group, regardless of
    row count. NULL items raise in-scan (a silently dropped row would
    bias every estimator the same direction as the priority-sample
    skew this repo's guards exist to prevent).

    Scale shape: ceil(r/32) md5 words per row (32 signs bit-sliced per
    word), the r sign sums as aggregate EXPRESSIONS over one scan (no
    per-row explode — map-side combine collapses each task to ONE row
    per group before the shuffle), and the (d, z) reshape explodes only
    the statistics row."""
    if r < 1:
        raise ValueError(f"r must be >= 1, got {r}")
    groups = list(group_cols or [])
    clash = {"d", "z", "__it"} & set(groups)
    if clash:
        raise ValueError(f"ams_build: group columns {sorted(clash)} "
                         "collide with the sketch's (d, z) cells")
    it = F.when(
        F.col(item_col).isNull(),
        F.expr("raise_error('ams_build: item_col must be non-null')")
        .cast("string"),
    ).otherwise(F.col(item_col).cast("string"))
    blocks = (r + 31) // 32
    hash_cols = [F.expr(_ams_hash_expr("__it", b)).alias(f"__h{b}")
                 for b in range(blocks)]
    # NO row blowup (the correlation_matrix convention): the r sign
    # sums are r aggregate EXPRESSIONS over one scan — an explode to
    # (row x r) cells first was 2.4x slower at sf0.1 — and only the
    # one-row-per-group statistics result reshapes to (d, z) cells
    aggs = [F.sum(F.expr(
        f"((__h{d // 32} div {1 << (d % 32)}) % 2) * 2 - 1"))
        .cast("bigint").alias(f"__z{d}") for d in range(r)]
    stats = (df.select(*groups, it.alias("__it"))
             .select(*groups, *hash_cols)
             .groupBy(*groups)
             .agg(*aggs))
    pairs = ", ".join(
        f"named_struct('d', {d}, 'z', __z{d})" for d in range(r))
    return (stats.select(*groups,
                         F.explode(F.expr(f"array({pairs})")).alias("c"))
            .select(*groups, F.col("c.d").alias("d"),
                    F.col("c.z").alias("z")))


def ams_merge(states: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """Fold a UNION of AMS sketches: element-wise z sums per (group, d)
    — exact, order-free, batch-invariant (the sketch is linear)."""
    groups = list(group_cols or [])
    return (states.groupBy(*groups, "d")
            .agg(F.sum("z").cast("bigint").alias("z")))


def ams_f2_estimate(sketch: DataFrame,
                    group_cols: list[str] | None = None,
                    means: int = 4) -> DataFrame:
    """Median-of-means F2 estimate off an AMS sketch: the r estimators
    split into ``means`` contiguous groups (g = d div (r/means)), each
    group's z^2 sum is exact DECIMAL arithmetic, and the estimate is
    the LOWER MEDIAN of the group sums divided by the group size — one
    IEEE division total, so the estimate replays bit-for-bit (the
    mad_outliers median convention: integer rank selection, no
    interpolation). Returns (group..., f2_est, r).

    Everything here is statistics-sized (r rows per group in, one row
    per group out)."""
    groups = list(group_cols or [])
    if means < 1:
        raise ValueError(f"means must be >= 1, got {means}")
    from pyspark.sql import Window

    r_w = Window.partitionBy(*groups) if groups else Window.partitionBy()
    sized = sketch.withColumn("__r", F.count(F.lit(1)).over(r_w))
    per_g = (sized
             .withColumn("__g", F.expr(
                 f"CASE WHEN __r < {means} THEN raise_error("
                 f"'ams_f2_estimate: sketch has fewer than means={means} "
                 f"estimators') ELSE d div (__r div {means}) END"))
             .groupBy(*groups, "__g")
             .agg(F.sum(F.col("z").cast("decimal(38,0)")
                        * F.col("z")).alias("ss"),
                  F.count(F.lit(1)).alias("gsz"),
                  F.max("__r").alias("__r")))
    ordw = (Window.partitionBy(*groups) if groups
            else Window.partitionBy()).orderBy("ss", "__g")
    ranked = (per_g
              .withColumn("__rn", F.row_number().over(ordw))
              .withColumn("__ng", F.count(F.lit(1)).over(r_w)))
    return (ranked.where(
        F.col("__rn") == F.expr("CAST(floor((__ng + 1) / 2) AS INT)"))
        .select(*groups,
                (F.col("ss").cast("double") / F.col("gsz")).alias("f2_est"),
                F.col("__r").cast("int").alias("r")))
