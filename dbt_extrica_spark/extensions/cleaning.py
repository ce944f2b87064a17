"""[EXTENSION] Corpus-cleaning operators a large-scale training-data
pipeline needs beyond dedup: PII redaction, boilerplate-line removal,
benchmark decontamination, URL/domain accounting.

Everything is built-in pyspark.sql.functions (codegen, JVM-side); the regex
patterns are restricted to constructs with identical semantics in Java
regex (Spark) and RE2 (oracle engines) — character classes, quantifiers,
and word boundaries only, no lookarounds or backreferences.

Scale notes per operator are in the docstrings; none of these collect to
the driver and every shuffle is keyed on a column with corpus-sized
cardinality (lines, grams, domains) — no single hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# cross-engine-safe PII patterns (Java regex == RE2 semantics for these)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{7,15}"
URL_RE = r"https?://[^\s]+"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails, IPv4 addresses, and international-format phone
    numbers; return the scrubbed text plus per-kind match counts (the
    audit trail a compliance pass needs).

    One projection over one scan — redaction and counting are pure
    regexp expressions next to the parquet reader; no shuffle."""
    t = F.col(text_col)
    # F.lit patterns, not F.expr SQL strings: SQL-literal escape processing
    # would mangle \b and \+ before the regex engine ever saw them
    n = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("int")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        n(EMAIL_RE).alias("n_emails"),
        n(IPV4_RE).alias("n_ips"),
        n(PHONE_RE).alias("n_phones"),
    )


def url_domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-domain URL accounting over the corpus: (domain, n_urls,
    n_docs). The inventory a domain-filtering / source-mixing stage ranks
    and thresholds on.

    Explode extracted URLs, project the domain, one aggregation keyed on
    domain — a single shuffle whose key cardinality grows with the corpus
    (no hot key beyond genuinely dominant domains; salt with
    operators/skew.py if one domain is half the crawl)."""
    urls = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
        ).alias("url"),
    )
    domain = F.regexp_extract("url", r"^https?://([^/\s]+)", 1)
    return (
        urls.select(domain.alias("domain"), "__id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.countDistinct("__id").cast("bigint").alias("n_docs"),
        )
    )


def remove_boilerplate_lines(df: DataFrame, id_col: str, text_col: str,
                             min_docs: int = 3) -> DataFrame:
    """Cross-document line deduplication: a (trimmed, non-empty) line that
    appears in >= ``min_docs`` DISTINCT documents is boilerplate
    (headers, footers, cookie banners) and is removed from every document.
    Returns (id, clean_text, n_dropped_lines); line order is preserved.

    Shape at scale: one posexplode scan, one aggregation keyed on line
    text (corpus-cardinality key), one join back on the line, one
    per-document reassembly keyed on the id. All shuffles are on
    high-cardinality keys; the heavy-line aggregate is partial/final."""
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.col("line")))
    counts = (
        lines.where(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.countDistinct("__id").alias("n_docs_with_line"))
        .where(F.col("n_docs_with_line") >= min_docs)
        .select("norm", F.lit(True).alias("__boiler"))
    )
    tagged = lines.join(counts, on="norm", how="left")
    return (
        tagged.groupBy("__id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(CASE WHEN __boiler"
                       " IS NULL THEN struct(pos, line) END)), s -> s.line)"),
                "\n",
            ).alias("clean_text"),
            F.sum(F.when(F.col("__boiler"), 1).otherwise(0))
            .cast("int").alias("n_dropped_lines"),
        )
        .withColumnRenamed("__id", id_col)
    )


def c4_filter(df: DataFrame, id_col: str, text_col: str,
              min_words_per_line: int = 5,
              min_kept_lines: int = 3,
              keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2) — the other
    canonical published web-corpus gate next to gopher_rules:

    - keep only lines that END in terminal punctuation (. ! ? ") after
      trimming, have >= ``min_words_per_line`` words, and do not mention
      'javascript';
    - drop the whole page if fewer than ``min_kept_lines`` lines survive
      (C4's 'at least 3 sentences' proxy), or if it contains 'lorem
      ipsum' or a curly brace.

    One scan, no shuffle — the page verdict and the cleaned text come out
    of the same pass, so the filter composes with the parquet scan. The
    expensive HOF arrays (line split/trim, kept-line filter) are STAGED
    into a first projection and the outputs derive from the stored
    columns: Catalyst does no CSE across lambda expressions, and
    CollapseProject keeps non-cheap multiply-referenced aliases in their
    own projection, so each array computes once per row instead of once
    per output column. Returns (id, clean_text, n_lines_total,
    n_lines_kept, has_lorem_ipsum, has_curly_brace, keep_page)."""
    t = f"coalesce({text_col}, '')"
    lo = f"lower({t})"
    lines = (f"filter(transform(split({t}, '\\\\n'), l -> trim(l)),"
             f" l -> l <> '')")
    words = "filter(split(l, '\\\\s+'), x -> x <> '')"
    kept = (
        f"filter({lines}, l -> (l LIKE '%.' OR l LIKE '%!'"
        f" OR l LIKE '%?' OR l LIKE '%\"')"
        f" AND size({words}) >= {min_words_per_line}"
        f" AND NOT lower(l) LIKE '%javascript%')"
    )
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.expr(lines).alias("__lines"),
        F.expr(kept).alias("__kept"),
        F.expr(lo).alias("__lo"),
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.expr("array_join(__kept, '\\n')").alias("clean_text"),
        F.expr("size(__lines)").cast("int").alias("n_lines_total"),
        F.expr("size(__kept)").cast("int").alias("n_lines_kept"),
        F.expr("__lo LIKE '%lorem ipsum%'").alias("has_lorem_ipsum"),
        F.expr("__lo LIKE '%{%'").alias("has_curly_brace"),
        F.expr(
            f"size(__kept) >= {min_kept_lines}"
            f" AND NOT __lo LIKE '%lorem ipsum%'"
            f" AND NOT __lo LIKE '%{{%'"
        ).alias("keep_page"),
    )


def decontaminate(train: DataFrame, eval_set: DataFrame,
                  id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word ``n``-gram with the evaluation set (the standard
    n-gram-overlap contamination rule). Returns every train row as
    (id, contaminated, n_shared_grams).

    Scale shape: both sides explode DISTINCT n-grams once; the join runs
    on md5(gram) (fixed-width key, engine-portable); the eval side of a
    real pipeline is benchmark-sized — mark it broadcastable. No
    all-pairs stage anywhere; cost is linear in corpus grams."""
    def grams(d: DataFrame, alias: str) -> DataFrame:
        toks = f"split(trim(lower({text_col})), '\\\\s+')"
        g = (f"transform(sequence(1, greatest(size({toks}) - {n} + 1, 1)),"
             f" i -> array_join(slice({toks}, i, {n}), ' '))")
        return d.select(
            F.col(id_col).alias(alias),
            F.explode(F.expr(f"array_distinct({g})")).alias("gram"),
        ).select(alias, F.md5("gram").alias("gh"))

    eval_grams = grams(eval_set, "eval_id").select("gh").distinct()
    shared = (
        grams(train, "train_id")
        .join(F.broadcast(eval_grams), on="gh")
        .groupBy("train_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )
    return (
        train.select(F.col(id_col).alias("train_id"))
        .join(shared, on="train_id", how="left")
        .select(
            F.col("train_id").alias(id_col),
            F.coalesce(F.col("n_shared_grams") > 0, F.lit(False))
            .alias("contaminated"),
            F.coalesce("n_shared_grams", F.lit(0)).cast("bigint")
            .alias("n_shared_grams"),
        )
    )


def _pack_tokens(text_col: str) -> F.Column:
    """The packers' shared token count: lowercased whitespace split with
    empty tokens FILTERED (one definition for both packers and the
    pretrain composite — an unfiltered split would count a phantom token
    when the text starts with non-space whitespace, since trim strips
    only spaces)."""
    return F.expr(
        f"size(filter(split(trim(lower(coalesce({text_col}, ''))),"
        f" '\\\\s+'), x -> x <> ''))")


def _seq_spans(out: DataFrame, seq_len: int) -> DataFrame:
    """first/last training-sequence indexes from (offset, n_tokens) —
    integer DIV, not double division: token offsets at 100 TB can exceed
    the exact-double range. A zero-token document (empty/NULL text) has
    no span of its own; ``greatest(offset + n_tokens - 1, offset)`` pins
    its last_seq to first_seq so DIV's truncation-vs-floor difference on
    a negative numerator can never matter."""
    return (
        out.withColumn("first_seq",
                       F.expr(f"CAST(offset DIV {seq_len} AS BIGINT)"))
        .withColumn("last_seq",
                    F.expr(f"CAST(greatest(offset + n_tokens - 1, offset)"
                           f" DIV {seq_len} AS BIGINT)"))
    )


def pack_documents(df: DataFrame, id_col: str, text_col: str,
                   seq_len: int = 2048,
                   shard_col: str | None = None,
                   max_rows_unsharded: int | None = 1_000_000) -> DataFrame:
    """Sequence packing for pretraining: concatenate documents in stable
    (shard, id) order and chunk the token stream every ``seq_len`` tokens.
    Returns per document: its token count, its global token offset within
    the shard, and the first/last training-sequence indexes it lands in —
    what a tokenize-and-pack stage needs to build fixed-length samples
    without padding waste.

    Scale: the running offset is a window cumulative sum. An unpartitioned
    window is a single-task bottleneck, so packing is per-``shard_col``
    (source, dump, bucket...) — shards pack independently, which is also
    what a distributed tokenizer wants. ``shard_col=None`` packs globally
    through one task; ``max_rows_unsharded`` is the guardrail — an
    unsharded call on more rows than this raises (pass a ``shard_col``,
    or set ``max_rows_unsharded=None`` to explicitly accept the
    single-task window). The probe is ``limit(n+1).count()`` — it
    short-circuits, never a full scan."""
    if shard_col is None and max_rows_unsharded is not None:
        probe = df.select(id_col).limit(max_rows_unsharded + 1).count()
        if probe > max_rows_unsharded:
            raise ValueError(
                f"pack_documents without shard_col runs the cumulative "
                f"offset window in a SINGLE task and the input exceeds "
                f"{max_rows_unsharded} rows. Pass shard_col= so shards "
                f"pack independently, or set max_rows_unsharded=None to "
                f"accept the single-task window explicitly."
            )
    part = [F.col(shard_col)] if shard_col else []
    w = Window.partitionBy(*part).orderBy(F.col(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out_cols = [F.col(id_col)]
    if shard_col:
        out_cols.append(F.col(shard_col))
    out = (
        df.select(*out_cols, _pack_tokens(text_col).alias("n_tokens"))
        .withColumn("offset",
                    (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                    .cast("bigint"))
    )
    return _seq_spans(out, seq_len)


def global_running_sum(df: DataFrame, order_cols: list[str],
                       weight_col: str | None = None,
                       partitions: int | None = None,
                       out_col: str = "__gsum",
                       return_total: bool = False):
    """Single-weight wrapper over :func:`global_running_sums` — kept as
    the public name every call site uses; see that function for the
    two-phase machinery. Returns ``df`` (or ``(df, total)``)."""
    out, totals = global_running_sums(df, order_cols, [weight_col],
                                      partitions, [out_col])
    return (out, totals[0]) if return_total else out


def global_running_sums(df: DataFrame, order_cols: list[str],
                        weight_cols: list[str | None],
                        partitions: int | None = None,
                        out_cols: list[str] | None = None):
    """Two-phase distributed GLOBAL running sums of each column in
    ``weight_cols`` (None = 1 per row, i.e. the global RANK), inclusive
    of the current row, in the total order by ``order_cols`` — the
    shared machinery behind pack_documents_global and
    dedup.sorted_neighborhood_pairs (one place, after a review found it
    duplicated). K weights share ONE range shuffle, ONE reified slice
    and ONE per-partition-totals collect (the r16 optimization: ks_test
    and mannwhitney_u previously paid the whole pipeline twice for
    their two cumulative counts); all K window sums run over the same
    per-partition frame, so the physical plan carries a single Window
    node. Always returns ``(df, totals)`` with one grand total per
    weight:

    1. ``repartitionByRange(order_cols)`` + sort-within-partitions:
       partition i holds an order-contiguous slice, so (partition, row)
       order IS the total order. The per-partition running sum is a
       window partitioned BY the physical partition — every task scans
       only its own slice, no global single-task stage.
    2. Per-partition totals (one row per partition — bounded model
       state, not data) are collected, prefix-summed on the driver, and
       rejoined as a literal array indexed by partition id.

    Callers needing an exclusive sum subtract the weight; callers
    ordering by non-unique keys must include a tie-break column in
    ``order_cols`` or the result is nondeterministic. Every named
    weight must be an INTEGRAL column (the per-partition totals and
    driver prefix are exact integers; a float weight would silently
    truncate per row) — non-integral types raise. The returned totals
    are the grand totals the driver prefix already computed — callers
    needing n must not pay another scan for it."""
    k = len(weight_cols)
    if k < 1:
        raise ValueError("global_running_sums: need at least one weight")
    if out_cols is None:
        out_cols = ["__gsum" if i == 0 else f"__gsum{i}" for i in range(k)]
    if len(out_cols) != k or len(set(out_cols)) != k:
        raise ValueError("global_running_sums: out_cols must match "
                         "weight_cols 1:1 with no duplicates")
    wnames = ["__w" if i == 0 else f"__w{i}" for i in range(k)]
    reserved = {"__pid", *wnames, *out_cols}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"global_running_sum: input columns {sorted(clash)} collide "
            f"with the helper's working names (rename them, or pass a "
            f"different out_col)")
    dtypes = dict(df.dtypes)
    for wc in weight_cols:
        if wc is not None and dtypes.get(wc) not in (
                "tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"global_running_sum: weight_col {wc!r} has type "
                f"{dtypes.get(wc)!r}; only integral weights keep the "
                f"running sum exact (a float would silently truncate "
                f"per row)")
    if partitions is not None:
        if partitions < 1:
            raise ValueError("partitions must be >= 1")
        n_part = partitions
    else:
        try:
            n_part = int(df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
        except ValueError:  # e.g. 'auto' on AQE-managed platforms
            n_part = df.sparkSession.sparkContext.defaultParallelism
    work = df
    for wn, wc in zip(wnames, weight_cols):
        weight = (F.lit(1).cast("bigint") if wc is None
                  else F.col(wc).cast("bigint"))
        work = work.withColumn(wn, weight)
    sliced = (
        work
        .repartitionByRange(n_part, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        # reify the partition assignment: __pid must not be recomputed
        # under a different physical plan by the two downstream jobs.
        # (blocks are freed by the ContextCleaner when the result is
        # dropped — see similarity._km_base for the lifecycle note)
        .localCheckpoint(eager=False)
    )
    totals = (
        sliced.groupBy("__pid")
        .agg(*[F.sum(wn).alias(f"t{i}") for i, wn in enumerate(wnames)])
        .collect()  # one row per partition — bounded model state
    )
    max_pid = max((r["__pid"] for r in totals), default=-1)
    accs: list[int] = []
    out = sliced
    w = (Window.partitionBy("__pid")
         .orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for i, (wn, oc) in enumerate(zip(wnames, out_cols)):
        by_pid = {r["__pid"]: int(r[f"t{i}"]) for r in totals
                  if r[f"t{i}"] is not None}
        prefix, acc = [], 0
        for pid in range(max_pid + 1):
            prefix.append(acc)
            acc += by_pid.get(pid, 0)
        if not prefix:
            prefix = [0]
        prefix_arr = F.array(*[F.lit(x).cast("bigint") for x in prefix])
        out = out.withColumn(
            oc,
            (F.element_at(prefix_arr, F.col("__pid") + 1)
             + F.sum(wn).over(w)).cast("bigint"))
        accs.append(acc)
    out = out.drop("__pid", *wnames)
    return out, accs


def pack_documents_global(df: DataFrame, id_col: str,
                          text_col: str | None,
                          seq_len: int = 2048,
                          partitions: int | None = None,
                          keep_cols: tuple[str, ...] = (),
                          tokens_col: str | None = None) -> DataFrame:
    """Global sequence packing WITHOUT the single-task window: the
    running token offset over the whole corpus in stable ``id`` order,
    computed as a two-phase distributed prefix sum —

    1. ``repartitionByRange(id)`` + sort-within-partitions: partition i
       holds an id-contiguous slice, so (partition, row) order is the
       total order by id. The per-partition running sum is a window
       partitioned BY the physical partition — every task scans only its
       own slice, no global single-task stage.
    2. Per-partition token totals (one row per partition — bounded model
       state, not data) are collected, prefix-summed on the driver, and
       rejoined as a literal array indexed by partition id.

    global offset = partition_prefix[pid] + local_running_sum - n_tokens.

    The result is value-identical to ``pack_documents(shard_col=None)``
    (exact integer sums; range boundaries only move rows between slices,
    never change the total order), but the widest stage is
    corpus/partitions rows instead of the whole corpus in one task — the
    100 TB path for global packing. ``partitions=None`` keeps the
    session's shuffle parallelism. Same output contract as
    pack_documents: (id, n_tokens, offset, first_seq, last_seq), plus any
    ``keep_cols`` carried through verbatim — riding the prefix sum's own
    range shuffle costs a few bytes per row and saves the caller a whole
    attach-join back onto the corpus afterwards. ``tokens_col`` names an
    already-computed token count (``text_col`` is then unused): the range
    partitioner samples its input before shuffling it, i.e. evaluates the
    input pipeline TWICE — a caller staging (id, n_tokens) cheaply avoids
    re-tokenizing the corpus for the sampling pass."""
    count = (_pack_tokens(text_col) if tokens_col is None
             else F.col(tokens_col).cast("int"))
    base = df.select(F.col(id_col),
                     *[F.col(c) for c in keep_cols],
                     count.alias("n_tokens"))
    summed = global_running_sum(base, [id_col], "n_tokens", partitions)
    out = summed.withColumn(
        "offset",
        (F.col("__gsum") - F.col("n_tokens")).cast("bigint")
    ).drop("__gsum")
    return _seq_spans(out, seq_len)


def duplicated_spans(df: DataFrame, id_col: str, text_col: str,
                     n: int = 20, min_docs: int = 2) -> DataFrame:
    """Cross-document repeated-span accounting — the signal behind exact
    substring deduplication (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): a word ``n``-gram occurring in >=
    ``min_docs`` DISTINCT documents marks the token span [pos, pos+n) as
    duplicated in every document carrying it. Returns per document:
    (id, n_tokens, n_dup_grams, dup_token_frac) where ``dup_token_frac``
    is the fraction of token positions covered by the UNION of duplicated
    spans — the number an exact-substring-dedup pass would remove.

    Scale shape: one posexplode scan of positional grams keyed on
    md5(gram) (fixed-width, engine-portable — the dedup set is identical
    in any engine, unlike xxhash64), one document-frequency aggregation on
    the gram key (corpus-cardinality, partial/final), one join back, and
    the span-union length per doc via the classic merged-intervals window
    (sum of least(n, pos - lag(pos))) — NO position explosion: cost is
    O(tokens), never O(n x tokens)."""
    toks = f"split(trim(lower(`{text_col}`)), '\\\\s+')"
    grams = (
        f"transform(sequence(1, greatest(size({toks}) - {n} + 1, 1)),"
        f" i -> md5(array_join(slice({toks}, i, {n}), ' ')))"
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(F.expr(toks)).alias("n_tokens"),
        F.posexplode(F.expr(grams)).alias("pos", "h"),
    )
    shared = (
        base.groupBy("h")
        .agg(F.countDistinct("__id").alias("df_docs"))
        .where(F.col("df_docs") >= min_docs)
        .select("h")
    )
    w = Window.partitionBy("__id").orderBy("pos")
    per_doc = (
        base.join(shared, on="h")
        # a doc can carry the same shared gram at several positions; each
        # position is its own span start
        .withColumn("gap", F.col("pos") - F.lag("pos").over(w))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
            F.sum(F.least(F.lit(n), F.coalesce("gap", F.lit(n))))
            .cast("bigint").alias("covered"),
        )
    )
    return (
        df.select(F.col(id_col).alias("__id"),
                  F.size(F.expr(toks)).alias("n_tokens"))
        .join(per_doc, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("bigint")
            .alias("n_dup_grams"),
            (F.least(F.coalesce("covered", F.lit(0)),
                     F.col("n_tokens").cast("bigint")).cast("double")
             / F.col("n_tokens")).alias("dup_token_frac"),
        )
    )


def remove_duplicated_spans_char(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 50, min_docs: int = 2,
) -> DataFrame:
    """CHARACTER-level exact substring dedup — the sub-word-boundary
    variant of remove_duplicated_spans (Lee et al. 2022 full fidelity:
    their duplicated substrings need not respect token boundaries). A
    char ``k``-gram occurring in >= ``min_docs`` DISTINCT documents marks
    the char span [pos, pos+k) as duplicated; every covered position is
    cut from every document except the gram's minimum-id canonical
    carrier. This is EXACTLY "remove every position inside some
    duplicated substring of length >= k": any such substring is a union
    of shared k-grams, and every shared k-gram is itself a duplicated
    substring of length k — so positional k-gram hashing equals the
    suffix-array formulation without the sequential suffix-array build.

    Returns (id, clean_text, n_chars_kept, n_chars); clean_text is the
    RAW text with covered spans cut (no normalization — char fidelity is
    the point).

    Scale shape: one positional-gram scan (O(chars) rows, md5 keys), one
    gram-frequency aggregation carrying (distinct docs, min doc), a join
    back of non-canonical carrier START positions only (no k-wide
    position explode: starts are merged into covered intervals with a
    gaps-and-islands window), and the rebuild is ONE substring-fold over
    each doc's merged interval array — per-doc work proportional to the
    number of removed spans, not to k x spans."""
    t = f"`{text_col}`"
    grams = (
        f"transform(sequence(1, greatest(char_length({t}) - {k} + 1, 1)),"
        f" i -> md5(substring({t}, i, {k})))"
    )
    base = (
        df.where(F.length(text_col) >= k)  # short docs carry no full gram
        .select(F.col(id_col).alias("__id"),
                F.posexplode(F.expr(grams)).alias("pos", "h"))
    )
    shared = (
        base.groupBy("h")
        .agg(F.countDistinct("__id").alias("df_docs"),
             F.min("__id").alias("canon"))
        .where(F.col("df_docs") >= min_docs)
        .select("h", "canon")
    )
    starts = (
        base.join(shared, on="h")
        .where(F.col("__id") != F.col("canon"))
        .select("__id", "pos")  # 0-based char start of a covered k-span
    )
    # gaps-and-islands merge of [pos, pos+k) intervals: a start at or
    # before the running coverage end extends the current island
    w = Window.partitionBy("__id").orderBy("pos")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    ivs = (
        starts.withColumn("pe", F.max(F.col("pos") + k).over(wprev))
        .withColumn("isl", F.sum(
            F.when(F.col("pe").isNotNull()
                   & (F.col("pos") <= F.col("pe")), 0).otherwise(1)
        ).over(w))
        .groupBy("__id", "isl")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k).alias("e"))
    )
    per_doc = ivs.groupBy("__id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("ivs"))
    joined = (
        df.select(F.col(id_col).alias("__id"),
                  F.col(text_col).alias("__text"))
        .join(per_doc, on="__id", how="left")
    )
    # one fold over the (few) merged intervals: emit the text BETWEEN
    # intervals, then the tail after the last one
    rebuild = F.expr(
        "CASE WHEN ivs IS NULL THEN coalesce(__text, '') ELSE"
        " aggregate(ivs, struct(0 AS pe, '' AS s),"
        " (acc, iv) -> struct(iv.e AS pe,"
        "   concat(acc.s, substring(__text, acc.pe + 1, iv.s - acc.pe))"
        "   AS s),"
        " acc -> concat(acc.s, substring(__text, acc.pe + 1,"
        "   char_length(__text) - acc.pe))) END")
    return (
        joined.select("__id", rebuild.alias("clean_text"),
                      F.char_length("__text").alias("__n"))
        .select(
            F.col("__id").alias(id_col),
            "clean_text",
            F.char_length("clean_text").cast("bigint")
            .alias("n_chars_kept"),
            F.col("__n").cast("bigint").alias("n_chars"),
        )
    )


def alpha_mixture_weights(df: DataFrame, source_col: str,
                          alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled source-mixture weights (the alpha-sampling rule
    of multilingual pretraining mixes, e.g. mC4 / XLM-R): target sampling
    distribution q_s ∝ p_s^alpha, realized as per-source Bernoulli keep
    rates normalized so the largest rate is 1.0 (keep as much data as the
    mixture allows): rate_s = p_s^(alpha-1) / max_t p_t^(alpha-1).

    alpha < 1 flattens the mix (upweights rare sources by downsampling
    dominant ones); alpha = 1 keeps everything. Feed the rates straight
    into :func:`mixture_sample`. One aggregation on the source key plus a
    single-row window over the per-source table (source cardinality is
    tiny — this is a driver-scale result describing a corpus-scale plan).

    ``rate`` is rounded to 9 decimals: pow() is not guaranteed bit-identical
    across engines, and a mixture rate is a sampling knob, not a measure."""
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = Window.partitionBy()
    scored = counts.withColumn(
        "p", F.col("n_docs") / F.sum("n_docs").over(tot)
    ).withColumn("w", F.pow(F.col("p"), F.lit(alpha - 1.0)))
    return (
        scored.withColumn("rate", F.round(
            F.col("w") / F.max("w").over(tot), 9))
        .select("source", "n_docs",
                F.round("p", 9).alias("p"), "rate")
    )


def mixture_sample(df: DataFrame, id_col: str, source_col: str,
                   weights: dict[str, float], salt: str = "") -> DataFrame:
    """Source-mixture downsampling: keep each source at the rate given in
    ``weights`` (1.0 = keep all, 0.25 = quarter). The knob a data-mixture
    spec turns (e.g. upweight curated sources by downsampling the crawl),
    deterministic via the same md5-range membership as
    extensions.sampling — reproducible across engines and runs.

    Unlisted sources keep rate 0.0 (dropped) — explicit mixture specs
    only. One scan, the filter folds into the source partition pruning
    when the table is partitioned by source."""
    from . import sampling

    cond = F.lit(False)
    bucket = sampling._bucket_expr(id_col, salt)
    for src, rate in weights.items():
        cond = cond | (
            (F.col(source_col) == src)
            & sampling._member_cond(bucket, float(rate))
        )
    return df.where(cond)


def remove_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 20, min_docs: int = 2,
) -> DataFrame:
    """Exact substring-deduplicated text — the REMOVAL counterpart to
    duplicated_spans (which only accounts). Lee et al. 2022 semantics with
    a deterministic keep-one policy: a word ``n``-gram occurring in >=
    ``min_docs`` DISTINCT documents is a duplicated span; every token
    position it covers is cut from every document EXCEPT the gram's
    canonical carrier (the minimum ``id_col`` that contains it), so one
    copy of every duplicated passage always survives the pass.

    Returns (id, clean_text, n_tokens_kept, n_tokens) where clean_text is
    the surviving tokens (normalized: lower/trim/single-space — the same
    tokenization duplicated_spans keys on) rejoined in order.

    Scale shape: one positional-gram scan (O(tokens) rows, md5 keys), one
    gram-frequency aggregation carrying (count distinct docs, min doc),
    one join back of non-canonical carriers, an O(dup_grams x n) position
    explode de-duplicated to covered (id, pos) pairs, and a final
    anti-join + per-doc sorted reassembly. Everything partitions on the
    gram hash or (id, pos) — no all-pairs stage, no driver data."""
    toks = f"split(trim(lower(`{text_col}`)), '\\\\s+')"
    grams = (
        f"transform(sequence(1, greatest(size({toks}) - {n} + 1, 1)),"
        f" i -> md5(array_join(slice({toks}, i, {n}), ' ')))"
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.expr(toks).alias("__toks"),
        F.posexplode(F.expr(grams)).alias("pos", "h"),
    ).where(F.size("__toks") >= n)  # short docs carry no full gram
    shared = (
        base.groupBy("h")
        .agg(F.countDistinct("__id").alias("df_docs"),
             F.min("__id").alias("canon"))
        .where(F.col("df_docs") >= min_docs)
        .select("h", "canon")
    )
    covered = (
        base.select("__id", "pos", "h")
        .join(shared, on="h")
        .where(F.col("__id") != F.col("canon"))
        # gram start at token index pos (0-based) covers [pos, pos+n)
        .select("__id", F.explode(F.expr(
            f"sequence(pos, pos + {n} - 1)")).alias("p"))
        .distinct()
    )
    tokens = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.expr(toks)).alias("p", "tok"),
    )
    kept = tokens.join(covered, on=["__id", "p"], how="left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.expr("array_join(transform(array_sort(collect_list("
               "struct(p, tok))), x -> x.tok), ' ')").alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens_kept"),
    )
    return (
        df.select(F.col(id_col).alias("__id"),
                  F.size(F.expr(toks)).cast("bigint").alias("n_tokens"))
        .join(rebuilt, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens_kept", F.lit(0)).cast("bigint")
            .alias("n_tokens_kept"),
            F.col("n_tokens"),
        )
    )
