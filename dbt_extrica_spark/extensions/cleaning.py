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
    tok = F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    part = [F.col(shard_col)] if shard_col else []
    w = Window.partitionBy(*part).orderBy(F.col(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out_cols = [F.col(id_col)]
    if shard_col:
        out_cols.append(F.col(shard_col))
    return (
        df.select(*out_cols, tok.alias("n_tokens"))
        .withColumn("offset",
                    (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                    .cast("bigint"))
        # integer DIV, not double division: token offsets at 100 TB can
        # exceed the exact-double range
        .withColumn("first_seq",
                    F.expr(f"CAST(offset DIV {seq_len} AS BIGINT)"))
        .withColumn("last_seq",
                    F.expr(f"CAST((offset + n_tokens - 1) DIV {seq_len}"
                           f" AS BIGINT)"))
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
