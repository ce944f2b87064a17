"""[EXTENSION] End-to-end training-data cleaning pipeline.

Composes the verified operators into the shape a 100 TB pretraining-data
job takes, all table-in/table-out:

    quality gate -> exact dedup -> near-dup removal -> language filter
    -> token accounting

Every stage is a DataFrame transform over the previous one (one lazy plan;
Catalyst fuses the scans), and every stage's semantics are individually
oracle-verified, so the composition has a full SQL oracle too.

Near-dup rule: among surviving docs, any pair with word-3-gram Jaccard >=
the threshold drops the HIGHER doc_id (pairs are emitted id_a < id_b).
Deliberately not a transitive closure — deterministic, one-pass, and
matches what large dedup pipelines do per-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, textstats


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_quality: float = 0.55,
    jaccard_threshold: float = 0.2,
    lang: str = "en",
) -> DataFrame:
    """Returns (doc_id, est_llm_tokens) for the cleaned corpus.

    Executes as ONE feature pass + one near-dup pair join: quality metrics,
    content fingerprint (exact dedup), language pick, token estimate, AND
    the hashed n-gram array for the near-dup candidate join are all
    row-wise, so they compute in a single projection over one scan and
    persist as a COMPACT feature table (no text; grams as int64 hashes).
    Only the exact confirmation of candidate near-dup pairs re-reads text,
    and only for the docs in passing pairs.

    The exact-dedup stage keys on (md5(text), length(text)) rather than
    text equality — md5 collisions are practically constructible, so the
    length is grouped alongside the digest to force a colliding pair to
    also match in byte length. This is collision-hardened, not
    collision-proof; an adversarial corpus needs the per-stage
    dedup.exact_dedup (full-text compare) instead."""
    # spread first: a small parquet arrives as one split, and every stage
    # here is per-row compute (regex, shingling) that must parallelize
    base = dedup._spread(docs.select(F.col(id_col).alias("doc_id"),
                                     F.col(text_col).alias("text")))

    st = textstats.stat_exprs("text")
    lang_pick, _hits = textstats.lang_exprs("text")
    tok = textstats.token_exprs("text")
    # the hashed n-gram array for the near-dup stage is computed HERE, in
    # the same scan as every other per-doc feature: stage 3's candidate
    # join then runs off this compact cache (int64 arrays) instead of
    # re-reading parquet and re-shingling the surviving docs (measured
    # ~1.5s of the pipeline at sf0.1)
    feats = base.select(
        "doc_id",
        st["quality_score"].alias("quality_score"),
        st["n_tokens"].alias("n_tokens"),
        F.md5(F.col("text").cast("string")).alias("__fp"),
        F.length("text").alias("__len"),
        lang_pick.alias("lang_pred"),
        tok["est_llm_tokens"].alias("est_llm_tokens"),
        F.transform(dedup.word_ngrams("text", 3),
                    lambda x: F.xxhash64(x)).alias("__gh"),
    ).persist()

    # 1. quality gate
    kept = feats.where(
        (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )

    # 2. exact dedup (keep min doc_id per (digest, length) group)
    keepers = kept.groupBy("__fp", "__len").agg(F.min("doc_id").alias("doc_id"))
    kept = kept.join(keepers, on=["__fp", "__len", "doc_id"], how="left_semi")

    # 3. near-dup removal (exact n-gram Jaccard; drop the higher id) — the
    # candidate join reuses the hashed gram arrays from the feature pass
    # (no re-scan/re-shingle); only the exact confirmation of passing
    # pairs re-reads text, and only for those few docs
    surv_docs = base.join(kept.select("doc_id"), on="doc_id", how="left_semi")
    surv_grams = kept.select(
        F.col("doc_id").alias("id"), F.size("__gh").alias("n_g"),
        F.col("__gh").alias("gh"))
    pairs = dedup.ngram_jaccard_pairs(surv_docs, "doc_id", "text", n=3,
                                      threshold=jaccard_threshold,
                                      hashed_grams=surv_grams)
    to_drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = kept.join(to_drop, on="doc_id", how="left_anti")

    # 4. language filter + 5. token accounting (already in the feature pass)
    # materialize the compact result eagerly so the persisted feature table
    # can be unpersisted here — repeated pipeline runs in one session must
    # not accumulate cached feature blocks
    result = (
        kept.where(F.col("lang_pred") == lang)
        .select("doc_id", "est_llm_tokens")
        .localCheckpoint(eager=True)
    )
    feats.unpersist()
    return result


def joint_dedup(
    docs: DataFrame,
    embeddings: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    jaccard_threshold: float = 0.5,
    cosine_threshold: float = 0.35,
    ngram_n: int = 3,
) -> DataFrame:
    """Text near-dup ∪ embedding near-dup, clustered jointly — the two
    modalities catch different duplicates (verbatim/boilerplate overlap vs
    paraphrase), so a training-data pipeline unions their pair graphs
    before picking survivors.

    Returns (doc_id, component, keep): ``component`` = min reachable id
    through the combined pair graph, ``keep`` = this doc is its component's
    canonical (minimum-id) representative.

    Scale: both pair generators are the oracle-verified exact operators;
    at 100 TB swap in minhash_lsh_pairs / ivf candidates and keep the same
    union + connected-components tail.
    """
    text_pairs = dedup.ngram_jaccard_pairs(
        docs, doc_id_col, text_col, n=ngram_n, threshold=jaccard_threshold
    ).select("id_a", "id_b")
    emb_pairs = dedup.embedding_cosine_pairs(
        embeddings, vec_id_col, vec_col, threshold=cosine_threshold
    ).select("id_a", "id_b")
    pairs = text_pairs.unionByName(emb_pairs).distinct()
    comp = dedup.connected_components(pairs)
    base = docs.select(F.col(doc_id_col).alias("doc_id"))
    return (
        base.join(comp.withColumnRenamed("id", "doc_id"), on="doc_id",
                  how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
        .withColumn("keep", F.col("component") == F.col("doc_id"))
    )
