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
    """Returns (doc_id, est_llm_tokens) for the cleaned corpus."""
    # spread first: a small parquet arrives as one split, and every stage
    # here is per-row compute (regex, shingling) that must parallelize
    base = dedup._spread(docs.select(F.col(id_col).alias("doc_id"),
                                     F.col(text_col).alias("text")))

    # 1. quality gate
    stats = textstats.text_stats(base, "doc_id", "text")
    quality_ids = stats.where(
        (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    ).select("doc_id")
    kept = base.join(quality_ids, on="doc_id", how="left_semi")

    # 2. exact dedup (keep min doc_id per identical text)
    # (no persist: the downstream consumers re-scan this subtree, but the
    # scans are cheap projections — caching the wide text rows measured
    # SLOWER than recomputing at both test scales)
    kept = dedup.exact_dedup(kept, "doc_id", ["text"])

    # 3. near-dup removal (exact n-gram Jaccard; drop the higher id)
    pairs = dedup.ngram_jaccard_pairs(kept, "doc_id", "text", n=3,
                                      threshold=jaccard_threshold)
    to_drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = kept.join(to_drop, on="doc_id", how="left_anti")

    # 4. language filter (stopword heuristic)
    langs = textstats.language_id(kept, "doc_id", "text")
    kept = kept.join(
        langs.where(F.col("lang_pred") == lang).select("doc_id"),
        on="doc_id", how="left_semi",
    )

    # 5. token accounting for the training budget
    tokens = textstats.token_count(kept, "doc_id", "text")
    return tokens.select("doc_id", "est_llm_tokens")
