"""[EXTENSION] Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (self-join or query-join) with the
dot product as a sequential double fold — deterministic, codegen'd, oracle-
comparable.

Scale paths:
- ``brp_lsh_topk``: BucketedRandomProjectionLSH (pyspark.ml) — sub-quadratic
  candidate generation via random hyperplane buckets.
- ``ivf_topk``: inverted-file (IVF) — k-means-lite centroids, search only the
  ``nprobe`` nearest cells. Centroids are seeded deterministically from the
  data (no RNG at query time), so results are reproducible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y),"
    " 0D, (acc, x) -> acc + x)"
)
_NORM = "sqrt(" + _DOT.format(a="{v}", b="{v}") + ")"


# NOTE on numeric paths: the exact, oracle-checked operators (cosine_topk,
# dedup.embedding_cosine_pairs) use sequential JVM folds — bit-reproducible
# against DuckDB's list_reduce. The approximate paths (ivf_topk, brp_lsh)
# use numpy matmul per cell — pairwise summation rounds differently, which
# is fine where no oracle parity is claimed.


def _with_norm(df: DataFrame, id_col: str, vec_col: str,
               extra: list[str] | None = None) -> DataFrame:
    sel = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    for c in extra or []:
        sel.append(F.col(c))
    return df.select(*sel).withColumn("nrm", F.expr(_NORM.format(v="v")))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    queries: DataFrame | None = None,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors. Self-search when ``queries`` is None
    (excludes self-matches). Returns (query_id, neighbor_id, cosine, rank).

    Brute force = one shuffle-free broadcastable join at small query counts;
    at large scale swap in brp_lsh_topk/ivf_topk candidates and keep this
    ranking stage."""
    base = _with_norm(df, id_col, vec_col).alias("b")
    q = (
        _with_norm(queries, query_id_col or id_col, vec_col)
        if queries is not None else _with_norm(df, id_col, vec_col)
    ).alias("q")
    cond = [F.col("q.id") != F.col("b.id")] if queries is None else []
    dot = _DOT.format(a="q.v", b="b.v")
    # broadcast the QUERY side explicitly: the nested-loop join must stream
    # the (large) base and replicate the small query set — left to the
    # planner, the choice can flip and tank throughput
    scored = (
        F.broadcast(q).join(base, on=cond if cond else F.lit(True))
        .withColumn("cosine", F.expr(dot) / (F.col("q.nrm") * F.col("b.nrm")))
    )
    w = Window.partitionBy("q.id").orderBy(
        F.desc("cosine"), F.asc(F.col("b.id"))
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            F.col("cosine"),
            F.col("rank"),
        )
    )


def brp_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH over euclidean
    distance of L2-normalized vectors (monotone in cosine). Returns
    (query_id, neighbor_id, approx_cosine, rank)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    prepared = (
        df.select(F.col(id_col).alias("id"),
                  array_to_vector(F.col(vec_col).cast("array<double>"))
                  .alias("raw"))
    )
    normalizer = Normalizer(inputCol="raw", outputCol="features", p=2.0)
    feats = normalizer.transform(prepared).select("id", "features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(feats)
    # ||a-b||^2 = 2 - 2cos for unit vectors -> distance threshold sqrt(2)
    # admits every non-negative-cosine candidate
    joined = model.approxSimilarityJoin(feats, feats, 1.4142135, "dist")
    pairs = (
        joined.where(F.col("datasetA.id") != F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("query_id"),
            F.col("datasetB.id").alias("neighbor_id"),
            (1 - F.col("dist") * F.col("dist") / 2).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_centroids(df: DataFrame, id_col: str, vec_col: str,
                     n_cells: int, seed: int = 42) -> DataFrame:
    """Trained IVF centroids via pyspark.ml KMeans (seeded — deterministic
    for a given dataset+partitioning). Returns (cid, cv) rows."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feats)
    spark = df.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(rows, "cid int, cv array<double>")


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 3,
    train_centroids: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its nearest
    centroid, then search each query only within its ``nprobe`` nearest
    cells. Centroids: the n_cells lowest-id vectors (seed-free,
    reproducible) or k-means-trained (``train_centroids=True`` — better
    recall at equal nprobe, still deterministic via fixed seed).

    At 100 TB: centroid list is tiny (broadcast); assignment is one scan; the
    search join shuffles on cell id instead of exploding all pairs."""
    base = _with_norm(df, id_col, vec_col)
    if train_centroids:
        norm_expr = _NORM.format(v="cv")
        centroids = kmeans_centroids(df, id_col, vec_col, n_cells).select(
            "cid", "cv", F.expr(norm_expr).alias("cnrm"))
    else:
        centroids = base.orderBy("id").limit(n_cells).select(
            F.col("id").alias("cid"), F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"))
    dot = _DOT.format(a="v", b="cv")
    sim_to_cell = F.expr(dot) / (F.col("nrm") * F.col("cnrm"))
    w_assign = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cid"))
    # rank once, persist: cells and probes both derive from this small
    # (rows × n_cells) table — without the persist the crossJoin + window
    # pipeline executes twice
    ranked = (
        base.crossJoin(F.broadcast(centroids))
        .withColumn("csim", sim_to_cell)
        .withColumn("crank", F.row_number().over(w_assign))
        .where(F.col("crank") <= max(nprobe, 1))
        .select("id", "v", "nrm", "cid", "crank")
        .persist()
    )
    cells = ranked.where(F.col("crank") == 1).select("id", "v", "nrm", "cid")
    probes = ranked.where(F.col("crank") <= nprobe).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"), "cid",
    )
    # per-cell scoring via cogroup + numpy matmul: every vector crosses the
    # Arrow boundary once per cell-membership (not once per PAIR — a
    # per-pair UDF ships each 64-float vector hundreds of times), and the
    # per-cell score matrix is one SIMD matmul.
    def score_cell(key, probes_pdf: "pd.DataFrame", cells_pdf: "pd.DataFrame"):
        import numpy as np

        if len(probes_pdf) == 0 or len(cells_pdf) == 0:
            return pd.DataFrame(columns=["qid", "id", "cosine"])
        P = np.stack(probes_pdf["qv"].to_numpy()).astype(np.float64)
        C = np.stack(cells_pdf["v"].to_numpy()).astype(np.float64)
        sims = (P @ C.T) / np.outer(
            np.sqrt((P * P).sum(axis=1)), np.sqrt((C * C).sum(axis=1))
        )
        qids = probes_pdf["qid"].to_numpy()
        ids = cells_pdf["id"].to_numpy()
        qi, ci = np.meshgrid(np.arange(len(qids)), np.arange(len(ids)),
                             indexing="ij")
        out = pd.DataFrame({
            "qid": qids[qi.ravel()],
            "id": ids[ci.ravel()],
            "cosine": sims.ravel(),
        })
        return out[out["qid"] != out["id"]]

    # both sides derive from `ranked` -> rename one grouping key to avoid
    # the ambiguous-self-join check (cogroup keys match positionally)
    probes = probes.withColumnRenamed("cid", "pcid")
    scored = probes.groupBy("pcid").cogroup(cells.groupBy("cid")).applyInPandas(
        score_cell, schema="qid bigint, id bigint, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            F.col("cosine"),
            F.col("rank"),
        )
    )
