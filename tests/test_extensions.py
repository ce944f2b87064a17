"""Extension-operator behavior: planted duplicates are found, approximate
paths agree with exact baselines, multimodal plumbing is deterministic."""

from pyspark.sql import functions as F

from dbt_extrica_spark.extensions import dedup, multimodal, similarity, textstats


def _docs(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    return spark.table("documents")


def test_minhash_finds_planted_near_dup(spark):
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 50")
    # plant a near-duplicate of doc 0 (tiny suffix edit)
    planted = docs.unionByName(spark.sql(
        "SELECT 99999 AS doc_id, concat(text, ' extra') AS text FROM documents"
        " WHERE doc_id = 0"))
    pairs = dedup.minhash_lsh_pairs(planted, "doc_id", "text",
                                    k=5, num_perm=64, bands=16, threshold=0.7)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 99999) in found


def test_simhash_finds_exact_dup_at_zero_hamming(spark):
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 50")
    planted = docs.unionByName(spark.sql(
        "SELECT 99999 AS doc_id, text FROM documents WHERE doc_id = 0"))
    pairs = dedup.simhash_pairs(planted, "doc_id", "text", max_hamming=3)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert found.get((0, 99999)) == 0


def test_simhash_small_edit_small_hamming(spark):
    # a one-token edit on a ~60-token doc should stay within a loose
    # hamming budget (bits flip where the per-bit sum was near zero)
    _docs(spark)  # registers the documents view (order-independent)
    df = spark.sql(
        "SELECT 1 AS id, text AS txt FROM documents WHERE doc_id = 0"
        " UNION ALL"
        " SELECT 2 AS id, concat(text, ' zzz') AS txt FROM documents"
        " WHERE doc_id = 0")
    sigs = df.select("id", dedup.simhash("txt").alias("sig")).collect()
    s = {r.id: r.sig for r in sigs}
    hamming = bin((s[1] ^ s[2]) & ((1 << 64) - 1)).count("1")
    assert hamming <= 16


def test_exact_dedup_keeps_min_id(spark):
    df = spark.sql("SELECT * FROM VALUES (5, 'x'), (2, 'x'), (9, 'y')"
                   " AS t(id, txt)")
    kept = dedup.exact_dedup(df, "id", ["txt"])
    assert {r.id for r in kept.collect()} == {2, 9}


def test_exact_dedup_multicol_no_boundary_collision(spark):
    # ("ab","c") and ("a","bc") are DIFFERENT content — unit-separator join
    # prevents the concat collision
    df = spark.sql("SELECT * FROM VALUES (1, 'ab', 'c'), (2, 'a', 'bc')"
                   " AS t(id, x, y)")
    kept = dedup.exact_dedup(df, "id", ["x", "y"])
    assert kept.count() == 2


def test_ngram_jaccard_identical_docs(spark):
    df = spark.sql("SELECT * FROM VALUES (1, 'a b c d e'), (2, 'a b c d e'),"
                   " (3, 'q r s t u') AS t(id, txt)")
    pairs = dedup.ngram_jaccard_pairs(df, "id", "txt", n=3, threshold=0.99)
    rows = pairs.collect()
    assert len(rows) == 1
    assert (rows[0].id_a, rows[0].id_b, rows[0].jaccard) == (1, 2, 1.0)


def test_ngram_jaccard_prefix_filter_equivalence(spark):
    # prefix filtering (PPJoin) is lossless: both strategies must return the
    # exact same pair set on a real corpus slice, including low thresholds
    # where prefixes are long and ceil() boundary cases appear
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.2, 0.5, 0.8):
        base = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
                dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, t)
                .collect()}
        pf = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
              dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, t,
                                        prefix_filter=True).collect()}
        assert base == pf, f"threshold {t}: strategies disagree"


def test_ngram_jaccard_hashed_grams_equivalence(spark):
    # the precomputed-hashed-grams path (clean_corpus fusion) must return
    # the exact same pair set as the self-contained one-pass path
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pre = docs.select(
        F.col("doc_id").alias("id"),
        F.transform(dedup.word_ngrams("text", 3),
                    lambda x: F.xxhash64(x)).alias("gh"),
    ).withColumn("n_g", F.size("gh"))
    for t in (0.2, 0.5):
        base = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
                dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, t)
                .collect()}
        fused = {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in
                 dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, t,
                                           hashed_grams=pre).collect()}
        assert base == fused, f"threshold {t}: hashed_grams path disagrees"


def test_ivf_matches_bruteforce_top1(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 200")
    exact = similarity.cosine_topk(emb, "vec_id", "embedding", k=1)
    approx = similarity.ivf_topk(emb, "vec_id", "embedding", k=1,
                                 n_cells=8, nprobe=4)
    e = {r.query_id: r.neighbor_id for r in exact.collect()}
    a = {r.query_id: r.neighbor_id for r in approx.collect()}
    # IVF with generous nprobe should recover most exact top-1 neighbors
    hits = sum(1 for q in e if a.get(q) == e[q])
    assert hits / len(e) > 0.5


def test_ivf_empty_input_returns_empty(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 0")
    out = similarity.ivf_topk(emb, "vec_id", "embedding", k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rank"]


def test_ivf_broadcast_fallback_matches_literal_path(spark, monkeypatch):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 150")
    lit = similarity.ivf_topk(emb, "vec_id", "embedding", k=2,
                              n_cells=8, nprobe=3)
    lit_rows = {(r.query_id, r.neighbor_id, r.rank) for r in lit.collect()}
    monkeypatch.setattr(similarity, "_IVF_LITERAL_BUDGET", 0)
    bc = similarity.ivf_topk(emb, "vec_id", "embedding", k=2,
                             n_cells=8, nprobe=3)
    bc_rows = {(r.query_id, r.neighbor_id, r.rank) for r in bc.collect()}
    assert lit_rows == bc_rows


def test_brp_lsh_runs(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 100")
    out = similarity.brp_lsh_topk(emb, "vec_id", "embedding", k=3)
    assert out.count() > 0
    assert set(out.columns) == {"query_id", "neighbor_id", "approx_cosine",
                                "rank"}


def test_language_id_picks_stopword_language(spark):
    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1, 'the cat and the dog is in the house'),"
        " (2, 'der hund und die katze ist nicht ein'),"
        " (3, 'xyzzy plugh') AS t(id, txt)")
    out = {r.id: r.lang_pred
           for r in textstats.language_id(df, "id", "txt").collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_text_stats_ranges(spark):
    docs = _docs(spark)
    out = textstats.text_stats(docs, "doc_id", "text")
    bad = out.where("quality_score < 0 OR quality_score > 1"
                    " OR alpha_ratio > 1 OR n_tokens <= 0").count()
    assert bad == 0


def test_multimodal_features_deterministic(spark):
    media = multimodal.synthetic_media(spark, n=32)
    f1 = multimodal.extract_features(media).orderBy("media_id").collect()
    f2 = multimodal.extract_features(media).orderBy("media_id").collect()
    assert [(r.media_id, r.sha, r.n_bytes) for r in f1] == \
        [(r.media_id, r.sha, r.n_bytes) for r in f2]
    assert all(len(r.feature) == 8 for r in f1)
    assert all(not r.decoded for r in f1)  # no codec libs in this container


def test_frame_sample_counts(spark):
    media = multimodal.synthetic_media(spark, n=4, kind="video")
    out = multimodal.sample_frames(media, every_ms=500)
    counts = {r.media_id: r.n for r in
              out.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # duration 1000+i ms -> frames at 0,500,1000 -> 3 each
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pipeline_clean_corpus_monotone(spark):
    from dbt_extrica_spark.extensions import pipeline

    docs = _docs(spark)
    out = pipeline.clean_corpus(docs)
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out < n_in
    # output ids are a subset of input ids, with positive token estimates
    assert out.where("est_llm_tokens <= 0").count() == 0
    joined = out.join(docs, on="doc_id", how="left_anti")
    assert joined.count() == 0


def test_winnow_shared_run_shares_fingerprint(spark):
    # two docs sharing a long token run must share at least one fingerprint
    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1, 'alpha beta gamma delta epsilon zeta eta theta iota kappa'),"
        " (2, 'prefix alpha beta gamma delta epsilon zeta eta theta other'),"
        " (3, 'completely different words entirely here now ok right yes')"
        " AS t(id, txt)")
    fps = textstats.winnow(df, "id", "txt", n=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])


def test_tile_images_covers_dimensions(spark):
    media = multimodal.synthetic_media(spark, n=4, kind="image")  # 64x64
    tiles = multimodal.tile_images(media, tile=32)
    per = tiles.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)  # 2x2 tiles of 32px on 64x64
    edges = tiles.where("x1 > 64 OR y1 > 64").count()
    assert edges == 0  # clamped to image bounds


def test_chunk_audio_windows(spark):
    media = multimodal.synthetic_media(spark, n=1, kind="audio")  # 1000ms
    chunks = multimodal.chunk_audio(media, chunk_ms=500, overlap_ms=100)
    rows = sorted((r.start_ms, r.end_ms) for r in chunks.collect())
    # stride 400 over 1000ms: starts 0,400,800 with clamped ends
    assert rows == [(0, 500), (400, 900), (800, 1000)]


def test_connected_components_transitive(spark):
    pairs = spark.sql(
        "SELECT * FROM VALUES (1, 2), (2, 3), (10, 11), (20, 21), (21, 22)"
        " AS t(id_a, id_b)")
    comp = {r.id: r.component
            for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain(spark):
    # chain 0-1-2-...-9 requires multiple propagation rounds; run it
    # through BOTH the driver-local union-find fast path (default) and
    # the distributed loop (local_threshold=0) — identical labels
    pairs = spark.sql(
        "SELECT x AS id_a, x + 1 AS id_b FROM"
        " (SELECT explode(sequence(0, 8)) AS x)")
    comp = {r.id: r.component
            for r in dedup.connected_components(pairs).collect()}
    assert set(comp.values()) == {0} and len(comp) == 10
    dist = {r.id: r.component
            for r in dedup.connected_components(
                pairs, local_threshold=0).collect()}
    assert dist == comp


def test_auto_bands_midpoints():
    # midpoint t* = (1/b)^(b/num_perm inverse rows); chosen at/below tau
    assert dedup.auto_bands(64, 0.5) == 16   # t* = 0.5 exactly
    assert dedup.auto_bands(64, 0.8) in (4, 8)  # deeper rows, fewer fps
    assert dedup.auto_bands(64, 0.2) in (32, 64)  # shallow rows, high recall


def test_minhash_auto_banding_low_threshold(spark):
    # at tau=0.3 a moderately-overlapping planted pair must be found when
    # banding is derived from the threshold
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 30")
    half = spark.sql(
        "SELECT 99999 AS doc_id,"
        " concat(substring(text, 1, CAST(length(text) * 0.6 AS INT)),"
        " ' unrelated suffix words here') AS text"
        " FROM documents WHERE doc_id = 0")
    planted = docs.unionByName(half)
    pairs = dedup.minhash_lsh_pairs(planted, "doc_id", "text", k=5,
                                    num_perm=64, bands=None, threshold=0.3)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 99999) in found


def _minhash_equiv_corpus(spark):
    """Corpus exercising every collapse shape: a 3-member identical group
    (doc 0 + two byte-copies), a near-dup of that group (suffix edit), a
    2-member empty-text group (shingles to the singleton set {''} —
    _shingle_expr's greatest(...,1) floor guarantees >= 1 shingle), and a
    2-member NULL-text group (its own group, distinct from '')."""
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 40")
    return docs.unionByName(spark.sql(
        "SELECT 90001 AS doc_id, text FROM documents WHERE doc_id = 0"
        " UNION ALL"
        " SELECT 90002 AS doc_id, text FROM documents WHERE doc_id = 0"
        " UNION ALL"
        " SELECT 90003 AS doc_id, concat(text, ' tiny suffix') AS text"
        " FROM documents WHERE doc_id = 0"
        " UNION ALL SELECT 90004 AS doc_id, '' AS text"
        " UNION ALL SELECT 90005 AS doc_id, '' AS text"
        " UNION ALL SELECT 90006 AS doc_id, CAST(NULL AS STRING) AS text"
        " UNION ALL SELECT 90007 AS doc_id, CAST(NULL AS STRING) AS text"))


def test_minhash_collapse_identical_equivalent(spark):
    # the heavy-bucket pre-collapse path must emit EXACTLY the pairs (and
    # Jaccard values) of the uncollapsed path — equal shingle sets mean
    # equal signatures and equal Jaccard vs every other doc
    planted = _minhash_equiv_corpus(spark)
    kw = dict(k=5, num_perm=64, bands=16, threshold=0.7)
    ref = {(r.id_a, r.id_b): r.jaccard for r in dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", collapse_identical=False, **kw).collect()}
    got = {(r.id_a, r.id_b): r.jaccard for r in dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", collapse_identical=True, **kw).collect()}
    assert got == ref
    # the identical group's 3 intra pairs at Jaccard exactly 1.0, and the
    # near-dup is found against EVERY member of the group
    assert got[(0, 90001)] == 1.0 and got[(0, 90002)] == 1.0
    assert got[(90001, 90002)] == 1.0
    assert (0, 90003) in got and (90001, 90003) in got
    # empty texts shingle to the singleton {''}: an exact-dup group too
    assert got[(90004, 90005)] == 1.0


def test_minhash_collapse_identical_equivalent_unverified(spark):
    # candidate output (verify=False): identical groups share every band
    # bucket, so their intra pairs ARE candidates in both paths
    planted = _minhash_equiv_corpus(spark)
    kw = dict(k=5, num_perm=64, bands=16, threshold=0.7, verify=False)
    ref = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", collapse_identical=False, **kw).collect()}
    got = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", collapse_identical=True, **kw).collect()}
    assert got == ref
    assert (90004, 90005) in got


def test_minhash_group_mode_equivalent(spark):
    # expand_members=False returns (rep_pairs, membership); expanding it
    # back must reproduce EXACTLY the default member-level output
    planted = _minhash_equiv_corpus(spark)
    kw = dict(k=5, num_perm=64, bands=16, threshold=0.7)
    ref = {(r.id_a, r.id_b): r.jaccard for r in dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", **kw).collect()}
    rep_pairs, membership = dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", expand_members=False, **kw)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.expand_group_pairs(rep_pairs, membership).collect()}
    assert got == ref
    # membership covers every input doc, reps are group minima, and the
    # group-mode pair set is rep-level only (no member of a gsize>=2
    # group other than its rep appears in rep_pairs)
    mem = {r.id: (r.rep, r.gsize) for r in membership.collect()}
    assert len(mem) == planted.count()
    assert mem[90001] == (0, 3) and mem[90002] == (0, 3)
    assert mem[90005][0] == 90004 and mem[90005][1] == 2
    non_reps = {i for i, (rep, _g) in mem.items() if i != rep}
    pair_ids = {x for r in rep_pairs.collect() for x in (r.id_a, r.id_b)}
    assert not (pair_ids & non_reps)


def test_minhash_group_mode_edges_components(spark):
    # CC over the LINEAR edge list (rep pairs + member->rep edges) must
    # equal CC over the expanded quadratic pair set
    planted = _minhash_equiv_corpus(spark)
    kw = dict(k=5, num_perm=64, bands=16, threshold=0.7)
    rep_pairs, membership = dedup.minhash_lsh_pairs(
        planted, "doc_id", "text", expand_members=False, **kw)
    edges = dedup.group_pairs_to_edges(rep_pairs, membership)
    expanded = dedup.expand_group_pairs(rep_pairs, membership)
    comp_lin = {r.id: r.component
                for r in dedup.connected_components(edges).collect()}
    comp_full = {r.id: r.component
                 for r in dedup.connected_components(expanded).collect()}
    assert comp_lin == comp_full
    # edge list is linear: <= rep pairs + non-rep member count
    n_members = membership.where("id != rep").count()
    assert edges.count() <= rep_pairs.count() + n_members


def test_minhash_group_mode_requires_collapse(spark):
    import pytest as _pytest

    docs = _docs(spark).select("doc_id", "text").where("doc_id < 5")
    with _pytest.raises(ValueError, match="collapse_identical"):
        dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                collapse_identical=False,
                                expand_members=False)


def test_minhash_band_table_param_stamp(spark):
    import pytest as _pytest

    docs = _docs(spark).select("doc_id", "text").where("doc_id < 20")
    hist = docs.where("doc_id < 10")
    new = docs.where("doc_id >= 10")
    idx = dedup.minhash_band_table(hist, "doc_id", "text", k=5,
                                   num_perm=64, bands=16)
    # mismatched build params must raise, not silently admit duplicates
    with _pytest.raises(ValueError, match="k=7"):
        dedup.minhash_incremental_pairs(new, hist, "doc_id", "text", k=7,
                                        num_perm=64, bands=16,
                                        hist_bands=idx)
    # an unstamped table (hand-built) is rejected too
    with _pytest.raises(ValueError, match="mh_params"):
        dedup.minhash_incremental_pairs(new, hist, "doc_id", "text",
                                        hist_bands=idx.drop("mh_params"))
    # matching params pass through
    dedup.minhash_incremental_pairs(new, hist, "doc_id", "text", k=5,
                                    num_perm=64, bands=16,
                                    hist_bands=idx).count()
    # a MIXED index (one segment rebuilt with different params) must
    # raise deterministically — the guard checks every distinct stamp,
    # not whichever row a partition serves first
    mixed = idx.unionByName(
        dedup.minhash_band_table(hist, "doc_id", "text", k=7,
                                 num_perm=64, bands=16))
    with _pytest.raises(ValueError, match="k=7"):
        dedup.minhash_incremental_pairs(new, hist, "doc_id", "text", k=5,
                                        num_perm=64, bands=16,
                                        hist_bands=mixed)


def test_minhash_bucketed_index_roundtrip_and_no_index_shuffle(spark):
    # the durable admission index: save bucketed on the probe-join keys,
    # append an increment, probe — results identical to the in-memory
    # path, and the probe plan shuffles ONLY the batch side (no Exchange
    # above the bucketed index scan)
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 60")
    hist = docs.where("doc_id < 30")
    inc = docs.where("doc_id >= 30 AND doc_id < 40")
    new = docs.where("doc_id >= 40").unionByName(
        hist.select((F.col("doc_id") + 500000).alias("doc_id"), "text"))
    tbl = "mh_idx_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    dedup.minhash_index_save(
        dedup.minhash_band_table(hist, "doc_id", "text"), tbl)
    dedup.minhash_index_save(
        dedup.minhash_band_table(inc, "doc_id", "text"), tbl,
        mode="append")
    idx = dedup.minhash_index_load(spark, tbl)
    mem_idx = dedup.minhash_band_table(hist.unionByName(inc),
                                       "doc_id", "text")
    got = {(r.id_new, r.id_hist, r.jaccard)
           for r in dedup.minhash_incremental_pairs(
               new, hist.unionByName(inc), "doc_id", "text",
               hist_bands=idx, broadcast_new=False).collect()}
    ref = {(r.id_new, r.id_hist, r.jaccard)
           for r in dedup.minhash_incremental_pairs(
               new, hist.unionByName(inc), "doc_id", "text",
               hist_bands=mem_idx).collect()}
    assert got == ref and len(got) > 0  # the planted copies must match
    # plan shape, with auto-broadcast OFF to force the large-batch case:
    # the join must use the table's bucketing (Bucketed: true) and the
    # only hash Exchange is the batch side — the index scan feeds its
    # join input with no shuffle (this is minhash_index_save's whole
    # point; with broadcast on, Spark broadcasts the batch instead and
    # the index still doesn't shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = (
            dedup.minhash_band_table(new, "doc_id", "text").alias("a")
            .join(idx.alias("b"),
                  on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.bh") == F.col("b.bh")])
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # exactly one hash-partitioning Exchange: the batch side; the
        # bucketed index branch (the text below the scan node) has none
        assert plan.count("Exchange hashpartitioning") == 1, plan
        idx_tail = plan[plan.index(tbl):]
        assert "Exchange hashpartitioning" not in idx_tail, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_minhash_index_stamp_metadata_and_broadcast_guard(spark):
    import pytest as _pytest

    docs = _docs(spark).select("doc_id", "text").where("doc_id < 40")
    hist = docs.where("doc_id < 20")
    new = docs.where("doc_id >= 20").unionByName(
        hist.select((F.col("doc_id") + 500000).alias("doc_id"), "text"))
    tbl = "mh_idx_stamp_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    dedup.minhash_index_save(
        dedup.minhash_band_table(hist, "doc_id", "text"), tbl)
    # save stamps the table metadata; load pre-seeds the per-DataFrame
    # memo from it — per-batch probes then skip the full-index distinct()
    props = {r["key"]: r["value"] for r in
             spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect()}
    assert props.get("mh_params") == "k=5,perm=64,bands=16"
    idx = dedup.minhash_index_load(spark, tbl)
    assert dedup._VERIFIED_STAMPS.get(idx) == {"k=5,perm=64,bands=16"}
    # mismatched probe params still raise — straight from the memo
    with _pytest.raises(ValueError, match="k=7"):
        dedup.minhash_incremental_pairs(new, hist, "doc_id", "text", k=7,
                                        num_perm=64, bands=16,
                                        hist_bands=idx)
    # matching probe works and the memoized path returns the same pairs
    # as an unmemoized in-memory index
    mem = dedup.minhash_band_table(hist, "doc_id", "text")
    got = {(r.id_new, r.id_hist) for r in dedup.minhash_incremental_pairs(
        new, hist, "doc_id", "text", hist_bands=idx).collect()}
    ref = {(r.id_new, r.id_hist) for r in dedup.minhash_incremental_pairs(
        new, hist, "doc_id", "text", hist_bands=mem).collect()}
    assert got == ref and len(got) > 0
    # broadcast guard: a batch over the row cap falls back to the
    # auto-planned join — same pairs, no forced broadcast of a huge side
    guarded = {(r.id_new, r.id_hist)
               for r in dedup.minhash_incremental_pairs(
                   new, hist, "doc_id", "text", hist_bands=idx,
                   max_broadcast_rows=1).collect()}
    assert guarded == ref
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_connected_components_pointer_jumping_and_guard(spark):
    import pytest as _pytest

    # a 200-node chain has diameter 200: plain min-propagation needs ~200
    # rounds, pointer jumping converges in O(log n) — 12 rounds suffice.
    # local_threshold=0 forces the DISTRIBUTED loop (the default would
    # solve this tiny graph driver-side and never iterate)
    pairs = spark.sql(
        "SELECT x AS id_a, x + 1 AS id_b FROM"
        " (SELECT explode(sequence(0, 199)) AS x)")
    comp = {r.id: r.component
            for r in dedup.connected_components(
                pairs, max_iter=12, local_threshold=0).collect()}
    assert set(comp.values()) == {0} and len(comp) == 201
    # an impossible budget must raise (silent partial labels would break
    # leakage_safe_split's no-straddle guarantee), never return quietly
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1, local_threshold=0)


def test_wordlm_junk_scores_high_and_oov_exact(spark):
    import math

    # CCNet setup: train on a held-out reference slice, score unseen docs
    # (self-training would leave the scored doc's own bigrams in the
    # counts and REWARD rare-word junk — measured and avoided here)
    docs = _docs(spark).select("doc_id", "text")
    junk = spark.sql(
        "SELECT 99998 AS doc_id, 'zqx glorp fnub blarg wibble snark blat"
        " quux zorp mekk' AS text")
    train = docs.where("doc_id < 400")
    held = docs.where("doc_id >= 400").unionByName(junk)
    out = {r.doc_id: r for r in textstats.wordlm_logprob(
        held, "doc_id", "text", train_df=train).collect()}
    typical = sorted(v.avg_neg_logp for k, v in out.items() if k != 99998)
    assert out[99998].avg_neg_logp > typical[len(typical) // 2]
    # all-OOV junk scores EXACTLY ln(V+1) under add-1 (w1 unseen ->
    # P = 1/(V+1) for every bigram)
    vocab = (train.selectExpr(
        "explode(filter(split(trim(lower(text)), '\\\\s+'), x -> x <> ''))"
        " AS w").distinct().count())
    assert abs(out[99998].avg_neg_logp - math.log(vocab + 1)) < 1e-9
    # one-token / empty / whitespace-only / NULL docs carry no bigram ->
    # absent from output, and empty arrays must NOT crash the slice
    # (regression: slice(toks, 1, size-1) with size 0 is a runtime error
    # without the >= 2 guard)
    edge = spark.sql(
        "SELECT 99997 AS doc_id, 'solo' AS text"
        " UNION ALL SELECT 99996, ''"
        " UNION ALL SELECT 99995, '   '"
        " UNION ALL SELECT 99994, CAST(NULL AS STRING)")
    out2 = textstats.wordlm_logprob(edge, "doc_id", "text",
                                    train_df=train.unionByName(edge))
    assert out2.collect() == []


def test_minhash_incremental_finds_cross_dups_only(spark):
    docs = _docs(spark).select("doc_id", "text")
    hist = docs.where("doc_id < 100")
    # new batch: one near-dup of hist doc 0, one exact dup of hist doc 5,
    # two byte-identical NEW docs (a new-new pair the cross op must NOT emit)
    new = spark.sql(
        "SELECT 90001 AS doc_id, concat(text, ' tail') AS text"
        " FROM documents WHERE doc_id = 0"
        " UNION ALL SELECT 90002, text FROM documents WHERE doc_id = 5"
        " UNION ALL SELECT 90003, text FROM documents WHERE doc_id = 7"
        " UNION ALL SELECT 90004, text FROM documents WHERE doc_id = 7")
    pairs = dedup.minhash_incremental_pairs(
        new, hist, "doc_id", "text", threshold=0.7)
    got = {(r.id_new, r.id_hist): r.jaccard for r in pairs.collect()}
    assert (90001, 0) in got
    assert got[(90002, 5)] == 1.0
    assert got[(90003, 7)] == 1.0 and got[(90004, 7)] == 1.0
    assert all(n >= 90000 and h < 90000 for n, h in got)  # cross only


def test_minhash_incremental_precomputed_band_index(spark):
    # the materialized-index path (hist_bands=) must be identical to
    # recomputing history bands from text
    docs = _docs(spark).select("doc_id", "text")
    hist = docs.where("doc_id < 100")
    new = spark.sql(
        "SELECT 90001 AS doc_id, text FROM documents WHERE doc_id = 3")
    idx = dedup.minhash_band_table(hist, "doc_id", "text").persist()
    a = {(r.id_new, r.id_hist, r.jaccard)
         for r in dedup.minhash_incremental_pairs(
             new, hist, "doc_id", "text", threshold=0.7).collect()}
    b = {(r.id_new, r.id_hist, r.jaccard)
         for r in dedup.minhash_incremental_pairs(
             new, hist, "doc_id", "text", threshold=0.7,
             hist_bands=idx).collect()}
    idx.unpersist()
    assert a == b and (90001, 3, 1.0) in a


def test_leakage_safe_split_copies_share_split(spark):
    from dbt_extrica_spark.extensions import sampling

    docs = _docs(spark).select("doc_id", "text").where("doc_id < 120")
    planted = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    pairs = dedup.ngram_jaccard_pairs(planted, "doc_id", "text", n=3,
                                      threshold=0.6)
    out = {r.doc_id: r for r in sampling.leakage_safe_split(
        planted, "doc_id", pairs,
        {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    # every planted copy inherits its original's component AND split —
    # the no-leakage property
    for i in range(120):
        assert out[i].component == out[i + 1000000].component
        assert out[i].split == out[i + 1000000].split
    # all three splits exist and the majority is train
    splits = [r.split for r in out.values()]
    assert set(splits) == {"train", "val", "test"}
    assert splits.count("train") > len(splits) * 0.5


def test_bigram_logprob_flags_junk(spark):
    # corpus-typical text scores lower (more probable) than junk bytes
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 100")
    junk = spark.sql("SELECT 99999 AS doc_id, 'zq9#x!7@kk^^&&pp' AS text")
    out = {r.doc_id: r.avg_neg_logp for r in textstats.char_bigram_logprob(
        docs.unionByName(junk), "doc_id", "text").collect()}
    typical = sorted(v for k, v in out.items() if k != 99999)
    assert out[99999] > typical[len(typical) // 2]  # junk above the median


def test_cms_one_sided_error(spark):
    from dbt_extrica_spark.extensions import sketch

    docs = _docs(spark).where("doc_id < 100")
    toks = sketch.token_stream(docs, "text")
    est = sketch.cms_estimates(toks, width=4, depth=2)  # tiny -> collisions
    rows = est.collect()
    assert all(r.estimate >= r.exact for r in rows)  # never underestimates
    # 4 buckets over a ~35-token vocabulary must collide somewhere
    assert any(r.estimate > r.exact for r in rows)
    # and a generous width should be near-exact for most tokens
    est_wide = sketch.cms_estimates(toks, width=4096, depth=4).collect()
    assert all(r.estimate >= r.exact for r in est_wide)
    exact_hits = sum(1 for r in est_wide if r.estimate == r.exact)
    assert exact_hits / len(est_wide) > 0.9


def test_ivf_trained_centroids_recall(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 200")
    exact = similarity.cosine_topk(emb, "vec_id", "embedding", k=1)
    trained = similarity.ivf_topk(emb, "vec_id", "embedding", k=1,
                                  n_cells=8, nprobe=2, train_centroids=True)
    e = {r.query_id: r.neighbor_id for r in exact.collect()}
    t = {r.query_id: r.neighbor_id for r in trained.collect()}
    hits = sum(1 for q in e if t.get(q) == e[q])
    assert hits / len(e) > 0.5


def test_deterministic_sample_stability_and_salt(spark):
    from dbt_extrica_spark.extensions import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = {r.doc_id for r in
          sampling.deterministic_sample(docs, "doc_id", 0.3).collect()}
    s2 = {r.doc_id for r in
          sampling.deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert s1 == s2 and 0 < len(s1) < docs.count()
    # monotone: raising the rate only ADDS rows
    s_half = {r.doc_id for r in
              sampling.deterministic_sample(docs, "doc_id", 0.6).collect()}
    assert s1 <= s_half
    # a different salt draws an independent sample
    s_salt = {r.doc_id for r in
              sampling.deterministic_sample(docs, "doc_id", 0.3, "v2")
              .collect()}
    assert s_salt != s1


def test_embedding_cosine_pairs_unblocked_guardrail(spark):
    import pytest
    from dbt_extrica_spark.extensions import dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # over the cap without a block_col: refuse the O(n^2) self-join
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.embedding_cosine_pairs(emb, "vec_id", "embedding",
                                     max_rows_unblocked=10).count()
    # same size is allowed below/at the cap, with a block, or by opting out
    n = emb.count()
    capped = dedup.embedding_cosine_pairs(
        emb, "vec_id", "embedding", threshold=0.35, max_rows_unblocked=n)
    explicit = dedup.embedding_cosine_pairs(
        emb, "vec_id", "embedding", threshold=0.35, max_rows_unblocked=None)
    assert capped.count() == explicit.count() > 0


def test_sample_rate_boundaries(spark):
    from dbt_extrica_spark.extensions import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    # rate >= 1.0 keeps EVERY row (the hex threshold for 16^8 is 9 chars
    # and would lexicographically drop ~15/16 of buckets)
    assert sampling.deterministic_sample(docs, "doc_id", 1.0).count() == n
    assert sampling.deterministic_sample(docs, "doc_id", 1.5).count() == n
    assert sampling.deterministic_sample(docs, "doc_id", 0.0).count() == 0
    # a zero-weight tail split receives nothing; the 1.0-weight head gets all
    split = sampling.hash_split(docs, "doc_id", {"a": 1.0, "b": 0.0})
    counts = {r.split: r.n for r in
              split.groupBy("split").count().withColumnRenamed("count", "n")
              .collect()}
    assert counts == {"a": n}


def test_hash_split_partitions_every_row_once(spark):
    from dbt_extrica_spark.extensions import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    split = sampling.hash_split(docs, "doc_id",
                                {"train": 8, "val": 1, "test": 1})
    counts = {r.split: r.n for r in
              split.groupBy("split").count().withColumnRenamed("count", "n")
              .collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]


def test_stratified_sample_quota(spark):
    from dbt_extrica_spark.extensions import sampling
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sampling.stratified_sample(docs, "doc_id", "lang", 5)
    per = out.groupBy("lang").count().collect()
    avail = {r.lang: r[1] for r in docs.groupBy("lang").count().collect()}
    for r in per:
        assert r[1] == min(5, avail[r.lang])


def test_chunk_text_overlap_and_coverage(spark):
    df = spark.sql("SELECT 1 AS id, "
                   "concat_ws(' ', transform(sequence(1, 100),"
                   " i -> concat('w', i))) AS txt")
    out = textstats.chunk_text(df, "id", "txt",
                               chunk_tokens=40, overlap_tokens=10) \
        .orderBy("chunk_idx").collect()
    # 100 tokens, stride 30 -> chunks at 0,30,60 cover tokens 1..100 exactly
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in out] == [40, 40, 40]
    # full coverage: last chunk reaches the last token
    assert out[-1].chunk_text.split(" ")[-1] == "w100"
    # consecutive chunks overlap by exactly overlap_tokens
    c0 = out[0].chunk_text.split(" ")
    c1 = out[1].chunk_text.split(" ")
    assert c0[-10:] == c1[:10]
    # short doc -> exactly one chunk, full text
    one = textstats.chunk_text(
        spark.sql("SELECT 2 AS id, 'a b c' AS txt"), "id", "txt",
        chunk_tokens=40, overlap_tokens=10).collect()
    assert len(one) == 1 and one[0].chunk_text == "a b c"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textstats.chunk_text(df, "id", "txt", 10, 10)


def test_pq_topk_recall_and_rerank(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where("vec_id < 30")
    # exact L2 top-5 baseline
    b = emb.select(F.col("vec_id").alias("id"),
                   F.col("embedding").alias("v")).alias("b")
    q = qs.select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("qv")).alias("q")
    d2 = ("aggregate(zip_with(q.qv, b.v, (x, y) ->"
          " (cast(x as double) - y) * (cast(x as double) - y)),"
          " 0D, (a, x) -> a + x)")
    w = Window.partitionBy("q.qid").orderBy(F.asc("d2"), F.asc(F.col("b.id")))
    exact = (F.broadcast(q).join(b, on=F.expr("q.qid != b.id"))
             .withColumn("d2", F.expr(d2))
             .withColumn("rank", F.row_number().over(w)).where("rank <= 5"))
    e = {}
    for r in exact.collect():
        e.setdefault(r.qid, []).append(r.id)

    out = similarity.pq_topk(emb, "vec_id", "embedding", k=5,
                             queries=qs, query_id_col="vec_id")
    a = {}
    for r in out.collect():
        a.setdefault(r.query_id, []).append(r.neighbor_id)
    # every query returns exactly k ranked neighbors
    assert all(len(v) == 5 for v in a.values()) and len(a) == len(e)
    # approximate but useful: most queries overlap the exact top-5
    overlap = sum(1 for qid in e if set(e[qid]) & set(a[qid]))
    assert overlap / len(e) >= 0.5
    # rerank=0 (pure ADC) must also run and return k per query
    raw = similarity.pq_topk(emb, "vec_id", "embedding", k=3,
                             queries=qs, query_id_col="vec_id", rerank=0)
    assert raw.groupBy("query_id").count().where("count != 3").count() == 0


def test_redact_pii_counts_and_clean_text(spark):
    from dbt_extrica_spark.extensions import cleaning

    df = spark.createDataFrame(
        [(1, "mail a@b.io and 10.1.2.3 or +4915112345678 done"),
         (2, "nothing sensitive here")],
        "id bigint, t string")
    out = {r.id: r for r in cleaning.redact_pii(df, "id", "t").collect()}
    assert out[1].redacted_text == "mail <EMAIL> and <IP> or <PHONE> done"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 1, 1)
    assert out[2].redacted_text == "nothing sensitive here"
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 0, 0)


def test_remove_boilerplate_preserves_order_and_counts(spark):
    from dbt_extrica_spark.extensions import cleaning

    docs = [(i, "HEAD\nbody %d line one\nbody %d line two\nFOOT" % (i, i))
            for i in range(4)]
    df = spark.createDataFrame(docs, "id bigint, t string")
    out = {r.id: r for r in
           cleaning.remove_boilerplate_lines(df, "id", "t", min_docs=3)
           .collect()}
    for i in range(4):
        assert out[i].clean_text == f"body {i} line one\nbody {i} line two"
        assert out[i].n_dropped_lines == 2  # HEAD + FOOT


def test_decontaminate_flags_only_overlapping(spark):
    from dbt_extrica_spark.extensions import cleaning

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated training sentence without overlap here")],
        "id bigint, t string")
    eval_set = spark.createDataFrame(
        [(100, "quick brown fox jumps over something")],
        "id bigint, t string")
    out = {r.id: r for r in
           cleaning.decontaminate(train, eval_set, "id", "t", n=5).collect()}
    assert out[1].contaminated and out[1].n_shared_grams >= 1
    assert not out[2].contaminated and out[2].n_shared_grams == 0


def test_repetition_stats_degenerate_doc(spark):
    from dbt_extrica_spark.extensions import textstats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here are unique")],
        "id bigint, t string")
    out = {r.id: r for r in
           textstats.repetition_stats(df, "id", "t").collect()}
    assert out[1].dup_bigram_frac > 0.5  # 'spam spam' repeats
    assert out[2].dup_bigram_frac == 0.0


def test_pack_documents_offsets_and_spans(spark):
    from dbt_extrica_spark.extensions import cleaning

    df = spark.createDataFrame(
        [(1, "a", "w " * 10), (2, "a", "w " * 5), (3, "a", "w " * 20),
         (4, "b", "w " * 7)],
        "id bigint, src string, t string")
    out = {r.id: r for r in
           cleaning.pack_documents(df, "id", "t", seq_len=8, shard_col="src")
           .collect()}
    # shard a: offsets 0, 10, 15; shard b restarts at 0
    assert [out[i].offset for i in (1, 2, 3)] == [0, 10, 15]
    assert out[4].offset == 0
    # doc 1 (10 tokens at offset 0) spans sequences 0..1 of length 8
    assert (out[1].first_seq, out[1].last_seq) == (0, 1)
    assert (out[3].first_seq, out[3].last_seq) == (1, 4)  # 15..34


def test_pack_documents_unsharded_guardrail(spark):
    import pytest as _pytest

    from dbt_extrica_spark.extensions import cleaning

    df = spark.range(100).select(
        F.col("id"), F.lit("w w w").alias("t"))
    # above the threshold: unsharded call refuses
    with _pytest.raises(ValueError, match="SINGLE task"):
        cleaning.pack_documents(df, "id", "t", seq_len=8,
                                max_rows_unsharded=50).collect()
    # below the threshold: global packing proceeds, offsets contiguous
    out = cleaning.pack_documents(df, "id", "t", seq_len=8,
                                  max_rows_unsharded=200)
    rows = sorted(out.collect(), key=lambda r: r.id)
    assert rows[0].offset == 0 and rows[1].offset == 3
    # explicit opt-out also proceeds
    assert cleaning.pack_documents(
        df, "id", "t", seq_len=8, max_rows_unsharded=None).count() == 100


def test_keep_best_per_cluster_policy(spark):
    from dbt_extrica_spark.extensions import dedup

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 99), (5, 30)],
        "id bigint, score bigint")
    # chain 1-2-3 is one cluster; 4 is a singleton; 5 pairs with 2
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 5)], "id_a bigint, id_b bigint")
    out = {r.id: r for r in dedup.keep_best_per_cluster(
        docs, pairs, "id", "score").collect()}
    # cluster {1,2,3,5}: scores 10/30/20/30 -> tie between 2 and 5, lower
    # id (2) wins; singleton 4 keeps itself
    assert out[2].keep and not out[1].keep
    assert not out[3].keep and not out[5].keep
    assert out[4].keep and out[4].component == 4
    assert len({r.component for r in out.values()}) == 2


def test_dsir_literal_and_broadcast_paths_agree(spark, monkeypatch):
    from dbt_extrica_spark.extensions import selection

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").where("doc_id < 80")
    # zero-feature docs (empty / NULL text) must weigh 0 on BOTH paths —
    # Spark's xxhash64(NULL) is the seed 42, a valid bucket, so the
    # broadcast path must not let the explode_outer placeholder join it
    extra = spark.createDataFrame(
        [(9001, "src0", ""), (9002, "src1", None)],
        "doc_id bigint, source string, text string")
    docs = base.select("doc_id", "source", "text").unionByName(extra)
    target = docs.where("source = 'src0'")
    lit_path = {r.id: (r.n_feats, r.log_weight) for r in
                selection.dsir_logweights(docs, target, "doc_id", "text",
                                          k=32).collect()}
    assert lit_path[9001] == (0, 0.0) and lit_path[9002] == (0, 0.0)
    monkeypatch.setattr(selection, "_LR_LITERAL_BUDGET", 1)
    bc_path = {r.id: (r.n_feats, r.log_weight) for r in
               selection.dsir_logweights(docs, target, "doc_id", "text",
                                         k=32).collect()}
    # decimal sums are order-independent: join+groupBy == sequential fold
    assert lit_path == bc_path
    assert len(lit_path) == docs.count()


def test_dsir_target_predicate_matches_two_df_path(spark):
    """The one-pass tagged count path (target_predicate=) must be
    bit-identical to the classic (target, raw) two-scan path — including
    NULL-predicate rows, which count toward raw only (as where() would
    drop them from the target side)."""
    from dbt_extrica_spark.extensions import selection

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").where("doc_id < 80")
    extra = spark.createDataFrame(
        [(9001, None, "tail words here"), (9002, "src1", None)],
        "doc_id bigint, source string, text string")
    docs = base.select("doc_id", "source", "text").unionByName(extra)
    classic = {r.id: (r.n_feats, r.log_weight) for r in
               selection.dsir_logweights(
                   docs, docs.where("source = 'src0'"),
                   "doc_id", "text", k=32).collect()}
    tagged = {r.id: (r.n_feats, r.log_weight) for r in
              selection.dsir_logweights(
                  docs, None, "doc_id", "text", k=32,
                  target_predicate="source = 'src0'").collect()}
    import pytest

    assert classic == tagged
    with pytest.raises(ValueError):
        selection.dsir_logweights(
            docs, docs.where("source = 'src0'"), "doc_id", "text",
            k=32, target_predicate="source = 'src0'")
    # dsir_score_col is the same literal fold as a corpus column
    lrs = selection.dsir_logratios_within(
        docs, "source = 'src0'", "text", k=32)
    col_path = {r.doc_id: r.w for r in docs.select(
        "doc_id", selection.dsir_score_col(lrs, "text", k=32)
        .alias("w")).collect()}
    assert col_path == {i: lw for i, (_, lw) in classic.items()}


def test_pack_documents_global_tokens_col_and_keep_cols(spark):
    """Precomputed tokens_col + keep_cols must reproduce the text-path
    packing exactly, with the carried column attached verbatim."""
    from dbt_extrica_spark.extensions import cleaning

    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").where("doc_id < 120"))
    via_text = {r.doc_id: (r.n_tokens, r.offset, r.first_seq, r.last_seq)
                for r in cleaning.pack_documents_global(
                    docs, "doc_id", "text", seq_len=64).collect()}
    staged = docs.select(
        "doc_id", F.length("text").alias("extra"),
        cleaning._pack_tokens("text").alias("__n_tok"))
    out = cleaning.pack_documents_global(
        staged, "doc_id", None, seq_len=64,
        keep_cols=("extra",), tokens_col="__n_tok").collect()
    assert {r.doc_id: (r.n_tokens, r.offset, r.first_seq, r.last_seq)
            for r in out} == via_text
    lens = {r.doc_id: r.extra for r in staged.collect()}
    assert all(r.extra == lens[r.doc_id] for r in out)


def test_dsir_select_prefers_target_like_docs(spark):
    from dbt_extrica_spark.extensions import selection

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    target = docs.where("source = 'src0'")
    kept = selection.dsir_select(docs, target, "doc_id", "text",
                                 k=64, temperature=0.5)
    rows = kept.collect()
    assert 0 < len(rows) < docs.count()
    # deterministic: same call, same membership
    again = {r.id for r in selection.dsir_select(
        docs, target, "doc_id", "text", k=64, temperature=0.5).collect()}
    assert {r.id for r in rows} == again
    # the kept set skews toward positive log-weights
    w = {r.id: r.log_weight for r in selection.dsir_logweights(
        docs, target, "doc_id", "text", k=64).collect()}
    kept_mean = sum(w[r.id] for r in rows) / len(rows)
    all_mean = sum(w.values()) / len(w)
    assert kept_mean > all_mean


def test_pretrain_corpus_chain_invariants(spark):
    import pyspark.sql.functions as _F

    from dbt_extrica_spark.extensions import pipeline

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source",
        _F.expr("concat(text, ' of the corpus.')").alias("text"))
    out = pipeline.pretrain_corpus(docs, gopher_min_words=20,
                                   min_kept_lines=1, dsir_k=32,
                                   seq_len=128)
    rows = sorted(out.collect(), key=lambda r: r.doc_id)
    n_in = docs.count()
    assert 0 < len(rows) < n_in          # gates + threshold do real work
    assert all(r.log_weight >= 0.0 for r in rows)
    # offsets are the contiguous global token stream in id order
    off = 0
    for r in rows:
        assert r.offset == off
        assert r.first_seq == off // 128
        assert r.last_seq == (off + r.n_tokens - 1) // 128
        off += r.n_tokens


def test_c4_filter_line_and_page_rules(spark):
    from dbt_extrica_spark.extensions import cleaning

    good = ("the first sentence here is long enough to stay.\n"
            "so is the second one because it ends properly!\n"
            "and a third question keeps the page alive?")
    df = spark.createDataFrame(
        [(1, good),
         (2, good + "\nnow with some Lorem ipsum inside."),
         (3, good + "\nfunction f() { return 1; }"),
         (4, "too short.\nno terminal punctuation here at all\n"
             "please enable javascript to view this page."),
         (5, None)],
        "id bigint, t string")
    out = {r.id: r for r in cleaning.c4_filter(df, "id", "t").collect()}
    assert out[1].keep_page and out[1].n_lines_kept == 3
    assert out[1].clean_text == good
    assert out[2].has_lorem_ipsum and not out[2].keep_page
    assert out[3].has_curly_brace and not out[3].keep_page
    # doc 4: every line fails (short / no punct / javascript)
    assert out[4].n_lines_kept == 0 and not out[4].keep_page
    assert out[5].n_lines_total == 0 and not out[5].keep_page


def test_gopher_rules_thresholds(spark):
    from dbt_extrica_spark.extensions import textstats

    good = ("the cat sat on the mat and that dog ran to be near of "
            "a tree with some food ") * 3  # 60 words, all rules pass
    bully = "\n".join(["- item"] * 20)     # all lines bullet-started
    dotty = "\n".join(["wait for it..."] * 10)
    symbols = "the be to of " + "# " * 30  # symbol-to-word ratio >= 0.1
    df = spark.createDataFrame(
        [(1, good), (2, bully), (3, dotty), (4, symbols), (5, ""),
         (6, None)],
        "id bigint, t string")
    out = {r.id: r for r in
           textstats.gopher_rules(df, "id", "t").collect()}
    assert out[1].passes_gopher
    assert not out[2].r_bullet_lines and out[2].n_bullet_lines == 20
    assert not out[3].r_ellipsis_lines and out[3].n_ellipsis_lines == 10
    assert not out[4].r_symbol_ratio and out[4].n_symbols == 30
    # empty / NULL text: zero counts, fails the word-count band, no error
    for i in (5, 6):
        assert out[i].n_words == 0 and not out[i].passes_gopher
    # mean-word-length band is inclusive integer cross-multiplication
    exact3 = spark.createDataFrame(
        [(1, "abc " * 60)], "id bigint, t string")
    r = textstats.gopher_rules(exact3, "id", "t").collect()[0]
    assert r.n_word_chars == 3 * r.n_words and r.r_mean_word_len


def test_pack_documents_global_matches_single_task(spark):
    from dbt_extrica_spark.extensions import cleaning

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    single = {r.doc_id: (r.offset, r.first_seq, r.last_seq)
              for r in cleaning.pack_documents(
                  df, "doc_id", "text", seq_len=64,
                  max_rows_unsharded=None).collect()}
    # value-identical under the two-phase prefix sum, at any slice count
    for n_part in (1, 3, 17):
        dist = {r.doc_id: (r.offset, r.first_seq, r.last_seq)
                for r in cleaning.pack_documents_global(
                    df, "doc_id", "text", seq_len=64,
                    partitions=n_part).collect()}
        assert dist == single
    # widest stage is sliced: more than one partition carries rows
    sliced = cleaning.pack_documents_global(
        df, "doc_id", "text", seq_len=64, partitions=8)
    import pyspark.sql.functions as _F
    n_used = (sliced.select(_F.spark_partition_id().alias("p"))
              .distinct().count())
    assert n_used > 1


def test_mixture_sample_disjoint_and_deterministic(spark):
    from dbt_extrica_spark.extensions import cleaning

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mixed = cleaning.mixture_sample(
        docs, "doc_id", "source", {"src0": 1.0, "src1": 0.5})
    counts = {r.source: r.n for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"src0", "src1"}  # unlisted sources dropped
    assert counts["src0"] == full["src0"]
    assert 0 < counts["src1"] < full["src1"]
    again = cleaning.mixture_sample(
        docs, "doc_id", "source", {"src0": 1.0, "src1": 0.5})
    assert {r.doc_id for r in again.collect()} == \
        {r.doc_id for r in mixed.collect()}


def test_duplicated_spans_union_and_overlap(spark):
    from dbt_extrica_spark.extensions import cleaning

    df = spark.createDataFrame(
        [(1, "a b c d e"),          # shares 'a b c' with doc 2
         (2, "x a b c y"),
         (3, "q w e r t"),          # nothing shared
         # 4 and 5 share overlapping grams; doc 4's span union covers all
         # 8 tokens (merged intervals, not 4 x 3); disjoint vocabulary
         # from docs 1-2 so the two dup groups don't cross-contaminate
         (4, "p q r s p q r s"),
         (5, "p q r s z z z z")],
        "id bigint, t string")
    out = {r.id: r for r in
           cleaning.duplicated_spans(df, "id", "t", n=3, min_docs=2)
           .collect()}
    assert out[1].n_dup_grams == 1 and out[1].dup_token_frac == 3 / 5
    assert out[2].dup_token_frac == 3 / 5
    assert out[3].n_dup_grams == 0 and out[3].dup_token_frac == 0.0
    assert out[4].n_dup_grams == 4 and out[4].dup_token_frac == 1.0
    assert out[5].n_dup_grams == 2   # 'a b c' + 'b c d'
    assert out[5].dup_token_frac == 4 / 8


def test_alpha_mixture_weights(spark):
    from dbt_extrica_spark.extensions import cleaning

    rows = [(i, "a") for i in range(9)] + [(99, "b")]
    df = spark.createDataFrame(rows, "id bigint, src string")
    out = {r.source: r for r in
           cleaning.alpha_mixture_weights(df, "src", alpha=0.5).collect()}
    # rare source keeps everything; dominant source downsampled to
    # sqrt(p_b/p_a) = sqrt(1/9) = 1/3
    assert out["b"].rate == 1.0
    assert abs(out["a"].rate - 1 / 3) < 1e-8
    # alpha=1: mixture untouched, every rate 1.0
    flat = {r.source: r.rate for r in
            cleaning.alpha_mixture_weights(df, "src", alpha=1.0).collect()}
    assert flat == {"a": 1.0, "b": 1.0}


def test_shuffle_assignment_dense_and_deterministic(spark):
    from dbt_extrica_spark.extensions import sampling

    df = spark.range(500).withColumnRenamed("id", "k")
    out = sampling.shuffle_assignment(df, "k", n_shards=4)
    rows = out.collect()
    assert {r.shard for r in rows} == {0, 1, 2, 3}
    # positions are dense 0..n-1 within every shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), f"shard {shard} not dense"
    # deterministic across invocations; a salt gives a different permutation
    again = {(r.k, r.shard, r.shard_pos) for r in
             sampling.shuffle_assignment(df, "k", n_shards=4).collect()}
    assert again == {(r.k, r.shard, r.shard_pos) for r in rows}
    salted = {(r.k, r.shard, r.shard_pos) for r in
              sampling.shuffle_assignment(df, "k", 4, salt="v2").collect()}
    assert salted != again
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.shuffle_assignment(df, "k", 0)


def test_source_freshness_thresholds_and_empty(spark):
    from dbt_extrica_spark import testing

    spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS lt") \
        .createOrReplaceTempView("fresh_src")
    r = testing.source_freshness(spark, "fresh_src", "lt",
                                 warn_after_minutes=30,
                                 error_after_minutes=120,
                                 now="2024-01-01 01:00:00").first()
    assert r.status == "warn" and r.age_minutes == 60.0
    r = testing.source_freshness(spark, "fresh_src", "lt",
                                 warn_after_minutes=30,
                                 error_after_minutes=45,
                                 now="2024-01-01 01:00:00").first()
    assert r.status == "error"
    r = testing.source_freshness(spark, "fresh_src", "lt",
                                 now="2024-01-01 01:00:00").first()
    assert r.status == "pass"
    # empty source: NULL max -> error (dbt runtime-error analog)
    spark.sql("SELECT TIMESTAMP '2024-01-01' AS lt WHERE 1=0") \
        .createOrReplaceTempView("empty_src")
    r = testing.source_freshness(spark, "empty_src", "lt",
                                 now="2024-01-01 01:00:00").first()
    assert r.status == "error" and r.max_loaded_at is None


def test_mean_pool_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").where("vec_id < 60")
    out = {r.label: (r.mean_embedding, r.n_vectors) for r in
           similarity.mean_pool(emb, "label", "embedding").collect()}
    rows = emb.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding))
    for label, vecs in by_label.items():
        got, n = out[label]
        assert n == len(vecs)
        # decimal(18,6) routing rounds each element to 1e-6 before summing
        np.testing.assert_allclose(np.array(got),
                                   np.mean(vecs, axis=0), atol=1e-5)
        assert len(got) == 64


def test_tfidf_top_term_is_distinctive(spark):
    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1, 'shared shared zebra'),"
        " (2, 'shared shared quokka'),"
        " (3, 'shared shared shared') AS t(doc_id, text)"
    )
    out = textstats.tfidf_terms(df, "doc_id", "text", top_t=1).collect()
    top = {r.doc_id: r.term for r in out}
    assert top[1] == "zebra" and top[2] == "quokka"
    # doc 3 has only the ubiquitous term: ln(3/3) = 0 score, still ranked
    assert top[3] == "shared"


def test_bm25_ranks_matching_docs(spark):
    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1, 'spark join filter spark'),"
        " (2, 'spark table scan'),"
        " (3, 'unrelated words only') AS t(doc_id, text)"
    )
    out = textstats.bm25_topk(df, "doc_id", "text",
                              ["spark", "join", "filter"], k=10).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 2]  # doc 3 matches nothing and is absent
    assert all(r.score > 0 for r in out)


def test_quantize_int8_roundtrip_bound(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 100")
    codes = similarity.quantize_int8(emb, "vec_id", "embedding")
    rng = codes.selectExpr(
        "max(array_max(codes)) AS hi", "min(array_min(codes)) AS lo"
    ).collect()[0]
    assert rng.hi <= 127 and rng.lo >= -127
    err = similarity.dequantize_error_stats(emb, "vec_id", "embedding")
    assert err.where("NOT within_bound").count() == 0


def test_hll_rollup_merge_matches_single_level(spark):
    from dbt_extrica_spark.extensions import sketch as sketch_ops
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    ev = spark.table("events").withColumn(
        "day", F.expr("date_trunc('day', ts)"))
    # merging per-day sketches must equal sketching the whole group directly
    # (HLL union is lossless for same-lg_k sketches)
    rolled = {r.event_type: r.distinct_est for r in
              sketch_ops.hll_rollup(ev, ["event_type"], "user_id", "day")
              .collect()}
    direct = {r.event_type: r.est for r in
              ev.groupBy("event_type")
              .agg(F.expr("CAST(hll_sketch_estimate(hll_sketch_agg(user_id,"
                          " 12)) AS BIGINT)").alias("est")).collect()}
    assert rolled == direct
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(rolled[k] - n) / n <= 0.02


def test_cell_blocked_cosine_lossless_limit(spark):
    """Probing all cells makes blocking exhaustive: the blocked pair set
    must equal the exact all-pairs set, cosines bit-identical."""
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 200")
    exact = {(r.id_a, r.id_b, r.cosine) for r in
             dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", 0.35)
             .collect()}
    full = {(r.id_a, r.id_b, r.cosine) for r in
            similarity.cell_blocked_cosine_pairs(
                emb, "vec_id", "embedding", 0.35, n_cells=8, nprobe=8)
            .collect()}
    assert full == exact


def test_cell_blocked_cosine_subset_at_partial_probe(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 200")
    exact = {(r.id_a, r.id_b, r.cosine) for r in
             dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", 0.35)
             .collect()}
    blocked = {(r.id_a, r.id_b, r.cosine) for r in
               similarity.cell_blocked_cosine_pairs(
                   emb, "vec_id", "embedding", 0.35, n_cells=8, nprobe=2)
               .collect()}
    assert blocked <= exact


def test_pq_trained_codebooks_beat_training_free(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 200")
    exact = similarity.cosine_topk(emb, "vec_id", "embedding", k=1)
    e = {r.query_id: r.neighbor_id for r in exact.collect()}

    def top1_hits(trained: bool) -> int:
        approx = similarity.pq_topk(emb, "vec_id", "embedding", k=1,
                                    m=8, ks=16, rerank=4,
                                    train_codebooks=trained)
        a = {r.query_id: r.neighbor_id for r in approx.collect()}
        return sum(1 for q in e if a.get(q) == e[q])

    free, trained = top1_hits(False), top1_hits(True)
    # trained codebooks must not be worse; measured they are clearly better
    assert trained >= free


def test_tfidf_max_df_prefilter_drops_ubiquitous_terms(spark):
    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1, 'common zebra'), (2, 'common quokka'), (3, 'common emu')"
        " AS t(doc_id, text)"
    )
    out = textstats.tfidf_terms(df, "doc_id", "text", top_t=2,
                                max_df_frac=0.9).collect()
    assert all(r.term != "common" for r in out)
    # distinctive terms survive
    assert {r.term for r in out} == {"zebra", "quokka", "emu"}


def test_bpe_pattern_survives_into_engine(spark):
    # regression (round-6 advice): the pattern used to be interpolated into
    # a SQL string literal, which stripped the backslashes ('\s' -> 's')
    # and silently merged whitespace runs with adjacent punctuation
    import re

    texts = ["end.  Next", "a  b\tc", "wait... what?!  ok", "  lead", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    out = {r.doc_id: r.n_bpe_tokens
           for r in textstats.bpe_token_count(df, "doc_id", "text").collect()}
    pat = re.compile(textstats.BPE_ISH_PATTERN)
    for i, t in enumerate(texts):
        assert out[i] == len(pat.findall(t)), (t, out[i], pat.findall(t))


def test_clean_corpus_scale_route_equals_one_pass(spark):
    # auto-routing equivalence: the PPJoin prefix-filter route (forced via
    # a tiny probe threshold) is lossless, so the cleaned corpus must be
    # identical to the one-pass hashed-gram route
    from dbt_extrica_spark.extensions import pipeline

    docs = _docs(spark)
    exact = {(r.doc_id, r.est_llm_tokens)
             for r in pipeline.clean_corpus(docs).collect()}
    routed = {(r.doc_id, r.est_llm_tokens)
              for r in pipeline.clean_corpus(docs,
                                             auto_scale_rows=10).collect()}
    assert routed == exact


def test_joint_dedup_scale_route_equals_exact(spark):
    # auto-routing equivalence where blocking recall is 1.0 (measured at
    # the blocked defaults on this corpus): same components, same keepers
    from dbt_extrica_spark.sources.registry import register_sources
    from dbt_extrica_spark.extensions import pipeline

    register_sources(spark, "/root/testdata/sf0.001")
    docs = _docs(spark).where("doc_id < 150")
    emb = spark.table("embeddings").where("vec_id < 150")
    exact = {(r.doc_id, r.component, r.keep)
             for r in pipeline.joint_dedup(docs, emb).collect()}
    # blocked config pinned to the measured-lossless one for this corpus
    routed = {(r.doc_id, r.component, r.keep)
              for r in pipeline.joint_dedup(docs, emb, auto_scale_rows=10,
                                            blocked_n_cells=8,
                                            blocked_nprobe=4).collect()}
    assert routed == exact


def test_joint_dedup_identical_copies_collapse_equivalent(spark):
    # the text-identity collapse (reps-only n-gram join + linear edge
    # expansion) must yield the SAME components as the direct pair
    # computation over the full corpus — planted byte-identical copies,
    # a near-dup bridging into a copy group, and a NULL-text pair (which
    # LINKS in both paths: the n-gram floor gives NULL text the gram set
    # [NULL], so NULL copies pair at exact J=1)
    from dbt_extrica_spark.sources.registry import register_sources
    from dbt_extrica_spark.extensions import pipeline, dedup as dd
    from pyspark.sql import functions as F

    register_sources(spark, "/root/testdata/sf0.001")
    docs = _docs(spark).select("doc_id", "text").where("doc_id < 60")
    emb = spark.table("embeddings").where("vec_id < 60")
    planted = docs.unionByName(spark.sql(
        "SELECT 70001 AS doc_id, text FROM documents WHERE doc_id = 3"
        " UNION ALL SELECT 70002 AS doc_id, text FROM documents"
        " WHERE doc_id = 3"
        " UNION ALL SELECT 70003 AS doc_id,"
        " concat(text, ' x') AS text FROM documents WHERE doc_id = 3"
        " UNION ALL SELECT 70004 AS doc_id, CAST(NULL AS STRING) AS text"
        " UNION ALL SELECT 70005 AS doc_id, CAST(NULL AS STRING) AS text"))
    got = {(r.doc_id, r.component, r.keep)
           for r in pipeline.joint_dedup(planted, emb,
                                         jaccard_threshold=0.5).collect()}
    # reference: direct member-level pairs (no collapse) -> CC
    ref_text = dd.ngram_jaccard_pairs(planted, "doc_id", "text", n=3,
                                      threshold=0.5).select("id_a", "id_b")
    ref_emb = dd.embedding_cosine_pairs(emb, "vec_id", "embedding",
                                        threshold=0.35).select("id_a", "id_b")
    comp = dd.connected_components(ref_text.unionByName(ref_emb).distinct())
    cm = {r.id: r.component for r in comp.collect()}
    ref = {(r.doc_id, cm.get(r.doc_id, r.doc_id),
            cm.get(r.doc_id, r.doc_id) == r.doc_id)
           for r in planted.select("doc_id").collect()}
    assert got == ref
    # the copy group + its near-dup share doc 3's component; the NULL
    # pair forms its own two-member component
    gotmap = {d: c for d, c, _k in got}
    assert gotmap[70001] == gotmap[3] == gotmap[70002] == gotmap[70003]
    assert gotmap[70004] == 70004 and gotmap[70005] == 70004


def test_kmeans_lloyd_deterministic_across_partitionings(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)]
    df = spark.createDataFrame(rows, "id BIGINT, v ARRAY<FLOAT>")
    a = similarity.kmeans_lloyd(df.repartition(2), "id", "v",
                                k=4, iters=3).orderBy("id").collect()
    b = similarity.kmeans_lloyd(df.repartition(9), "id", "v",
                                k=4, iters=3).orderBy("id").collect()
    assert a == b
    assert len(a) == 60
    assert {r.cid for r in a} <= set(range(4))


def test_kmeans_lloyd_separates_planted_clusters(spark):
    # two tight blobs far apart -> k=2 must split them exactly
    rows = [(i, [10.0 + (i % 3) * 0.01, 10.0]) for i in range(10)]
    rows += [(100 + i, [-10.0 - (i % 3) * 0.01, -10.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "id BIGINT, v ARRAY<FLOAT>")
    got = similarity.kmeans_lloyd(df, "id", "v", k=2, iters=3).collect()
    by_cid = {}
    for r in got:
        by_cid.setdefault(r.cid, set()).add(r.id)
    assert sorted(len(v) for v in by_cid.values()) == [10, 10]
    blob_a = {r.id for r in got if r.id < 100}
    assert blob_a in by_cid.values()


def test_kmeans_lloyd_empty_input(spark):
    df = spark.createDataFrame([], "id BIGINT, v ARRAY<FLOAT>")
    assert similarity.kmeans_lloyd(df, "id", "v", k=3).count() == 0


def test_kmeans_lloyd_empty_cluster_keeps_centroid(spark):
    # k=3 over 2 distinct points: one seed centroid never wins a point
    # after the first update; the loop must not divide by zero and the
    # output must still assign every row
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "id BIGINT, v ARRAY<FLOAT>")
    got = similarity.kmeans_lloyd(df, "id", "v", k=3, iters=4).collect()
    assert len(got) == 3
    assert all(r.dist2 == 0.0 for r in got)


def test_remove_duplicated_spans_keeps_canonical_copy(spark):
    from dbt_extrica_spark.extensions import cleaning

    shared = "one two three four five"
    rows = [
        (1, f"alpha {shared} beta"),
        (2, f"gamma {shared} delta"),
        (3, "entirely unrelated text here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in cleaning.remove_duplicated_spans(
        df, "doc_id", "text", n=5, min_docs=2).collect()}
    # doc 1 is the canonical carrier of every shared gram -> untouched
    assert out[1].clean_text == f"alpha {shared} beta"
    assert out[1].n_tokens_kept == out[1].n_tokens == 7
    # doc 2 loses the five shared tokens (plus any position covered by a
    # shared gram) but keeps its unique frame words
    assert "gamma" in out[2].clean_text and "delta" in out[2].clean_text
    assert "three" not in out[2].clean_text
    assert out[2].n_tokens_kept < out[2].n_tokens
    # doc 3 untouched
    assert out[3].clean_text == rows[2][1]


def test_remove_duplicated_spans_short_and_null_docs(spark):
    from dbt_extrica_spark.extensions import cleaning

    rows = [(1, "tiny doc"), (2, None), (3, "a b c d e"), (4, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in cleaning.remove_duplicated_spans(
        df, "doc_id", "text", n=5, min_docs=2).collect()}
    assert out[1].clean_text == "tiny doc"          # shorter than n: no grams
    assert out[2].clean_text == "" and out[2].n_tokens is None
    assert out[3].clean_text == "a b c d e"          # canonical keeps text
    assert out[4].clean_text == "" and out[4].n_tokens_kept == 0


def test_remove_duplicated_spans_char_subword_boundaries(spark):
    from dbt_extrica_spark.extensions import cleaning

    # the shared passage is cut MID-WORD in doc 2 — char fidelity is the
    # point of the char-level variant (chars distinct from the frames so
    # no shared gram straddles a frame junction)
    shared = "0123456789!@#$%^&*()"  # 20 chars
    rows = [
        (1, f"alpha {shared} beta"),
        (2, f"prefix{shared}suffix"),
        (3, "entirely unrelated text that is long enough"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in cleaning.remove_duplicated_spans_char(
        df, "doc_id", "text", k=10, min_docs=2).collect()}
    # doc 1 canonical for every shared gram -> untouched
    assert out[1].clean_text == rows[0][1]
    assert out[1].n_chars_kept == out[1].n_chars == len(rows[0][1])
    # doc 2 loses exactly the shared 20-char span, keeps its frame —
    # no token boundary anywhere near the cut
    assert out[2].clean_text == "prefixsuffix"
    assert out[2].n_chars_kept == 12 and out[2].n_chars == len(rows[1][1])
    # doc 3 untouched
    assert out[3].clean_text == rows[2][1]


def test_remove_duplicated_spans_char_short_null_and_merge(spark):
    from dbt_extrica_spark.extensions import cleaning

    # two disjoint shared spans in one doc must merge/cut independently;
    # short and NULL docs pass through
    s1, s2 = "aaaaaaaaaabbbbbbbbbb", "ccccccccccdddddddddd"
    rows = [(1, f"{s1} mid {s2}"),
            (2, f"L{s1}M{s2}R"),
            (3, "short"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in cleaning.remove_duplicated_spans_char(
        df, "doc_id", "text", k=10, min_docs=2).collect()}
    assert out[1].clean_text == rows[0][1]  # canonical
    assert out[2].clean_text == "LMR"
    assert out[3].clean_text == "short" and out[3].n_chars == 5
    assert out[4].clean_text == "" and out[4].n_chars is None


def test_remove_duplicated_spans_char_random_differential(spark):
    """Seeded randomized differential test: small alphabet + short docs
    make overlapping/self-repeating shared grams common — the operator
    must match a brute-force pure-Python replay exactly on every doc."""
    import random

    from dbt_extrica_spark.extensions import cleaning

    rng = random.Random(1234)
    k, min_docs = 4, 2
    for trial in range(3):
        rows = []
        for i in range(24):
            n = rng.randint(0, 14)
            rows.append((i, "".join(rng.choice("ab ") for _ in range(n))))
        # replay: gram -> {doc: [starts]}, canonical keep-one
        gram_docs: dict = {}
        for d, t in rows:
            for p in range(len(t) - k + 1):
                gram_docs.setdefault(t[p:p + k], {}).setdefault(
                    d, []).append(p)
        covered: dict = {}
        for g, carriers in gram_docs.items():
            if len(carriers) < min_docs:
                continue
            canon = min(carriers)
            for d, ps in carriers.items():
                if d == canon:
                    continue
                s = covered.setdefault(d, set())
                for p in ps:
                    s.update(range(p, p + k))
        want = {}
        for d, t in rows:
            cov = covered.get(d, ())
            want[d] = "".join(c for p, c in enumerate(t) if p not in cov)
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        got = {r.doc_id: r.clean_text
               for r in cleaning.remove_duplicated_spans_char(
                   df, "doc_id", "text", k=k, min_docs=min_docs).collect()}
        assert got == want, f"trial {trial}"


def test_remove_duplicated_spans_char_fully_covered_doc(spark):
    from dbt_extrica_spark.extensions import cleaning

    dup = "0123456789abcdefghij"
    rows = [(1, dup), (2, dup), (3, f"x{dup}y")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in cleaning.remove_duplicated_spans_char(
        df, "doc_id", "text", k=10, min_docs=2).collect()}
    assert out[1].clean_text == dup                  # canonical survives
    assert out[2].clean_text == "" and out[2].n_chars_kept == 0
    assert out[3].clean_text == "xy"


def test_ivf_index_parquet_roundtrip(spark, tmp_path):
    # the persisted-index story taken literally: build -> write both
    # tables as parquet -> read back -> query; results identical to the
    # in-memory index, and full probe equals the one-shot ivf_topk path
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 150")
    cents, posts = similarity.ivf_index_build(emb, "vec_id", "embedding",
                                              n_cells=8)
    cdir, pdir = str(tmp_path / "cents"), str(tmp_path / "posts")
    cents.write.parquet(cdir)
    posts.write.partitionBy("cid").parquet(pdir)
    cents2 = spark.read.parquet(cdir)
    posts2 = spark.read.parquet(pdir)
    qs = emb.where("vec_id < 30")
    # exclude_self=True: these queries ARE index members (one id space),
    # matching ivf_topk's self-search semantics for the equality below
    mem = {(r.query_id, r.neighbor_id, r.rank)
           for r in similarity.ivf_index_query(
               qs, cents, posts, "vec_id", "embedding",
               k=5, nprobe=8, exclude_self=True).collect()}
    disk = {(r.query_id, r.neighbor_id, r.rank)
            for r in similarity.ivf_index_query(
                qs, cents2, posts2, "vec_id", "embedding",
                k=5, nprobe=8, exclude_self=True).collect()}
    assert mem == disk and len(mem) > 0
    one_shot = {(r.query_id, r.neighbor_id, r.rank)
                for r in similarity.ivf_topk(
                    emb, "vec_id", "embedding", k=5, n_cells=8,
                    nprobe=8).collect()
                if r.query_id < 30}
    assert mem == one_shot


def test_ivf_pq_index_compressed_and_correct(spark, tmp_path):
    import pytest as _pytest
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 200") \
        .select("vec_id", "embedding")
    cents, books, posts = similarity.ivf_pq_index_build(
        emb, "vec_id", "embedding", n_cells=8, m=8, ks=16,
        train_centroids=True, trainer="lloyd")
    posts = posts.localCheckpoint(eager=True)
    # the structural point: postings carry CODES, never raw vectors
    assert set(posts.columns) == {"id", "cid", "codes"}
    assert posts.count() == emb.count()
    # codes are valid codebook indices
    assert posts.where(
        f"exists(codes, c -> c < 0 OR c >= {len(books[0])})").count() == 0
    # parquet round-trip (the persisted-index story), then query: full
    # probe + exact rerank finds each planted EXACT duplicate as its
    # twin's top neighbor (residual-code match + rerank d2 = 0)
    pdir = str(tmp_path / "pq_posts")
    posts.write.partitionBy("cid").parquet(pdir)
    # partition-column inference reads cid back as INT; restore the type
    posts2 = spark.read.parquet(pdir).withColumn(
        "cid", F.col("cid").cast("bigint"))
    twins = emb.where("vec_id < 20").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    posts_all = posts2.unionByName(similarity.ivf_pq_index_append(
        twins, cents, books, "vec_id", "embedding"))
    corpus = emb.unionByName(twins)
    got = similarity.ivf_pq_query(
        twins, cents, books, posts_all, "vec_id", "embedding",
        k=1, nprobe=8, rerank=4, raw_df=corpus,
        exclude_self=True).collect()
    top = {r.query_id: (r.neighbor_id, r.approx_d2) for r in got}
    assert len(top) == 20
    for qid, (nid, dd) in top.items():
        assert nid == qid - 100000 and dd == 0.0
    # rerank demands the raw corpus
    with _pytest.raises(ValueError, match="raw_df"):
        similarity.ivf_pq_query(twins, cents, books, posts_all,
                                "vec_id", "embedding", rerank=4)
    # durable tables: save (overwrite) + append the twins' codes + load
    # -> identical query results to the in-memory index
    pfx = "ivf_pq_idx_test"
    for t in ("_centroids", "_model", "_postings"):
        spark.sql(f"DROP TABLE IF EXISTS {pfx}{t}")
    similarity.ivf_pq_index_save(cents, books, posts, pfx)
    similarity.ivf_pq_index_save(
        cents, books,
        similarity.ivf_pq_index_append(twins, cents, books,
                                       "vec_id", "embedding"),
        pfx, mode="append")
    c2, b2, p2 = similarity.ivf_pq_index_load(spark, pfx)
    assert b2 == books
    got_disk = {(r.query_id, r.neighbor_id)
                for r in similarity.ivf_pq_query(
                    twins, c2, b2, p2, "vec_id", "embedding", k=1,
                    nprobe=8, rerank=4, raw_df=corpus,
                    exclude_self=True).collect()}
    assert got_disk == {(r.query_id, r.neighbor_id) for r in got}
    for t in ("_centroids", "_model", "_postings"):
        spark.sql(f"DROP TABLE IF EXISTS {pfx}{t}")


def test_ivf_pq_index_append_model_mismatch_refused(spark):
    # appending postings encoded against DIFFERENT codebooks/centroids
    # must be refused before any bytes land (the minhash mh_params guard
    # applied to the vector index): a mixed-model postings table scores
    # garbage ADC distances and silently corrupts recall
    import pytest as _pytest

    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings").where("vec_id < 120")
    cents, books, posts = similarity.ivf_pq_index_build(
        emb, "vec_id", "embedding", n_cells=4, m=8, ks=8)
    pfx = "ivf_pq_guard_test"
    for t in ("_centroids", "_model", "_postings"):
        spark.sql(f"DROP TABLE IF EXISTS {pfx}{t}")
    try:
        similarity.ivf_pq_index_save(cents, books, posts, pfx)
        # a model trained on a different slice hashes differently
        c2, b2, p2 = similarity.ivf_pq_index_build(
            spark.table("embeddings").where("vec_id >= 120"),
            "vec_id", "embedding", n_cells=4, m=8, ks=8)
        with _pytest.raises(ValueError, match="refusing to append"):
            similarity.ivf_pq_index_save(c2, b2, p2, pfx, mode="append")
        # same model appends fine (and the stamp survives the append)
        similarity.ivf_pq_index_save(
            cents, books,
            similarity.ivf_pq_index_append(
                emb.select((F.col("vec_id") + 500000).alias("vec_id"),
                           "embedding"),
                cents, books, "vec_id", "embedding"),
            pfx, mode="append")
        props = {r["key"]: r["value"] for r in spark.sql(
            f"SHOW TBLPROPERTIES {pfx}_postings").collect()}
        assert props.get("ivfpq_model") == similarity._ivf_pq_model_stamp(
            cents, books)
    finally:
        for t in ("_centroids", "_model", "_postings"):
            spark.sql(f"DROP TABLE IF EXISTS {pfx}{t}")


def test_table_ident_and_prop_value_quoting():
    import pytest as _pytest

    from dbt_extrica_spark.extensions.dedup import (_quote_prop_value,
                                                    _quote_table_ident)

    assert _quote_table_ident("t") == "`t`"
    assert _quote_table_ident("db.t") == "`db`.`t`"
    assert _quote_table_ident("my_idx.v2") == "`my_idx`.`v2`"
    # strict by design: names the unquoted API path (saveAsTable,
    # tableExists) can't parse are rejected too, so the quoted-DDL and
    # unquoted-API paths inside minhash_index_save accept the SAME set
    for bad in ("", "a..b", "a.`b", "`; DROP TABLE x; --", "my-idx.v2",
                "2tbl", "a b"):
        with _pytest.raises(ValueError, match="invalid table identifier"):
            _quote_table_ident(bad)
    assert _quote_prop_value("k=5,perm=64,bands=16") == \
        "k=5,perm=64,bands=16"
    for bad in ("a'b", "a\\b", "a b", "a's') -- "):
        with _pytest.raises(ValueError, match="unsafe TBLPROPERTIES"):
            _quote_prop_value(bad)


def test_streaming_vector_admission_modes_and_index_composition(spark):
    from dbt_extrica_spark.sources.registry import register_sources
    from dbt_extrica_spark.streaming import (read_embedding_stream,
                                             streaming_vector_admission)

    register_sources(spark, "/root/testdata/sf0.001")
    hist = spark.table("embeddings").where("vec_id < 300") \
        .select("vec_id", "embedding")
    stream = read_embedding_stream(spark, "/root/testdata/sf0.001") \
        .select("vec_id", "embedding")
    exact = {r.vec_id for r in streaming_vector_admission(
        stream, hist, threshold=0.5, exact=True).collect()}
    # every history member in the stream is its own exact duplicate ->
    # dropped; something genuinely new survives
    assert exact and all(v >= 300 for v in exact)
    # blocked mode at FULL probe == exact mode (all pairs reach a shared
    # cell, cosines are the same JVM fold)
    blocked = {r.vec_id for r in streaming_vector_admission(
        stream, hist, threshold=0.5, exact=False,
        n_cells=8, nprobe=8).collect()}
    assert blocked == exact
    # the advertised composition: admitted vectors extend a compressed
    # IVF-PQ index via append, under the FIXED model
    emb = hist
    cents, books, posts = similarity.ivf_pq_index_build(
        emb, "vec_id", "embedding", n_cells=8, m=8, ks=16)
    admitted = streaming_vector_admission(stream, hist, threshold=0.5,
                                          exact=True)
    delta = similarity.ivf_pq_index_append(admitted, cents, books,
                                           "vec_id", "embedding")
    assert delta.count() == len(exact)
    assert set(delta.columns) == {"id", "cid", "codes"}


def test_bpe_train_learns_textbook_merges(spark):
    rows = [(1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest widest")]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    merges = textstats.bpe_train(df, "text", n_merges=8)
    # most frequent pair first: 'l'+'o' appears in low/lower (7 words)
    assert merges[0] == ("l", "o", 7)
    assert ("lo", "w", 7) in merges
    # min_pair_count=2 stops before singleton pairs
    assert all(n >= 2 for _a, _b, n in merges)
    seg = {r.id: r for r in textstats.bpe_segment(
        df, "id", "text", merges).collect()}
    assert seg[1].tokens == ["low"] * 5
    assert seg[1].n_tokens == 5
    assert seg[2].tokens[:2] == ["low", "er"]


def test_bpe_train_deterministic_across_partitionings(spark):
    rows = [(i, f"alpha beta gamma delta{i % 7} epsilon") for i in range(40)]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    a = textstats.bpe_train(df.repartition(2), "text", n_merges=6)
    b = textstats.bpe_train(df.repartition(11), "text", n_merges=6)
    assert a == b and len(a) == 6


def test_bpe_train_empty_and_null_corpus(spark):
    df = spark.createDataFrame([(1, None), (2, "")],
                               "id INT, text STRING")
    assert textstats.bpe_train(df, "text", n_merges=3) == []


def test_bpe_merge_greedy_left_to_right(spark):
    # "aaa": pair (a,a) counts twice (overlap convention) but merges
    # left-to-right non-overlapping -> ['aa', 'a']
    df = spark.createDataFrame([(1, "aaa aaa")], "id INT, text STRING")
    merges = textstats.bpe_train(df, "text", n_merges=1)
    assert merges == [("a", "a", 4)]
    seg = textstats.bpe_segment(df, "id", "text", merges).collect()[0]
    assert seg.tokens == ["aa", "a", "aa", "a"]


def test_tfidf_stopword_prefilter_drops_only_stopwords(spark):
    rows = [(1, "the cat sat on the mat"),
            (2, "the dog ate the bone"),
            (3, "cat and dog and bird")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    full = textstats.tfidf_terms(df, "doc_id", "text", top_t=100)
    filt = textstats.tfidf_terms(df, "doc_id", "text", top_t=100,
                                 stopwords=["the", "and", "on"])
    full_rows = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf)
                 for r in full.collect()}
    filt_rows = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf)
                 for r in filt.collect()}
    # surviving terms keep identical tf/df/tfidf; stopwords vanish
    expected = {k: v for k, v in full_rows.items()
                if k[1] not in ("the", "and", "on")}
    assert filt_rows == expected


def test_tfidf_min_df_prefilter_drops_rare_terms(spark):
    rows = [(1, "cat sat mat mat"),
            (2, "cat dog bone"),
            (3, "cat dog bird zyqwx")]   # zyqwx/bird/bone/sat/mat: rare
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    full = textstats.tfidf_terms(df, "doc_id", "text", top_t=100)
    # min_df=1 is a no-op — exact same rows
    same = textstats.tfidf_terms(df, "doc_id", "text", top_t=100, min_df=1)
    key = lambda r: (r.doc_id, r.term, r.tf, r.df, r.tfidf)
    assert sorted(map(key, full.collect())) == \
        sorted(map(key, same.collect()))
    # min_df=2: single-document terms vanish; survivors keep identical
    # tf/df/tfidf (the filter runs AFTER df accounting)
    filt = textstats.tfidf_terms(df, "doc_id", "text", top_t=100, min_df=2)
    full_rows = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf)
                 for r in full.collect()}
    filt_rows = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf)
                 for r in filt.collect()}
    expected = {k: v for k, v in full_rows.items() if v[1] >= 2}
    assert filt_rows == expected and len(filt_rows) < len(full_rows)
    # a hapax-only document yields no rows (the documented caveat)
    solo = spark.createDataFrame([(9, "unique1 unique2")],
                                 "doc_id BIGINT, text STRING")
    both = df.unionByName(solo)
    out = textstats.tfidf_terms(both, "doc_id", "text", top_t=100,
                                min_df=2)
    assert out.where("doc_id = 9").count() == 0


def test_phash_identical_content_zero_hamming(spark):
    rows = [(1, "image", b"\x01\x02\x03" * 50, "image/fake", 64, 64, 0),
            (2, "image", b"\x01\x02\x03" * 50, "image/fake", 64, 64, 0),
            (3, "image", bytes(range(150)), "image/fake", 64, 64, 0)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {(r.id_a, r.id_b): r.hamming
           for r in multimodal.phash_pairs(df, max_hamming=6).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_banding_equals_brute_force(spark):
    rows = multimodal.synthetic_media_rows(32, "image", near_dups=8)
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {(r.id_a, r.id_b): r.hamming
           for r in multimodal.phash_pairs(df, max_hamming=6,
                                           chunks=8).collect()}
    import itertools

    sigs = {r[0]: multimodal.phash64(r[2]) for r in rows}
    brute = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        hd = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        if hd <= 6:
            brute[(a, b)] = hd
    assert got == brute
    # every planted one-byte twin is found
    assert all((i, i + 1000) in got for i in range(8))


def test_phash64_signed_range_and_determinism():
    sig = multimodal.phash64(bytes(range(200)))
    assert -(1 << 63) <= sig < (1 << 63)
    assert sig == multimodal.phash64(bytes(range(200)))
    assert multimodal.phash64(b"") != sig  # empty decodes to zeros


def test_hash_embed_unit_norm_and_zero_doc(spark):
    rows = [(1, "alpha beta gamma alpha"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.id: r for r in similarity.hash_embed(
        df, "doc_id", "text", dim=8).collect()}
    import math

    nrm = math.fsum(x * x for x in out[1].embedding)
    assert abs(nrm - 1.0) < 1e-12
    assert out[1].n_tokens == 4
    assert list(out[2].embedding) == [0.0] * 8 and out[2].n_tokens == 0
    assert out[3].embedding is None


def test_hash_embed_feeds_kmeans_end_to_end(spark):
    # raw text -> hash_embed -> kmeans_lloyd with no external model:
    # two repeated vocabularies must split into two pure clusters
    rows = [(i, "apple banana cherry date") for i in range(6)]
    rows += [(100 + i, "xylophone zebra quartz vortex") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    emb = similarity.hash_embed(df, "doc_id", "text", dim=16)
    got = similarity.kmeans_lloyd(emb, "id", "embedding",
                                  k=2, iters=2).collect()
    by_cid = {}
    for r in got:
        by_cid.setdefault(r.cid, set()).add(r.id)
    assert sorted(len(v) for v in by_cid.values()) == [6, 6]
    assert {r.id for r in got if r.id < 100} in by_cid.values()


def test_cell_blocked_trained_centroids_subset_and_gain(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").where("vec_id < 150")
    brute = {(r.id_a, r.id_b): r.cosine
             for r in dedup.embedding_cosine_pairs(
                 emb, "vec_id", "embedding", 0.35).collect()}
    trained = {(r.id_a, r.id_b): r.cosine
               for r in similarity.cell_blocked_cosine_pairs(
                   emb, "vec_id", "embedding", 0.35, n_cells=8, nprobe=2,
                   train_centroids=True).collect()}
    assert all(k in brute and brute[k] == v for k, v in trained.items())
    assert len(trained) > 0


def test_ivf_lloyd_trainer_partitioning_independent(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").where("vec_id < 120")
    a = similarity.ivf_topk(emb.repartition(3), "vec_id", "embedding",
                            k=3, n_cells=6, nprobe=2,
                            train_centroids=True,
                            trainer="lloyd").orderBy(
        "query_id", "rank").collect()
    b = similarity.ivf_topk(emb.repartition(11), "vec_id", "embedding",
                            k=3, n_cells=6, nprobe=2,
                            train_centroids=True,
                            trainer="lloyd").orderBy(
        "query_id", "rank").collect()
    assert [(r.query_id, r.neighbor_id) for r in a] == \
           [(r.query_id, r.neighbor_id) for r in b]
    assert len(a) > 0


def test_bpe_train_delta_equals_full(spark):
    rows = [(1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest widest widest")]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    full = textstats.bpe_train(df, "text", n_merges=10)
    delta = textstats.bpe_train(df, "text", n_merges=10, strategy="delta")
    assert full == delta and len(full) > 3


def test_bpe_train_driver_equals_distributed(spark):
    # the production 50k-merge path: merge table from the driver-side
    # heap trainer must be bit-identical to both distributed strategies,
    # on a synthetic corpus AND on real corpus text
    rows = [(1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest widest widest")]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    full = textstats.bpe_train(df, "text", n_merges=10)
    drv = textstats.bpe_train(df, "text", n_merges=10, strategy="driver")
    assert drv == full and len(drv) > 3

    docs = _docs(spark).select("text").where("doc_id < 60")
    delta = textstats.bpe_train(docs, "text", n_merges=12, strategy="delta")
    drv2 = textstats.bpe_train(docs, "text", n_merges=12, strategy="driver")
    assert drv2 == delta and len(drv2) == 12


def test_bpe_train_driver_word_cap_raises(spark):
    import pytest as _pytest

    docs = _docs(spark).select("text").where("doc_id < 60")
    with _pytest.raises(ValueError, match="distinct words"):
        textstats.bpe_train(docs, "text", n_merges=2, strategy="driver",
                            max_driver_words=10)


def test_bpe_train_bad_strategy_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "id INT, text STRING")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        textstats.bpe_train(df, "text", strategy="nope")


def test_weighted_sample_boundaries_and_monotonicity(spark):
    from dbt_extrica_spark.extensions import sampling

    rows = [(i, w) for i in range(400)
            for w in ()] or [(i, [0.0, 0.3, 0.7, 1.0][i % 4])
                             for i in range(400)]
    df = spark.createDataFrame(rows, "id BIGINT, w DOUBLE")
    kept = {r.id for r in sampling.weighted_sample(df, "id", "w").collect()}
    # weight 1.0 rows always kept; weight 0.0 rows never kept
    assert all(i in kept for i in range(400) if i % 4 == 3)
    assert all(i not in kept for i in range(400) if i % 4 == 0)
    # NULL weight dropped
    dfn = spark.createDataFrame([(1, None), (2, 1.0)],
                                "id BIGINT, w DOUBLE")
    assert {r.id for r in sampling.weighted_sample(
        dfn, "id", "w").collect()} == {2}
    # monotone: raising every weight can only ADD rows
    hi = {r.id for r in sampling.weighted_sample(
        df.withColumn("w", F.least(F.col("w") + 0.3, F.lit(1.0))),
        "id", "w").collect()}
    assert kept <= hi


def test_cross_cosine_pairs_planted_and_sides(spark):
    import random

    rng = random.Random(3)
    hist = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    # new batch: 5 exact copies of history vectors + 5 fresh randoms
    new = [(1000 + i, hist[i][1]) for i in range(5)]
    new += [(2000 + i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(5)]
    hist_df = spark.createDataFrame(hist, "vec_id BIGINT, v ARRAY<FLOAT>")
    new_df = spark.createDataFrame(new, "vec_id BIGINT, v ARRAY<FLOAT>")
    got = similarity.cross_cosine_pairs(
        new_df, hist_df, "vec_id", "v", threshold=0.999,
        n_cells=6, nprobe=3).collect()
    found = {(r.new_id, r.hist_id) for r in got}
    # every planted copy pairs with its original (cosine 1 >= .999)
    assert all((1000 + i, i) in found for i in range(5))
    # sides are respected: new ids on the left, hist ids on the right
    assert all(r.new_id >= 1000 and r.hist_id < 30 for r in got)


def test_morton_key_matches_known_curve(spark):
    from dbt_extrica_spark.extensions import layout

    # the 4x4 Morton curve is a textbook constant: key(x, y) with x in
    # bit positions 0,2 and y in 1,3
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = {(r.x, r.y): r.k for r in df.select(
        "x", "y", layout.morton_key(["x", "y"], bits=2).alias("k")
    ).collect()}
    expected = {(x, y): ((x & 1) | ((y & 1) << 1)
                         | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3))
                for x, y in rows}
    assert got == expected


def test_zorder_sort_clusters_quadrants(spark):
    from dbt_extrica_spark.extensions import layout

    # 16x16 grid: the first quarter of the z-sorted order is EXACTLY the
    # lower-left 8x8 quadrant — the locality property zone maps exploit
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    out = layout.zorder_sort(df, ["x", "y"], bits=4,
                             num_partitions=4).collect()
    first_quarter = out[:64]
    assert all(r.x < 8 and r.y < 8 for r in first_quarter)
    # keys are globally non-decreasing across range partitions
    keys = [r.zkey for r in out]
    assert keys == sorted(keys)


def test_compact_files_roundtrip_and_counts(spark, tmp_path):
    from dbt_extrica_spark.extensions import layout

    path = str(tmp_path / "frag")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000)], "id bigint, val string")
    df.repartition(16).write.parquet(path)
    assert layout.data_file_count(spark, path) == 16

    stats = layout.compact_files(spark, path, target_files=2,
                                 sort_cols=["id"])
    assert stats == {"rows": 1000, "files_before": 16, "files_after": 2}
    assert layout.data_file_count(spark, path) == 2
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert {(r.id, r.val) for r in back.collect()} == \
        {(i, f"v{i}") for i in range(1000)}
    # sort_cols rewrite: each file owns a contiguous id range (tight
    # zone maps) — file-level min/max ranges must not overlap
    import glob as _glob

    import pyarrow.parquet as _pq

    ranges = []
    for f in _glob.glob(path + "/part-*"):
        t = _pq.read_table(f, columns=["id"])["id"].to_pylist()
        ranges.append((min(t), max(t)))
    ranges.sort()
    assert ranges[0][1] < ranges[1][0]

    # rows-per-file arithmetic + argument validation
    import pytest

    stats2 = layout.compact_files(spark, path,
                                  target_rows_per_file=300)
    assert stats2["files_after"] == 4  # ceil(1000 / 300)
    with pytest.raises(ValueError, match="exactly one"):
        layout.compact_files(spark, path)
    with pytest.raises(ValueError, match="exactly one"):
        layout.compact_files(spark, path, target_files=2,
                             target_rows_per_file=10)

    # a Hive-partitioned ROOT is refused (per-partition compaction is
    # the correct unit; flattening dt=*/ would break layout readers)
    part_path = str(tmp_path / "parted")
    df.withColumn("dt", (df.id % 3).cast("string")) \
        .write.partitionBy("dt").parquet(part_path)
    assert layout.data_file_count(spark, part_path) == 0
    assert layout.data_file_count(spark, part_path, recursive=True) > 0
    with pytest.raises(ValueError, match="partitioned"):
        layout.compact_files(spark, part_path, target_files=2)
    # a MIXED layout (some top-level part files PLUS partition
    # subdirectories) must be refused too: the old files_before==0-only
    # guard waved it through, and the rename+delete swap would then
    # destroy the subdirectory generation with __compact_old
    mixed_path = str(tmp_path / "mixed")
    df.limit(10).coalesce(1).write.parquet(mixed_path)
    df.limit(10).withColumn("dt", F.lit("0")).coalesce(1) \
        .write.parquet(mixed_path + "/dt=0")
    assert layout.data_file_count(spark, mixed_path) > 0
    assert layout.data_file_count(spark, mixed_path, recursive=True) > \
        layout.data_file_count(spark, mixed_path)
    with pytest.raises(ValueError, match="partitioned"):
        layout.compact_files(spark, mixed_path, target_files=1)
    # a direct part-FILE path gets a clear refusal, not a misleading
    # partitioned-root error (the file's parent != itself under the
    # single-walk guard)
    import glob as _glob2

    one_file = _glob2.glob(part_path + "/dt=0/part-*")[0]
    with pytest.raises(ValueError, match="single data FILE"):
        layout.compact_files(spark, one_file, target_files=1)
    # ... while each partition directory compacts fine
    stats3 = layout.compact_files(spark, part_path + "/dt=0",
                                  target_files=1)
    assert stats3["files_after"] == 1


def test_zorder_prunes_more_rowgroups_than_linear_sort(spark, tmp_path):
    from dbt_extrica_spark.extensions import layout
    import pyarrow.parquet as pq
    import glob as _glob

    # synthetic 2-D table; selective box predicates on BOTH dims.
    # RangePartitioner boundaries are SAMPLED (jitter of +-1 row group per
    # run), so the comparison uses 64 partitions and the SUM over four
    # disjoint boxes — the structural ~2x gap cannot be closed by
    # boundary jitter, where a single 16-partition box could tie.
    rows = [(x, y) for x in range(256) for y in range(256)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    z_path, lin_path = str(tmp_path / "z"), str(tmp_path / "lin")
    layout.zorder_sort(df, ["x", "y"], bits=8, num_partitions=64) \
        .drop("zkey").write.mode("overwrite").parquet(z_path)
    df.repartitionByRange(64, "x").sortWithinPartitions("x", "y") \
        .write.mode("overwrite").parquet(lin_path)

    def rowgroups_hit(path, lo, hi):
        total = hit = 0
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                total += 1
                sx = g.column(cols["x"]).statistics
                sy = g.column(cols["y"]).statistics
                if (sx.min <= hi and sx.max >= lo
                        and sy.min <= hi and sy.max >= lo):
                    hit += 1
        return hit, total

    boxes = [(16, 47), (80, 111), (144, 175), (208, 239)]  # 32x32 each
    z_hit = l_hit = 0
    for lo, hi in boxes:
        zh, zt = rowgroups_hit(z_path, lo, hi)
        lh, lt = rowgroups_hit(lin_path, lo, hi)
        assert zt > 0 and lt > 0
        z_hit += zh
        l_hit += lh
    # the linear sort prunes on x only: every file in the x-range must be
    # read regardless of y; the z-order layout bounds BOTH dims per file
    assert z_hit < l_hit


def test_random_projection_mixed_width_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],
        "id BIGINT, v ARRAY<FLOAT>")
    with _pytest.raises(ValueError, match="uniform vector width"):
        similarity.random_projection(df, "id", "v", out_dim=2)


def test_decode_image_numpy_roundtrip_and_bmp_golden():
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    # PPM roundtrip: encode known pixels, decode, exact equality
    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    assert np.array_equal(mm.decode_image_numpy(mm.encode_ppm(px)), px)
    # PGM (grayscale) roundtrip
    g = np.arange(6 * 7, dtype=np.uint8).reshape(6, 7)
    assert np.array_equal(mm.decode_image_numpy(mm.encode_ppm(g)), g)
    # PNM comments + multi-whitespace headers parse
    body = bytes(px.tobytes())
    hdr = b"P6\n# a comment\n 4   5 \n255\n"
    assert np.array_equal(mm.decode_image_numpy(hdr + body), px)
    # hand-built 3x2 24-bit BMP (bottom-up, BGR, 4-byte row padding):
    # true pixels row0=[R,G,B], row1=[white, black, gray]
    true = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                     [[255, 255, 255], [0, 0, 0], [128, 128, 128]]],
                    dtype=np.uint8)
    row = (3 * 3 + 3) // 4 * 4  # 12 bytes: 9 + 3 padding
    body = b""
    for yy in (1, 0):  # bottom-up
        body += true[yy, :, ::-1].tobytes() + b"\x00" * (row - 9)
    bmp = (b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
           + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
           + (3).to_bytes(4, "little") + (2).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + b"\x00" * 24 + body)
    assert np.array_equal(mm.decode_image_numpy(bmp), true)
    # non-images decline decode (no exception)
    assert mm.decode_image_numpy(b"\x89PNG\r\n") is None
    assert mm.decode_image_numpy(b"") is None


def test_resize_images_real_and_nearest():
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    # nearest-neighbor on a known grid: 2x upscale repeats each pixel
    px = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # 1x2
    up = mm.resize_nearest(px, 4, 2)
    assert up.shape == (2, 4, 3)
    assert np.array_equal(up[0, 0], [1, 2, 3]) and \
        np.array_equal(up[0, 3], [4, 5, 6])


def test_resize_images_spark_roundtrip(spark):
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    media = mm.synthetic_media_real(spark, n=4, side=16)
    out = {r.media_id: r for r in
           mm.resize_images(media, 8, 8).collect()}
    assert len(out) == 4
    for mid, r in out.items():
        assert r.width == 8 and r.height == 8
        px = mm.decode_image_numpy(bytes(r.content))
        assert px is not None and px.shape == (8, 8, 3)
        # check the full resized grid against the direct nearest-neighbor
        # of the generator's (textured) pixels
        y = np.arange(16)[:, None]; x = np.arange(16)[None, :]
        full = np.stack([
            (((x * 73) ^ (y * 151)) + mid * 97) % 256,
            (((x * 29) ^ (y * 47)) + mid * 31) % 256,
            (((x * 11) ^ (y * 199)) + mid * 7) % 256,
        ], axis=2).astype(np.uint8)
        assert np.array_equal(px, mm.resize_nearest(full, 8, 8))


def test_png_roundtrip_all_color_types_and_filters():
    import zlib

    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    rng = np.random.RandomState(7)
    # >= 5 rows so the cycling encoder exercises every filter type;
    # width 130 crosses the int16-cumsum overflow boundary for Sub rows
    for ch in (1, 2, 3, 4):
        shape = (7, 130) if ch == 1 else (7, 130, ch)
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for fmode in ("none", "cycle"):
            out = mm.decode_png_numpy(mm.encode_png(px, filter_mode=fmode))
            assert out is not None, (ch, fmode)
            assert np.array_equal(out, px), (ch, fmode)
    # the main decoder routes PNG content too
    px = rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
    assert np.array_equal(mm.decode_image_numpy(mm.encode_png(px)), px)
    # palette: hand-build a 2x2 type-3 PNG and expect expanded RGB
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 0])  # 2 rows, filter 0, indices
    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big"))
    p3 = (b"\x89PNG\r\n\x1a\n"
          + chunk(b"IHDR", (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
                  + bytes([8, 3, 0, 0, 0]))
          + chunk(b"PLTE", pal)
          + chunk(b"IDAT", zlib.compress(raw))
          + chunk(b"IEND", b""))
    out = mm.decode_png_numpy(p3)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]


def test_png_declines_corruption_and_unsupported():
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = mm.encode_png(px)
    # flip one IDAT byte: CRC check must decline, never mis-decode
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 8] ^= 0xFF
    assert mm.decode_png_numpy(bytes(bad)) is None
    # truncation declines
    assert mm.decode_png_numpy(good[:30]) is None
    # interlaced (Adam7) declines: patch IHDR interlace byte + its CRC
    import zlib
    ihdr_at = good.index(b"IHDR")
    ihdr = bytearray(good[ihdr_at:ihdr_at + 17])
    ihdr[16] = 1  # interlace
    crc = (zlib.crc32(bytes(ihdr)) & 0xFFFFFFFF).to_bytes(4, "big")
    patched = good[:ihdr_at] + bytes(ihdr) + crc + good[ihdr_at + 21:]
    assert mm.decode_png_numpy(patched) is None
    # 16-bit depth declines (same patch route)
    ihdr = bytearray(good[ihdr_at:ihdr_at + 17])
    ihdr[12] = 16
    crc = (zlib.crc32(bytes(ihdr)) & 0xFFFFFFFF).to_bytes(4, "big")
    patched = good[:ihdr_at] + bytes(ihdr) + crc + good[ihdr_at + 21:]
    assert mm.decode_png_numpy(patched) is None


def test_tiff_roundtrip_strips_packbits_byteorders():
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    gray = rgb[:, :, 1]
    for px in (rgb, gray):
        for pb in (False, True):
            for rps in (None, 4):
                for be in (False, True):
                    out = mm.decode_tiff_numpy(mm.encode_tiff(
                        px, packbits=pb, rows_per_strip=rps,
                        big_endian=be))
                    assert out is not None and np.array_equal(out, px), \
                        (px.shape, pb, rps, be)
    # the main decoder routes TIFF
    assert np.array_equal(mm.decode_image_numpy(mm.encode_tiff(rgb)), rgb)
    # MinIsWhite photometric inverts (patch the tag value in place)
    blob = bytearray(mm.encode_tiff(gray))
    i = blob.find((262).to_bytes(2, "little"))
    assert blob[i + 8] == 1
    blob[i + 8] = 0
    assert np.array_equal(mm.decode_tiff_numpy(bytes(blob)), 255 - gray)
    # declines: truncation, bad magic, empty IFD
    assert mm.decode_tiff_numpy(mm.encode_tiff(rgb)[:40]) is None
    assert mm.decode_tiff_numpy(b"II*\x00" + b"\x00" * 4) is None
    assert mm.decode_tiff_numpy(b"garbage") is None


def test_gif_roundtrip_lzw_interlace_animation():
    import numpy as np
    import pytest as _pytest
    from dbt_extrica_spark.extensions import gif as G
    from dbt_extrica_spark.extensions import multimodal as mm

    rng = np.random.RandomState(5)
    # small-palette roundtrip + the main decoder routes GIF
    pal = rng.randint(0, 256, size=(7, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 7, size=(13, 9))]
    assert np.array_equal(G.decode_gif_numpy(G.encode_gif(img)), img)
    assert np.array_equal(mm.decode_image_numpy(G.encode_gif(img)), img)
    # full 256-color palette at a size that forces 9+-bit codes, and a
    # 200x200 random image that overflows the 4096-entry dictionary
    # (the clear-and-reset path)
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256]
                    for i in range(256)], dtype=np.uint8)
    big = pal[rng.randint(0, 256, size=(64, 64))]
    assert np.array_equal(G.decode_gif_numpy(G.encode_gif(big)), big)
    huge = pal[rng.randint(0, 256, size=(200, 200))]
    assert np.array_equal(G.decode_gif_numpy(G.encode_gif(huge)), huge)
    # interlaced (4-pass row shuffle), odd height
    il = pal[rng.randint(0, 7, size=(17, 5))]
    assert np.array_equal(
        G.decode_gif_numpy(G.encode_gif(il, interlace=True)), il)
    # animation: both composed frames come back exactly
    f1 = pal[rng.randint(0, 10, size=(8, 8))]
    f2 = pal[rng.randint(0, 10, size=(8, 8))]
    frames, w, h = G.decode_gif_frames(G.encode_gif([f1, f2]))
    assert (w, h, len(frames)) == (8, 8, 2)
    assert np.array_equal(frames[0], f1) and np.array_equal(frames[1], f2)
    # declines + encoder guard
    assert G.decode_gif_numpy(b"NOTAGIF") is None
    assert G.decode_gif_numpy(G.encode_gif(img)[:20]) is None
    over = np.array([[i % 256, i // 256, 0] for i in range(300)],
                    dtype=np.uint8).reshape(100, 3, 3)
    with _pytest.raises(ValueError, match="palette-exact"):
        G.encode_gif(over)


def test_jpeg_blockmean_roundtrips_exact():
    import numpy as np
    from dbt_extrica_spark.extensions import jpeg as J

    rng = np.random.RandomState(3)
    # gray block-constant: bit-exact, including a non-multiple-of-8 crop
    # (edge padding keeps boundary blocks constant)
    blocks = rng.randint(0, 256, size=(3, 2)).astype(np.uint8)
    gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    assert np.array_equal(J.decode_jpeg_numpy(
        J.encode_jpeg_blockmean(gray)), gray)
    crop = gray[:20, :13]
    assert np.array_equal(J.decode_jpeg_numpy(
        J.encode_jpeg_blockmean(crop)), crop)
    # color: 16x16-constant blocks, both 4:4:4 and 4:2:0 (MCU interleave
    # + chroma upsampling), must equal the closed round-trip formula —
    # including saturated corners that exercise the chroma clip
    for src in (
        rng.randint(0, 256, size=(2, 2, 3)).astype(np.uint8),
        np.array([[[255, 0, 0], [0, 0, 255]],
                  [[0, 255, 0], [255, 255, 255]]], dtype=np.uint8),
    ):
        rgb = np.repeat(np.repeat(src, 16, axis=0), 16, axis=1)
        exp = J.rgb_blockmean_roundtrip(rgb)
        for ss in ("444", "420"):
            got = J.decode_jpeg_numpy(
                J.encode_jpeg_blockmean(rgb, subsample=ss))
            assert got is not None and np.array_equal(got, exp), ss
    # restart markers: DRI + RSTn every 3 MCUs, predictors reset
    blocks = rng.randint(0, 256, size=(4, 5)).astype(np.uint8)
    g3 = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    assert np.array_equal(J.decode_jpeg_numpy(
        J.encode_jpeg_blockmean(g3, restart_interval=3)), g3)
    # the main decoder routes JPEG bytes
    from dbt_extrica_spark.extensions import multimodal as mm
    assert np.array_equal(mm.decode_image_numpy(
        J.encode_jpeg_blockmean(gray)), gray)


def test_jpeg_single_component_scan_is_noninterleaved():
    # T.81: a one-component scan has MCU = one 8x8 block REGARDLESS of
    # the SOF sampling factors (libjpeg color->gray transcodes keep
    # 2x2); decoding it as interleaved scrambles block placement
    import numpy as np
    from dbt_extrica_spark.extensions import jpeg as J

    rng = np.random.RandomState(11)
    blocks = rng.randint(0, 256, size=(4, 4)).astype(np.uint8)
    gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    enc = bytearray(J.encode_jpeg_blockmean(gray))
    sof = enc.index(b"\xff\xc0")
    hv_at = sof + 2 + 2 + 6 + 1  # marker(2) len(2) prec+h+w+nc(6) id(1)
    assert enc[hv_at] == 0x11
    enc[hv_at] = 0x22  # declare 2x2 sampling on the lone component
    out = J.decode_jpeg_numpy(bytes(enc))
    assert out is not None and np.array_equal(out, gray)


def test_jpeg_declines_unsupported():
    import numpy as np
    from dbt_extrica_spark.extensions import jpeg as J

    gray = np.full((16, 16), 77, dtype=np.uint8)
    enc = J.encode_jpeg_blockmean(gray)
    # progressive (SOF2) declines: patch the frame marker
    i = enc.index(b"\xff\xc0")
    assert J.decode_jpeg_numpy(enc[:i + 1] + b"\xc2" + enc[i + 2:]) is None
    assert J.decode_jpeg_numpy(enc[:40]) is None     # truncated
    assert J.decode_jpeg_numpy(b"not a jpeg") is None


def test_resize_images_skip_mode_passes_undecodable(spark):
    # one opaque (compressed, no-PIL) blob must NOT abort the batch in
    # the default skip mode: it passes through unchanged with
    # decoded=false while the decodable rows resize normally
    from pyspark.sql import functions as F
    from dbt_extrica_spark.extensions import multimodal as mm

    media = mm.synthetic_media_real(spark, n=3, side=16)
    opaque = media.limit(1).select(
        (F.col("media_id") + 500).alias("media_id"),
        F.lit(b"\x89PNG\r\nnot-actually-decodable").cast("binary")
        .alias("content"),
        *[c for c in media.columns if c not in ("media_id", "content")],
    ).select(media.columns)
    out = {r.media_id: r for r in
           mm.resize_images(media.unionByName(opaque), 8, 8).collect()}
    assert len(out) == 4
    assert not out[500].decoded
    assert bytes(out[500].content).startswith(b"\x89PNG")
    assert out[500].width == 16 and out[500].height == 16  # untouched
    for mid in (0, 1, 2):
        assert out[mid].decoded
        assert out[mid].width == 8 and out[mid].height == 8
    # strict mode keeps the old abort behavior
    import pytest as _pytest
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with _pytest.raises(Exception):
            mm.resize_images(media.unionByName(opaque), 8, 8,
                             on_undecodable="error").collect()


def test_decode_pnm_crlf_and_bad_whitespace():
    # an exact-length PNM written with \r\n after maxval must decode
    # UNSHIFTED; a spec-valid lone-\r file whose FIRST PIXEL is 0x0A
    # must too (the CRLF heuristic may not eat a pixel byte); a
    # non-whitespace byte there must decline, not shift
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    true = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    good = b"P6 2 2 255\n" + true.tobytes()
    crlf = b"P6 2 2 255\r\n" + true.tobytes()
    assert np.array_equal(mm.decode_image_numpy(good), true)
    assert np.array_equal(mm.decode_image_numpy(crlf), true)
    # spec-valid lone \r where pixel[0] == 0x0A: exact-length wins the
    # ambiguity — no byte may be eaten
    tricky = true.copy()
    tricky[0, 0, 0] = 0x0A
    lone_cr = b"P6 2 2 255\r" + tricky.tobytes()
    assert np.array_equal(mm.decode_image_numpy(lone_cr), tricky)
    assert mm.decode_image_numpy(b"P6 2 2 255" + true.tobytes()) is None \
        or not np.array_equal(
            mm.decode_image_numpy(b"P6 2 2 255" + true.tobytes()), true)


def test_phash_real_images_find_planted_twins(spark):
    # with REAL decode, a one-pixel edit must stay perceptually near
    # while distinct gradients stay far
    from dbt_extrica_spark.extensions import multimodal as mm

    media = mm.synthetic_media_real(spark, n=12, side=16, near_dups=3)
    pairs = {(r.id_a, r.id_b) for r in
             mm.phash_pairs(media, max_hamming=6).collect()}
    for i in range(3):
        assert (i, i + 1000) in pairs, pairs


def test_decode_audio_numpy_roundtrip_and_chunk_walk():
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    # mono roundtrip
    s = (np.arange(100, dtype=np.int16) * 117 % 20000) - 10000
    out = mm.decode_audio_numpy(mm.encode_wav(s, 8000))
    assert out is not None
    got, rate = out
    assert rate == 8000 and got.shape == (100, 1)
    assert np.array_equal(got[:, 0], s)
    # stereo interleave preserved
    st = np.stack([s, s[::-1]], axis=1)
    got2, _ = mm.decode_audio_numpy(mm.encode_wav(st, 16000))
    assert np.array_equal(got2, st)
    # an EXTRA odd-sized chunk before fmt/data must be walked over
    # (word alignment): splice a 3-byte junk chunk after 'WAVE'
    wav = bytearray(mm.encode_wav(s, 8000))
    junk = b"junk" + (3).to_bytes(4, "little") + b"abc\x00"  # padded
    spliced = bytes(wav[:12]) + junk + bytes(wav[12:])
    riff_size = len(spliced) - 8
    spliced = spliced[:4] + riff_size.to_bytes(4, "little") + spliced[8:]
    got3, _ = mm.decode_audio_numpy(spliced)
    assert np.array_equal(got3[:, 0], s)
    # non-PCM and non-WAV decline
    assert mm.decode_audio_numpy(b"RIFFxxxxAVI ") is None
    assert mm.decode_audio_numpy(b"\x00" * 100) is None
    # 8-bit: unsigned storage, signed <<8-scaled round-trip (values on
    # the 256-step grid survive exactly)
    s8 = ((np.arange(64, dtype=np.int16) * 7 % 256) - 128) << 8
    got8, _ = mm.decode_audio_numpy(mm.encode_wav(s8, 8000, bits=8))
    assert got8.dtype == np.int16 and np.array_equal(got8[:, 0], s8)
    # 24-bit: sign extension exact at both extremes
    s24 = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23), 123456, -654321],
                   dtype=np.int32)
    got24, _ = mm.decode_audio_numpy(mm.encode_wav(s24, 48000, bits=24))
    assert got24.dtype == np.int32 and np.array_equal(got24[:, 0], s24)
    # 24-bit stereo interleave (reversed channel, not negated — negating
    # -2^23 would overflow the 24-bit range)
    st24 = np.stack([s24, s24[::-1]], axis=1)
    got24s, _ = mm.decode_audio_numpy(mm.encode_wav(st24, 48000, bits=24))
    assert np.array_equal(got24s, st24)
    # 32-bit
    s32 = np.array([0, 2**31 - 1, -(2**31), 42], dtype=np.int32)
    got32, _ = mm.decode_audio_numpy(mm.encode_wav(s32, 44100, bits=32))
    assert np.array_equal(got32[:, 0], s32)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="2\\^23"):
        mm.encode_wav(np.array([1 << 23], dtype=np.int32), bits=24)
    with _pytest.raises(ValueError, match="2\\^23"):
        mm.encode_wav(np.array([-(1 << 23) - 1], dtype=np.int32), bits=24)


def test_decode_video_y4m_422_444_roundtrip():
    import numpy as np
    import pytest as _pytest
    from dbt_extrica_spark.extensions import multimodal as mm

    w, h = 4, 4
    y = (np.arange(16, dtype=np.uint8) * 7 % 256).reshape(h, w)
    cases = {"422": (h, w // 2), "444": (h, w)}
    for chroma, cshape in cases.items():
        u = (np.arange(cshape[0] * cshape[1], dtype=np.uint8) * 3
             ).reshape(cshape)
        v = 255 - u
        blob = mm.encode_y4m([(y, u, v)] * 2, w, h, chroma=chroma)
        dec = mm.decode_video_numpy(blob)
        assert dec is not None, chroma
        frames, gw, gh = dec
        assert (gw, gh, len(frames)) == (w, h, 2)
        gy, gu, gv = frames[1]
        assert np.array_equal(gy, y) and np.array_equal(gu, u) \
            and np.array_equal(gv, v)
    # unknown colorspace declines; bad encoder chroma raises
    blob = mm.encode_y4m([(y, y, y)], w, h, chroma="444")
    mono = blob.replace(b"C444", b"Cmono")
    assert mm.decode_video_numpy(mono) is None
    with _pytest.raises(ValueError, match="chroma"):
        mm.encode_y4m([(y, y, y)], w, h, chroma="411")


def test_decode_video_numpy_roundtrip():
    import numpy as np
    from dbt_extrica_spark.extensions import multimodal as mm

    w = h = 4
    frames = []
    for f in range(3):
        y = ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5 + f)
             % 256).astype(np.uint8)
        u = np.full((2, 2), 10 + f, dtype=np.uint8)
        v = np.full((2, 2), 200 - f, dtype=np.uint8)
        frames.append((y, u, v))
    dec = mm.decode_video_numpy(mm.encode_y4m(frames, w, h))
    assert dec is not None
    got, gw, gh = dec
    assert (gw, gh, len(got)) == (w, h, 3)
    for (y, u, v), (gy, gu, gv) in zip(frames, got):
        assert np.array_equal(y, gy)
        assert np.array_equal(u, gu) and np.array_equal(v, gv)
    # truncated frame / wrong magic decline
    assert mm.decode_video_numpy(mm.encode_y4m(frames, w, h)[:-5]) is None
    assert mm.decode_video_numpy(b"NOTAVIDEO") is None


def test_qdigest_build_merge_quantiles(spark):
    import numpy as np

    from dbt_extrica_spark.extensions import sketch as sk

    # skewed integer data across 4 groups; merged-digest quantiles must
    # sit within the theoretical rank bound vs the exact distribution
    rng = np.random.RandomState(11)
    vals = np.concatenate([
        rng.randint(0, 100, 4000),          # heavy head
        rng.randint(100, 100000, 1000),     # long tail
        np.full(500, 77),                   # a spike
    ])
    groups = rng.randint(0, 4, len(vals))
    df = spark.createDataFrame(
        [(int(g), int(v)) for g, v in zip(groups, vals)],
        "g int, v bigint")
    k, bits = 256, 17
    dig = sk.qdigest_build(df, "v", ["g"], k=k, bits=bits)
    # deterministic: a rebuild is row-identical (no randomness anywhere)
    a = sorted(map(tuple, dig.collect()))
    b = sorted(map(tuple, sk.qdigest_build(df, "v", ["g"],
                                           k=k, bits=bits).collect()))
    assert a == b
    merged = sk.qdigest_merge(dig, k=k, bits=bits)
    n = len(vals)
    assert merged.agg({"cnt": "sum"}).collect()[0][0] == n  # exact mass
    ests = sk.qdigest_quantiles(merged, [0.1, 0.5, 0.9], bits=bits)
    s = np.sort(vals)
    for q, est in ests.items():
        rank = int((s <= est).sum())
        assert abs(rank - q * n) <= (bits / k) * n + 1, (q, est, rank)
    # out-of-range values must raise, not silently clamp
    bad = spark.createDataFrame([(0, 1 << bits)], "g int, v bigint")
    import pytest as _pytest

    with _pytest.raises(Exception, match="outside"):
        sk.qdigest_build(bad, "v", ["g"], k=k, bits=bits).collect()


def _mg_replay(counts_by_group: dict, k: int):
    """Pure-python replay of the order-free MG build+merge (truncate by
    the (k+1)-th largest, ties by token)."""
    def truncate(counts):
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ck1 = items[k][1] if len(items) > k else 0
        dec = ck1
        return ({t: c - ck1 for t, c in items[:k] if c > ck1}, dec)

    summaries, dec_total = [], 0
    for g in sorted(counts_by_group):
        s, d = truncate(counts_by_group[g])
        summaries.append(s)
        dec_total += d
    merged: dict = {}
    for s in summaries:
        for t, c in s.items():
            merged[t] = merged.get(t, 0) + c
    final, d = truncate(merged)
    return final, dec_total + d


def test_misra_gries_matches_replay_and_guarantee(spark):
    """mg_build/mg_merge vs a pure-python replay, plus the MG guarantee:
    0 <= exact - est <= dec_total for every token, dec_total*(k+1) <= n,
    and every token with exact > dec_total survives the merge."""
    import numpy as np

    from dbt_extrica_spark.extensions import sketch as sk

    rng = np.random.RandomState(7)
    k = 8
    rows, counts_by_group, exact = [], {}, {}
    vocab = [f"w{j}" for j in range(60)]
    for g in range(4):
        counts_by_group[g] = {}
        # zipf-ish counts so some tokens are genuinely heavy
        for j, t in enumerate(vocab):
            c = int(rng.randint(0, 4) * (40 // (j + 1) + 1))
            if c:
                counts_by_group[g][t] = c
                exact[t] = exact.get(t, 0) + c
                rows += [(g, t)] * c
    df = spark.createDataFrame(rows, "shard int, token string")
    summ, bstats = sk.mg_build(df, "token", ["shard"], k=k,
                               return_stats=True)
    final, mstats = sk.mg_merge(summ, "token", k=k, return_stats=True)
    got = {r.token: r.est for r in final.collect()}
    brow, mrow = bstats.collect()[0], mstats.collect()[0]
    dec_total = brow.dec + mrow.dec
    n = brow.n

    exp_final, exp_dec = _mg_replay(counts_by_group, k)
    assert got == exp_final
    assert dec_total == exp_dec
    assert n == len(rows)
    # guarantees
    assert dec_total * (k + 1) <= n
    for t, c in exact.items():
        est = got.get(t, 0)
        assert 0 <= c - est <= dec_total, (t, c, est, dec_total)
        if c > dec_total:
            assert t in got, f"heavy hitter {t} missing"
    # per-group summary size cap + determinism of a rebuild
    sizes = {r.shard: 0 for r in summ.collect()}
    for r in summ.collect():
        sizes[r.shard] += 1
    assert all(v <= k for v in sizes.values())
    again = {(r.shard, r.token): r.est
             for r in sk.mg_build(df, "token", ["shard"], k=k).collect()}
    assert again == {(r.shard, r.token): r.est for r in summ.collect()}


def test_misra_gries_weighted(spark):
    """Weighted MG (weight_col): mass = sum of weights; the replay and
    every guarantee hold verbatim with n = total weight mass."""
    import numpy as np

    from dbt_extrica_spark.extensions import sketch as sk

    rng = np.random.RandomState(3)
    k = 6
    rows, counts_by_group, exact = [], {}, {}
    for g in range(3):
        counts_by_group[g] = {}
        for j in range(25):
            t = f"t{j}"
            w = int(rng.randint(1, 9))
            n_rows = int(rng.randint(0, 5))
            if n_rows:
                counts_by_group[g][t] = w * n_rows
                exact[t] = exact.get(t, 0) + w * n_rows
                rows += [(g, t, w)] * n_rows
    df = spark.createDataFrame(rows, "shard int, token string, w bigint")
    summ, bstats = sk.mg_build(df, "token", ["shard"], k=k,
                               return_stats=True, weight_col="w")
    final, mstats = sk.mg_merge(summ, "token", k=k, return_stats=True)
    got = {r.token: r.est for r in final.collect()}
    exp_final, exp_dec = _mg_replay(counts_by_group, k)
    assert got == exp_final
    brow, mrow = bstats.collect()[0], mstats.collect()[0]
    dec_total = brow.dec + mrow.dec
    n = brow.n
    assert dec_total == exp_dec
    assert n == sum(exact.values())
    assert dec_total * (k + 1) <= n
    for t, c in exact.items():
        est = got.get(t, 0)
        assert 0 <= c - est <= dec_total
        if c > dec_total:
            assert t in got
    # NULL / negative weights break the documented guarantee -> in-scan
    # raise instead of a silently wrong summary
    import pytest as _pytest

    bad = spark.createDataFrame([(0, "a", -1)],
                                "shard int, token string, w bigint")
    with _pytest.raises(Exception, match="non-negative"):
        sk.mg_build(bad, "token", ["shard"], k=4,
                    weight_col="w").collect()
    bad_null = spark.createDataFrame([(0, "a", None)],
                                     "shard int, token string, w bigint")
    with _pytest.raises(Exception, match="non-negative"):
        sk.mg_build(bad_null, "token", ["shard"], k=4,
                    weight_col="w").collect()
    # FRACTIONAL weights must raise too: the guard validates the RAW
    # column — a post-cast('bigint') check would see 0.9 -> 0 and
    # -0.9 -> 0 (truncation toward zero), pass its negative/null test,
    # and silently lose mass out of the documented MG bound
    for frac in (0.9, -0.9):
        bad_frac = spark.createDataFrame(
            [(0, "a", frac)], "shard int, token string, w double")
        with _pytest.raises(Exception, match="integral"):
            sk.mg_build(bad_frac, "token", ["shard"], k=4,
                        weight_col="w").collect()
    # ...while INTEGRAL doubles are honest weights and pass: the raw
    # guard rejects fractional values, not the double type itself
    ok_frac = spark.createDataFrame(
        [(0, "a", 3.0), (0, "b", 1.0)], "shard int, token string, w double")
    assert {r.token: r.est for r in
            sk.mg_build(ok_frac, "token", ["shard"], k=4,
                        weight_col="w").collect()} == {"a": 3, "b": 1}


def test_misra_gries_small_groups_exact(spark):
    """Groups with <= k distinct tokens truncate nothing: the summary IS
    the exact count table and the merge of one group is exact too."""
    from dbt_extrica_spark.extensions import sketch as sk

    rows = [(0, "a")] * 5 + [(0, "b")] * 3 + [(0, "c")]
    df = spark.createDataFrame(rows, "shard int, token string")
    summ, stats = sk.mg_build(df, "token", ["shard"], k=8,
                              return_stats=True)
    assert {r.token: r.est for r in summ.collect()} == \
        {"a": 5, "b": 3, "c": 1}
    assert stats.collect()[0].dec == 0
    merged = sk.mg_merge(summ, "token", k=8)
    assert {r.token: r.est for r in merged.collect()} == \
        {"a": 5, "b": 3, "c": 1}


def test_qdigest_heavy_mass_interval_bound(spark):
    """The q-digest guarantee under HEAVY single-value mass is the rank
    INTERVAL form: [count(<est), count(<=est)] overlaps q*n ± eps*n. One
    value holding 50% of the mass makes the naive one-sided gate
    |count(<=est) - q*n| <= eps*n fail on a CORRECT digest (a leaf count
    can exceed n/k under duplicates — the r10 ADVICE repro), so this
    test pins the interval form the battery entry now uses."""
    import numpy as np

    from dbt_extrica_spark.extensions import sketch as sk

    n_half = 2000
    vals = np.concatenate([
        np.full(n_half, 500),                       # 50% mass on one value
        np.arange(n_half) * 37 % 100000 + 1000,     # spread remainder
    ])
    df = spark.createDataFrame([(0, int(v)) for v in vals], "g int, v bigint")
    k, bits = 256, 17
    eps = bits / k
    merged = sk.qdigest_merge(sk.qdigest_build(df, "v", ["g"],
                                               k=k, bits=bits),
                              k=k, bits=bits)
    n = len(vals)
    assert merged.agg({"cnt": "sum"}).collect()[0][0] == n
    ests = sk.qdigest_quantiles(merged, [0.25, 0.5], bits=bits)
    s = np.sort(vals)
    one_sided_violated = False
    for q, est in ests.items():
        lo = int((s < est).sum())
        hi = int((s <= est).sum())
        # the interval form — must ALWAYS hold for a correct digest
        assert lo <= (q + eps) * n + 1, (q, est, lo)
        assert hi >= (q - eps) * n - 1, (q, est, hi)
        if abs(hi - q * n) > eps * n + 1:
            one_sided_violated = True
    # the repro: at least one estimate sits ON the heavy value, where
    # count(<=est) jumps by n/2 — the one-sided gate would have flapped
    assert one_sided_violated, \
        "expected the heavy value to break the one-sided gate"


def test_theta_sketch_replay_and_set_ops(spark):
    """theta_build/union/estimate/set_op vs a pure-python replay through
    the pinned xxh64 (bit-exact: hashes, truncation, integer KMV
    estimator), plus exact-mode semantics and estimator sanity."""
    from dbt_extrica_spark.extensions import sketch as sk
    from dbt_extrica_spark.functions.xxh64 import xxh64_signed

    k = 16
    rows = [(g, v) for g in range(3)
            for v in range(g * 7, g * 7 + 40 + g * 25)]
    df = spark.createDataFrame(rows, "g int, item bigint")

    def ref_sketch(vals):
        return sorted({xxh64_signed(str(v).encode()) for v in vals})[:k]

    def ref_est(hs, kk=k):
        if len(hs) < kk:
            return len(hs)
        return ((kk - 1) << 64) // (hs[-1] + (1 << 63) + 1)

    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, set()).add(v)
    exp_sk = {g: ref_sketch(vs) for g, vs in by_g.items()}

    bs = sk.theta_build(df, "item", ["g"], k=k)
    got_sk: dict = {}
    for r in bs.collect():
        got_sk.setdefault(r.g, []).append(r.h)
    assert {g: sorted(v) for g, v in got_sk.items()} == exp_sk

    est = {r.g: (r.n_hashes, r.theta_h, r.est)
           for r in sk.theta_estimate(bs, ["g"], k=k).collect()}
    for g, hs in exp_sk.items():
        assert est[g] == (len(hs), max(hs), ref_est(hs))

    # union of per-group sketches == sketch of the union (KMV property),
    # and the merged estimate replays
    un = sk.theta_union(bs, [], k=k)
    exp_un = ref_sketch(set().union(*by_g.values()))
    assert sorted(r.h for r in un.collect()) == exp_un
    assert sk.theta_estimate(un, [], k=k).collect()[0].est == \
        ref_est(exp_un)

    # intersect / difference with the theta rule, vs replay
    def ref_setop(a, b, op):
        ta = a[-1] if len(a) >= k else None
        tb = b[-1] if len(b) >= k else None
        alive = [x for x in (ta, tb) if x is not None]
        th = min(alive) if alive else None
        pool = (set(a) & set(b)) if op == "intersect" else set(a) - set(b)
        c = {h for h in pool if th is None or h < th}
        if th is None:
            return (len(c), None, len(c))
        return (len(c), th, (len(c) << 64) // (th + (1 << 63) + 1))

    A, B = bs.where("g = 0").select("h"), bs.where("g = 1").select("h")
    for op in ("intersect", "difference"):
        r = sk.theta_set_op(A, B, k=k, op=op).collect()[0]
        assert (r.n_candidates, r.theta_h, r.est) == \
            ref_setop(exp_sk[0], exp_sk[1], op), op

    # exact mode: neither sketch full -> theta_h NULL, est = exact count
    small = spark.createDataFrame(
        [(0, i) for i in range(5)] + [(1, i) for i in range(3, 9)],
        "g int, item bigint")
    ss = sk.theta_build(small, "item", ["g"], k=k)
    r = sk.theta_set_op(ss.where("g = 0").select("h"),
                        ss.where("g = 1").select("h"), k=k).collect()[0]
    assert (r.n_candidates, r.theta_h, r.est) == (2, None, 2)
    # ...and zero overlap still returns one row
    r = sk.theta_set_op(ss.where("g = 0 AND h IS NOT NULL").select("h")
                        .where(F.lit(False)),
                        ss.where("g = 1").select("h"), k=k).collect()[0]
    assert (r.n_candidates, r.est) == (0, 0)

    # estimator sanity: k=64 on 5000 distinct -> well inside 4 sigma
    big = spark.createDataFrame([(0, v) for v in range(5000)],
                                "g int, item bigint")
    e = sk.theta_estimate(sk.theta_build(big, "item", ["g"], k=64),
                          ["g"], k=64).collect()[0]
    assert abs(e.est - 5000) / 5000 < 0.5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="intersect"):
        sk.theta_set_op(A, B, k=k, op="union")


def test_cap_per_key_modes_and_plan(spark):
    """cap_per_key: both preference modes vs a python replay, cap >=
    group size keeps everything, and the rn <= cap filter plans as
    map-side WindowGroupLimit (partial top-k before the exchange — the
    skewed-domain defense)."""
    import hashlib

    from dbt_extrica_spark.extensions import sampling

    rows = [(i, f"d{i % 3}", (i * 7) % 11) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, dom string, score bigint")

    def md5_8(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:8]

    by_dom: dict = {}
    for i, d, s in rows:
        by_dom.setdefault(d, []).append((i, s))

    # hash mode
    got = {(r.dom, r.id): r.key_rank
           for r in sampling.cap_per_key(df, "id", "dom", cap=4).collect()}
    exp = {}
    for d, members in by_dom.items():
        for rank, (i, _) in enumerate(
                sorted(members, key=lambda m: (md5_8(m[0]), m[0]))[:4], 1):
            exp[(d, i)] = rank
    assert got == exp

    # quality mode: highest score first, ties by id
    got = {(r.dom, r.id): r.key_rank
           for r in sampling.cap_per_key(df, "id", "dom", cap=4,
                                         order_col="score").collect()}
    exp = {}
    for d, members in by_dom.items():
        for rank, (i, _) in enumerate(
                sorted(members, key=lambda m: (-m[1], m[0]))[:4], 1):
            exp[(d, i)] = rank
    assert got == exp

    # cap >= group size keeps every row (rank is a permutation)
    assert sampling.cap_per_key(df, "id", "dom", cap=100).count() == 30

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap"):
        sampling.cap_per_key(df, "id", "dom", cap=0)

    # scale posture: the window must plan as WindowGroupLimit
    out = sampling.cap_per_key(df, "id", "dom", cap=4)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "WindowGroupLimit" in plan


def test_bloom_build_contains_and_union(spark):
    """Bloom membership sketch: (1) no false negatives — every true
    member probes maybe_member=true; (2) mergeability — the word-wise
    OR of two shard filters equals the filter of the union, bit for
    bit; (3) the blocklist anti-join is EXACT (equals the plain anti
    join) regardless of the false-positive rate."""
    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import sketch

    m, nh = 1 << 10, 4  # small bitmap on purpose: force false positives
    a = spark.range(0, 60).select(F.col("id").alias("item"))
    b = spark.range(40, 120).select(F.col("id").alias("item"))
    both = a.unionByName(b)

    bloom_a = sketch.bloom_build(a, "item", m_bits=m, n_hashes=nh)
    bloom_b = sketch.bloom_build(b, "item", m_bits=m, n_hashes=nh)
    merged = sketch.bloom_union(bloom_a.unionByName(bloom_b))
    direct = sketch.bloom_build(both, "item", m_bits=m, n_hashes=nh)
    assert ({(r.word, r.bits) for r in merged.collect()}
            == {(r.word, r.bits) for r in direct.collect()})

    probe = spark.range(0, 400).select(F.col("id").alias("item"))
    flagged = sketch.bloom_contains(
        probe, "item", direct.localCheckpoint(eager=True),
        m_bits=m, n_hashes=nh)
    got = {r.item: r.maybe_member for r in flagged.collect()}
    assert all(got[i] for i in range(120))  # no false negatives
    fps = [i for i in range(120, 400) if got[i]]
    assert len(fps) < 280  # not degenerate all-true

    out = sketch.bloom_blocklist_anti_join(probe, "item", both, "item",
                                           m_bits=m, n_hashes=nh)
    want = {r.item for r in probe.join(
        both.distinct(), on="item", how="left_anti").collect()}
    assert {r.item for r in out.collect()} == want
    assert set(out.columns) == set(probe.columns)


def test_bloom_contains_grouped_bitmap(spark):
    """Per-group bitmap probing (the streaming-maintained table shape):
    with group_cols each probe row joins its own group's words —
    verdicts must equal per-group ungrouped probes, with no row fanout;
    WITHOUT group_cols a grouped bitmap is rejected loudly (a word-only
    join would mix groups' bits)."""
    import pytest
    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import sketch

    m, nh = 1 << 10, 3
    rows = ([("a", i) for i in range(40)]
            + [("b", i) for i in range(30, 90)])
    df = spark.createDataFrame(rows, "grp string, item bigint")
    grouped = sketch.bloom_build(df, "item", ["grp"], m_bits=m,
                                 n_hashes=nh).localCheckpoint(eager=True)

    probe = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(120)],
        "grp string, item bigint")
    got = sketch.bloom_contains(probe, "item", grouped, m_bits=m,
                                n_hashes=nh, group_cols=["grp"])
    res = {(r.grp, r.item): r.maybe_member for r in got.collect()}
    assert len(res) == 240 and got.count() == 240  # no fanout
    for g, members in (("a", range(40)), ("b", range(30, 90))):
        single = sketch.bloom_contains(
            probe.where(F.col("grp") == g).select("item"), "item",
            grouped.where(F.col("grp") == g).select("word", "bits"),
            m_bits=m, n_hashes=nh)
        want = {r.item: r.maybe_member for r in single.collect()}
        assert {i: res[(g, i)] for i in range(120)} == want
        assert all(res[(g, i)] for i in members)  # no false negatives

    with pytest.raises(ValueError, match="group_cols"):
        sketch.bloom_contains(probe, "item", grouped, m_bits=m,
                              n_hashes=nh)


def test_profile_columns_counts_nulls_and_distincts(spark):
    from dbt_extrica_spark.extensions import profiling

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 5.0), (4, "b", None)],
        "k bigint, s string, d double")
    got = {r.col_name: r for r in
           profiling.profile_columns(df, ["k", "s", "d"]).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nulls == 0
    assert got["k"].n_distinct == 4
    assert (got["k"].min_str, got["k"].max_str) == ("1", "4")
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert got["d"].n_nulls == 2 and got["d"].n_distinct == 1
    import pytest
    with pytest.raises(ValueError, match="non-empty"):
        profiling.profile_columns(df, [])


def test_global_running_sum_guards_and_total(spark):
    """Shared-helper contract (second-review findings): float weights
    raise (a per-row bigint cast would silently truncate), working-name
    collisions raise (a caller's __w/__pid/out_col would be silently
    overwritten and dropped), and return_total hands back the driver
    prefix's grand total without another scan."""
    import pytest
    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions.cleaning import global_running_sum

    df = spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("w"),
        (F.col("id") / 2.0).alias("fw"))
    out, total = global_running_sum(df, ["id"], "w", return_total=True)
    rows = {r["id"]: r["__gsum"] for r in out.collect()}
    assert total == sum(2 * i for i in range(10))
    assert rows[0] == 0 and rows[9] == total
    with pytest.raises(ValueError, match="integral"):
        global_running_sum(df, ["id"], "fw")
    with pytest.raises(ValueError, match="collide"):
        global_running_sum(df.withColumnRenamed("w", "__w"), ["id"])
    with pytest.raises(ValueError, match="collide"):
        global_running_sum(df, ["id"], "w", out_col="fw")


def test_profile_columns_rejects_bad_names(spark):
    import pytest

    from dbt_extrica_spark.extensions import profiling

    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    with pytest.raises(ValueError, match="duplicate"):
        profiling.profile_columns(df, ["k", "k"])
    with pytest.raises(ValueError, match="not in the DataFrame"):
        profiling.profile_columns(df, ["k", "nope'; --"])


def test_priority_sample_rejects_bad_weights(spark):
    """NULL / zero / negative weights raise in-scan (a silently dropped
    row would skew the DLT estimator — same policy as mg_build)."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions import sampling

    for w in (None, 0.0, -1.5):
        df = spark.createDataFrame([(1, 2.0), (2, w)], "id int, w double")
        with _pytest.raises(Exception, match="priority_sample"):
            sampling.priority_sample(df, "id", "w", k=1).collect()
    with _pytest.raises(ValueError, match="k must be"):
        sampling.priority_sample(
            spark.createDataFrame([(1, 1.0)], "id int, w double"),
            "id", "w", k=0)


def test_priority_sample_small_population_exact(spark):
    """Population <= k: everything kept, tau = 0, est_weight = w exactly
    (sum of est_weight == the true total mass — the estimator's
    degenerate-exact case); WindowGroupLimit appears in the grouped
    plan (the rn <= k+1 filter must stay a partial top-k)."""
    from dbt_extrica_spark.extensions import sampling

    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, 7.0, "x"), (3, 11.0, "y")],
        "id int, w double, g string")
    out = sampling.priority_sample(df, "id", "w", k=10,
                                   group_cols=["g"])
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 3
    assert all(r.est_weight == r.w for r in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    glob = sampling.priority_sample(df, "id", "w", k=10)
    assert sum(r.est_weight for r in glob.collect()) == 23.0
    gplan = glob._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in gplan


def test_time_bucket_gapfill_grid_and_locf(spark):
    """Dense grid, filled flags, and locf carry-forward: gaps read the
    last observed aggregate (NULL before a series' first observation,
    carried past the data's max ts to the grid end); every key gets
    every bucket; raw agg columns stay NULL in gaps."""
    import datetime as dt

    from pyspark.sql import functions as F

    import pytest as _pytest

    from dbt_extrica_spark.extensions import timeseries

    rows = [
        # key "a": days 1 and 4 observed; 2, 3, 5 are gaps
        (dt.datetime(2024, 3, 1, 5), "a", 10.0),
        (dt.datetime(2024, 3, 1, 9), "a", 2.0),
        (dt.datetime(2024, 3, 4, 1), "a", 7.0),
        # key "b": first observation on day 3 -> days 1-2 locf NULL
        (dt.datetime(2024, 3, 3, 12), "b", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = timeseries.time_bucket_gapfill(
        df, "ts", "k", start="2024-03-01 00:00:00",
        end="2024-03-05 00:00:00", bucket="day",
        aggs={"n": F.count(F.lit(1)).cast("bigint"),
              "v_sum": F.sum(F.col("v").cast("decimal(18,4)"))
              .cast("double")},
        locf_cols=["v_sum"])
    got = {(r.k, r.bucket.day): (r.filled, r.n, r.v_sum, r.v_sum_locf)
           for r in out.collect()}
    assert len(got) == 10  # 2 keys x 5 days, dense
    assert got[("a", 1)] == (False, 2, 12.0, 12.0)
    assert got[("a", 2)] == (True, None, None, 12.0)   # gap: locf
    assert got[("a", 3)] == (True, None, None, 12.0)
    assert got[("a", 4)] == (False, 1, 7.0, 7.0)
    assert got[("a", 5)] == (True, None, None, 7.0)    # trailing fill
    assert got[("b", 1)] == (True, None, None, None)   # before first obs
    assert got[("b", 2)] == (True, None, None, None)
    assert got[("b", 3)] == (False, 1, 1.0, 1.0)

    with _pytest.raises(ValueError, match="bucket must be"):
        timeseries.time_bucket_gapfill(df, "ts", "k",
                                       start="2024-03-01", end="2024-03-05",
                                       bucket="minute")
    with _pytest.raises(ValueError, match="cols not in aggs"):
        timeseries.time_bucket_gapfill(
            df, "ts", "k", start="2024-03-01", end="2024-03-05",
            aggs={"n": F.count(F.lit(1))}, locf_cols=["nope"])


def test_mad_outliers_rows_guards_and_plan(spark):
    """return_rows yields exactly the flagged rows; guards reject bad
    k / empty groups; the whole computation shares ONE shuffle (every
    window sits on the group partitioning)."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions import profiling

    # group x: median 5, MAD 1 -> 100.0 flags (dev 95 > 3); nulls dropped
    rows = [(1, 4.0, "x"), (2, 5.0, "x"), (3, 6.0, "x"),
            (4, 5.0, "x"), (5, 100.0, "x"), (6, None, "x"),
            (7, 1.0, "y")]
    df = spark.createDataFrame(rows, "i int, v double, g string")
    summary = {r.g: (r.n, r.median, r.mad, r.n_outliers)
               for r in profiling.mad_outliers(
                   df, "v", "i", ["g"], k=3.0).collect()}
    assert summary["x"] == (5, 5.0, 1.0, 1)
    assert summary["y"] == (1, 1.0, 0.0, 0)  # singleton: exact, no flag

    flagged = profiling.mad_outliers(df, "v", "i", ["g"], k=3.0,
                                     return_rows=True).collect()
    assert [(r.g, r.i, r.v, r.deviation) for r in flagged] == \
        [("x", 5, 100.0, 95.0)]

    with _pytest.raises(ValueError, match="k must be"):
        profiling.mad_outliers(df, "v", "i", ["g"], k=0)
    with _pytest.raises(ValueError, match="group_cols"):
        profiling.mad_outliers(df, "v", "i", [])

    out = profiling.mad_outliers(df, "v", "i", ["g"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # windows + agg


def test_gram_matrix_exact_fast_and_pca(spark):
    """gram_matrix exact == hand numpy exactly at fixed-point
    granularity; fast (mapInPandas partials) ~= exact; pca_train
    matches a direct numpy PCA on the same rows (components up to the
    fixed deterministic sign, variances descending); pca_project
    reconstructs the numpy projection and ignores NULL vectors."""
    import numpy as np

    import pytest as _pytest

    from dbt_extrica_spark.extensions import similarity

    rng = np.random.RandomState(7)
    # anisotropic cloud so the spectrum is distinct
    base = rng.randn(40, 4) * np.array([3.0, 1.5, 0.5, 0.1])
    vecs = base @ np.linalg.qr(rng.randn(4, 4))[0]
    rows = [(i, [float(np.float32(x)) for x in v])
            for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows + [(99, None)],
                               "id bigint, v array<float>")

    xs = np.asarray([r[1] for r in rows], dtype=np.float64)
    exact = {(r.i, r.j): (r.g, r.si, r.n)
             for r in similarity.gram_matrix(df, "v").collect()}
    assert len(exact) == 10  # 4*5/2 upper triangle
    for (i, j), (g, si, n) in exact.items():
        assert n == 40
        want = np.floor(
            (xs[:, i] * xs[:, j]) * 1e12).sum() / 1e12
        assert g == want
        if i == j:
            assert si == np.floor(xs[:, i] * 1e12).sum() / 1e12
        else:
            assert si is None

    fast = {(r.i, r.j): (r.g, r.si, r.n)
            for r in similarity.gram_matrix(
                df.repartition(5), "v", method="fast").collect()}
    assert set(fast) == set(exact)
    for key in exact:
        assert fast[key][2] == 40
        assert abs(fast[key][0] - exact[key][0]) < 1e-6
    with _pytest.raises(ValueError, match="method"):
        similarity.gram_matrix(df, "v", method="nope")

    model = similarity.pca_train(df, "v", n_components=2)
    mu = xs.mean(axis=0)
    cov = (xs - mu).T @ (xs - mu) / len(xs)
    vals, eigv = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    np.testing.assert_allclose(model["mean"], mu, atol=1e-9)
    np.testing.assert_allclose(
        sorted(model["explained_variance"], reverse=True),
        vals[order], atol=1e-6)
    for ci, comp in enumerate(np.asarray(model["components"])):
        ref = eigv[:, order[ci]]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        np.testing.assert_allclose(comp, ref, atol=1e-6)

    proj = {r.id: np.asarray(r.pca)
            for r in similarity.pca_project(df, "id", "v",
                                            model).collect()}
    assert 99 not in proj and len(proj) == 40
    w = np.asarray(model["components"])
    for i, v in enumerate(xs):
        np.testing.assert_allclose(proj[i], (v - mu) @ w.T, atol=1e-9)
    # variance concentrates on the leading component
    p = np.asarray([proj[i] for i in range(40)])
    assert p[:, 0].var() > p[:, 1].var()

    with _pytest.raises(ValueError, match="n_components"):
        similarity.pca_train(df, "v", n_components=0)
    with _pytest.raises(ValueError, match="> dimension"):
        similarity.pca_train(df, "v", n_components=9)


def test_correlation_matrix_semantics_and_guards(spark):
    """Pearson matrix vs numpy on complete rows: NULL rows dropped,
    constant column yields NULL corr (not NaN), self-correlation ~1,
    sign tracks the planted relationships; guards reject bad input."""
    import numpy as np

    import pytest as _pytest

    from dbt_extrica_spark.extensions import profiling

    rng = np.random.RandomState(3)
    x = rng.uniform(1, 100, 50)
    rows = [(float(a), float(2.0 * a + rng.uniform(0, 5)),
             float(-a + rng.uniform(0, 10)), 7.0) for a in x]
    df = spark.createDataFrame(rows + [(None, 1.0, 1.0, 7.0)],
                               "a double, b double, c double, k double")
    got = {(r.col_i, r.col_j): (r.n, r.cov, r.corr)
           for r in profiling.correlation_matrix(
               df, ["a", "b", "c", "k"]).collect()}
    assert len(got) == 10
    assert all(v[0] == 50 for v in got.values())  # NULL row dropped

    arr = np.asarray(rows)
    ref = np.corrcoef(arr[:, :3].T)
    for (i, ci), (j, cj) in [((0, "a"), (1, "b")), ((0, "a"), (2, "c")),
                             ((1, "b"), (2, "c"))]:
        assert abs(got[(ci, cj)][2] - ref[i, j]) < 1e-6
    assert abs(got[("a", "a")][2] - 1.0) < 1e-9
    # constant column: variance 0 -> corr NULL, cov ~0
    assert got[("a", "k")][2] is None
    assert abs(got[("k", "k")][1]) < 1e-6
    assert got[("a", "b")][2] > 0.99 and got[("a", "c")][2] < -0.9

    with _pytest.raises(ValueError, match=">= 2"):
        profiling.correlation_matrix(df, ["a"])
    with _pytest.raises(ValueError, match="duplicate"):
        profiling.correlation_matrix(df, ["a", "a"])
    with _pytest.raises(ValueError, match="not in the DataFrame"):
        profiling.correlation_matrix(df, ["a", "nope"])


def test_r13_review_guards(spark):
    """Pinning tests for the late-r13 review findings: gapfill filled
    flag on NULL-aggregate observed buckets + start/end validation,
    priority NaN-weight raise, gram_matrix NULL-element/empty-vector
    raise, pca_project non-bigint ids, mad_outliers name collisions."""
    import datetime as dt
    import math

    import pytest as _pytest

    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import (profiling, sampling,
                                              similarity, timeseries)

    # 1. an observed bucket whose aggregate is legitimately NULL is NOT
    # a gap: filled=False, while locf STILL carries the last non-null
    # value over it (TimescaleDB locf semantics) — only the filled
    # flag distinguishes the observed-NULL bucket from a true gap
    rows = [(dt.datetime(2024, 3, 1, 5), "a", 1.0),
            (dt.datetime(2024, 3, 2, 5), "a", None)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = {r.bucket.day: (r.filled, r.m_locf)
           for r in timeseries.time_bucket_gapfill(
               df, "ts", "k", start="2024-03-01", end="2024-03-03",
               aggs={"m": F.max("v")}).collect()}
    assert out[1] == (False, 1.0)
    assert out[2] == (False, 1.0)   # observed, not filled; locf carries
    assert out[3] == (True, 1.0)    # the real gap
    # start/end validation: malformed and reversed ranges fail UP FRONT
    with _pytest.raises(ValueError, match="ISO timestamps"):
        timeseries.time_bucket_gapfill(df, "ts", "k",
                                       start="x') --", end="2024-03-03")
    with _pytest.raises(ValueError, match="after end"):
        timeseries.time_bucket_gapfill(df, "ts", "k",
                                       start="2024-03-09", end="2024-03-03")

    # 2. NaN weight raises (it would otherwise SORT FIRST and poison
    # the estimator)
    dfn = spark.createDataFrame([(1, 2.0), (2, float("nan"))],
                                "id int, w double")
    with _pytest.raises(Exception, match="priority_sample"):
        sampling.priority_sample(dfn, "id", "w", k=1).collect()

    # 3. gram_matrix: NULL element and empty vector raise; whole-NULL
    # vectors are still just excluded
    ok = spark.createDataFrame([(1, [1.0, 2.0]), (2, None)],
                               "id int, v array<double>")
    assert similarity.gram_matrix(ok, "v").count() == 3
    for bad in ([(1, [1.0, None])], [(1, [])]):
        dfb = spark.createDataFrame(bad, "id int, v array<double>")
        with _pytest.raises(Exception, match="gram_matrix"):
            similarity.gram_matrix(dfb, "v").collect()
        with _pytest.raises(Exception, match="gram_matrix"):
            similarity.gram_matrix(dfb, "v", method="fast").collect()

    # 4. pca_project keeps a non-bigint id column
    sdf = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [1.0, 1.0])],
        "doc string, v array<double>")
    model = similarity.pca_train(sdf, "v", n_components=1)
    got = {r.doc: r.pca for r in
           similarity.pca_project(sdf, "doc", "v", model).collect()}
    assert set(got) == {"a", "b", "c"}
    assert all(not math.isnan(p[0]) for p in got.values())

    # 5. mad_outliers rejects reserved-name collisions and dup groups
    dmm = spark.createDataFrame([(1, 2.0, "x")],
                                "i int, median double, g string")
    with _pytest.raises(ValueError, match="collide with reserved"):
        profiling.mad_outliers(dmm, "median", "i", ["g"])
    dg = spark.createDataFrame([(1, 2.0, "x")], "i int, v double, g string")
    with _pytest.raises(ValueError, match="duplicate group_cols"):
        profiling.mad_outliers(dg, "v", "i", ["g", "g"])


def test_r14_advice_guards(spark):
    """Pin the round-14 ADVICE fixes: mixed-dimension vectors raise in
    the gram/PCA family (scan-side pin + pca_train n-consistency),
    priority_sample/priority_state reject reserved-name collisions,
    gapfill rejects key/ts names on its reserved set and excludes
    NULL-timestamp rows explicitly."""
    import datetime as dt

    import pytest as _pytest

    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import (sampling, similarity,
                                              timeseries)

    # 1. mixed vector dimensions raise in BOTH gram modes (the scan
    # guard pins the first observed dimension) — previously exact mode
    # emitted per-cell counts that disagree and pca_train built a
    # silently wrong covariance off an arbitrary cell's n
    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], "id int, v array<double>")
    with _pytest.raises(Exception, match="shared dimension|gram_matrix"):
        similarity.gram_matrix(mixed, "v").collect()
    with _pytest.raises(Exception, match="shared dimension|gram_matrix"):
        similarity.gram_matrix(mixed, "v", method="fast").collect()
    with _pytest.raises(Exception, match="shared dimension|gram_matrix"):
        similarity.pca_train(mixed, "v", n_components=1)

    # pca_train's belt-and-braces check: a foreign state whose cells
    # disagree on n raises instead of picking rows[0].n arbitrarily
    orig = similarity.gram_matrix
    try:
        bad_state = spark.createDataFrame(
            [(0, 0, 1.0, 1.0, 3), (0, 1, 1.0, None, 2),
             (1, 1, 1.0, 1.0, 3)],
            "i int, j int, g double, si double, n bigint")
        similarity.gram_matrix = lambda *a, **k: bad_state
        with _pytest.raises(ValueError, match="per-cell counts disagree"):
            similarity.pca_train(mixed, "v", n_components=1)
    finally:
        similarity.gram_matrix = orig

    # single-dimension input still works end-to-end after the guard
    ok = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None)],
        "id int, v array<double>")
    assert similarity.gram_matrix(ok, "v").count() == 3
    m = similarity.pca_train(ok, "v", n_components=1)
    assert m["n"] == 2

    # 2. priority_sample: reserved output names collide loudly instead
    # of being clobbered by withColumn
    for col in ("priority", "sample_rank", "est_weight"):
        dfp = spark.createDataFrame([(1, 2.0, 5.0)],
                                    f"id int, w double, {col} double")
        with _pytest.raises(ValueError, match="collide with reserved"):
            sampling.priority_sample(dfp, "id", "w", k=1)
    # weight_col named 'priority' would read priorities as weights
    dfq = spark.createDataFrame([(1, 2.0)], "id int, priority double")
    with _pytest.raises(ValueError, match="collide with reserved"):
        sampling.priority_sample(dfq, "id", "priority", k=1)
    with _pytest.raises(ValueError, match="reserved"):
        sampling.priority_state(dfq, "id", "priority", k=1)
    dfg = spark.createDataFrame([(1, 2.0, "x")],
                                "id int, w double, weight string")
    with _pytest.raises(ValueError, match="reserved"):
        sampling.priority_state(dfg, "id", "w", k=1, group_cols=["weight"])
    # clean input still samples
    dfc = spark.createDataFrame([(i, float(i)) for i in range(1, 6)],
                                "id int, w double")
    assert sampling.priority_sample(dfc, "id", "w", k=2).count() == 2

    # 3. gapfill rejects key_col/ts_col on the reserved set
    rows = [(dt.datetime(2024, 3, 1, 5), "a", 1.0),
            (None, "a", 9.0)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    with _pytest.raises(ValueError, match="reserved"):
        timeseries.time_bucket_gapfill(
            df.withColumnRenamed("k", "bucket"), "ts", "bucket",
            start="2024-03-01", end="2024-03-02")
    with _pytest.raises(ValueError, match="reserved"):
        timeseries.time_bucket_gapfill(
            df.withColumnRenamed("ts", "filled"), "filled", "k",
            start="2024-03-01", end="2024-03-02")
    # NULL-timestamp rows are excluded: the grid equals the one built
    # without them (the 9.0 value never surfaces anywhere)
    out = timeseries.time_bucket_gapfill(
        df, "ts", "k", start="2024-03-01", end="2024-03-02",
        aggs={"m": F.max("v")}).collect()
    assert sorted((r.bucket.day, r.filled, r.m) for r in out) == [
        (1, False, 1.0), (2, True, None)]


def test_roc_auc_semantics(spark):
    """Exact AUC vs an all-pairs brute force (ties half), grouped mode,
    single-class NULL, and the guard raises."""
    import random

    import pytest as _pytest

    from dbt_extrica_spark.extensions.evaluation import roc_auc

    random.seed(7)
    rows = [(random.choice([0.1, 0.3, 0.5, 0.7, 0.9]),
             random.randint(0, 1), random.choice("ab"))
            for _ in range(200)]

    def brute(rs):
        pos = [s for s, y, _ in rs if y == 1]
        neg = [s for s, y, _ in rs if y == 0]
        u = sum(1.0 if p > n else 0.5 if p == n else 0.0
                for p in pos for n in neg)
        return u / (len(pos) * len(neg))

    df = spark.createDataFrame(rows, "s double, y int, g string")
    got = roc_auc(df, "s", "y").collect()[0]
    assert got.auc == brute(rows)
    assert got.n_pos + got.n_neg == 200
    by_g = {r.g: r.auc for r in
            roc_auc(df, "s", "y", group_cols=["g"]).collect()}
    for g in "ab":
        assert by_g[g] == brute([r for r in rows if r[2] == g])
    one = spark.createDataFrame([(0.5, 1)], "s double, y int")
    assert roc_auc(one, "s", "y").collect()[0].auc is None
    with _pytest.raises(Exception, match="roc_auc"):
        roc_auc(spark.createDataFrame([(0.5, 2)], "s double, y int"),
                "s", "y").collect()
    with _pytest.raises(Exception, match="roc_auc"):
        roc_auc(spark.createDataFrame([(None, 1)], "s double, y int"),
                "s", "y").collect()
    with _pytest.raises(ValueError, match="reserved"):
        roc_auc(df.withColumnRenamed("g", "auc"), "s", "y",
                group_cols=["auc"])


def test_chi2_drift_matches_replay(spark):
    """chi2_drift vs a pure-Python replay of the breakpoint rule and the
    chi-square arithmetic; self-drift is exactly 0; guards raise."""
    import math
    import random
    from collections import Counter

    import pytest as _pytest

    from dbt_extrica_spark.extensions.profiling import chi2_drift

    random.seed(3)
    ref = [(i, random.gauss(0, 1)) for i in range(500)]
    cur = [(i, random.gauss(0.4, 1.2)) for i in range(300)]
    rdf = spark.createDataFrame(ref, "i int, v double")
    cdf = spark.createDataFrame(cur, "i int, v double")
    out = chi2_drift(rdf, cdf, "v", "i", buckets=5).collect()

    vs = sorted(v for _, v in ref)
    n, B = len(vs), 5
    bps = sorted({vs[-(-i * n // B) - 1] for i in range(1, B)})

    def b(x):
        return sum(1 for p in bps if p < x)

    rc = Counter(b(v) for _, v in ref)
    cc = Counter(b(v) for _, v in cur)
    rt, ct = sum(rc.values()), sum(cc.values())
    assert {r.bucket: (r.ref_n, r.cur_n) for r in out} == \
        {k: (rc[k], cc[k]) for k in range(len(bps) + 1)}
    chi = 0.0
    for k in range(len(bps) + 1):
        bt = rc[k] + cc[k]
        if bt == 0:
            continue
        er, ec = bt * rt / (rt + ct), bt * ct / (rt + ct)
        chi += (rc[k] - er) ** 2 / er + (cc[k] - ec) ** 2 / ec
    assert math.isclose(sum(r.chi2_part for r in out), chi,
                        rel_tol=1e-12)
    assert sum(r.chi2_part for r in
               chi2_drift(rdf, rdf, "v", "i", buckets=5).collect()) == 0.0
    with _pytest.raises(ValueError, match="buckets"):
        chi2_drift(rdf, cdf, "v", "i", buckets=1)
    empty = spark.createDataFrame([], "i int, v double")
    with _pytest.raises(ValueError, match="no non-null"):
        chi2_drift(empty, cdf, "v", "i")


def test_chi2_drift_tie_heavy_boundaries(spark):
    """Tie-heavy case for the r16 histogram boundary route (ADVICE r16):
    small integer values with heavy repetition and n not divisible by
    buckets, so one value's cumulative span covers SEVERAL breakpoint
    ranks — those must collapse to one boundary literal, and the bucket
    counts must still match the pure-Python row-rank replay."""
    import random
    from collections import Counter

    from dbt_extrica_spark.extensions.profiling import chi2_drift

    random.seed(7)
    # 5 distinct values, wildly skewed multiplicities, n=103 (prime)
    vals = ([1] * 60 + [2] * 25 + [3] * 10 + [4] * 7 + [5])
    random.shuffle(vals)
    assert len(vals) == 103
    ref = [(i, v) for i, v in enumerate(vals)]
    cur = [(i, random.choice([1, 2, 3, 4, 5])) for i in range(40)]
    rdf = spark.createDataFrame(ref, "i int, v int")
    cdf = spark.createDataFrame(cur, "i int, v int")
    B = 10  # many breakpoint ranks land inside value 1's span
    out = chi2_drift(rdf, cdf, "v", "i", buckets=B).collect()

    vs = sorted(v for _, v in ref)
    n = len(vs)
    bps = sorted({vs[-(-i * n // B) - 1] for i in range(1, B)})
    # the collapse actually happens in this fixture: far fewer distinct
    # boundaries than breakpoint ranks
    assert len(bps) < B - 1

    def b(x):
        return sum(1 for p in bps if p < x)

    rc = Counter(b(v) for _, v in ref)
    cc = Counter(b(v) for _, v in cur)
    assert {r.bucket: (r.ref_n, r.cur_n) for r in out} == \
        {k: (rc[k], cc[k]) for k in range(len(bps) + 1)}
    # self-drift still exactly zero under ties
    assert sum(r.chi2_part for r in
               chi2_drift(rdf, rdf, "v", "i", buckets=B).collect()) == 0.0


def test_ams_sketch_replay_merge_and_estimate(spark):
    """AMS cells vs an independent hashlib-md5 replay; merge is
    bit-exact under arbitrary splits; the estimate is the lower median
    of group mean squares; guards raise."""
    import hashlib
    import random
    from collections import Counter

    import pytest as _pytest

    from dbt_extrica_spark.extensions import sketch as sk

    random.seed(11)
    items = [random.choice([f"k{j}" for j in range(30)])
             for _ in range(1000)]
    df = spark.createDataFrame([(x, i % 3) for i, x in enumerate(items)],
                               "item string, b int")

    def sign(item, d):
        h = int(hashlib.md5(f"{item}@{d // 32}".encode())
                .hexdigest()[:8], 16)
        return ((h >> (d % 32)) % 2) * 2 - 1

    want = {d: sum(sign(x, d) for x in items) for d in range(16)}
    st = sk.ams_build(df, "item", r=16)
    assert {r.d: r.z for r in st.collect()} == want

    merged = sk.ams_merge(
        sk.ams_build(df.where("b = 0"), "item", r=16)
        .unionByName(sk.ams_build(df.where("b = 1"), "item", r=16))
        .unionByName(sk.ams_build(df.where("b = 2"), "item", r=16)))
    assert {r.d: r.z for r in merged.collect()} == want

    est = sk.ams_f2_estimate(st, means=4).collect()[0]
    gs = 4
    sums = sorted(sum(want[d] ** 2 for d in range(g * gs, (g + 1) * gs))
                  for g in range(4))
    assert est.f2_est == sums[(4 + 1) // 2 - 1] / gs
    assert est.r == 16
    # estimator is unbiased around the true F2 (loose sanity band)
    f2 = sum(c * c for c in Counter(items).values())
    assert 0.05 * f2 < est.f2_est < 20 * f2

    with _pytest.raises(Exception, match="ams_build"):
        sk.ams_build(spark.createDataFrame([(None,)], "item string"),
                     "item", r=4).collect()
    with _pytest.raises(ValueError, match="r must be"):
        sk.ams_build(df, "item", r=0)
    with _pytest.raises(Exception, match="fewer than means"):
        sk.ams_f2_estimate(sk.ams_build(df, "item", r=2),
                           means=4).collect()


def test_gapfill_interpolate_semantics(spark):
    """Linear interpolation: exact fills between observations, NULL
    outside the observed range, observed buckets keep their value, and
    the validation guards raise."""
    import datetime as dt

    import pytest as _pytest

    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import timeseries

    rows = [(dt.datetime(2024, 3, 1, 5), "a", 2.0),
            (dt.datetime(2024, 3, 4, 5), "a", 8.0),
            (dt.datetime(2024, 3, 2, 5), "b", 1.0)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = {(r.k, r.bucket.day): r.m_interp
           for r in timeseries.time_bucket_gapfill(
               df, "ts", "k", start="2024-03-01", end="2024-03-05",
               aggs={"m": F.max("v")}, locf_cols=[],
               interpolate_cols=["m"]).collect()}
    assert out[("a", 1)] == 2.0 and out[("a", 4)] == 8.0
    assert out[("a", 2)] == 4.0 and out[("a", 3)] == 6.0
    assert out[("a", 5)] is None           # beyond the last observation
    assert out[("b", 1)] is None and out[("b", 3)] is None
    with _pytest.raises(ValueError, match="locf/interpolate"):
        timeseries.time_bucket_gapfill(
            df, "ts", "k", start="2024-03-01", end="2024-03-02",
            aggs={"m": F.max("v")}, interpolate_cols=["nope"])
    with _pytest.raises(ValueError, match="_interp"):
        timeseries.time_bucket_gapfill(
            df, "ts", "k", start="2024-03-01", end="2024-03-02",
            aggs={"m": F.max("v"), "m_interp": F.min("v")},
            interpolate_cols=["m"])


def test_chi2_terms_hand_computed(spark):
    """chi2_terms against a hand-computed 2x2 cell and the presence
    (not frequency) contingency contract."""
    from dbt_extrica_spark.extensions.textstats import chi2_terms

    rows = [(1, "the cat sat on the mat", "en"),
            (2, "the dog ate the cat", "en"),
            (3, "le chat et le chien", "fr"),
            (4, "le chien mange", "fr"),
            (5, "cat dog cat dog", "en")]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = {(r.label, r.term): r for r in
           chi2_terms(df, "doc_id", "text", "lang",
                      top_t=3, min_df=1).collect()}
    # 'le' x fr: a=2, b=0, c=0, d=3, N=5 -> 5*(2*3)^2/(2*3*2*3) = 5
    r = out[("fr", "le")]
    assert (r.a, r.term_df, r.label_df, r.chi2) == (2, 2, 2, 5.0)
    # presence: 'cat' appears twice in doc 5 but counts one doc
    assert out[("en", "cat")].a == 3


def test_rake_keywords_canonical(spark):
    """RAKE on the canonical Rose et al. abstract sentence: punctuation
    bounds phrases ('equations, strict' must split) and 'linear
    diophantine equations' scores exactly 9.0 — each word has freq 1
    and degree 3 on this slice, matching the figure-1 score in the RAKE
    paper."""
    from dbt_extrica_spark.extensions.textstats import rake_keywords

    rows = [(2, "Criteria of compatibility of a system of linear "
                "Diophantine equations, strict inequations, and "
                "nonstrict inequations are considered.")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.phrase: (r.n_words, r.score)
           for r in rake_keywords(df, "doc_id", "text", top_t=4).collect()}
    assert got["linear diophantine equations"] == (3, 9.0)
    assert got["strict inequations"] == (2, 5.0)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stopword"):
        rake_keywords(df, "doc_id", "text", stopwords=())


def test_trend_ols_matches_numpy(spark):
    """Closed-form OLS vs numpy.polyfit; constant-x/y degeneracies are
    NULL (not NaN); reserved-name guard raises."""
    import numpy as np
    import pytest as _pytest

    from dbt_extrica_spark.extensions.timeseries import trend_ols

    rows = [(float(i), 2.5 * i + 1.0 + (0.5 if i % 2 else -0.5), "a")
            for i in range(20)]
    rows += [(float(i), 7.0, "b") for i in range(10)]      # constant y
    rows += [(3.0, float(i), "c") for i in range(10)]      # constant x
    df = spark.createDataFrame(rows, "x double, y double, g string")
    got = {r.g: r for r in trend_ols(df, "x", "y", ["g"]).collect()}
    want = np.polyfit([r[0] for r in rows if r[2] == "a"],
                      [r[1] for r in rows if r[2] == "a"], 1)
    assert abs(got["a"].slope - want[0]) < 1e-9
    assert abs(got["a"].intercept - want[1]) < 1e-9
    assert 0.99 < got["a"].r2 < 1.0
    assert got["b"].slope == 0.0 and got["b"].r2 is None
    assert got["c"].slope is None and got["c"].intercept is None
    with _pytest.raises(ValueError, match="collide"):
        trend_ols(df.withColumnRenamed("g", "slope"), "x", "y", ["slope"])


def test_calibration_curve_semantics(spark):
    """Equi-depth score buckets: counts replay the breakpoint rule, a
    well-calibrated synthetic tracks pos_rate ~ mean_score, label guard
    raises."""
    import math
    import random
    from collections import Counter

    import pytest as _pytest

    from dbt_extrica_spark.extensions.evaluation import calibration_curve

    random.seed(5)
    rows = [(random.random(),) for _ in range(1000)]
    rows = [(s, 1 if random.random() < s else 0) for (s,) in rows]
    df = spark.createDataFrame(rows, "s double, y int")
    out = calibration_curve(df, "s", "y", buckets=5).collect()
    vs = sorted(s for s, _ in rows)
    n, B = len(vs), 5
    ks = sorted({math.ceil(i * n / B) for i in range(1, B)})
    bps = sorted({vs[k - 1] for k in ks})
    c = Counter(sum(1 for p in bps if p < s) for s, _ in rows)
    assert {r.bucket: r.n for r in out} == dict(c)
    assert all(abs(r.pos_rate - r.mean_score) < 0.12 for r in out)
    with _pytest.raises(Exception, match="calibration_curve"):
        calibration_curve(
            spark.createDataFrame([(0.5, 2)], "s double, y int"),
            "s", "y").collect()
    with _pytest.raises(ValueError, match="buckets"):
        calibration_curve(df, "s", "y", buckets=1)


def test_diversity_simpson_semantics(spark):
    """Balanced 2-category group reads effective=2.0; a 99/1 group
    reads ~1.02; NULL categories excluded; reserved-name guard."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.profiling import diversity_simpson

    rows = ([("a", "x")] * 50 + [("a", "y")] * 50
            + [("b", "x")] * 99 + [("b", "y")] * 1 + [("b", None)] * 3)
    df = spark.createDataFrame(rows, "g string, cat string")
    got = {r.g: r for r in
           diversity_simpson(df, "cat", ["g"]).collect()}
    assert (got["a"].n, got["a"].simpson,
            got["a"].effective_categories) == (100, 0.5, 2.0)
    assert got["b"].n == 100 and got["b"].simpson == 0.9802
    with _pytest.raises(ValueError, match="reserved"):
        diversity_simpson(df.withColumnRenamed("g", "simpson"), "cat",
                          ["simpson"])


def test_ngram_oov_rate_semantics(spark):
    """In-vocab text scores 0, gibberish scores 1, min_count prunes
    hapax reference grams, presence-based (repetition does not inflate)."""
    from dbt_extrica_spark.extensions.textstats import ngram_oov_rate

    ref = spark.createDataFrame(
        [("the quick brown fox",), ("the quick dog",)], "text string")
    docs = spark.createDataFrame(
        [(1, "the quick"), (2, "zzqxjvvkpw")],
        "doc_id int, text string")
    got = {r.doc_id: r for r in ngram_oov_rate(
        docs, "doc_id", "text", ref, min_count=1).collect()}
    assert got[1].oov_rate == 0.0   # exact substring of a ref doc
    assert got[2].oov_rate == 1.0
    # min_count=2 keeps only grams in BOTH ref docs — replay in python
    def sh(t):
        t = t.lower()
        return {t[i:i + 3] for i in range(max(len(t) - 2, 1))}

    vocab2 = sh("the quick brown fox") & sh("the quick dog")
    doc1 = sh("the quick")
    strict = {r.doc_id: r for r in ngram_oov_rate(
        docs, "doc_id", "text", ref, min_count=2).collect()}
    assert strict[1].n_grams == len(doc1)
    assert strict[1].n_oov == len(doc1 - vocab2)


def test_fellegi_sunter_score_semantics(spark):
    """FS likelihood ratios: agreement multiplies m/u, disagreement
    (1-m)/(1-u), NULL is factor 1; thresholds classify; guards raise."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.linkage import (
        equality_blocking_pairs, fellegi_sunter_score)

    recs = [(1, "x", "555", "NY"), (2, "x", "555", "NY"),
            (3, "x", "777", None), (4, "y", "555", "LA")]
    df = spark.createDataFrame(recs, "id int, blk string, phone string,"
                                     " city string")
    pairs = equality_blocking_pairs(df, "id", ["blk"])
    assert sorted((r.id_a, r.id_b) for r in pairs.collect()) == \
        [(1, 2), (1, 3), (2, 3)]
    out = {(r.id_a, r.id_b): r for r in fellegi_sunter_score(
        pairs, df, "id", [("phone", 0.9, 0.1), ("city", 0.8, 0.2)],
        upper=10, lower=0.5).collect()}
    assert out[(1, 2)].score == 36.0           # 9 * 4
    assert out[(1, 2)].decision == "match"
    assert abs(out[(1, 3)].score - (0.1 / 0.9)) < 1e-15  # city NULL = 1
    assert out[(1, 3)].decision == "non_match"
    assert out[(1, 3)].n_agreements == 0
    with _pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter_score(pairs, df, "id", [("phone", 0.1, 0.9)])
    with _pytest.raises(ValueError, match="lower < upper"):
        fellegi_sunter_score(pairs, df, "id", [("phone", 0.9, 0.1)],
                             upper=1, lower=2)
    with _pytest.raises(ValueError, match="block columns"):
        equality_blocking_pairs(df, "id", [])


def test_bucketed_join_is_shuffle_free(spark):
    """write_bucketed: two tables bucketed identically on the join key
    plan a SortMergeJoin with ZERO Exchange anywhere in the join
    subtree (the bucketed scans ARE the distribution), and the bucketed
    result equals the plain shuffle join row-for-row. Also the guards."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions import layout

    rows_a = [(i, f"s{i % 7}") for i in range(500)]
    rows_b = [(i % 300, float(i)) for i in range(900)]
    a = spark.createDataFrame(rows_a, "k bigint, status string")
    b = spark.createDataFrame(rows_b, "k bigint, v double")
    layout.write_bucketed(a, "bkt_a_test", ["k"], 4, sort_cols=["k"])
    layout.write_bucketed(
        b.withColumnRenamed("k", "bk"), "bkt_b_test", ["bk"], 4,
        sort_cols=["bk"])
    try:
        ta = spark.table("bkt_a_test").hint("merge")
        tb = spark.table("bkt_b_test")
        joined = ta.join(tb, on=[ta.k == tb.bk])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # the co-located contract
        got = sorted((r.k, r.status, r.v) for r in joined.collect())
        want = sorted((ra[0], ra[1], rb[1]) for ra in rows_a
                      for rb in rows_b if ra[0] == rb[0])
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a_test")
        spark.sql("DROP TABLE IF EXISTS bkt_b_test")
    with _pytest.raises(ValueError, match="n_buckets"):
        layout.write_bucketed(a, "x", ["k"], 0)
    with _pytest.raises(ValueError, match="not in the DataFrame"):
        layout.write_bucketed(a, "x", ["nope"], 4)


def test_r15_advice_guards(spark):
    """Pin the round-15 ADVICE fixes: fractional labels raise BEFORE the
    bigint cast in roc_auc/calibration_curve, morton_key raises
    ValueError (not assert) on bad shapes, interpolation timestamps are
    session-timezone invariant across a DST transition, and
    equality_blocking_pairs raises/caps oversized blocks by contract."""
    import datetime as dt

    import pytest as _pytest

    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import (evaluation, layout, linkage,
                                              timeseries)

    # 1. a fractional label (0.9 -> bigint 0) used to pass the post-cast
    # isin(0,1) guard silently; the raw-before-cast check raises
    frac = spark.createDataFrame(
        [(0.2, 0.0), (0.8, 1.0), (0.5, 0.9)], "s double, y double")
    with _pytest.raises(Exception, match="roc_auc"):
        evaluation.roc_auc(frac, "s", "y").collect()
    with _pytest.raises(Exception, match="calibration_curve"):
        evaluation.calibration_curve(frac, "s", "y", buckets=2).collect()
    # clean 0/1 labels (int-typed) still work through the double guard
    ok = spark.createDataFrame(
        [(0.2, 0), (0.8, 1), (0.5, 1), (0.1, 0)], "s double, y int")
    assert evaluation.roc_auc(ok, "s", "y").collect()[0].auc == 1.0

    # 2. morton_key guard convention: ValueError, alive under -O
    with _pytest.raises(ValueError, match="two dimensions"):
        layout.morton_key(["a"])
    with _pytest.raises(ValueError, match="BIGINT"):
        layout.morton_key(["a", "b", "c"], bits=21)

    # 3. interpolation is timezone invariant: across the US spring-
    # forward day (2024-03-10) day buckets are 23/25 h apart as
    # INSTANTS, but the calendar-field epoch keeps uniform 86400 s
    # steps, so a 0->3 ramp interpolates to exactly 1.0 / 2.0
    prior_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # timestamps parsed FROM STRINGS inside SQL so the session tz
        # (not the Python process tz) interprets the wall-clock values
        df = spark.sql("""
            SELECT to_timestamp(c0) AS ts, c1 AS k, c2 AS v FROM VALUES
              ('2024-03-09 00:30:00', 'k', 0.0d),
              ('2024-03-12 00:30:00', 'k', 3.0d) AS t(c0, c1, c2)""")
        out = timeseries.time_bucket_gapfill(
            df, "ts", "k", start="2024-03-09", end="2024-03-12",
            aggs={"m": F.max("v")}, locf_cols=[],
            interpolate_cols=["m"]).collect()
        got = {r.bucket.day: r.m_interp for r in out}
        assert got == {9: 0.0, 10: 1.0, 11: 2.0, 12: 3.0}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior_tz)

    # 4. equality_blocking_pairs oversize contract: one block holding
    # ~30% of records raises under the default policy, caps (hash-
    # deterministically) under oversize='cap', and small blocks pass
    # through either way untouched
    rows = [(i, "hot") for i in range(30)] + [
        (100 + i, f"b{i}") for i in range(70)]
    recs = spark.createDataFrame(rows, "id bigint, blk string")
    with _pytest.raises(Exception, match="max_block_size"):
        linkage.equality_blocking_pairs(
            recs, "id", ["blk"], max_block_size=10).collect()
    capped = linkage.equality_blocking_pairs(
        recs, "id", ["blk"], max_block_size=10, oversize="cap")
    rows_c = capped.collect()
    assert len(rows_c) == 45  # C(10,2); singleton blocks yield no pairs
    # deterministic: same subsample on rerun
    assert sorted((r.id_a, r.id_b) for r in capped.collect()) == \
        sorted((r.id_a, r.id_b) for r in rows_c)
    # under the cap nothing changes vs the uncapped pairs
    small = linkage.equality_blocking_pairs(
        recs, "id", ["blk"], max_block_size=30)
    assert small.count() == 30 * 29 // 2
    with _pytest.raises(ValueError, match="oversize"):
        linkage.equality_blocking_pairs(recs, "id", ["blk"],
                                        max_block_size=5, oversize="drop")


def test_ks_test_semantics(spark):
    """Identical samples D=0; disjoint D=1; hand case with the
    smallest-value tie-break; the sizes land as literals."""
    from dbt_extrica_spark.extensions.profiling import ks_test

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    r = ks_test(a, a, "v").collect()[0]
    assert (r.d_stat, r.n_ref, r.n_cur) == (0.0, 10, 10)
    b = spark.createDataFrame([(float(i + 100),) for i in range(5)],
                              "v double")
    r = ks_test(a, b, "v").collect()[0]
    assert r.d_stat == 1.0 and r.at_value == 9.0
    # hand case: ref {1,2,3,4}, cur {3,4,5,6}: max gap at v=2 (2/4 - 0)
    c = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]],
                              "v double")
    d = spark.createDataFrame([(v,) for v in [3.0, 4.0, 5.0, 6.0]],
                              "v double")
    r = ks_test(c, d, "v").collect()[0]
    assert r.d_stat == 0.5 and r.at_value == 2.0
    # NULLs excluded, not counted
    e = spark.createDataFrame([(1.0,), (None,)], "v double")
    assert ks_test(e, e, "v").collect()[0].n_ref == 1


def test_benford_digits_semantics(spark):
    """Hand-computed digit shares; sub-1 / zero / NULL / negative-
    magnitude handling per contract."""
    from dbt_extrica_spark.extensions.profiling import (BENFORD_P,
                                                        benford_digits)

    rows = [(123.4,), (19.0,), (1.5,), (250.0,), (0.7,), (None,),
            (-34.0,), (0.0,), (9000.0,)]
    out = {r.digit: r for r in benford_digits(
        spark.createDataFrame(rows, "v double"), "v").collect()}
    assert len(out) == 9
    # digits: 123->1, 19->1, 1.5->1, 250->2, -34->3, 9000->9
    assert out[1].n == 3 and out[2].n == 1 and out[3].n == 1
    assert out[9].n == 1 and out[4].n == 0
    assert out[1].share == 3.0 / 6.0
    assert out[1].expected == BENFORD_P[1]
    assert out[1].dev == 3.0 / 6.0 - BENFORD_P[1]
    assert out[4].share == 0.0


def test_classification_report_semantics(spark):
    """Per-class confusion stats incl. the hallucinated-class row; NULL
    pred raises; grouped mode splits correctly."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.evaluation import (
        classification_report)

    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"),
            ("d", "d")]
    df = spark.createDataFrame(rows, "p string, y string")
    got = {r["class"]: r for r in
           classification_report(df, "p", "y").collect()}
    assert (got["b"].n_true, got["b"].n_pred, got["b"].tp) == (3, 2, 2)
    assert got["b"].precision == 1.0 and got["b"].recall == 2.0 / 3.0
    assert got["b"].f1 == 2.0 * 2.0 / 5.0
    # hallucinated class: predicted once, never true
    assert (got["c"].n_true, got["c"].n_pred) == (0, 1)
    assert got["c"].precision == 0.0 and got["c"].recall is None
    bad = spark.createDataFrame([("a", None)], "p string, y string")
    with _pytest.raises(Exception, match="classification_report"):
        classification_report(bad, "p", "y").collect()
    with _pytest.raises(ValueError, match="collide"):
        classification_report(df.withColumnRenamed("y", "tp"),
                              "p", "tp", group_cols=["tp"])


def test_rank_metrics_semantics(spark):
    """Hand-computed AP/RR/P@k; duplicate ranks raise; invalid rel and
    k bounds raise."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.evaluation import rank_metrics

    df = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 0), (1, 3, 1), (2, 1, 0), (2, 2, 0)],
        "q int, rank int, rel int")
    got = {r.query: r for r in
           rank_metrics(df, "q", "rank", "rel", k=3).collect()}
    # ap = 5/6 as ONE division (the naive (1 + 2/3)/2 float chain is a
    # ulp below the correctly-rounded single-division value)
    lcm = 232792560
    assert got[1].ap == (1 * lcm + 2 * (lcm // 3)) / (lcm * 2.0)
    assert got[1].rr == 1.0 and got[1].p_at_k == 2.0 / 3.0
    assert got[2].ap is None and got[2].rr is None and got[2].p_at_k == 0.0
    dup = spark.createDataFrame([(1, 1, 1), (1, 1, 0)],
                                "q int, rank int, rel int")
    with _pytest.raises(Exception, match="duplicate rank"):
        rank_metrics(dup, "q", "rank", "rel", k=3).collect()
    frac = spark.createDataFrame([(1, 1, 2)], "q int, rank int, rel int")
    with _pytest.raises(Exception, match="rank_metrics"):
        rank_metrics(frac, "q", "rank", "rel", k=3).collect()
    with _pytest.raises(ValueError, match="1..20"):
        rank_metrics(df, "q", "rank", "rel", k=21)


def test_acf_matches_numpy(spark):
    """Sample ACF vs the direct numpy formula on integer series; short
    series emit no row for infeasible lags; constant series NULL."""
    import numpy as np

    from dbt_extrica_spark.extensions.timeseries import acf

    xs = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("short", 0, 1.0), ("short", 1, 2.0)]
    rows += [("const", i, 4.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    out = acf(df, "k", "o", "v", max_lag=3).collect()
    got = {(r.k, r.lag): r.acf for r in out}
    x = np.array(xs)
    m, den = x.mean(), ((x - x.mean()) ** 2).sum()
    for k in range(1, 4):
        want = ((x[:-k] - m) * (x[k:] - m)).sum() / den
        assert abs(got[("a", k)] - want) < 1e-6
    assert ("short", 2) not in got and ("short", 1) in got
    assert got[("const", 1)] is None


def test_cusum_changepoint_semantics(spark):
    """Level shift localizes at the segment boundary; earliest tie wins;
    constant series scores NULL."""
    from dbt_extrica_spark.extensions.timeseries import cusum_changepoint

    rows = [("s", i, 0.0) for i in range(5)]
    rows += [("s", 5 + i, 10.0) for i in range(5)]
    rows += [("c", i, 2.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    got = {r.k: r for r in cusum_changepoint(df, "k", "o", "v").collect()}
    s = got["s"]
    assert (s.cp_pos, s.cp_order, s.max_abs_cusum) == (5, 4, 25.0)
    assert abs(s.stat - 25.0 / (10 * 25.0) ** 0.5) < 1e-12
    assert got["c"].stat is None and got["c"].max_abs_cusum == 0.0


def test_ohlc_downsample_semantics(spark):
    """Open/close pick by (ts, value) incl. the collided-timestamp
    tie-break; NULLs excluded; bucket validation raises."""
    import datetime as dt

    import pytest as _pytest

    from dbt_extrica_spark.extensions.timeseries import ohlc_downsample

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [("k", t0, 5.0), ("k", t0, 4.0),               # tie: open=4
            ("k", dt.datetime(2024, 1, 1, 16), 8.0),
            ("k", dt.datetime(2024, 1, 1, 16), 9.0),      # tie: close=9
            ("k", dt.datetime(2024, 1, 1, 12), 2.0),
            ("k", None, 99.0), ("k", t0, None)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = ohlc_downsample(df, "ts", "k", "v").collect()[0]
    assert (r.n, r.open, r.high, r.low, r.close) == (5, 4.0, 9.0, 2.0, 9.0)
    with _pytest.raises(ValueError, match="bucket"):
        ohlc_downsample(df, "ts", "k", "v", bucket="minute")


def test_welch_ttest_matches_numpy(spark):
    """t and Welch-Satterthwaite df vs the direct numpy formulas; n<2
    or zero variance yields NULLs."""
    import numpy as np

    from dbt_extrica_spark.extensions.profiling import welch_ttest

    x1 = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    x2 = [4.0, 5.0, 6.0, 7.0, 9.0]
    a = spark.createDataFrame([(v,) for v in x1], "v double")
    b = spark.createDataFrame([(v,) for v in x2], "v double")
    r = welch_ttest(a, b, "v").collect()[0]
    a1, a2 = np.array(x1), np.array(x2)
    v1, v2 = a1.var(ddof=1), a2.var(ddof=1)
    se2 = v1 / 6 + v2 / 5
    assert abs(r.t_stat - (a1.mean() - a2.mean()) / np.sqrt(se2)) < 1e-12
    assert abs(r.df - se2 ** 2 / ((v1 / 6) ** 2 / 5
                                  + (v2 / 5) ** 2 / 4)) < 1e-12
    single = spark.createDataFrame([(3.0,)], "v double")
    r = welch_ttest(single, b, "v").collect()[0]
    assert r.t_stat is None and r.df is None
    const = spark.createDataFrame([(2.0,), (2.0,)], "v double")
    r = welch_ttest(const, const, "v").collect()[0]
    assert r.t_stat is None


def test_hilbert_key_matches_twin_and_guards(spark):
    """Spark walk == the pinned pure-Python twin on the full 8x8 grid;
    bijective; consecutive keys are unit grid steps (the locality
    property z-order lacks); out-of-range and reserved-name guards."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.layout import (hilbert_d2_py,
                                                     hilbert_key_2d)

    bits, n = 3, 8
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r.x, r.y): r.hkey for r in
           hilbert_key_2d(df, "x", "y", bits).collect()}
    assert got == {(x, y): hilbert_d2_py(bits, x, y) for x, y in rows}
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(n * n))
    assert all(abs(inv[d][0] - inv[d + 1][0])
               + abs(inv[d][1] - inv[d + 1][1]) == 1
               for d in range(n * n - 1))
    with _pytest.raises(Exception, match="hilbert_key_2d"):
        hilbert_key_2d(spark.createDataFrame([(8, 0)], "x int, y int"),
                       "x", "y", bits).collect()
    with _pytest.raises(Exception, match="hilbert_key_2d"):
        hilbert_key_2d(spark.createDataFrame([(None, 0)], "x int, y int"),
                       "x", "y", bits).collect()
    with _pytest.raises(ValueError, match="bits"):
        hilbert_key_2d(df, "x", "y", 0)
    with _pytest.raises(ValueError, match="collide"):
        hilbert_key_2d(df.withColumnRenamed("y", "hkey"), "x", "hkey",
                       bits)


def test_radius_join_matches_brute_force(spark):
    """Grid-blocked pairs == all-pairs filtered, incl. cross-cell pairs;
    each pair exactly once; guards raise."""
    import random

    import pytest as _pytest

    from dbt_extrica_spark.extensions.spatial import radius_join

    random.seed(7)
    pts = [(i, random.uniform(-1, 1), random.uniform(-1, 1))
           for i in range(200)]
    df = spark.createDataFrame(pts, "id int, x double, y double")
    r = 0.15
    rows = radius_join(df, "id", "x", "y", r).collect()
    got = {(q.id_a, q.id_b) for q in rows}
    assert len(got) == len(rows)  # exactly once
    want = {(a, b)
            for i, (a, xa, ya) in enumerate(pts)
            for b, xb, yb in pts[i + 1:]
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r}
    assert got == want and len(got) > 0
    with _pytest.raises(ValueError, match="radius"):
        radius_join(df, "id", "x", "y", 0.0)
    withnull = spark.createDataFrame([(1, None, 0.0)],
                                     "id int, x double, y double")
    with _pytest.raises(Exception, match="radius_join"):
        radius_join(withnull, "id", "x", "y", 1.0).collect()


def test_decompose_seasonal_recovers_components(spark):
    """Linear trend + period-7 seasonal decomposes exactly (MA of a
    linear is the line; centered per-phase means recover the centered
    season; residual 0); edges NULL; period validation raises."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.timeseries import decompose_seasonal

    season = [3.0, -1.0, 0.0, 2.0, -2.0, -1.0, -1.0]
    rows = [("a", t, 0.5 * t + season[t % 7]) for t in range(42)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    out = decompose_seasonal(df, "k", "o", "v", period=7).collect()
    mid = [r for r in out if r.trend is not None]
    assert max(abs(r.trend - 0.5 * r.o) for r in mid) < 1e-9
    m = sum(season) / 7
    got_season = {r.phase: r.seasonal for r in out}
    assert max(abs(got_season[p] - (season[p] - m))
               for p in range(7)) < 1e-9
    assert max(abs(r.residual) for r in mid) < 1e-9
    by_o = sorted(out, key=lambda r: r.o)
    assert all(by_o[i].trend is None for i in (0, 1, 2, -1, -2, -3))
    for bad in (4, 1, 2):
        with _pytest.raises(ValueError, match="odd"):
            decompose_seasonal(df, "k", "o", "v", period=bad)


def test_cohens_kappa_semantics(spark):
    """Classic 2x2 hand case; perfect agreement = 1; constant-equal
    raters NULL (p_e = 1); NULL input raises."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.evaluation import cohens_kappa

    rows = ([("a", "a")] * 20 + [("a", "b")] * 5
            + [("b", "a")] * 10 + [("b", "b")] * 15)
    r = cohens_kappa(spark.createDataFrame(rows, "p string, y string"),
                     "p", "y").collect()[0]
    po, pe = 35 / 50, (25 * 30 + 25 * 20) / 2500
    assert r.p_o == po and r.p_e == pe
    assert r.kappa == (po - pe) / (1 - pe)
    perfect = spark.createDataFrame([("a", "a"), ("b", "b")],
                                    "p string, y string")
    assert cohens_kappa(perfect, "p", "y").collect()[0].kappa == 1.0
    const = spark.createDataFrame([("a", "a"), ("a", "a")],
                                  "p string, y string")
    assert cohens_kappa(const, "p", "y").collect()[0].kappa is None
    bad = spark.createDataFrame([("a", None)], "p string, y string")
    with _pytest.raises(Exception, match="cohens_kappa"):
        cohens_kappa(bad, "p", "y").collect()


def test_embedding_drift_semantics(spark):
    """Identical-direction snapshots cosine 1, orthogonal 0; mixed
    dimensions WITHIN a side and ACROSS sides both raise; zero side
    NULL cosine; norms are mean-vector norms."""
    import math

    import pytest as _pytest

    from dbt_extrica_spark.extensions.profiling import embedding_drift

    a = spark.createDataFrame([(i, [1.0, 2.0, 3.0]) for i in range(10)],
                              "id int, v array<double>")
    b = spark.createDataFrame([(i, [2.0, 4.0, 6.0]) for i in range(4)],
                              "id int, v array<double>")
    r = embedding_drift(a, b, "v").collect()[0]
    assert r.cosine == 1.0 and (r.n_ref, r.n_cur, r.dim) == (10, 4, 3)
    assert abs(r.norm_ref - math.sqrt(14.0)) < 1e-6
    assert abs(r.norm_cur - 2 * math.sqrt(14.0)) < 1e-6
    c = spark.createDataFrame([(0, [1.0, 0.0])], "id int, v array<double>")
    d = spark.createDataFrame([(0, [0.0, 1.0])], "id int, v array<double>")
    assert embedding_drift(c, d, "v").collect()[0].cosine == 0.0
    z = spark.createDataFrame([(0, [0.0, 0.0])], "id int, v array<double>")
    assert embedding_drift(c, z, "v").collect()[0].cosine is None
    mixed = spark.createDataFrame([(0, [1.0]), (1, [1.0, 2.0])],
                                  "id int, v array<double>")
    with _pytest.raises(Exception, match="mixed"):
        embedding_drift(mixed, c, "v").collect()
    with _pytest.raises(Exception, match="dimensions differ"):
        embedding_drift(a, c, "v").collect()
    empty = spark.createDataFrame([(0, [])], "id int, v array<double>")
    with _pytest.raises(Exception, match="embedding_drift"):
        embedding_drift(empty, c, "v").collect()


def test_zscore_anomalies_semantics(spark):
    """Trailing-window z excludes the current point (a spike scores off
    the clean prior window, then dilutes the next window rather than
    masking itself); warm-up rows NULL; flat window NULL; guards."""
    import statistics

    import pytest as _pytest

    from dbt_extrica_spark.extensions.timeseries import zscore_anomalies

    xs = [10.0, 11.0, 9.0, 10.0, 12.0, 10.0, 11.0, 50.0, 10.0]
    df = spark.createDataFrame([("a", i, v) for i, v in enumerate(xs)],
                               "k string, o int, v double")
    out = {r.o: r for r in
           zscore_anomalies(df, "k", "o", "v", window=5, k=3.0).collect()}
    assert all(out[i].z is None for i in range(5))  # warm-up
    w = xs[2:7]
    m, sd = sum(w) / 5, statistics.stdev(w)
    assert abs(out[7].z - (50.0 - m) / sd) < 1e-9
    assert out[7].is_anomaly is True
    assert out[8].is_anomaly is False  # the spike inflates the window
    flat = spark.createDataFrame([("f", i, 5.0) for i in range(8)],
                                 "k string, o int, v double")
    assert all(r.z is None for r in
               zscore_anomalies(flat, "k", "o", "v", window=5).collect())
    with _pytest.raises(ValueError, match="window"):
        zscore_anomalies(df, "k", "o", "v", window=1)
    with _pytest.raises(ValueError, match="k must be"):
        zscore_anomalies(df, "k", "o", "v", window=5, k=0.0)


def test_radius_join_cell_cap_contract(spark):
    """One cell holding a point pile raises under the default policy,
    caps deterministically under oversize='cap', and under-cap inputs
    pass through unchanged (the equality_blocking_pairs contract)."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.spatial import radius_join

    rows = [(i, 0.05, 0.05) for i in range(30)] + [
        (100 + i, 10.0 + 3 * i, 10.0 + 3 * i) for i in range(20)]
    pts = spark.createDataFrame(rows, "id int, x double, y double")
    with _pytest.raises(Exception, match="max_cell_size"):
        radius_join(pts, "id", "x", "y", 0.5, max_cell_size=10).count()
    capped = radius_join(pts, "id", "x", "y", 0.5, max_cell_size=10,
                         oversize="cap")
    got = sorted((r.id_a, r.id_b) for r in capped.collect())
    assert len(got) == 45  # C(10,2); isolated points yield none
    assert got == sorted((r.id_a, r.id_b) for r in capped.collect())
    ok = radius_join(pts, "id", "x", "y", 0.5, max_cell_size=30)
    assert ok.count() == 30 * 29 // 2
    with _pytest.raises(ValueError, match="oversize"):
        radius_join(pts, "id", "x", "y", 0.5, max_cell_size=5,
                    oversize="drop")


def test_radius_join_cap_boundary_duplicate_coords(spark):
    """Cap interplay with DUPLICATE coordinates exactly at the cap
    boundary: N points sharing one exact coordinate pass untouched at
    max_cell_size=N (all C(N,2) zero-distance pairs emitted), raise at
    N-1, and under oversize='cap' keep exactly cap points (C(cap,2)
    pairs) with a rerun-stable selection."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions.spatial import radius_join

    n = 12
    pts = spark.createDataFrame([(i, 0.25, 0.25) for i in range(n)],
                                "id int, x double, y double")
    at_cap = radius_join(pts, "id", "x", "y", 0.1, max_cell_size=n)
    rows = at_cap.collect()
    assert len(rows) == n * (n - 1) // 2
    assert all(r.dist == 0.0 for r in rows)
    with _pytest.raises(Exception, match="max_cell_size"):
        radius_join(pts, "id", "x", "y", 0.1, max_cell_size=n - 1).count()
    capped = radius_join(pts, "id", "x", "y", 0.1, max_cell_size=n - 1,
                         oversize="cap")
    got = sorted((r.id_a, r.id_b) for r in capped.collect())
    assert len(got) == (n - 1) * (n - 2) // 2
    assert got == sorted((r.id_a, r.id_b) for r in capped.collect())


def test_apply_cdc_rejects_string_seq(spark):
    """apply_cdc validates the seq type up front: a string seq sorts
    lexicographically ('10' < '2') and would silently elect the wrong
    winner, so it is a TypeError, not a runtime guard; numeric and
    timestamp seq types pass."""
    import pytest as _pytest

    from dbt_extrica_spark.operators.merge import apply_cdc

    tgt = spark.createDataFrame([(1, "a")], "id int, v string")
    ch_str = spark.createDataFrame([(1, "b", "U", "2"), (1, "c", "U", "10")],
                                   "id int, v string, op string, seq string")
    with _pytest.raises(TypeError, match="seq"):
        apply_cdc(tgt, ch_str, "id")
    ch_ts = spark.createDataFrame(
        [(1, "b", "U", 2.0), (1, "c", "U", 10.0)],
        "id int, v string, op string, seq double")
    got = {(r.id, r.v) for r in apply_cdc(tgt, ch_ts, "id").collect()}
    assert got == {(1, "c")}


def test_mannwhitney_u_matches_rank_replay(spark):
    """mannwhitney_u on a tied sample == the textbook average-rank
    computation (exact-fraction replay incl. the tie-corrected
    variance); all-tied samples NULL z; empty side NULL u/z."""
    import math
    from fractions import Fraction

    from dbt_extrica_spark.extensions.profiling import mannwhitney_u

    xs = [1, 2, 2, 3, 5, 5, 5, 9]
    ys = [2, 4, 5, 6, 6, 10]
    a = spark.createDataFrame([(float(v),) for v in xs], "v double")
    b = spark.createDataFrame([(float(v),) for v in ys], "v double")
    r = mannwhitney_u(a, b, "v").collect()[0]
    assert (r.n_ref, r.n_cur) == (len(xs), len(ys))

    # average-rank replay in exact fractions
    allv = sorted(xs + ys)
    n1, n2 = len(xs), len(ys)
    nn = n1 + n2
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = Fraction(i + 1 + j, 2)  # mean of ranks i+1..j
        i = j
    r1 = sum(ranks[v] for v in xs)
    u1 = r1 - Fraction(n1 * (n1 + 1), 2)
    assert r.u_stat == float(u1)
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    t = sum(c ** 3 - c for c in ties.values())
    var = (float(n1) * float(n2)
           * float(nn * (nn - 1) * (nn + 1) - t)
           / (12.0 * nn * (nn - 1)))
    want_z = (float(u1) - float(n1) * float(n2) / 2.0) / math.sqrt(var)
    assert math.isclose(r.z, want_z, rel_tol=1e-12)

    const = spark.createDataFrame([(7.0,)] * 5, "v double")
    r2 = mannwhitney_u(const, const, "v").collect()[0]
    assert r2.z is None and r2.u_stat is not None
    empty = spark.createDataFrame([], "v double")
    r3 = mannwhitney_u(a, empty, "v").collect()[0]
    assert r3.u_stat is None and r3.z is None and r3.n_cur == 0


def test_cramers_v_semantics(spark):
    """Perfect association V = 1; exact independence V = 0; a single
    level on either side NULL; NULL categories excluded."""
    from dbt_extrica_spark.extensions.profiling import cramers_v

    perfect = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "y")] * 15, "p string, q string")
    r = cramers_v(perfect, "p", "q").collect()[0]
    assert (r.n, r.levels_a, r.levels_b) == (25, 2, 2)
    assert r.v == 1.0

    indep = spark.createDataFrame(
        [("a", "x")] * 6 + [("a", "y")] * 2
        + [("b", "x")] * 3 + [("b", "y")] * 1, "p string, q string")
    r2 = cramers_v(indep, "p", "q").collect()[0]
    assert abs(r2.chi2) < 1e-9 and abs(r2.v) < 1e-6

    single = spark.createDataFrame([("a", "x"), ("a", "y")],
                                   "p string, q string")
    assert cramers_v(single, "p", "q").collect()[0].v is None

    withnull = spark.createDataFrame(
        [("a", "x"), (None, "y"), ("b", None), ("b", "y")],
        "p string, q string")
    assert cramers_v(withnull, "p", "q").collect()[0].n == 2


def test_matthews_corr_semantics(spark):
    """Hand 2x2 case == the closed form; perfect/inverted predictors hit
    +-1; a degenerate margin NULL; fractional labels raise
    (raw-before-cast)."""
    import math

    import pytest as _pytest

    from dbt_extrica_spark.extensions.evaluation import matthews_corr

    rows = ([(1, 1)] * 20 + [(0, 0)] * 15 + [(1, 0)] * 5 + [(0, 1)] * 10)
    r = matthews_corr(spark.createDataFrame(rows, "p int, y int"),
                      "p", "y").collect()[0]
    assert (r.tp, r.tn, r.fp, r.fn) == (20, 15, 5, 10)
    num = 20.0 * 15.0 - 5.0 * 10.0
    den = math.sqrt((25.0 * 30.0) * (20.0 * 25.0))
    assert math.isclose(r.mcc, num / den, rel_tol=1e-12)
    perfect = spark.createDataFrame([(1, 1), (0, 0)], "p int, y int")
    assert matthews_corr(perfect, "p", "y").collect()[0].mcc == 1.0
    inverted = spark.createDataFrame([(1, 0), (0, 1)], "p int, y int")
    assert matthews_corr(inverted, "p", "y").collect()[0].mcc == -1.0
    onesided = spark.createDataFrame([(1, 1), (1, 0)], "p int, y int")
    assert matthews_corr(onesided, "p", "y").collect()[0].mcc is None
    frac = spark.createDataFrame([(0.9, 1.0)], "p double, y double")
    with _pytest.raises(Exception, match="matthews_corr"):
        matthews_corr(frac, "p", "y").collect()


def test_ewma_matches_recursion_replay(spark):
    """ewma == the pandas adjust=False recursion replayed over the
    trailing window; first row = x_0; alpha=1 is the identity; NULL
    value and parameter guards raise."""
    import math

    import pytest as _pytest

    from dbt_extrica_spark.extensions.timeseries import ewma

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([("a", i, v) for i, v in enumerate(xs)],
                               "k string, o int, v double")
    w, a = 4, 0.5
    out = {r.o: r.ewma for r in
           ewma(df, "k", "o", "v", alpha=a, window=w).collect()}

    def replay(t):
        lo = max(0, t - w + 1)
        y = xs[lo]
        for i in range(lo + 1, t + 1):
            y = (1 - a) * y + a * xs[i]
        return y

    for t in range(len(xs)):
        assert math.isclose(out[t], replay(t), rel_tol=1e-12), t
    assert out[0] == xs[0]

    ident = {r.o: r.ewma for r in
             ewma(df, "k", "o", "v", alpha=1.0, window=4).collect()}
    assert all(ident[t] == xs[t] for t in range(len(xs)))

    with _pytest.raises(ValueError, match="alpha"):
        ewma(df, "k", "o", "v", alpha=0.0)
    with _pytest.raises(ValueError, match="window"):
        ewma(df, "k", "o", "v", window=1)
    withnull = spark.createDataFrame([("a", 0, None), ("a", 1, 2.0)],
                                     "k string, o int, v double")
    with _pytest.raises(Exception, match="ewma"):
        ewma(withnull, "k", "o", "v").collect()
