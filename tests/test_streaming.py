"""[EXTENSION] Structured Streaming: availableNow batch-equivalence and the
stateful sessionizer's consistency with the batch gaps-and-islands twin."""

from dbt_extrica_spark.sources.registry import register_sources
from dbt_extrica_spark.streaming import (
    read_event_stream, run_available_now, sessionize_stateful, windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_equals_batch(spark):
    register_sources(spark, SF)
    stream = read_event_stream(spark, SF)
    got = run_available_now(windowed_counts(stream, "1 day", "1 hour"))
    expected = spark.sql("""
        SELECT date_trunc('day', ts) AS window_start, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """)
    g = {(str(r.window_start), r.event_type): r.n for r in got.collect()}
    e = {(str(r.window_start), r.event_type): r.n for r in expected.collect()}
    assert g == e


def test_stream_stream_interval_join_equals_batch(spark):
    # two watermarked streams over the same file source, interval-joined
    # in append mode under availableNow == the batch interval join
    from dbt_extrica_spark.streaming import stream_stream_interval_join

    register_sources(spark, SF)
    ev = read_event_stream(spark, SF)
    joined = stream_stream_interval_join(
        ev.where("event_type = 'view'"),
        ev.where("event_type = 'purchase'"),
        key="user_id", interval="2 hours", watermark="1 hour")
    got = {(r.user_id, r.l_event_id, r.r_event_id)
           for r in run_available_now(joined, output_mode="append").collect()}
    expected = {(r.user_id, r.l, r.r) for r in spark.sql("""
        SELECT a.user_id, a.event_id AS l, b.event_id AS r
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'view' AND b.event_type = 'purchase'
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOURS
    """).collect()}
    assert got == expected and len(got) > 0


def test_stateful_sessions_subset_of_batch(spark):
    register_sources(spark, SF)
    stream = read_event_stream(spark, SF).select("user_id", "ts")
    closed = run_available_now(sessionize_stateful(stream, 30), "append")
    batch = spark.sql("""
        WITH gapped AS (
          SELECT user_id, ts,
                 CASE WHEN unix_micros(ts) - LAG(unix_micros(ts)) OVER w
                      > 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM gapped
        )
        SELECT user_id, sid, COUNT(*) AS n, MIN(ts) AS s, MAX(ts) AS e
        FROM numbered GROUP BY user_id, sid
    """)
    got = {(r.user_id, r.session_id, r.n_events,
            str(r.session_start), str(r.session_end))
           for r in closed.collect()}
    expected = {(r.user_id, r.sid, r.n, str(r.s), str(r.e))
                for r in batch.collect()}
    # the stateful operator emits only CLOSED sessions — a strict subset
    # (the final open session per user stays in state)
    assert got <= expected
    assert len(got) > 0
    # every user's open (last) session is the one withheld
    per_user_open = {}
    for u, sid, n, s, e in expected - got:
        per_user_open.setdefault(u, []).append(sid)
    for u, sids in per_user_open.items():
        assert len(sids) == 1


def test_streaming_incremental_merge_equals_batch(spark):
    from dbt_extrica_spark import Engine

    eng = Engine(spark)
    eng.register_sources(SF)
    stream = read_event_stream(spark, SF) \
        .select("event_id", "event_type", "value")
    from dbt_extrica_spark.streaming import streaming_incremental_merge

    q = streaming_incremental_merge(eng, stream, "stream_inc", "event_id")
    q.awaitTermination(120)
    got = eng.table("stream_inc")
    expected = spark.sql(
        f"SELECT event_id, event_type, value FROM"
        f" {eng.sources['events'].render()}")
    assert got.count() == expected.count()
    g = {(r.event_id, r.value) for r in got.collect()}
    e = {(r.event_id, r.value) for r in expected.collect()}
    assert g == e
    eng.close()


def test_streaming_rollup_maintenance_converges_across_batches(
        spark, tmp_path):
    """Continuous-aggregate maintenance: with maxFilesPerTrigger=1 the
    SAME window is updated across several micro-batches — the final
    durable table must still equal the batch GROUP BY exactly (update
    re-emission + keyed merge is idempotent and convergent). A
    single-batch run can't observe this; the battery entry drains the
    whole file at once."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.streaming import streaming_rollup_maintenance

    src = tmp_path / "roll_in"
    src.mkdir()
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for f in range(3):
        part = []
        for i in range(40):
            # every file contributes to BOTH days -> every window is
            # touched by every micro-batch; a NULL event_type group in
            # every batch pins the null-safe merge key (plain equality
            # would re-insert the NULL-keyed row per batch forever)
            ts = base + dt.timedelta(hours=(i % 2) * 24 + f, minutes=i)
            etype = None if i % 5 == 0 else (
                "click" if i % 3 else "view")
            part.append((f * 100 + i, ts, etype, float(i)))
        spark.createDataFrame(
            part, "event_id bigint, ts timestamp, event_type string, "
                  "value double") \
            .coalesce(1).write.mode("append").parquet(str(src / f"f{f}"))
        rows += part
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, event_type string,"
                      " value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    eng = Engine(spark)
    try:
        q = streaming_rollup_maintenance(eng, stream, "roll_tbl",
                                         window="1 day",
                                         watermark="1 hour")
        assert q.awaitTermination(180), "stream did not drain in 180s"
        got = {(str(r.window_start), r.event_type, r.n, round(r.value_sum, 4))
               for r in eng.table("roll_tbl").collect()}
        batch = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, event_type string, "
                  "value double")
        exp = {(str(r.ws), r.event_type, r.n, round(r.vs, 4))
               for r in batch.groupBy(
                   F.date_trunc("day", "ts").alias("ws"), "event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(18,4)"))
                    .cast("double").alias("vs")).collect()}
        assert got == exp
        # both days present -> windows genuinely updated across batches
        assert len({w for w, *_ in got}) == 2
        # the NULL-keyed group converged to ONE row per window
        assert sum(1 for _, et, *_ in got if et is None) == 2
    finally:
        eng.close()


def test_streaming_admission_dedups_across_batches(spark, tmp_path):
    """The admitted-docs band index must extend across micro-batches: a
    doc admitted in batch 1 blocks its copy arriving in batch 2 — the
    property the single-batch oracle entry can't observe."""
    import os
    import shutil

    from dbt_extrica_spark.streaming import streaming_minhash_admission

    stream_dir = tmp_path / "adm_in"
    stream_dir.mkdir()
    stage = tmp_path / "adm_stage"

    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far away into the deep quiet forest tonight")
    other = ("completely different content about distributed systems "
             "and the economics of large scale data processing work")
    hist_txt = ("historical document that was already admitted long ago "
                "and lives in the permanent corpus archive here")

    def add_file(idx: int, rows: list[tuple[int, str]]) -> None:
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        out = str(stage / f"b{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
        dst = stream_dir / f"f{idx}.parquet"
        shutil.copyfile(os.path.join(out, part), dst)
        os.utime(dst, (1700000000 + idx, 1700000000 + idx))

    # batch 1: a hist near-dup (dropped), a fresh doc (admitted);
    # batch 2: a copy of the batch-1 admission (dropped — index grew),
    #          a fresh doc (admitted)
    add_file(1, [(101, hist_txt + " x"), (102, base)])
    add_file(2, [(201, base + " tail"), (202, other)])

    hist = spark.createDataFrame([(1, hist_txt)], "doc_id BIGINT, text STRING")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1).format("parquet")
        .load(str(stream_dir))
    )
    admitted = streaming_minhash_admission(
        stream, hist, "doc_id", "text", threshold=0.5)
    got = {r.doc_id for r in admitted.collect()}
    assert got == {102, 202}


def test_watermark_advances_and_drops_late_across_microbatches(spark, tmp_path):
    """Continuous-run behavior (NEXT.md gap): sequential availableNow runs
    against one checkpoint execute one micro-batch per newly-arrived file,
    so the watermark advances between batches, append mode finalizes closed
    windows exactly once, and a late row beyond the watermark is dropped —
    none of which the one-batch tests can observe."""
    import os
    import shutil

    from pyspark.sql import functions as F

    sch = "ts timestamp, event_type string"
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    stage = tmp_path / "stage"

    def add_file(idx: int, rows: list[tuple[str, str]]) -> None:
        df = spark.createDataFrame(
            [(r[0], r[1]) for r in rows], "ts string, event_type string"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
        out = str(stage / f"b{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
        dst = stream_dir / f"f{idx}.parquet"
        shutil.copyfile(os.path.join(out, part), dst)
        os.utime(dst, (1700000000 + idx, 1700000000 + idx))  # strict order

    batches = [
        [("2024-01-01 10:05:00", "a"), ("2024-01-01 10:10:00", "a")],
        [("2024-01-01 12:00:00", "b")],   # wm -> 11:30, closes 10:00 window
        [("2024-01-01 10:20:00", "a")],   # LATE: behind watermark, dropped
        [("2024-01-01 14:00:00", "c")],   # wm -> 13:30, closes 12:00 window
    ]

    # one availableNow run per file against the SAME checkpoint: watermark
    # and window state persist in the state store between runs, so each run
    # is exactly one micro-batch
    got: dict[tuple[str, str], int] = {}
    per_run: list[dict] = []
    for i, rows in enumerate(batches, start=1):
        add_file(i, rows)
        stream = (
            spark.readStream.schema(sch).format("parquet")
            .load(str(stream_dir))
        )
        counts = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
        )
        sink: list = []

        def collect(batch_df, _bid, _sink=sink):
            _sink.extend(batch_df.collect())

        q = (
            counts.writeStream.foreachBatch(collect)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        emitted = {(str(r.ws), r.event_type): r.n for r in sink}
        per_run.append(emitted)
        got.update(emitted)

    # run 2 advances the watermark past 11:00 and finalizes the 10:00
    # window; run 3's late row is dropped (no re-emission, count stays 2);
    # run 4 finalizes the 12:00 window; 14:00 stays open -> never emitted
    assert per_run[1] == {("2024-01-01 10:00:00", "a"): 2}
    assert per_run[2] == {}
    assert per_run[3] == {("2024-01-01 12:00:00", "b"): 1}
    assert got == {
        ("2024-01-01 10:00:00", "a"): 2,
        ("2024-01-01 12:00:00", "b"): 1,
    }


def test_stateful_sessionizer_timeout_flushes_idle_session(spark, tmp_path):
    """use_timeout=True: a gap-idle session must flush via the
    processing-time timeout. Needs a processingTime trigger (under
    availableNow a processing-time timeout schedules wake-up batches
    forever) and a polling harness: start, wait for the timeout batch to
    emit the closed session, stop."""
    import time

    src = tmp_path / "events_src"
    ckpt = tmp_path / "ckpt"
    spark.sql(
        "SELECT CAST(7 AS BIGINT) AS user_id, TIMESTAMP '2024-01-01 00:00:00' AS ts"
        " UNION ALL"
        " SELECT CAST(7 AS BIGINT), TIMESTAMP '2024-01-01 00:00:01'"
    ).coalesce(1).write.parquet(str(src))

    schema = "user_id bigint, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(str(src))
    # gap 0.05 min = 3 s: events 1 s apart land in one session; with no further
    # input, the timeout (3 s of processing time) must close and emit it
    sessions = sessionize_stateful(stream, gap_minutes=0.05, use_timeout=True)
    name = "timeout_sessions_sink"
    query = (
        sessions.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.table(name).collect()
            if rows:
                break
            time.sleep(1.0)
    finally:
        query.stop()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 7 and r.n_events == 2
    assert str(r.session_start).startswith("2024-01-01 00:00:00")
    assert str(r.session_end).startswith("2024-01-01 00:00:01")


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics across micro-batches: a
    duplicate key arriving within the delay of its first occurrence is
    dropped; once the watermark passes first-seen + delay the key's state
    is EVICTED, so a much-later recurrence is re-emitted — bounded state
    is the whole point vs plain dropDuplicates."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from dbt_extrica_spark.streaming import dedup_within_watermark

    sch = "ts timestamp, k string"
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    stage = tmp_path / "stage"

    def add_file(idx: int, rows: list[tuple[str, str]]) -> None:
        df = spark.createDataFrame(rows, "ts string, k string").select(
            F.col("ts").cast("timestamp").alias("ts"), "k")
        out = str(stage / f"b{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
        dst = stream_dir / f"f{idx}.parquet"
        shutil.copyfile(os.path.join(out, part), dst)
        os.utime(dst, (1700000000 + idx, 1700000000 + idx))

    batches = [
        [("2024-01-01 10:00:00", "A")],                          # emit A
        # dup A within 30 min -> dropped; B advances wm to 11:30,
        # evicting A's state (expires 10:30)
        [("2024-01-01 10:10:00", "A"), ("2024-01-01 12:00:00", "B")],
        [("2024-01-01 12:10:00", "A")],  # state evicted -> re-emitted
    ]
    per_run: list[set] = []
    for i, rows in enumerate(batches, start=1):
        add_file(i, rows)
        stream = (
            spark.readStream.schema(sch).format("parquet")
            .load(str(stream_dir))
        )
        deduped = dedup_within_watermark(stream, ["k"], "ts", "30 minutes")
        sink: list = []

        def collect(batch_df, _bid, _sink=sink):
            _sink.extend(batch_df.collect())

        q = (
            deduped.writeStream.foreachBatch(collect)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        per_run.append({(str(r.ts), r.k) for r in sink})

    assert per_run[0] == {("2024-01-01 10:00:00", "A")}
    assert per_run[1] == {("2024-01-01 12:00:00", "B")}  # dup A dropped
    assert per_run[2] == {("2024-01-01 12:10:00", "A")}  # re-emitted


def test_streaming_theta_maintenance_batch_invariant(spark, tmp_path):
    """Continuous theta-sketch maintenance: with maxFilesPerTrigger=1
    the durable sketch is merged across several micro-batches — the
    final table must equal theta_build over ALL rows bit-for-bit (the
    KMV batch-invariance contract: the k smallest of the union of
    per-batch k-smallest == the k smallest overall). A single-batch
    run can't observe this; the battery entry drains the file at
    once."""
    from pyspark.sql import functions as F

    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.extensions.sketch import theta_build
    from dbt_extrica_spark.streaming import streaming_theta_maintenance

    k = 8
    src = tmp_path / "theta_in"
    src.mkdir()
    rows = []
    for f in range(3):
        # overlapping user sets across files: the merge must dedup
        # hashes across batches, and each group exceeds k so real
        # truncation happens per batch AND at the merge
        part = [(f * 100 + i, (i * 7 + f) % 23, "a" if i % 2 else "b")
                for i in range(30)]
        spark.createDataFrame(
            part, "event_id bigint, user_id bigint, grp string") \
            .coalesce(1).write.mode("append").parquet(str(src / f"f{f}"))
        rows += part
    stream = (spark.readStream
              .schema("event_id bigint, user_id bigint, grp string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    eng = Engine(spark)
    try:
        q = streaming_theta_maintenance(eng, stream, "theta_tbl",
                                        "user_id", ["grp"], k=k)
        assert q.awaitTermination(180), "stream did not drain in 180s"
        got = {(r.grp, r.h) for r in eng.table("theta_tbl").collect()}
        batch = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, grp string")
        exp = {(r.grp, r.h)
               for r in theta_build(batch, "user_id", ["grp"],
                                    k=k).collect()}
        assert got == exp
        # the table stays sketch-sized: <= k rows per group
        sizes = {r.grp: r.n for r in eng.table("theta_tbl")
                 .groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        assert all(n <= k for n in sizes.values())
    finally:
        eng.close()


def test_streaming_maintenance_refuses_rebaseline(spark, tmp_path):
    """If the durable table vanishes while the checkpoint holds
    committed batches (e.g. a crash inside the overwrite swap), the
    create-if-missing fallback must RAISE, not silently re-baseline the
    table from the current batch (which would discard all accumulated
    state while the stream exits 0)."""
    import pytest

    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.streaming import streaming_theta_maintenance

    src = tmp_path / "reb_in"
    src.mkdir()
    schema = "event_id bigint, user_id bigint, grp string"
    spark.createDataFrame([(i, i % 7, "a") for i in range(20)], schema) \
        .coalesce(1).write.parquet(str(src / "f0"))

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src) + "/*"))

    eng = Engine(spark)
    try:
        q = streaming_theta_maintenance(eng, stream(), "reb_tbl",
                                        "user_id", ["grp"], k=8)
        assert q.awaitTermination(120)
        assert eng.table("reb_tbl").count() > 0
        # simulate the loss: table gone, checkpoint (with commits) kept
        spark.sql(f"DROP TABLE {eng.schema}.reb_tbl")
        spark.createDataFrame([(100 + i, i % 5, "b") for i in range(20)],
                              schema) \
            .coalesce(1).write.parquet(str(src / "f1"))
        q2 = streaming_theta_maintenance(eng, stream(), "reb_tbl",
                                         "user_id", ["grp"], k=8)
        with pytest.raises(Exception, match="re-baseline"):
            q2.awaitTermination(120)
    finally:
        eng.close()


def test_streaming_empty_first_batch_not_refused(spark, tmp_path):
    """An all-empty FIRST micro-batch must not poison the stream: Spark
    commits the batch either way, so if creation were skipped the next
    non-empty batch would read "commits present + table missing" and
    trip the table-loss refusal on a perfectly fresh build. The fix
    creates the (empty) table from batch 0's schema; batch 1 then
    merges normally. Covers BOTH durable-table callbacks."""
    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.streaming import (
        streaming_incremental_merge, streaming_theta_maintenance,
    )

    src = tmp_path / "efb_in"
    src.mkdir()
    schema = "event_id bigint, user_id bigint, grp string, flag int"
    # f0's rows are all filtered out upstream -> batch 0 is EMPTY;
    # f1 carries the real rows (maxFilesPerTrigger=1 => 2 batches)
    spark.createDataFrame([(i, i % 7, "a", 0) for i in range(10)], schema) \
        .coalesce(1).write.parquet(str(src / "f0"))
    import time
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    spark.createDataFrame([(100 + i, i % 5, "b", 1) for i in range(10)],
                          schema) \
        .coalesce(1).write.parquet(str(src / "f1"))

    def stream():
        from pyspark.sql import functions as F
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src) + "/*")
                .filter(F.col("flag") == 1))

    eng = Engine(spark)
    try:
        q = streaming_incremental_merge(eng, stream(), "efb_merge",
                                        "event_id")
        assert q.awaitTermination(120)
        assert eng.table("efb_merge").count() == 10

        q2 = streaming_theta_maintenance(eng, stream(), "efb_theta",
                                         "user_id", ["grp"], k=8)
        assert q2.awaitTermination(120)
        rows = eng.table("efb_theta").collect()
        assert rows and all(r.grp == "b" for r in rows)
    finally:
        eng.close()


def test_prior_commits_probe_uses_hadoop_fs(spark, tmp_path):
    """_prior_commits_exist must see commits through the Hadoop
    FileSystem API: a `file:` URI warehouse (any non-os.path FS) made
    the old os.listdir probe OSError -> False, silently failing the
    re-baseline guard OPEN on exactly the warehouses (HDFS/object
    stores) where rename-window loss is most likely."""
    from types import SimpleNamespace

    from dbt_extrica_spark.streaming.incremental import _prior_commits_exist

    wh = tmp_path / "wh"
    commits = wh / "_checkpoints" / "tbl" / "commits"
    commits.mkdir(parents=True)
    eng = SimpleNamespace(spark=spark, warehouse_dir="file:" + str(wh))
    assert _prior_commits_exist(eng, "tbl") is False  # dir exists, empty
    (commits / ".crc-noise").write_text("x")
    assert _prior_commits_exist(eng, "tbl") is False  # hidden-only
    (commits / "0").write_text("v1")
    assert _prior_commits_exist(eng, "tbl") is True
    assert _prior_commits_exist(eng, "missing_tbl") is False


def test_streaming_bloom_maintenance_batch_invariant(spark, tmp_path):
    """Continuous Bloom-bitmap maintenance: with maxFilesPerTrigger=1
    the durable bitmap is OR-merged across several micro-batches — the
    final table must equal bloom_build over ALL rows bit-for-bit (OR is
    associative/commutative/idempotent, so the maintained table is
    batch-invariant AND replay-tolerant). Overlapping user sets across
    files exercise the idempotent OR of already-set bits."""
    from pyspark.sql import functions as F

    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.extensions.sketch import bloom_build
    from dbt_extrica_spark.streaming import streaming_bloom_maintenance

    m, nh = 1 << 10, 3
    src = tmp_path / "bloom_in"
    src.mkdir()
    rows = []
    for f in range(3):
        part = [(f * 100 + i, (i * 7 + f) % 23, "a" if i % 2 else "b")
                for i in range(30)]
        spark.createDataFrame(
            part, "event_id bigint, user_id bigint, grp string") \
            .coalesce(1).write.mode("append").parquet(str(src / f"f{f}"))
        rows += part
    stream = (spark.readStream
              .schema("event_id bigint, user_id bigint, grp string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    eng = Engine(spark)
    try:
        q = streaming_bloom_maintenance(eng, stream, "bloom_tbl",
                                        "user_id", ["grp"],
                                        m_bits=m, n_hashes=nh)
        assert q.awaitTermination(180), "stream did not drain in 180s"
        got = {(r.grp, r.word, r.bits)
               for r in eng.table("bloom_tbl").collect()}
        batch = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, grp string")
        exp = {(r.grp, r.word, r.bits)
               for r in bloom_build(batch, "user_id", ["grp"],
                                    m_bits=m, n_hashes=nh).collect()}
        assert got == exp
        # bitmap-bounded: <= ceil(m/63) rows per group
        sizes = {r.grp: r.n for r in eng.table("bloom_tbl")
                 .groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        assert all(n <= (m + 62) // 63 for n in sizes.values())
    finally:
        eng.close()


def test_streaming_priority_sample_batch_invariant(spark, tmp_path):
    """Continuous priority-sample maintenance: with maxFilesPerTrigger=1
    the durable top-(k+1) state is merged across several micro-batches —
    the final state AND the finalized sample (ranks + est_weight) must
    equal the batch build over ALL rows bit-for-bit (top-(k+1) is
    batch-invariant under union + re-truncation), a DUPLICATED file
    (at-least-once re-delivery) must change nothing (idempotent merge),
    and the table stays <= k+1 rows per group."""
    from pyspark.sql import functions as F

    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.extensions.sampling import (
        priority_sample, priority_sample_finalize, priority_state)
    from dbt_extrica_spark.streaming import (
        streaming_priority_sample_maintenance)

    k = 5
    src = tmp_path / "prio_in"
    src.mkdir()
    rows = []
    for f in range(3):
        # each group gets 10 rows per file -> 30 per group total, well
        # past k+1 so real truncation happens per batch AND at merge
        part = [(f * 100 + i, float((i * 13 + f * 7) % 29 + 1),
                 "a" if i % 2 else "b") for i in range(20)]
        spark.createDataFrame(
            part, "id bigint, w double, grp string") \
            .coalesce(1).write.mode("append").parquet(str(src / f"f{f}"))
        rows += part
    # re-deliver file 0 verbatim: the dropDuplicates in the merge must
    # make this a no-op
    spark.createDataFrame(
        [r for r in rows if r[0] < 100],
        "id bigint, w double, grp string") \
        .coalesce(1).write.mode("append").parquet(str(src / "f0_redeliver"))
    stream = (spark.readStream
              .schema("id bigint, w double, grp string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    eng = Engine(spark)
    try:
        q = streaming_priority_sample_maintenance(
            eng, stream, "prio_tbl", "id", "w", ["grp"], k=k)
        assert q.awaitTermination(180), "stream did not drain in 180s"
        batch = spark.createDataFrame(rows, "id bigint, w double, grp string")
        got_state = {(r.grp, r.id, r.weight, r.priority)
                     for r in eng.table("prio_tbl").collect()}
        exp_state = {(r.grp, r.id, r.weight, r.priority)
                     for r in priority_state(batch, "id", "w", k=k,
                                             group_cols=["grp"]).collect()}
        assert got_state == exp_state
        sizes = {r.grp: r.n for r in eng.table("prio_tbl")
                 .groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        assert all(n <= k + 1 for n in sizes.values())
        fin = {(r.grp, r.id, r.sample_rank, r.est_weight)
               for r in priority_sample_finalize(
                   eng.table("prio_tbl"), "id", k=k,
                   group_cols=["grp"]).collect()}
        exp_fin = {(r.grp, r.id, r.sample_rank, r.est_weight)
                   for r in priority_sample(batch, "id", "w", k=k,
                                            group_cols=["grp"]).collect()}
        assert fin == exp_fin
    finally:
        eng.close()


def test_streaming_gram_maintenance_batch_invariant(spark, tmp_path):
    """Continuous gram-statistics maintenance: with maxFilesPerTrigger=1
    the durable fixed-point state is element-wise summed across several
    micro-batches — the final state must equal gram_state over ALL rows
    bit-for-bit (integer addition is associative/commutative; no
    truncation argument needed), finalize must equal the batch
    gram_matrix, and the table stays d(d+1)/2 rows."""
    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.extensions.similarity import (
        gram_finalize, gram_matrix, gram_state)
    from dbt_extrica_spark.streaming import streaming_gram_maintenance

    src = tmp_path / "gram_in"
    src.mkdir()
    rows = []
    for f in range(3):
        part = [(f * 100 + i,
                 [float(i % 5) + f, float((i * 3) % 7), -1.0 + i * 0.25])
                for i in range(8)]
        spark.createDataFrame(
            part, "id bigint, v array<double>") \
            .coalesce(1).write.mode("append").parquet(str(src / f"f{f}"))
        rows += part
    stream = (spark.readStream
              .schema("id bigint, v array<double>")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    eng = Engine(spark)
    try:
        q = streaming_gram_maintenance(eng, stream, "gram_tbl", "v")
        assert q.awaitTermination(180), "stream did not drain in 180s"
        batch = spark.createDataFrame(rows, "id bigint, v array<double>")
        got_state = {(r.i, r.j): (r.p, r.sv, r.n)
                     for r in eng.table("gram_tbl").collect()}
        exp_state = {(r.i, r.j): (r.p, r.sv, r.n)
                     for r in gram_state(batch, "v").collect()}
        assert got_state == exp_state
        assert len(got_state) == 6  # 3*4/2 upper triangle
        fin = {(r.i, r.j): (r.g, r.si, r.n)
               for r in gram_finalize(eng.table("gram_tbl")).collect()}
        exp_fin = {(r.i, r.j): (r.g, r.si, r.n)
                   for r in gram_matrix(batch, "v").collect()}
        assert fin == exp_fin
    finally:
        eng.close()


def test_streaming_ams_maintenance_batch_invariant(spark, tmp_path):
    """Continuous AMS F2-statistics maintenance: with maxFilesPerTrigger=1
    the durable estimator sums fold across several micro-batches — the
    final table must equal ams_build over ALL rows bit-for-bit (the
    sketch is linear; integer addition argument, same as gram), and the
    f2 estimate read off the maintained state must equal the batch
    estimate exactly."""
    from dbt_extrica_spark import Engine
    from dbt_extrica_spark.extensions.sketch import (ams_build,
                                                     ams_f2_estimate)
    from dbt_extrica_spark.streaming import streaming_ams_maintenance

    src = tmp_path / "ams_in"
    src.mkdir()
    rows = []
    for f in range(3):
        part = [(f * 100 + i, f"key{(i * 7 + f) % 9}") for i in range(20)]
        spark.createDataFrame(part, "id bigint, k string") \
            .coalesce(1).write.mode("append").parquet(str(src / f"f{f}"))
        rows += part
    stream = (spark.readStream
              .schema("id bigint, k string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    eng = Engine(spark)
    try:
        q = streaming_ams_maintenance(eng, stream, "ams_tbl", "k", r=8)
        assert q.awaitTermination(180), "stream did not drain in 180s"
        batch = spark.createDataFrame(rows, "id bigint, k string")
        got = {r.d: r.z for r in eng.table("ams_tbl").collect()}
        want = {r.d: r.z for r in ams_build(batch, "k", r=8).collect()}
        assert got == want and len(got) == 8
        est_s = ams_f2_estimate(eng.table("ams_tbl")).collect()[0]
        est_b = ams_f2_estimate(ams_build(batch, "k", r=8)).collect()[0]
        assert (est_s.f2_est, est_s.r) == (est_b.f2_est, est_b.r)
    finally:
        eng.close()


def test_run_available_now_restores_shuffle_conf(spark):
    """r15 ADVICE: the state_partitions override restores the session's
    spark.sql.shuffle.partitions to its PRIOR explicit value — and back
    to UNSET (default) when it was never explicitly set."""
    register_sources(spark, SF)
    stream = read_event_stream(spark, SF)
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "12")
        run_available_now(windowed_counts(stream, "1 day", "1 hour"),
                          state_partitions=4)
        assert spark.conf.get(key) == "12"
        spark.conf.unset(key)
        run_available_now(windowed_counts(stream, "1 day", "1 hour"),
                          state_partitions=4)
        assert spark.conf.get(key, None) is None
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def test_streaming_cdc_callback_seq_aware(spark, tmp_path):
    """The CDC foreachBatch callback is seq-aware across batches: an
    out-of-order OLDER upsert arriving in a later batch is ignored,
    re-delivering a batch is a no-op, deletes remove rows, and the
    applied seq persists per row."""
    from pyspark.sql import functions as F

    from dbt_extrica_spark.engine import Engine
    from dbt_extrica_spark.streaming.incremental import _cdc_apply_callback

    eng = Engine(spark, schema=f"cdc_t_{tmp_path.name.lower()}",
                 warehouse_dir=str(tmp_path))
    cb = _cdc_apply_callback(eng, "t", "id", "op", "seq", ["id", "v"])

    b1 = spark.createDataFrame(
        [(1, "a", "I", 10), (2, "b", "I", 10), (3, "c", "I", 10)],
        "id int, v string, op string, seq int")
    cb(b1, 0)
    b2 = spark.createDataFrame(
        [(1, "a2", "U", 20), (3, None, "D", 20)],
        "id int, v string, op string, seq int")
    cb(b2, 1)
    got = {(r.id, r.v, r["__cdc_seq"])
           for r in eng.table("t").collect()}
    assert got == {(1, "a2", 20), (2, "b", 10)}
    # out-of-order OLDER upsert for key 1 must be ignored
    b3 = spark.createDataFrame([(1, "stale", "U", 15)],
                               "id int, v string, op string, seq int")
    cb(b3, 2)
    assert {(r.id, r.v) for r in eng.table("t").collect()} == {
        (1, "a2"), (2, "b")}
    # re-delivering batch 2 verbatim is a no-op (equal seq skipped)
    cb(b2, 3)
    assert {(r.id, r.v) for r in eng.table("t").collect()} == {
        (1, "a2"), (2, "b")}


def test_streaming_cdc_callback_empty_first_batch(spark, tmp_path):
    """An EMPTY first micro-batch still creates the target table (with
    the full schema incl. __cdc_seq) — availableNow catch-up runs over
    a drained source must leave a queryable table, not a missing one —
    and the next non-empty batch folds into it normally."""
    from dbt_extrica_spark.engine import Engine
    from dbt_extrica_spark.streaming.incremental import _cdc_apply_callback

    eng = Engine(spark, schema=f"cdc_e_{tmp_path.name.lower()}",
                 warehouse_dir=str(tmp_path))
    cb = _cdc_apply_callback(eng, "t", "id", "op", "seq", ["id", "v"])

    empty = spark.createDataFrame([], "id int, v string, op string, seq int")
    cb(empty, 0)
    tbl = eng.table("t")
    assert tbl.count() == 0
    assert set(tbl.columns) == {"id", "v", "__cdc_seq"}
    b1 = spark.createDataFrame([(1, "a", "I", 10), (2, "b", "I", 11)],
                               "id int, v string, op string, seq int")
    cb(b1, 1)
    assert {(r.id, r.v, r["__cdc_seq"])
            for r in eng.table("t").collect()} == {(1, "a", 10),
                                                   (2, "b", 11)}


def test_streaming_cdc_tombstones_block_late_upserts(spark, tmp_path):
    """With tombstones=True a delete's memory outlives the row: a LATER
    batch carrying an OLDER upsert for a deleted key is ignored (the
    no-tombstone contract's one gap), an upsert NEWER than the delete
    reincarnates the key and clears its tombstone, and expired
    tombstones (retention) stop blocking."""
    from dbt_extrica_spark.engine import Engine
    from dbt_extrica_spark.streaming.incremental import _cdc_apply_callback

    eng = Engine(spark, schema=f"cdc_ts_{tmp_path.name.lower()}",
                 warehouse_dir=str(tmp_path))
    cb = _cdc_apply_callback(eng, "t", "id", "op", "seq", ["id", "v"],
                             tombstones=True)

    sch = "id int, v string, op string, seq int"
    cb(spark.createDataFrame(
        [(1, "a", "I", 10), (2, "b", "I", 10), (3, "c", "I", 10)],
        sch), 0)
    # batch 1 deletes keys 1 and 3 at seq 20
    cb(spark.createDataFrame(
        [(1, None, "D", 20), (3, None, "D", 20)], sch), 1)
    assert {(r.id, r.v) for r in eng.table("t").collect()} == {(2, "b")}
    ts = {(r.id, r["__cdc_seq"])
          for r in eng.table("t__tombstones").collect()}
    assert ts == {(1, 20), (3, 20)}
    # batch 2: LATE OLDER upsert for deleted key 1 — must stay dead
    # (the no-tombstone twin would re-insert it); NEWER upsert for
    # deleted key 3 — legitimate reincarnation, tombstone cleared
    cb(spark.createDataFrame(
        [(1, "stale", "U", 15), (3, "reborn", "U", 30)], sch), 2)
    assert {(r.id, r.v) for r in eng.table("t").collect()} == {
        (2, "b"), (3, "reborn")}
    assert {(r.id,) for r in eng.table("t__tombstones").collect()} == {
        (1,)}
    # re-delivering batch 1 is a no-op: key 1's delete equals its
    # tombstone seq (not strictly newer), key 3's delete (seq 20) is
    # older than the reborn live row (seq 30) — both filtered
    cb(spark.createDataFrame(
        [(1, None, "D", 20), (3, None, "D", 20)], sch), 3)
    assert {(r.id, r.v) for r in eng.table("t").collect()} == {
        (2, "b"), (3, "reborn")}


def test_streaming_cdc_tombstone_retention_expires(spark, tmp_path):
    """tombstone_retention_batches=K drops a tombstone K batches after
    it was written — a late older upsert arriving AFTER expiry
    re-inserts (the documented retention trade-off), while one arriving
    within retention stays blocked."""
    from dbt_extrica_spark.engine import Engine
    from dbt_extrica_spark.streaming.incremental import _cdc_apply_callback

    eng = Engine(spark, schema=f"cdc_tr_{tmp_path.name.lower()}",
                 warehouse_dir=str(tmp_path))
    cb = _cdc_apply_callback(eng, "t", "id", "op", "seq", ["id", "v"],
                             tombstones=True,
                             tombstone_retention_batches=2)
    sch = "id int, v string, op string, seq int"
    cb(spark.createDataFrame([(1, "a", "I", 10)], sch), 0)
    cb(spark.createDataFrame([(1, None, "D", 20)], sch), 1)
    # within retention (batch 2 - written batch 1 < 2): still blocked
    cb(spark.createDataFrame([(1, "stale", "U", 15)], sch), 2)
    assert eng.table("t").count() == 0
    # batch 3: the batch-1 tombstone expires (3 - 1 >= 2); the same
    # stale upsert now lands — the documented retention trade-off
    cb(spark.createDataFrame([(1, "stale", "U", 15)], sch), 3)
    assert {(r.id, r.v) for r in eng.table("t").collect()} == {
        (1, "stale")}


def test_streaming_cdc_rejects_non_integral_seq(spark, tmp_path):
    """streaming_cdc_apply validates the seq column type at wiring time:
    __cdc_seq persists as bigint, so a string seq (lexicographic order)
    or a fractional seq (distinct values collapse under the cast) is a
    TypeError before any batch runs — mirroring the batch twin's
    numeric/timestamp contract."""
    import pytest as _pytest

    from dbt_extrica_spark.engine import Engine
    from dbt_extrica_spark.streaming.incremental import streaming_cdc_apply

    eng = Engine(spark, schema=f"cdc_v_{tmp_path.name.lower()}",
                 warehouse_dir=str(tmp_path))
    base = (spark.readStream.format("rate").option("rowsPerSecond", "1")
            .load())
    as_str = base.selectExpr("value AS id", "'x' AS v", "'I' AS op",
                             "CAST(value AS STRING) AS seq")
    with _pytest.raises(TypeError, match="seq"):
        streaming_cdc_apply(eng, as_str, "t", "id")
    as_double = base.selectExpr("value AS id", "'x' AS v", "'I' AS op",
                                "CAST(value AS DOUBLE) AS seq")
    with _pytest.raises(TypeError, match="integral"):
        streaming_cdc_apply(eng, as_double, "t", "id")
