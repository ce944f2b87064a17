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
