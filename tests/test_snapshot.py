"""Snapshot edge behavior beyond the oracle battery: check strategy and
hard-delete invalidation."""

from dbt_extrica_spark import Model


def _cfg(**kw):
    base = {"materialized": "snapshot", "unique_key": "k"}
    base.update(kw)
    return base


def test_check_strategy_closes_changed_rows(engine):
    cfg = _cfg(strategy="check", check_cols=["v"],
               snapshot_time="2024-06-01 00:00:00")
    engine.materialize(Model(
        "sc1", sql="SELECT k, v FROM VALUES (1, 'a'), (2, 'b') AS t(k, v)",
        config=cfg))
    engine.materialize(Model(
        "sc1", sql="SELECT k, v FROM VALUES (1, 'CHANGED'), (2, 'b') AS t(k, v)",
        config=_cfg(strategy="check", check_cols=["v"],
                    snapshot_time="2024-06-02 00:00:00")))
    rows = engine.table("sc1").collect()
    assert len(rows) == 3
    open_rows = {r.v for r in rows if r.dbt_valid_to is None}
    closed = [r for r in rows if r.dbt_valid_to is not None]
    assert open_rows == {"CHANGED", "b"}
    assert len(closed) == 1 and closed[0].v == "a"
    assert str(closed[0].dbt_valid_to) == "2024-06-02 00:00:00"


def test_check_strategy_all_cols(engine):
    cfg = _cfg(strategy="check", check_cols="all",
               snapshot_time="2024-06-01 00:00:00")
    engine.materialize(Model(
        "sc2", sql="SELECT k, v, w FROM VALUES (1, 'a', 1) AS t(k, v, w)",
        config=cfg))
    engine.materialize(Model(
        "sc2", sql="SELECT k, v, w FROM VALUES (1, 'a', 2) AS t(k, v, w)",
        config=_cfg(strategy="check", check_cols="all",
                    snapshot_time="2024-06-02 00:00:00")))
    assert engine.table("sc2").count() == 2  # w change detected


def test_invalidate_hard_deletes(engine):
    cfg = _cfg(strategy="timestamp", updated_at="u",
               invalidate_hard_deletes=True,
               snapshot_time="2024-06-02 00:00:00")
    engine.materialize(Model(
        "sh1",
        sql="SELECT k, v, CAST('2024-01-01' AS TIMESTAMP) AS u"
            " FROM VALUES (1, 'a'), (2, 'b') AS t(k, v)",
        config=cfg))
    engine.materialize(Model(
        "sh1",
        sql="SELECT k, v, CAST('2024-01-01' AS TIMESTAMP) AS u"
            " FROM VALUES (1, 'a') AS t(k, v)",
        config=cfg))
    rows = {r.k: r for r in engine.table("sh1").collect()}
    assert rows[1].dbt_valid_to is None
    assert str(rows[2].dbt_valid_to) == "2024-06-02 00:00:00"


def test_snapshot_new_key_insert(engine):
    cfg = _cfg(strategy="timestamp", updated_at="u")
    engine.materialize(Model(
        "sn1", sql="SELECT 1 AS k, CAST('2024-01-01' AS TIMESTAMP) AS u",
        config=cfg))
    engine.materialize(Model(
        "sn1",
        sql="SELECT k, CAST('2024-01-01' AS TIMESTAMP) AS u"
            " FROM VALUES (1), (2) AS t(k)",
        config=cfg))
    rows = engine.table("sn1").collect()
    assert len(rows) == 2
    assert all(r.dbt_valid_to is None for r in rows)


def test_snapshot_composite_key(engine):
    from dbt_extrica_spark import Model

    cfg = {"materialized": "snapshot", "unique_key": ["k1", "k2"],
           "strategy": "timestamp", "updated_at": "u"}
    engine.materialize(Model(
        "scomp",
        sql="SELECT k1, k2, v, CAST('2024-01-01' AS TIMESTAMP) AS u FROM"
            " VALUES (1, 'x', 10), (1, 'y', 20) AS t(k1, k2, v)", config=cfg))
    engine.materialize(Model(
        "scomp",
        sql="SELECT k1, k2, v, CAST(u AS TIMESTAMP) AS u FROM VALUES"
            " (1, 'x', 11, '2024-01-02'), (1, 'y', 20, '2024-01-01')"
            " AS t(k1, k2, v, u)", config=cfg))
    rows = engine.table("scomp").collect()
    # (1,x) changed -> closed + new version; (1,y) unchanged
    assert len(rows) == 3
    open_rows = {(r.k1, r.k2, r.v) for r in rows if r.dbt_valid_to is None}
    assert open_rows == {(1, "x", 11), (1, "y", 20)}


def test_partitioned_snapshot_matches_full(engine):
    from dbt_extrica_spark import Model

    base = ("SELECT event_id, event_type, value, ts FROM {source:events}"
            " WHERE event_id <= 300")
    run2 = """SELECT event_id,
        CASE WHEN event_id <= 5 THEN 'moved' ELSE event_type END AS event_type,
        CASE WHEN event_id <= 10 THEN value * 2 ELSE value END AS value,
        CASE WHEN event_id <= 10 THEN ts + INTERVAL '1' HOUR ELSE ts END AS ts
        FROM {source:events} WHERE event_id <= 350"""
    for name, extra in [("snap_part", {"partition_by": ["event_type"]}),
                        ("snap_flat", {})]:
        cfg = {"materialized": "snapshot", "unique_key": "event_id",
               "strategy": "timestamp", "updated_at": "ts", **extra}
        engine.materialize(Model(name, sql=base, config=cfg))
        engine.materialize(Model(name, sql=run2, config=cfg))
    cols = ["event_id", "event_type", "value", "ts", "dbt_updated_at",
            "dbt_valid_from", "dbt_valid_to", "dbt_scd_id"]
    got = sorted(tuple(str(r[c]) for c in cols)
                 for r in engine.table("snap_part").collect())
    want = sorted(tuple(str(r[c]) for c in cols)
                  for r in engine.table("snap_flat").collect())
    assert got == want and len(got) > 300
