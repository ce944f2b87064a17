"""Funnel and retention-cohort operator semantics on hand-built events."""

import pytest

from dbt_extrica_spark.extensions import analytics


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, f"2024-01-{d:02d} {h:02d}:00:00", t) for u, d, h, t in rows],
        "user_id bigint, ts_s string, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")


def test_funnel_requires_strict_order(spark):
    rows = [
        (1, 1, 1, "signup"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
        # user 2 clicked BEFORE signup -> never completes step 2
        (2, 2, 1, "click"), (2, 3, 1, "signup"),
        # user 3 signup+click, no purchase
        (3, 1, 1, "signup"), (3, 1, 2, "click"),
    ]
    out = {r.step: (r.event_type, r.n_users)
           for r in analytics.funnel(_ev(spark, rows),
                                     ["signup", "click", "purchase"])
           .collect()}
    assert out == {1: ("signup", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_first_touch_blocks_later_paths(spark):
    # first-touch: step-2 time anchors to the EARLIEST qualifying click;
    # a purchase between signup and that click does not count, a later one
    # does
    rows = [
        (1, 1, 1, "signup"), (1, 2, 1, "click"),
        (1, 1, 12, "purchase"),            # before first click -> no
    ]
    out = {r.step: r.n_users
           for r in analytics.funnel(_ev(spark, rows),
                                     ["signup", "click", "purchase"])
           .collect()}
    assert out == {1: 1, 2: 1, 3: 0}


def test_funnel_empty_steps_raises(spark):
    with pytest.raises(ValueError):
        analytics.funnel(_ev(spark, [(1, 1, 1, "signup")]), [])


def test_retention_cohort_counts(spark):
    rows = [
        # cohort Jan 1: users 1,2; user 1 returns day+1 and day+2,
        # user 2 only day+2
        (1, 1, 5, "view"), (1, 2, 5, "view"), (1, 3, 5, "view"),
        (2, 1, 9, "view"), (2, 3, 9, "view"),
        # cohort Jan 2: user 3, returns day+1
        (3, 2, 1, "view"), (3, 3, 1, "view"),
    ]
    out = {(str(r.cohort_date), r.day_offset): r.n_users
           for r in analytics.retention_cohorts(_ev(spark, rows)).collect()}
    assert out == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 2,
        ("2024-01-02", 0): 1, ("2024-01-02", 1): 1,
    }


def test_retention_max_offset(spark):
    rows = [(1, 1, 1, "view"), (1, 20, 1, "view")]
    out = analytics.retention_cohorts(_ev(spark, rows), max_offset=7)
    assert {r.day_offset for r in out.collect()} == {0}


def test_auto_salted_agg_adapts_and_matches(spark):
    from pyspark.sql import functions as F

    from dbt_extrica_spark.operators import skew

    # 90% of rows share one key -> probe must see heavy skew
    df = spark.sql(
        "SELECT CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id) END"
        " AS k, CAST(id AS DOUBLE) AS v FROM range(20000)")
    assert skew.probe_key_skew(df, ["k"]) > 0.5
    uniform = spark.sql(
        "SELECT concat('k', id % 500) AS k, CAST(id AS DOUBLE) AS v"
        " FROM range(20000)")
    assert skew.probe_key_skew(uniform, ["k"]) < 0.2

    expected = {(r.k, r.n, r.s) for r in
                df.groupBy("k").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("s")).collect()}
    got = {(r.k, r.n, r.s) for r in
           skew.auto_salted_agg(df, ["k"],
                                {"n": "count(1)", "s": "sum(v)"}).collect()}
    assert got == expected


def test_funnel_no_matching_events_reports_zeros(spark):
    # regression (round-6 advice): with zero step-matching events the
    # per-user frame is empty and sum() is NULL — the funnel must say 0
    out = {r.step: r.n_users
           for r in analytics.funnel(_ev(spark, [(1, 1, 1, "browse")]),
                                     ["signup", "click"]).collect()}
    assert out == {1: 0, 2: 0}


def test_pagerank_matches_pure_python_replay(spark):
    # tiny digraph with a cycle, a dangling node (D has no out-edges),
    # and asymmetric outdegrees; 3 iterations replayed in pure Python
    # with the SAME integer semantics must match every BIGINT rank
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.id: r.rank
           for r in analytics.pagerank(df, "src", "dst",
                                       iterations=3).collect()}

    scale, damping = 10**12, 85
    nodes = {n for e in edges for n in e}
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {n: scale for n in nodes}
    base = scale * (100 - damping) // 100
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += ranks[s] // out[s]
        ranks = {n: base + damping * inc[n] // 100 for n in nodes}
    assert got == ranks
    # ranks genuinely differ (a uniform result would gate nothing)
    assert len(set(got.values())) >= 3


def test_pagerank_validates_damping_and_handles_nulls(spark):
    import pytest

    df = spark.createDataFrame([(1, 2), (None, 3), (2, None)],
                               "src bigint, dst bigint")
    with pytest.raises(ValueError, match="damping_pct"):
        analytics.pagerank(df, "src", "dst", damping_pct=100)
    # NULL endpoints are dropped, not propagated into the node set
    got = {r.id for r in analytics.pagerank(df, "src", "dst",
                                            iterations=1).collect()}
    assert got == {1, 2}


def test_triangle_count_known_graphs(spark):
    def count(edges):
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        return analytics.triangle_count(df, "src", "dst") \
            .collect()[0].n_triangles

    # K4: 4 triangles; C5 (5-cycle): 0; two triangles sharing edge (1,2)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert count(k4) == 4
    assert count([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]) == 0
    assert count([(1, 2), (2, 3), (3, 1), (1, 4), (4, 2)]) == 2
    # direction, duplicates and self-loops are ignored
    assert count([(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]) == 1


def test_triangle_count_matches_pure_python_replay(spark):
    # deterministic pseudo-random graph (md5-derived endpoints: 21
    # nodes, 84 distinct edges, 88 triangles); brute-force O(n^3) replay
    import hashlib

    edges = []
    for i in range(120):
        h = hashlib.md5(str(i).encode()).hexdigest()
        edges.append((int(h[:4], 16) % 21, int(h[4:8], 16) % 21))
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = analytics.triangle_count(df, "src", "dst") \
        .collect()[0].n_triangles
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    expected = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:] if b in adj[a]
        for c in nodes if c > b and c in adj[a] and c in adj[b])
    assert got == expected and expected > 0

    # per-node mode: every node accounted for, incidences sum to 3x
    per = {r.id: r.n_triangles
           for r in analytics.triangle_count(
               df, "src", "dst", per_node=True).collect()}
    assert set(per) == set(nodes)
    assert sum(per.values()) == 3 * expected
    # spot-check one node against the replay
    some = nodes[0]
    exp_node = sum(
        1 for i, b in enumerate(sorted(adj[some]))
        for c in sorted(adj[some])[i + 1:] if c in adj[b])
    assert per[some] == exp_node


def test_triangle_count_random_graphs_property(spark):
    """Randomized graphs (seeded) vs the brute-force replay — covers
    degree ties, hubs, isolated edges and both-direction duplicates
    that the fixed known-graph cases might miss."""
    import numpy as np

    for seed in (1, 2, 5):
        rng = np.random.RandomState(seed)
        n_nodes = int(rng.randint(8, 26))
        n_edges = int(rng.randint(10, 120))
        edges = [(int(rng.randint(0, n_nodes)),
                  int(rng.randint(0, n_nodes))) for _ in range(n_edges)]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = analytics.triangle_count(df, "src", "dst") \
            .collect()[0].n_triangles
        adj: dict = {}
        for u, v in edges:
            if u != v:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
        nodes = sorted(adj)
        exp = sum(
            1
            for i, a in enumerate(nodes)
            for b in nodes[i + 1:] if b in adj[a]
            for c in nodes if c > b and c in adj[a] and c in adj[b])
        assert got == exp, (seed, got, exp)


def test_pagerank_overflow_guard(spark):
    """Past the BIGINT bound, non-ANSI Spark sum overflow would WRAP
    silently and produce wrong ranks — the guard must raise instead
    (and the error must suggest a workable scale)."""
    import pytest

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                               "src bigint, dst bigint")
    # 3 nodes * 2^62 * 85 > 2^63 - 1 -> must raise before any iteration
    with pytest.raises(ValueError, match="overflow"):
        analytics.pagerank(df, "src", "dst", iterations=1, scale=2**62)
    # a scale just UNDER the bound still runs (guard is not overbroad):
    # 3 * 85 * (2^63 // 400) < 2^63 - 1, and the intermediate
    # damping_pct * inc product fits too
    ok = analytics.pagerank(df, "src", "dst", iterations=2,
                            scale=2**63 // 400).collect()
    assert len(ok) == 3
