"""Property-based tests (hypothesis): invariants the goldens can't sweep.

Strategy notes: Spark round-trips are expensive, so properties that need the
engine evaluate BATCHED — hypothesis generates the cases, one VALUES query
evaluates them all, and the DuckDB oracle cross-checks in one shot.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from dbt_extrica_spark.connections import split_statements
from dbt_extrica_spark.operators.seeds import infer_column

# -- statement splitting ----------------------------------------------------

_stmt = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N"), whitelist_characters=" _,()="
    ),
    min_size=1, max_size=40,
).map(lambda s: "SELECT " + s.strip()).filter(lambda s: len(s) > 7)


@given(st.lists(_stmt, min_size=1, max_size=6))
def test_split_roundtrip(statements):
    script = "; ".join(statements) + ";"
    assert split_statements(script) == [s.strip() for s in statements]


@given(st.lists(_stmt, min_size=1, max_size=4))
def test_split_with_quoted_semicolons(statements):
    # embed a quoted ';' in the first statement — must not split there
    statements = [statements[0] + " WHERE x = 'a;b'"] + statements[1:]
    script = ";".join(statements)
    assert split_statements(script) == [s.strip() for s in statements]


# -- seed type inference -----------------------------------------------------

@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=30))
def test_integers_infer_integer(xs):
    vals = [str(x) for x in xs]
    got = infer_column(vals)
    if all(str(x) in ("0", "1") for x in xs):
        assert got == "boolean"  # agate tester order
    else:
        assert got == "integer"


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=20),
       st.floats(allow_nan=False, allow_infinity=False,
                 min_value=-1e6, max_value=1e6))
def test_one_decimal_makes_double(xs, f):
    if float(f).is_integer():
        f += 0.5
    vals = [str(x) for x in xs] + [repr(f)]
    assert infer_column(vals) == "double"


@given(st.lists(st.dates(min_value=dt.date(1970, 1, 1),
                         max_value=dt.date(2100, 1, 1)),
                min_size=1, max_size=20))
def test_iso_dates_infer_date(ds):
    assert infer_column([d.isoformat() for d in ds]) == "date"


# -- datediff antisymmetry (batched through Spark) ---------------------------

_TS = st.datetimes(min_value=dt.datetime(1980, 1, 5),
                   max_value=dt.datetime(2060, 12, 20))


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(_TS, _TS), min_size=40, max_size=40))
def test_datediff_antisymmetric_and_oracle_parity(spark, duck, pairs):
    """For every part: datediff(a,b) == -datediff(b,a), AND the Spark
    expression equals the DuckDB field-difference formulation."""
    from dbt_extrica_spark.functions import shims

    rows = ", ".join(
        f"(TIMESTAMP '{a:%Y-%m-%d %H:%M:%S}', TIMESTAMP '{b:%Y-%m-%d %H:%M:%S}')"
        for a, b in pairs
    )
    parts = ["year", "quarter", "month", "day", "week", "hour",
             "minute", "second"]
    fwd = ", ".join(
        f"CAST({shims.datediff('a', 'b', p)} AS BIGINT) AS f_{p}" for p in parts
    )
    rev = ", ".join(
        f"CAST({shims.datediff('b', 'a', p)} AS BIGINT) AS r_{p}" for p in parts
    )
    got = spark.sql(
        f"SELECT {fwd}, {rev} FROM VALUES {rows} AS t(a, b)"
    ).collect()
    for r in got:
        for p in parts:
            assert r[f"f_{p}"] == -r[f"r_{p}"], (p, r)

    day = "(CAST(b AS DATE) - CAST(a AS DATE))"
    week = (
        f"({day} // 7 + CASE WHEN isodow(a) <= isodow(b) THEN"
        f" CASE WHEN a <= b THEN 0 ELSE -1 END ELSE"
        f" CASE WHEN a <= b THEN 1 ELSE 0 END END)"
    )
    yr = "(year(b) - year(a))"
    duck_rows = duck.sql(f"""
        SELECT CAST({yr} AS BIGINT) AS f_year,
               CAST({yr} * 4 + quarter(b) - quarter(a) AS BIGINT) AS f_quarter,
               CAST({yr} * 12 + month(b) - month(a) AS BIGINT) AS f_month,
               CAST({day} AS BIGINT) AS f_day,
               CAST({week} AS BIGINT) AS f_week,
               CAST({day} * 24 + hour(b) - hour(a) AS BIGINT) AS f_hour
        FROM (SELECT * FROM (VALUES {rows}) AS t(a, b))
    """).fetchall()
    for spark_r, duck_r in zip(got, duck_rows):
        for i, p in enumerate(["year", "quarter", "month", "day", "week",
                               "hour"]):
            assert spark_r[f"f_{p}"] == duck_r[i], (p, spark_r, duck_r)


@given(st.floats(min_value=0.05, max_value=0.95),
       st.floats(min_value=0.0, max_value=0.5))
@settings(max_examples=8, deadline=None)
def test_deterministic_sample_monotone_in_rate(rate, bump):
    # shared module-level session from conftest's cached getter
    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark.extensions import sampling

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.range(0, 400).withColumnRenamed("id", "k")
    lo = {r.k for r in sampling.deterministic_sample(df, "k", rate).collect()}
    hi = {r.k for r in sampling.deterministic_sample(
        df, "k", min(rate + bump, 1.0)).collect()}
    assert lo <= hi  # hash-threshold membership is monotone in the rate


@given(st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4,
                unique=True))
@settings(max_examples=6, deadline=None)
def test_funnel_counts_non_increasing(steps):
    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark.extensions import analytics
    from pyspark.sql import functions as F

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    ev = spark.sql(
        "SELECT CAST(id % 13 AS BIGINT) AS user_id,"
        " timestamp_micros(CAST(1700000000000000 + id * 1000000 AS BIGINT))"
        " AS ts,"
        " element_at(array('a','b','c','d'), CAST(id % 4 AS INT) + 1)"
        " AS event_type"
        " FROM range(300)")
    out = analytics.funnel(ev, list(steps))
    counts = [r.n_users for r in out.orderBy("step").collect()]
    assert all(x >= y for x, y in zip(counts, counts[1:]))


@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=39),
              st.integers(min_value=0, max_value=39)),
    min_size=1, max_size=60,
).filter(lambda es: any(a != b for a, b in es)))
@settings(max_examples=4, deadline=None)
def test_connected_components_matches_union_find(edges):
    # pointer-jumping min-label propagation vs a pure-Python union-find on
    # arbitrary random graphs (self-loops dropped, duplicates allowed):
    # every node must receive the MINIMUM id reachable in its component
    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark.extensions import dedup

    edges = [(a, b) for a, b in edges if a != b]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # union-find roots are not necessarily the min id — normalize
    groups: dict[int, list[int]] = {}
    for n, r in expected.items():
        groups.setdefault(find(r), []).append(n)
    want = {n: min(members) for members in groups.values() for n in members}

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(edges, "id_a INT, id_b INT")
    got = {r.id: r.component
           for r in dedup.connected_components(df).collect()}
    assert got == want


@given(st.sets(st.integers(min_value=-10**9, max_value=10**9),
               min_size=1, max_size=120),
       st.sets(st.integers(min_value=-10**9, max_value=10**9),
               min_size=1, max_size=120))
@settings(max_examples=4, deadline=None)
def test_theta_sketch_union_and_setops_match_replay(xs, ys):
    """Theta/KMV invariants on arbitrary integer sets: (1) build equals
    the pure-python k-smallest-xxh64 replay; (2) union of the two
    sketches == sketch of the set union (the KMV mergeability that the
    streaming maintenance relies on); (3) the intersect/difference
    theta rule matches the replay, exact when neither side is full."""
    from dbt_extrica_spark.extensions import sketch as sk
    from dbt_extrica_spark.functions.xxh64 import xxh64_signed
    from dbt_extrica_spark.session import get_spark

    k = 16

    def ref(vals):
        return sorted({xxh64_signed(str(v).encode()) for v in vals})[:k]

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(
        [(0, v) for v in xs] + [(1, v) for v in ys], "g int, item bigint")
    built = sk.theta_build(df, "item", ["g"], k=k)
    got: dict = {}
    for r in built.collect():
        got.setdefault(r.g, []).append(r.h)
    assert {g: sorted(v) for g, v in got.items()} == \
        {0: ref(xs), 1: ref(ys)}

    un = sorted(r.h for r in sk.theta_union(built, [], k=k).collect())
    assert un == ref(xs | ys)

    a, b = ref(xs), ref(ys)
    alive = [s[-1] for s in (a, b) if len(s) >= k]
    th = min(alive) if alive else None
    for op, pool in (("intersect", set(a) & set(b)),
                     ("difference", set(a) - set(b))):
        cand = {h for h in pool if th is None or h < th}
        e = (len(cand) if th is None
             else (len(cand) << 64) // (th + (1 << 63) + 1))
        r = sk.theta_set_op(built.where("g = 0").select("h"),
                            built.where("g = 1").select("h"),
                            k=k, op=op).collect()[0]
        assert (r.n_candidates, r.theta_h, r.est) == (len(cand), th, e)
        if th is None:
            # exact mode: the estimate IS the true overlap of the sets
            true = len(xs & ys) if op == "intersect" else len(xs - ys)
            assert r.est == true
