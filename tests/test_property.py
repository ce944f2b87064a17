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
    # local_threshold=0 exercises the DISTRIBUTED pointer-jumping loop
    # against the reference; the default exercises the driver-local
    # union-find fast path — both must match the reference exactly
    got = {r.id: r.component
           for r in dedup.connected_components(
               df, local_threshold=0).collect()}
    assert got == want
    got_local = {r.id: r.component
                 for r in dedup.connected_components(df).collect()}
    assert got_local == want


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


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=1),
                          st.sampled_from(list("abcdefgh")),
                          st.integers(min_value=0, max_value=9)),
                min_size=1, max_size=80))
@settings(max_examples=4, deadline=None)
def test_misra_gries_build_merge_match_replay_and_bound(rows):
    """MG invariants on arbitrary weighted multisets (r12 verdict #4:
    extend the theta property-test pattern to the sketch family):
    (1) per-group mg_build equals the pure-Python truncation replay
    bit-for-bit; (2) mg_merge of the group summaries equals the replay
    of the merge; (3) the SEMANTIC guarantee holds against the exact
    counts: 0 <= exact - est <= D (total decrement along the chain)
    and D * (k+1) <= n — so every token above n/(k+1) survives."""
    from dbt_extrica_spark.extensions import sketch as sk
    from dbt_extrica_spark.session import get_spark

    k = 3

    def replay(counts: dict, kk: int):
        """(summary dict token->est, decrement) of the order-free MG
        truncation: rank by (cnt desc, token asc), subtract the
        (kk+1)-th largest count."""
        ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        ck1 = ranked[kk][1] if len(ranked) > kk else 0
        return ({t: c - ck1 for t, c in ranked[:kk] if c > ck1}, ck1)

    exact: dict[int, dict[str, int]] = {0: {}, 1: {}}
    for g, tok, w in rows:
        exact[g][tok] = exact[g].get(tok, 0) + w

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows, "g int, token string, w bigint")
    got_summary, got_stats = sk.mg_build(
        df, "token", ["g"], k=k, return_stats=True, weight_col="w")
    got = {0: {}, 1: {}}
    for r in got_summary.collect():
        got[r.g][r.token] = r.est

    want, decs = {}, {}
    for g in (0, 1):
        nonzero = {t: c for t, c in exact[g].items() if c > 0}
        want[g], decs[g] = replay(nonzero, k)
    # zero-weight-only groups produce cnt=0 rows in the engine (SUM of
    # zero weights), which the replay's nonzero filter mirrors via the
    # est > 0 drop — but a cnt=0 row occupying a rank slot would differ:
    # pin exact equality per group
    assert got == {g: want[g] for g in (0, 1)}, (got, want)

    # merge the two group summaries into one global summary
    merged, mstats = sk.mg_merge(
        got_summary.select("token", "est"), "token", k=k,
        return_stats=True)
    got_m = {r.token: r.est for r in merged.collect()}
    summed: dict[str, int] = {}
    for g in (0, 1):
        for t, c in want[g].items():
            summed[t] = summed.get(t, 0) + c
    want_m, dec_m = replay(summed, k)
    assert got_m == want_m, (got_m, want_m)

    # semantic MG bound vs the EXACT totals (independent of the replay)
    total: dict[str, int] = {}
    for g in (0, 1):
        for t, c in exact[g].items():
            total[t] = total.get(t, 0) + c
    n = sum(total.values())
    s = got_stats.collect()[0]
    m = mstats.collect()[0]
    d_chain = decs[0] + decs[1] + dec_m
    assert s.dec == decs[0] + decs[1] and s.n == n
    assert m.dec == dec_m
    for t, c in total.items():
        est = got_m.get(t, 0)
        assert 0 <= c - est <= d_chain, (t, c, est, d_chain)
    assert d_chain * (k + 1) <= n or n == 0


@given(st.lists(st.integers(min_value=0, max_value=255),
                min_size=1, max_size=200),
       st.lists(st.integers(min_value=0, max_value=255),
                min_size=0, max_size=200))
@settings(max_examples=3, deadline=None)
def test_qdigest_build_merge_rank_guarantee(xs, ys):
    """Q-digest invariants on arbitrary integer shards: (1) count mass
    is preserved through build AND merge; (2) digest size stays
    sketch-bounded (<= 3k nodes); (3) every quantile estimate from the
    MERGED digest satisfies the rank-interval guarantee against the
    TRUE sorted data: [count(<est), count(<=est)] overlaps
    ceil(q*n) +- eps*n with eps = log2(U)/k — the actual q-digest
    bound, checked semantically (no shared code with the builder)."""
    import math

    from dbt_extrica_spark.extensions import sketch as sk
    from dbt_extrica_spark.session import get_spark

    k, bits = 8, 8
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    rows = [(0, v) for v in xs] + [(1, v) for v in ys]
    df = spark.createDataFrame(rows, "shard int, v bigint")
    dig = sk.qdigest_build(df, "v", ["shard"], k=k, bits=bits)
    per_shard = {(r.shard): 0 for r in dig.collect()}
    got = dig.collect()
    for shard, vals in ((0, xs), (1, ys)):
        mass = sum(r.cnt for r in got if r.shard == shard)
        assert mass == len(vals)
        assert sum(1 for r in got if r.shard == shard) <= 3 * k

    merged = sk.qdigest_merge(dig.select("node", "cnt"), k=k, bits=bits)
    mrows = merged.collect()
    all_vals = sorted(xs + ys)
    n = len(all_vals)
    assert sum(r.cnt for r in mrows) == n
    assert len(mrows) <= 3 * k

    counts = {int(r.node): int(r.cnt) for r in mrows}
    eps = bits / k
    for q in (0.1, 0.5, 0.9):
        est = sk._qd_quantile(counts, n, q, bits)
        target = max(1, math.ceil(q * n))
        lo = sum(1 for v in all_vals if v < est)
        hi = sum(1 for v in all_vals if v <= est)
        assert lo <= target + eps * n and hi >= target - eps * n, (
            q, est, lo, hi, target, eps, n)


@given(st.lists(st.sampled_from(["tok%d" % i for i in range(12)]),
                min_size=1, max_size=150))
@settings(max_examples=3, deadline=None)
def test_cms_matches_independent_md5_replay(tokens):
    """CMS invariants on arbitrary token streams: the sketch table and
    every estimate equal an INDEPENDENT pure-Python replay (hashlib md5
    vs Spark md5 — different implementations of the same spec), and the
    one-sided error guarantee holds: estimate >= exact for every token,
    with total overestimate bounded by depth * n."""
    import hashlib

    from dbt_extrica_spark.extensions import sketch as sk
    from dbt_extrica_spark.session import get_spark

    width, depth = 16, 3  # narrow on purpose: force collisions

    def bucket(tok: str, seed: int) -> int:
        h = hashlib.md5(f"{tok}#{seed}".encode()).hexdigest()[:8]
        return int(h, 16) % width

    cells: dict[tuple[int, int], int] = {}
    exact: dict[str, int] = {}
    for t in tokens:
        exact[t] = exact.get(t, 0) + 1
        for d in range(depth):
            cells[(d, bucket(t, d))] = cells.get((d, bucket(t, d)), 0) + 1

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    got_cells = {(r.d, r.bucket): r.c
                 for r in sk.count_min_sketch(df, width, depth).collect()}
    assert got_cells == cells

    est = {r.token: (r.exact, r.estimate)
           for r in sk.cms_estimates(df, width, depth).collect()}
    n = len(tokens)
    assert set(est) == set(exact)
    for t, c in exact.items():
        want = min(cells[(d, bucket(t, d))] for d in range(depth))
        assert est[t] == (c, want)
        assert want >= c and want - c <= n


@given(st.sets(st.text(alphabet="abcxyz019", min_size=1, max_size=8),
               min_size=1, max_size=40),
       st.sets(st.text(alphabet="abcxyz019", min_size=1, max_size=8),
               min_size=1, max_size=40))
@settings(max_examples=3, deadline=None)
def test_bloom_matches_independent_md5_replay(block, probes):
    """Bloom filter on arbitrary strings vs an INDEPENDENT pure-Python
    replay (hashlib md5 vs Spark md5): the bitmap words AND every
    membership verdict must match bit-for-bit, and true members are
    never reported absent (no false negatives, the Bloom contract)."""
    import hashlib

    from dbt_extrica_spark.extensions import sketch
    from dbt_extrica_spark.session import get_spark

    m, nh, w = 1 << 9, 3, 63

    def pos(item: str, seed: int) -> int:
        h = hashlib.md5(f"{item}#{seed}".encode()).hexdigest()[:8]
        return int(h, 16) % m

    words: dict[int, int] = {}
    for it in block:
        for j in range(nh):
            p = pos(it, j)
            words[p // w] = words.get(p // w, 0) | (1 << (p % w))

    def member(it: str) -> bool:
        return all(words.get(pos(it, j) // w, 0) >> (pos(it, j) % w) & 1
                   for j in range(nh))

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    bdf = spark.createDataFrame([(x,) for x in block], "item string")
    bloom = sketch.bloom_build(bdf, "item", m_bits=m, n_hashes=nh)
    assert {(r.word, r.bits) for r in bloom.collect()} == \
        set(words.items())

    pdf = spark.createDataFrame([(x,) for x in block | probes],
                                "item string")
    got = {r.item: r.maybe_member
           for r in sketch.bloom_contains(
               pdf, "item", bloom.localCheckpoint(eager=True),
               m_bits=m, n_hashes=nh).collect()}
    assert got == {x: member(x) for x in block | probes}
    assert all(got[x] for x in block)


@given(st.lists(st.text(alphabet="abcd", min_size=0, max_size=6),
                min_size=2, max_size=60),
       st.integers(min_value=2, max_value=7))
@settings(max_examples=3, deadline=None)
def test_sorted_neighborhood_matches_window_replay(keys, window):
    """SNM candidates on arbitrary keys (duplicates included — the id
    tie-break must totalize the order): the distributed two-phase-rank
    + bucket-join pair set must equal the pure-Python sliding-window
    replay over the (key, id)-sorted order, for any window size."""
    from dbt_extrica_spark.extensions import dedup
    from dbt_extrica_spark.session import get_spark

    rows = list(enumerate(keys))  # (id, key); ids unique, keys may dup
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    d = window - 1
    want = {(order[i][0], order[j][0])
            for i in range(len(order))
            for j in range(i + 1, min(i + d + 1, len(order)))}

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows, "id int, k string")
    got = {(r.id_a, r.id_b)
           for r in dedup.sorted_neighborhood_pairs(
               df, "id", "k", window=window, partitions=3).collect()}
    assert got == want


@given(st.lists(st.integers(min_value=-50, max_value=50),
                min_size=0, max_size=80),
       st.integers(min_value=1, max_value=9))
@settings(max_examples=3, deadline=None)
def test_equi_depth_histogram_matches_replay(vals, buckets):
    """Equi-depth histogram on arbitrary (duplicate-heavy) values:
    bucket masses, ranges, and distinct counts must equal the
    pure-Python replay of bucket = (rank-1)*B div n over the
    (value, id)-totalized order; bucket sizes differ by at most one
    and lo/hi nest monotonically."""
    from dbt_extrica_spark.extensions import profiling
    from dbt_extrica_spark.session import get_spark

    rows = list(enumerate(vals))  # (id, value)
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    n = len(order)
    want = {}
    for r0, (i, v) in enumerate(order):
        b = r0 * buckets // n
        e = want.setdefault(b, [0, v, v, set()])
        e[0] += 1
        e[1] = min(e[1], v)
        e[2] = max(e[2], v)
        e[3].add(v)

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame([(v, i) for i, v in rows] or
                               [(None, None)],
                               "v int, i int")
    got = {r.bucket: (r.n_rows, r.lo, r.hi, r.n_distinct)
           for r in profiling.equi_depth_histogram(
               df, "v", "i", buckets=buckets, partitions=3).collect()}
    assert got == {b: (c, lo, hi, len(ds))
                   for b, (c, lo, hi, ds) in want.items()}
    if n:
        sizes = [got[b][0] for b in sorted(got)]
        assert max(sizes) - min(sizes) <= 1


@given(st.lists(st.tuples(st.integers(min_value=1, max_value=10 ** 6),
                          st.sampled_from(["a", "b", "c"])),
                min_size=0, max_size=60),
       st.integers(min_value=1, max_value=8))
@settings(max_examples=3, deadline=None)
def test_priority_sample_matches_replay(rows_in, k):
    """DLT priority sampling on arbitrary positive integer weights: the
    grouped AND global selections, priorities, ranks, and est_weight
    estimator values must equal a pure-Python replay bit-for-bit (the
    priority is one correctly-rounded IEEE division off an exact-double
    md5 integer, so == on floats is the right assertion, not approx)."""
    import hashlib

    from dbt_extrica_spark.extensions import sampling
    from dbt_extrica_spark.session import get_spark

    rows = [(i, w, g) for i, (w, g) in enumerate(rows_in)]

    def prio(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return w / ((h + 1) / 2 ** 32)

    def select(pop):  # pop = [(id, w)] -> {id: (prio, rank, est)}
        ranked = sorted(pop, key=lambda t: (-prio(t[0], t[1]), t[0]))
        tau = prio(*ranked[k]) if len(ranked) > k else 0.0
        return {i: (prio(i, w), r + 1, max(float(w), tau))
                for r, (i, w) in enumerate(ranked[:k])}

    want_global = select([(i, w) for i, w, _ in rows])
    want_group = {}
    for g in {g for _, _, g in rows}:
        for i, v in select([(i, w) for i, w, gg in rows if gg == g]).items():
            want_group[i] = v

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows or [(None, None, None)],
                               "id int, w int, g string")
    if not rows:
        df = df.where("id IS NOT NULL")
    got_global = {r.id: (r.priority, r.sample_rank, r.est_weight)
                  for r in sampling.priority_sample(
                      df, "id", "w", k=k).collect()}
    got_group = {r.id: (r.priority, r.sample_rank, r.est_weight)
                 for r in sampling.priority_sample(
                     df, "id", "w", k=k, group_cols=["g"]).collect()}
    assert got_global == want_global
    assert got_group == want_group


@given(st.lists(st.lists(st.sampled_from(["ox", "fox", "box", "axe"]),
                         min_size=0, max_size=8),
                min_size=1, max_size=25),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=3, deadline=None)
def test_collocations_match_replay(docs, min_count):
    """PMI collocations on arbitrary tiny corpora: pair counts, unigram
    counts, lift doubles, and the (lift DESC, w1, w2) rank order must
    equal the pure-Python replay exactly (lift is products + one
    division on exact doubles — bit-comparable)."""
    from collections import Counter

    from dbt_extrica_spark.extensions import textstats
    from dbt_extrica_spark.session import get_spark

    texts = [" ".join(d) for d in docs]
    toks = [t.lower().strip().split() for t in texts]
    uni = Counter(w for d in toks for w in d)
    n = sum(uni.values())
    pairs = Counter((d[i], d[i + 1]) for d in toks
                    for i in range(len(d) - 1))
    scored = [(w1, w2, c, uni[w1], uni[w2],
               (float(c) * float(n)) / (float(uni[w1]) * float(uni[w2])))
              for (w1, w2), c in pairs.items() if c >= min_count]
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    want = [t + (r + 1,) for r, t in enumerate(scored[:10])]

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r.w1, r.w2, r.pair_n, r.w1_n, r.w2_n, r.lift, r.rank)
           for r in textstats.collocations(
               df, "text", min_count=min_count, top_k=10)
           .orderBy("rank").collect()]
    assert got == want


@given(st.lists(st.tuples(st.integers(min_value=-100, max_value=100),
                          st.sampled_from(["a", "b"])),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=3, deadline=None)
def test_mad_outliers_matches_replay(rows_in, k):
    """Per-group exact lower median + MAD + Hampel flags on arbitrary
    integer values (duplicate-heavy — the id tie-break totalizes, and
    MAD-0 degeneracy must replay too) vs a pure-Python replay."""
    from dbt_extrica_spark.extensions import profiling
    from dbt_extrica_spark.session import get_spark

    rows = [(i, float(v), g) for i, (v, g) in enumerate(rows_in)]

    want = {}
    for g in {g for _, _, g in rows}:
        vi = [(v, i) for i, v, gg in rows if gg == g]
        # lower median: the value at rank ceil(n/2) of the (v, i) order
        med = sorted(vi)[(len(vi) + 1) // 2 - 1][0]
        devs = [(abs(v - med), i) for v, i in vi]
        mad = sorted(devs)[(len(devs) + 1) // 2 - 1][0]
        n_out = sum(1 for d, _ in devs if d > k * mad)
        want[g] = (len(vi), med, mad, n_out)

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows, "i int, v double, g string")
    got = {r.g: (r.n, r.median, r.mad, r.n_outliers)
           for r in profiling.mad_outliers(
               df, "v", "i", ["g"], k=float(k)).collect()}
    assert got == want


@given(st.lists(st.tuples(st.integers(min_value=-1000, max_value=1000),
                          st.integers(min_value=-1000, max_value=1000),
                          st.integers(min_value=-1000, max_value=1000)),
                min_size=2, max_size=40))
@settings(max_examples=3, deadline=None)
def test_correlation_matrix_matches_replay(rows_in):
    """Correlation matrix on arbitrary integer triples vs a pure-Python
    replay of the exact fixed-point pipeline (FLOOR(term*scale) sums,
    then the single-rounding formula chain) — float == assertions, not
    approx, because every op is exactly rounded."""
    import math

    from dbt_extrica_spark.extensions import profiling
    from dbt_extrica_spark.session import get_spark

    sc = 1e6
    rows = [(float(a), float(b), float(c)) for a, b, c in rows_in]
    cols = ["a", "b", "c"]
    n = len(rows)

    def fx_sum(vals):
        return float(sum(math.floor(v * sc) for v in vals)) / sc

    s = {i: fx_sum([r[i] for r in rows]) for i in range(3)}
    g = {(i, j): fx_sum([r[i] * r[j] for r in rows])
         for i in range(3) for j in range(i, 3)}
    want = {}
    nd = float(n)
    for i in range(3):
        mu_i = s[i] / nd
        var_i = g[(i, i)] / nd - mu_i * mu_i
        for j in range(i, 3):
            mu_j = s[j] / nd
            var_j = g[(j, j)] / nd - mu_j * mu_j
            cov = g[(i, j)] / nd - mu_i * mu_j
            vv = var_i * var_j
            corr = cov / math.sqrt(vv) if vv > 0 else None
            want[(cols[i], cols[j])] = (n, cov, corr)

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r.col_i, r.col_j): (r.n, r.cov, r.corr)
           for r in profiling.correlation_matrix(df, cols).collect()}
    assert got == want


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=9),   # day-1
                          st.sampled_from(["a", "b"]),
                          st.integers(min_value=1, max_value=50)),
                min_size=1, max_size=30))
@settings(max_examples=3, deadline=None)
def test_gapfill_locf_matches_replay(rows_in):
    """Gapfill+locf on arbitrary sparse day series vs a pure-Python
    replay: dense grid per observed key, filled flags from bucket
    emptiness, counts, and the carry-forward (None before the first
    observation)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dbt_extrica_spark.extensions import timeseries
    from dbt_extrica_spark.session import get_spark

    rows = [(dt.datetime(2024, 5, 1 + d, 12), k, float(v))
            for d, k, v in rows_in]
    days = list(range(1, 11))
    want = {}
    for key in {k for _, k, _ in rows}:
        last = None
        for day in days:
            obs = [v for ts, k, v in rows if k == key and ts.day == day]
            n = len(obs)
            vsum = float(sum(obs)) if obs else None
            if obs:
                last = vsum
            want[(key, day)] = (n == 0, n, vsum, last)

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = timeseries.time_bucket_gapfill(
        df, "ts", "k", start="2024-05-01", end="2024-05-10",
        aggs={"n": F.count(F.lit(1)).cast("bigint"),
              "vsum": F.sum(F.col("v").cast("decimal(18,4)"))
              .cast("double")},
        locf_cols=["vsum"])
    got = {(r.k, r.bucket.day): (r.filled, r.n or 0, r.vsum, r.vsum_locf)
           for r in out.collect()}
    assert got == {k: (f, n, v, l) for k, (f, n, v, l) in want.items()}


@given(st.dictionaries(st.integers(min_value=0, max_value=10**6),
                       st.tuples(st.floats(min_value=1e-3, max_value=1e3,
                                           allow_nan=False,
                                           allow_infinity=False),
                                 st.integers(min_value=0, max_value=2),
                                 st.sampled_from(["x", "y"])),
                       min_size=1, max_size=60),
       st.integers(min_value=1, max_value=9))
@settings(max_examples=3, deadline=None)
def test_priority_state_batch_invariance(items, k):
    """r14 verdict #7: priority_state merge/truncate batch-invariance on
    arbitrary weighted multisets under arbitrary partitions — the theta
    argument, adversarially. (1) per-batch states folded through
    priority_state_merge equal the state built over all rows at once;
    (2) re-delivering a whole batch changes nothing (dropDuplicates
    idempotence); (3) priority_sample_finalize on the merged state
    equals priority_sample on the full data bit-for-bit (est_weight
    included — the estimator is the part a truncation bug would skew).
    Both global and grouped modes."""
    from dbt_extrica_spark.extensions import sampling
    from dbt_extrica_spark.session import get_spark

    rows = [(i, w, b, g) for i, (w, b, g) in sorted(items.items())]
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    full = spark.createDataFrame(rows, "id bigint, w double, b int, g string")

    for groups in (None, ["g"]):
        gsel = groups or []

        def key(r):
            return tuple(repr(r[c]) for c in
                         gsel + ["id", "weight", "priority"])

        want = sorted(key(r) for r in sampling.priority_state(
            full, "id", "w", k, group_cols=groups).collect())

        batches = [full.where(f"b = {i}") for i in range(3)]
        states = [sampling.priority_state(b, "id", "w", k,
                                          group_cols=groups)
                  for b in batches if b.count()]
        merged = states[0]
        for s in states[1:]:
            merged = merged.unionByName(s)
        # re-deliver the first batch verbatim (at-least-once)
        merged = merged.unionByName(states[0])
        merged = sampling.priority_state_merge(merged, "id", k,
                                               group_cols=groups)
        got = sorted(key(r) for r in merged.collect())
        assert got == want

        def fkey(r):
            return tuple(repr(r[c]) for c in
                         gsel + ["id", "priority", "sample_rank",
                                 "est_weight"])

        direct = sorted(fkey(r) for r in sampling.priority_sample(
            full, "id", "w", k, group_cols=groups).collect())
        replay = sorted(fkey(r) for r in sampling.priority_sample_finalize(
            merged, "id", k, group_cols=groups).collect())
        assert replay == direct


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2),
                          st.lists(st.floats(min_value=-10, max_value=10,
                                             allow_nan=False,
                                             allow_infinity=False),
                                   min_size=3, max_size=3)),
                min_size=1, max_size=40))
@settings(max_examples=3, deadline=None)
def test_gram_state_merge_bit_equality(rows_in):
    """r14 verdict #7: gram_state_merge bit-equality under arbitrary
    batch splits — per-batch fixed-point states element-wise summed
    must equal the state built over all rows at once EXACTLY (DECIMAL
    cells compared as exact values, no tolerance: integer addition is
    order-free). Plus the raise paths: a NULL element, an empty
    vector, and a mixed-dimension vector each poison the whole build
    loudly instead of skewing it."""
    import pytest as _pytest

    from dbt_extrica_spark.extensions import similarity
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    full = spark.createDataFrame(rows_in, "b int, v array<double>")

    def cells(df):
        return sorted((r.i, r.j, str(r.p), str(r.sv), r.n)
                      for r in df.collect())

    want = cells(similarity.gram_state(full, "v"))
    states = [similarity.gram_state(full.where(f"b = {i}"), "v")
              for i in range(3)]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    assert cells(similarity.gram_state_merge(merged)) == want

    for bad in ([[1.0, None, 2.0]], [[]], [[1.0, 2.0]]):
        poisoned = full.unionByName(
            spark.createDataFrame([(9, v) for v in bad],
                                  "b int, v array<double>"))
        with _pytest.raises(Exception, match="gram_matrix"):
            similarity.gram_state(poisoned, "v").collect()


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2),
                          st.text(alphabet="abcxyz019", min_size=1,
                                  max_size=6)),
                min_size=1, max_size=60))
@settings(max_examples=3, deadline=None)
def test_ams_matches_hashlib_replay_and_merges(rows_in):
    """AMS F2 sketch on arbitrary string multisets: (1) every estimator
    cell equals an INDEPENDENT hashlib-md5 replay; (2) per-batch
    sketches folded through ams_merge equal the full build bit-for-bit
    (linearity); (3) the median-of-means estimate replays from the
    cells by the documented lower-median rule."""
    import hashlib

    from dbt_extrica_spark.extensions import sketch as sk
    from dbt_extrica_spark.session import get_spark

    r, means = 8, 2
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(rows_in, "b int, item string")

    def sign(item, d):
        h = int(hashlib.md5(f"{item}@{d // 32}".encode())
                .hexdigest()[:8], 16)
        return ((h >> (d % 32)) % 2) * 2 - 1

    want = {d: sum(sign(x, d) for _, x in rows_in) for d in range(r)}
    st_ = sk.ams_build(df, "item", r=r)
    assert {row.d: row.z for row in st_.collect()} == want

    parts = [sk.ams_build(df.where(f"b = {i}"), "item", r=r)
             for i in range(3)]
    merged = sk.ams_merge(parts[0].unionByName(parts[1])
                          .unionByName(parts[2]))
    assert {row.d: row.z for row in merged.collect()} == want

    gs = r // means
    sums = sorted(sum(want[d] ** 2 for d in range(g * gs, (g + 1) * gs))
                  for g in range(means))
    est = sk.ams_f2_estimate(st_, means=means).collect()[0]
    assert est.f2_est == sums[(means + 1) // 2 - 1] / gs


@given(st.lists(st.tuples(st.integers(min_value=-50, max_value=50),
                          st.integers(min_value=-50, max_value=50)),
                min_size=2, max_size=25)
       .filter(lambda ps: len({x for x, _ in ps}) >= 2))
@settings(max_examples=4, deadline=None)
def test_trend_ols_matches_numpy_property(pts):
    """r14 verdict #6: trend_ols vs numpy.polyfit on adversarial inputs
    — arbitrary integer series (integer x/y keep the 1e6 fixed-point
    sums EXACT, so the closed forms must agree with numpy to float
    noise), PLUS the forced degeneracies: a constant-x series and a
    single-point series must yield NULL slope/intercept/r2 (dx = 0 has
    no line to fit), and a constant-y series NULL r2 — deterministic
    NULLs, never NaN. All four series evaluate in ONE batched pass
    (grouped mode)."""
    import math

    import numpy as np

    from dbt_extrica_spark.extensions.timeseries import trend_ols
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    rows = [("var", float(x), float(y)) for x, y in pts]
    rows += [("cx", 3.0, float(y)) for _, y in pts[:5]]    # constant x
    rows += [("one", 4.0, 9.0)]                            # single point
    # constant y over ALL drawn x's (>= 2 distinct by the filter — a
    # prefix slice could be accidentally constant-x and flip the case)
    rows += [("cy", float(x), 7.0) for x, _ in pts]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in trend_ols(df, "x", "y", ["g"]).collect()}

    xs = np.array([x for x, _ in pts], dtype=float)
    ys = np.array([y for _, y in pts], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    assert math.isclose(got["var"].slope, slope,
                        rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(got["var"].intercept, intercept,
                        rel_tol=1e-9, abs_tol=1e-9)
    # r2 against the direct definition (guard the constant-y draw)
    if len(set(ys.tolist())) > 1:
        pred = slope * xs + intercept
        ss_res = float(((ys - pred) ** 2).sum())
        ss_tot = float(((ys - ys.mean()) ** 2).sum())
        assert math.isclose(got["var"].r2, 1.0 - ss_res / ss_tot,
                            rel_tol=1e-9, abs_tol=1e-9)
    else:
        assert got["var"].r2 is None

    assert (got["cx"].slope is None and got["cx"].intercept is None
            and got["cx"].r2 is None)
    assert (got["one"].slope is None and got["one"].intercept is None
            and got["one"].r2 is None)
    assert got["cy"].slope == 0.0 and got["cy"].r2 is None


@given(st.lists(st.tuples(st.integers(min_value=1, max_value=8),    # key
                          st.sampled_from(["I", "U", "D"]),
                          st.integers(min_value=0, max_value=30),   # seq
                          st.integers(min_value=0, max_value=99)),  # payload
                min_size=1, max_size=30),
       st.lists(st.tuples(st.integers(min_value=1, max_value=8),
                          st.integers(min_value=0, max_value=99)),
                max_size=6, unique_by=lambda t: t[0]))
@settings(max_examples=4, deadline=None)
def test_apply_cdc_matches_dict_replay(changes, target_rows):
    """apply_cdc on arbitrary changelogs == a pure-Python dict replay of
    the documented winner rule (max (seq, D>U>I, row) per key; winning
    D removes, winning I/U upserts, delete-of-absent no-op), and
    re-applying the same batch to the RESULT converges (at-least-once
    idempotence)."""
    from dbt_extrica_spark.operators.merge import apply_cdc
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    tgt = spark.createDataFrame(target_rows or [(99, 0)], "id int, v int")
    if not target_rows:
        tgt = tgt.where("id < 0")  # empty target with a schema
    ch = spark.createDataFrame(changes, "id int, op string, seq int, v int")
    # dict replay of the winner rule — ranks mirror the operator's
    rank = {"D": 2, "U": 1, "I": 0}
    winners = {}
    for k, op, s, v in changes:
        cand = (s, rank[op], v)
        if k not in winners or cand > winners[k]:
            winners[k] = cand
    state = dict(target_rows)
    for k, (s, r, v) in winners.items():
        if r == 2:
            state.pop(k, None)
        else:
            state[k] = v
    want = sorted(state.items())

    out = apply_cdc(tgt, ch, "id", dest_columns=["id", "v"])
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == want
    # idempotent replay
    again = apply_cdc(out, ch, "id", dest_columns=["id", "v"])
    assert sorted((r.id, r.v) for r in again.collect()) == want


@given(st.lists(st.integers(min_value=-20, max_value=20), min_size=1,
                max_size=40),
       st.lists(st.integers(min_value=-20, max_value=20), min_size=1,
                max_size=40))
@settings(max_examples=4, deadline=None)
def test_ks_test_matches_ecdf_replay(xs, ys):
    """ks_test on arbitrary integer multisets == the direct ECDF
    definition (exact fractions via integer cross-products), including
    the smallest-attaining-value tie-break."""
    from fractions import Fraction

    from dbt_extrica_spark.extensions.profiling import ks_test
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    a = spark.createDataFrame([(float(v),) for v in xs], "v double")
    b = spark.createDataFrame([(float(v),) for v in ys], "v double")
    r = ks_test(a, b, "v").collect()[0]
    n1, n2 = len(xs), len(ys)
    vals = sorted(set(xs) | set(ys))
    best, at = Fraction(-1), None
    for v in vals:
        d = abs(Fraction(sum(1 for x in xs if x <= v), n1)
                - Fraction(sum(1 for y in ys if y <= v), n2))
        if d > best:
            best, at = d, v
    assert r.d_stat == best.numerator * n1 * n2 // best.denominator \
        / float(n1 * n2)
    assert r.at_value == float(at)
    assert (r.n_ref, r.n_cur) == (n1, n2)


@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=2,
                max_size=25))
@settings(max_examples=4, deadline=None)
def test_acf_matches_numpy_property(vals):
    """r15 verdict #6: acf vs a direct numpy replay on arbitrary integer
    series (integer values keep the 1e6 fixed-point cross-sums EXACT,
    so the closed forms must agree with the textbook definition to
    float noise), PLUS the forced degeneracies: a constant series
    yields NULL acf at every lag (zero variance), a single-point series
    yields NO lag rows (pairs = 0), and a NULL-riddled copy of the
    drawn series (a None interleaved after every value) must produce
    BIT-IDENTICAL acf to the dense copy — complete-case compaction
    before lagging, the statsmodels missing='drop' treatment. All four
    series evaluate in ONE batched pass."""
    import math

    import numpy as np

    from dbt_extrica_spark.extensions.timeseries import acf
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    max_lag = 4
    rows = [("var", i, float(v)) for i, v in enumerate(vals)]
    rows += [("nulls", i, None if v is None else float(v))
             for i, v in enumerate(
                 [x for v in vals for x in (None, v)])]
    rows += [("konst", i, 7.0) for i in range(6)]
    rows += [("one", 0, 3.0)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    got = {}
    for r in acf(df, "k", "o", "v", max_lag=max_lag).collect():
        got.setdefault(r.k, {})[r.lag] = r

    x = np.array(vals, dtype=float)
    n = len(x)
    m = x.mean()
    denom = float(((x - m) ** 2).sum())
    for k in range(1, max_lag + 1):
        if n - k <= 0:
            assert k not in got.get("var", {})
            continue
        r = got["var"][k]
        assert r.n == n and r.lag == k
        want = float(((x[:-k] - m) * (x[k:] - m)).sum()) / denom \
            if denom > 0 else None
        if want is None:
            assert r.acf is None
        else:
            assert math.isclose(r.acf, want, rel_tol=1e-9, abs_tol=1e-9)
        # NULL-compaction: bit-identical to the dense series
        assert got["nulls"][k].acf == r.acf
    assert all(r.acf is None for r in got["konst"].values())
    assert len(got["konst"]) == max_lag  # pairs exist, acf NULL
    assert "one" not in got  # no lag has a pair


@given(st.integers(min_value=-20, max_value=20),   # slope in halves
       st.integers(min_value=-50, max_value=50),   # intercept
       st.sampled_from([3, 5, 7]),                 # odd period
       st.data())
@settings(max_examples=4, deadline=None)
def test_decompose_seasonal_exact_recovery_property(a2, b, p, data):
    """r15 verdict #6: decompose_seasonal on RANDOM linear+seasonal
    synthetics — x_t = (a2/2)*t + b + s[t mod p] with a random integer
    season s — recovers trend = line + mean(s), seasonal = centered
    season, residual = 0 EXACTLY (to fixed-point noise) on every
    full-window row, including series whose final cycle is PARTIAL
    (length 3p + extra, extra < p — the missing-phase tail), where the
    per-phase means average different numbers of points per phase."""
    import math

    from dbt_extrica_spark.extensions.timeseries import decompose_seasonal
    from dbt_extrica_spark.session import get_spark

    season = data.draw(st.lists(
        st.integers(min_value=-30, max_value=30), min_size=p, max_size=p))
    extra = data.draw(st.integers(min_value=0, max_value=p - 1))
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    a = a2 / 2.0
    n = 3 * p + extra
    rows = [("g", t, a * t + b + season[t % p]) for t in range(n)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    out = {r.o: r for r in
           decompose_seasonal(df, "k", "o", "v", period=p).collect()}
    assert len(out) == n
    h = p // 2
    sm = sum(season) / p
    for t in range(n):
        r = out[t]
        assert r.phase == t % p
        if t < h or t >= n - h:
            assert r.trend is None and r.residual is None
        else:
            assert math.isclose(r.trend, a * t + b + sm,
                                rel_tol=1e-9, abs_tol=1e-9)
            assert math.isclose(r.residual, 0.0, abs_tol=1e-6)
        assert math.isclose(r.seasonal, season[t % p] - sm,
                            rel_tol=1e-9, abs_tol=1e-6)


@given(st.integers(min_value=1, max_value=8), st.data())
@settings(max_examples=4, deadline=None)
def test_hilbert_spark_matches_python_twin_property(bits, data):
    """r15 verdict #6: the Spark unrolled-bitwise hilbert_key_2d equals
    the pinned pure-Python twin on RANDOM frames at every bit width
    1..8 (the unit test pins one width on a fixed grid; the property
    walks the width parameter and adversarial coordinates incl. the
    corners and the anti-diagonal)."""
    from dbt_extrica_spark.extensions.layout import (hilbert_d2_py,
                                                     hilbert_key_2d)
    from dbt_extrica_spark.session import get_spark

    nmax = (1 << bits) - 1
    coords = data.draw(st.lists(
        st.tuples(st.integers(min_value=0, max_value=nmax),
                  st.integers(min_value=0, max_value=nmax)),
        min_size=1, max_size=20))
    coords += [(0, 0), (nmax, nmax), (0, nmax), (nmax, 0)]
    coords = list(dict.fromkeys(coords))
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(coords, "x int, y int")
    got = {(r.x, r.y): r.hkey
           for r in hilbert_key_2d(df, "x", "y", bits).collect()}
    assert got == {(x, y): hilbert_d2_py(bits, x, y) for x, y in coords}


@given(st.lists(st.integers(min_value=-15, max_value=15), min_size=1,
                max_size=30),
       st.lists(st.integers(min_value=-15, max_value=15), min_size=1,
                max_size=30))
@settings(max_examples=4, deadline=None)
def test_mannwhitney_matches_rank_replay_property(xs, ys):
    """mannwhitney_u on arbitrary tied integer multisets == the
    exact-fraction average-rank replay (U bit-exact, z to float noise
    with the tie-corrected variance); an all-tied draw yields NULL z."""
    import math
    from fractions import Fraction

    from dbt_extrica_spark.extensions.profiling import mannwhitney_u
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    a = spark.createDataFrame([(float(v),) for v in xs], "v double")
    b = spark.createDataFrame([(float(v),) for v in ys], "v double")
    r = mannwhitney_u(a, b, "v").collect()[0]
    n1, n2 = len(xs), len(ys)
    nn = n1 + n2
    allv = sorted(xs + ys)
    ranks, i = {}, 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = Fraction(i + 1 + j, 2)
        i = j
    u1 = sum(ranks[v] for v in xs) - Fraction(n1 * (n1 + 1), 2)
    assert r.u_stat == float(u1)
    t = sum(c ** 3 - c for c in
            (allv.count(v) for v in set(allv)))
    varnum = nn * (nn - 1) * (nn + 1) - t
    if varnum == 0:
        assert r.z is None
    else:
        var = (float(n1) * float(n2) * float(varnum)
               / (12.0 * nn * (nn - 1)))
        want = ((float(u1) - float(n1) * float(n2) / 2.0)
                / math.sqrt(var))
        assert math.isclose(r.z, want, rel_tol=1e-9, abs_tol=1e-12)


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                          st.integers(min_value=0, max_value=2)),
                min_size=1, max_size=60))
@settings(max_examples=4, deadline=None)
def test_cramers_v_matches_chi2_replay_property(pairs):
    """cramers_v on arbitrary two-column categorical draws == the
    direct expected-counts chi-square (to the 1e-12 fixed-point grid),
    V in [0, 1], and the single-level degeneracy yields NULL."""
    import math
    from collections import Counter

    from dbt_extrica_spark.extensions.profiling import cramers_v
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame([(f"a{x}", f"b{y}") for x, y in pairs],
                               "p string, q string")
    r = cramers_v(df, "p", "q").collect()[0]
    n = len(pairs)
    cells = Counter(pairs)
    rt = Counter(x for x, _ in pairs)
    ct = Counter(y for _, y in pairs)
    chi2 = sum((cells.get((x, y), 0) - rt[x] * ct[y] / n) ** 2
               / (rt[x] * ct[y] / n)
               for x in rt for y in ct)
    assert (r.n, r.levels_a, r.levels_b) == (n, len(rt), len(ct))
    # the operator floors per-cell terms on a 1e-12 grid — bound the
    # drift by cells/1e12 * n plus float noise
    assert math.isclose(r.chi2, chi2, rel_tol=1e-6,
                        abs_tol=1e-6 + n * len(cells) * 1e-12)
    dmin = min(len(rt), len(ct)) - 1
    if dmin == 0:
        assert r.v is None
    else:
        assert 0.0 <= r.v <= 1.0 + 1e-12
        assert math.isclose(r.v, math.sqrt(chi2 / (n * dmin)),
                            rel_tol=1e-6, abs_tol=1e-6)


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=1),
                          st.integers(min_value=0, max_value=1)),
                min_size=1, max_size=50))
@settings(max_examples=4, deadline=None)
def test_matthews_corr_matches_formula_property(pairs):
    """matthews_corr on arbitrary 0/1 draws == the direct fourfold
    formula; NULL exactly when a margin is empty; |mcc| <= 1."""
    import math

    from dbt_extrica_spark.extensions.evaluation import matthews_corr
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame(pairs, "p int, y int")
    r = matthews_corr(df, "p", "y").collect()[0]
    tp = sum(1 for p, y in pairs if p == 1 and y == 1)
    tn = sum(1 for p, y in pairs if p == 0 and y == 0)
    fp = sum(1 for p, y in pairs if p == 1 and y == 0)
    fn = sum(1 for p, y in pairs if p == 0 and y == 1)
    assert (r.tp, r.tn, r.fp, r.fn) == (tp, tn, fp, fn)
    den2 = ((tp + fp) * (tp + fn)) * ((tn + fp) * (tn + fn))
    if den2 == 0:
        assert r.mcc is None
    else:
        want = (tp * tn - fp * fn) / math.sqrt(den2)
        assert math.isclose(r.mcc, want, rel_tol=1e-12)
        assert abs(r.mcc) <= 1.0 + 1e-12


@given(st.lists(st.tuples(st.integers(min_value=1, max_value=6),     # key
                          st.sampled_from(["I", "U", "D"]),
                          st.integers(min_value=0, max_value=40),    # seq
                          st.integers(min_value=0, max_value=99)),   # payload
                min_size=1, max_size=16,
                unique_by=lambda t: (t[0], t[2])),
       st.randoms(use_true_random=False))
@settings(max_examples=3, deadline=None)
def test_streaming_cdc_tombstones_order_invariant(changes, rng):
    """THE tombstone contract, property-tested: fold an arbitrary
    changelog (unique (key, seq) — cross-batch equal seqs are genuinely
    order-dependent and excluded by the delivery contract) through the
    foreachBatch callback under a RANDOM partition into batches in a
    RANDOM order — the final table must equal the one-shot batch
    apply_cdc of the whole log, deletes included, regardless of
    slicing. Without tombstones this holds only for in-order deletes;
    with them it must hold always."""
    import tempfile

    from dbt_extrica_spark.engine import Engine
    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark.streaming.incremental import _cdc_apply_callback

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    shuffled = list(changes)
    rng.shuffle(shuffled)
    n_batches = rng.randint(1, min(4, len(shuffled)))
    bounds = sorted(rng.sample(range(1, len(shuffled)), n_batches - 1)
                    if n_batches > 1 else [])
    batches, prev = [], 0
    for b in bounds + [len(shuffled)]:
        batches.append(shuffled[prev:b])
        prev = b

    with tempfile.TemporaryDirectory() as tmp:
        eng = Engine(spark,
                     schema=f"cdc_pi_{tmp.rsplit('/', 1)[-1].lower()}",
                     warehouse_dir=tmp)
        cb = _cdc_apply_callback(eng, "t", "id", "op", "seq", ["id", "v"],
                                 tombstones=True)
        sch = "id int, v int, op string, seq int"
        for i, batch in enumerate(batches):
            cb(spark.createDataFrame(
                [(k, p, o, q) for k, o, q, p in batch], sch), i)
        got = {(r.id, r.v, r["__cdc_seq"])
               for r in eng.table("t").collect()}
        eng.catalog.drop_schema(eng.relation("t").schema)

    # pure-Python global winner replay (max seq per key; unique seqs,
    # so no rank tie-break is ever exercised)
    want = set()
    bykey: dict[int, tuple] = {}
    for k, o, q, p in changes:
        if k not in bykey or q > bykey[k][1]:
            bykey[k] = (o, q, p)
    for k, (o, q, p) in bykey.items():
        if o != "D":
            want.add((k, p, q))
    assert got == want
