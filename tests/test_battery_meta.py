"""Battery drift guards: cheap structural checks that catch contract
breakage without running Spark."""

import duckdb

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, TABLES


def test_bench_headline_subset_of_queries():
    import bench

    qs = entrymod.queries()
    # BENCH_ONLY shapes are raw-operator measurements (no oracle by
    # design — their correctness is gated by a wrapping contract entry);
    # everything else in the headline must be a battery entry
    missing = [n for n in bench.HEADLINE
               if n not in qs and n not in bench.BENCH_ONLY]
    assert not missing, f"bench names not in battery: {missing}"
    for n in bench.BENCH_ONLY:
        assert n not in qs, f"bench-only name shadows a battery entry: {n}"


def test_all_oracles_parse_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            bad.append((name, str(exc)[:120]))
    assert not bad, bad


def test_query_names_are_stable_identifiers():
    for name in entrymod.queries():
        assert name == name.lower() and " " not in name
