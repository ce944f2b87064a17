"""Battery drift guards: cheap structural checks that catch contract
breakage without running Spark."""

import duckdb

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, TABLES


def test_bench_headline_subset_of_queries():
    import bench

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench names not in battery: {missing}"


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
