"""The full declared battery vs the DuckDB oracle at sf0.001 — the same
comparison the driver runs at sf0.01."""

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

# lazy oracles (dedup_simhash) compute ground truth from the parquet at
# this scale — must match the scale the queries run at
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR

_QS = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QS)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = _QS[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QS) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    assert _QS[name](spark, SF_DIR).count() >= 0
