"""Execution-layer unit tests: splitting, escaping, cursors, error taxonomy
(reference: connections.py:116-361; taxonomy asserted at the reference's
tests/units/test_adapter.py:87-108)."""

import datetime as dt

import pytest

from dbt_extrica_spark.connections import (
    ExecutionManager, data_type_code_to_name, escape_value, split_statements,
)
from dbt_extrica_spark.errors import (
    DatabaseError, FailedToConnectError, RuntimeEngineError, map_exception,
)


def test_split_basic():
    assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]


def test_split_quoted_semicolon():
    out = split_statements("SELECT 'a;b'; SELECT 2")
    assert out == ["SELECT 'a;b'", "SELECT 2"]


def test_split_comment_only_dropped():
    # reference strips comment-only fragments (connections.py:331-333)
    out = split_statements("-- just a comment\n; SELECT 1; /* block */;")
    assert out == ["SELECT 1"]


def test_split_comment_inside_statement_kept():
    out = split_statements("SELECT 1 -- trailing; not a split\n, 2")
    assert len(out) == 1


def test_split_escaped_quote():
    out = split_statements("SELECT 'it''s; fine'; SELECT 2")
    assert out == ["SELECT 'it''s; fine'", "SELECT 2"]


def test_escape_values():
    # reference: connections.py:204-224 (ms-precision timestamps, quote
    # doubling, DATE keyword literals)
    assert escape_value(None) == "NULL"
    assert escape_value("o'brien") == "'o''brien'"
    assert escape_value(True) == "TRUE"
    assert escape_value(dt.datetime(2024, 1, 2, 3, 4, 5, 123456)) == \
        "TIMESTAMP '2024-01-02 03:04:05.123'"
    assert escape_value(dt.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert escape_value(b"\x65\x68") == "X'6568'"
    assert escape_value(7) == "7"


def test_type_code_to_name():
    # reference: connections.py:359-361
    assert data_type_code_to_name("decimal(28,6)") == "DECIMAL"
    assert data_type_code_to_name("varchar") == "VARCHAR"


def test_exception_taxonomy():
    from pyspark.errors import AnalysisException

    try:
        exc = AnalysisException("boom")
    except TypeError:  # constructor signature varies
        exc = None
    if exc is not None:
        assert isinstance(map_exception(exc), DatabaseError)
    assert isinstance(map_exception(ConnectionError("x")), FailedToConnectError)
    assert isinstance(map_exception(ValueError("x")), RuntimeEngineError)


def test_execute_and_cursor(spark):
    mgr = ExecutionManager(spark)
    resp, cur = mgr.execute("SELECT 1 AS a UNION ALL SELECT 2")
    assert resp.rows_affected == 2
    assert cur.fetchone().a in (1, 2)
    assert len(cur.fetchmany(5)) == 1
    assert cur.fetchone() is None
    assert cur.description[0][0] == "a"


def test_execute_with_bindings(spark):
    mgr = ExecutionManager(spark)
    _resp, cur = mgr.execute("SELECT ? + 1 AS x", bindings=[41])
    assert cur.fetchall()[0].x == 42


def test_execute_with_bindings_unprepared(spark):
    mgr = ExecutionManager(spark, prepared_statements_enabled=False)
    _resp, cur = mgr.execute("SELECT ? AS s", bindings=["don't"])
    assert cur.fetchall()[0].s == "don't"


def test_add_query_multi_statement(spark):
    mgr = ExecutionManager(spark)
    _resp, cur = mgr.add_query(
        "-- header comment\nSELECT 1 AS a; SELECT 2 AS b;"
    )
    assert cur.fetchall()[0].b == 2


def test_add_query_empty_raises(spark):
    mgr = ExecutionManager(spark)
    with pytest.raises(DatabaseError):
        mgr.add_query("-- nothing here\n")


def test_execute_bad_sql_maps_to_database_error(spark):
    mgr = ExecutionManager(spark)
    with pytest.raises(DatabaseError):
        mgr.execute("SELECT FROM WHERE")


def test_split_nested_block_comment_and_backticks():
    out = split_statements(
        "SELECT `a;b` FROM t; /* c1 ; c2 */ SELECT 2;")
    assert out == ["SELECT `a;b` FROM t", "/* c1 ; c2 */ SELECT 2"]


def test_split_double_quoted_identifier():
    out = split_statements('SELECT "x;y" FROM t; SELECT 1')
    assert out == ['SELECT "x;y" FROM t', "SELECT 1"]
