"""Function-shim goldens vs DuckDB, plus compile-time behavior.

The datediff cases pin the highest-risk semantics (SURVEY §7.2(2)): field-
difference counting and the Trino dow-based week correction, on handpicked
boundary-crossing dates."""

import pytest

from dbt_extrica_spark.errors import CompilationError
from dbt_extrica_spark.functions import shims


def test_unsupported_datepart_raises():
    # reference: utils/datediff.sql:26
    with pytest.raises(CompilationError):
        shims.datediff("a", "b", "fortnight")
    with pytest.raises(CompilationError):
        shims.dateadd("fortnight", 1, "a")
    with pytest.raises(CompilationError):
        shims.date_spine_sql("hour", "a", "b")


def test_any_value_is_min():
    # reference deliberately rewrites any_value -> min (utils/any_value.sql)
    assert shims.any_value("x") == "min(x)"


def test_array_construct_empty_is_null():
    assert shims.array_construct([]) == "CAST(NULL AS ARRAY<string>)"


@pytest.mark.parametrize("a,b,part,expected", [
    # Sun 2024-01-07 -> Mon 2024-01-08: dow 7 -> 1, day diff 1, week = 1
    ("2024-01-07 12:00:00", "2024-01-08 12:00:00", "week", 1),
    # Mon -> Sun same ISO week: dow 1 -> 7, day diff 6, week = 0
    ("2024-01-01 12:00:00", "2024-01-07 12:00:00", "week", 0),
    # reversed (negative) spans
    ("2024-01-08 12:00:00", "2024-01-07 12:00:00", "week", -1),
    ("2024-01-07 12:00:00", "2024-01-01 12:00:00", "week", 0),
    # year boundary: one day apart, year diff = 1
    ("2023-12-31 23:00:00", "2024-01-01 01:00:00", "year", 1),
    ("2023-12-31 23:00:00", "2024-01-01 01:00:00", "month", 1),
    ("2023-12-31 23:00:00", "2024-01-01 01:00:00", "quarter", 1),
    # field difference, not elapsed: 23:00 -> 01:00 next day = 2 hours? No:
    # day diff 1 * 24 + (1 - 23) = 2
    ("2023-12-31 23:00:00", "2024-01-01 01:00:00", "hour", 2),
    ("2024-03-30 10:00:00", "2024-03-31 09:59:59", "day", 1),
    ("2024-01-01 00:00:00", "2024-01-01 00:00:02", "millisecond", 2000),
    ("2024-01-01 00:00:02", "2024-01-01 00:00:00", "second", -2),
])
def test_datediff_goldens(spark, a, b, part, expected):
    expr = shims.datediff(f"TIMESTAMP '{a}'", f"TIMESTAMP '{b}'", part)
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert got == expected, f"datediff({a},{b},{part})"


def test_listagg_ordered_limited(spark):
    expr = shims.listagg("name", "'-'", order_by=[("rank", "asc")], limit_num=2)
    got = spark.sql(
        f"SELECT {expr} AS v FROM VALUES (3,'c'), (1,'a'), (2,'b') AS t(rank, name)"
    ).collect()[0].v
    assert got == "a-b"  # limit applies AFTER ordering


def test_listagg_desc_multi_key(spark):
    expr = shims.listagg("name", "','",
                         order_by=[("grp", "desc"), ("name", "asc")])
    got = spark.sql(
        f"SELECT {expr} AS v FROM VALUES (1,'x'), (2,'a'), (2,'b') AS t(grp, name)"
    ).collect()[0].v
    assert got == "a,b,x"


def test_hash_byte_parity(spark, duck):
    s = spark.sql(f"SELECT {shims.hash('7.5')} AS h").collect()[0].h
    d = duck.sql("SELECT md5(CAST(7.5 AS VARCHAR)) AS h").fetchone()[0]
    assert s == d


def test_snapshot_hash_parity(spark, duck):
    expr = shims.snapshot_hash_arguments(["'k1'", "NULL", "'2024-01-01'"])
    s = spark.sql(f"SELECT {expr} AS h").collect()[0].h
    d = duck.sql(
        "SELECT md5(concat_ws('|', coalesce(CAST('k1' AS VARCHAR), ''),"
        " coalesce(CAST(NULL AS VARCHAR), ''),"
        " coalesce(CAST('2024-01-01' AS VARCHAR), ''))) AS h"
    ).fetchone()[0]
    assert s == d


def test_safe_cast_null_on_failure(spark):
    row = spark.sql(
        f"SELECT {shims.safe_cast(chr(39) + 'abc' + chr(39), 'int')} AS v"
    ).collect()[0]
    assert row.v is None


def test_right_zero_guard(spark):
    got = spark.sql(
        f"SELECT {shims.right(chr(39) + 'hello' + chr(39), 0)} AS v"
    ).collect()[0].v
    assert got == ""


def test_date_spine_end_exclusive(spark):
    sql = shims.date_spine_sql("day", "DATE '2024-01-01'", "DATE '2024-01-05'")
    rows = [str(r.date_day) for r in spark.sql(sql).collect()]
    assert rows == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


def test_timestamp_add_sql(spark):
    expr = shims.timestamp_add_sql("TIMESTAMP '2024-01-01 00:00:00'", 2, "hour")
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert str(got) == "2024-01-01 02:00:00"


def test_type_macros():
    # B17 (reference: utils/datatypes.sql) + A34 date_function
    assert shims.type_float() == "double"
    assert shims.type_string() == "string"
    assert shims.type_numeric() == "decimal(28,6)"
    assert shims.type_int() == "int"
    assert shims.date_function() == "current_date()"
    assert shims.snapshot_string_as_time("2024-01-02 03:04:05") == \
        "TIMESTAMP '2024-01-02 03:04:05'"


def test_current_timestamp_executes(spark):
    row = spark.sql(
        f"SELECT {shims.current_timestamp()} AS now_ts,"
        f" {shims.date_function()} AS today"
    ).collect()[0]
    assert row.now_ts is not None and row.today is not None


def test_listagg_null_measures_skipped(spark, duck):
    # Trino: array_agg keeps NULLs but array_join skips them; Spark:
    # collect_list drops NULLs pre-join — identical net effect (goldened)
    expr = shims.listagg("v", "'|'", order_by=[("k", "asc")])
    s = spark.sql(
        f"SELECT {expr} AS out FROM VALUES (1, 'a'), (2, CAST(NULL AS STRING)),"
        f" (3, 'c') AS t(k, v)"
    ).collect()[0].out
    d = duck.sql(
        "SELECT array_to_string(list(v ORDER BY k), '|') AS out FROM"
        " (VALUES (1, 'a'), (2, CAST(NULL AS VARCHAR)), (3, 'c')) t(k, v)"
    ).fetchone()[0]
    assert s == d == "a|c"


def test_date_spine_week(spark):
    sql = shims.date_spine_sql("week", "DATE '2024-01-01'", "DATE '2024-02-01'")
    rows = [str(r.date_week) for r in spark.sql(sql).collect()]
    assert rows == ["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22",
                    "2024-01-29"]
