"""Trino -> Spark dialect translation."""

from dbt_extrica_spark.functions.dialect import translate_trino_sql


def test_name_substitutions():
    sql = ("SELECT approx_distinct(x), strpos(s, '-'), cardinality(arr),"
           " json_extract_scalar(j, '$.a'), arbitrary(v) FROM t")
    out = translate_trino_sql(sql)
    assert "approx_count_distinct(x)" in out
    assert "instr(s, '-')" in out
    assert "size(arr)" in out
    assert "get_json_object(j, '$.a')" in out
    assert "any_value(v)" in out


def test_unit_function_rewrites():
    out = translate_trino_sql(
        "SELECT date_diff('day', a, b), date_add('hour', 3, ts) FROM t")
    assert "timestampdiff(DAY, a, b)" in out
    assert "timestampadd(HOUR, 3, ts)" in out


def test_string_literals_untouched():
    sql = "SELECT 'strpos(not a call)' AS s, strpos(x, 'cardinality(') FROM t"
    out = translate_trino_sql(sql)
    assert "'strpos(not a call)'" in out
    assert "instr(x, 'cardinality(')" in out


def test_unknown_unit_passes_through():
    sql = "SELECT date_diff('fortnight', a, b) FROM t"
    assert translate_trino_sql(sql) == sql


def test_translated_sql_executes(spark):
    from dbt_extrica_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.001")
    out = spark.sql(translate_trino_sql(
        "SELECT approx_distinct(o_custkey) AS ad,"
        " max(date_diff('day', o_orderdate,"
        " TIMESTAMP '1999-01-01 00:00:00')) AS age FROM orders"))
    row = out.collect()[0]
    assert row.ad > 0 and row.age > 0


def test_to_unixtime_keeps_fractional_seconds(spark):
    out = translate_trino_sql(
        "SELECT to_unixtime(TIMESTAMP '2024-01-01 00:00:00.25') AS u")
    assert "unix_timestamp" not in out
    row = spark.sql(out).collect()[0]
    assert row.u == 1704067200.25  # Trino returns DOUBLE seconds


def test_to_unixtime_nested_and_quoted():
    out = translate_trino_sql(
        "SELECT to_unixtime(coalesce(ts, from_iso8601_timestamp('2024-01-01')))"
        " AS u, 'to_unixtime(x)' AS lit FROM t")
    assert out.count("unix_micros") == 1
    assert "'to_unixtime(x)'" in out  # literal untouched
    assert "to_timestamp('2024-01-01')" in out  # inner arg still translated


def test_unit_rewrite_skips_string_literals():
    sql = "SELECT 'date_diff(''day'', a, b)' AS doc, date_diff('day', a, b) FROM t"
    out = translate_trino_sql(sql)
    assert "'date_diff(''day'', a, b)'" in out  # literal untouched
    assert "timestampdiff(DAY, a, b)" in out


def test_hash_idiom_collapses_to_spark_md5(spark):
    # the exact chain the reference's hash macro emits into compiled SQL
    sql = ("SELECT lower(to_hex(md5(to_utf8(cast(col as varchar))))) AS h"
           " FROM (SELECT 'abc' AS col)")
    out = spark.sql(translate_trino_sql(sql)).collect()[0].h
    import hashlib
    assert out == hashlib.md5(b"abc").hexdigest()


def test_hash_idiom_inside_string_literal_untouched():
    lit = "SELECT 'lower(to_hex(md5(to_utf8(x))))' AS s"
    assert translate_trino_sql(lit) == lit


def test_new_name_maps(spark):
    out = spark.sql(translate_trino_sql(
        "SELECT from_unixtime(1.5) AS ts, contains(array(1,2), 2) AS c,"
        " starts_with('prefix', 'pre') AS sw, to_hex(cast('A' as binary)) AS h"
    )).collect()[0]
    assert str(out.ts) == "1970-01-01 00:00:01.500000"
    assert out.c is True and out.sw is True and out.h == "41"


def test_split_literal_delimiter_quoted(spark):
    # Trino split() delimiters are literal; Spark's are regex — '.' must
    # not split every character after translation
    out = translate_trino_sql(
        "SELECT split(col, '.') AS x FROM (SELECT 'a.b.c' AS col)")
    assert spark.sql(out).collect()[0].x == ["a", "b", "c"]
    # delimiter with regex metachars
    out2 = translate_trino_sql(
        "SELECT split(col, '||') AS x FROM (SELECT 'a||b' AS col)")
    assert spark.sql(out2).collect()[0].x == ["a", "b"]


def test_element_at_out_of_bounds_is_null(spark):
    # Trino returns NULL out of bounds; Spark ANSI element_at would throw
    out = translate_trino_sql("SELECT element_at(array(1, 2), 9) AS v")
    assert spark.sql(out).collect()[0].v is None


def test_split_literal_delimiter_nested_first_arg(spark):
    # regression (round-6 advice): the delimiter rewrite used to require a
    # bare-identifier first argument; nested calls fell through to Spark's
    # regex semantics and '.' split on every character
    out = translate_trino_sql(
        "SELECT split(lower(col), '.') AS x FROM (SELECT 'A.B.c' AS col)")
    assert spark.sql(out).collect()[0].x == ["a", "b", "c"]
    # case-insensitive head, deeper nesting
    out2 = translate_trino_sql(
        "SELECT SPLIT(trim(upper(col)), '|') AS x"
        " FROM (SELECT ' a|b ' AS col)")
    assert spark.sql(out2).collect()[0].x == ["A", "B"]
    # a later-arg comma must NOT trigger the rewrite (split_part untouched)
    out3 = translate_trino_sql("SELECT split_part(col, '.', 2) AS x"
                               " FROM (SELECT 'a.b.c' AS col)")
    assert "\\Q" not in out3  # split_part is literal in both engines
    assert spark.sql(out3).collect()[0].x == "b"
