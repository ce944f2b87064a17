"""Column-level lineage extraction from analyzed Catalyst plans."""

from dbt_extrica_spark.plans.lineage import column_lineage
from dbt_extrica_spark.sources.registry import register_sources

SF = "/root/testdata/sf0.001"


def _lin(spark, sql):
    register_sources(spark, SF)
    return column_lineage(spark, sql)


def test_lineage_join_agg(spark):
    lin = _lin(spark, """
        SELECT o.o_orderkey,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey""")
    assert lin["o_orderkey"] == {("orders", "o_orderkey")}
    assert lin["revenue"] == {("lineitem", "l_extendedprice"),
                              ("lineitem", "l_discount")}


def test_lineage_literal_is_empty(spark):
    lin = _lin(spark, "SELECT 42 AS answer, o_orderkey FROM orders")
    assert lin["answer"] == set()
    assert lin["o_orderkey"] == {("orders", "o_orderkey")}


def test_lineage_union_merges_branches(spark):
    lin = _lin(spark, """
        SELECT user_id AS uid, value FROM events
        UNION ALL
        SELECT o_custkey, o_totalprice FROM orders""")
    assert lin["uid"] == {("events", "user_id"), ("orders", "o_custkey")}
    assert lin["value"] == {("events", "value"), ("orders", "o_totalprice")}


def test_lineage_window_and_cte(spark):
    lin = _lin(spark, """
        WITH ranked AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM events)
        SELECT user_id, value AS v FROM ranked WHERE rn = 1""")
    assert lin["user_id"] == {("events", "user_id")}
    assert lin["v"] == {("events", "value")}


def test_lineage_explode_generator(spark):
    lin = _lin(spark, """
        SELECT doc_id, tok
        FROM documents LATERAL VIEW explode(split(text, ' ')) AS tok""")
    assert lin["doc_id"] == {("documents", "doc_id")}
    assert lin["tok"] == {("documents", "text")}


def test_lineage_scalar_subquery(spark):
    lin = _lin(spark, """
        SELECT o_orderkey,
               o_totalprice / (SELECT MAX(o_totalprice) FROM orders) AS frac
        FROM orders""")
    assert lin["frac"] == {("orders", "o_totalprice")}


def test_lineage_nested_expressions(spark):
    lin = _lin(spark, """
        SELECT CASE WHEN n_chars > 100 THEN upper(lang) ELSE source END AS tag
        FROM documents""")
    assert lin["tag"] == {("documents", "n_chars"), ("documents", "lang"),
                          ("documents", "source")}
