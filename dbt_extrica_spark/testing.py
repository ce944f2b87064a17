"""Data-quality tests — the dbt schema-test surface (`dbt test`).

The reference inherits these from dbt-core as Jinja SQL macros (unique,
not_null, accepted_values, relationships); each compiles to a SELECT whose
rows are VIOLATIONS (zero rows = pass). Same contract here: every function
returns a violations DataFrame, and :func:`run_checks` aggregates them into
a (check, violations) report.

All checks are single-scan aggregations or semi-joins — at 100 TB each is
one shuffle at most (relationships is a broadcast/anti-join on the parent
key set)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def test_unique(spark: SparkSession, table: str, column: str) -> DataFrame:
    """Rows = key values appearing more than once."""
    return (
        spark.table(table)
        .where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .where(F.col("n_records") > 1)
    )


def test_not_null(spark: SparkSession, table: str, column: str) -> DataFrame:
    """Rows = records with a NULL in the column."""
    return spark.table(table).where(F.col(column).isNull())


def test_accepted_values(spark: SparkSession, table: str, column: str,
                         values: list) -> DataFrame:
    """Rows = distinct values outside the accepted set."""
    return (
        spark.table(table)
        .where(F.col(column).isNotNull())
        .where(~F.col(column).isin(values))
        .select(column)
        .distinct()
    )


def test_relationships(spark: SparkSession, table: str, column: str,
                       to_table: str, to_column: str) -> DataFrame:
    """Referential integrity: child values with no parent row (anti-join on
    the parent key set — broadcastable when the parent is a dimension)."""
    child = spark.table(table).where(F.col(column).isNotNull()) \
        .select(F.col(column).alias("__child_key"))
    parent = spark.table(to_table).select(
        F.col(to_column).alias("__parent_key")).distinct()
    return (
        child.join(parent, child.__child_key == parent.__parent_key,
                   "left_anti")
        .distinct()
        .withColumnRenamed("__child_key", column)
    )


def run_checks(spark: SparkSession, checks: list[dict]) -> DataFrame:
    """Run a list of check specs and report violation counts.

    Spec: {"check": "unique"|"not_null"|"accepted_values"|"relationships",
           "table": ..., "column": ..., [values | to_table/to_column]}.
    """
    rows = []
    for spec in checks:
        kind = spec["check"]
        if kind == "unique":
            df = test_unique(spark, spec["table"], spec["column"])
        elif kind == "not_null":
            df = test_not_null(spark, spec["table"], spec["column"])
        elif kind == "accepted_values":
            df = test_accepted_values(spark, spec["table"], spec["column"],
                                      spec["values"])
        elif kind == "relationships":
            df = test_relationships(spark, spec["table"], spec["column"],
                                    spec["to_table"], spec["to_column"])
        else:
            raise ValueError(f"Unknown check: {kind!r}")
        rows.append((f"{kind}:{spec['table']}.{spec['column']}", df.count()))
    return spark.createDataFrame(rows, "check string, violations bigint")
