from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="session")
def spark():
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.fixture()
def engine(spark):
    from dbt_extrica_spark import Engine

    eng = Engine(spark)
    eng.register_sources(SF_DIR)
    yield eng
    eng.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def assert_matches_oracle(spark_df, duck_con, oracle: str) -> None:
    """Order-insensitive row/column/value comparison, like the driver."""
    rel = duck_con.sql(oracle)
    duck_rows, duck_cols = rel.fetchall(), list(rel.columns)
    spark_rows = spark_df.collect()
    scols, dcols = sorted(spark_df.columns), sorted(duck_cols)
    assert scols == dcols, f"columns: {scols} != {dcols}"
    assert len(spark_rows) == len(duck_rows), (
        f"rowcount: {len(spark_rows)} != {len(duck_rows)}"
    )
    sidx = [spark_df.columns.index(c) for c in scols]
    didx = [duck_cols.index(c) for c in dcols]
    s = sorted(tuple(_norm(r[i]) for i in sidx) for r in spark_rows)
    d = sorted(tuple(_norm(r[i]) for i in didx) for r in duck_rows)
    assert s == d
