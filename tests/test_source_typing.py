"""Source-boundary typing regression tests.

The driver regenerates the test parquet between rounds and has twice shifted
timestamp physical types (r1: timestamp[ns]; r4: timestamp[us] tz=None, which
Spark 4 reads as TIMESTAMP_NTZ and every event-time consumer rejects). These
tests pin the contract: no registered source view ever exposes a
TimestampNTZType column, regardless of the parquet encoding.
"""
from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from dbt_extrica_spark.sources.registry import (
    TEST_TABLES, read_parquet_table, register_sources,
)

from conftest import SF_DIR


@pytest.mark.parametrize("table", TEST_TABLES)
def test_registered_view_has_no_ntz(spark, table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{table} not in testdata")
    df = read_parquet_table(spark, path)
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    assert not ntz, f"{table} exposes TIMESTAMP_NTZ columns: {ntz}"


def test_register_sources_normalizes_all(spark):
    views = register_sources(spark, SF_DIR, prefix="typing_")
    for name, df in views.items():
        for f in df.schema.fields:
            assert not isinstance(f.dataType, TimestampNTZType), (
                f"{name}.{f.name} is TIMESTAMP_NTZ")


@pytest.mark.parametrize("unit,tz", [
    ("ns", None), ("us", None), ("ms", None), ("us", "UTC"),
])
def test_parquet_timestamp_variants_land_on_timestamp(spark, tmp_path, unit, tz):
    """Every parquet timestamp encoding the driver might emit must land on
    TimestampType with identical wall-clock values (session tz is UTC)."""
    t0 = datetime.datetime(2024, 3, 1, 12, 30, 45, 123000)
    t1 = datetime.datetime(2024, 3, 2, 0, 0, 1, 0)
    arr = pa.array([t0, t1], type=pa.timestamp(unit, tz=tz))
    table = pa.table({"ts": arr, "k": pa.array([1, 2], type=pa.int64())})
    path = str(tmp_path / f"variant_{unit}_{tz or 'ntz'}.parquet")
    pq.write_table(table, path)

    df = read_parquet_table(spark, path)
    (field,) = [f for f in df.schema.fields if f.name == "ts"]
    assert isinstance(field.dataType, TimestampType), field.dataType
    # values survive the normalization (UTC session tz => value-preserving)
    rows = {r["k"]: r["ts"] for r in df.collect()}
    assert rows[1].replace(tzinfo=None) == t0
    assert rows[2].replace(tzinfo=None) == t1


def test_engine_catalog_sources_have_no_ntz(engine):
    """The ENGINE registers sources as catalog objects (a separate path
    from the temp-view registry); those must be NTZ-free too — persistent
    model views compile against them, and CREATE VIEW re-analyzes the body
    against the catalog type."""
    for name, rel in engine.sources.items():
        df = engine.spark.table(rel.render_unquoted())
        for f in df.schema.fields:
            assert not isinstance(f.dataType, TimestampNTZType), (
                f"engine source {name}.{f.name} is TIMESTAMP_NTZ")


def test_event_time_functions_resolve(spark):
    """unix_micros()/window() — the call sites that broke in r4 — must
    resolve against every timestamp column of the registered views."""
    views = register_sources(spark, SF_DIR, prefix="evt_")
    checked = 0
    for name, df in views.items():
        for f in df.schema.fields:
            if isinstance(f.dataType, TimestampType):
                df.selectExpr(f"unix_micros(`{f.name}`)").limit(1).collect()
                checked += 1
    assert checked > 0, "expected at least one timestamp column in testdata"


# The NORMALIZED schema contract every battery query compiles against. The
# driver regenerates the parquet between rounds and has shifted physical
# encodings twice (r1: timestamp[ns]; r4: timestamp[us] tz=None); this test
# makes the next drift visible locally, as a named schema diff, before the
# driver's correctness gate reports it as dozens of opaque ERR rows. A
# legitimate schema change (new table/column) should update this dict.
EXPECTED_SCHEMAS = {
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double",
        "l_tax": "double", "l_returnflag": "string",
        "l_linestatus": "string", "l_shipdate": "timestamp",
    },
    "nation": {
        "n_nationkey": "int", "n_name": "string", "n_regionkey": "int",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": "timestamp", "o_orderpriority": "string",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "region": {"r_regionkey": "int", "r_name": "string"},
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
}


def test_normalized_schema_contract(spark):
    views = register_sources(spark, SF_DIR, prefix="contract_")
    got = {
        name: {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for name, df in views.items()
    }
    assert got == EXPECTED_SCHEMAS


def test_csv_roundtrip_null_vs_empty_distinct(spark, tmp_path):
    """The source_csv_roundtrip gate's CSV options must make NULL and
    empty string ROUNDTRIP-DISTINCT, not fixture-dependent: Spark's CSV
    defaults write both as '' and read '' back as NULL, so a fixture
    that one day contains either would silently mutate under the hash
    the gate claims to pin. The gate's options pin the Hive-style \\N
    null sentinel + emptyValue='' on BOTH sides."""
    from dbt_extrica_spark.queries import _SRC_FMT_OPTS
    from dbt_extrica_spark.sources.registry import read_table

    wopts, ropts = _SRC_FMT_OPTS["csv"]
    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, None), (4, 'multi\nline "quoted"')],
        "id int, t string")
    out = str(tmp_path / "csvnull")
    w = df.coalesce(1).write.mode("overwrite").format("csv")
    for k, v in wopts.items():
        w = w.option(k, v)
    w.save(out)
    back = read_table(spark, out, format="csv",
                      schema="id int, t string", **ropts)
    got = {r.id: r.t for r in back.collect()}
    assert got == {1: "hello", 2: "", 3: None,
                   4: 'multi\nline "quoted"'}


def test_register_sources_memo_sentinel_contract(spark):
    """The registration memo's sentinel contract (r17): dropping the
    sentinel view re-registers everything; dropping a NON-sentinel view
    fails LOUDLY on use (TABLE_OR_VIEW_NOT_FOUND — never a silent stale
    read) and heals on the next registration once the sentinel is gone
    too. Probing every view per memo hit was measured and rejected:
    22 ms/hit (10 x 3.3 ms py4j round trips) ~= +13 s across the
    102-line bench, and it adds no silent-wrongness protection — a view
    recreated under the same name satisfies any probe."""
    import pytest as _pytest

    views = register_sources(spark, SF_DIR, prefix="memodrop_")
    names = list(views)
    assert len(names) >= 2
    sentinel = "memodrop_" + names[0]
    other = "memodrop_" + names[-1]
    # non-sentinel drop: loud failure on use, memo unchanged
    spark.catalog.dropTempView(other)
    assert register_sources(spark, SF_DIR, prefix="memodrop_") is views
    with _pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|not found"):
        spark.table(other).count()
    # sentinel drop: full re-registration restores every view
    spark.catalog.dropTempView(sentinel)
    again = register_sources(spark, SF_DIR, prefix="memodrop_")
    assert set(again) == set(views)
    assert spark.catalog.tableExists(sentinel)
    assert spark.catalog.tableExists(other), (
        "re-registration must restore the earlier-dropped view")
    # with every view intact the memo is a hit (same dict object)
    assert register_sources(spark, SF_DIR, prefix="memodrop_") is again
