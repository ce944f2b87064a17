"""Source registration: parquet dirs -> catalog temp views.

Reference analog: Trino connectors expose ``catalog.schema.table`` names
(reference: README.md:17-28); here ``spark.read.parquet`` + temp views play
that role (SURVEY §2C "Scans / sources").

Scale notes:
- Views are lazy — registering is metadata-only; Catalyst pushes filters and
  prunes columns down to the parquet scan.
- TIMESTAMP(NANOS) columns (unsupported by Spark's vectorized reader) are
  surfaced as longs via ``spark.sql.legacy.parquet.nanosAsLong`` and converted
  with integer ``div 1000`` (truncation — matches DuckDB's ns->us cast). The
  conversion is a cheap projection that stays inside whole-stage codegen.
- ``timestamp[us] tz=None`` parquet columns come back as TIMESTAMP_NTZ under
  Spark 4; every event-time consumer (``unix_micros``, ``withWatermark``)
  hard-rejects NTZ, so the boundary normalizes them to TimestampType. The
  session timezone is pinned UTC (session.py), making the cast
  value-preserving and oracle-compatible. Type normalization lives HERE, at
  the source boundary, not at call sites — the reference does the same in its
  type-mapping layer (reference: dbt/adapters/extrica/column.py:62-109).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import TimestampNTZType

TEST_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] (footer inspection only)."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return ()
    return tuple(
        f.name for f in schema if str(f.type).startswith("timestamp[ns")
    )


@lru_cache(maxsize=256)
def _ntz_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp us/ms/s with tz=None — Spark 4
    reads these as TIMESTAMP_NTZ (footer inspection only; ns columns are
    handled by the nanosAsLong repair instead)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return ()
    return tuple(
        f.name for f in schema
        if pa.types.is_timestamp(f.type) and f.type.tz is None
        and f.type.unit != "ns"
    )


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TimestampType (UTC session tz ->
    value-preserving). Spark's event-time surface (unix_micros, watermarks,
    window()) requires TimestampType; normalizing once at the source boundary
    keeps every downstream call site type-agnostic."""
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet file/dir, restoring ns-timestamp columns to
    TimestampType (microsecond precision, truncated like the oracle) and
    normalizing TIMESTAMP_NTZ columns to TimestampType."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for c in _nanos_columns(path):
        if c in df.columns:
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return normalize_ntz(df)


def read_table(spark: SparkSession, path: str, format: str = "parquet",
               schema: str | None = None, **options) -> DataFrame:
    """Generic source reader (the reference reaches any storage through
    Trino connectors, README.md:17-28; ours is Spark's datasource API).

    parquet gets the ns-timestamp repair; csv defaults header=true with
    schema inference unless an explicit DDL ``schema`` is given."""
    fmt = format.lower()
    if fmt == "parquet":
        return read_parquet_table(spark, path)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if not schema:
            options.setdefault("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


# Registration memo: (session id, prefix, tables) -> (sf_dir, registered
# views). Re-registering the SAME sf_dir on the same session is a no-op —
# ``spark.read.parquet`` pays file listing + footer schema inference in the
# JVM on every call (measured 0.1-0.5s for the 10-table set, paid once per
# battery query before this memo), and the temp views it would recreate are
# byte-identical. This caches METADATA ONLY (lazy DataFrames/views — every
# query action still scans the parquet files); a different sf_dir on the
# same session re-registers and replaces the memo entry, so switching scale
# factors mid-session (check_oracle, tests) behaves exactly as before. A
# sentinel tableExists probe guards against dropped views / recycled ids.
_REGISTERED: dict[tuple[int, str, tuple[str, ...]],
                  tuple[str, dict[str, DataFrame]]] = {}


def register_sources(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TEST_TABLES,
    prefix: str = "",
) -> dict[str, DataFrame]:
    """Register every test table under ``sf_dir`` as a temp view.

    Idempotent and cheap (no data read until a query runs); repeated calls
    with the same (session, sf_dir) are memoized metadata-only no-ops.
    """
    key = (id(spark), prefix, tuple(tables))
    memo = _REGISTERED.get(key)
    if memo is not None and memo[0] == sf_dir and memo[1]:
        # ONE sentinel probe, deliberately not all views (r17 measured:
        # tableExists is ~3.3 ms/py4j round trip, so probing all 10
        # views costs 22 ms per memo hit — ~13 s across the 102-line
        # bench, erasing a third of the r16 memo win; a single
        # listTables RPC is worse still, 353 ms). Contract instead: a
        # caller must drop source views ALL-or-none (drop the sentinel
        # too and the memo re-registers — tested). A subset drop that
        # spares the sentinel fails LOUDLY on first use of the dropped
        # view (TABLE_OR_VIEW_NOT_FOUND) — a heal-on-next-call gap,
        # never silent wrongness, because a temp view recreated under
        # the same name satisfies the probe no matter how many views it
        # checks.
        sentinel = prefix + next(iter(memo[1]))
        try:
            if spark.catalog.tableExists(sentinel):
                return memo[1]
        except Exception:
            pass  # session gone/recycled — fall through and re-register
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_parquet_table(spark, path)
        df.createOrReplaceTempView(prefix + name)
        out[name] = df
    _REGISTERED[key] = (sf_dir, out)
    return out
