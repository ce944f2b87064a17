"""Hypertable-style continuous rollup — time-bucketed aggregates maintained
incrementally (the TimescaleDB "continuous aggregate" shape, SURVEY brief's
"hypertable rollup" custom-operator example).

The rollup table is PARTITIONED BY the time bucket. A refresh recomputes
ONLY buckets at/after the current high-watermark minus a lateness window,
committing via dynamic partition overwrite: steady-state refresh cost is
proportional to recent data, not table history — the property that keeps a
rollup over a 100 TB hypertable cheap to maintain."""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..relation import Relation, RelationType

if TYPE_CHECKING:  # pragma: no cover
    from ..engine import Engine


def _rollup_select(source: str, ts_col: str, bucket: str,
                   dims: list[str], aggs: dict[str, str],
                   where: str | None = None) -> str:
    dim_csv = ", ".join(f"`{d}`" for d in dims)
    agg_csv = ", ".join(f"{expr} AS `{out}`" for out, expr in aggs.items())
    parts = [f"CAST(date_trunc('{bucket}', `{ts_col}`) AS DATE) AS bucket"]
    if dims:
        parts.append(dim_csv)
    parts.append(agg_csv)
    group = "1" + ("".join(f", {i+2}" for i in range(len(dims))))
    where_clause = f" WHERE {where}" if where else ""
    return (
        f"SELECT {', '.join(parts)} FROM {source}{where_clause}"
        f" GROUP BY {group}"
    )


def continuous_rollup(
    engine: "Engine",
    name: str,
    source: str,
    ts_col: str,
    bucket: str = "day",
    dims: list[str] | None = None,
    aggs: dict[str, str] | None = None,
    lateness_buckets: int = 1,
) -> Relation:
    """Create or incrementally refresh the rollup.

    - first call: full build, PARTITIONED BY bucket
    - later calls: recompute only buckets >= (max existing bucket -
      lateness_buckets), replacing those partitions — late-arriving rows
      within the lateness window are folded in correctly because affected
      buckets are recomputed from the source, not patched.
    """
    dims = dims or []
    aggs = aggs or {"n": "CAST(COUNT(*) AS BIGINT)"}
    target = engine.relation(name, RelationType.Table)
    existing = engine.catalog.get_relation(target)
    select = _rollup_select(source, ts_col, bucket, dims, aggs)

    if existing is None:
        engine.spark.sql(
            f"CREATE TABLE {target.render()} USING PARQUET"
            f" PARTITIONED BY (bucket) AS {select}"
        )
        return target

    wm_row = engine.spark.sql(
        f"SELECT MAX(bucket) AS wm FROM {target.render()}"
    ).collect()[0]
    if wm_row.wm is None:
        refreshed = engine.spark.sql(select)
    else:
        # refresh floor expressed on the RAW timestamp, so the predicate
        # pushes to the source scan (a filter on the computed bucket would
        # only prune post-scan); equivalent because date_trunc floors
        bound = F.date_sub(F.lit(wm_row.wm), lateness_buckets)
        bound_str = engine.spark.range(1).select(
            bound.cast("string")).collect()[0][0]
        refreshed = engine.spark.sql(_rollup_select(
            source, ts_col, bucket, dims, aggs,
            where=f"`{ts_col}` >= TIMESTAMP '{bound_str} 00:00:00'",
        ))
    tbl_cols = engine.spark.table(target.render_unquoted()).columns
    prev = engine.spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
    engine.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        refreshed.select(*tbl_cols).write.insertInto(
            target.render_unquoted(), overwrite=True)
    finally:
        engine.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return target
