"""Z-order (Morton) clustering — multi-dimensional data skipping.

``sort_by`` gives tight parquet min/max stats on ONE column; Z-ordering
interleaves the bits of several normalized columns so files are tight on
ALL of them — range predicates on any Z-dimension skip row groups.

Normalization uses broadcast min/max stats (two cheap passes), NOT a global
window rank (which would serialize on one task). Bit interleaving stays
within 2*bits <= 32 bits, so ANSI mode cannot overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append ``__zkey``: the Morton interleave of the min/max-normalized
    columns (currently 2-4 dims; bits per dim shrinks with dims so the key
    fits in a long)."""
    n = len(cols)
    assert 2 <= n <= 4, "zorder supports 2-4 columns"
    bits = min(bits, 62 // n)
    maxv = (1 << bits) - 1

    stats = df.agg(*[
        f for c in cols
        for f in (F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}"))
    ])
    with_stats = df.crossJoin(F.broadcast(stats))

    scaled = []
    for c in cols:
        rng = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        norm = F.when(rng == 0, F.lit(0)).otherwise(
            ((F.col(c) - F.col(f"__min_{c}")) / rng * maxv)
        )
        scaled.append(F.floor(norm).cast("long").alias(f"__s_{c}"))
    keyed = with_stats.select(*df.columns, *scaled)

    # interleave: bit i of dim d lands at position i*n + d
    parts = []
    for d, c in enumerate(cols):
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), 0L,"
            f" (acc, i) -> acc | (shiftleft((shiftright(`__s_{c}`, i) & 1L),"
            f" i * {n} + {d})))"
        )
    zkey = " | ".join(f"({p})" for p in parts)
    return keyed.withColumn("__zkey", F.expr(zkey)).drop(
        *[f"__s_{c}" for c in cols]
    )


def write_zordered(engine, name: str, df: DataFrame, cols: list[str],
                   target_files: int | None = None) -> None:
    """Materialize ``df`` clustered by the Z-key: repartitionByRange on the
    key (contiguous key ranges per file) then per-partition sort, dropping
    the helper column before the write."""
    n = target_files or max(
        2, df.sparkSession.sparkContext.defaultParallelism // 2)
    keyed = zorder_key(df, cols)
    clustered = (
        keyed.repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    relation = engine.relation(name)
    existing = engine.catalog.get_relation(relation)
    if existing is not None:
        engine.overwrite_table_atomic(relation, clustered)
    else:
        clustered.write.format("parquet").saveAsTable(
            relation.render_unquoted())
