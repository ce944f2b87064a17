"""[EXTENSION] Data-layout operators: Z-order (Morton) clustering.

The lakehouse locality primitive (Delta's Z-ORDER, Iceberg's sort-order
z-curves): interleaving the bits of several bounded dimensions into one
sort key places rows that are close in EVERY dimension close in the file
order, so min/max zone maps prune multi-dimensional predicates that a
single-column sort can only prune on its leading column.

Everything here is a pure codegen expression (shift/mask folds — no UDF,
no shuffle beyond the final range partition), deterministic, and
expressible verbatim in the oracle engine (integer bit ops + a reduce),
so the battery checks key values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def morton_key(cols: list[str], bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` bits of the given non-negative integer
    columns into one BIGINT Morton key: bit i of column j lands at
    position i * len(cols) + j. Callers bucket raw values into
    [0, 2^bits) first (pmod, datediff-days, min-max bucketing — any
    deterministic expression). bits * len(cols) must fit a signed 64-bit
    key (<= 62 enforced)."""
    n = len(cols)
    assert n >= 2, "z-ordering needs at least two dimensions"
    assert bits * n <= 62, "interleaved key must fit in a signed BIGINT"
    parts = " | ".join(
        f"(((CAST(`{c}` AS BIGINT) >> i) & 1L) << (i * {n} + {j}))"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc | {parts})"
    )


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 16,
                key_col: str = "zkey",
                num_partitions: int | None = None) -> DataFrame:
    """Cluster rows along the z-curve: compute the Morton key, range-
    partition on it (each output file owns one contiguous curve segment
    -> tight per-file min/max on EVERY interleaved dimension), and sort
    within partitions. This is the write-side layout pass before a
    partitioned/bucketed table write at 100 TB."""
    keyed = df.withColumn(key_col, morton_key(cols, bits))
    parted = (keyed.repartitionByRange(num_partitions, key_col)
              if num_partitions else keyed.repartitionByRange(key_col))
    return parted.sortWithinPartitions(key_col)
