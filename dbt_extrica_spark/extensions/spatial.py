"""[EXTENSION] Spatial/metric blocking — grid-bucketed radius joins.

The classic spatial-join strategy every geo engine ships (PostGIS ST_DWithin
with a grid index, Sedona's partitioned spatial join, Uber's H3 neighbor
lookups): bucket points into cells of side ``radius``, generate candidate
pairs only between a point's cell and its 3x3 neighborhood (any pair within
``radius`` MUST fall in adjacent cells), then verify with the exact
distance predicate. All-pairs never happens; the join is a plain cell-keyed
equi-join Catalyst can shuffle or broadcast like any other.

The same repo conventions as the dedup blocking families: deterministic,
no transcendentals in the pair PREDICATE (squared distance against r^2 —
sqrt appears only in the reported distance, and sqrt is exactly rounded
IEEE), SQL-replayable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def radius_join(df: DataFrame, id_col: str, x_col: str, y_col: str,
                radius: float, max_cell_size: int | None = None,
                oversize: str = "raise") -> DataFrame:
    """All point pairs within Euclidean ``radius`` in the 2-D plane —
    via grid blocking, never a cross join: cell(p) = (floor(x/c),
    floor(y/c)) with cell side c = r*(1+1e-9) — inflated so 3x3
    adjacency holds under FLOATING-POINT division, not just real
    arithmetic (see the margin argument at the ``cell`` binding
    below); one side explodes to its 3x3 cell neighborhood
    (scan-side, 9 rows per point — constant fanout), the other keeps
    its own cell, and the equi-join on the neighbor cell generates each
    unordered candidate pair EXACTLY once (the probe side's own cell is
    unique, and id_a < id_b keeps one orientation).

    Verification compares SQUARED distance against radius^2 (no sqrt in
    the predicate — the PMI policy's cheapest form); the reported
    ``dist`` is one exactly-rounded sqrt. NULL ids or coordinates raise
    in-scan (a silently dropped point is a silently missing pair).

    Returns (id_a, id_b, dist).

    Scale shape: one scan per side (same input), a 9x fanout on the
    probe side, ONE cell-keyed equi-join + a scan-side filter. Pair
    cost is sum over cells of |cell| * |3x3 neighborhood| — the grid
    analog of the linkage blocking families, and ``max_cell_size``
    guards the same quadratic failure (a pathological point
    concentration — every delivery pinned to one depot coordinate —
    makes one cell all-pairs): per-cell counts come from one
    cell-keyed aggregation (shares the join's key space) and cells
    past the cap follow ``oversize``: ``'raise'`` (default — silently
    degraded recall is opt-in only) or ``'cap'`` (keep the cap-many
    points with smallest (xxhash64(id), id) per cell — hash-uniform,
    rerun-stable; the equality_blocking_pairs contract verbatim)."""
    if not (radius > 0):
        raise ValueError(f"radius must be > 0, got {radius}")
    if oversize not in ("raise", "cap"):
        raise ValueError(f"oversize must be 'raise' or 'cap', "
                         f"got {oversize!r}")
    if max_cell_size is not None and max_cell_size < 1:
        raise ValueError(f"max_cell_size must be >= 1, "
                         f"got {max_cell_size}")
    r = float(radius)
    # Cell side is r inflated by 1e-9 RELATIVE — adjacency must hold in
    # FLOATING POINT, not just real arithmetic: a pair passing the
    # computed d2 <= r*r predicate has true |dx| <= r*(1 + ~1e-13 of
    # accumulated fp error), so |dx|/cell <= (1+1e-13)/(1+1e-9) < 1
    # with ~1e-9 relative margin — orders of magnitude wider than the
    # one-ulp (~1e-16) rounding of the x/cell division, so the two
    # floor()s can never land more than one cell apart and the 3x3
    # neighborhood provably covers every predicate-passing pair. The
    # exact-distance predicate below is UNCHANGED (still r*r), so the
    # inflation only relaxes candidate generation, never the result.
    cell = r * (1.0 + 1e-9)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    checked_x = F.when(
        F.col(id_col).isNull() | x.isNull() | y.isNull(),
        F.expr("raise_error('radius_join: id and coordinates must be "
               "non-null')").cast("double"),
    ).otherwise(x)
    base = df.select(F.col(id_col).alias("__id"),
                     checked_x.alias("__x"), y.alias("__y"))
    if max_cell_size is not None:
        cell_cols = [F.floor(F.col("__x") / F.lit(cell)).cast("bigint")
                     .alias("__gcx"),
                     F.floor(F.col("__y") / F.lit(cell)).cast("bigint")
                     .alias("__gcy")]
        keyed = base.select("__id", "__x", "__y", *cell_cols)
        if oversize == "raise":
            sizes = (keyed.groupBy("__gcx", "__gcy")
                     .agg(F.count(F.lit(1)).alias("__cn")))
            guard = F.when(
                F.col("__cn") > max_cell_size,
                F.expr(
                    "raise_error(concat('radius_join: a grid cell "
                    f"exceeds max_cell_size={int(max_cell_size)}"
                    " (n=', CAST(__cn AS STRING), ') — shrink the "
                    "radius or pass oversize=cap'))").isNull(),
            ).otherwise(F.lit(True))
            base = (keyed.join(sizes, on=["__gcx", "__gcy"])
                    .where(guard)
                    .select("__id", "__x", "__y"))
        else:
            from pyspark.sql.window import Window
            w = (Window.partitionBy("__gcx", "__gcy")
                 .orderBy(F.xxhash64(F.col("__id").cast("string")),
                          F.col("__id")))
            base = (keyed.withColumn("__r", F.row_number().over(w))
                    .where(F.col("__r") <= max_cell_size)
                    .select("__id", "__x", "__y"))
    cx = F.floor(F.col("__x") / F.lit(cell)).cast("bigint")
    cy = F.floor(F.col("__y") / F.lit(cell)).cast("bigint")
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    probe = (base
             .withColumn("__o", F.explode(offsets))
             .select(F.col("__id").alias("id_a"),
                     F.col("__x").alias("__xa"),
                     F.col("__y").alias("__ya"),
                     (cx + F.col("__o.dx")).alias("__cx"),
                     (cy + F.col("__o.dy")).alias("__cy")))
    build = base.select(F.col("__id").alias("id_b"),
                        F.col("__x").alias("__xb"),
                        F.col("__y").alias("__yb"),
                        cx.alias("__cx"), cy.alias("__cy"))
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    d2 = dx * dx + dy * dy
    return (probe.join(build, on=["__cx", "__cy"])
            .where((F.col("id_a") < F.col("id_b"))
                   & (d2 <= F.lit(r * r)))
            .select("id_a", "id_b", F.sqrt(d2).alias("dist")))
