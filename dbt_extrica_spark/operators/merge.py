"""Incremental strategy rewrites: append / merge / delete+insert.

The reference emits MERGE / DELETE+INSERT SQL for Trino (reference:
materializations/incremental.sql:112-205). Vanilla Spark-on-parquet has no
MERGE/DELETE, so these are deterministic DataFrame rewrites followed by the
stage-and-swap commit (SURVEY §4.2 item 1).

Scale posture:
- ``merge``: two hash joins on the unique key (anti + inner) plus one anti
  join for inserts — all shuffle on the key; AQE broadcasts the (typically
  small) incremental batch automatically.
- ``delete+insert`` reproduces the reference's **column-wise** IN semantics
  for composite keys (k1 IN (...) AND k2 IN (...), NOT tuple equality —
  reference: incremental.sql:116-128). Implemented as per-key distinct
  key-set joins, explicitly broadcast: the distinct key set of an incremental
  batch is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..errors import DatabaseError

SOURCE_ALIAS = "DBT_INTERNAL_SOURCE"
DEST_ALIAS = "DBT_INTERNAL_DEST"


def _key_list(unique_key: str | list[str]) -> list[str]:
    return [unique_key] if isinstance(unique_key, str) else list(unique_key)


def _require_sequence_type(df: DataFrame, seq_col: str, where: str,
                           integral_only: bool = False) -> None:
    """CDC sequence columns must order as sequences: a string seq sorts
    lexicographically ('10' < '2') and silently elects the WRONG winner
    — the kind of divergence that never heals, so it is a type error,
    not a runtime guard. Batch accepts any numeric / timestamp / date
    (winners compare in the native type); the streaming twin passes
    ``integral_only=True`` because it persists ``__cdc_seq`` as bigint
    and a fractional or sub-second-timestamp seq would collapse
    distinct sequence numbers under that cast (1.5 and 1.2 both -> 1 —
    'already applied', silently dropped)."""
    from pyspark.sql import types as T

    dt = df.schema[seq_col].dataType
    if integral_only:
        ok = isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                             T.LongType))
        want = "an integral (byte/short/int/long)"
    else:
        ts_types = (T.TimestampType, T.DateType)
        if hasattr(T, "TimestampNTZType"):
            ts_types = ts_types + (T.TimestampNTZType,)
        ok = isinstance(dt, (T.NumericType,) + ts_types)
        want = "a numeric, timestamp, or date"
    if not ok:
        raise TypeError(
            f"{where}: seq column {seq_col!r} has type "
            f"{dt.simpleString()}; it must be {want} type — other "
            f"types (e.g. string) do not order as sequence numbers")


def _join_condition(keys: list[str],
                    incremental_predicates: list[str] | None,
                    null_safe: bool = False):
    """Equality on every key (reference: incremental.sql:161-180) AND any
    extra predicates, which may reference DBT_INTERNAL_SOURCE/DEST aliases
    (reference: incremental.sql:153). ``null_safe=True`` uses <=> so a
    NULL key matches a NULL key — NOT the ANSI MERGE / dbt default
    (where NULL keys silently re-insert every run), but what a
    key-converging maintenance loop over aggregate rows needs (a NULL
    group key is legitimate data there)."""
    op = "<=>" if null_safe else "="
    cond = None
    for k in keys:
        c = F.expr(f"{SOURCE_ALIAS}.`{k}` {op} {DEST_ALIAS}.`{k}`")
        cond = c if cond is None else cond & c
    for p in incremental_predicates or []:
        cond = cond & F.expr(p)
    return cond


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    unique_key: str | list[str],
    dest_columns: list[str],
    update_columns: list[str] | None = None,
    incremental_predicates: list[str] | None = None,
    null_safe_keys: bool = False,
) -> DataFrame:
    """A7 — result of ``MERGE INTO target USING source ON keys WHEN MATCHED
    THEN UPDATE SET <update_columns> WHEN NOT MATCHED THEN INSERT
    <dest_columns>`` (reference: incremental.sql:152-205).
    ``null_safe_keys``: see _join_condition — defaults to the ANSI/dbt
    plain-equality behavior.

    ``update_columns`` defaults to all dest columns (dbt's
    get_merge_update_columns with merge_update_columns/merge_exclude_columns
    applied upstream).
    """
    keys = _key_list(unique_key)
    update_cols = {c.lower() for c in (update_columns or dest_columns)}
    src = source.alias(SOURCE_ALIAS)
    tgt = target.alias(DEST_ALIAS)
    cond = _join_condition(keys, incremental_predicates,
                           null_safe=null_safe_keys)

    # ANSI/Trino MERGE errors when one target row matches >1 source row
    # (reference semantics; a silent fan-out would grow the target
    # nondeterministically). Two-tier check keeps the common path free: a
    # cheap batch-local duplicate-key probe first, and only if the source
    # actually has duplicate key tuples, an exact per-target-row match count
    # under the full join condition.
    dup_keys = (
        source.groupBy(*[F.col(f"`{k}`") for k in keys])
        .agg(F.count(F.lit(1)).alias("__dbt_n"))
        .where("__dbt_n > 1")
    )
    if dup_keys.limit(1).count() > 0:
        rid = "__dbt_internal_row_id"
        multi = (
            target.withColumn(rid, F.monotonically_increasing_id())
            .alias(DEST_ALIAS)
            .join(src, on=cond, how="inner")
            .groupBy(rid).agg(F.count(F.lit(1)).alias("__dbt_n"))
            .where("__dbt_n > 1")
        )
        if multi.limit(1).count() > 0:
            raise DatabaseError(
                "MERGE failed: one target table row matched more than one "
                "source row (duplicate unique_key values "
                f"{keys} in the incremental batch)"
            )

    # target rows with no matching source row -> kept untouched
    kept = tgt.join(src, on=cond, how="left_anti")

    # matched rows -> dest row with update_columns taken from source
    matched_proj = [
        (F.col(f"{SOURCE_ALIAS}.`{c}`") if c.lower() in update_cols
         else F.col(f"{DEST_ALIAS}.`{c}`")).alias(c)
        for c in dest_columns
    ]
    updated = tgt.join(src, on=cond, how="inner").select(*matched_proj)

    # source rows with no matching target row -> inserted
    inserted = (
        src.join(tgt, on=cond, how="left_anti")
        .select(*[F.col(f"`{c}`") for c in dest_columns])
    )

    return (
        kept.select(*[F.col(f"`{c}`") for c in dest_columns])
        .unionByName(updated)
        .unionByName(inserted)
    )


def append_only(source: DataFrame, target: DataFrame,
                dest_columns: list[str]) -> DataFrame:
    """A6 — plain INSERT INTO ... SELECT (reference: incremental.sql:198-204).
    Returned as the rows to append; caller appends (no rewrite needed)."""
    return source.select(*[F.col(f"`{c}`") for c in dest_columns])


def delete_insert(
    target: DataFrame,
    source: DataFrame,
    unique_key: str | list[str] | None,
    dest_columns: list[str],
    incremental_predicates: list[str] | None = None,
) -> DataFrame:
    """A8 — DELETE rows matching the source key sets, then INSERT all source
    rows (reference: incremental.sql:112-150).

    ⚠ Composite keys use the reference's column-wise semantics: a target row
    is deleted when EACH key column value appears in the source's values for
    that column independently (k1 IN (...) AND k2 IN (...)), which deletes a
    superset of tuple-matching. Reproduced exactly (SURVEY §4.2 item 2).

    DELETE keeps rows where the condition is not TRUE (false or NULL) — the
    per-key membership flags make that explicit.
    """
    result = target
    if unique_key:
        keys = _key_list(unique_key)
        flags = []
        for i, k in enumerate(keys):
            marker = f"__dbt_key_match_{i}"
            key_set = (
                source.select(F.col(f"`{k}`")).where(F.col(f"`{k}`").isNotNull())
                .distinct().withColumn(marker, F.lit(True))
            )
            # incremental batches have small distinct key sets -> broadcast
            result = result.join(F.broadcast(key_set), on=k, how="left")
            flags.append(marker)
        delete_cond = F.lit(True)
        for m in flags:
            delete_cond = delete_cond & F.col(m).isNotNull()
        for p in incremental_predicates or []:
            delete_cond = delete_cond & F.expr(p)
        # rows survive unless the delete condition is definitively TRUE
        result = result.where(
            ~F.coalesce(delete_cond, F.lit(False))
        ).drop(*flags)
    kept = result.select(*[F.col(f"`{c}`") for c in dest_columns])
    inserted = source.select(*[F.col(f"`{c}`") for c in dest_columns])
    return kept.unionByName(inserted)


def dynamic_overwrite_insert(spark, table_name: str,
                             df: DataFrame) -> None:
    """The single shared partition-scoped commit primitive: positional
    insertInto under dynamic partitionOverwriteMode, with conf
    save/restore. Every dynamic-overwrite write in the package routes
    through here (review r10: the save/set/write/restore dance was
    copy-pasted four times — one helper, one place to fix)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.insertInto(table_name, overwrite=True)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def partition_scoped_overwrite(
    engine,
    target,  # Relation
    src_df: DataFrame,
    rewrite,  # (tgt_scope: DataFrame) -> DataFrame — final rows for the scope
    partition_cols: list[str],
    extra_affected: DataFrame | None = None,
) -> None:
    """Apply an upsert by rewriting ONLY affected partitions (the 100 TB
    incremental path: a 1 GB batch must not rewrite the whole table).

    - affected = source batch's partition values ∪ ``extra_affected`` (e.g.
      partitions that lose rows to deletes outside the source's partitions)
    - the rewrite runs over the target restricted to affected partitions
    - commit via dynamic partition overwrite (only partitions present in the
      result are replaced)
    - partitions whose final content is EMPTY are dropped explicitly —
      dynamic overwrite cannot clear a partition it writes no rows to.
    """
    spark = engine.spark
    tgt_df = spark.table(target.render_unquoted())
    affected = src_df.select(*partition_cols).distinct()
    if extra_affected is not None:
        affected = affected.unionByName(
            extra_affected.select(*partition_cols).distinct()
        ).distinct()
    affected = affected.persist()
    # a USING-style join reorders the key columns to the front; restore the
    # table's column order — the dynamic-overwrite insertInto below is
    # POSITIONAL
    tgt_scope = tgt_df.join(F.broadcast(affected), on=partition_cols,
                            how="left_semi").select(*tgt_df.columns)
    final_scope = rewrite(tgt_scope).select(*tgt_df.columns)

    emptied = [
        r.asDict() for r in
        affected.join(
            final_scope.select(*partition_cols).distinct(),
            on=partition_cols, how="left_anti",
        ).collect()
    ]

    dynamic_overwrite_insert(spark, target.render_unquoted(), final_scope)
    for part in emptied:
        clause = ", ".join(
            "`%s` = '%s'" % (k, str(v).replace("'", "''"))
            for k, v in part.items()
        )
        spark.sql(
            f"ALTER TABLE {target.render()} DROP IF EXISTS PARTITION ({clause})"
        )
    affected.unpersist()


def get_merge_update_columns(
    merge_update_columns: list[str] | None,
    merge_exclude_columns: list[str] | None,
    dest_columns: list[str],
) -> list[str]:
    """dbt-core semantics used by the reference (incremental.sql:156-158):
    explicit update list wins; else all dest columns minus excluded."""
    if merge_update_columns and merge_exclude_columns:
        raise ValueError(
            "Model cannot specify merge_update_columns and "
            "merge_exclude_columns. Please update model to use only one."
        )
    if merge_update_columns:
        return list(merge_update_columns)
    if merge_exclude_columns:
        excl = {c.lower() for c in merge_exclude_columns}
        return [c for c in dest_columns if c.lower() not in excl]
    return list(dest_columns)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    unique_key: str | list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    dest_columns: list[str] | None = None,
) -> DataFrame:
    """CDC changelog apply — the APPLY CHANGES INTO shape every
    log-replication pipeline needs (Debezium/DMS feeds, Delta Live
    Tables' apply_changes): fold a batch of I/U/D change rows into the
    target, keeping only each key's LATEST change by ``seq_col``.

    Semantics (SCD type 1):

    - per key, the change with the highest (seq, op) wins — op breaks
      exact seq ties with 'D' > 'U' > 'I' (a delete and an upsert
      carrying the SAME sequence number resolve to the delete,
      deterministically, rather than by partition order);
    - winning 'I'/'U' -> the target row becomes the change row (insert
      or overwrite — upsert semantics, the merge strategy's matched +
      not-matched arms in one);
    - winning 'D' -> the key is removed; a delete for an absent key is
      a no-op (idempotent replay — at-least-once delivery of a
      changelog segment must not error);
    - ops outside {I,U,D} and NULL keys/seq raise in-scan (a silently
      dropped change is a divergence that never heals);
    - ``seq_col`` must carry a numeric / timestamp / date type —
      winners order by seq in its NATIVE type, so a string seq would
      sort lexicographically ('10' < '2') and silently pick the wrong
      winner; a non-orderable-as-sequence type raises up front (the
      streaming twin enforces the stricter integral contract because
      it persists ``__cdc_seq`` as bigint).

    Exactly-once not required: re-applying the same batch is a no-op
    (max-by is idempotent), the at-least-once property streaming
    replication needs.

    Returns the new target contents (the incremental orchestrator's
    overwrite contract, like merge_upsert).

    Scale shape: ONE key aggregation picks winners (max_by over a
    (seq, op-rank, row) struct — map-side combinable, no window sort),
    then one key-keyed left-anti + a union: two key shuffles total,
    broadcast-eligible when the change batch is small (the steady-state
    CDC case: minutes of changes vs the full table).

    Cite: composes the reference's merge + delete+insert strategies
    (reference: incremental.sql:152-205) into the changelog form the
    reference leaves to Trino MERGE users."""
    keys = _key_list(unique_key)
    cols = dest_columns or [c for c in target.columns]
    missing = [c for c in cols + keys if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_cdc: changes is missing columns "
                         f"{missing}")
    if op_col in cols or seq_col in cols:
        raise ValueError(f"apply_cdc: op/seq columns ({op_col!r}, "
                         f"{seq_col!r}) must not be dest columns")
    _require_sequence_type(changes, seq_col, "apply_cdc")
    op = F.upper(F.col(op_col).cast("string"))
    key_null = None
    for k in keys:
        cnd = F.col(k).isNull()
        key_null = cnd if key_null is None else (key_null | cnd)
    checked = F.when(
        key_null | F.col(seq_col).isNull() | ~op.isin("I", "U", "D"),
        F.expr("raise_error('apply_cdc: op must be I/U/D and key/seq "
               "non-null')").cast("int"),
    ).otherwise(
        # tie rank: D=2 outranks U=1 outranks I=0 at equal seq
        F.when(op == "D", 2).when(op == "U", 1).otherwise(0))
    winners = (changes
               .withColumn("__rk", checked)
               .groupBy(*[F.col(k) for k in keys])
               .agg(F.max(F.struct(
                   F.col(seq_col).alias("s"),
                   F.col("__rk").alias("r"),
                   F.struct(*[F.col(c) for c in cols]).alias("row"),
               )).alias("__w")))
    upserts = (winners.where(F.col("__w.r") < 2)
               .select(*[F.col(f"__w.row.`{c}`").alias(c) for c in cols]))
    # every changed key leaves the old target (deletes stay gone,
    # upserts re-enter with the new row)
    kept = target.select(*cols).join(
        winners.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(upserts)
