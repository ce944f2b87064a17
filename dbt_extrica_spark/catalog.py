"""Catalog / metadata introspection (SURVEY §2 A14-A25).

Reference implements these as information_schema / system.metadata queries
(macros/adapters.sql, macros/catalog.sql, macros/apply_grants.sql); here they
compose ``spark.catalog`` + DESCRIBE/SHOW, which are driver-side metadata
calls — no cluster work, safe at any scale.
"""

from __future__ import annotations

import threading


from pyspark.sql import DataFrame, Row, SparkSession

from .column import Column
from .errors import CompilationError, DatabaseError
from .relation import Relation, RelationType

MAX_COLUMNS = 10_000  # reference: macros/adapters.sql:12-19


class CatalogClient:
    """Stateful metadata client. Tracks what vanilla OSS Spark can't:
    materialized-view identity (A11), view definitions (for renames, A20),
    and a grants registry (A24 — OSS Spark has no SQL GRANT; reference
    semantics are preserved as bookkeeping)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._lock = threading.Lock()
        self.mv_definitions: dict[tuple[str, str], str] = {}
        self.view_definitions: dict[tuple[str, str], str] = {}
        self.grants: dict[tuple[str, str], dict[str, set[str]]] = {}

    # -- schemas (A16, A19) --------------------------------------------------
    def list_schemas(self) -> list[str]:
        """Reference: macros/adapters.sql:214-222 (information_schema.schemata)."""
        return [db.name for db in self.spark.catalog.listDatabases()]

    def check_schema_exists(self, schema: str) -> bool:
        """Reference: macros/adapters.sql:224-231."""
        return self.spark.catalog.databaseExists(schema.lower())

    def create_schema(self, schema: str, location: str | None = None) -> None:
        loc = (" LOCATION '%s'" % location.replace("'", "''")) if location else ""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{schema.lower()}`{loc}")

    def drop_schema(self, schema: str) -> None:
        """A19 — reference loops relations because Trino lacks CASCADE
        (macros/adapters.sql:172-185); Spark has native CASCADE."""
        schema = schema.lower()
        self.spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
        with self._lock:
            for reg in (self.mv_definitions, self.view_definitions, self.grants):
                for key in [k for k in reg if k[0] == schema]:
                    del reg[key]

    # -- relations (A15, A18, A20) --------------------------------------------
    def get_relation(self, relation: Relation) -> Relation | None:
        """Typed lookup; None when missing (reference load_relation pattern)."""
        if not self.spark.catalog.tableExists(relation.render_unquoted()):
            return None
        tbl = self.spark.catalog.getTable(relation.render_unquoted())
        key = (relation.schema, relation.identifier)
        if key in self.mv_definitions:
            rtype = RelationType.MaterializedView
        elif tbl.tableType == "VIEW":
            rtype = RelationType.View
        else:
            rtype = RelationType.Table
        return relation.incorporate(rtype)

    def list_relations_without_caching(self, schema: str) -> list[Relation]:
        """A15 — reference: macros/adapters.sql:29-49 (information_schema.tables
        LEFT JOIN system.metadata.materialized_views); ours: listTables + the
        MV registry."""
        schema = schema.lower()
        if not self.check_schema_exists(schema):
            return []
        out = []
        for t in self.spark.catalog.listTables(schema):
            if t.isTemporary:
                continue
            if (schema, t.name.lower()) in self.mv_definitions:
                rtype = RelationType.MaterializedView
            elif t.tableType == "VIEW":
                rtype = RelationType.View
            else:
                rtype = RelationType.Table
            out.append(Relation(t.name, schema=schema, type=rtype))
        return out

    def drop_relation(self, relation: Relation) -> None:
        """A18 — DROP {TABLE|VIEW|MATERIALIZED VIEW} IF EXISTS (reference:
        macros/adapters.sql:156-159)."""
        existing = self.get_relation(relation)
        rtype = (relation.type or (existing.type if existing else None)
                 or RelationType.Table)
        name = relation.render()
        if rtype == RelationType.View:
            self.spark.sql(f"DROP VIEW IF EXISTS {name}")
        else:  # tables and emulated MVs are both backed by tables
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        with self._lock:
            key = (relation.schema, relation.identifier)
            self.mv_definitions.pop(key, None)
            self.view_definitions.pop(key, None)
            self.grants.pop(key, None)

    def rename_relation(self, from_relation: Relation, to_relation: Relation) -> None:
        """A20 — ALTER ... RENAME TO (reference: macros/adapters.sql:188-193).
        Spark cannot rename a view -> drop + recreate from the stored
        definition (SURVEY §7.2(5))."""
        existing = self.get_relation(from_relation)
        if existing is None:
            raise DatabaseError(f"Cannot rename missing relation {from_relation}")
        fkey = (from_relation.schema, from_relation.identifier)
        tkey = (to_relation.schema, to_relation.identifier)
        if existing.is_view:
            sql_text = self.view_definitions.get(fkey)
            if sql_text is None:
                sql_text = self._view_text_from_catalog(from_relation)
            self.spark.sql(f"DROP VIEW IF EXISTS {from_relation.render()}")
            self.spark.sql(
                f"CREATE OR REPLACE VIEW {to_relation.render()} AS {sql_text}"
            )
        else:
            self.spark.sql(
                f"ALTER TABLE {from_relation.render()} RENAME TO {to_relation.render()}"
            )
        with self._lock:
            for reg in (self.mv_definitions, self.view_definitions, self.grants):
                if fkey in reg:
                    reg[tkey] = reg.pop(fkey)

    def _view_text_from_catalog(self, relation: Relation) -> str:
        # DESCRIBE EXTENDED exposes the stored view body verbatim ("View
        # Text" row) — unlike scanning SHOW CREATE TABLE for ' AS ', this
        # cannot be fooled by a definition that itself ends in a column
        # alias (SELECT a AS b FROM t).
        for r in self.spark.sql(
            f"DESCRIBE TABLE EXTENDED {relation.render()}"
        ).collect():
            if (r.col_name or "").strip() == "View Text":
                return r.data_type
        # fallback: first top-level AS after the CREATE VIEW header
        row = self.spark.sql(f"SHOW CREATE TABLE {relation.render()}").collect()[0]
        text = row[0]
        idx = text.upper().find(" AS ")
        if idx == -1:
            raise DatabaseError(f"Cannot extract view text for {relation}")
        return text[idx + 4:]

    # -- columns (A14, A21, A22) ----------------------------------------------
    def get_columns_in_relation(self, relation: Relation) -> list[Column]:
        """A14 — DESCRIBE-based column objects; missing table -> [] (not an
        error); >10,000 columns -> CompilationError (reference:
        macros/adapters.sql:6-26 + impl.py:71-78)."""
        if self.get_relation(relation) is None:
            return []
        rows = self.spark.sql(f"DESCRIBE TABLE {relation.render()}").collect()
        cols: list[Column] = []
        for r in rows:
            name = r.col_name
            if not name or name.startswith("#"):
                break  # partition/detail section separator
            cols.append(Column.from_description(name, r.data_type))
        if len(cols) >= MAX_COLUMNS:
            raise CompilationError(
                f"Too many columns in relation {relation}! dbt can process a "
                f"maximum of {MAX_COLUMNS} columns."
            )
        return cols

    def add_columns(self, relation: Relation, columns: list[Column]) -> None:
        """A21 add side — native ADD COLUMNS."""
        if not columns:
            return
        spec = ", ".join(f"`{c.name}` {c.data_type}" for c in columns)
        self.spark.sql(f"ALTER TABLE {relation.render()} ADD COLUMNS ({spec})")

    def remove_columns(self, relation: Relation, columns: list[Column]) -> None:
        """A21 drop side — parquet v1 tables cannot DROP COLUMN; rewrite the
        table without those columns (SURVEY A21 note)."""
        if not columns:
            return
        drop = {c.name.lower() for c in columns}
        current = [c.name for c in self.get_columns_in_relation(relation)
                   if c.name.lower() not in drop]
        select = ", ".join(f"`{c}`" for c in current)
        self._rewrite(relation, f"SELECT {select} FROM {relation.render()}")

    def alter_column_type(self, relation: Relation, column_name: str,
                          new_column_type: str) -> None:
        """A22 — reference does add-tmp/UPDATE/drop/rename
        (macros/adapters.sql:297-312); vanilla Spark has no UPDATE, so this is
        a single-pass cast rewrite with the same end state.

        char/varchar targets take the declared-schema path: Spark's CAST
        'does not support char/varchar type and simply treats them as
        string' (CharVarcharUtils), so a cast rewrite would erase the
        length. Declaring the new schema and INSERTing preserves it (and
        keeps every untouched varchar(n)/char(n) column's size — reference
        keeps sizes through describe, column.py:62-109)."""
        cols = self.get_columns_in_relation(relation)
        base = new_column_type.lower().split("(")[0].strip()
        if base in ("varchar", "char"):
            decls, selects = [], []
            for c in cols:
                if c.name.lower() == column_name.lower():
                    decls.append(f"`{c.name}` {new_column_type}")
                    selects.append(f"CAST(`{c.name}` AS STRING) AS `{c.name}`")
                else:
                    decls.append(f"`{c.name}` {c.data_type}")
                    selects.append(f"`{c.name}`")
            self._rewrite_typed(relation, decls, selects)
            return
        parts = []
        for c in cols:
            if c.name.lower() == column_name.lower():
                parts.append(f"CAST(`{c.name}` AS {new_column_type}) AS `{c.name}`")
            else:
                parts.append(f"`{c.name}`")
        self._rewrite(relation, f"SELECT {', '.join(parts)} FROM {relation.render()}")

    def expand_target_column_types(self, from_relation: Relation,
                                   to_relation: Relation) -> None:
        """dbt's expand_target_column_types: widen target string/decimal
        columns to fit the source (reference keeps varchar(n)/char(n) sizes
        through describe, column.py:62-109; dbt widens the smaller side).
        A bounded target string column (varchar(n)/char(n)) widens to the
        source's type when the source is larger — including unbounded
        sources, which widen to bare varchar."""
        src = {c.name.lower(): c for c in self.get_columns_in_relation(from_relation)}
        for tgt_col in self.get_columns_in_relation(to_relation):
            s = src.get(tgt_col.name.lower())
            if s is None:
                continue
            if s.is_string() and tgt_col.is_string():
                if s.string_size() > tgt_col.string_size():
                    new_type = s.data_type
                    if new_type.lower() in ("string", "varchar"):
                        new_type = "string"  # Spark's unbounded string type
                    self.alter_column_type(to_relation, tgt_col.name, new_type)
                continue
            if not (s.is_numeric() and tgt_col.is_numeric()):
                continue
            sp, ss = s.numeric_precision or 0, s.numeric_scale or 0
            tp, ts = tgt_col.numeric_precision or 0, tgt_col.numeric_scale or 0
            if sp > tp or ss > ts:
                self.alter_column_type(
                    to_relation, tgt_col.name,
                    f"decimal({max(sp, tp)},{max(ss, ts)})",
                )

    def _rewrite(self, relation: Relation, select_sql: str) -> None:
        """Stage-and-swap rewrite (same commit protocol as the table
        materialization's rename mode, reference: table.sql:12-48)."""
        tmp = relation.with_identifier(relation.identifier + "__dbt_alter_tmp")
        backup = relation.with_identifier(relation.identifier + "__dbt_alter_bak")
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp.render()}")
        self.spark.sql(f"DROP TABLE IF EXISTS {backup.render()}")
        self.spark.sql(
            f"CREATE TABLE {tmp.render()} USING PARQUET AS {select_sql}"
        )
        self.spark.sql(f"ALTER TABLE {relation.render()} RENAME TO {backup.render()}")
        self.spark.sql(f"ALTER TABLE {tmp.render()} RENAME TO {relation.render()}")
        self.spark.sql(f"DROP TABLE IF EXISTS {backup.render()}")

    def _rewrite_typed(self, relation: Relation, decls: list[str],
                       selects: list[str]) -> None:
        """Stage-and-swap rewrite with an EXPLICITLY declared schema —
        required when the new schema carries char/varchar lengths, which a
        CTAS of a CAST would silently erase (Spark CharVarcharUtils)."""
        tmp = relation.with_identifier(relation.identifier + "__dbt_alter_tmp")
        backup = relation.with_identifier(relation.identifier + "__dbt_alter_bak")
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp.render()}")
        self.spark.sql(f"DROP TABLE IF EXISTS {backup.render()}")
        self.spark.sql(
            f"CREATE TABLE {tmp.render()} ({', '.join(decls)}) USING PARQUET"
        )
        self.spark.sql(
            f"INSERT INTO {tmp.render()} "
            f"SELECT {', '.join(selects)} FROM {relation.render()}"
        )
        self.spark.sql(f"ALTER TABLE {relation.render()} RENAME TO {backup.render()}")
        self.spark.sql(f"ALTER TABLE {tmp.render()} RENAME TO {relation.render()}")
        self.spark.sql(f"DROP TABLE IF EXISTS {backup.render()}")

    # -- comments (A23) --------------------------------------------------------
    def persist_relation_docs(self, relation: Relation, comment: str) -> None:
        """Reference: COMMENT ON TABLE/VIEW (macros/adapters.sql:196-203);
        ours: TBLPROPERTIES('comment')."""
        escaped = comment.replace("'", "''")
        existing = self.get_relation(relation)
        if existing is not None and existing.is_view:
            self.spark.sql(
                f"ALTER VIEW {relation.render()} "
                f"SET TBLPROPERTIES ('comment' = '{escaped}')"
            )
        else:
            self.spark.sql(
                f"ALTER TABLE {relation.render()} "
                f"SET TBLPROPERTIES ('comment' = '{escaped}')"
            )

    def persist_column_docs(self, relation: Relation,
                            column_comments: dict[str, str | None]) -> None:
        """Reference: COMMENT ON COLUMN, NULL clears (macros/adapters.sql:205-211)."""
        for col, comment in column_comments.items():
            if comment is None:
                self.spark.sql(
                    f"ALTER TABLE {relation.render()} "
                    f"ALTER COLUMN `{col}` COMMENT ''"
                )
            else:
                escaped = comment.replace("'", "''")
                self.spark.sql(
                    f"ALTER TABLE {relation.render()} "
                    f"ALTER COLUMN `{col}` COMMENT '{escaped}'"
                )

    def get_relation_comment(self, relation: Relation) -> str | None:
        rows = self.spark.sql(
            f"DESCRIBE TABLE EXTENDED {relation.render()}"
        ).collect()
        for r in rows:
            if r.col_name == "Comment":
                return r.data_type
        for r in rows:
            if r.col_name == "Table Properties" and "comment=" in (r.data_type or ""):
                props = r.data_type.strip("[]")
                for kv in props.split(","):
                    if kv.strip().startswith("comment="):
                        return kv.strip()[len("comment="):]
        return None

    # -- grants (A24) -----------------------------------------------------------
    def show_grants(self, relation: Relation) -> dict[str, set[str]]:
        """Reference: information_schema.table_privileges with lowercased
        privilege (apply_grants.sql:1-9); ours: the registry, falling back
        to the TBLPROPERTIES copy (durable across catalog clients)."""
        with self._lock:
            stored = self.grants.get((relation.schema, relation.identifier))
            if stored is not None:
                return {p: set(g) for p, g in stored.items()}
        return self._grants_from_properties(relation)

    def _grants_from_properties(self, relation: Relation) -> dict[str, set[str]]:
        import json

        try:
            rows = self.spark.sql(
                f"SHOW TBLPROPERTIES {relation.render()}").collect()
        except Exception:
            return {}
        for r in rows:
            if r.key == "dbt_grants":
                try:
                    loaded = json.loads(r.value)
                    return {p: set(g) for p, g in loaded.items()}
                except Exception:
                    return {}
        return {}

    def apply_grants(self, relation: Relation,
                     grant_config: dict[str, list[str]] | None,
                     should_revoke: bool = True) -> None:
        """Reference: one GRANT per grantee, no multi-grantee statements
        (apply_grants.sql:29-37), copy_grants=False (apply_grants.sql:11-23).
        OSS Spark has no SQL grants -> bookkeeping with identical diff logic."""
        if grant_config is None:
            return
        import json

        key = (relation.schema, relation.identifier)
        desired = {priv.lower(): set(gs) for priv, gs in grant_config.items()}
        with self._lock:
            if should_revoke:
                # diff semantics: anything not in the config is revoked
                self.grants[key] = desired
            else:
                merged = {p: set(g) for p, g in self.grants.get(key, {}).items()}
                for p, gs in desired.items():
                    merged.setdefault(p, set()).update(gs)
                self.grants[key] = merged
            final = {p: sorted(g) for p, g in self.grants[key].items()}
        # durable copy (SURVEY A24: log + store in TBLPROPERTIES); views
        # would need ALTER VIEW — grants on tables/MVs only, best-effort
        try:
            payload = json.dumps(final).replace("'", "''")
            self.spark.sql(
                f"ALTER TABLE {relation.render()} "
                f"SET TBLPROPERTIES ('dbt_grants' = '{payload}')"
            )
        except Exception:
            pass

    # -- full catalog (A17) -------------------------------------------------------
    CATALOG_COLUMNS = (
        "table_database", "table_schema", "table_name", "table_type",
        "table_comment", "column_name", "column_index", "column_type",
        "column_comment", "table_owner",
    )

    def get_catalog(self, schemas: list[str]) -> DataFrame:
        """A17 — one row per column across the requested schemas, same output
        columns and ordering as reference: macros/catalog.sql:124-140."""
        relations = []
        for s in schemas:
            relations.extend(self.list_relations_without_caching(s))
        return self.get_catalog_relations(relations)

    def get_catalog_relations(self, relations: list[Relation]) -> DataFrame:
        rows: list[Row] = []
        for rel in relations:
            comment = None
            try:
                comment = self.get_relation_comment(rel)
            except Exception:
                pass
            type_word = (rel.type or RelationType.Table).ddl_word
            described = self.spark.sql(f"DESCRIBE TABLE {rel.render()}").collect()
            idx = 0
            for r in described:
                if not r.col_name or r.col_name.startswith("#"):
                    break
                rows.append(Row(
                    table_database="spark_catalog",
                    table_schema=rel.schema,
                    table_name=rel.identifier,
                    table_type=type_word,
                    table_comment=comment,
                    column_name=r.col_name,
                    column_index=idx,
                    column_type=r.data_type,
                    column_comment=r.comment if hasattr(r, "comment") else None,
                    table_owner=None,
                ))
                idx += 1
        schema = ("table_database string, table_schema string, table_name string,"
                  " table_type string, table_comment string, column_name string,"
                  " column_index int, column_type string, column_comment string,"
                  " table_owner string")
        df = self.spark.createDataFrame(rows, schema=schema) if rows else (
            self.spark.createDataFrame([], schema=schema)
        )
        return df.orderBy("table_schema", "table_name", "column_index")
