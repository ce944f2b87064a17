"""Relation model: 3-part (catalog.schema.identifier) typed relation.

Reference: relation.py:7-13 — ``ExtricaRelation`` is a BaseRelation with a
quote policy and **lowercase** identifier matching (Trino lowercases
identifiers). Spark is case-insensitive by default (spark.sql.caseSensitive=
false), so we normalize to lowercase at construction for the same behavior.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, replace


class RelationType(str, enum.Enum):
    Table = "table"
    View = "view"
    MaterializedView = "materialized_view"
    CTE = "cte"

    @property
    def ddl_word(self) -> str:
        """'materialized_view' -> 'MATERIALIZED VIEW' (reference:
        macros/adapters.sql:156-159 replaces '_' with ' ')."""
        return self.value.replace("_", " ").upper()


@dataclass(frozen=True)
class Relation:
    identifier: str
    schema: str = "analytics"
    catalog: str = "spark_catalog"
    type: RelationType | None = None

    def __post_init__(self) -> None:
        # Trino-compatible lowercase matching (reference: relation.py:11-13)
        object.__setattr__(self, "identifier", self.identifier.lower())
        object.__setattr__(self, "schema", self.schema.lower())
        object.__setattr__(self, "catalog", self.catalog.lower())

    # -- naming ------------------------------------------------------------
    def render(self) -> str:
        """schema-qualified name used in SQL (Spark session catalog implied)."""
        return f"`{self.schema}`.`{self.identifier}`"

    def render_unquoted(self) -> str:
        return f"{self.schema}.{self.identifier}"

    def __str__(self) -> str:  # pragma: no cover
        return self.render_unquoted()

    # -- type predicates ----------------------------------------------------
    @property
    def is_table(self) -> bool:
        return self.type == RelationType.Table

    @property
    def is_view(self) -> bool:
        return self.type == RelationType.View

    @property
    def is_materialized_view(self) -> bool:
        return self.type == RelationType.MaterializedView

    # -- derivation ----------------------------------------------------------
    def incorporate(self, type: RelationType | str | None = None) -> "Relation":
        t = RelationType(type) if isinstance(type, str) else type
        return replace(self, type=t)

    def with_identifier(self, identifier: str) -> "Relation":
        return replace(self, identifier=identifier)

    def make_temp(self, suffix: str = "__dbt_tmp") -> "Relation":
        """Temp-relation naming, as make_temp_relation does in dbt."""
        return replace(self, identifier=self.identifier + suffix, type=None)

    def matches(self, other: "Relation") -> bool:
        return (
            self.identifier == other.identifier
            and self.schema == other.schema
            and self.catalog == other.catalog
        )
