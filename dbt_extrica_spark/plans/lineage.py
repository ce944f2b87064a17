"""Column-level lineage through the model DAG.

Walks Spark's ANALYZED logical plan (the already-resolved Catalyst tree —
no SQL re-parsing, CTEs/stars/aliases resolved for free) and maps every
output column of a compiled model to the set of physical
``(relation, column)`` leaves it transitively depends on.

The reference has no lineage facility; dbt-core derives model-level
lineage only (ref graph). Column grain is the piece a warehouse migration
or PII audit actually needs, and Catalyst hands us the resolved tree, so
the Spark-first implementation is ~150 lines of plan traversal.

Node handling:
- ``Alias`` expressions introduce new attribute ids -> direct deps are the
  alias child's attribute references.
- ``Generate`` (explode/LATERAL VIEW): generator outputs depend on the
  generator's references.
- ``Union``: output attr i depends positionally on every child's attr i.
- Leaves: ``LogicalRelation``/``HiveTableRelation`` (catalog name when
  available), ``View`` boundaries (view identifier), ``LocalRelation``
  (VALUES literals).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _refs(jexpr) -> set[int]:
    out: set[int] = set()
    it = jexpr.references().iterator()
    while it.hasNext():
        out.add(it.next().exprId().id())
    return out


def _relation_name(node, simple: str) -> str | None:
    try:
        if simple == "LogicalRelation":
            ct = node.catalogTable()
            if ct.isDefined():
                return ct.get().identifier().unquotedString()
            return "<files>"
        if simple == "HiveTableRelation":
            return node.tableMeta().identifier().unquotedString()
        if simple == "View":
            return node.desc().identifier().unquotedString()
        if simple == "LocalRelation":
            return "<values>"
        if simple in ("OneRowRelation", "Range"):
            return f"<{simple.lower()}>"
    except Exception:  # pragma: no cover - defensive against API drift
        return f"<{simple}>"
    return None


_LEAVES = ("LogicalRelation", "HiveTableRelation", "View", "LocalRelation",
           "OneRowRelation", "Range")


def column_lineage(spark: "SparkSession", sql: str) -> dict[str, set[tuple[str, str]]]:
    """Lineage for one compiled SELECT: {output_column: {(relation, column)}}.

    Columns that are pure literals/generators resolve to pseudo-relations
    like ``<values>``; columns fed by multiple branches (UNION, COALESCE
    over a join) list every contributing leaf.
    """
    df = spark.sql(sql)
    root = df._jdf.queryExecution().analyzed()

    dep: dict[int, set[int]] = {}
    leaf: dict[int, tuple[str, str]] = {}

    def walk(node) -> None:
        simple = node.getClass().getSimpleName()
        if simple in _LEAVES:
            name = _relation_name(node, simple) or f"<{simple}>"
            for attr in _seq(node.output()):
                leaf[attr.exprId().id()] = (name, attr.name())
            # a View wraps its expansion; the boundary is the lineage stop
            return
        if simple == "Union":
            children = _seq(node.children())
            outs = _seq(node.output())
            for i, attr in enumerate(outs):
                ids = set()
                for ch in children:
                    ch_out = _seq(ch.output())
                    if i < len(ch_out):
                        ids.add(ch_out[i].exprId().id())
                dep.setdefault(attr.exprId().id(), set()).update(ids)
        elif simple == "Generate":
            gen_refs = _refs(node.generator())
            for attr in _seq(node.generatorOutput()):
                dep.setdefault(attr.exprId().id(), set()).update(gen_refs)
        # register every Alias anywhere in this node's expressions
        stack = _seq(node.expressions())
        while stack:
            e = stack.pop()
            if e.getClass().getSimpleName() == "Alias":
                dep.setdefault(e.exprId().id(), set()).update(_refs(e.child()))
            stack.extend(_seq(e.children()))
        for ch in _seq(node.children()):
            walk(ch)
        # subqueries inside expressions (scalar subqueries, IN/EXISTS)
        for sub in _seq(node.subqueries()):
            walk(sub)

    walk(root)

    def resolve(attr_id: int) -> set[tuple[str, str]]:
        seen: set[int] = set()
        out: set[tuple[str, str]] = set()
        stack = [attr_id]
        while stack:
            i = stack.pop()
            if i in seen:
                continue
            seen.add(i)
            # an id can be BOTH a leaf and carry deps: Union reuses its
            # first branch's attribute ids, so a pass-through column's id
            # is branch 1's leaf while dep[] holds the other branches
            if i in leaf:
                out.add(leaf[i])
            if i in dep:
                stack.extend(dep[i])
        return out

    return {
        attr.name(): resolve(attr.exprId().id())
        for attr in _seq(root.output())
    }


def project_lineage(engine, project) -> dict[str, dict[str, set[tuple[str, str]]]]:
    """Column lineage for every SQL model in a Project, in DAG order.

    Models must already be materialized (compiled SQL references their
    upstream relations by name). DataFrame-builder models are opaque to
    SQL analysis and are skipped.
    """
    out: dict[str, dict[str, set[tuple[str, str]]]] = {}
    for level in project.topo_order():
        for name in level:
            model = project.model(name)
            if model.sql is None:
                continue
            compiled = engine.compile_sql(model)
            out[name] = column_lineage(engine.spark, compiled)
    return out
