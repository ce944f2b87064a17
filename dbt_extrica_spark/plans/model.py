"""Model / Project: the unit of work.

Reference analog: a dbt model = SQL SELECT text + config dict (materialized,
unique_key, properties, grants, ..., reference: incremental.sql:21-41). Jinja
is replaced by plain Python: SQL text with ``{ref:name}`` / ``{source:name}``
placeholders the engine resolves, or a DataFrame-builder callable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

_REF_RE = re.compile(r"\{ref:([A-Za-z0-9_]+)\}")
_SRC_RE = re.compile(r"\{source:([A-Za-z0-9_]+)\}")
_INCR_RE = re.compile(r"\{is_incremental:(.*?)\}", re.DOTALL)
_THIS_RE = re.compile(r"\{this\}")


@dataclass
class Model:
    name: str
    sql: str | None = None
    df_builder: Callable | None = None
    config: dict[str, Any] = field(default_factory=dict)
    description: str | None = None
    pre_hooks: list[str] = field(default_factory=list)
    post_hooks: list[str] = field(default_factory=list)

    @property
    def materialized(self) -> str:
        return self.config.get("materialized", "view")

    def refs(self) -> set[str]:
        """Upstream model names for DAG ordering."""
        if self.sql is None:
            return set(self.config.get("depends_on", ()))
        return set(_REF_RE.findall(self.sql)) | set(
            self.config.get("depends_on", ())
        )

    def render(self, resolve_ref, resolve_source, this: str,
               is_incremental: bool) -> str:
        """Resolve {ref:x}/{source:x}/{this}/{is_incremental:...} placeholders.

        ``{is_incremental: <fragment>}`` keeps the fragment only on
        incremental (non-first, non-full-refresh) runs — the analog of dbt's
        ``{% if is_incremental() %}`` block.
        """
        if self.sql is None:
            raise ValueError(f"model {self.name} has no SQL")
        out = _REF_RE.sub(lambda m: resolve_ref(m.group(1)), self.sql)
        out = _SRC_RE.sub(lambda m: resolve_source(m.group(1)), out)
        out = _THIS_RE.sub(this, out)
        out = _INCR_RE.sub(
            (lambda m: m.group(1)) if is_incremental else (lambda m: ""), out
        )
        return out.strip()


@dataclass
class Project:
    """A set of models executed DAG-ordered (reference analog: a dbt project;
    thread parallelism per the ``threads`` profile param, README.md:77)."""

    models: list[Model]

    def model(self, name: str) -> Model:
        for m in self.models:
            if m.name == name:
                return m
        raise KeyError(name)

    def select_nodes(self, select: list[str] | str | None = None,
                     exclude: list[str] | str | None = None) -> set[str]:
        """dbt node-selection syntax over the model graph: ``name`` (just
        the node), ``+name`` (node plus all ancestors), ``name+`` (node
        plus all descendants), ``+name+`` (both). ``select`` specs union;
        ``exclude`` specs are then removed (dbt --select/--exclude
        semantics). ``select=None`` starts from every model."""
        names = {m.name for m in self.models}
        deps = {m.name: (m.refs() & names) for m in self.models}
        children: dict[str, set[str]] = {n: set() for n in names}
        for n, ds in deps.items():
            for d in ds:
                children[d].add(n)

        def closure(start: str, edges: dict[str, set[str]]) -> set[str]:
            out, frontier = set(), [start]
            while frontier:
                cur = frontier.pop()
                for nxt in edges[cur]:
                    if nxt not in out:
                        out.add(nxt)
                        frontier.append(nxt)
            return out

        def expand(spec: str) -> set[str]:
            name = spec.strip("+")
            if name not in names:
                raise KeyError(f"unknown model in selector: {name!r}")
            out = {name}
            if spec.startswith("+"):
                out |= closure(name, deps)        # ancestors
            if spec.endswith("+"):
                out |= closure(name, children)    # descendants
            return out

        def specs(arg) -> list[str]:
            if arg is None:
                return []
            return [arg] if isinstance(arg, str) else list(arg)

        selected = set(names) if select is None else set()
        for spec in specs(select):
            selected |= expand(spec)
        for spec in specs(exclude):
            selected -= expand(spec)
        return selected

    def topo_order(self) -> list[list[str]]:
        """Kahn's algorithm -> list of parallel-executable levels."""
        names = {m.name for m in self.models}
        deps = {m.name: (m.refs() & names) for m in self.models}
        levels: list[list[str]] = []
        done: set[str] = set()
        while len(done) < len(names):
            ready = sorted(
                n for n in names - done if deps[n] <= done
            )
            if not ready:
                raise ValueError(f"Dependency cycle among: {names - done}")
            levels.append(ready)
            done |= set(ready)
        return levels
