"""DAG-ordered, thread-parallel model runner.

Reference analog: dbt-core runs N models concurrently on one connection per
thread (reference: README.md:77 ``threads``; connections.py:344 thread-keyed
registry). Spark sessions are thread-safe; each worker thread tags its jobs
with a scheduler pool + job group so independent models share the cluster
fairly and can be cancelled individually (reference: connections.py:315-316).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import TYPE_CHECKING

from ..relation import Relation

if TYPE_CHECKING:  # pragma: no cover
    from ..engine import Engine
    from .model import Project


def run_project(engine: "Engine", project: "Project", threads: int = 4,
                full_refresh: bool = False) -> dict[str, Relation]:
    """Execute every model, level-parallel per the dependency DAG."""
    results: dict[str, Relation] = {}

    def _run(name: str) -> tuple[str, Relation]:
        model = project.model(name)
        sc = engine.spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"model_{name}")
        sc.setJobGroup(f"model_{name}", f"dbt_extrica_spark model {name}",
                       interruptOnCancel=True)
        try:
            rel = engine.materialize(model, full_refresh=full_refresh)
            return name, rel
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    for level in project.topo_order():
        if len(level) == 1 or threads <= 1:
            for name in level:
                n, rel = _run(name)
                results[n] = rel
        else:
            with ThreadPoolExecutor(max_workers=threads) as pool:
                for n, rel in pool.map(_run, level):
                    results[n] = rel
    return results
