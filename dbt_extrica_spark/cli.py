"""Command-line entry point — the dbt-CLI UX over the Python engine.

Reference UX analog: the reference adapter is driven by dbt-core's CLI
(``dbt run|seed|snapshot|test|build|docs generate`` with ``--select`` /
``--exclude`` / ``--full-refresh`` / ``--threads``; reference
README.md:66-105 shows the profiles flow that wires it up). There is no
Jinja project here — a PROJECT is a plain Python module (default
``project.py`` in the working directory) that defines:

- ``models``: list[Model]  (or ``project``: a built Project)
- ``seeds``: dict[name -> csv text | path to a .csv file]          (optional)
- ``seed_column_types``: dict[name -> {column: type}]              (optional)
- ``checks``: list of run_checks specs (the dbt schema tests)      (optional)
- ``sf_dir``: source-parquet directory for register_sources        (optional)
- ``schema``: target schema name (default "analytics")             (optional)

Commands mirror dbt resource semantics: ``run`` executes non-snapshot
models, ``snapshot`` executes snapshot-configured models, ``seed`` loads
seeds, ``test`` evaluates checks (exit 1 on any error-severity failure),
``build`` does seed -> all models (one DAG, snapshots included) -> test,
``docs`` emits the catalog document as JSON.

Usage::

    python -m dbt_extrica_spark run --select +fct_daily_revenue --threads 4
    python -m dbt_extrica_spark build --project my_project.py --full-refresh
    python -m dbt_extrica_spark docs --output target/catalog.json
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
from typing import Any

from .engine import Engine
from .plans.model import Project
from .plans.runner import run_project
from .session import Profile, get_spark


def _load_project_module(path: str):
    if not os.path.exists(path):
        raise SystemExit(
            f"project file not found: {path!r} — pass --project or create "
            f"project.py (a module defining `models`; see "
            f"examples/cli_project.py)")
    spec = importlib.util.spec_from_file_location("_dbt_spark_project", path)
    mod = importlib.util.module_from_spec(spec)
    assert spec.loader is not None
    spec.loader.exec_module(mod)
    return mod


def _project_from(mod) -> Project:
    if hasattr(mod, "project"):
        return mod.project
    if hasattr(mod, "models"):
        return Project(list(mod.models))
    raise SystemExit(
        "project module must define `models` (list[Model]) or `project`")


def _read_seed(value: str) -> str:
    # a value that names an existing .csv file is read from disk; anything
    # else is inline CSV text
    if value.lstrip().startswith(("#", "\n")) is False and \
            value.endswith(".csv") and os.path.exists(value):
        with open(value, "r", encoding="utf-8") as f:
            return f.read()
    return value


def _is_snapshot(model) -> bool:
    return model.config.get("materialized") == "snapshot"


def _cmd_seed(engine: Engine, mod, select: set[str] | None) -> int:
    from .operators.seeds import seed as run_seed

    seeds: dict[str, str] = getattr(mod, "seeds", {}) or {}
    types: dict[str, dict] = getattr(mod, "seed_column_types", {}) or {}
    ran = 0
    for name, value in seeds.items():
        if select and name not in select:
            continue
        rel = run_seed(engine, name, _read_seed(value),
                       column_types=types.get(name))
        n = engine.table(name).count()
        print(f"seed {name}: {rel.render_unquoted()} ({n} rows)")
        ran += 1
    print(f"Completed: {ran} seeds")
    return 0


def _cmd_models(engine: Engine, project: Project, args,
                only_snapshots: bool | None) -> int:
    """only_snapshots: True = snapshot cmd, False = run cmd, None = build."""
    if only_snapshots is not None:
        # run/snapshot operate on a filtered resource set, but selection
        # specs still resolve against the FULL graph (dbt lets `run
        # --select +snap_model` pull a snapshot's ancestors, which are
        # models)
        keep_names = {m.name for m in project.models
                      if _is_snapshot(m) == only_snapshots}
        chosen = project.select_nodes(args.select or None,
                                      args.exclude or None) & keep_names
        results = run_project(engine, project, threads=args.threads,
                              full_refresh=args.full_refresh,
                              select=sorted(chosen))
    else:
        results = run_project(engine, project, threads=args.threads,
                              full_refresh=args.full_refresh,
                              select=args.select or None,
                              exclude=args.exclude or None)
    for name in sorted(results):
        n = engine.table(name).count()
        print(f"model {name}: OK ({n} rows)")
    print(f"Completed: {len(results)} models")
    return 0


def _cmd_test(engine: Engine, mod, args) -> int:
    from . import testing

    checks: list[dict] = getattr(mod, "checks", []) or []
    if not checks:
        print("Completed: 0 tests")
        return 0
    report = testing.run_checks(engine.spark, checks, engine=engine,
                                store_failures=args.store_failures)
    rows = report.collect()
    bad = 0
    for r in rows:
        print(f"test {r['check']}: {r['status']} "
              f"({r['violations']} violations)")
        if r["status"] == "error":
            bad += 1
    print(f"Completed: {len(rows)} tests, {bad} failures")
    return 1 if bad else 0


def _cmd_docs(engine: Engine, args) -> int:
    doc = engine.generate_docs()
    text = json.dumps(doc, indent=2, default=str)
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"docs written to {args.output} "
              f"({len(doc['relations'])} relations)")
    else:
        print(text)
    return 0


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m dbt_extrica_spark",
        description="dbt-style CLI over the Spark-native engine")
    p.add_argument("command",
                   choices=["run", "seed", "snapshot", "test", "build",
                            "docs"])
    p.add_argument("--project", "-p", default="project.py",
                   help="project module path (default ./project.py)")
    p.add_argument("--select", "-s", action="append",
                   help="dbt node selector: name, +name, name+ (repeatable)")
    p.add_argument("--exclude", action="append",
                   help="dbt node selector to remove (repeatable)")
    p.add_argument("--full-refresh", action="store_true")
    p.add_argument("--threads", "-t", type=int, default=4)
    p.add_argument("--schema", default=None,
                   help="target schema (overrides the project module)")
    p.add_argument("--sf-dir", default=None,
                   help="source parquet dir (overrides the project module)")
    p.add_argument("--store-failures", action="store_true",
                   help="test: persist violation rows to audit tables")
    p.add_argument("--output", "-o", default=None,
                   help="docs: write JSON here instead of stdout")
    p.add_argument("--target-dir", default="target",
                   help="warehouse/artifact directory (default ./target; "
                        "the dbt target/ convention)")
    return p


def main(argv: list[str] | None = None,
         spark: Any | None = None) -> int:
    args = _build_parser().parse_args(argv)
    mod = _load_project_module(args.project)
    project = _project_from(mod)
    schema = args.schema or getattr(mod, "schema", None) or "analytics"
    sf_dir = args.sf_dir or getattr(mod, "sf_dir", None)

    own_session = spark is None
    if spark is None:
        spark = get_spark(app_name="dbt_extrica_spark_cli",
                          profile=Profile(schema=schema,
                                          threads=args.threads))
        spark.sparkContext.setLogLevel("ERROR")
    # a PERSISTENT warehouse under target/ (the dbt convention): unlike the
    # test-suite engines, the CLI's whole point is durable materializations,
    # so it must NOT tear its schema down afterward (engine.close is the
    # throwaway-schema path). NOTE: with Spark's default in-memory catalog,
    # table METADATA is session-scoped — one invocation is self-contained
    # (build = seed + run + test); point the session at a Hive metastore
    # for cross-process catalogs.
    wh = os.path.abspath(os.path.join(args.target_dir, "warehouse"))
    os.makedirs(wh, exist_ok=True)
    engine = Engine(spark, schema=schema, warehouse_dir=wh)
    if sf_dir:
        engine.register_sources(sf_dir)
    try:
        if args.command == "seed":
            sel = set(args.select) if args.select else None
            return _cmd_seed(engine, mod, sel)
        if args.command == "run":
            return _cmd_models(engine, project, args, only_snapshots=False)
        if args.command == "snapshot":
            return _cmd_models(engine, project, args, only_snapshots=True)
        if args.command == "test":
            return _cmd_test(engine, mod, args)
        if args.command == "docs":
            return _cmd_docs(engine, args)
        # build: seed -> full model DAG (snapshots in DAG position,
        # dbt-build semantics) -> tests
        rc = _cmd_seed(engine, mod, set(args.select) if args.select else None)
        rc = rc or _cmd_models(engine, project, args, only_snapshots=None)
        return rc or _cmd_test(engine, mod, args)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
