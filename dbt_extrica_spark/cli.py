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
``build`` runs the full orchestrator (seeds -> models in DAG order with
attached tests, snapshots in DAG position -> module-level checks) and
writes ``target/run_results.json``, ``retry`` reruns only the
failed/skipped slice of the last build (dbt retry), ``ls`` lists
resolved selection (``--output json`` emits one machine-readable JSON
object per node for CI tooling), ``parse`` validates the project
(graph acyclicity + every placeholder resolvable) and writes the
manifest without executing anything, ``compile`` prints compiled SQL,
``docs`` emits the
catalog document as JSON, ``source freshness`` (or the one-token
``source-freshness``) evaluates the module's ``sources_freshness``
specs via testing.source_freshness with test-style exit codes (error
-> 1, warn/pass -> 0), ``show --select m --limit n`` previews a
model's compiled query without materializing, ``debug`` runs
session/schema/graph/source connectivity checks, ``run-operation
<name> --args '{...}'`` invokes a module-level callable taking
(engine, **kwargs) — the dbt maintenance-macro analog. ``--vars
'{"k": v}'`` injects a dict into the project module's globals as
``dbt_vars`` before it executes (dbt's variable passing).

State workflows (slim CI): ``run``/``build``/``retry``/``snapshot``/
``compile`` write ``target/manifest.json`` (a content hash per model +
the target schema); ``--state <dir>`` enables ``state:modified`` /
``state:new`` selector specs (with the usual +graph operators) for
both ``--select`` and ``--exclude``, and ``clone --state <dir>
--schema <dev>`` recreates the state schema's relations in the dev
schema as pointer views. ``--defer`` (optionally ``--favor-state``)
resolves refs to UNSELECTED models against the state manifest's
schema, so ``run --select state:modified+ --defer --state prod/``
builds only the changed models against prod parents — the full dbt
slim-CI loop.

Usage::

    python -m dbt_extrica_spark run --select +fct_daily_revenue --threads 4
    python -m dbt_extrica_spark build --project my_project.py --full-refresh
    python -m dbt_extrica_spark retry --project my_project.py
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


def _parse_vars(text: str | None, flag: str = "--vars") -> dict:
    """``--vars`` / ``--args`` accept a JSON object (dbt accepts
    YAML/JSON; JSON is the stdlib-parseable subset). ``flag`` names the
    option in error messages so ``--args`` failures don't point the user
    at ``--vars``."""
    if not text:
        return {}
    try:
        parsed = json.loads(text)
    except json.JSONDecodeError as exc:
        raise SystemExit(f"{flag} must be a JSON object: {exc}") from None
    if not isinstance(parsed, dict):
        raise SystemExit(f"{flag} must be a JSON object, e.g. "
                         f"{flag} '{{\"start_date\": \"2024-01-01\"}}'")
    return parsed


def _load_project_module(path: str, dbt_vars: dict | None = None):
    if not os.path.exists(path):
        raise SystemExit(
            f"project file not found: {path!r} — pass --project or create "
            f"project.py (a module defining `models`; see "
            f"examples/cli_project.py)")
    spec = importlib.util.spec_from_file_location("_dbt_spark_project", path)
    mod = importlib.util.module_from_spec(spec)
    assert spec.loader is not None
    # dbt's `--vars` analog: the parsed dict is injected into the module's
    # globals BEFORE execution, so project code can parameterize itself
    # with `dbt_vars.get("name", default)` (use
    # `globals().get("dbt_vars", {})` to stay importable outside the CLI)
    mod.__dict__["dbt_vars"] = dict(dbt_vars or {})
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
    if value.endswith(".csv") and os.path.exists(value):
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


def _cmd_source_freshness(engine: Engine, mod, args) -> int:
    """`dbt source freshness` analog over testing.source_freshness: the
    project module's ``sources_freshness`` list holds one spec per
    source (table, loaded_at_field, warn_after_minutes,
    error_after_minutes, now). Exit-code semantics match `test`: any
    error-status source exits 1; warn stays 0 (dbt's warn severity)."""
    from . import testing

    specs: list[dict] = getattr(mod, "sources_freshness", []) or []
    if not specs:
        print("Completed: 0 sources")
        return 0
    allowed = {"table", "loaded_at_field", "warn_after_minutes",
               "error_after_minutes", "now"}
    bad = 0
    for spec in specs:
        spec = dict(spec)
        name = spec.get("table")
        # fail with the offending source named, not a raw TypeError from
        # deep inside source_freshness (dbt's key names differ — e.g.
        # warn_after — so misspellings are a likely authoring error)
        unknown = set(spec) - allowed
        if not name or "loaded_at_field" not in spec or unknown:
            raise SystemExit(
                f"bad sources_freshness spec {name or spec!r}: "
                + (f"unknown keys {sorted(unknown)}; " if unknown else "")
                + f"required keys: table, loaded_at_field; optional: "
                  f"warn_after_minutes, error_after_minutes, now")
        # bare source names resolve through the engine's source registry
        # (register_sources catalogs them schema-qualified)
        rel = engine.sources.get(name)
        if rel is not None:
            spec["table"] = rel.render_unquoted()
        row = testing.source_freshness(engine.spark, **spec).collect()[0]
        age = ("" if row["age_minutes"] is None
               else f", age {row['age_minutes']:.1f} min")
        print(f"source {name}: {row['status']}{age}")
        if row["status"] == "error":
            bad += 1
    print(f"Completed: {len(specs)} sources, {bad} errors")
    return 1 if bad else 0


def _cmd_show(engine: Engine, project: Project, args) -> int:
    """`dbt show` analog: compile the selected model's SQL and preview
    the first --limit rows WITHOUT materializing anything (DataFrame-
    builder models are built, not saved)."""
    sel = args.select or []
    if len(sel) != 1:
        raise SystemExit("show needs exactly one --select <model>")
    name = sel[0].lstrip("+").rstrip("+")
    try:
        m = project.model(name)
    except KeyError:
        raise SystemExit(f"unknown model {name!r}") from None
    if m.df_builder is not None:
        df = m.df_builder(engine)
    else:
        # refs/sources resolve to catalog relations, so upstreams must be
        # materialized first (dbt show has the same requirement)
        df = engine.spark.sql(
            f"SELECT * FROM ({engine.compile_sql(m)}) __show_q")
    df.show(args.limit, truncate=False)
    return 0


def _cmd_debug(engine: Engine, mod, project: Project, args) -> int:
    """`dbt debug` analog: session, warehouse, project graph, and source
    connectivity checks with ok/FAIL lines; exit 1 on any failure."""
    checks: list[tuple[str, bool, str]] = []

    def check(label: str, fn) -> None:
        try:
            detail = fn()
            checks.append((label, True, str(detail)))
        except Exception as exc:  # noqa: BLE001 — each failure reported
            checks.append((label, False, f"{type(exc).__name__}: {exc}"))

    check("spark session", lambda: f"version {engine.spark.version}")
    check("target schema",
          lambda: engine.spark.sql(
              f"SHOW TABLES IN {engine.schema}").count() is not None
          and engine.schema)
    check("project graph",
          lambda: f"{len(project.models)} models, "
                  f"{len(project.topo_order())} levels")
    for name, rel in sorted(getattr(engine, "sources", {}).items()):
        check(f"source {name}",
              lambda rel=rel: f"{engine.spark.table(rel.render_unquoted()).count()} rows")
    bad = 0
    for label, ok, detail in checks:
        print(f"{'ok  ' if ok else 'FAIL'} {label}: {detail}")
        if not ok:
            bad += 1
    print(f"Completed: {len(checks)} checks, {bad} failures")
    return 1 if bad else 0


def _cmd_run_operation(engine: Engine, mod, args) -> int:
    """`dbt run-operation` analog: invoke a named function defined in the
    project module with (engine, **--args). The reference ecosystem uses
    this for maintenance macros (grants sweeps, manual snapshots)."""
    if not args.subcommand:
        raise SystemExit("usage: run-operation <name> [--args '{...}']")
    fn = getattr(mod, args.subcommand, None)
    if not callable(fn):
        raise SystemExit(
            f"project module defines no operation {args.subcommand!r} "
            f"(a module-level callable taking (engine, **kwargs))")
    kwargs = _parse_vars(args.op_args, flag="--args")
    result = fn(engine, **kwargs)
    if result is not None:
        print(result)
    print(f"Completed: run-operation {args.subcommand}")
    return 0


def _model_fingerprint(m) -> str:
    """Content hash of a model for state comparison: SQL text (or the
    DataFrame builder's SOURCE — a logic edit changes the hash; an
    unreadable builder falls back to its qualname, so only renames are
    detected for C-level callables) + the canonicalized config."""
    import hashlib
    import inspect

    if m.sql is not None:
        body = m.sql
    elif m.df_builder is not None:
        try:
            body = inspect.getsource(m.df_builder)
        except (OSError, TypeError):
            body = f"<builder:{getattr(m.df_builder, '__qualname__', '')}>"
    else:
        body = ""
    cfg = json.dumps(m.config, sort_keys=True, default=str)
    return hashlib.md5(
        f"{body}\n--config--\n{cfg}".encode("utf-8")).hexdigest()


def _manifest_path(target_dir: str) -> str:
    return os.path.join(target_dir, "manifest.json")


def _save_manifest(project, args, schema: str | None = None) -> None:
    """Write target/manifest.json (the dbt state artifact): one content
    hash per model plus the schema the project materializes into — the
    inputs to --state + state:modified selection and to `clone`."""
    os.makedirs(args.target_dir, exist_ok=True)
    doc = {"schema": schema,
           "models": {m.name: {"hash": _model_fingerprint(m)}
                      for m in project.models}}
    with open(_manifest_path(args.target_dir), "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1)


def _load_state_manifest(state_dir: str | None, who: str,
                         need_schema: bool = False):
    """Load --state's manifest.json (shared by clone / --defer /
    state: selectors — one loader so path checks and error wording
    can't drift). Returns (doc, schema-or-None)."""
    if not state_dir:
        raise SystemExit(f"{who} needs --state <dir holding a prior "
                         f"manifest.json>")
    path = _manifest_path(state_dir)
    if not os.path.exists(path):
        raise SystemExit(
            f"no manifest at {path!r} — run `run`/`build` with "
            f"--target-dir {state_dir!r} first to record state")
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    schema = doc.get("schema")
    if need_schema and not schema:
        raise SystemExit("state manifest records no schema — re-run "
                         "`run`/`build` with a current version to "
                         "record it")
    return doc, schema


def _cmd_clone(engine: Engine, project, args, schema: str) -> int:
    """`dbt clone`: recreate the --state manifest's relations in the
    CURRENT schema as pointer VIEWS onto the state schema's relations —
    the cheap dev-environment bootstrap (no data copied; Spark has no
    zero-copy table clone, so views are the honest equivalent dbt-core
    uses on such adapters). Selectors apply; relations missing on the
    state side are reported and skipped (exit 1 if nothing cloned).
    NOTE: with the default in-memory catalog this is same-session
    cloning (schema -> schema); point the session at a Hive metastore
    for the cross-process dbt workflow."""
    doc, src_schema = _load_state_manifest(args.state, "clone",
                                           need_schema=True)
    if src_schema == schema:
        raise SystemExit(f"clone target schema {schema!r} equals the "
                         f"state schema — pass --schema <dev_schema>")
    # dbt clone iterates the STATE manifest's nodes: with no selector
    # every state model is cloned (including ones renamed/deleted in the
    # current project — they exist on the state side and would silently
    # vanish otherwise); a selector resolves against the current graph
    # and filters the state set, with state-only leftovers reported
    state_models = set(doc.get("models", {}))
    if args.select or args.exclude:
        chosen = project.select_nodes(args.select or None,
                                      args.exclude or None)
        targets = sorted(state_models & chosen)
        for name in sorted(state_models - {m.name
                                           for m in project.models}):
            print(f"clone {name}: NOTE state-only model (not in the "
                  f"current project) — excluded by the selector")
    else:
        targets = sorted(state_models)
    if not targets:
        print("Nothing to clone: selection matches no state-manifest "
              "models")
        return 1
    spark = engine.spark
    spark.sql(f"CREATE SCHEMA IF NOT EXISTS `{schema}`")
    cloned = skipped = 0
    for name in targets:
        if not spark.catalog.tableExists(f"{src_schema}.{name}"):
            print(f"clone {name}: SKIP (no relation "
                  f"{src_schema}.{name} on the state side)")
            skipped += 1
            continue
        spark.sql(f"CREATE OR REPLACE VIEW `{schema}`.`{name}` AS "
                  f"SELECT * FROM `{src_schema}`.`{name}`")
        print(f"clone {name}: view {schema}.{name} -> "
              f"{src_schema}.{name}")
        cloned += 1
    print(f"Completed: {cloned} cloned, {skipped} skipped")
    return 0 if cloned else 1


def _resolve_state_selectors(project, select: list[str],
                             args) -> list[str]:
    """Expand dbt ``state:modified`` / ``state:new`` selector specs
    (with optional +prefix/suffix graph operators) into concrete model
    names by comparing fingerprints against the manifest in --state —
    the slim-CI workflow (`dbt run --select state:modified+ --state
    prod-artifacts/`). Non-state specs pass through untouched. May
    return an EMPTY list: state selection legitimately matches nothing
    when no model changed."""
    if not any("state:" in s for s in select):
        return select
    doc, _ = _load_state_manifest(args.state, "state:... selectors")
    old = doc.get("models", {})
    out = []
    for spec in select:
        core = spec.strip("+")
        if not core.startswith("state:"):
            out.append(spec)
            continue
        pre = "+" if spec.startswith("+") else ""
        post = "+" if spec.endswith("+") else ""
        method = core.split(":", 1)[1]
        if method not in ("modified", "new"):
            raise SystemExit(f"unsupported state method {core!r} "
                             f"(supported: state:modified, state:new)")
        for m in project.models:
            is_new = m.name not in old
            hit = is_new if method == "new" else (
                is_new or old[m.name].get("hash") != _model_fingerprint(m))
            if hit:
                out.append(pre + m.name + post)
    return out


def _run_results_path(args) -> str:
    return os.path.join(args.target_dir, "run_results.json")


def _save_run_results(report, args) -> None:
    rows = [{"node_type": r["node_type"], "name": r["name"],
             "status": r["status"], "detail": r["detail"]}
            for r in report.collect()]
    os.makedirs(args.target_dir, exist_ok=True)
    with open(_run_results_path(args), "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=1)


def _cmd_build(engine: Engine, mod, project: Project, args,
               retry: bool = False) -> int:
    """dbt build / dbt retry over the runner's orchestrator: seeds ->
    models in DAG order with attached tests (error-severity failures
    skip descendants) -> snapshots; writes target/run_results.json."""
    from .plans.runner import build_project

    retry_from = None
    if retry:
        path = _run_results_path(args)
        if not os.path.exists(path):
            raise SystemExit(
                f"no prior run results at {path!r} — run `build` first")
        with open(path, encoding="utf-8") as f:
            saved = json.load(f)
        retry_from = engine.spark.createDataFrame(
            [(r["node_type"], r["name"], r["status"], r["detail"])
             for r in saved],
            "node_type string, name string, status string, detail string")
    seeds = [{"name": name, "csv_text": _read_seed(value),
              "column_types": (getattr(mod, "seed_column_types", {}) or {})
              .get(name)}
             for name, value in (getattr(mod, "seeds", {}) or {}).items()]
    if retry:
        # dbt retry reruns FAILED seeds too (a fixed CSV must reload
        # before its dependent models rebuild); successful seeds stay put
        failed_seeds = {r["name"] for r in saved
                        if r["node_type"] == "seed"
                        and r["status"] == "error"}
        seeds = [s for s in seeds if s["name"] in failed_seeds]
    report = build_project(
        engine, project, seeds=seeds,
        threads=args.threads, full_refresh=args.full_refresh,
        select=args.select or None, exclude=args.exclude or None,
        retry_from=retry_from)
    _save_run_results(report, args)
    bad = 0
    for r in report.collect():
        print(f"{r['node_type']} {r['name']}: {r['status']}"
              + (f" ({r['detail']})" if r["detail"] else ""))
        if r["status"] in ("error", "skip"):
            bad += 1
    print(f"Completed with {bad} error/skip nodes; "
          f"results in {_run_results_path(args)}")
    # module-level checks run after the graph (dbt build's test phase
    # for tests not attached to a model)
    rc = _cmd_test(engine, mod, args)
    return 1 if bad else rc


def _cmd_ls(project: Project, args) -> int:
    # --output validated in main() BEFORE the session is built: an
    # argument typo must not cost a JVM + warehouse + source
    # registration (dbt ls has name/path/selector formats; only json
    # is emulated, and silently printing the human format would feed a
    # CI pipeline garbage with exit code 0)
    chosen = project.select_nodes(args.select or None, args.exclude or None)
    as_json = args.output == "json"
    for level in project.topo_order():
        for name in level:
            if name not in chosen:
                continue
            m = project.model(name)
            if as_json:
                # dbt `ls --output json`: one JSON object per line, the
                # machine-readable selection feed for CI tooling (no
                # trailing summary line — the output IS the node list)
                print(json.dumps(
                    {"name": name, "resource_type": "model",
                     "materialized": m.config.get("materialized", "view"),
                     "depends_on": sorted(m.refs()),
                     "config": m.config}, default=str))
            else:
                print(f"{name} [{m.config.get('materialized', 'view')}]")
    if not as_json:
        print(f"Completed: {len(chosen)} nodes")
    return 0


def _cmd_parse(engine: Engine, mod, project: Project, args,
               schema: str) -> int:
    """dbt parse: validate the project WITHOUT executing anything —
    graph acyclicity (topo_order raises on cycles), every {ref:} names
    a model or seed of THIS project (topo_order silently drops unknown
    deps, so an unchecked ghost ref would otherwise surface only
    mid-run as TABLE_OR_VIEW_NOT_FOUND), every SQL model's
    {ref:}/{source:}/{this}/{is_incremental:} placeholders resolvable
    in both first-run and incremental renders — and write
    target/manifest.json (the state artifact slim CI diffs against).
    Sources resolve against the same --sf-dir registration the run
    would get, so an unregistered {source:} fails HERE, not mid-run.
    DataFrame-builder models are counted but not rendered (rendering
    one executes user code — dbt parse does not run python models)."""
    levels = project.topo_order()
    known = {m.name for m in project.models} \
        | set(getattr(mod, "seeds", {}) or {})
    n_sql = n_py = 0
    for m in project.models:
        ghosts = m.refs() - known
        if ghosts:
            raise SystemExit(
                f"model {m.name!r} refs unknown node(s): "
                f"{sorted(ghosts)} (not a model or seed of this "
                f"project)")
        if m.sql is None:
            n_py += 1
            continue
        this = engine.relation(m.name).render()
        for is_incr in (False, True):
            m.render(engine.ref, engine.source, this, is_incr)
        n_sql += 1
    _save_manifest(project, args, schema=schema)
    print(f"Parsed {len(project.models)} models ({n_sql} sql, {n_py} "
          f"python) across {len(levels)} DAG levels; manifest written "
          f"to {_manifest_path(args.target_dir)}")
    return 0


def _cmd_compile(engine: Engine, project: Project, args) -> int:
    chosen = project.select_nodes(args.select or None, args.exclude or None)
    for level in project.topo_order():
        for name in level:
            if name not in chosen:
                continue
            m = project.model(name)
            if m.sql is None:
                print(f"-- model {name}: (DataFrame builder, no SQL)")
                continue
            print(f"-- model {name}")
            print(engine.compile_sql(m).strip())
            print()
    return 0


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
                            "retry", "ls", "compile", "docs", "source",
                            "source-freshness", "show", "debug",
                            "run-operation", "clone", "parse"])
    p.add_argument("subcommand", nargs="?", default=None,
                   help="`source freshness` two-token form, or the "
                        "operation name for run-operation")
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
    p.add_argument("--vars", default=None,
                   help="JSON object injected into the project module's "
                        "globals as `dbt_vars` before it executes "
                        "(dbt --vars)")
    p.add_argument("--limit", type=int, default=5,
                   help="show: number of preview rows (default 5)")
    p.add_argument("--args", dest="op_args", default=None,
                   help="run-operation: JSON object of keyword arguments")
    p.add_argument("--state", default=None,
                   help="directory holding a prior manifest.json; enables "
                        "state:modified / state:new selectors (dbt "
                        "--state)")
    p.add_argument("--defer", action="store_true", dest="defer",
                   help="resolve refs to UNSELECTED models against the "
                        "--state manifest's schema (dbt --defer: slim-CI "
                        "builds state:modified models against prod "
                        "parents without rebuilding them)")
    p.add_argument("--favor-state", action="store_true",
                   help="with --defer: prefer the state schema's relation "
                        "even when the target schema already has one "
                        "(dbt --favor-state)")
    return p


def main(argv: list[str] | None = None,
         spark: Any | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.command == "source":
        if args.subcommand != "freshness":
            raise SystemExit("usage: source freshness (the only source "
                             "subcommand)")
        args.command = "source-freshness"
    elif args.subcommand is not None and args.command != "run-operation":
        raise SystemExit(f"unexpected argument {args.subcommand!r} after "
                         f"{args.command!r}")
    if args.command == "ls" and args.output not in (None, "json"):
        # decidable right after parse_args — an argument typo must not
        # cost a SparkSession/warehouse/source-registration first (dbt
        # ls has name/path/selector formats; only json is emulated).
        # --output stays a free string because docs uses it as a PATH.
        raise SystemExit(f"ls --output supports only 'json', got "
                         f"{args.output!r}")
    if args.favor_state and not args.defer:
        # flag-combination validation belongs right after parse_args: it
        # must not depend on what the state selector happens to match
        # (an empty state:modified selection exits early above the old
        # check site, silently accepting the invalid combination)
        raise SystemExit("--favor-state requires --defer")
    mod = _load_project_module(args.project, _parse_vars(args.vars))
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
    if args.exclude:
        # an exclusion matching nothing is just an empty exclusion
        args.exclude = _resolve_state_selectors(project, args.exclude,
                                                args) or None
    if args.select:
        args.select = _resolve_state_selectors(project, args.select, args)
        if not args.select:
            if args.command == "clone":
                # clone is the exception to the successful-no-op rule:
                # its own empty-selection path deliberately exits 1 (CI
                # must not believe a no-op clone built a dev schema),
                # so a state: selector matching nothing must signal the
                # same way — one consistent exit code for CI to trust
                print("Nothing to clone: state selector matched no "
                      "models")
                if own_session:
                    spark.stop()
                return 1
            # dbt's behavior: state selection matching nothing is a
            # successful no-op, NOT "no selector -> run everything" —
            # but the state artifact is still written (a CI pipeline
            # uploads target/manifest.json even on the no-op day)
            print("Nothing to do: state selector matched no models")
            if args.command in ("run", "build", "retry", "snapshot",
                                "compile"):
                _save_manifest(project, args, schema=schema)
            if own_session:
                spark.stop()
            return 0
    if args.defer:
        # dbt --defer: refs to models OUTSIDE the current selection
        # resolve to the state manifest's schema (prod), so a slim-CI
        # `run --select state:modified+ --defer --state prod/` builds
        # only the changed models against prod parents. Selected models
        # and models absent from the state manifest resolve normally.
        mdoc, state_schema = _load_state_manifest(args.state, "--defer",
                                                  need_schema=True)
        chosen = project.select_nodes(args.select or None,
                                      args.exclude or None)
        candidates = set(mdoc.get("models", {})) - chosen
        if state_schema == schema:
            print("--defer: state schema equals the target schema; "
                  "deferral resolves identically (no-op)")
        engine.set_defer(state_schema, candidates,
                         favor_state=args.favor_state)
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
        if args.command == "source-freshness":
            return _cmd_source_freshness(engine, mod, args)
        if args.command == "show":
            return _cmd_show(engine, project, args)
        if args.command == "debug":
            return _cmd_debug(engine, mod, project, args)
        if args.command == "run-operation":
            return _cmd_run_operation(engine, mod, args)
        if args.command == "docs":
            return _cmd_docs(engine, args)
        if args.command == "ls":
            return _cmd_ls(project, args)
        if args.command == "compile":
            return _cmd_compile(engine, project, args)
        if args.command == "clone":
            return _cmd_clone(engine, project, args, schema)
        if args.command == "parse":
            return _cmd_parse(engine, mod, project, args, schema)
        return _cmd_build(engine, mod, project, args,
                          retry=args.command == "retry")
    finally:
        # record state for future --state comparisons (dbt writes the
        # manifest on every compile/run/build invocation)
        if args.command in ("run", "build", "retry", "snapshot",
                            "compile"):
            _save_manifest(project, args, schema=schema)
        if own_session:
            spark.stop()


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
