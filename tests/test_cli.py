"""CLI smoke tests — `python -m dbt_extrica_spark <cmd>` over the example
project (reference UX: dbt-core's run/seed/snapshot/test/build/docs,
reference README.md:66-105)."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_extrica_spark import cli  # noqa: E402

PROJ = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "cli_project.py")


@pytest.fixture()
def run_cli(spark, tmp_path):
    """Invoke the CLI in-process on the test session, warehousing under a
    tmp dir; drops the demo schema afterward."""

    def invoke(*argv: str) -> int:
        return cli.main(list(argv) + ["--project", PROJ,
                                      "--target-dir", str(tmp_path)],
                        spark=spark)

    yield invoke
    spark.sql("DROP SCHEMA IF EXISTS cli_demo CASCADE")


def test_cli_build_end_to_end(spark, run_cli, capsys, tmp_path):
    rc = run_cli("build", "--threads", "2")
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "seed status_seed: success" in out
    assert "model fct_daily_revenue: success" in out
    assert "model events_history: success" in out     # snapshot in the DAG
    assert "0 failures" in out
    # the CLI's materializations PERSIST (no engine teardown)
    assert spark.table("cli_demo.fct_daily_revenue").count() > 0
    assert spark.table("cli_demo.status_seed").count() == 3
    # run_results.json written (the dbt artifact retry feeds from)
    results = json.loads((tmp_path / "run_results.json").read_text())
    assert {r["name"] for r in results if r["node_type"] == "model"} == {
        "stg_orders", "fct_daily_revenue", "dim_status", "events_history"}
    assert all(r["status"] == "success" for r in results)
    # retry with an all-green report reruns nothing
    rc = run_cli("retry")
    out = capsys.readouterr().out
    assert rc == 0
    assert "model" not in out.split("Completed")[0]


def test_cli_ls_and_compile(run_cli, capsys):
    rc = run_cli("ls", "--select", "+fct_daily_revenue")
    out = capsys.readouterr().out
    assert rc == 0
    assert "stg_orders [view]" in out
    assert "fct_daily_revenue [table]" in out
    assert "events_history" not in out
    rc = run_cli("compile", "--select", "stg_orders")
    out = capsys.readouterr().out
    assert rc == 0
    assert "-- model stg_orders" in out
    assert "orders" in out and "{source:" not in out  # refs resolved


def test_cli_run_select_and_snapshot_split(spark, run_cli, capsys):
    run_cli("seed")
    # run --select +fct pulls the staging ancestor, NOT the snapshot
    rc = run_cli("run", "--select", "+fct_daily_revenue")
    out = capsys.readouterr().out
    assert rc == 0
    assert "model stg_orders: OK" in out
    assert "model fct_daily_revenue: OK" in out
    assert "events_history" not in out
    # snapshot command runs ONLY snapshot-configured models
    rc = run_cli("snapshot")
    out = capsys.readouterr().out
    assert rc == 0
    assert "model events_history: OK" in out
    assert "stg_orders" not in out


def test_cli_test_and_docs(spark, run_cli, capsys, tmp_path):
    run_cli("build")
    capsys.readouterr()
    rc = run_cli("test")
    out = capsys.readouterr().out
    assert rc == 0 and "3 tests, 0 failures" in out
    dest = str(tmp_path / "catalog.json")
    rc = run_cli("docs", "--output", dest)
    assert rc == 0
    doc = json.loads(open(dest).read())
    assert "fct_daily_revenue" in doc["relations"]
    assert any(c["name"] == "revenue"
               for c in doc["relations"]["fct_daily_revenue"]["columns"])


def test_cli_retry_reruns_failed_seed(spark, tmp_path, capsys):
    # review finding: retry passed seeds=None, so a failed seed could
    # never recover. Scenario: build with a broken seed (dependent model
    # skips), fix the project, retry -> seed reloads AND the model runs.
    proj = tmp_path / "proj.py"
    broken = '''
from dbt_extrica_spark import Model
schema = "cli_retry_demo"
models = [Model("uses_seed",
                sql="SELECT k, v FROM {ref:s1}",
                config={"materialized": "table"})]
seeds = {"s1": "k,v\\nx,2\\n"}
seed_column_types = {"s1": {"k": "integer"}}
'''
    proj.write_text(broken)

    def run(*argv):
        return cli.main(list(argv) + ["--project", str(proj),
                                      "--target-dir", str(tmp_path)],
                        spark=spark)

    try:
        rc = run("build")
        out = capsys.readouterr().out
        assert rc == 1
        assert "seed s1: error" in out
        proj.write_text(broken.replace('"k,v\\nx,2\\n"', '"k,v\\n1,2\\n"'))
        rc = run("retry")
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "seed s1: success" in out
        assert "model uses_seed: success" in out
        assert spark.table("cli_retry_demo.uses_seed").count() == 1
    finally:
        spark.sql("DROP SCHEMA IF EXISTS cli_retry_demo CASCADE")


def test_cli_missing_project_errors(spark):
    with pytest.raises(SystemExit):
        cli.main(["run", "--project", "/nonexistent/project.py"],
                 spark=spark)


def test_cli_source_freshness(spark, run_cli, capsys):
    # pinned `now` in the example project makes the age deterministic:
    # events max ts is 2024-01-30 23:26 -> ~34 min old at the pinned
    # clock -> over warn_after (60? no: 34 < 60) -> pass... the spec pins
    # warn 60 / error 1440, so status is "pass" at ~34 min
    rc = run_cli("source-freshness")
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "source events: pass" in out
    assert "1 sources, 0 errors" in out
    # the two-token dbt form `source freshness`
    rc = run_cli("source", "freshness")
    out = capsys.readouterr().out
    assert rc == 0 and "source events: pass" in out
    # --vars moves the evaluation clock past error_after -> exit 1
    rc = run_cli("source-freshness", "--vars",
                 '{"freshness_now": "2024-02-15 00:00:00"}')
    out = capsys.readouterr().out
    assert rc == 1
    assert "source events: error" in out
    # bogus subcommand is rejected
    with pytest.raises(SystemExit):
        run_cli("source", "refresh")


def test_cli_show_debug_run_operation(spark, run_cli, capsys):
    run_cli("build")
    capsys.readouterr()
    # show: preview a SQL model (upstreams materialized by the build)
    rc = run_cli("show", "--select", "fct_daily_revenue", "--limit", "3")
    out = capsys.readouterr().out
    assert rc == 0 and "revenue" in out
    # show: a missing model fails loudly
    with pytest.raises(SystemExit, match="unknown model"):
        run_cli("show", "--select", "nope")
    # debug: session + schema + graph + per-source connectivity
    rc = run_cli("debug")
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ok   spark session" in out and "ok   source events" in out
    assert "0 failures" in out
    # run-operation: module-level callable with --args kwargs
    rc = run_cli("run-operation", "grant_report", "--args",
                 '{"role": "admin"}')
    out = capsys.readouterr().out
    assert rc == 0 and "grants for role admin" in out
    with pytest.raises(SystemExit, match="no operation"):
        run_cli("run-operation", "not_a_thing")
    # malformed --args names --args in the error, not --vars (the shared
    # parser previously pointed run-operation users at the wrong flag)
    with pytest.raises(SystemExit, match=r"--args must be a JSON object"):
        run_cli("run-operation", "grant_report", "--args", "not json")


def test_cli_state_modified_selection(spark, tmp_path, capsys):
    """dbt slim-CI: --state <artifacts> + state:modified/state:new.
    Unchanged project -> no-op; an edited model is selected (with +
    operators expanding through the graph); a brand-new model shows
    under state:new."""
    from dbt_extrica_spark import cli

    proj = tmp_path / "proj.py"

    def write_project(base_sql: str, extra: str = ""):
        proj.write_text(f'''
from dbt_extrica_spark import Model
schema = "state_demo"
models = [
    Model("base", sql="{base_sql}",
          config={{"materialized": "table"}}),
    Model("downstream", sql="SELECT x + 1 AS y FROM {{ref:base}}",
          config={{"materialized": "table"}}),
{extra}]
''')

    def run(*argv):
        return cli.main(list(argv) + ["--project", str(proj),
                                      "--target-dir", str(tmp_path)],
                        spark=spark)

    try:
        write_project("SELECT 1 AS x")
        assert run("run") == 0
        assert (tmp_path / "manifest.json").exists()
        capsys.readouterr()

        # unchanged -> state:modified matches nothing, successful no-op
        rc = run("run", "--select", "state:modified",
                 "--state", str(tmp_path))
        out = capsys.readouterr().out
        assert rc == 0 and "Nothing to do" in out

        # edit base -> state:modified+ selects base AND its descendant
        write_project("SELECT 2 AS x")
        rc = run("run", "--select", "state:modified+",
                 "--state", str(tmp_path))
        out = capsys.readouterr().out
        assert rc == 0
        assert "base" in out and "downstream" in out
        assert spark.sql("SELECT x FROM state_demo.base").collect()[0].x == 2

        # the rerun refreshed the manifest -> modified matches nothing
        rc = run("run", "--select", "state:modified",
                 "--state", str(tmp_path))
        out = capsys.readouterr().out
        assert rc == 0 and "Nothing to do" in out

        # a NEW model is state:new (and state:modified includes it too)
        write_project("SELECT 2 AS x",
                      extra='    Model("extra", sql="SELECT 9 AS z"),\n')
        rc = run("run", "--select", "state:new", "--state", str(tmp_path))
        out = capsys.readouterr().out
        assert rc == 0 and "extra" in out
        assert "base" not in out.replace("database", "")

        # the no-op path still writes the manifest (a CI pipeline uploads
        # target/manifest.json even on the day nothing changed)
        run("run")  # settle state: extra is now recorded
        capsys.readouterr()
        manifest = tmp_path / "manifest.json"
        state_dir = tmp_path / "state"
        state_dir.mkdir(exist_ok=True)
        (state_dir / "manifest.json").write_text(manifest.read_text())
        manifest.unlink()
        rc = run("run", "--select", "state:modified",
                 "--state", str(state_dir))
        out = capsys.readouterr().out
        assert rc == 0 and "Nothing to do" in out
        assert manifest.exists(), "no-op run must still write manifest"

        # --exclude also resolves state specs (dbt slim-CI inverse form)
        rc = run("run", "--exclude", "state:modified",
                 "--state", str(state_dir))
        out = capsys.readouterr().out
        assert rc == 0  # nothing modified -> empty exclusion -> full run
        assert "base" in out and "downstream" in out

        # guard rails: --state required; unknown method rejected
        with pytest.raises(SystemExit, match="--state"):
            run("run", "--select", "state:modified")
        with pytest.raises(SystemExit, match="unsupported state method"):
            run("run", "--select", "state:renamed",
                "--state", str(tmp_path))
    finally:
        spark.sql("DROP SCHEMA IF EXISTS state_demo CASCADE")


def test_model_fingerprint_builder_and_config():
    """State fingerprints: SQL text, builder SOURCE, and config all
    feed the hash — an edit to any of them marks the model modified,
    and an unchanged model hashes stably."""
    from dbt_extrica_spark import Model
    from dbt_extrica_spark.cli import _model_fingerprint

    a = Model("m", sql="SELECT 1 AS x", config={"materialized": "table"})
    assert _model_fingerprint(a) == _model_fingerprint(
        Model("m", sql="SELECT 1 AS x",
              config={"materialized": "table"}))
    assert _model_fingerprint(a) != _model_fingerprint(
        Model("m", sql="SELECT 2 AS x",
              config={"materialized": "table"}))
    assert _model_fingerprint(a) != _model_fingerprint(
        Model("m", sql="SELECT 1 AS x", config={"materialized": "view"}))

    def build_one(engine):
        return engine.spark.range(1)

    def build_two(engine):
        return engine.spark.range(2)

    b1 = Model("b", df_builder=build_one, config={"depends_on": []})
    b2 = Model("b", df_builder=build_two, config={"depends_on": []})
    assert _model_fingerprint(b1) == _model_fingerprint(
        Model("b", df_builder=build_one, config={"depends_on": []}))
    # a builder LOGIC edit changes the hash (source-based fingerprint)
    assert _model_fingerprint(b1) != _model_fingerprint(b2)


def test_cli_clone(spark, tmp_path, capsys):
    """dbt clone: recreate the state manifest's relations in a dev
    schema as pointer views; selectors apply; guard rails fire."""
    from dbt_extrica_spark import cli

    proj = tmp_path / "proj.py"
    proj.write_text('''
from dbt_extrica_spark import Model
schema = "clone_prod"
models = [
    Model("base", sql="SELECT 7 AS x", config={"materialized": "table"}),
    Model("down", sql="SELECT x * 2 AS y FROM {ref:base}",
          config={"materialized": "table"}),
]
''')

    def run(*argv):
        return cli.main(list(argv) + ["--project", str(proj),
                                      "--target-dir", str(tmp_path)],
                        spark=spark)

    try:
        assert run("run") == 0
        capsys.readouterr()
        # clone everything into a dev schema
        rc = run("clone", "--state", str(tmp_path),
                 "--schema", "clone_dev")
        out = capsys.readouterr().out
        assert rc == 0 and "2 cloned, 0 skipped" in out
        assert spark.sql("SELECT x FROM clone_dev.base").collect()[0].x == 7
        assert spark.sql("SELECT y FROM clone_dev.down").collect()[0].y == 14
        # pointer semantics: the clone tracks the prod relation
        spark.sql("INSERT INTO clone_prod.base VALUES (8)")
        assert spark.table("clone_dev.base").count() == 2
        # selector subset
        spark.sql("DROP SCHEMA IF EXISTS clone_dev CASCADE")
        rc = run("clone", "--state", str(tmp_path),
                 "--schema", "clone_dev", "--select", "base")
        out = capsys.readouterr().out
        assert rc == 0 and "1 cloned" in out
        assert not spark.catalog.tableExists("clone_dev.down")
        # empty selection -> exit 1 (CI must not believe a no-op clone)
        rc = run("clone", "--state", str(tmp_path),
                 "--schema", "clone_dev", "--select", "base",
                 "--exclude", "base")
        out = capsys.readouterr().out
        assert rc == 1 and "Nothing to clone" in out
        # a STATE selector matching nothing must exit 1 the same way —
        # the generic "Nothing to do" success path is for run/build,
        # where a no-op day is fine; CI must not believe a no-op clone
        rc = run("clone", "--state", str(tmp_path),
                 "--schema", "clone_dev", "--select", "state:modified")
        out = capsys.readouterr().out
        assert rc == 1 and "Nothing to clone" in out
        # a model renamed AWAY in the current project still clones with
        # no selector (dbt iterates the STATE manifest's nodes)
        proj.write_text('''
from dbt_extrica_spark import Model
schema = "clone_prod"
models = [Model("renamed", sql="SELECT 1 AS z",
                config={"materialized": "table"})]
''')
        spark.sql("DROP SCHEMA IF EXISTS clone_dev CASCADE")
        rc = run("clone", "--state", str(tmp_path),
                 "--schema", "clone_dev")
        out = capsys.readouterr().out
        assert rc == 0 and "2 cloned" in out
        assert spark.catalog.tableExists("clone_dev.down")
        # ... and with a selector, the state-only leftovers are reported
        # and the empty intersection (renamed is not in the state
        # manifest) exits 1
        rc = run("clone", "--state", str(tmp_path),
                 "--schema", "clone_dev", "--select", "renamed")
        out = capsys.readouterr().out
        assert rc == 1 and "Nothing to clone" in out
        assert "state-only model" in out
        # guard rails
        with pytest.raises(SystemExit, match="--state"):
            run("clone", "--schema", "clone_dev")
        with pytest.raises(SystemExit, match="equals the"):
            run("clone", "--state", str(tmp_path),
                "--schema", "clone_prod")
    finally:
        spark.sql("DROP SCHEMA IF EXISTS clone_prod CASCADE")
        spark.sql("DROP SCHEMA IF EXISTS clone_dev CASCADE")


def test_cli_vars_injection(spark, tmp_path, capsys):
    proj = tmp_path / "proj.py"
    proj.write_text('''
from dbt_extrica_spark import Model
_vars = globals().get("dbt_vars", {})
schema = _vars.get("schema", "vars_default")
models = [Model("one_row",
                sql="SELECT 1 AS x WHERE 1 = {min_x}".format(
                    min_x=_vars.get("min_x", 1)),
                config={"materialized": "table"})]
''')

    def run(*argv):
        return cli.main(list(argv) + ["--project", str(proj),
                                      "--target-dir", str(tmp_path)],
                        spark=spark)

    try:
        rc = run("run", "--vars", '{"schema": "vars_demo", "min_x": 1}')
        out = capsys.readouterr().out
        assert rc == 0, out
        assert spark.table("vars_demo.one_row").count() == 1
        # vars reach model SQL too: min_x=2 makes the predicate false
        rc = run("run", "--vars", '{"schema": "vars_demo", "min_x": 2}')
        assert rc == 0
        assert spark.table("vars_demo.one_row").count() == 0
        # malformed --vars fails loudly before any work
        with pytest.raises(SystemExit, match="JSON object"):
            run("run", "--vars", "not json")
        with pytest.raises(SystemExit, match="JSON object"):
            run("run", "--vars", '["a", "list"]')
    finally:
        spark.sql("DROP SCHEMA IF EXISTS vars_demo CASCADE")
        spark.sql("DROP SCHEMA IF EXISTS vars_default CASCADE")


def test_cli_defer(spark, tmp_path, capsys):
    """dbt --defer: refs to UNSELECTED models resolve to the --state
    manifest's schema; a target-schema relation wins the tie-break by
    default; --favor-state inverts it; guard rails fire."""
    from dbt_extrica_spark import cli

    prod_dir = tmp_path / "prod"
    dev_dir = tmp_path / "dev"
    proj = tmp_path / "proj.py"

    def write_project(down_sql: str):
        proj.write_text(f'''
from dbt_extrica_spark import Model
schema = "defer_prod"
models = [
    Model("parent", sql="SELECT 10 AS x",
          config={{"materialized": "table"}}),
    Model("down", sql="{down_sql}",
          config={{"materialized": "table"}}),
]
''')

    def run(*argv, target=dev_dir):
        return cli.main(list(argv) + ["--project", str(proj),
                                      "--target-dir", str(target)],
                        spark=spark)

    try:
        # prod build records the state manifest (schema defer_prod)
        write_project("SELECT x + 1 AS y FROM {ref:parent}")
        assert run("run", target=prod_dir) == 0
        capsys.readouterr()

        # edit ONLY down; slim-CI run in a dev schema with --defer:
        # parent is unselected -> its ref resolves to defer_prod, and
        # parent is NOT rebuilt in the dev schema
        write_project("SELECT x + 2 AS y FROM {ref:parent}")
        rc = run("run", "--select", "state:modified", "--defer",
                 "--state", str(prod_dir), "--schema", "defer_dev")
        out = capsys.readouterr().out
        assert rc == 0 and "model down: OK" in out
        assert spark.sql("SELECT y FROM defer_dev.down").collect()[0].y == 12
        assert not spark.catalog.tableExists("defer_dev.parent")

        # tie-break: once the DEV schema holds parent, the dev relation
        # wins by default...
        spark.sql("CREATE SCHEMA IF NOT EXISTS defer_dev")
        spark.sql("CREATE TABLE defer_dev.parent AS SELECT 100 AS x")
        rc = run("run", "--select", "down", "--defer",
                 "--state", str(prod_dir), "--schema", "defer_dev")
        capsys.readouterr()
        assert rc == 0
        assert spark.sql("SELECT y FROM defer_dev.down").collect()[0].y == 102
        # ...and --favor-state prefers prod even then
        rc = run("run", "--select", "down", "--defer", "--favor-state",
                 "--state", str(prod_dir), "--schema", "defer_dev")
        capsys.readouterr()
        assert rc == 0
        assert spark.sql("SELECT y FROM defer_dev.down").collect()[0].y == 12

        # guard rails
        with pytest.raises(SystemExit, match="requires --defer"):
            run("run", "--favor-state")
        # flag validation must NOT depend on selection results: an empty
        # state:modified selection used to early-return 0 BEFORE the
        # check, silently accepting the invalid combination
        assert run("run", target=prod_dir) == 0  # fresh manifest, no edits
        capsys.readouterr()
        with pytest.raises(SystemExit, match="requires --defer"):
            run("run", "--select", "state:modified", "--favor-state",
                "--state", str(prod_dir))
        with pytest.raises(SystemExit, match="--defer needs --state"):
            run("run", "--defer")
        with pytest.raises(SystemExit, match="no manifest"):
            run("run", "--defer", "--state", str(tmp_path / "nowhere"))
    finally:
        spark.sql("DROP SCHEMA IF EXISTS defer_prod CASCADE")
        spark.sql("DROP SCHEMA IF EXISTS defer_dev CASCADE")


def test_cli_parse_and_ls_json(spark, tmp_path, capsys):
    """dbt parse validates without executing and writes the manifest;
    ls --output json emits one JSON object per node."""
    proj = tmp_path / "proj.py"
    proj.write_text('''
from dbt_extrica_spark import Model
schema = "parse_demo"
models = [
    Model("base", sql="SELECT 1 AS x", config={"materialized": "table"}),
    Model("down", sql="SELECT x FROM {ref:base} "
                      "{is_incremental: WHERE x > 0}",
          config={"materialized": "incremental", "unique_key": "x"}),
]
''')

    def run(*argv):
        return cli.main(list(argv) + ["--project", str(proj),
                                      "--target-dir", str(tmp_path)],
                        spark=spark)

    try:
        rc = run("parse")
        out = capsys.readouterr().out
        assert rc == 0
        assert "Parsed 2 models (2 sql, 0 python)" in out
        # the manifest is the state artifact — parse must produce it
        # WITHOUT creating any relation
        doc = json.loads((tmp_path / "manifest.json").read_text())
        assert set(doc["models"]) == {"base", "down"}
        assert not spark.catalog.tableExists("parse_demo.base")

        # a dependency cycle fails parse (not mid-run)
        proj.write_text('''
from dbt_extrica_spark import Model
schema = "parse_demo"
models = [
    Model("a", sql="SELECT * FROM {ref:b}"),
    Model("b", sql="SELECT * FROM {ref:a}"),
]
''')
        with pytest.raises(Exception, match="[Cc]ycle"):
            run("parse")
        # ...a ghost {ref:} fails parse too (topo_order silently drops
        # unknown deps, so without this check it would only fail mid-run)
        proj.write_text('''
from dbt_extrica_spark import Model
schema = "parse_demo"
models = [Model("m", sql="SELECT * FROM {ref:ghost}")]
''')
        with pytest.raises(SystemExit, match="unknown node"):
            run("parse")
        # ...while a seed ref is a KNOWN node (dbt refs resolve to seeds)
        proj.write_text('''
from dbt_extrica_spark import Model
schema = "parse_demo"
models = [Model("m", sql="SELECT * FROM {ref:s1}")]
seeds = {"s1": "k,v\\n1,2\\n"}
''')
        assert run("parse") == 0
        capsys.readouterr()
        # ...and so does an unregistered {source:}
        proj.write_text('''
from dbt_extrica_spark import Model
schema = "parse_demo"
models = [Model("s", sql="SELECT * FROM {source:not_registered}")]
''')
        with pytest.raises(Exception, match="[Uu]nknown source"):
            run("parse")

        # ls --output json: one JSON line per node, no summary line
        proj.write_text('''
from dbt_extrica_spark import Model
schema = "parse_demo"
models = [
    Model("base", sql="SELECT 1 AS x", config={"materialized": "table"}),
    Model("down", sql="SELECT x FROM {ref:base}"),
]
''')
        rc = run("ls", "--output", "json")
        out = capsys.readouterr().out
        assert rc == 0
        lines = [json.loads(ln) for ln in out.strip().splitlines()]
        assert [ln["name"] for ln in lines] == ["base", "down"]
        assert lines[0]["materialized"] == "table"
        assert lines[1]["depends_on"] == ["base"]
        assert "Completed" not in out
        # unsupported --output values fail loudly (dbt's name/path
        # formats are not emulated — silent fallback would feed CI the
        # human format with exit 0)
        with pytest.raises(SystemExit, match="supports only"):
            run("ls", "--output", "name")
    finally:
        spark.sql("DROP SCHEMA IF EXISTS parse_demo CASCADE")
