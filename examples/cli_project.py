"""Example CLI project — the module ``python -m dbt_extrica_spark`` loads.

Drive it end-to-end from the shell (the dbt UX; reference README.md:66-105):

    cd /root/repo
    python -m dbt_extrica_spark build --project examples/cli_project.py
    python -m dbt_extrica_spark run   --project examples/cli_project.py \
        --select +fct_daily_revenue
    python -m dbt_extrica_spark docs  --project examples/cli_project.py \
        --output /tmp/catalog.json
"""

import os

from dbt_extrica_spark import Model

# `--vars '{"schema": "...", "freshness_now": "..."}'` overrides these —
# the CLI injects the parsed dict as `dbt_vars` before executing this
# module; the globals().get fallback keeps the module importable directly
_vars = globals().get("dbt_vars", {})

schema = _vars.get("schema", "cli_demo")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

models = [
    Model("stg_orders",
          sql="SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate"
              " FROM {source:orders}",
          config={"materialized": "view"}),
    Model("fct_daily_revenue",
          sql="SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,"
              " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
              " AS revenue FROM {ref:stg_orders} GROUP BY 1",
          config={"materialized": "table", "partition_by": ["d"]}),
    Model("dim_status",
          sql="SELECT status_code, status_name FROM {ref:status_seed}",
          config={"materialized": "table"}),
    Model("events_history",
          sql="SELECT event_id, event_type, value, ts FROM {source:events}",
          config={"materialized": "snapshot", "unique_key": "event_id",
                  "strategy": "timestamp", "updated_at": "ts"}),
]

seeds = {
    "status_seed": (
        "status_code,status_name\n"
        "O,Open\n"
        "F,Fulfilled\n"
        "P,Pending\n"
    ),
}

# `source freshness` specs (dbt: sources.yml freshness config). `now` is
# pinned near the synthetic data's max ts so the demo is deterministic;
# real deployments omit it (wall clock) — override via
# --vars '{"freshness_now": "..."}'
sources_freshness = [
    {"table": "events", "loaded_at_field": "ts",
     "warn_after_minutes": 60, "error_after_minutes": 24 * 60,
     "now": _vars.get("freshness_now", "2024-01-31 00:00:00")},
]

# `run-operation` targets: module-level callables taking (engine, **kw)
def grant_report(engine, role="analyst"):
    """Example maintenance operation (dbt run-operation analog)."""
    return f"grants for role {role}: {len(engine.spark.catalog.listTables(schema))} relations in {schema}"


checks = [
    {"check": "unique", "table": f"{schema}.fct_daily_revenue",
     "column": "d"},
    {"check": "not_null", "table": f"{schema}.fct_daily_revenue",
     "column": "revenue"},
    {"check": "accepted_values", "table": f"{schema}.dim_status",
     "column": "status_code", "values": ["O", "F", "P"]},
]
