"""Engine-level surface: python models, capabilities, auth stub, profile,
cancellation scaffolding."""

import pytest

from dbt_extrica_spark import Engine, Model
from dbt_extrica_spark.errors import CompilationError


def test_python_model_table(engine):
    def build(eng):
        src = eng.spark.table(eng.sources["orders"].render_unquoted())
        return src.where("o_orderkey <= 100").groupBy("o_orderstatus").count()

    engine.materialize(Model("py_t", df_builder=build,
                             config={"materialized": "table"}))
    assert engine.table("py_t").count() >= 1


def test_python_model_incremental_merge(engine):
    def build1(eng):
        return eng.spark.sql("SELECT 1 AS k, 'a' AS v")

    def build2(eng):
        return eng.spark.sql("SELECT k, v FROM VALUES (1,'A'), (2,'b') AS t(k,v)")

    cfg = {"materialized": "incremental", "incremental_strategy": "merge",
           "unique_key": "k"}
    engine.materialize(Model("py_i", df_builder=build1, config=cfg))
    engine.materialize(Model("py_i", df_builder=build2, config=cfg))
    assert {(r.k, r.v) for r in engine.table("py_i").collect()} == \
        {(1, "A"), (2, "b")}


def test_python_model_view_rejected(engine):
    with pytest.raises(CompilationError):
        engine.materialize(Model(
            "py_v", df_builder=lambda e: e.spark.sql("SELECT 1 AS a"),
            config={"materialized": "view"}))


def test_capability_flags():
    assert Engine.CAPABILITIES["SchemaMetadataByRelations"] == "Full"
    assert Engine.CAPABILITIES["TableLastModifiedMetadata"] == "Unsupported"
    assert Engine.CONSTRAINT_SUPPORT["not_null"] == "ENFORCED"
    assert Engine.CONSTRAINT_SUPPORT["check"] == "NOT_SUPPORTED"


def test_auth_stub_and_profile():
    from dbt_extrica_spark.session import AuthStub, Profile

    p = Profile(schema="s1", threads=8,
                session_properties={"spark.sql.shuffle.partitions": "8"})
    assert AuthStub(p).get_token() == "local-no-auth"
    assert p.prepared_statements_enabled is True  # reference default


def test_job_group_cancellation_scaffold(spark):
    from dbt_extrica_spark.connections import ExecutionManager

    mgr = ExecutionManager(spark)
    out = mgr.run_in_job_group("grp1", lambda: spark.sql("SELECT 1").collect())
    assert out[0][0] == 1
    mgr.cancel("grp1")  # no-op on a finished group; must not raise


def test_data_quality_checks(engine):
    from dbt_extrica_spark import testing

    spark = engine.spark
    spark.sql("SELECT * FROM VALUES (1, 'a'), (1, 'b'), (NULL, 'c')"
              " AS t(k, v)").createOrReplaceTempView("dq_t")
    assert testing.test_unique(spark, "dq_t", "k").count() == 1
    assert testing.test_not_null(spark, "dq_t", "k").count() == 1
    assert testing.test_accepted_values(spark, "dq_t", "v",
                                        ["a", "b"]).count() == 1
    spark.sql("SELECT 1 AS pk").createOrReplaceTempView("dq_parent")
    spark.sql("SELECT * FROM VALUES (1), (9) AS t(fk)") \
        .createOrReplaceTempView("dq_child")
    bad = testing.test_relationships(spark, "dq_child", "fk",
                                     "dq_parent", "pk")
    assert [r.fk for r in bad.collect()] == [9]


def test_contract_type_mismatch_raises(engine):
    import pytest as _pytest
    from dbt_extrica_spark.errors import CompilationError as _CE

    with _pytest.raises(_CE):
        engine.materialize(Model(
            "c_type", sql="SELECT CAST(1 AS STRING) AS x",
            config={"materialized": "table",
                    "contract": {"enforced": True},
                    "contract_columns": [{"name": "x", "data_type": "int"}]},
        ))


def test_generate_docs(engine):
    engine.materialize(Model("doc_t", sql="SELECT 1 AS a, 'x' AS b",
                             description="documented table",
                             config={"materialized": "table",
                                     "persist_docs": True}))
    docs = engine.generate_docs()
    rel = docs["relations"]["doc_t"]
    assert rel["type"] == "TABLE"
    assert rel["comment"] == "documented table"
    assert [c["name"] for c in rel["columns"]] == ["a", "b"]


def test_seed_ragged_rows(engine):
    engine.materialize(Model(
        "ragged", sql="a,b,c\n1,x\n2,y,9",
        config={"materialized": "seed"}))
    rows = {r.a: (r.b, r.c) for r in engine.table("ragged").collect()}
    assert rows == {1: ("x", None), 2: ("y", 9)}


def test_compact_table(engine):
    import glob as _glob

    cfg = {"materialized": "incremental", "incremental_strategy": "append"}
    for i in range(5):
        engine.materialize(Model(
            "frag", sql=f"SELECT {i} AS k, 'v{i}' AS v"
            + (" {is_incremental:}" if i else ""), config=cfg))
    rel = engine.relation("frag")
    loc = [r.data_type for r in engine.spark.sql(
        f"DESCRIBE TABLE EXTENDED {rel.render()}").collect()
        if r.col_name == "Location"][0]
    before = len(_glob.glob(loc.replace("file:", "") + "/*.parquet"))
    engine.compact_table("frag", target_files=1)
    loc2 = [r.data_type for r in engine.spark.sql(
        f"DESCRIBE TABLE EXTENDED {rel.render()}").collect()
        if r.col_name == "Location"][0]
    after = len(_glob.glob(loc2.replace("file:", "") + "/*.parquet"))
    assert engine.table("frag").count() == 5
    assert after < before and after == 1


def test_unknown_source_raises(engine):
    import pytest as _pytest
    from dbt_extrica_spark.errors import CompilationError as _CE

    with _pytest.raises(_CE):
        engine.materialize(Model("bad_src", sql="SELECT * FROM {source:nope}",
                                 config={"materialized": "view"}))


def test_model_refs_and_depends_on():
    m = Model("m", sql="SELECT * FROM {ref:a} JOIN {ref:b} USING (k)",
              config={"depends_on": ["c"]})
    assert m.refs() == {"a", "b", "c"}


def test_unit_test_passes_and_diffs(engine):
    from dbt_extrica_spark.plans.model import Model
    from dbt_extrica_spark.testing import run_unit_test

    model = Model(
        "ut_margin",
        sql="SELECT k, SUM(v) AS total FROM {ref:facts}"
            " WHERE k IS NOT NULL GROUP BY k",
    )
    given = {"facts": ([{"k": "a", "v": 1}, {"k": "a", "v": 2},
                        {"k": None, "v": 9}, {"k": "b", "v": 5}],
                       "k string, v bigint")}
    ok = run_unit_test(engine, model, given,
                       ([{"k": "a", "total": 3}, {"k": "b", "total": 5}],
                        "k string, total bigint")).first()
    assert ok.passed and ok.n_missing == 0 and ok.n_unexpected == 0

    bad = run_unit_test(engine, model, given,
                        ([{"k": "a", "total": 3}, {"k": "b", "total": 99}],
                         "k string, total bigint")).first()
    assert not bad.passed
    assert bad.n_missing == 1 and bad.n_unexpected == 1


def test_unit_test_null_safe_compare(engine):
    from dbt_extrica_spark.plans.model import Model
    from dbt_extrica_spark.testing import run_unit_test

    model = Model("ut_null", sql="SELECT k, v FROM {ref:t}")
    res = run_unit_test(
        engine, model,
        {"t": ([{"k": None, "v": 1}], "k string, v bigint")},
        ([{"k": None, "v": 1}], "k string, v bigint")).first()
    assert res.passed


def test_unit_test_unmocked_ref_raises(engine):
    import pytest

    from dbt_extrica_spark.errors import EngineError
    from dbt_extrica_spark.plans.model import Model
    from dbt_extrica_spark.testing import run_unit_test

    model = Model("ut_missing", sql="SELECT * FROM {ref:absent}")
    with pytest.raises((ValueError, EngineError), match="no mock"):
        run_unit_test(engine, model, {}, ([], "x int"))


def test_profile_reference_parity_fields():
    """r14 verdict #5: a reference-shaped profiles.yml dict (the FULL
    ExtricaJwtCredentials surface — reference connections.py:84-99
    fields, 283-295 usage incl. the getattr'd impersonation_user)
    constructs a Profile verbatim; the four r14-flagged fields are
    accepted-and-ignored."""
    from dbt_extrica_spark.session import Profile

    ref_profile = {
        "host": "extrica.example.com",
        "port": 443,
        "username": "svc@example.com",
        "password": "secret",
        "database": "mycatalog",
        "schema": "analytics",
        "threads": 8,
        "user": "svc",
        "impersonation_user": "batch_runner",
        "jwt_token": "tok",
        "refresh_token": "rtok",
        "client_tags": ["etl"],
        "roles": {"system": "admin"},
        "http_headers": {"X-Trace": "1"},
        "session_properties": {"query_max_run_time": "2h"},
        "prepared_statements_enabled": False,
        "cert": "/etc/ssl/ca.pem",
        "retries": 5,
        "timezone": "UTC",
    }
    p = Profile(**ref_profile)
    assert p.impersonation_user == "batch_runner"
    assert p.cert == "/etc/ssl/ca.pem"
    assert p.retries == 5 and p.timezone == "UTC"
    assert p.http_scheme == "https"  # reference hardcodes HTTPS
