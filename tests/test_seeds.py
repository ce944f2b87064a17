"""Seed type-inference goldens (reference rules: impl.py:52-66, asserted at
the reference's tests/units/test_adapter.py:282-338)."""

from dbt_extrica_spark.operators.seeds import infer_column, parse_csv


def test_number_integer_vs_double():
    # DOUBLE iff ANY value has decimals (reference: impl.py:56-58)
    assert infer_column(["1", "2", "3"]) == "integer"
    assert infer_column(["1", "2.5", "3"]) == "double"
    assert infer_column(["1e3", "2"]) == "double"


def test_boolean_before_number():
    # agate tester order: a 0/1 column is boolean
    assert infer_column(["0", "1", "1"]) == "boolean"
    assert infer_column(["true", "FALSE"]) == "boolean"
    assert infer_column(["0", "1", "2"]) == "integer"


def test_dates_and_datetimes():
    assert infer_column(["2024-01-01", "2024-02-03"]) == "date"
    assert infer_column(["2024-01-01 10:00:00"]) == "timestamp"
    assert infer_column(["2024-01-01", "10am"]) == "varchar"


def test_nulls_ignored_for_inference():
    assert infer_column(["", "5", "null"]) == "integer"
    assert infer_column(["", ""]) == "varchar"


def test_parse_csv():
    header, rows = parse_csv("a,b\n1,\"x,y\"\n2,z")
    assert header == ["a", "b"]
    assert rows == [["1", "x,y"], ["2", "z"]]


def test_seed_end_to_end(engine):
    from dbt_extrica_spark import Model

    engine.materialize(Model(
        "s1",
        sql="k,v,w\n1,0.5,2024-01-01\n2,1.5,2024-01-02",
        config={"materialized": "seed",
                "column_types": {"v": "decimal(10,2)"}},
    ))
    df = engine.table("s1")
    types = dict(df.dtypes)
    assert types == {"k": "int", "v": "decimal(10,2)", "w": "date"}
    assert df.count() == 2
    # re-seeding resets (drop + recreate), not appends
    engine.materialize(Model(
        "s1", sql="k,v,w\n9,9.5,2024-09-09",
        config={"materialized": "seed",
                "column_types": {"v": "decimal(10,2)"}},
    ))
    assert engine.table("s1").count() == 1
