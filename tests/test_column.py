"""Column parsing/classification unit tests (reference behavior asserted at
tests/units/test_adapter.py:341-363 of the reference repo)."""

from dbt_extrica_spark.column import MAX_VARCHAR_SIZE, Column


def test_parse_bounded_varchar():
    c = Column.from_description("name", "varchar(100)")
    assert c.is_string() and c.char_size == 100
    assert c.data_type == "varchar(100)"
    assert c.string_size() == 100


def test_parse_unbounded_varchar():
    c = Column.from_description("name", "varchar")
    assert c.is_string()
    assert c.string_size() == MAX_VARCHAR_SIZE
    assert c.data_type == "varchar"  # unbounded renders bare


def test_parse_decimal():
    c = Column.from_description("amount", "decimal(28,6)")
    assert c.is_numeric() and not c.is_integer()
    assert (c.numeric_precision, c.numeric_scale) == (28, 6)
    assert c.data_type == "decimal(28,6)"


def test_classification():
    assert Column("a", "double precision").is_float()
    assert Column("a", "real").is_float()
    assert Column("a", "tinyint").is_integer()
    assert Column("a", "json").is_string()
    assert Column("a", "varbinary").is_string()
    assert not Column("a", "date").is_number()


def test_translate_type_aliases():
    # reference: column.py:15-18 (STRING->VARCHAR, FLOAT->DOUBLE)
    assert Column.translate_type("STRING") == "VARCHAR"
    assert Column.translate_type("FLOAT") == "DOUBLE"
    assert Column.translate_type("bigint") == "bigint"


def test_string_size_on_non_string_raises():
    import pytest

    with pytest.raises(ValueError):
        Column("a", "integer").string_size()


def test_spark_type_mapping(spark):
    # needs an active session: DataType.fromDDL parses via the JVM
    from pyspark.sql import types as T

    assert Column.from_description("a", "varchar(10)").spark_type() == T.StringType()
    assert Column.from_description("a", "decimal(10,2)").spark_type() == \
        T.DecimalType(10, 2)
    assert Column.from_description("a", "bigint").spark_type() == T.LongType()
    assert Column.from_description("a", "array<int>").spark_type() == \
        T.ArrayType(T.IntegerType())


def test_parse_char_and_numeric():
    c = Column.from_description("c", "char(5)")
    assert c.char_size == 5 and c.data_type == "char(5)"
    n = Column.from_description("n", "numeric(10)")
    assert (n.numeric_precision, n.numeric_scale) == (10, 0)
