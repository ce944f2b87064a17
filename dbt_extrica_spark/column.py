"""Column model with Trino-style type-string parsing.

Reference: column.py:10-109 — classification of string/float/int/numeric
types, regex parsing of parametrized types from ``describe`` output
(``varchar(100)``, ``decimal(28,6)``), the unbounded-varchar special case
(max size 2,147,483,646, column.py:10,55-60), and STRING->VARCHAR /
FLOAT->DOUBLE alias normalization (column.py:15-18).

Spark's StringType erases length, so ``char_size`` is kept here as the
side-channel SURVEY §7.2(7) calls for.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MAX_VARCHAR_SIZE = 2147483646  # reference: column.py:10


@dataclass
class Column:
    column: str
    dtype: str
    char_size: int | None = None
    numeric_precision: int | None = None
    numeric_scale: int | None = None

    TYPE_LABELS = {  # reference: column.py:15-18
        "STRING": "VARCHAR",
        "FLOAT": "DOUBLE",
    }

    @classmethod
    def translate_type(cls, dtype: str) -> str:
        return cls.TYPE_LABELS.get(dtype.upper(), dtype)

    # -- classification (reference: column.py:29-49) ------------------------
    @property
    def name(self) -> str:
        return self.column

    def is_string(self) -> bool:
        return self.dtype.lower().split("(")[0].strip() in (
            "varchar", "char", "varbinary", "json", "string",
        )

    def is_float(self) -> bool:
        return self.dtype.lower() in ("real", "float", "double precision", "double")

    def is_integer(self) -> bool:
        return self.dtype.lower() in (
            "tinyint", "smallint", "integer", "int", "bigint",
        )

    def is_numeric(self) -> bool:
        # exact numerics only (reference: column.py:48-49)
        return self.dtype.lower().split("(")[0].strip() == "decimal"

    def is_number(self) -> bool:
        return self.is_integer() or self.is_float() or self.is_numeric()

    # -- rendering -----------------------------------------------------------
    @property
    def data_type(self) -> str:
        """Render the full type (reference: column.py behavior asserted at
        tests/units/test_adapter.py:341-363)."""
        base = self.dtype.lower().split("(")[0].strip()
        if base in ("varchar", "char"):
            size = self.char_size
            if size is None or size == MAX_VARCHAR_SIZE:
                return base  # unbounded stays bare
            return f"{base}({size})"
        if base == "decimal" and self.numeric_precision is not None:
            scale = self.numeric_scale if self.numeric_scale is not None else 0
            return f"decimal({self.numeric_precision},{scale})"
        return self.dtype

    def string_size(self) -> int:
        if not self.is_string():
            raise ValueError("Called string_size() on non-string field!")
        return self.char_size if self.char_size is not None else MAX_VARCHAR_SIZE

    # -- parsing (reference: column.py:62-109) -------------------------------
    _PARAM_RE = re.compile(r"^\s*([a-zA-Z_ ]+?)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)\s*$")

    @classmethod
    def from_description(cls, name: str, raw_data_type: str) -> "Column":
        """Parse a describe-output type string into a Column."""
        m = cls._PARAM_RE.match(raw_data_type)
        char_size = None
        precision = None
        scale = None
        if m:
            base = m.group(1).strip().lower()
            p1 = int(m.group(2))
            p2 = int(m.group(3)) if m.group(3) is not None else None
            if base in ("varchar", "char"):
                char_size = p1
            elif base in ("decimal", "numeric"):
                precision = p1
                scale = p2 if p2 is not None else 0
        else:
            base = raw_data_type.strip().lower()
            if base == "varchar":  # unbounded (reference: column.py:55-60)
                char_size = MAX_VARCHAR_SIZE
        return cls(
            column=name,
            dtype=raw_data_type,
            char_size=char_size,
            numeric_precision=precision,
            numeric_scale=scale,
        )

    @classmethod
    def from_spark_field(cls, field) -> "Column":
        """Build from a pyspark StructField, keeping decimal params."""
        from pyspark.sql import types as T

        dt = field.dataType
        if isinstance(dt, T.DecimalType):
            return cls(field.name, f"decimal({dt.precision},{dt.scale})",
                       numeric_precision=dt.precision, numeric_scale=dt.scale)
        if isinstance(dt, T.StringType):
            return cls(field.name, "varchar", char_size=MAX_VARCHAR_SIZE)
        return cls(field.name, dt.simpleString())

    def spark_type(self):
        """Map the Trino-style type string to a Spark DataType
        (SURVEY §1.3 normative mapping)."""
        from pyspark.sql import types as T

        base = self.dtype.lower().split("(")[0].strip()
        mapping = {
            "boolean": T.BooleanType(),
            "tinyint": T.ByteType(),
            "smallint": T.ShortType(),
            "integer": T.IntegerType(),
            "int": T.IntegerType(),
            "bigint": T.LongType(),
            "real": T.FloatType(),
            "float": T.DoubleType(),
            "double": T.DoubleType(),
            "double precision": T.DoubleType(),
            "varchar": T.StringType(),
            "char": T.StringType(),
            "string": T.StringType(),
            "json": T.StringType(),
            "varbinary": T.BinaryType(),
            "date": T.DateType(),
            "timestamp": T.TimestampType(),
        }
        if base in mapping:
            return mapping[base]
        if base in ("decimal", "numeric"):
            return T.DecimalType(self.numeric_precision or 28, self.numeric_scale or 6)
        if base.startswith("array") or base.startswith("map") or base.startswith("struct"):
            return T.DataType.fromDDL(self.dtype)
        return T.DataType.fromDDL(self.dtype)
