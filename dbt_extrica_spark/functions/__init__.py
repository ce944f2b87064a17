from . import shims
from .shims import (
    any_value, bool_or, listagg, hash, safe_cast, split_part, right,
    dateadd, datediff, date_trunc, date_spine_sql, array_construct,
    array_concat, array_append, current_timestamp, snapshot_string_as_time,
    type_float, type_string, type_numeric, type_int, type_boolean,
    type_timestamp, type_bigint, date_function, snapshot_hash_arguments,
    timestamp_add_sql,
)

__all__ = [
    "shims", "any_value", "bool_or", "listagg", "hash", "safe_cast",
    "split_part", "right", "dateadd", "datediff", "date_trunc",
    "date_spine_sql", "array_construct", "array_concat", "array_append",
    "current_timestamp", "snapshot_string_as_time", "type_float",
    "type_string", "type_numeric", "type_int", "type_boolean",
    "type_timestamp", "type_bigint", "date_function",
    "snapshot_hash_arguments", "timestamp_add_sql",
]
