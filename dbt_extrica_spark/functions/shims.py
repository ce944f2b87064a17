"""Cross-database function shims (SURVEY §2B, B1-B17).

The reference rewrites dbt's portable function surface into Trino SQL via 17
Jinja macros (reference: dbt/include/extrica/macros/utils/*.sql). Here each
shim is a plain Python function returning a **Spark SQL expression string**
with the same semantics. All expressions are JVM-side built-ins (whole-stage
codegen; no Python UDFs).

Semantics notes (highest-risk first):

- ``datediff`` (reference: utils/datediff.sql:1-28) uses **field-difference
  (boundary-crossing) semantics**, NOT elapsed-interval. Do not substitute
  Spark's ``timestampdiff``. The week branch corrects by Trino ``dow``
  (ISO: Mon=1..Sun=7) — Spark equivalent is ``weekday(x)+1``.
- ``listagg`` (reference: utils/listagg.sql:1-7) supports ORDER BY + limit;
  Spark's ``collect_list`` has no ORDER BY, so we sort an array of structs
  with a comparator lambda, then project the measure, slice, and join.
- ``hash`` (reference: utils/hash.sql:1-3) must be byte-identical:
  ``lower(to_hex(md5(to_utf8(cast(f as varchar)))))`` == Spark
  ``md5(cast(f as string))`` (md5 already yields lowercase hex of UTF-8).
- ``any_value`` (reference: utils/any_value.sql:1-3) is deliberately ``min``
  for determinism — do NOT use Spark's ``any_value``.
"""

from __future__ import annotations

from ..errors import CompilationError

# --------------------------------------------------------------------------
# aggregates
# --------------------------------------------------------------------------


def any_value(expression: str) -> str:
    """B1 — deterministic any_value (reference: utils/any_value.sql:1-3)."""
    return f"min({expression})"


def bool_or(expression: str) -> str:
    """B2 — (reference: utils/bool_or.sql:1-3)."""
    return f"bool_or({expression})"


def _comparator(n_keys: int, directions: list[str]) -> str:
    """Build an array_sort comparator over struct fields k0..k{n-1}."""
    clauses = []
    for i, direction in enumerate(directions):
        lt, gt = (-1, 1) if direction == "asc" else (1, -1)
        clauses.append(
            f"WHEN l.k{i} < r.k{i} THEN {lt} WHEN l.k{i} > r.k{i} THEN {gt}"
        )
    return "(l, r) -> CASE " + " ".join(clauses) + " ELSE 0 END"


def listagg(
    measure: str,
    delimiter_text: str = "','",
    order_by: list[tuple[str, str]] | None = None,
    limit_num: int | None = None,
) -> str:
    """B3 — listagg with optional ORDER BY and limit (reference:
    utils/listagg.sql:1-7: ``array_join(slice(array_agg(m ORDER BY ...),
    1, n), delim)``; limit applies AFTER ordering).

    ``order_by`` is a list of (sql_expr, 'asc'|'desc').
    """
    if order_by:
        fields = ", ".join(
            f"'k{i}', {expr}" for i, (expr, _d) in enumerate(order_by)
        )
        directions = [d.lower() for _e, d in order_by]
        struct = f"named_struct({fields}, 'v', {measure})"
        sorted_arr = (
            f"array_sort(collect_list({struct}), "
            f"{_comparator(len(order_by), directions)})"
        )
        collected = f"transform({sorted_arr}, x -> x.v)"
    else:
        collected = f"collect_list({measure})"
    if limit_num:
        collected = f"slice({collected}, 1, {int(limit_num)})"
    return f"array_join({collected}, {delimiter_text})"


# --------------------------------------------------------------------------
# scalars
# --------------------------------------------------------------------------


def hash(field: str) -> str:
    """B4 — lowercase hex md5 of the UTF-8 string form (reference:
    utils/hash.sql:1-3)."""
    return f"md5(cast({field} as string))"


def safe_cast(field: str, type_: str) -> str:
    """B5 — NULL-on-failure cast (reference: utils/safe_cast.sql:1-3)."""
    return f"try_cast({field} as {type_})"


def split_part(string_text: str, delimiter_text: str, part_number: int | str) -> str:
    """B6 — 1-indexed; negative counts from the end (reference:
    utils/split_part.sql:1-7 delegates negative handling to dbt-core; Spark
    ``split_part`` supports both natively)."""
    return f"split_part({string_text}, {delimiter_text}, {part_number})"


def right(string_text: str, length_expression: str | int) -> str:
    """B7 — exact port incl. the len=0 guard (reference: utils/right.sql:1-7:
    ``case when len=0 then '' else substr(s, -1*len) end``)."""
    return (
        f"case when {length_expression} = 0 then '' "
        f"else substr({string_text}, -1 * ({length_expression})) end"
    )


_DATEPARTS = (
    "year", "quarter", "month", "week", "day",
    "hour", "minute", "second", "millisecond",
)


def dateadd(datepart: str, interval: int | str, from_date_or_timestamp: str) -> str:
    """B8 — (reference: utils/dateadd.sql:1-3 ``date_add('part', n, ts)``)."""
    part = datepart.strip("'\" ").lower()
    if part not in _DATEPARTS:
        raise CompilationError(f"Unsupported datepart for macro dateadd: {part!r}")
    return (
        f"timestampadd({part.upper()}, {interval}, "
        f"CAST({from_date_or_timestamp} AS TIMESTAMP))"
    )


def datediff(first_date: str, second_date: str, datepart: str) -> str:
    """B9 — field-difference (boundary-crossing) datediff, exact port of
    reference: utils/datediff.sql:1-28. Trino ``dow`` (Mon=1..Sun=7) is
    Spark ``weekday(x)+1``; integer division uses ``div`` (truncating, like
    Trino's integer ``/``)."""
    part = datepart.strip("'\" ").lower()
    a = f"CAST({first_date} AS TIMESTAMP)"
    b = f"CAST({second_date} AS TIMESTAMP)"
    if part == "year":
        return f"(year({b}) - year({a}))"
    if part == "quarter":
        return (
            f"({datediff(first_date, second_date, 'year')} * 4"
            f" + quarter({b}) - quarter({a}))"
        )
    if part == "month":
        return (
            f"({datediff(first_date, second_date, 'year')} * 12"
            f" + month({b}) - month({a}))"
        )
    if part == "day":
        # reference divides elapsed millis between date-casts by 86400000;
        # Spark's datediff(date, date) is the same whole-day count.
        return f"datediff(CAST({b} AS DATE), CAST({a} AS DATE))"
    if part == "week":
        day_diff = datediff(first_date, second_date, "day")
        dow_a = f"(weekday({a}) + 1)"
        dow_b = f"(weekday({b}) + 1)"
        return (
            f"(({day_diff}) div 7 + case"
            f" when {dow_a} <= {dow_b} then"
            f" case when {a} <= {b} then 0 else -1 end"
            f" else"
            f" case when {a} <= {b} then 1 else 0 end"
            f" end)"
        )
    if part == "hour":
        return (
            f"({datediff(first_date, second_date, 'day')} * 24"
            f" + hour({b}) - hour({a}))"
        )
    if part == "minute":
        return (
            f"({datediff(first_date, second_date, 'hour')} * 60"
            f" + minute({b}) - minute({a}))"
        )
    if part == "second":
        return (
            f"({datediff(first_date, second_date, 'minute')} * 60"
            f" + second({b}) - second({a}))"
        )
    if part == "millisecond":
        return f"((unix_micros({b}) - unix_micros({a})) div 1000)"
    raise CompilationError(
        f"Unsupported datepart for macro datediff in Spark: {part!r}"
    )  # reference: utils/datediff.sql:26


def date_trunc(datepart: str, date_expr: str) -> str:
    """B10 — (reference: utils/date_trunc.sql:1-3)."""
    part = datepart.strip("'\" ").lower()
    return f"date_trunc('{part}', {date_expr})"


def date_spine_sql(datepart: str, start_date: str, end_date: str) -> str:
    """B11 — date spine, END-EXCLUSIVE like dbt's generate_series construction
    (reference: utils/date_spine.sql:1-46 — row_number over a generated
    series, dateadd per row, filter <= end; the series count already excludes
    ``end``).

    Idiomatic Spark: ``sequence(start, end, interval)`` + ``explode`` — a
    single generator, no window over an unpartitioned ORDER BY 1 (which would
    serialize on one task at scale).
    """
    part = datepart.strip("'\" ").lower()
    if part not in ("year", "quarter", "month", "week", "day"):
        raise CompilationError(f"Unsupported datepart for date_spine: {part!r}")
    return (
        f"SELECT d AS date_{part} FROM ("
        f"SELECT explode(sequence(CAST({start_date} AS DATE), "
        f"CAST({end_date} AS DATE), INTERVAL 1 {part.upper()})) AS d"
        f") WHERE d < CAST({end_date} AS DATE)"
    )


# --------------------------------------------------------------------------
# arrays
# --------------------------------------------------------------------------


def array_construct(inputs: list[str] | None, data_type: str = "string") -> str:
    """B12 — ``array[...]``; EMPTY input yields NULL, not an empty array
    (reference: utils/array_construct.sql:1-7)."""
    if not inputs:
        return f"CAST(NULL AS ARRAY<{data_type}>)"
    return f"array({', '.join(inputs)})"


def array_concat(array_1: str, array_2: str) -> str:
    """B13 — (reference: utils/array_concat.sql:1-3)."""
    return f"concat({array_1}, {array_2})"


def array_append(array: str, new_element: str) -> str:
    """B14 — (reference: utils/array_append.sql:1-3 ``concat(a, array[x])``)."""
    return f"concat({array}, array({new_element}))"


# --------------------------------------------------------------------------
# timestamps & types
# --------------------------------------------------------------------------


def current_timestamp() -> str:
    """B15 — (reference: utils/timestamps.sql:1-3)."""
    return "current_timestamp()"


def snapshot_string_as_time(timestamp: str) -> str:
    """B16 — render a timestamp literal (reference: utils/timestamps.sql:5-8)."""
    return f"TIMESTAMP '{timestamp}'"


def type_float() -> str:
    """B17 — (reference: utils/datatypes.sql:1-15)."""
    return "double"


def type_string() -> str:
    return "string"


def type_numeric() -> str:
    return "decimal(28,6)"


def type_int() -> str:
    return "int"


def type_boolean() -> str:
    return "boolean"


def type_timestamp() -> str:
    return "timestamp"


def type_bigint() -> str:
    return "bigint"


def snapshot_hash_arguments(args: list[str]) -> str:
    """A12 — dbt_scd_id hash (reference: materializations/snapshot.sql:1-6):
    ``lower(to_hex(md5(to_utf8(concat(coalesce(cast(a as varchar),''),'|',
    ...)))))``. The '|' separator and coalesce-to-'' must be preserved
    byte-for-byte; Spark md5 of concat_ws is identical."""
    coalesced = ", ".join(f"coalesce(cast({a} as string), '')" for a in args)
    return f"md5(concat_ws('|', {coalesced}))"


def timestamp_add_sql(add_to: str, number: int = 1, interval: str = "hour") -> str:
    """A33 — (reference: impl.py:68-69 ``{ts} + interval '{n}' {unit}``)."""
    return f"{add_to} + INTERVAL '{number}' {interval}"


def date_function() -> str:
    """A34 — current-date expression (reference: impl.py:47-49 ``datenow()``)."""
    return "current_date()"
