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
- ``to_unixtime(x)`` -> ``(cast(unix_micros(x) as double) / 1e6)``:
  Trino returns DOUBLE seconds with fractional precision; a bare
  unix_timestamp would silently truncate sub-second parts;
- replacements never touch single-quoted string literals (the
  unit-bearing rewrites consume their unit literal by position in the
  quote-split, so ``date_diff('day', …`` spelled inside a string literal
  is left alone);
- KNOWN DRIFT: ``date_add('unit', n, d)`` on a DATE operand returns
  DATE in Trino but TIMESTAMP via timestampadd — cast at the call site
  if downstream compares types strictly;
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
    "from_iso8601_timestamp": "to_timestamp",
    "array_agg": "collect_list",
    "reduce": "aggregate",          # same (array, init, merge[, finish])
    "now": "current_timestamp",
    "array_distinct": "array_distinct",  # identity; listed for visibility
    # Trino from_unixtime returns TIMESTAMP; Spark's same-named function
    # returns a formatted STRING — timestamp_seconds is the semantic match
    # (accepts fractional seconds too)
    "from_unixtime": "timestamp_seconds",
    # Trino contains() is array-membership (string containment is strpos);
    # Spark's contains() is string-only, array_contains matches exactly
    "contains": "array_contains",
    "starts_with": "startswith",    # same (string, prefix) -> boolean
    "to_hex": "hex",                # varbinary -> uppercase hex in both
    # Trino element_at returns NULL for an out-of-bounds index; Spark's
    # element_at THROWS under ANSI mode (on in Spark 4) — try_element_at
    # restores Trino's NULL contract
    "element_at": "try_element_at",
}

_UNITS = {"second", "minute", "hour", "day", "week", "month",
          "quarter", "year", "millisecond"}


_UNIT_TAIL = re.compile(r"\b(date_diff|date_add)\s*\(\s*$", re.IGNORECASE)

# Trino split(string, delimiter) treats the delimiter as a LITERAL; Spark's
# split(str, pattern) treats it as a Java regex — split(x, '.') would split
# on every character. When the delimiter is the immediately-following
# string literal, wrap it in \Q…\E so Java regex matches it literally.


def _split_arg1_end(seg: str) -> bool:
    """True iff the code segment ends with ``split(<balanced-expr>,`` —
    i.e. the next string literal is split's delimiter argument. Backward
    balanced-paren scan so nested calls (``split(lower(x), '.')``) are
    caught, not just bare identifiers. Known limit: a first argument that
    itself contains a string literal (``split(concat(x, '-'), '.')``)
    starts in an earlier quote-split segment, so the scan hits the segment
    start without finding split's '(' and falls through to Spark regex
    semantics."""
    m = re.search(r",\s*$", seg)
    if m is None:
        return False
    j, depth = m.start() - 1, 0
    while j >= 0:
        c = seg[j]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                return re.search(r"\bsplit\s*$", seg[:j],
                                 re.IGNORECASE) is not None
            depth -= 1
        elif c == "," and depth == 0:
            return False  # ends an arg-2+ boundary, not arg1 -> arg2
        j -= 1
    return False

_TO_UNIXTIME = re.compile(r"\bto_unixtime\s*\(", re.IGNORECASE)

_HASH_IDIOM = re.compile(
    r"\blower\s*\(\s*to_hex\s*\(\s*md5\s*\(\s*to_utf8\s*\(", re.IGNORECASE)


def _scan_balanced(sql: str, start: int) -> int:
    """Index just past the ')' closing the paren opened before ``start``
    (quote-aware)."""
    depth, j, n = 1, start, len(sql)
    while j < n and depth:
        c = sql[j]
        if c == "'":
            j += 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        j += 1
    return j


def _rewrite_hash_idiom(sql: str) -> str:
    """``lower(to_hex(md5(to_utf8(X))))`` -> ``md5(cast(X as string))``.

    This exact chain is what the reference's hash macro EMITS into compiled
    model SQL (reference: macros/utils/hash.sql:1-3, snapshot.sql:1-6), so
    migrated bodies hit it verbatim. It cannot translate piecewise: Trino
    md5 is varbinary -> varbinary while Spark md5 is -> lowercase hex
    STRING, so the to_hex/lower wrappers must collapse together with the
    encode step. Spark's md5(cast(X as string)) is byte-identical output."""
    out: list[str] = []
    i = 0
    while True:
        m = _HASH_IDIOM.search(sql, i)
        if m is None:
            break
        if sql.count("'", 0, m.start()) % 2 == 1:
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        arg_end = _scan_balanced(sql, m.end())      # closes to_utf8(
        rest = sql[arg_end:]
        tail = re.match(r"\s*\)\s*\)\s*\)", rest)   # md5, to_hex, lower
        if tail is None:
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        arg = _rewrite_hash_idiom(sql[m.end():arg_end - 1])
        out.append(sql[i:m.start()])
        out.append(f"md5(cast({arg} as string))")
        i = arg_end + tail.end()
    out.append(sql[i:])
    return "".join(out)


def _translate_segment(seg: str) -> str:
    for trino, spark in _NAME_MAP.items():
        if trino == spark:
            continue
        seg = re.sub(rf"\b{trino}\s*\(", f"{spark}(", seg,
                     flags=re.IGNORECASE)
    # Trino's UNBOUNDED varchar cast — Spark only parses varchar WITH a
    # length; string is the semantic equivalent (varchar(n) left alone)
    seg = re.sub(r"\bas\s+varchar\s*\)", "as string)", seg,
                 flags=re.IGNORECASE)
    return seg


def _rewrite_to_unixtime(sql: str) -> str:
    """``to_unixtime(x)`` -> ``(cast(unix_micros(x) as double) / 1e6)``.
    Trino's to_unixtime is DOUBLE seconds including the fractional part;
    unix_timestamp would truncate to whole seconds. Balanced-paren,
    quote-aware scan (the argument may contain quoted strings with
    parens); nested occurrences rewritten recursively."""
    out: list[str] = []
    i = 0
    while True:
        m = _TO_UNIXTIME.search(sql, i)
        if m is None:
            break
        if sql.count("'", 0, m.start()) % 2 == 1:
            # inside a string literal — emit verbatim and move on
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        depth, j, n = 1, m.end(), len(sql)
        while j < n and depth:
            c = sql[j]
            if c == "'":
                j += 1
                while j < n:
                    if sql[j] == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        arg = _rewrite_to_unixtime(sql[m.end():j - 1])
        out.append(sql[i:m.start()])
        out.append(f"(cast(unix_micros({arg}) as double) / 1e6)")
        i = j
    out.append(sql[i:])
    return "".join(out)


def translate_trino_sql(sql: str) -> str:
    """Rewrite Trino-specific function calls to Spark equivalents, leaving
    single-quoted string literals untouched. The ``date_diff('unit', …)``
    rewrite is positional over the quote-split — the code segment must END
    with the call head and the NEXT literal must be the unit — so the same
    text spelled inside a string literal is never rewritten."""
    sql = _rewrite_hash_idiom(sql)  # before name maps (consumes to_hex/md5)
    sql = _rewrite_to_unixtime(sql)
    parts = sql.split("'")
    out: list[str] = []
    i = 0
    while i < len(parts):
        if i % 2 == 1:  # string-literal content — reattach verbatim
            out.append("'" + parts[i] + "'")
            i += 1
            continue
        seg = parts[i]
        m = _UNIT_TAIL.search(seg)
        if (m is not None and i + 2 < len(parts)
                and parts[i + 1].lower() in _UNITS
                and re.match(r"\s*,", parts[i + 2])):
            fn = m.group(1).lower()
            target = "timestampdiff" if fn == "date_diff" else "timestampadd"
            out.append(_translate_segment(seg[:m.start()])
                       + f"{target}({parts[i + 1].upper()}")
            i += 2  # consume the unit literal; parts[i] stays code parity
            continue
        if (_split_arg1_end(seg) and i + 2 < len(parts)
                and parts[i + 1] != "" and "\\" not in parts[i + 1]
                and re.match(r"\s*[,)]", parts[i + 2])):
            # literal delimiter -> \Q…\E regex quoting ('' -escaped and
            # backslash-bearing delimiters fall through untouched)
            out.append(_translate_segment(seg)
                       + "'\\\\Q" + parts[i + 1] + "\\\\E'")
            i += 2
            continue
        out.append(_translate_segment(seg))
        i += 1
    return "".join(out)
