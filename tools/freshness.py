"""Regenerate the COVERAGE.md "Driver-evidence freshness" table from the
actual driver records (CORRECTNESS_r*.json) — the table can't silently
drift from the evidence it claims to summarize.

Usage:
    python tools/freshness.py            # print the markdown table
    python tools/freshness.py --stale    # entries sorted stalest-first
                                         # (the window-rotation worklist)

For each battery entry the latest round whose CORRECTNESS file holds a row
is reported with its verdict: ``green`` = rows+schema+hash all true (or
rows-only true for entries without an oracle — the driver records
hash_match: null there), ``ERR`` otherwise. Window membership comes from
the live queries registry (_GATED_WINDOW), so the table always reflects
the rotation that will ship this round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rounds() -> list[tuple[int, dict]]:
    out = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out.append((int(m.group(1)), json.load(f)))
    # sort on the ROUND NUMBER, not the filename: lexicographic order
    # puts r10 before r8 once padding varies, and later rounds must win
    # the latest[name] overwrite
    return sorted(out, key=lambda t: t[0])


def _verdict(row: dict) -> str:
    if row.get("err") == "no_oracle":
        # the driver's marker for deliberately rows-only entries (no
        # oracle_sql) — a weaker check by design, not a failure
        return "rows-only" if row.get("spark_rows") is not None else "ERR"
    if row.get("err"):
        return "ERR"
    checks = [row.get(k) for k in ("rows_match", "schema_match", "hash_match")]
    # hash_match/schema_match are null for rows-only entries — only an
    # explicit False is a failure
    if any(c is False for c in checks):
        return "FAIL"
    return "green"


def freshness() -> list[tuple[str, str, bool]]:
    """(entry, 'rN green'|'never', in_current_window) per battery entry,
    registry order."""
    from dbt_extrica_spark import queries as battery

    latest: dict[str, str] = {}
    for rnum, rows in _rounds():
        for name, row in rows.items():
            latest[name] = f"r{rnum} {_verdict(row)}"
    window = set(battery._GATED_WINDOW)
    return [(name, latest.get(name, "never"), name in window)
            for name in battery.queries()]


def main() -> None:
    rows = freshness()
    if "--stale" in sys.argv:
        def age(evidence: str) -> int:
            return -1 if evidence == "never" else int(
                evidence.split()[0][1:])
        rows = sorted(rows, key=lambda r: (age(r[1]), r[0]))
        for name, evidence, in_win in rows:
            print(f"{evidence:12s} {'WINDOW' if in_win else '      '} {name}")
        return
    print("| Entry | Last driver row | In current window |")
    print("|---|---|---|")
    for name, evidence, in_win in rows:
        print(f"| {name} | {evidence} | {'yes' if in_win else ''} |")


if __name__ == "__main__":
    main()
