"""Regenerate the COVERAGE.md "Driver-evidence freshness" table from the
actual driver records (CORRECTNESS_r*.json) — the table can't silently
drift from the evidence it claims to summarize.

Usage:
    python tools/freshness.py            # print the markdown table
    python tools/freshness.py --stale    # entries sorted stalest-first
                                         # (the window-rotation worklist)
    python tools/freshness.py --splice   # rewrite COVERAGE.md in place:
                                         # the freshness table AND the
                                         # header's battery count (the
                                         # r12 verdict found the count
                                         # stale at 172 while the table
                                         # said 189 — the script owns
                                         # BOTH numbers now)

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


def _splice_coverage(rows) -> None:
    """Rewrite COVERAGE.md's freshness table (from the `| Entry |` header
    to the end of the table) and the header battery-count claim, from the
    SAME registry the table was generated from."""
    from dbt_extrica_spark import queries as battery

    n = len(battery.queries())
    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as f:
        lines = f.read().splitlines(keepends=True)

    # header count: the one line claiming "N/N at sf0.01"
    count_pat = re.compile(r"\d+/\d+ at sf0\.01")
    hits = [i for i, ln in enumerate(lines[:20]) if count_pat.search(ln)]
    assert len(hits) == 1, "COVERAGE.md header count line not found"
    lines[hits[0]] = count_pat.sub(f"{n}/{n} at sf0.01", lines[hits[0]])

    # current-round label in the freshness section prose — stamped from
    # the window's own identity (queries._WINDOW_ROUND), NOT from the
    # latest CORRECTNESS file + 1: once this round's driver evidence
    # lands, evidence-round + 1 would mislabel the unchanged window
    window_round = battery._WINDOW_ROUND
    latest_evidence = max((r for r, _ in _rounds()), default=0)
    if window_round < latest_evidence:
        # the rotation for round N should carry _WINDOW_ROUND = N, which
        # is never BEHIND the newest evidence file — being behind means
        # someone rotated the window without bumping the constant
        print(f"WARNING: queries._WINDOW_ROUND = r{window_round} is "
              f"behind the newest CORRECTNESS file (r{latest_evidence})"
              f" — did the rotation forget to bump it?")
    for i, ln in enumerate(lines):
        m = re.search(r"CURRENT \(round-(\d+)\)", ln)
        if m:
            lines[i] = ln.replace(m.group(0),
                                  f"CURRENT (round-{window_round})")

    # table: header row through the last contiguous `|` row
    starts = [i for i, ln in enumerate(lines)
              if ln.startswith("| Entry | Last driver row |")]
    assert len(starts) == 1, "freshness table header not found"
    s = starts[0]
    e = s + 1
    while e < len(lines) and lines[e].startswith("|"):
        e += 1
    table = ["| Entry | Last driver row | In current window |\n",
             "|---|---|---|\n"]
    table += [f"| {name} | {evidence} | {'yes' if in_win else ''} |\n"
              for name, evidence, in_win in rows]
    with open(path, "w") as f:
        f.write("".join(lines[:s] + table + lines[e:]))
    print(f"COVERAGE.md spliced: {n}/{n} header count + "
          f"{len(rows)}-row freshness table (window label r{window_round})")


def main() -> None:
    rows = freshness()
    if "--splice" in sys.argv:
        _splice_coverage(rows)
        return
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
