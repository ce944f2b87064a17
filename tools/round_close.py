"""Round-close chain runner (r13 verdict #4: the definitive chain must
provably cover FINAL code). Runs the full verification chain — plan
lint, double-scale battery, pytest, bench, 10x scale probe — as ONE
sequential script that:

1. refuses to start on a dirty working tree,
2. records `git rev-parse HEAD` at start, asserts it UNCHANGED at the
   end (a mid-chain commit invalidates the record), and
3. writes CHAIN_r{round}.json with the HEAD, per-step wall times,
   summaries, and start/end timestamps — so "the recorded chain
   postdates the last operator commit" is checkable from the artifact
   itself instead of reconstructed from prose.

Usage: python tools/round_close.py <round> [--skip bench,probe,...]
Steps: lint, battery_small, battery_mid, pytest, bench, probe.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sh(cmd: list[str], timeout: int = 7200) -> tuple[int, str]:
    r = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    return r.returncode, r.stdout


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, text=True,
                          stdout=subprocess.PIPE).stdout.strip()


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    if _git("status", "--porcelain"):
        print("REFUSED: dirty working tree — commit first; the chain "
              "record must name one exact commit.")
        return 2
    head = _git("rev-parse", "HEAD")
    record: dict = {"round": rnd, "head": head,
                    "started_utc": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "loadavg_start": list(os.getloadavg()),
                    "steps": {}}

    def step(name: str, cmd: list[str], tail: int = 3,
             timeout: int = 7200) -> bool:
        if name in skip:
            record["steps"][name] = {"skipped": True}
            return True
        t0 = time.time()
        code, out_text = _sh(cmd, timeout=timeout)
        lines = [ln for ln in out_text.strip().splitlines() if ln.strip()]
        record["steps"][name] = {
            "cmd": " ".join(cmd), "exit": code,
            "sec": round(time.time() - t0, 1),
            "tail": lines[-tail:],
        }
        print(f"[{'ok' if code == 0 else 'FAIL'}] {name} "
              f"({record['steps'][name]['sec']}s)")
        return code == 0

    ok = True
    ok &= step("lint", [sys.executable, "tools/plan_lint.py"])
    ok &= step("battery_small", [sys.executable, "tools/check_oracle.py",
                                 "/root/testdata/sf0.001"])
    ok &= step("battery_mid", [sys.executable, "tools/check_oracle.py",
                               "/root/testdata/sf0.01"])
    ok &= step("pytest", [sys.executable, "-m", "pytest", "tests/",
                          "-q", "--tb=line"], tail=2)
    ok &= step("bench", [sys.executable, "bench.py"], tail=2)
    ok &= step("probe", [sys.executable, "tools/scale_probe.py", "10"],
               tail=1)

    head_end = _git("rev-parse", "HEAD")
    record["ended_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime())
    record["loadavg_end"] = list(os.getloadavg())
    record["head_unchanged"] = head_end == head
    record["all_ok"] = bool(ok) and record["head_unchanged"]
    path = os.path.join(REPO, f"CHAIN_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"chain": path, "head": head[:12],
                      "head_unchanged": record["head_unchanged"],
                      "all_ok": record["all_ok"]}))
    return 0 if record["all_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
