"""Standalone per-query timing on a quiet host — the re-measure tool for
bench upticks (NEXT.md noise-band bookkeeping). Runs each named query N
times in one JVM (first run reported separately as cold) with cache
cleared between runs.

Usage: python tools/measure_queries.py name [name ...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 4
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
            args.remove(sys.argv[i + 1])
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            args.remove(sys.argv[i + 1])

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = battery.queries()
    out = {"sf_dir": sf_dir, "runs": runs, "loadavg_start": os.getloadavg()}
    for name in args:
        times = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"cold": times[0], "warm": times[1:],
                     "warm_min": min(times[1:]) if len(times) > 1 else None}
    out["loadavg_end"] = os.getloadavg()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
