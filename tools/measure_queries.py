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
    import argparse

    parser = argparse.ArgumentParser(
        description="Standalone per-query timings on a quiet host")
    parser.add_argument("names", nargs="+", help="battery query names")
    parser.add_argument("--runs", type=int, default=4)
    parser.add_argument("--sf", dest="sf_dir",
                        default="/root/testdata/sf0.1")
    ns = parser.parse_args()
    args, runs, sf_dir = ns.names, ns.runs, ns.sf_dir

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
