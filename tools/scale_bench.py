"""Data-dominated scale reading (r16 verdict item 3): run named headline
queries against a scaled sf directory (tools/make_scale_dir.py) at a given
core count, warm min-of-2 per query, and print one JSON line. Run it twice
(32 and 8 cores) to get the parallel-efficiency ratio the sf0.1 fixture
cannot show (there, fixed overhead dominates and 8 cores reads FASTER).

Usage: python tools/scale_bench.py --sf DIR --cpus N name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", dest="sf_dir", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2,
                    help="warm passes (recorded value = per-query min)")
    args = ap.parse_args()

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(battery.queries())
    try:
        import bench
        qs.update(bench.BENCH_ONLY)
    except Exception:
        pass

    out = {"sf_dir": args.sf_dir, "cpus": args.cpus,
           "loadavg_start": os.getloadavg()}
    cold, warm = {}, {}
    for name in args.names:  # cold/warmup pass
        t0 = time.time()
        qs[name](spark, args.sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        print(f"# cold {name}: {cold[name]}s", file=sys.stderr)
    for r in range(args.runs):
        for name in args.names:
            t0 = time.time()
            qs[name](spark, args.sf_dir).count()
            dt = round(time.time() - t0, 3)
            warm[name] = min(warm.get(name, dt), dt)
            spark.catalog.clearCache()
            print(f"# warm{r + 1} {name}: {dt}s", file=sys.stderr)
    out["cold"] = cold
    out["warm"] = warm
    out["warm_total"] = round(sum(warm.values()), 3)
    out["loadavg_end"] = os.getloadavg()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
