"""Dump `.explain("formatted")` for named battery queries into per-query
files — the before/after plan evidence for optimization rounds.

Usage:
    python tools/dump_plan_files.py --out plans/r16 --suffix _before name...
    python tools/dump_plan_files.py --out plans/r16 --suffix _after --all-headline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="battery query names")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", dest="sf_dir", default="/root/testdata/sf0.1")
    ap.add_argument("--all-headline", action="store_true",
                    help="dump every bench headline query")
    args = ap.parse_args()

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    names = list(args.names)
    if args.all_headline:
        import bench
        names = [n for n in bench.HEADLINE if n not in names] + names

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(battery.queries())
    try:
        import bench
        qs.update(bench.BENCH_ONLY)
    except Exception:
        pass

    os.makedirs(args.out, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR while planning {name}: {e}"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
