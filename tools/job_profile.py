"""Per-query job/stage accounting: run a battery query and report Spark
job count, per-job wall, and total task time — the overhead-vs-compute
split that decides whether a line is data-bound or orchestration-bound.

Usage: python tools/job_profile.py name [name ...] [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", dest="sf_dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from dbt_extrica_spark.session import get_spark
    from dbt_extrica_spark import queries as battery

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = battery.queries()
    tracker = spark.sparkContext.statusTracker()

    for name in args.names:
        for run in range(args.runs):
            spark.catalog.clearCache()
            before = set(tracker.getJobIdsForGroup(None) or [])
            # job ids are global-monotonic; snapshot the max instead
            all_before = tracker.getJobIdsForGroup()
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            all_after = tracker.getJobIdsForGroup()
            new_jobs = sorted(set(all_after) - set(all_before))
            total_stage = 0
            total_tasks = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info is None:
                    continue
                for sid in info.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        total_tasks += si.numTasks
            print(f"{name} run{run}: wall={wall:.2f}s build={t_build:.2f}s "
                  f"jobs={len(new_jobs)} tasks={total_tasks}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
