"""Cause-hunt harness for the graph_triangles x10 probe instability
(r15: same-code walls 27.5 / 31.5 / 45.3s — ratios 6.15/7.64/11.01 vs
the 7.0 ceiling — with a steady x1 side and bit-identical counts).

Protocol (the streaming_interval_join precedent): ISOLATE the variable.
Each trial below runs the EXACT probe workload (tools/scale_probe.py
triangles section, x10 side) in a FRESH SparkSession, so long-session
JVM/memory state — the prime suspect, since the probe script runs ~40
operators before triangles — cannot leak in. Per trial we record the
wall and the executed-plan fingerprint (operator tree shape, post-AQE).
A second variant pins AQE partition coalescing off to probe the
plan-variance hypothesis.

VERDICT (r16, recorded): on a quiet host (loadavg 0.84) three trials
read 39.27 / 20.90 / 20.49s with ONE distinct plan fingerprint (806
nodes) and bit-identical counts (263429); an immediate re-invocation
read 27.15 / 22.02. The spread is FIRST-RUN warmup — JIT compilation
plus OS page cache (the pre-count is parquet-metadata-only and never
touches data pages) — NOT AQE plan variance and NOT the operator. The
fix is measurement-side: tools/scale_probe.py warm2 (min-of-2 on every
gated side), after which the x10 wall floors at 19-22s and the
ORIGINAL 7.0 ratio ceiling holds (measured 4.69 on a loaded host).

Usage: python tools/triangles_hunt.py [trials] [--mode=fresh|pinned]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def plan_fingerprint(df) -> str:
    """Post-execution physical plan reduced to its operator-tree shape:
    node names only, ids/sizes/locations stripped — two runs that chose
    different join strategies or partition counts fingerprint apart."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes = re.findall(r"^[\s+*:-]*([A-Za-z]+)", plan, re.M)
    return "/".join(nodes)


def one_trial(mode: str) -> dict:
    from dbt_extrica_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "pinned":
        # pin: disable AQE partition coalescing for the wedge stages
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "false")
    from dbt_extrica_spark.extensions import analytics

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li_big = li
    for i in range(1, 10):
        li_big = li_big.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + i * 10_000_000))
    li_big.count()  # materialize scan stats like the probe's earlier count

    e = li_big.where("l_quantity > 10").selectExpr(
        "l_orderkey % 199999 AS u", "l_partkey % 199999 AS v")
    res = analytics.triangle_count(e, "u", "v")
    t0 = time.time()
    row = res.collect()[0]
    wall = round(time.time() - t0, 2)

    fp = plan_fingerprint(res)
    out = {"mode": mode, "wall": wall, "count": int(row.n_triangles),
           "fingerprint_len": len(fp.split("/")),
           "fingerprint": fp}
    spark.stop()
    return out


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mode = "fresh"
    for a in sys.argv[2:]:
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]
    results = []
    for t in range(trials):
        r = one_trial(mode)
        results.append(r)
        print(json.dumps({k: v for k, v in r.items()
                          if k != "fingerprint"}), flush=True)
    fps = {r["fingerprint"] for r in results}
    walls = [r["wall"] for r in results]
    print(json.dumps({
        "mode": mode, "walls": walls,
        "spread": round(max(walls) / min(walls), 2),
        "distinct_plans": len(fps),
        "counts_identical": len({r["count"] for r in results}) == 1,
    }), flush=True)


if __name__ == "__main__":
    main()
