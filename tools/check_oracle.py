"""Local replica of the driver's correctness gate: run every declared query
on Spark and its oracle on DuckDB, compare row count / columns / sorted
values. Usage: python tools/check_oracle.py [sf_dir] [name ...]"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dbt_extrica_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm(v):
    # repr-strict: the driver hashes exact values, so any sub-10-sig-digit
    # float divergence that a lenient format would hide must fail here too.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def compare(name: str, spark_df, duck_rows, duck_cols) -> str | None:
    spark_rows = spark_df.collect()
    scols = sorted(spark_df.columns)
    dcols = sorted(duck_cols)
    if scols != dcols:
        return f"columns differ: spark={scols} duck={dcols}"
    if len(spark_rows) != len(duck_rows):
        return f"rowcount differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    sidx = [spark_df.columns.index(c) for c in scols]
    didx = [duck_cols.index(c) for c in dcols]
    s = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_rows)
    d = sorted(tuple(norm(r[i]) for i in didx) for r in duck_rows)
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            return f"value mismatch at sorted-row {i}:\n  spark={a}\n  duck ={b}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # lazy oracles (e.g. dedup_simhash) compute ground truth from the
    # parquet at this scale — point them at the battery's sf dir
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only - set(qs):
        # a typo'd subset name must fail loudly, not silently shrink the
        # run while the summary still reads "passed"
        print(f"unknown quer{'y' if len(only - set(qs)) == 1 else 'ies'}: "
              f"{sorted(only - set(qs))}")
        spark.stop()
        return 2
    failed = []
    ran = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                rel = con.sql(oracles[name])
                err = compare(name, df, rel.fetchall(), list(rel.columns))
            else:
                n = df.count()
                err = None if n >= 0 else "no rows"
        except Exception:
            err = "EXCEPTION:\n" + traceback.format_exc(limit=20)
        dt = time.time() - t0
        status = "OK " if err is None else "FAIL"
        print(f"[{status}] {name} ({dt:.1f}s)")
        if err:
            failed.append(name)
            print("      " + err.replace("\n", "\n      ")[:3000])
    print(f"\n{ran - len(failed)}/{ran} passed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
