#!/usr/bin/env python3
"""Time every SparkEntry oracle SQL in DuckDB -> ORACLE_TIMES.json.

Gives the bench an EXTERNAL perf anchor (r8 verdict #5): BASELINE.json
publishes no reference wall-times, so until now the only enforceable
comparison was round-over-round Spark vs Spark. DuckDB running the same
ANSI SQL over the same parquet at the same scale is a real single-node
denominator at every sf.

Usage:
  sbt "runMain graft.OracleSqlDump /tmp/oracle_sql.json"
  python3 tools/oracle_times.py /root/testdata/sf0.1 /tmp/oracle_sql.json

Writes ORACLE_TIMES.json at the repo root:
  {"sf": "sf0.1", "n": 3, "threads": <n>, "duckdb": "1.0.0",
   "oracle_ms": {query: median_ms, ...}, "total_ms": N}

Caveats (also in PLANS.md): DuckDB times are whole-query — they include
any index-building work the Spark bench splits into its `cold` map, so
for build-once/probe-forever queries (d10, a13z, r14...) compare DuckDB
against Spark cold+median, not median alone.

This is a dev/driver-side measurement tool (duckdb is not a library
dependency of the Scala engine).
"""
import json
import os
import statistics
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sql_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_sql.json"
    n = int(os.environ.get("ORACLE_BENCH_N", "3"))
    threads = int(os.environ.get("ORACLE_BENCH_THREADS", "32"))

    with open(sql_path) as f:
        oracle_sql = json.load(f)

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    # scaled-corpus runs: bound DuckDB's memory so a heavy oracle spills
    # instead of destabilizing the box (same guard as tools/check.py).
    if os.environ.get("ORACLE_BENCH_MEM"):
        con.execute(f"SET memory_limit='{os.environ['ORACLE_BENCH_MEM']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    budget_s = float(os.environ.get("ORACLE_BENCH_TIMEOUT", "120"))
    times, failed = {}, {}
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        runs = []
        # soft per-query budget: a watchdog thread interrupts DuckDB if a
        # single execution exceeds it — one pathological oracle (nested-
        # loop pairwise shapes at larger sf) must not hang the whole sweep
        timer = None
        try:
            for k in range(n + 1):  # run 0 = warm (buffer pool, plan cache)
                print(f"[oracle] {name} run {k}...", file=sys.stderr, flush=True)
                timer = threading.Timer(budget_s, con.interrupt)
                timer.start()
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                timer.cancel()
                if k > 0:
                    runs.append((time.perf_counter() - t0) * 1000)
            times[name] = round(statistics.median(runs), 1)
        except Exception as e:  # noqa: BLE001 - record and continue
            if timer:
                timer.cancel()
            failed[name] = str(e)[:200]
            print(f"[oracle] {name} FAILED: {failed[name]}", file=sys.stderr)

    out = {
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "n": n,
        "threads": threads,
        "duckdb": duckdb.__version__,
        "oracle_ms": times,
        "total_ms": round(sum(times.values()), 1),
    }
    if failed:
        out["failed"] = failed
    with open("ORACLE_TIMES.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[oracle] {len(times)} timed, {len(failed)} failed, "
          f"total {out['total_ms']:.0f} ms -> ORACLE_TIMES.json")


if __name__ == "__main__":
    main()
