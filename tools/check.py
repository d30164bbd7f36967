#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL from outDir/oracle_sql.json against the sf parquet
tables, compares with the Spark parquet dumps in outDir/<name>/.
Columns sorted by name; rows sorted by all columns; values hashed.
"""
import json, sys, math, threading
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df):
    # df: pandas DataFrame -> sorted-by-name columns, sorted rows, stringified
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            # Full 17-sig-digit repr: the driver hash-compares exact values,
            # so the local mirror must be equally strict (ADVICE r1).
            return repr(v)
        return str(v)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

def main(sf_dir, out_dir, budget_s=None, exclude=()):
    def connect():
        c = duckdb.connect()
        # scaled-corpus runs: an unbounded DuckDB (r19's two-pass BM25 at
        # sf10 was measured past 57 GB RSS) can destabilize the box before
        # the watchdog fires — cap it so it spills to disk instead.
        import os
        if os.environ.get("DUCKDB_MEM"):
            c.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
        if os.environ.get("DUCKDB_THREADS"):
            c.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c
    con = connect()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = skipped = 0
    for name, sql in sorted(oracle.items()):
        if name in exclude:  # resume support: already verified in a prior run
            continue
        try:
            # soft per-oracle budget (same watchdog as oracle_times.py): at
            # scaled sf a pathological DuckDB shape (a16/a17's residual
            # reconstruction) must not hang the whole compare — it lands as
            # SKIP (budget), not a correctness verdict. The callback sets
            # `fired` BEFORE interrupting: (a) SKIP is classified by the flag,
            # not elapsed time, so a slow genuine oracle error still lands as
            # FAIL; (b) a timer that fired at all (even after the query
            # finished — the cancel() race) may leave a pending interrupt on
            # the connection, so the connection is rebuilt before reuse.
            fired = [False]
            def watchdog():
                fired[0] = True
                con.interrupt()
            timer = threading.Timer(budget_s, watchdog) if budget_s else None
            if timer:
                timer.start()
            try:
                expected = canon(con.sql(sql).df())
            finally:
                if timer:
                    timer.cancel()
                    # cancel() does not wait for an in-flight callback: if the
                    # timer fired concurrently with cancel(), fired[0] could be
                    # set AFTER the check below, leaving a pending interrupt to
                    # poison the NEXT query (misclassified as a budget SKIP).
                    # join() guarantees the callback has fully run or never will.
                    timer.join()
                if fired[0]:
                    con = connect()  # possibly-poisoned connection: rebuild
        except Exception as e:
            if fired[0] or isinstance(e, duckdb.InterruptException):
                print(f"SKIP {name}: oracle exceeded {budget_s}s DuckDB budget")
                skipped += 1
            else:
                print(f"FAIL {name}: oracle error: {e}")
                fail += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        if expected == got:
            print(f"OK   {name}: {len(got)} rows")
            ok += 1
        else:
            print(f"FAIL {name}: expected {len(expected)} rows got {len(got)}")
            eset, gset = set(expected), set(got)
            for r in list(eset - gset)[:3]:
                print(f"  - oracle only: {r}")
            for r in list(gset - eset)[:3]:
                print(f"  - spark  only: {r}")
            fail += 1
    print(f"\n{ok} OK, {fail} FAIL, {skipped} SKIP")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else None,
                  set(sys.argv[4].split(",")) if len(sys.argv) > 4 else ()))
