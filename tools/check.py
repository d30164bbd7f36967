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
    # CHECK_SQL_COMPARE_ROWS=<n>: Spark dumps with >= n rows are compared
    # INSIDE DuckDB (row counts + symmetric EXCEPT ALL over name-aligned
    # columns) instead of the pure-python canon() path, which costs
    # ~1.5 min AND ~0.5 GB per million output rows per side (r12: a 95M-row
    # sf100e verdict would have taken ~5 h and OOM'd the box). Columnar
    # compare is exact on typed values (stricter than the 17-digit float
    # repr) and multiset-correct (EXCEPT ALL); NULLs compare equal (set-op
    # distinct semantics, same as canon's "NULL" token). Off by default —
    # small-scale runs keep the driver-mirroring canon path bit-for-bit.
    import os as _os
    sqlcmp_rows = int(_os.environ.get("CHECK_SQL_COMPARE_ROWS", "0"))
    for name, sql in sorted(oracle.items()):
        if name in exclude:  # resume support: already verified in a prior run
            continue
        if sqlcmp_rows:
            try:
                dump = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
                nspark = con.sql(f"SELECT count(*) FROM ({dump})").fetchone()[0]
            except Exception as e:
                print(f"FAIL {name}: spark output unreadable: {e}")
                fail += 1
                continue
            if nspark >= sqlcmp_rows:
                cols = ", ".join(
                    f'"{c}"' for c in sorted(
                        con.sql(f"SELECT * FROM ({dump}) LIMIT 0").columns))
                cmp_sql = (
                    f"WITH o AS ({sql}), s AS ({dump}) SELECT "
                    f"(SELECT count(*) FROM o) AS n_oracle, "
                    f"(SELECT count(*) FROM s) AS n_spark, "
                    f"(SELECT count(*) FROM (SELECT {cols} FROM o EXCEPT ALL "
                    f"SELECT {cols} FROM s)) AS o_minus_s, "
                    f"(SELECT count(*) FROM (SELECT {cols} FROM s EXCEPT ALL "
                    f"SELECT {cols} FROM o)) AS s_minus_o")
                fired = [False]
                def watchdog():
                    fired[0] = True
                    con.interrupt()
                timer = threading.Timer(budget_s, watchdog) if budget_s else None
                if timer:
                    timer.start()
                try:
                    n_o, n_s, oms, smo = con.sql(cmp_sql).fetchone()
                except Exception as e:
                    if fired[0] or isinstance(e, duckdb.InterruptException):
                        print(f"SKIP {name}: oracle exceeded {budget_s}s DuckDB budget (sql-compare)")
                        skipped += 1
                    else:
                        print(f"FAIL {name}: oracle error (sql-compare): {e}")
                        fail += 1
                    continue
                finally:
                    if timer:
                        timer.cancel()
                        timer.join()
                    if fired[0]:
                        con = connect()
                if n_o == n_s and oms == 0 and smo == 0:
                    print(f"OK   {name}: {n_s} rows (sql-compare)")
                    ok += 1
                else:
                    print(f"FAIL {name}: expected {n_o} rows got {n_s} "
                          f"(oracle-only {oms}, spark-only {smo}) (sql-compare)")
                    fail += 1
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
