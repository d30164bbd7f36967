#!/usr/bin/env python3
"""Staged DuckDB oracle for the d6-FULL verification (r17, verdict r16 #8).

Executes the statement plan graft.DedupFull wrote to
<out_dir>/d6_full_oracle.json against a PERSISTENT DuckDB database file, so
the run is resume-safe at every stage boundary:

  1. setup      — shingle-list + candidate tables (CREATE IF NOT EXISTS)
  2. passes     — verified-pair INSERTs, one candidate residue class each
                  (t_done records completed residues; re-runs skip them)
  3. cluster    — python-driven min-label iteration to a fixpoint (the
                  registered d6 oracle's recursive reach CTE is reach x
                  edges per iteration — quadratic in cluster size; this is
                  one edge-list pass per iteration)
  4. compare    — in-DuckDB row counts + symmetric EXCEPT ALL against the
                  Spark dump (the CHECK_SQL_COMPARE_ROWS path of check.py)

Usage: d6_full_check.py <sf_dir> <out_dir> <db_path>
Env:   DUCKDB_MEM, DUCKDB_THREADS, DUCKDB_TEMPDIR (cap before launching —
       see the verify skill's serialize-disk-heavy-jobs rule).
"""
import json
import os
import sys
import time

import duckdb


def main(sf_dir, out_dir, db_path):
    spec = json.load(open(f"{out_dir}/d6_full_oracle.json"))
    con = duckdb.connect(db_path)
    if os.environ.get("DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_TEMPDIR"):
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMPDIR']}'")
    con.execute(f"CREATE OR REPLACE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    con.execute(f"CREATE OR REPLACE VIEW embeddings AS "
                f"SELECT * FROM '{sf_dir}/embeddings.parquet'")

    for s in spec["setup"]:
        t0 = time.time()
        con.execute(s)
        print(f"[setup] {s.splitlines()[0][:60]}...: {time.time()-t0:.1f}s",
              flush=True)

    done = {r for (r,) in con.execute("SELECT r FROM t_done").fetchall()}
    for r in range(spec["passes"]):
        if r in done:
            continue
        t0 = time.time()
        con.execute("BEGIN")
        con.execute(spec["pass_sql"].replace("{R}", str(r)))
        con.execute(f"INSERT INTO t_done VALUES ({r})")
        con.execute("COMMIT")
        print(f"[pass {r}/{spec['passes']}] {time.time()-t0:.1f}s", flush=True)

    # clustering is cheap relative to the passes: recompute from scratch
    # each run (idempotent) rather than carrying fixpoint state
    con.execute("DROP TABLE IF EXISTS t_lbl")
    con.execute("DROP TABLE IF EXISTS t_lbl_next")
    t0 = time.time()
    con.execute(spec["cluster_init"])
    for it in range(50):
        con.execute(spec["cluster_step"])
        changed = con.execute(spec["cluster_changed"]).fetchone()[0]
        con.execute("DROP TABLE t_lbl")
        con.execute("ALTER TABLE t_lbl_next RENAME TO t_lbl")
        print(f"[cluster iter {it}] changed={changed} "
              f"({time.time()-t0:.1f}s total)", flush=True)
        if changed == 0:
            break
    else:
        raise SystemExit("cluster min-label iteration did not converge in 50")

    def compare(name, oracle_sql, dump_dir):
        dump = f"SELECT * FROM '{dump_dir}/*.parquet'"
        cols = ", ".join(
            f'"{c}"' for c in sorted(
                con.sql(f"SELECT * FROM ({dump}) LIMIT 0").columns))
        cmp_sql = (
            f"WITH o AS MATERIALIZED ({oracle_sql}), "
            f"s AS MATERIALIZED ({dump}) SELECT "
            f"(SELECT count(*) FROM o) AS n_oracle, "
            f"(SELECT count(*) FROM s) AS n_spark, "
            f"(SELECT count(*) FROM (SELECT {cols} FROM o EXCEPT ALL "
            f"SELECT {cols} FROM s)) AS o_minus_s, "
            f"(SELECT count(*) FROM (SELECT {cols} FROM s EXCEPT ALL "
            f"SELECT {cols} FROM o)) AS s_minus_o")
        t0 = time.time()
        n_oracle, n_spark, oms, smo = con.execute(cmp_sql).fetchone()
        verdict = {
            "query": name,
            "sf": sf_dir.rstrip("/").split("/")[-1],
            "passes": spec["passes"],
            "n_oracle": n_oracle,
            "n_spark": n_spark,
            "o_minus_s": oms,
            "s_minus_o": smo,
            "match": bool(n_oracle == n_spark and oms == 0 and smo == 0),
            "compare_sec": round(time.time() - t0, 1),
        }
        print(json.dumps(verdict), flush=True)
        return verdict["match"]

    ok = compare("d6_dup_clusters_FULL", spec["final_select"],
                 f"{out_dir}/d6_dup_clusters")
    # chain oracles (WITH cluster AS t_lbl, shx AS t_shl + registered tails)
    # need the registered WITH removed when nested under the compare's own
    # WITH? No — DuckDB allows a nested WITH inside a CTE body, so the
    # chain SQL embeds as-is.
    for name, sql in sorted(spec.get("chain", {}).items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"[chain {name}] no spark dump — skipped", flush=True)
            continue
        ok = compare(name, sql, f"{out_dir}/{name}") and ok

    # staged extras (r17: the r6 full-Q assembly) — resume-safe residue
    # passes with their own done-table; EXTRA_MAX_SEC bounds how much pass
    # work THIS invocation takes on (re-run to continue), so an extra whose
    # total oracle cost exceeds a round's budget still accumulates, and an
    # incomplete extra is reported (with the measured per-pass cost), never
    # compared against a partial table.
    budget = float(os.environ.get("EXTRA_MAX_SEC", "inf"))
    done_counts = {}
    passes_by_name = {e["name"]: e["passes"] for e in spec.get("extras", [])}
    for ex in spec.get("extras", []):
        unmet = [r for r in ex.get("requires", [])
                 if done_counts.get(r, 0) < passes_by_name.get(r, 1)]
        if unmet:
            print(f"[{ex['name']}] prerequisite(s) {unmet} incomplete — "
                  f"skipped (re-run to continue)", flush=True)
            continue
        for s in ex["setup"]:
            t0 = time.time()
            con.execute(s)
            if time.time() - t0 > 5:
                print(f"[{ex['name']} setup] {s.splitlines()[0][:60]}...: "
                      f"{time.time()-t0:.1f}s", flush=True)
        done = {r for (r,) in con.execute(
            f"SELECT r FROM {ex['done_table']}").fetchall()}
        t_start, pass_secs = time.time(), []
        for r in range(ex["passes"]):
            if r in done:
                continue
            if time.time() - t_start > budget:
                break
            t0 = time.time()
            con.execute("BEGIN")
            con.execute(ex["pass_sql"].replace("{R}", str(r)))
            con.execute(f"INSERT INTO {ex['done_table']} VALUES ({r})")
            con.execute("COMMIT")
            pass_secs.append(round(time.time() - t0, 1))
            done.add(r)
            print(f"[{ex['name']} pass {r}/{ex['passes']}] {pass_secs[-1]}s",
                  flush=True)
        done_counts[ex["name"]] = len(done)
        if len(done) < ex["passes"]:
            print(json.dumps({
                "query": ex["name"], "partial": True,
                "passes_done": len(done), "passes": ex["passes"],
                "pass_secs": pass_secs}), flush=True)
        elif os.path.isdir(f"{out_dir}/{ex['name']}"):
            ok = compare(ex["name"], ex["final_select"],
                         f"{out_dir}/{ex['name']}") and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
