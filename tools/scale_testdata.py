#!/usr/bin/env python3
"""Scale the driver testdata by an integer factor with referential integrity.

The driver only generates sf{0.001,0.01,0.1}; the 100x design story needs at
least one measured point above sf0.1 (r8 verdict #3). This tool replicates
sf0.1 `factor` times with per-replica key shifts, producing an sfN dataset
whose join fan-outs, group cardinalities, and key distributions scale
linearly — runnable by both the Spark bench and the DuckDB oracle, so full
hash-compare correctness works at the scaled size too.

Replica i transforms (deterministic, no RNG):
  - every surrogate key k -> k + i * (max_key + 1), consistently across
    fact/dim tables (orders.o_custkey shifts with customer.c_custkey, ...)
  - nation/region: fixed dims, copied as-is (TPC-H scaling semantics)
  - documents.text: per-replica letter-substitution cipher (a 26-letter
    rotation by 7*i) — preserves length/word structure (quality metrics,
    token counts) while making SHINGLE SETS DISJOINT across replicas, so
    the planted intra-replica dup/near-dup clusters replicate instead of
    collapsing into factor-sized cross-replica mega-clusters that would
    blow the pair-generation stages superlinearly for reasons that are an
    artifact of replication, not scale. langid trigram profiles do shift
    on ciphered replicas (they read as "other"); noted in PLANS.md.
  - embeddings.embedding: circular dimension rotation by 7*i (mod dim) —
    norm- and distribution-preserving, but a vector and its rotation are
    uncorrelated, so no artificial cross-replica near-dup pairs and the
    IVF/PQ cluster structure stays non-degenerate.
  - events.ts: kept (factor x event density in the same time window — the
    realistic shape for sessionization/windows at scale)

Usage: python3 tools/scale_testdata.py [factor] [src_dir] [dst_dir] [only_csv]
       (defaults: 10 /root/testdata/sf0.1 ./testdata_sf1 <all>)
       only_csv (r11): comma list of tables to SCALE; every other table is
       COPIED from src unchanged — the q-family floor study (sf100) scales
       the TPC-H relations a decade past sf10 without paying 50M ciphered
       documents it never reads (the copied tables keep harness warm-ups
       and non-q families loadable, at the src's scale).
"""
import os
import string
import sys

import duckdb

KEYS = {  # table -> (column -> key-space name)
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ["region", "nation"]

# Key-embedded name columns ('Supplier#000000178' = printf('%09d', key)):
# they must be RE-DERIVED from the shifted key, or every replica carries the
# same names and any name-grouped aggregation (TPC-H Q21 groups by s_name)
# silently folds `factor` distinct suppliers into one — a replication
# artifact, not a scale behavior. table -> (name_col, prefix, key_col)
NAME_DERIVED = {
    "customer": ("c_name", "Customer#", "c_custkey"),
    "supplier": ("s_name", "Supplier#", "s_suppkey"),
}


def cipher_expr(col: str, i: int) -> str:
    rot = (7 * i) % 26
    if rot == 0:
        return col
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    to = lower[rot:] + lower[:rot] + upper[rot:] + upper[:rot]
    return f"translate({col}, '{lower + upper}', '{to}')"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "./testdata_sf1"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    if only is not None:
        # r11 ADVICE: a typo'd table name would silently come through as a
        # copy and a downstream sweep would measure the wrong scale
        unknown = sorted(only - set(KEYS))
        if unknown:
            sys.exit(f"[scale] unknown only-list table(s) {unknown}; "
                     f"scalable tables are {sorted(KEYS)}")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # factor ~1000 builds a factor-way UNION ALL; DuckDB's default parser
    # depth (1000) rejects it — raise the cap (r12). Very large factors
    # should still prefer two-stage scaling (e.g. 100 then 10): the
    # single-statement union re-scans the source `factor` times.
    con.execute("SET max_expression_depth TO 100000")
    con.execute(f"SET threads={os.cpu_count()}")

    def pq(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    # key-space strides (max+1 so shifted ranges never collide)
    stride = {}
    for t, cols in KEYS.items():
        for c, space in cols.items():
            m = con.execute(f"SELECT max({c}) FROM {pq(t)}").fetchone()[0]
            stride[space] = max(stride.get(space, 0), int(m) + 1)

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM {pq(t)}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"[scale] {t}: copied")

    for t, cols in KEYS.items():
        if only is not None and t not in only:
            con.execute(
                f"COPY (SELECT * FROM {pq(t)}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            print(f"[scale] {t}: copied (not in only-list)")
            continue
        names = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {pq(t)}").fetchall()]
        selects = []
        for i in range(factor):
            exprs = []
            for c in names:
                if c in cols:
                    exprs.append(f"CAST({c} + {i * stride[cols[c]]} AS BIGINT) AS {c}")
                elif t in NAME_DERIVED and c == NAME_DERIVED[t][0]:
                    _, prefix, key = NAME_DERIVED[t]
                    # pad to max(9, len): DuckDB lpad TRUNCATES over-width
                    # values, so once shifted keys reach 1e9 (large factors)
                    # a fixed-9 pad would silently collide derived names,
                    # reintroducing the folded-groups artifact this derives
                    # around. greatest() keeps the pad but never truncates.
                    v = f"CAST({key} + {i * stride[cols[key]]} AS VARCHAR)"
                    exprs.append(
                        f"'{prefix}' || lpad({v}, "
                        f"CAST(greatest(9, length({v})) AS INTEGER), '0') AS {c}")
                elif t == "documents" and c == "text":
                    exprs.append(f"{cipher_expr(c, i)} AS {c}")
                elif t == "documents" and c == "n_chars":
                    exprs.append(f"CAST(length(text) AS BIGINT) AS {c}")
                elif t == "embeddings" and c == "embedding":
                    dim = con.execute(
                        f"SELECT len(embedding) FROM {pq(t)} LIMIT 1").fetchone()[0]
                    rot = (7 * i) % dim
                    e = (f"CAST(embedding[{rot + 1}:] || embedding[:{rot}] AS FLOAT[])"
                         if rot else "embedding")
                    exprs.append(f"{e} AS {c}")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM {pq(t)}")
        union = " UNION ALL ".join(selects)
        # ROW_GROUP_SIZE: parquet scans (Spark AND DuckDB) parallelize at
        # row-group granularity, and DuckDB's default ~122k-row groups give
        # the small-bytes/heavy-per-row tables (embeddings: 20k rows at sf1
        # = ONE group) single-threaded scans — a layout artifact of the
        # generator, not a property of the plans under test. Real warehouse
        # tables at these engines' target scale carry thousands of groups;
        # aim for ~64 groups per table (a 32-core box keeps every core in
        # the scan), floored at DuckDB's 2048-row group minimum so small
        # tables don't fragment into pure footer overhead.
        n_out = con.execute(f"SELECT {factor} * count(*) FROM {pq(t)}").fetchone()[0]
        rgs = max(2048, (n_out // 64 // 2048) * 2048)
        con.execute(
            f"COPY ({union}) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rgs})")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"[scale] {t}: {n} rows")


if __name__ == "__main__":
    main()
