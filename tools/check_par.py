#!/usr/bin/env python3
"""Parallel variant of check.py with per-query wall timing — for the
builder's sf0.1 evidence runs (the driver's own gate stays check.py).

Usage: python3 tools/check_par.py [sfdir] [outdir] [workers]
"""
import json, sys, os, time
from concurrent.futures import ProcessPoolExecutor

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
workers = int(sys.argv[3]) if len(sys.argv) > 3 else 12

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(n for n in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, n)))


def one(name):
    import duckdb
    import pandas as pd
    t0 = time.time()
    con = duckdb.connect()
    con.sql("SET threads TO 2")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    path = os.path.join(outdir, name)
    spark_df = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        ok = len(spark_df) > 0
        return name, ("rows-only OK" if ok else "rows-only EMPTY!"), time.time() - t0
    try:
        oracle_df = con.sql(oracle[name]).df()
    except Exception as e:
        return name, f"ORACLE SQL ERROR: {e}", time.time() - t0
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        return name, f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}", time.time() - t0
    if len(a) != len(b):
        return name, f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}", time.time() - t0
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)

        def kinds(df):
            return ["i" if d.kind in ("i", "u") else d.kind for d in df.dtypes]
        if kinds(a) != kinds(b):
            bad = [(c, str(da), str(db)) for c, da, db
                   in zip(a.columns, a.dtypes, b.dtypes)
                   if ("i" if da.kind in ("i", "u") else da.kind)
                   != ("i" if db.kind in ("i", "u") else db.kind)]
            return name, f"DTYPE MISMATCH: {bad}", time.time() - t0
        return name, "OK", time.time() - t0
    except AssertionError as e:
        return name, "VALUE MISMATCH: " + str(e).split("\n")[0], time.time() - t0


if __name__ == "__main__":
    results = {}
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for name, res, dt in ex.map(one, names):
            flag = "PASS" if res in ("OK", "rows-only OK") else "FAIL"
            print(f"{flag}  {name}: {res}  [{dt:.1f}s]", flush=True)
            results[name] = res
    ok = sum(1 for v in results.values() if v in ("OK", "rows-only OK"))
    print(f"\n{ok}/{len(results)} pass")
