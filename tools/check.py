#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    spark_df = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df) > 0 else "EMPTY!")
        continue
    try:
        oracle_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA MISMATCH cols spark={list(a.columns)} oracle={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[name] = f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
        continue
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        # Dtype-strict pass: the driver hashes string-rendered values, so a
        # float64 oracle column (e.g. DuckDB HUGEINT -> pandas float64) vs a
        # Spark int64 column hashes "1.0" vs "1" and fails even when values
        # match. Emulate by comparing numpy dtype *kinds* (int vs float vs
        # object vs datetime); int width differences are invisible to the
        # driver's hash and stay tolerated.
        def kinds(df):
            return ["i" if d.kind in ("i", "u") else d.kind for d in df.dtypes]
        if kinds(a) != kinds(b):
            bad_cols = [(c, str(da), str(db)) for c, da, db
                        in zip(a.columns, a.dtypes, b.dtypes)
                        if ("i" if da.kind in ("i", "u") else da.kind)
                        != ("i" if db.kind in ("i", "u") else db.kind)]
            results[name] = f"DTYPE MISMATCH (driver hash would fail): {bad_cols}"
            continue
        results[name] = "OK"
    except AssertionError as e:
        results[name] = "VALUE MISMATCH: " + str(e).split("\n")[0]
        # show a sample diff
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            results[name] += f" | row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}"

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only") and "EMPTY" not in v)
for k, v in results.items():
    flag = "PASS" if (v == "OK" or (v.startswith("rows-only") and "EMPTY" not in v)) else "FAIL"
    print(f"{flag}  {k}: {v}")
print(f"\n{ok}/{len(results)} pass")
