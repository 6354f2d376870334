#!/usr/bin/env python3
"""Timeout-bounded oracle gate for big-SF evidence runs: each query's
DuckDB oracle runs in its own process with a wall-clock budget; queries
whose ORACLE SQL is infeasible at the scale get flagged TIMEOUT instead
of hanging the gate (the engine side already produced output — the
timeout marks the oracle, not the engine).

Usage: python3 tools/check_timeout.py [sfdir] [outdir] [timeout_sec] [workers] [only,csv]
"""
import json, sys, os, time
import multiprocessing as mp

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
workers = int(sys.argv[4]) if len(sys.argv) > 4 else 8
only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(n for n in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, n))
               and (only is None or n in only))


def one(name, q):
    import duckdb
    import pandas as pd
    t0 = time.time()
    con = duckdb.connect()
    con.sql("SET threads TO 4")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    path = os.path.join(outdir, name)
    spark_df = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        ok = len(spark_df) > 0
        q.put((name, "rows-only OK" if ok else "rows-only EMPTY!",
               time.time() - t0))
        return
    try:
        oracle_df = con.sql(oracle[name]).df()
    except Exception as e:
        q.put((name, f"ORACLE SQL ERROR: {e}", time.time() - t0))
        return
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        q.put((name, f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}", time.time() - t0))
        return
    if len(a) != len(b):
        q.put((name, f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}", time.time() - t0))
        return
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
            q.put((name, f"DTYPE MISMATCH: {bad}", time.time() - t0))
            return
        q.put((name, "OK", time.time() - t0))
    except AssertionError as e:
        q.put((name, "VALUE MISMATCH: " + str(e).split("\n")[0],
               time.time() - t0))


if __name__ == "__main__":
    pending = list(names)
    running = {}  # name -> (proc, queue, started)
    results = {}
    while pending or running:
        while pending and len(running) < workers:
            n = pending.pop(0)
            q = mp.Queue()
            p = mp.Process(target=one, args=(n, q))
            p.start()
            running[n] = (p, q, time.time())
        time.sleep(1)
        for n in list(running):
            p, q, t0 = running[n]
            if not q.empty():
                name, res, dt = q.get()
                results[name] = res
                flag = "PASS" if res in ("OK", "rows-only OK") else "FAIL"
                print(f"{flag}  {name}: {res}  [{dt:.1f}s]", flush=True)
                p.join()
                del running[n]
            elif time.time() - t0 > budget:
                p.terminate()
                p.join()
                results[n] = f"ORACLE TIMEOUT >{budget}s"
                print(f"TIME  {n}: oracle exceeded {budget}s (engine output "
                      f"present; oracle SQL infeasible at this SF)", flush=True)
                del running[n]
            elif not p.is_alive():
                # mp.Queue.empty() is unreliable: a worker that exits right
                # after put() can transiently present an empty queue. Drain
                # with a short-timeout get before declaring the worker dead.
                try:
                    name, res, dt = q.get(timeout=2)
                    results[name] = res
                    flag = "PASS" if res in ("OK", "rows-only OK") else "FAIL"
                    print(f"{flag}  {name}: {res}  [{dt:.1f}s]", flush=True)
                except Exception:
                    results[n] = "WORKER DIED"
                    print(f"FAIL  {n}: worker died", flush=True)
                p.join()
                del running[n]
    ok = sum(1 for v in results.values() if v in ("OK", "rows-only OK"))
    to = sum(1 for v in results.values() if v.startswith("ORACLE TIMEOUT"))
    print(f"\n{ok}/{len(results)} pass, {to} oracle-timeout", flush=True)
    # committed-ledger dump: CHECK_RESULTS_JSON=path writes the full
    # per-query outcome map (plus run metadata) as one JSON artifact
    dest = os.environ.get("CHECK_RESULTS_JSON")
    if dest:
        with open(dest, "w") as f:
            json.dump({"sfdir": sfdir, "outdir": outdir,
                       "oracle_timeout_sec": budget,
                       "pass": ok, "oracle_timeout": to,
                       "total": len(results),
                       "results": dict(sorted(results.items()))}, f, indent=1)
        print(f"ledger written to {dest}", flush=True)
