#!/usr/bin/env python3
"""Dev-loop mimic of the driver's correctness gate: compare Verify's
parquet dumps against DuckDB running oracle_sql.json on the same tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"{name:24s} MISSING spark output"); fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        exp = con.execute(sql).df()
    except Exception as ex:
        print(f"{name:24s} ERROR {str(ex)[:160]}"); fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"{name:24s} SCHEMA got={gc} exp={ec}"); fail += 1; continue
    g = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    e = exp[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    if len(g) != len(e):
        print(f"{name:24s} ROWS got={len(g)} exp={len(e)}"); fail += 1; continue
    if len(g) == 0:
        print(f"{name:24s} WARN empty result"); continue
    # exact compare incl dtypes normalized
    try:
        same = True
        for c in gc:
            gv, ev = g[c], e[c]
            if gv.dtype != ev.dtype:
                try:
                    gv = gv.astype(ev.dtype)
                except Exception:
                    print(f"{name:24s} DTYPE col={c} {g[c].dtype} vs {e[c].dtype}")
                    same = False; break
            eq = (gv.isna() & ev.isna()) | (gv == ev)
            if not eq.all():
                bad = (~eq).idxmax()
                print(f"{name:24s} VALUE col={c} row={bad} got={g[c][bad]!r} exp={e[c][bad]!r}")
                same = False
                break
        if same:
            print(f"{name:24s} OK rows={len(g)}")
        else:
            fail += 1
    except Exception as ex:
        print(f"{name:24s} CMPERR {str(ex)[:160]}"); fail += 1
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
