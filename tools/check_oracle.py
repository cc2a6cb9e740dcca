#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfdir> <verify_outdir>
Registers each parquet table as a DuckDB view, runs every oracle_sql.json
entry, loads the corresponding Spark parquet result, sorts columns by name
and rows by all columns, and compares values (exact for non-floats; exact
bitwise for floats, with a reported max-abs-diff fallback).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    got_path = os.path.join(outdir, name)
    try:
        got = pd.concat([pd.read_parquet(f) for f in
                         glob.glob(os.path.join(got_path, "*.parquet"))])
    except Exception as e:
        print(f"{name}: SPARK RESULT MISSING: {e}")
        fails += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"{name}: SCHEMA MISMATCH exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"{name}: ROWCOUNT exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    diffs = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == 'f' or g.dtype.kind == 'f':
            neq = ~((e == g) | (e.isna() & g.isna()))
            if neq.any():
                maxd = (e - g).abs().max()
                diffs.append(f"{c}: {int(neq.sum())} diffs maxabs={maxd:.3e}")
        else:
            if not e.astype(str).equals(g.astype(str)):
                n = int((e.astype(str) != g.astype(str)).sum())
                diffs.append(f"{c}: {n} value diffs")
    if diffs:
        print(f"{name}: VALUE DIFFS rows={len(exp)}: " + "; ".join(diffs))
        fails += 1
    else:
        print(f"{name}: OK ({len(exp)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
