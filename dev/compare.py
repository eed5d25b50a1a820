#!/usr/bin/env python
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python dev/compare.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(with each testdata parquet registered under its table name), load the
Spark result parquet, sort columns by name, sort rows, and compare cell
values exactly. Prints PASS/FAIL per query.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    try:
        exp = con.execute(oracle[name]).df()
        got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in got_files], ignore_index=True)
        e, g = canon(exp), canon(got)
        if list(e.columns) != list(g.columns):
            print(f"FAIL {name}: columns exp={list(e.columns)} got={list(g.columns)}")
            fails += 1
            continue
        if len(e) != len(g):
            print(f"FAIL {name}: rows exp={len(e)} got={len(g)}")
            fails += 1
            continue
        # exact value compare, cell by cell via string canonicalization
        mism = []
        for c in e.columns:
            ec = e[c].astype(str).values
            gc = g[c].astype(str).values
            bad = [(i, ec[i], gc[i]) for i in range(len(ec)) if ec[i] != gc[i]]
            if bad:
                mism.append((c, bad[:3]))
        if mism:
            print(f"FAIL {name}: value mismatches {mism[:2]}")
            fails += 1
        else:
            print(f"PASS {name} ({len(e)} rows)")
    except Exception as ex:
        print(f"FAIL {name}: exception {ex}")
        fails += 1
queries_missing = [q for q in glob.glob(f"{out_dir}/q*") if os.path.basename(q) not in oracle]
if queries_missing:
    print("no-oracle (rows-only):", [os.path.basename(q) for q in queries_missing])
sys.exit(1 if fails else 0)
