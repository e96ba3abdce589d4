#!/usr/bin/env python3
"""Dev-only correctness pre-check (mimics the driver's DuckDB oracle gate).

Not part of the library: uses the driver-side python stack (duckdb,
pyarrow, pandas) to cross-check Verify output before the round's
official gate runs.

Usage: python3 tools/check_correctness.py /tmp/verify_out /root/testdata/sf0.01
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value rendering: floats to repr via round-trip str
    df = df.astype(object).where(pd.notnull(df), None)
    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    df = df.applymap(cell)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

n_pass = n_fail = 0
for d in sorted(p for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)):
    name = os.path.basename(d)
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
        ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        status = f"rows-only ({len(spark_df)} rows)"
        if len(spark_df) == 0:
            status += "  *** EMPTY ***"
            n_fail += 1
        else:
            n_pass += 1
        print(f"{name:24s} {status}")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        n_fail += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        n_fail += 1
    elif len(a) != len(b):
        print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
        n_fail += 1
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        print(f"{name:24s} VALUE MISMATCH at row {i}:")
        print("  spark:", a.iloc[i].to_dict())
        print("  duck :", b.iloc[i].to_dict())
        n_fail += 1
    else:
        print(f"{name:24s} OK ({len(a)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
