#!/usr/bin/env python3
"""Local mini-driver: mimic the correctness gate.

Runs DuckDB oracle SQL from <outDir>/oracle_sql.json against the sfDir
parquet tables and compares (column-name-sorted, row-sorted) values with
the Spark parquet dumps graft.Verify wrote to <outDir>/<name>.parquet/.

Usage: compare_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    name = name[:-8] if name.endswith(".parquet") else name
    spark_df = pd.read_parquet(d)
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {str(e)[:200]}")
        fails += 1
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"SCHEMA-MISMATCH {name}: spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1
        continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f"ROWCOUNT {name}: spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    # stringify like a hash would
    sa = a.astype(str)
    sb = b.astype(str)
    if sa.equals(sb):
        print(f"OK {name}: {len(a)} rows")
    else:
        diff = (sa != sb).any(axis=1)
        print(f"VALUE-MISMATCH {name}: {diff.sum()}/{len(a)} rows differ")
        mism = diff[diff].index[:3]
        for i in mism:
            print("  spark:", dict(a.iloc[i]))
            print("  duck :", dict(b.iloc[i]))
        fails += 1
print("FAILS:", fails)
sys.exit(1 if fails else 0)
