#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads each
<out>/<name> parquet dumped by graft.Verify, runs <out>/oracle_sql.json
in DuckDB over the same sf tables, and compares (columns sorted by name,
rows sorted, values hashed). Usage: check_queries.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(out, name)
    if not os.path.isdir(spark_dir):
        print(f"MISSING {name}: no spark output dir"); fail += 1; continue
    try:
        got = canon(con.execute(
            f"SELECT * FROM parquet_scan('{spark_dir}/*.parquet')").df())
        exp = canon(con.execute(sql).df())
    except Exception as e:
        print(f"ERROR  {name}: {e}"); fail += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL   {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL   {name}: rows {len(got)} != {len(exp)}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_exact=True)
        print(f"OK     {name}: {len(got)} rows"); ok += 1
    except AssertionError as e:
        print(f"FAIL   {name}: {str(e).splitlines()[-1] if str(e) else e}")
        fail += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
sys.exit(1 if fail else 0)
