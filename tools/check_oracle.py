#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables, sort columns by name + rows by all values, and compare.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir]
"""
import sys, json, glob
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

fails = 0
names = sorted(oracle)
for name in names:
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
        fails += 1; continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1; continue
    # exact value compare, same spirit as a hash compare
    neq = (g.astype(str) != w.astype(str))
    if neq.any().any():
        bad = neq.any(axis=1)
        idx = list(g.index[bad])[:3]
        print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; sample:")
        for i in idx:
            print("  spark:", dict(g.loc[i]))
            print("  duck :", dict(w.loc[i]))
        fails += 1; continue
    print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")

missing = [n for n in glob.glob(f"{OUT}/*/") if n.split('/')[-2] not in oracle]
for m in missing:
    n = m.split('/')[-2]
    k = len(glob.glob(f"{m}/*.parquet"))
    print(f"INFO rows-only query {n}: {'has output' if k else 'NO OUTPUT'}")
print(f"\n{len(names)-fails}/{len(names)} oracle queries pass")
sys.exit(1 if fails else 0)
