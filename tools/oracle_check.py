#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness check: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same sf dir and
compare (columns sorted by name, rows sorted, exact values).

Usage: oracle_check.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint64", "int16", "int8"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
            df[c] = df[c].apply(lambda b: b.hex())
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = norm(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
    try:
        exp = norm(con.sql(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}")); continue
    if got.shape != exp.shape:
        fails.append((name, f"shape differs: {got.shape} vs {exp.shape}")); continue
    # exact compare, incl. dtype-insensitive float bit equality
    bad_cols = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = (~eq).idxmax()
            bad_cols.append(f"{c}[row{i}]: {a[i]!r} != {b[i]!r} (dtypes {a.dtype}/{b.dtype})")
    if bad_cols:
        fails.append((name, "; ".join(bad_cols[:3])))
    else:
        print(f"OK   {name}  rows={len(got)}")
missing = [q for q in (set(os.listdir(out_dir)) - set(oracle) - {"oracle_sql.json"})]
for name, why in fails:
    print(f"FAIL {name}: {why}")
if missing:
    print("no-oracle (rows-only):", sorted(missing))
sys.exit(1 if fails else 0)
