#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python tools/check_correctness.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table in
<sfDir> as a DuckDB view, runs each oracle query, and compares it to the
engine output parquet at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted by all columns, values compared exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = n_skip = 0
    # an oracle entry with NO parquet output = a query that errored in
    # Verify (it logs and continues) — count it as a failure, never skip it
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL  {name}: no engine output (query errored in Verify)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        engine = pd.read_parquet(d)
        if name not in oracle:
            print(f"SKIP  {name} (no oracle; rows={len(engine)})")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = norm(engine), norm(want)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            eq = a.astype(object).equals(b.astype(object))
        except Exception:
            eq = False
        if not eq:
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            print(f"FAIL  {name}: value mismatch in {int(diff.sum())}/{len(a)} rows")
            print("engine:", a[diff].head(3).to_dict("records"))
            print("oracle:", b[diff].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
