#!/usr/bin/env python3
"""Local self-check approximating the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each <name>.parquet dir under verifyOutDir, runs the matching SQL
from oracle_sql.json in DuckDB (views over <sfDir>/*.parquet), sorts
columns by name and rows by value, and compares cell-by-cell.
Driver-side python (duckdb/pyarrow/pandas) — NOT part of the Scala
library; dev tooling only.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes: floats rounded at 9 places to kill representation noise
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name.startswith("_"):
            continue  # _data/ = side dumps (corpus table), not results
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"  ?  {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f" ERR {name}: oracle failed: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"  ok {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex).splitlines()[-1] if str(ex) else ex}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
