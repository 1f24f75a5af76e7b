#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark result) and
oracle_sql.json, runs each oracle in DuckDB with the harness tables
registered under bare names, then compares: schema (column names), row
count, and sorted-row value hash (columns sorted by name, rows sorted).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values for stable compare
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            # the DRIVER's compare crashes on array cells (pandas sort over
            # unhashable values) — surface that locally instead of tolerating
            raise TypeError("array-valued cell: driver compare cannot sort these")
        try:
            if v is pd.NaT or (v is not None and pd.isna(v)):
                return "NULL"
        except (TypeError, ValueError):
            pass
        return str(v)
    out = df.apply(lambda c: c.map(norm))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*") if "." not in d.split("/")[-1])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)"); continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        try:
            s, d = canon(spark_df), canon(duck_df)
        except TypeError as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        if not s.equals(d):
            neq = (s != d)
            bad_cols = [c for c in s.columns if neq[c].any()]
            idx = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch cols={bad_cols} first_row={idx}")
            print("  spark:", s.iloc[idx].to_dict())
            print("  duck :", d.iloc[idx].to_dict())
            n_fail += 1; continue
        print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
