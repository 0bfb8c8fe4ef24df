#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads each <out>/<query>/ parquet written by graft.Verify, runs the matching
SQL from <out>/oracle_sql.json in DuckDB over views of the sf tables, sorts
columns by name (as the driver does) and compares shape + values.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
    return df


def vals_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(vals_equal(x, y) for x, y in zip(la, lb))
    return a == b


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    got, exp = canon(got), canon(exp)
    if list(got.columns) != list(exp.columns):
        return f"COLS  got={list(got.columns)} exp={list(exp.columns)}"
    if got.shape != exp.shape:
        return f"SHAPE got={got.shape} exp={exp.shape}"
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            if not vals_equal(g, e):
                return f"VAL   col={c} row={i} got={g!r} exp={e!r}"
    return ""


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = set(sys.argv[3:]) if len(sys.argv) > 3 else None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        diff = compare(name, got, exp)
        if diff:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
