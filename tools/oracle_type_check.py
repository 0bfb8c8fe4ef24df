#!/usr/bin/env python3
"""DESCRIBE-sweep guard: no oracle may ship a HUGEINT/DECIMAL final column.

The driver's hasher is value-type-sensitive: DuckDB types sum(BIGINT) as
HUGEINT, which its pandas bridge converts to float64, while Spark's LongType
sum arrives int64 — value-identical answers then hash-mismatch (this was
q_layout_hilbert in round 17, the only red row of the round). This tool
DESCRIBEs every oracle query through DuckDB and fails if any FINAL column is
HUGEINT- or DECIMAL-typed; intermediate CTE/subquery types are fine (they
never reach the hasher).

Usage: python3 tools/oracle_type_check.py <oracle_sql.json> [sf_dir]
  <oracle_sql.json> — a {query_name: sql} map (graft.Verify dumps one; the
  OracleTypeSpec ScalaTest writes one straight from SparkEntry.oracleSql).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sql_json = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(sql_json))
    bad = []
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:  # an undescribable oracle is itself a failure
            bad.append((name, f"DESCRIBE failed: {e}"))
            continue
        for row in desc:
            col, typ = row[0], str(row[1]).upper()
            if "HUGEINT" in typ or typ.startswith("DECIMAL"):
                bad.append((name, f"final column {col} is {row[1]}"))
    if bad:
        for n, m in bad:
            print(f"FAIL {n}: {m}")
        print(f"== {len(bad)} hash-unstable oracle column(s) ==")
        sys.exit(1)
    print(f"OK {len(oracles)} oracles described; no HUGEINT/DECIMAL final columns")


if __name__ == "__main__":
    main()
