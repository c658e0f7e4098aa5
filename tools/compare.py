#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query ...]

For each query dir under verify_out_dir that has an oracle entry in
oracle_sql.json: load the Spark parquet, run the oracle SQL in DuckDB
against views over the sf parquet tables, then compare row count, sorted
column names, and cell values (rows sorted by all columns, columns sorted
by name) like the driver does.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    # Sort RAW like the driver does — an array-typed output column must
    # crash here exactly as it crashes in the driver's comparator
    # (pandas lexsort: "unhashable type: numpy.ndarray"), so the local
    # pre-flight is a faithful replica. Stringify only AFTER the sort.
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    def cell(x):
        if isinstance(x, float):
            if math.isnan(x):
                return "NaN"
            return repr(round(x, 9))
        return repr(x)
    return df.apply(lambda c: c.map(cell))

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        errs = []
        if len(spark) != len(oracle):
            errs.append(f"rows {len(spark)} vs {len(oracle)}")
        if sorted(spark.columns) != sorted(oracle.columns):
            errs.append(f"cols {sorted(spark.columns)} vs {sorted(oracle.columns)}")
        if not errs:
            a, b = norm(spark), norm(oracle)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                idx = diff[diff].index[:3]
                errs.append("values differ, e.g. " + "; ".join(
                    f"spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}"
                    for i in idx))
        if errs:
            print(f"FAIL {name}: " + " | ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
