#!/usr/bin/env python3
"""DuckDB half of the fuzz differential (FuzzSpec's expectations).

Usage: python3 tools/fuzz_expected.py <fuzz_queries.json> <sf_dir> <out.json>

Runs every generated query in DuckDB over views of the sf parquet
tables and writes {id: {"rows": N, "hash": sha256-of-canonical-grid}}.
The canonical-grid rules MUST stay in lockstep with FuzzGen.canonical:
columns sorted by name, cells: NULL->"NULL", bool->true/false (bool
checked BEFORE int: python bool is an int subclass), float->"%.6f"
(-0.0 normalized), everything else str(); cells joined with \\x01,
rows sorted as strings, joined with \\n, header line of sorted column
names first.
"""
import datetime
import hashlib
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        # canonical form = epoch millis, naive values treated as UTC
        # (DuckDB returns naive; Spark's side uses Timestamp.getTime) —
        # keep in lockstep with FuzzGen.cell
        return str(int(v.replace(tzinfo=datetime.timezone.utc)
                       .timestamp() * 1000))
    return str(v)


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    header = "\x01".join(cols[i] for i in order)
    body = sorted("\x01".join(cell(r[i]) for i in order) for r in rows)
    return header + "\n" + "\n".join(body)


def main():
    queries_path, sf_dir, out_path = sys.argv[1:4]
    queries = json.load(open(queries_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out = {}
    for qid in sorted(queries):
        cur = con.execute(queries[qid])
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        grid = canonical(cols, rows)
        out[qid] = {
            "rows": len(rows),
            "hash": hashlib.sha256(grid.encode("utf-8")).hexdigest(),
        }
    json.dump(out, open(out_path, "w"), indent=0, sort_keys=True)
    print(f"wrote {len(out)} expectations to {out_path}")


if __name__ == "__main__":
    main()
