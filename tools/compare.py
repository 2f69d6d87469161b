#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev-only tooling;
not part of the shipped library). Usage:

    python3 tools/compare.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, runs each query in DuckDB against the
parquet tables in <sfDir>, and compares with the Spark output parquet at
<verifyOutDir>/<name>/ — columns sorted by name, rows sorted by all
columns, exact value equality.
"""
import decimal
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [sorted(cols)] + out


def norm(v):
    # Numeric values are TYPE-TAGGED: the driver hashes dtype+value, so
    # 53.0 (Spark DOUBLE) must NOT equal 53 (oracle BIGINT) here —
    # Python's cross-type `==` masked exactly that in rounds 6 and 7.
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        a, b = canon(s_rows, s_cols), canon(d_rows, d_cols)
        if a == b:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if a[0] != b[0]:
                print(f"FAIL {name}: columns spark={a[0]} duckdb={b[0]}")
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rowcount spark={len(a)-1} duckdb={len(b)-1}")
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a[1:], b[1:])) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows; first 3:")
            for i, x, y in diffs[:3]:
                print(f"  row {i}: spark={x}")
                print(f"  row {i}: duck ={y}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
