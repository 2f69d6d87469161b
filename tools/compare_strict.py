#!/usr/bin/env python3
"""Dtype-strict replica of the driver's t2 hash comparison (dev-only).

Mimics the driver more closely than compare.py: loads both sides into
pandas, sorts columns by name and rows by all columns (this is where raw
array cells raise "unhashable type"), then hashes the stringified frame.
Catches dtype-class mismatches (e.g. DuckDB HUGEINT -> object dtype) that
value-level comparison misses.

    python3 tools/compare_strict.py <sfDir> <verifyOutDir> [name ...]
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def frame_hash(df):
    # stringify cell-by-cell so int32 vs int64 compare equal but
    # float formatting / object reprs must match
    def cell(v):
        if v is None or v != v:  # None or NaN
            return "<null>"
        if isinstance(v, float):
            return repr(float(v))
        # DuckDB DATE arrives as midnight Timestamp; Spark parquet as
        # datetime.date — the driver normalizes these, so do we.
        if isinstance(v, pd.Timestamp) and v.time() == pd.Timestamp(0).time():
            return str(v.date())
        return str(v)
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING {name}")
            n_fail += 1
            continue
        try:
            s_df = canon(pd.read_parquet(files[0]))
            d_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERR {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(s_df.columns) != list(d_df.columns):
            print(f"FAIL {name}: cols spark={list(s_df.columns)} duckdb={list(d_df.columns)}")
            n_fail += 1
            continue
        a, b = frame_hash(s_df), frame_hash(d_df)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows; first diffs: {diffs}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


main()
