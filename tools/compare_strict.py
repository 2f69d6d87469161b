#!/usr/bin/env python3
"""Dtype-strict replica of the driver's t2 hash comparison (dev-only).

Mimics the driver more closely than compare.py: loads both sides into
pandas, sorts columns by name and rows by all columns (this is where raw
array cells raise "unhashable type"), then hashes the stringified frame.

Strictness comes from comparing DECLARED type classes per column — the
parquet (arrow) schema on the Spark side vs the DuckDB relation types on
the oracle side — instead of sniffing pandas dtypes or cell values:
DuckDB's .df() materializes DATE as midnight datetime64, so a value-level
check cannot tell a real DATE from a TIMESTAMP that happens to fall at
00:00:00, and pandas width promotion hides int32/int64 only when we want
it to (same class). Only columns whose BOTH declared classes are "date"
are normalized to ISO dates before hashing.

    python3 tools/compare_strict.py <sfDir> <verifyOutDir> [name ...]
"""
import datetime
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def arrow_class(t):
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return "other"


def duck_class(type_str):
    t = type_str.upper()
    if t.endswith("[]"):
        return "list"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "STRING"):
        return "string"
    if t == "BLOB":
        return "binary"
    return "other"


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def frame_hash(df, date_cols):
    # stringify cell-by-cell: float formatting / object reprs must
    # match; same-class width differences (int32 vs int64) hash equal.
    def cell(v, is_date):
        if v is None or v != v:  # None or NaN
            return "<null>"
        if isinstance(v, float):
            return repr(float(v))
        if is_date:
            # declared DATE on both sides; DuckDB materializes it as a
            # midnight Timestamp, Spark parquet as datetime.date
            if isinstance(v, pd.Timestamp):
                return str(v.date())
            if isinstance(v, datetime.date):
                return str(v)
        return str(v)
    cols = list(df.columns)
    flags = [c in date_cols for c in cols]
    return [tuple(cell(v, f) for v, f in zip(row, flags))
            for row in df.itertuples(index=False)]


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
            tbl = pq.read_table(files[0])
            s_classes = {f.name: arrow_class(f.type) for f in tbl.schema}
            rel = con.sql(sql)
            d_classes = {c: duck_class(str(t))
                         for c, t in zip(rel.columns, rel.types)}
            s_df = canon(tbl.to_pandas())
            d_df = canon(rel.df())
        except Exception as e:
            print(f"ERR {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(s_df.columns) != list(d_df.columns):
            print(f"FAIL {name}: cols spark={list(s_df.columns)} duckdb={list(d_df.columns)}")
            n_fail += 1
            continue
        mismatched = [(c, s_classes[c], d_classes[c])
                      for c in s_df.columns if s_classes[c] != d_classes[c]]
        if mismatched:
            print(f"FAIL {name}: dtype class mismatch {mismatched}")
            n_fail += 1
            continue
        date_cols = {c for c in s_df.columns if s_classes[c] == "date"}
        a, b = frame_hash(s_df, date_cols), frame_hash(d_df, date_cols)
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
