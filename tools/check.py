#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the raw
tables, sorts columns by name, and compares row counts + values.
"""
import json
import os
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
checked = 0
for name, sql in sorted(oracle.items()):
    # a targeted Verify run dumps a subset; silently skip the rest
    if not os.path.isdir(f"{out}/{name}"):
        continue
    checked += 1
    try:
        spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        duck_df = con.sql(sql).df()
        # driver sorts columns by name before hashing
        spark_df = spark_df[sorted(spark_df.columns)]
        duck_df = duck_df[sorted(duck_df.columns)]
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            fails += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            fails += 1
            continue
        # dtype divergence (e.g. DuckDB HUGEINT -> pandas float64 vs
        # Spark int64) hashes as 512.0 vs 512 on the driver even when
        # the values compare equal here — treat float-vs-int as FAIL
        dtfail = None
        for c in spark_df.columns:
            ka, kb = spark_df[c].dtype.kind, duck_df[c].dtype.kind
            if ka != kb and {ka, kb} <= {"i", "u", "f"} and "f" in (ka, kb):
                dtfail = (c, spark_df[c].dtype, duck_df[c].dtype)
                break
        if dtfail:
            print(f"FAIL {name}: dtype col {dtfail[0]} spark={dtfail[1]} duck={dtfail[2]} (driver hash diverges)")
            fails += 1
            continue
        # order-insensitive value compare (sort rows by all columns)
        a = spark_df.sort_values(by=list(spark_df.columns)).reset_index(drop=True)
        b = duck_df.sort_values(by=list(duck_df.columns)).reset_index(drop=True)
        mismatch = None
        for c in a.columns:
            av, bv = a[c], b[c].astype(a[c].dtype, errors="ignore") if hasattr(b[c], "astype") else b[c]
            try:
                eq = (av == bv) | (av.isna() & bv.isna())
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                mismatch = (c, av[idx], bv[idx])
                break
        if mismatch:
            print(f"FAIL {name}: col {mismatch[0]} spark={mismatch[1]!r} duck={mismatch[2]!r}")
            fails += 1
        else:
            print(f"OK   {name}: {len(a)} rows")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1

skipped = len(oracle) - checked
tail = f" ({skipped} not dumped, skipped)" if skipped else ""
print(f"\n{checked - fails}/{checked} oracle queries match{tail}")
sys.exit(1 if fails else 0)
