#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran (or runs
it with --run). Registers every parquet in sf_dir as a DuckDB view, runs each
oracle_sql.json entry, and compares against the Spark parquet dump:
columns sorted by name, rows sorted by all columns, exact value equality.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        try:
            got = canon(pd.concat(
                [pd.read_parquet(p) for p in sorted(glob.glob(f"{spark_dir}/*.parquet"))],
                ignore_index=True))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/run error: {e}")
            n_fail += 1
            continue
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        else:
            # exact (hash-style) compare; report first diff cell.
            # dtype mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
            # hash-fails on the driver even when values compare numerically
            # equal, so treat it as a failure here too.
            for c in got.columns:
                a, b = got[c], want[c]
                # int-width mismatches (int32 vs int64) hash identically on
                # the driver; int-vs-float (2 vs 2.0) and bool-vs-int
                # (True vs 1) do not.
                ka, kb = a.dtype.kind, b.dtype.kind
                norm = {"u": "i"}
                if norm.get(ka, ka) != norm.get(kb, kb):
                    status.append(f"col {c} dtype {a.dtype} != {b.dtype}")
                    break
                try:
                    eq = (a.fillna("\0NULL") == b.fillna("\0NULL")) \
                        if a.dtype == object else ((a == b) | (a.isna() & b.isna()))
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not bool(eq.all()):
                    i = int((~eq).idxmax())
                    status.append(f"col {c} row {i}: {a[i]!r} != {b[i]!r}")
                    break
        if status:
            print(f"FAIL {name}: {status[0]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
