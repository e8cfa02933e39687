#!/usr/bin/env python
"""Local replay of the driver's t2 duckdb-oracle correctness gate.

For every query in the registry with an oracle: run the Spark
implementation AND the DuckDB SQL on the same parquet tables, sort
columns by name, sort rows, and compare row count + schema + values.
Mirrors the driver's comparator closely enough to catch name/round/
semantics drift before the round gate does.

Usage: python tools/oracle_check.py [--sf DIR] [--only name1,name2] [--window] [-v]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalise cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.6f}".rstrip("0").rstrip(".")
        if isinstance(v, pd.Timestamp):
            return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--window",
        action="store_true",
        help="check exactly the driver's 50-slot correctness window "
        "(the first 50 registry entries, in iteration order)",
    )
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duck_connect(args.sf)

    if args.window:
        names = list(registry().keys())[:50]  # the driver's exact view
    else:
        names = sorted(registry().keys())
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        q = registry()[name]
        t0 = time.time()
        try:
            sdf = q.spark(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        cs, co = canon(sdf), canon(odf)
        if list(cs.columns) != list(co.columns):
            print(f"FAIL  {name}: columns {list(cs.columns)} != {list(co.columns)}")
            n_fail += 1
            continue
        dt_diff = {
            c: (str(sdf.dtypes[c]), str(odf.dtypes[c]))
            for c in sdf.columns
            if c in odf.columns and str(sdf.dtypes[c]) != str(odf.dtypes[c])
        }
        if dt_diff:
            print(f"FAIL  {name}: dtype mismatch {dt_diff}")
            n_fail += 1
            continue
        if len(cs) != len(co):
            print(f"FAIL  {name}: rows {len(cs)} != {len(co)}")
            n_fail += 1
            continue
        if not cs.equals(co):
            diff = (cs != co).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(cs)} mismatched rows")
            if args.verbose:
                idx = diff[diff].index[:5]
                for i in idx:
                    print(f"  spark : {cs.loc[i].to_dict()}")
                    print(f"  oracle: {co.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(cs)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)} queries at {args.sf}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
