#!/usr/bin/env python
"""Registry-wide executed-plan scan audit.

Builds every registry query against --sf (no collect beyond what eager
checkpoints run) and reports how many `FileScan parquet` nodes the
EXECUTED plan carries — the quick detector for the replanned-consumer
bug class: a lazy frame read by two+ consumers gets its whole upstream
(including corpus scans) planned once per consumer. Found and fixed
this way in round 6: DSIR's count state (3 scans -> 1), the
histogram-quantile bin tables (12 -> 0 post-checkpoint), degrees()'s
union-of-endpoints (14 -> 7 via a single-generator explode).

High counts are not automatically bugs — estimate-vs-exact evaluation
queries re-read by design, TPC-H correlated shapes scan dims twice,
and 7 scans can just mean one pass over the 7-table triple union.
Read the plan before "fixing".

Usage: python tools/scan_audit.py [--sf DIR] [--min N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--min", type=int, default=4)
    args = ap.parse_args()

    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    spark = get_spark(app_name="scan_audit")
    rows = []
    for name, q in registry().items():
        try:
            df = q.spark(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((plan.count("FileScan parquet"), name))
        except Exception as e:  # keep auditing the rest
            print(f"ERR   {name}: {str(e)[:100]}")
    rows.sort(reverse=True)
    for n, name in rows:
        if n >= args.min:
            print(f"{n:3d}  {name}")
    print(f"done: {len(rows)} queries audited at {args.sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
