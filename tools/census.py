#!/usr/bin/env python
"""Construction-vs-execution census (optimization guide §1): for each
query, time (a) the registry call that BUILDS the DataFrame — plan
construction, py4j chatter, and any in-plan driver collects (trained
models, index builds) — and (b) the count() action that EXECUTES it.
The bench's per-entry number is a+b; this tool shows which side to
attack. Uses the bench's warm-up and cache-isolation discipline.

Usage: python tools/census.py name1,name2,... [--sf DIR] [--best-of N]
       python tools/census.py --headline [--top N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="?", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("--headline", action="store_true")
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra spark conf k=v (repeatable) for A/B experiments",
    )
    args = ap.parse_args()

    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    reg = registry()
    if args.headline:
        from bench import HEADLINE

        names = list(HEADLINE)
    else:
        names = [n for n in args.names.split(",") if n]
    for n in names:
        if n not in reg:
            print(f"unknown query {n!r}", file=sys.stderr)
            return 1

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark(app_name="census", extra_conf=extra or None)
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()
    spark.sql(
        "select aggregate(zip_with(array(1.0d,2.0d), array(3.0d,4.0d),"
        " (a,b)->a*b), 0d, (acc,x)->acc+x) v"
    ).count()

    rows = []
    for name in names:
        best = None
        for i in range(args.best_of):
            if i:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            df = reg[name].spark(spark, args.sf)
            t1 = time.time()
            df.count()
            t2 = time.time()
            rec = (round(t1 - t0, 3), round(t2 - t1, 3), round(t2 - t0, 3))
            if best is None or rec[2] < best[2]:
                best = rec
        rows.append((name, *best))
        print(
            f"{name:40s} construct={best[0]:7.3f}  exec={best[1]:7.3f}"
            f"  total={best[2]:7.3f}",
            flush=True,
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    tot_c = sum(r[1] for r in rows)
    tot_e = sum(r[2] for r in rows)
    print(
        f"{'TOTAL':40s} construct={tot_c:7.3f}  exec={tot_e:7.3f}"
        f"  total={tot_c + tot_e:7.3f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
