#!/usr/bin/env python
"""Isolated per-query timing with the noop sink (optimization guide
§1.4): computes every column of every row and discards it, so the
measurement is the transformation, not the sink or the count()
column-pruning shortcut. NOT the driver metric — bench.py keeps the
count() methodology for cross-round comparability; this tool is for
isolating one query while iterating on its plan.

Usage: python tools/qtime.py name1,name2 [--sf DIR] [--best-of N] [--count]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument(
        "--count", action="store_true",
        help="time .count() instead of the noop sink (bench.py's action)",
    )
    args = ap.parse_args()

    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    reg = registry()
    names = [n for n in args.names.split(",") if n]
    for n in names:
        if n not in reg:
            print(f"unknown query {n!r}", file=sys.stderr)
            return 1

    spark = get_spark(app_name="qtime")
    # same warm-up as bench.py so numbers are comparable to its entries
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()
    spark.sql(
        "select aggregate(zip_with(array(1.0d,2.0d), array(3.0d,4.0d),"
        " (a,b)->a*b), 0d, (acc,x)->acc+x) v"
    ).count()
    spark.sql(
        "with t as (select * from values (1,'a'),(2,'b') u(k,s)) "
        "select k, row_number() over (partition by s order by k) r, n "
        "from t join (select k, count(*) n from t group by k) g using (k)"
    ).count()

    for name in names:
        attempts = []
        for i in range(args.best_of):
            if i:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            df = reg[name].spark(spark, args.sf)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            attempts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(attempts):.3f}s attempts={attempts}")
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return 0


if __name__ == "__main__":
    sys.exit(main())
