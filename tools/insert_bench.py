#!/usr/bin/env python
"""Insert-throughput micro-benchmarks, mirroring the reference's only
benchmark harness (/root/reference/triplestore/triplestore_test.go:
237-279: single-triple insert and 1000-triple batch insert).

Spark is a batch engine — the single-row path is intentionally
pathological (a full anti-join per row) and reported for parity, not
as a recommendation; batch insert is the real path.

Usage: python tools/insert_bench.py [--rows 10000] [--batch 1000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--single", type=int, default=20, help="single-row inserts to time")
    args = ap.parse_args()

    from degdb_spark.operators.triplestore import TripleStore
    from degdb_spark.session import get_spark

    spark = get_spark(app_name="insert_bench")

    from pyspark.sql import functions as F

    def rows(n, offset=0):
        # the reference's bench shape: ("foo"+i, subject, object) —
        # generated JVM-side so the bench measures the insert path, not
        # Py4J row serialization
        return spark.range(n).select(
            F.concat(F.lit("foo"), (F.col("id") + offset).cast("string")).alias("subj"),
            F.lit("some subject! woooooo").alias("pred"),
            F.lit("toasters are delicious").alias("obj"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("author"),
            F.lit(None).cast("string").alias("sig"),
            F.lit(None).cast("timestamp").alias("created"),
        )

    # batch inserts of args.batch rows
    store = TripleStore(spark)
    t0 = time.time()
    total = 0
    for b in range(args.rows // args.batch):
        total += store.insert(rows(args.batch, offset=b * args.batch))
    batch_secs = time.time() - t0
    assert total == args.rows

    # single-row inserts (pathological on purpose — parity with the
    # reference's BenchmarkInsertTriple)
    store2 = TripleStore(spark)
    t0 = time.time()
    for i in range(args.single):
        store2.insert(rows(1, offset=i))
    single_secs = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "insert_throughput",
                "batch_rows_per_sec": round(args.rows / batch_secs, 1),
                "batch_size": args.batch,
                "single_inserts_per_sec": round(args.single / single_secs, 2),
                "unit": "rows/sec",
            }
        )
    )


if __name__ == "__main__":
    main()
