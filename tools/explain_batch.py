#!/usr/bin/env python
"""Capture .explain('formatted') for a set of registry queries into
files — the plans/r13/<name>_{before,after}.txt evidence the round
deliverables require.

Usage: python tools/explain_batch.py name1,name2 --out plans/r13 --suffix before [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    reg = registry()
    names = [n for n in args.names.split(",") if n]
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="explain_batch")
    for name in names:
        df = reg[name].spark(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
