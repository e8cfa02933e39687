#!/usr/bin/env python
"""Dump the physical plan of any registry query.

Usage: python tools/explain.py <query_name> [--sf DIR] [--mode formatted|simple|cost]
       python tools/explain.py --list
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--mode", default="formatted")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    from degdb_spark.queries import registry

    reg = registry()
    if args.list or not args.query:
        for name, q in sorted(reg.items()):
            print(f"{name:38s} {'oracle' if q.oracle else 'rows-only'}")
        return 0
    if args.query not in reg:
        print(f"unknown query {args.query!r}; --list to enumerate", file=sys.stderr)
        return 1

    from degdb_spark.session import get_spark

    spark = get_spark(app_name="explain")
    df = reg[args.query].spark(spark, args.sf)
    df.explain(args.mode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
