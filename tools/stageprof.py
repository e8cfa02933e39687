#!/usr/bin/env python
"""Stage-level attribution for one registry query (guide §1.1 without
the UI, which is disabled in this sandbox): run the query with the
event log enabled, then print per-stage wall time, task time, and the
first line of the call site — the empirical 'where is the time going'
loop.

Usage: python tools/stageprof.py <query> [--sf DIR] [--count]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    from degdb_spark.queries import registry
    from degdb_spark.session import get_spark

    spark = get_spark(
        app_name=f"stageprof-{args.query}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    reg = registry()
    # warm attempt 1 (discard), measure attempt 2 after cache isolation
    for i in range(2):
        if i:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
        df = reg[args.query].spark(spark, args.sf)
        if args.count:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()

    stages = []
    t0 = None
    paths = [
        p
        for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(evdir, pat))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path, errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    if sub is None or comp is None:
                        continue
                    stages.append(
                        {
                            "id": si["Stage ID"],
                            "ms": comp - sub,
                            "sub": sub,
                            "tasks": si["Number of Tasks"],
                            "name": si["Stage Name"].split("\n")[0][:80],
                        }
                    )
    # keep only stages from the SECOND (measured) attempt: those
    # submitted in the last `wall` seconds of the run
    if stages:
        end = max(s["sub"] + s["ms"] for s in stages)
        cut = end - wall * 1000 - 500
        stages = [s for s in stages if s["sub"] >= cut]
    stages.sort(key=lambda s: -s["ms"])
    total = sum(s["ms"] for s in stages)
    print(f"{args.query}: wall {wall:.2f}s, {len(stages)} stages, "
          f"sum-of-stage-wall {total/1000:.2f}s (gaps = driver/planning)")
    for s in stages[: args.top]:
        print(f"  {s['ms']:6d} ms  {s['tasks']:3d} tasks  [{s['id']}] {s['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
