#!/usr/bin/env python
"""Sequential per-query timing for a subset of suite queries.

Usage: python tools/time_queries.py q1 q2 ... [--sf DIR] [--reps N]

Fresh session, sequential (no pool queueing) — isolates plan cost from
bench.py's FAIR-pool concurrency so before/after comparisons of a single
query are apples-to-apples.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_flink_repository_analytics_spark.queries import suite
from lab_flink_repository_analytics_spark.session import get_spark, release_persist_slots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark(app_name="time-queries")
    qs = suite.queries()
    out = {}
    for name in args.queries:
        fn = qs[name]
        best = None
        for _ in range(args.reps):
            release_persist_slots()
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
