#!/usr/bin/env python
"""Count()-materialized timing for ONE registry query in a fresh JVM.

For queries whose full answer is too big to collect (the round-9 verdict
task 4 case: ``jaccard_blocked_pairs`` at sf10 is a ~1.6B-row answer), a
``count()`` executes the whole plan — scan, shuffle, join, filter — and
books wall time plus the EXACT output cardinality without materializing
the rows anywhere.  One (query, sf_dir) per invocation; prints one JSON
line with runs, median, rows_out, and the host-speed canary.

Usage: python tools/bench_count_query.py QUERY [sf_dir] [--reps N]
           [--no-warmup]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument(
        "--no-warmup",
        action="store_true",
        help="skip the unmeasured warm-up execution (for very long runs "
        "where one execution IS the budget; the single rep then includes "
        "JIT/codegen ramp and says so in the artifact)",
    )
    args = ap.parse_args()

    from lab_flink_repository_analytics_spark.queries import suite
    from lab_flink_repository_analytics_spark.session import get_spark, run_canary

    qs = suite.queries()
    if args.query not in qs:
        print(f"unknown query: {args.query}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(app_name=f"count-{args.query}")
    canary = run_canary(spark)

    def run_once():
        spark.catalog.clearCache()
        t0 = time.time()
        n = qs[args.query](spark, args.sf_dir).count()
        return time.time() - t0, n

    rows_out = None
    if not args.no_warmup:
        _, rows_out = run_once()
    runs = []
    for _ in range(args.reps):
        dt, n = run_once()
        rows_out = n
        runs.append(round(dt, 3))
    out = {
        "query": args.query,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "warmed_up": not args.no_warmup,
        "runs": runs,
        "median": round(statistics.median(runs), 3),
        "rows_out": rows_out,
        "canary": canary,
        "canary_end": run_canary(spark),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
