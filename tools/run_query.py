#!/usr/bin/env python
"""Run any suite query by name and show its result (and optionally plan).

Usage:
    python tools/run_query.py <query> [--sf DIR] [--explain] [--rows N]
    python tools/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_flink_repository_analytics_spark.queries import suite
from lab_flink_repository_analytics_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="queries() entry name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="table dir")
    ap.add_argument("--explain", action="store_true", help="print formatted plan")
    ap.add_argument("--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    qs = suite.queries()
    if args.list or not args.query:
        for name in qs:
            oracle = "oracle" if name in suite.oracle_sql() else "rows-only"
            print(f"{name:28s} [{oracle}]")
        return
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r} — try --list")

    spark = get_spark(app_name=f"run-{args.query}")
    df = qs[args.query](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)
    print(f"rows: {df.count()}")


if __name__ == "__main__":
    main()
