#!/usr/bin/env python
"""Driver-side planning-cost profile for every registry query.

For each query: ``build_sec`` (Python DataFrame construction — includes
any derived-state builds the query triggers on first touch) and
``plan_sec`` (analyze + optimize + physical planning via
``queryExecution().executedPlan()``), with NO execution.  Separates the
fixed driver cost every call pays at EVERY scale factor from the
distributed work — guide §1's "first-principles" decomposition for a
suite whose sf0.1 inputs are ~17 MB, where planning can dominate wall.

Two passes are reported: ``cold`` (first build in the session — pays
one-off memo builds) and ``warm`` (second build of the same query —
the steady per-call planning cost; memos hot, Catalyst caches hot).

Usage: python tools/profile_plan_time.py [sf_dir] [--json OUT] [q1 q2 ..]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    only = set(args)

    from lab_flink_repository_analytics_spark.queries import suite
    from lab_flink_repository_analytics_spark.session import get_spark, run_canary

    spark = get_spark(app_name="plan-profile")
    canary = run_canary(spark)
    qs = suite.queries()
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        for phase in ("cold", "warm"):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            row[phase] = {
                "build_sec": round(t1 - t0, 3),
                "plan_sec": round(t2 - t1, 3),
            }
        report[name] = row
        print(
            f"{name:38s} cold build {row['cold']['build_sec']:6.2f}"
            f" plan {row['cold']['plan_sec']:6.2f} | warm build"
            f" {row['warm']['build_sec']:6.2f} plan {row['warm']['plan_sec']:6.2f}",
            flush=True,
        )
    total_warm = sum(
        r["warm"]["build_sec"] + r["warm"]["plan_sec"] for r in report.values()
    )
    out = {
        "sf_dir": sf_dir,
        "canary": canary,
        "total_warm_driver_sec": round(total_warm, 2),
        "queries": report,
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(f"TOTAL warm driver-side sec: {total_warm:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
