#!/usr/bin/env python
"""Benchmark harness: runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <wall-clock sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "parallelism": N,
     "sum_sec": <sum of per-query latencies>}

Each query is fully materialized via the noop sink (no driver collect,
no result truncation — measures the whole plan incl. the final exchange).

Queries are independent, so the suite submits them from
``$SPARK_GRAFT_BENCH_PARALLEL`` driver threads (default 8; set 1 for
sequential latency measurement).  Spark's scheduler runs concurrent jobs
against the shared executor pool — exactly how a shared 1000-executor
cluster serves a query workload — under FAIR scheduling so small queries
aren't convoyed behind large ones.  ``value`` is suite wall-clock
(throughput); per-query numbers are end-to-end latencies under that
concurrency and include queueing.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab_flink_repository_analytics_spark.queries import suite
from lab_flink_repository_analytics_spark.session import get_spark, run_canary


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    par = int(os.environ.get("SPARK_GRAFT_BENCH_PARALLEL", "8"))

    spark = get_spark(
        app_name="bench", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    # warm the JVM once so per-query numbers measure the plans, not session
    # startup: parquet footers of every table + one codegen'd shuffle
    from lab_flink_repository_analytics_spark.session import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).collect()
    from pyspark.sql import functions as F

    (
        spark.range(100_000)
        .groupBy((F.col("id") % 8).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    def run_one(item):
        name, fn = item
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            # transient local-mode hiccup (e.g. shuffle temp file cleanup
            # racing a concurrent job): one retry, then let it raise
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return name, time.time() - t0

    # host-speed canary (round-9): constant synthetic job timed before and
    # after the suite so cross-round comparisons can separate host drift
    # from code regressions (see session.run_canary)
    canary_start = run_canary(spark)
    items = list(suite.queries().items())
    times: dict[str, float] = {}
    # shared derived-state accounting (round 11): whichever query first
    # needs a session-shared build (LSH candidate pairs, doc-term tf,
    # BPE model, ...) pays it inside its own latency; report each build
    # as an explicit "_shared:<name>" pseudo-entry so the 6 sharing
    # queries' numbers stay comparable across rounds.  Additions-only:
    # every pre-existing field keeps its meaning, and sum_sec still sums
    # REAL query latencies (shared time is already inside them — adding
    # the pseudo-entries would double-count).
    from lab_flink_repository_analytics_spark.session import (
        derived_build_seconds,
    )

    shared_before = derived_build_seconds()
    wall0 = time.time()
    if par <= 1:
        for item in items:
            name, dt = run_one(item)
            times[name] = round(dt, 3)
    else:
        with cf.ThreadPoolExecutor(max_workers=par) as ex:
            for name, dt in ex.map(run_one, items):
                times[name] = round(dt, 3)
    wall = time.time() - wall0
    canary_end = run_canary(spark)
    sum_sec = round(sum(times.values()), 3)
    n_real = len(times)
    for name, dt in derived_build_seconds().items():
        delta = dt - shared_before.get(name, 0.0)
        if delta > 0.0005:
            times[f"_shared:{name}"] = round(delta, 3)

    summary = {
        "metric": "suite_total_runtime",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "parallelism": par,
        "sum_sec": sum_sec,
        "canary_start": canary_start,
        "canary_end": canary_end,
    }
    # Output contract (round 7, single line): stdout carries EXACTLY ONE
    # JSON line, sized to fit whole inside the driver's ~2000-char tail
    # capture so BENCH_r*.json parses standalone (the r6 two-line form
    # left a front-truncated fragment of the full map ahead of the
    # compact line).  The complete per-query map is persisted verbatim in
    # BENCH_SUMMARY.json; the stdout line keeps every headline field and
    # the slowest per-query entries that fit, with an explicit pointer +
    # omission count so a partial map can never read as a full one.
    try:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SUMMARY.json"
        )
        with open(out_path, "w") as f:
            f.write(json.dumps(summary) + "\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries headlines
    budget = 1900
    compact = dict(summary)
    compact["queries"] = {}
    compact["full_map"] = "BENCH_SUMMARY.json"
    compact["n_queries"] = n_real
    compact["n_shared"] = len(times) - n_real
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        compact["queries"][name] = dt
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            break
    compact["queries_omitted"] = len(times) - len(compact["queries"])
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
