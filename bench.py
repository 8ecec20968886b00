#!/usr/bin/env python
"""Benchmark harness: runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is fully materialized via the noop sink (no driver collect,
no result truncation — measures the whole plan incl. the final exchange).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab_flink_repository_analytics_spark.queries import suite
from lab_flink_repository_analytics_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
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

    times: dict[str, float] = {}
    total = 0.0
    for name, fn in suite.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
