#!/usr/bin/env python
"""Measure io.sinks.upsert_by_key at replica scale (round-7 task: the
parquet key-merge rewrite had only toy-size evidence).

Mirrors the reference's ES idempotency contract
(FlinkCommitProgram.java:133-137: doc-id = hash(key), re-delivery
converges) on a REAL window-summary table: per-(user_id, day) event
counts built from the events table of the given sf dir.

Protocol (all timed):
  1. upsert batch A (days < split)            -> cold create
  2. upsert batch B (days >= overlap_from)    -> merge: updates + inserts
  3. upsert batch B AGAIN                     -> idempotent re-delivery;
     dataset hash must be unchanged (the convergence assert)

Prints one JSON line: row counts, per-step seconds, and bytes of the
final dataset — the rewrite-cost datapoint behind the documented bound
in io/sinks.py (rewrite is O(existing ∪ update); past the bound use
partition-aligned overwrite / Delta MERGE).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.io import sinks
from lab_flink_repository_analytics_spark.session import get_spark, load_tables


def _dataset_hash(spark, path: str) -> tuple[int, int]:
    df = spark.read.parquet(path)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal ring: a plain BIGINT sum of xxhash64 overflows under
        # ANSI mode; decimal(38,0) absorbs any row count this sees
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"] or 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/scale/sf1")
    ap.add_argument("--out", default="/tmp/upsert_bench/summaries")
    args = ap.parse_args()

    spark = get_spark(app_name="bench-upsert")
    import shutil

    # remove ONLY the target dir itself — rmtree'ing its PARENT would
    # recursively wipe whatever else lives there (e.g. --out /tmp/results
    # would delete all of /tmp, silently under ignore_errors)
    shutil.rmtree(args.out, ignore_errors=True)

    ev = load_tables(spark, args.sf)["events"]
    summary = (
        ev.groupBy(
            F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    days = sorted(r["day"] for r in summary.select("day").distinct().collect())
    split = days[len(days) * 2 // 3]
    overlap_from = days[len(days) // 2]
    batch_a = summary.filter(F.col("day") < F.lit(split)).localCheckpoint()
    batch_b = summary.filter(F.col("day") >= F.lit(overlap_from)).localCheckpoint()

    res = {
        "sf": args.sf,
        "batch_a_rows": batch_a.count(),
        "batch_b_rows": batch_b.count(),
    }
    keys = ["user_id", "day"]

    t0 = time.time()
    sinks.upsert_by_key(spark, batch_a, args.out, keys)
    res["t_create_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    sinks.upsert_by_key(spark, batch_b, args.out, keys)
    res["t_merge_sec"] = round(time.time() - t0, 3)
    n1, h1 = _dataset_hash(spark, args.out)

    t0 = time.time()
    sinks.upsert_by_key(spark, batch_b, args.out, keys)
    res["t_redeliver_sec"] = round(time.time() - t0, 3)
    n2, h2 = _dataset_hash(spark, args.out)

    res["rows_after_merge"] = n1
    res["idempotent"] = (n1, h1) == (n2, h2)
    res["bytes_final"] = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(args.out)
        for f in fs
    )
    print(json.dumps(res))
    assert res["idempotent"], "re-delivery changed the dataset"


if __name__ == "__main__":
    main()
