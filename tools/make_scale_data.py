#!/usr/bin/env python
"""Build a larger-scale rehearsal dataset by replicating a driver sf dir
with disjoint key offsets (weak scaling: N independent copies of the
sf0.1 universe, all key relationships preserved within each copy).

Usage: python tools/make_scale_data.py [--src DIR] [--dst DIR] [--copies N]

This exists ONLY for the scale rehearsal in BENCH_SF1.md — the driver's
/root/testdata stays read-only and correctness always runs on the
driver-generated tables.  The replicas shift every entity key (orderkey,
custkey, partkey, suppkey, doc_id, vec_id, event_id, user_id) by
copy_index × stride so joins never cross copies; text/embedding payloads
repeat, which makes the dedup/gram operators see 10× duplicate mass — a
deliberately adversarial stress for exactly the operators whose scaling
we want to observe.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.session import get_spark

#: key columns to shift per table (all BIGINT entity ids)
KEYS = {
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: one stride per key FAMILY so foreign keys stay consistent across tables
FAMILY = {
    "s_suppkey": "supp", "l_suppkey": "supp",
    "c_custkey": "cust", "o_custkey": "cust",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "order", "l_orderkey": "order",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="make-scale-data")
    os.makedirs(args.dst, exist_ok=True)

    # stride per family = max key over the family's source columns + 1
    strides: dict[str, int] = {}
    src_dfs = {}
    for name in KEYS:
        df = spark.read.parquet(os.path.join(args.src, f"{name}.parquet"))
        src_dfs[name] = df
        for col in KEYS[name]:
            fam = FAMILY[col]
            m = df.agg(F.max(col)).first()[0] or 0
            strides[fam] = max(strides.get(fam, 0), int(m) + 1)

    for name, df in src_dfs.items():
        if not KEYS[name]:  # dimension tables stay as-is
            df.write.mode("overwrite").parquet(os.path.join(args.dst, f"{name}.parquet"))
            continue
        parts = []
        for i in range(args.copies):
            cp = df
            for col in KEYS[name]:
                cp = cp.withColumn(
                    col, (F.col(col) + F.lit(i * strides[FAMILY[col]])).cast("bigint")
                )
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(args.dst, f"{name}.parquet"))
        print(f"{name}: x{args.copies}", flush=True)
    print("done ->", args.dst)


if __name__ == "__main__":
    main()
