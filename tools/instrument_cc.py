#!/usr/bin/env python
"""Per-round cost attribution for the connected-components fixpoint loop
(round-9 verdict task 7).

Runs the EXACT dedup_clusters edge construction (MinHash-LSH candidate
pairs over `documents`) and the real ``graph.connected_components`` loop
with its ``instrument`` hook, then prints one JSON line with each
round's ``round_sec`` — the wall time of the round's single job (join +
min-agg + non-eager checkpoint block write + 1-row checksum, one action
per round since round 10) — plus the one-off setup costs (edge build +
bid checkpoint + labels init, timed as ``setup_sec``).  Use at
/tmp/scale/sf10 to quantify what the per-round lineage truncation
actually costs at the 100x replica.

Usage: python tools/instrument_cc.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from lab_flink_repository_analytics_spark.datapipe import dedup as DD
    from lab_flink_repository_analytics_spark.datapipe import graph
    from lab_flink_repository_analytics_spark.session import (
        get_spark,
        load_tables,
        run_canary,
    )

    spark = get_spark(app_name="instrument-cc")
    canary = run_canary(spark)

    t_start = time.time()
    docs = load_tables(spark, sf_dir)["documents"]
    pairs = DD.near_dup_candidates(docs).select("id_a", "id_b")
    rounds: list[dict] = []
    t_setup0 = time.time()
    labels = graph.connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=docs.select("doc_id"),
        node_col="doc_id",
        instrument=rounds,
    )
    total = time.time() - t_setup0
    n_labels = labels.count()
    n_clusters = labels.select("component").distinct().count()

    per_round = sum(r["round_sec"] for r in rounds)
    out = {
        "sf_dir": sf_dir,
        "rows_labeled": n_labels,
        "clusters": n_clusters,
        "rounds": rounds,
        "n_rounds": len(rounds),
        "total_cc_sec": round(total, 2),
        "setup_sec": round(total - per_round, 2),
        "sum_round_sec": round(per_round, 2),
        "canary": canary,
        "wall_sec": round(time.time() - t_start, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
