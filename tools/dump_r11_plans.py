#!/usr/bin/env python
"""Dump .explain('formatted') for the round-11-touched queries.

Usage: python tools/dump_r11_plans.py REPO_ROOT OUT_DIR SUFFIX [QUERY ...]
Runs against the package at REPO_ROOT (so a pre-change worktree produces
the _before plans and HEAD the _after plans) and writes
OUT_DIR/<query>_<SUFFIX>.txt.  Optional QUERY names restrict the dump (so
a late-round change can refresh its own plans without overwriting the
round-start _before dumps of earlier changes).
"""

from __future__ import annotations

import os
import sys

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4:])
sys.path.insert(0, root)

QUERIES = [
    "bigram_lm_scores",
    "ngram_repetition",
    "copurchase_pagerank",
    "copurchase_triangles",
    "ann_lsh_topk",
    "ann_recall_eval",
    "ann_cosine_topk",
    "hard_negative_mining",
    "mixture_token_quotas",
    "label_centroids",
    "label_redundancy",
    "kmeans_clusters",
]


def main() -> None:
    from lab_flink_repository_analytics_spark.queries import suite
    from lab_flink_repository_analytics_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-r11-{suffix}")
    qs = suite.queries()
    os.makedirs(out_dir, exist_ok=True)
    sf = "/root/testdata/sf0.1"
    for name in [q for q in QUERIES if not only or q in only]:
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"ERROR building/planning {name}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
