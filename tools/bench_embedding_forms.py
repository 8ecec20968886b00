#!/usr/bin/env python
"""Three-way measurement of the embedding_near_dup plan forms (round-9
verdict task 3: reconcile the r8 numbers with ONE artifact).

Forms (all produce identical values/hashes — flat_dot is bit-identical to
the fold, similarity.py:44-47):

* ``fold``      — fold (zip_with/aggregate) cosine, filter NOT pinned:
                  PushPredicateThroughJoin moves the whole cosine into the
                  join's bound condition, where higher-order functions run
                  on the interpreted ZipWith.eval path (r7's shipped form).
* ``unrolled``  — flat_dot cosine, filter NOT pinned: same predicate
                  placement, but the unrolled chain lands in ONE generated
                  predicate method that codegen cannot split.
* ``postjoin``  — flat_dot cosine pinned to the post-join projection via
                  the always-true nondeterministic guard (the landed form,
                  datapipe/dedup.py): pure equi-join + splittable
                  whole-stage-codegen projection.

Each invocation measures ONE (form, sf_dir) pair in a fresh JVM and prints
one JSON line — so a never-finishing combination (fold at the 100×
replica) can be bounded by an outer ``timeout`` without poisoning other
measurements.

Usage: python tools/bench_embedding_forms.py {fold|unrolled|postjoin} SF_DIR
           [--reps N] [--threshold T]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, form: str, sf_dir: str, threshold: float):
    from lab_flink_repository_analytics_spark.datapipe import dedup as DD
    from lab_flink_repository_analytics_spark.datapipe import similarity as SIM
    from lab_flink_repository_analytics_spark.session import load_tables, rebalance

    emb = load_tables(spark, sf_dir)["embeddings"]
    one = emb.select(F.size("embedding").alias("d")).first()
    dim = int(one["d"])

    if form == "postjoin":
        return DD.embedding_near_dup_pairs(
            emb, ["label"], threshold=threshold, dim=dim, dot_parts=1
        )
    if form == "split":
        # the round-10 LANDED form (dedup.py default): identical plan
        # shape to postjoin, but the unrolled cosine is 8 left-associated
        # partial sums combined at the top (shallower Add spine)
        return DD.embedding_near_dup_pairs(
            emb, ["label"], threshold=threshold, dim=dim, dot_parts=8
        )

    # the two predicate-placement forms: identical up to the cosine
    # expression, with NO pin so the threshold filter (and therefore the
    # entire cosine) is pushed into the join's bound condition
    if form == "fold":
        nrm = SIM.norm("embedding")
    else:  # unrolled
        nrm = F.sqrt(SIM.flat_dot("embedding", "embedding", dim))
    sel = rebalance(emb).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        nrm.alias("nrm"),
        "label",
    )
    left, right = sel.alias("l"), sel.alias("r")
    cond = [F.col("l.label") == F.col("r.label"), F.col("l.id") < F.col("r.id")]
    if form == "fold":
        dot_lr = SIM.dot(F.col("l.v"), F.col("r.v"))
    else:
        dot_lr = SIM.flat_dot(F.col("l.v"), F.col("r.v"), dim)
    cos = dot_lr / (F.col("l.nrm") * F.col("r.nrm"))
    return (
        left.join(right, on=cond)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("form", choices=("fold", "unrolled", "postjoin", "split"))
    ap.add_argument("sf_dir")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.3)
    ap.add_argument(
        "--no-broadcast",
        action="store_true",
        help="force the sort-merge regime (autoBroadcastJoinThreshold=-1)",
    )
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="measure driver-side analyze/optimize/physical-plan time only",
    )
    args = ap.parse_args()

    from lab_flink_repository_analytics_spark.session import get_spark, run_canary

    spark = get_spark(app_name=f"emb-form-{args.form}")
    if args.no_broadcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    canary = run_canary(spark)

    def run_once():
        spark.catalog.clearCache()
        t0 = time.time()
        df = build(spark, args.form, args.sf_dir, args.threshold)
        if args.plan_only:
            # force analyze + optimize + physical planning, no execution
            df._jdf.queryExecution().executedPlan()
            return time.time() - t0, -1
        n = df.count()  # count, not noop: records the output row numerator
        return time.time() - t0, n

    # one unmeasured warm-up (codegen compile / Arrow worker spawn)
    _, rows_out = run_once()
    runs = []
    for _ in range(args.reps):
        dt, _ = run_once()
        runs.append(round(dt, 3))
    out = {
        "form": args.form,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "runs": runs,
        "median": round(statistics.median(runs), 3),
        "rows_out": rows_out,
        "canary": canary,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
