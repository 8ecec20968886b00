#!/usr/bin/env python
"""Per-query structural cost: Spark job / stage / task counts for every
registry query, measured warm (second execution) against the noop sink.

Why: wall-clock on this host swings up to ~15x with ambient load (see
OPTIMIZATION_r10.md "Host window"), but the number of jobs, stages and
tasks a query schedules is a property of the PLAN — window-independent
evidence for before/after comparisons across trees.

Usage: python tools/count_jobs.py [--sf DIR] [--json OUT] [q1 q2 ...]

Methodology: each query runs once unmeasured (parquet footers, codegen,
derived-state memos populate — exactly the steady state a long-lived
session reaches), then the measured run executes under a dedicated job
group and the listener-backed status tracker reports the group's job ids;
stages/tasks come from each job's stage infos.  Shared derived-state
builds are therefore charged to NO query (they ran in the warm-up), which
matches the pooled bench where each is built once per session.

Accounting caveats (r11, per ADVICE):
- sc.statusTracker() only sees jobs/stages within
  spark.ui.retainedJobs / retainedStages — the session raises both to
  100k and each query asserts its job count is far below the limit, so a
  silent undercount can't masquerade as an optimization.
- A stage shared between two jobs in the same group (skipped re-use) is
  counted ONCE per query: stage ids are deduped across the group's jobs.
  Earlier rounds' numbers summed such stages once per listing job;
  observed effect at r10 scale was zero for all but the iterative
  queries, but cross-round comparisons should prefer same-tool reruns.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_flink_repository_analytics_spark.queries import suite
from lab_flink_repository_analytics_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    only = set(args)

    spark = get_spark(
        app_name="count-jobs",
        extra_conf={
            # keep every job/stage of a counted group visible to the
            # status tracker (defaults retain only 1000 of each)
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    qs = suite.queries()
    names = [n for n in qs if not only or n in only]
    report: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        # warm run: builds shared state + compiles codegen outside the count
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        group = f"count::{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        assert len(job_ids) < 50_000, (
            f"{name}: {len(job_ids)} jobs approaches the retention limit; "
            "counts would silently undercount"
        )
        stages = 0
        tasks = 0
        seen_stages: set[int] = set()
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                if sid in seen_stages:
                    continue  # stage shared/skipped across jobs: count once
                seen_stages.add(sid)
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None:
                    continue
                stages += 1
                tasks += sinfo.numTasks
        report[name] = {
            "jobs": len(job_ids),
            "stages": stages,
            "tasks": tasks,
            "warm_sec": round(dt, 3),
        }
        print(
            f"{name}: jobs={len(job_ids)} stages={stages} tasks={tasks}"
            f" warm={dt:.2f}s",
            flush=True,
        )
    out = {"sf": sf_dir, "queries": report}
    line = json.dumps(out)
    if json_out:
        with open(json_out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
