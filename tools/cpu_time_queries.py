#!/usr/bin/env python
"""Per-query executor CPU time: sums task executorCpuTime / executorRunTime
over every stage a query schedules, measured warm (second execution)
against the noop sink.

Why: wall-clock on this host swings with ambient neighbors (VERDICT r10:
a 6.4× canary degradation made a whole round's wall numbers unusable),
but executorCpuTime is per-thread CPU accounting — nearly invariant to
contention — and executorRunTime captures the scheduled compute incl.
shuffle fetch waits.  Use it for before/after A/B of a code change when
the host won't quiet down; use wall-clock only in canary-verified windows.

Usage: python tools/cpu_time_queries.py [--sf DIR] [--json OUT]
                                        [--reps N] [q1 ...]

``--reps N`` (default 3): N measured executions after the warm run, each
under its own job group; the artifact reports per-rep cpu/run plus the
median — single-execution CPU still swings ~2× with JIT/GC state, so
cross-tree comparisons should use the median of ≥3 reps.

Methodology mirrors tools/count_jobs.py: one unmeasured warm run per
query (footers, codegen, derived-state memos — steady session state),
then the measured run under a dedicated job group; stage ids come from
the group's jobs (status tracker, retention raised, stages deduped) and
their metrics from the UI REST endpoint of the local session.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_UI_ENABLED"] = "true"

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
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    only = set(args)

    spark = get_spark(
        app_name="cpu-time-queries",
        extra_conf={
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId

    def stage_metrics() -> dict[int, dict]:
        url = f"{ui}/api/v1/applications/{app}/stages?details=false"
        out = {}
        for s in json.load(urllib.request.urlopen(url)):
            # attempts of the same stage id: sum (retries are real work)
            sid = s["stageId"]
            prev = out.get(sid)
            if prev is None:
                out[sid] = s
            else:
                for k in ("executorCpuTime", "executorRunTime"):
                    prev[k] = prev.get(k, 0) + s.get(k, 0)
        return out

    qs = suite.queries()
    names = [n for n in qs if not only or n in only]
    report: dict[str, dict] = {}
    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cpus, runs, walls, jobs_n, stages_n = [], [], [], 0, 0
        for rep in range(reps):
            group = f"cpu::{name}::{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            sids: set[int] = set()
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    sids.update(info.stageIds)
            sm = stage_metrics()
            cpus.append(
                round(
                    sum(sm[s]["executorCpuTime"] for s in sids if s in sm)
                    / 1e9,
                    3,
                )
            )
            runs.append(
                round(
                    sum(sm[s]["executorRunTime"] for s in sids if s in sm)
                    / 1e3,
                    3,
                )
            )
            jobs_n, stages_n = len(job_ids), len(sids)
        report[name] = {
            "cpu_sec": med(cpus),
            "run_sec": med(runs),
            "wall_sec": med(walls),
            "cpu_runs": cpus,
            "run_runs": runs,
            "wall_runs": walls,
            "jobs": jobs_n,
            "stages": stages_n,
        }
        print(
            f"{name}: cpu={report[name]['cpu_sec']}s "
            f"run={report[name]['run_sec']}s wall={report[name]['wall_sec']}s"
            f" (cpu runs {cpus})",
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
