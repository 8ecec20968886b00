#!/usr/bin/env python
"""Sequential per-query timing for a subset of suite queries.

Usage: python tools/time_queries.py [q1 q2 ... | all] [--sf DIR] [--reps N]
                                                      [--mode cold|warm]

Ordering contract (round-8): measurement always proceeds in CANONICAL
REGISTRY ORDER (the suite.queries() dict order) regardless of how the
names were given, and the artifact records the exact sequence — so
per-query medians are comparable across rounds (the r6→r7 artifacts ran
in different orders and 41 sub-second queries scattered >1.2× from
run-order variance alone).

Fresh session, sequential (no pool queueing) — isolates plan cost from
bench.py's FAIR-pool concurrency so before/after comparisons of a single
query are apples-to-apples.

Reproducibility contract (round-5 fix — the r4 artifact mixed warm-memo
and cold reps, producing a 4.6× spread labelled "noise"):

* ``--mode cold`` (default): EVERY measured rep pays the full DATA cost —
  persist slots, session-shared derived-state memos (BPE model, cluster
  labels, loaded tables, co-purchase edges/degrees) and the SQL cache are
  all reset before each rep.  UNMEASURED warm-up executions run first
  (also against reset data state) to populate the JVM's whole-stage-codegen
  cache and spawn the Arrow Python workers: rep-1 of a fresh plan is
  otherwise 2-5× slower for reasons that have nothing to do with the plan
  (measured r5: ffd_packing_summary 7.3s rep-1 vs 1.5s after, pure
  compile/worker-spawn).  Warm-up is ADAPTIVE (round-6 fix): a single
  warm-up under-warms plans whose hot loops need several executions to
  reach C2 tier (measured r6: event_gap_stats ran 3.3 → 1.2 → 1.2 →
  0.86 → 0.85s under per-rep resets — pure JIT tiering, the r5 artifact
  booked the 2.1s mid-ramp value as the median and called it a plan
  regression).  Warm-ups repeat (2..MAX_WARMUPS) until the latest run is
  within WARM_TOL of the previous one, so measurement starts at the JIT
  plateau.  "Cold data, warm code" — the steady-state cost a cluster pays
  per query, minus one-time JIT.
* ``--mode warm``: the warm-up rep ALSO builds shared state (no resets
  afterwards), then the measured reps run against it — the steady-state
  cost of a query inside a long-lived session with memos populated.

Output is one JSON object per run:
``{"mode": ..., "reps": N, "queries": {name: {"min": s, "median": s,
"max": s, "runs": [...]}}}`` — min/median/max are all recorded so a
single artifact can never tell two different stories.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_flink_repository_analytics_spark.queries import suite
from lab_flink_repository_analytics_spark.session import (
    get_spark,
    release_persist_slots,
    reset_derived_state,
    run_canary,
    sweep_persistent_rdds,
)


def _foreign_spark_jvms() -> list[str]:
    """Pre-flight guard: any ALREADY-RUNNING Spark JVM on this host (we
    have not started ours yet) shares its CPUs and page cache with the
    measurement and silently contaminates it — the round-6 artifact had
    to re-time 11 queries post-hoc after a leftover sf10 JVM overlapped
    the first pass (BENCH_SEQ_r06.json ``remeasured``).  Refusing up
    front replaces that escape hatch."""
    hits = []
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace").replace("\0", " ")
        except OSError:
            continue
        if "java" in cmd.split(" ", 1)[0].rsplit("/", 1)[-1] and (
            "org.apache.spark" in cmd or "spark-submit" in cmd
        ):
            hits.append(f"{pid}: {cmd[:140].strip()}")
    return hits


def _reset(spark):
    """Cold-mode reset: no cross-rep state survives — including dead
    localCheckpoint blocks, which the slot/memo teardown cannot reach
    (they are freed by GC + ContextCleaner, which loses the race at big
    scale factors and OOMs the next query).  SHUFFLE FILES are likewise
    cleaner-freed: a rep that writes tens of GB of shuffle (the wedge
    rehearsal: ~44 GB/execution) fills the disk if the previous rep's
    files are still awaiting GC — so force a full Python+JVM GC cycle
    and give the ContextCleaner a beat to process the queue."""
    import gc
    import time as _t

    release_persist_slots()
    reset_derived_state()
    spark.catalog.clearCache()
    sweep_persistent_rdds(spark)
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    _t.sleep(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "queries", nargs="*",
        help="query names, or 'all' / nothing for the full registry; "
        "whatever is given is re-sequenced into CANONICAL REGISTRY ORDER")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", choices=("cold", "warm"), default="cold")
    ap.add_argument(
        "--min-warmups", type=int, default=3,
        help="minimum unmeasured warm-ups (default 3 — the JIT ramp needs "
        "several executions at sf0.1 run lengths; use 1 for minute-scale "
        "runs where the ~2s absolute JIT cost is noise)")
    ap.add_argument(
        "--max-warmups", type=int, default=5,
        help="warm-up ceiling if convergence is never reached")
    ap.add_argument(
        "--allow-foreign-jvm", action="store_true",
        help="measure anyway when another Spark JVM is alive (the run is "
        "TAGGED as contaminated in the artifact instead of refused)")
    args = ap.parse_args()

    foreign = _foreign_spark_jvms()
    if foreign and not args.allow_foreign_jvm:
        print(
            "REFUSING to measure: foreign Spark JVM(s) alive — kill them "
            "or pass --allow-foreign-jvm to tag-and-proceed:\n  "
            + "\n  ".join(foreign),
            file=sys.stderr,
        )
        sys.exit(2)

    spark = get_spark(app_name="time-queries")
    qs = suite.queries()
    # CANONICAL ORDER (round-8 fix): r7 ran alphabetically, r6 in registry
    # order, making per-query medians cross-round incomparable (41 queries
    # scattered >1.2× while the sum moved 1.1% — pure run-order variance).
    # Whatever subset is requested, measurement ALWAYS proceeds in registry
    # order, and the artifact records the exact sequence it ran.
    # 'all' is a full-registry sentinel wherever it appears ('all q1' used
    # to exit 2 with "unknown query: all", contradicting the usage line)
    requested = set(args.queries) - {"all"}
    if not requested or "all" in args.queries:
        ordered = list(qs)
    else:
        unknown = requested - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            sys.exit(2)
        ordered = [n for n in qs if n in requested]
    out = {
        "mode": args.mode,
        "reps": args.reps,
        "sf": args.sf,
        "order": "registry",
        "sequence": ordered,
        "preflight": {"foreign_jvms": foreign, "clean": not foreign},
        "queries": {},
    }
    # HOST-SPEED CANARY (round-9): a constant synthetic job timed before
    # and after the suite.  Cross-round artifact comparison divides by the
    # canary ratio first — a uniform suite shift that the canary also
    # shows is host drift, not a code regression (the round-8 one-sided
    # ~1.19× sequential shift was exactly this ambiguity).
    out["canary_start"] = run_canary(spark)
    print(f"canary(start): {out['canary_start']}", file=sys.stderr)
    WARM_TOL = 0.25  # stop warming once run N is within 25% of run N-1
    for name in ordered:
        fn = qs[name]
        # unmeasured ADAPTIVE warm-up (both modes): compiles codegen, spawns
        # Arrow workers, and lets the JVM's tiered JIT reach its plateau —
        # repeat (min 2) until consecutive warm-up times converge; in warm
        # mode the last warm-up additionally leaves memos populated
        prev = None
        for i in range(args.max_warmups):
            if args.mode == "cold" or i == 0:
                _reset(spark)
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            # min-warmups floor (default 3): ramps can show a false plateau
            # one C2-tier short of steady state (event_gap_stats: 3.3, 1.2,
            # 1.16, then 0.86 — stopping at the 1.2 pair books mid-ramp)
            if (prev is not None and i >= args.min_warmups - 1
                    and dt >= prev * (1 - WARM_TOL)):
                break
            prev = dt
        runs = []
        for _ in range(args.reps):
            if args.mode == "cold":
                _reset(spark)
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out["queries"][name] = {
            "min": min(runs),
            "median": round(statistics.median(runs), 3),
            "max": max(runs),
            "runs": runs,
        }
        print(f"{name}: min={min(runs)} median={out['queries'][name]['median']} "
              f"max={max(runs)} ({args.mode})", file=sys.stderr)
    _reset(spark)
    out["canary_end"] = run_canary(spark)
    print(f"canary(end): {out['canary_end']}", file=sys.stderr)
    print(json.dumps(out))
    # tear the JVM down promptly: back-to-back invocations otherwise find
    # the previous run's gateway JVM still draining its shutdown hooks
    # and (correctly) refuse at pre-flight
    spark.stop()


if __name__ == "__main__":
    main()
