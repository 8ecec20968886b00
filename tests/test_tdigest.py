"""t-digest sketch invariants (datapipe/tdigest.py): size bound, merge
consistency, and quantile accuracy vs exact percentiles — the same pinning
strategy as the other oracle-less sketches (test_sketches.py).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.datapipe import tdigest as TD
from lab_flink_repository_analytics_spark.session import load_tables


@pytest.fixture(scope="module")
def event_digests(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    return {
        r["group"]: r
        for r in TD.tdigest_build(ev, "value", ["event_type"]).collect()
    }


def test_tdigest_bounded_size_and_mass(spark, sf_dir, event_digests):
    ev = load_tables(spark, sf_dir)["events"]
    exact_n = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for g, r in event_digests.items():
        assert len(r["means"]) <= 2 * TD.DEFAULT_DELTA  # ~2δ centroids
        assert abs(sum(r["weights"]) - exact_n[g]) < 1e-6  # mass conserved
        assert r["n"] == exact_n[g]
        assert list(r["means"]) == sorted(r["means"])


def test_tdigest_quantile_accuracy(spark, sf_dir, event_digests):
    ev = load_tables(spark, sf_dir)["events"]
    vals = {
        g: np.array(
            [r["value"] for r in ev.filter(F.col("event_type") == g).collect()]
        )
        for g in event_digests
    }
    for g, r in event_digests.items():
        n = len(vals[g])
        srt = np.sort(vals[g])
        for q in (0.1, 0.5, 0.9, 0.99):
            est = TD.tdigest_quantile(r["means"], r["weights"], q)
            # the t-digest guarantee is on RANK error, not value error: the
            # estimate must sit within a small mass band of q in the
            # empirical CDF (±1.5% of mass, ±1 order statistic slack for
            # the midpoint-vs-interpolation convention at small n)
            rank = np.searchsorted(srt, est) / n
            assert q - 0.015 - 1.0 / n <= rank <= q + 0.015 + 1.0 / n, (
                g,
                q,
                est,
                rank,
            )


def test_tdigest_merge_matches_single_build(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    whole = {
        r["group"]: r for r in TD.tdigest_build(ev, "value", ["event_type"]).collect()
    }
    # shard by user parity, build per shard, merge — the rollup path
    sharded = TD.tdigest_build(
        ev.withColumn("shard", (F.col("user_id") % 4)),
        "value",
        ["event_type", "shard"],
    ).withColumn("group", F.split("group", r"\|")[0])
    merged = {r["group"]: r for r in TD.tdigest_merge(sharded).collect()}
    for g in whole:
        assert merged[g]["n"] == whole[g]["n"]
        for q in (0.1, 0.5, 0.9):
            a = TD.tdigest_quantile(whole[g]["means"], whole[g]["weights"], q)
            b = TD.tdigest_quantile(merged[g]["means"], merged[g]["weights"], q)
            # merged digest agrees with the one-shot digest to sketch error
            ref = max(abs(a), 1e-9)
            assert abs(a - b) <= 0.05 * ref + 1e-6, (g, q, a, b)
