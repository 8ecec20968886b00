"""datapipe/ranking.py — distributed exact ranking vs the single-partition
window forms it replaces."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.datapipe import ranking as R


def _df(spark, n, seed=7):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 50), rng.random()) for i in range(n)]
    # duplicate some sort keys so tie-breaking matters
    return spark.createDataFrame(rows, "id long, k int, v double")


def test_global_row_number_matches_window(spark):
    df = _df(spark, 500)
    got, total = R.with_global_row_number(df, ["k", "id"], out_col="rn")
    assert total == 500
    w = Window.orderBy("k", "id")
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    g = {(r["id"]): r["rn"] for r in got.collect()}
    e = {(r["id"]): r["rn"] for r in want.collect()}
    assert g == e


@pytest.mark.parametrize("n,buckets", [(500, 4), (501, 4), (503, 7), (3, 5)])
def test_exact_ntile_matches_window(spark, n, buckets):
    df = _df(spark, n, seed=n)
    got = R.exact_ntile(df, buckets, ["k", "id"], out_col="q")
    w = Window.orderBy("k", "id")
    want = df.withColumn("q", F.ntile(buckets).over(w).cast("int"))
    g = {r["id"]: r["q"] for r in got.collect()}
    e = {r["id"]: r["q"] for r in want.collect()}
    assert g == e


def test_no_single_partition_exchange_in_plan(spark):
    """The point of the module: the plan must range-repartition, not
    SinglePartition-exchange."""
    df = _df(spark, 100)
    got, _ = R.with_global_row_number(df, ["k", "id"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower() or "RangePartitioning" in plan


def test_global_running_max_matches_window(spark):
    df = _df(spark, 400)
    got = R.with_global_running_max(
        df, [F.col("k").desc(), F.col("id").desc()], "v", out_col="rm"
    )
    w = (
        Window.orderBy(F.col("k").desc(), F.col("id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("rm", F.max("v").over(w))
    g = {r["id"]: r["rm"] for r in got.collect()}
    e = {r["id"]: r["rm"] for r in want.collect()}
    assert g == e  # incl. NULL for the globally-first row
