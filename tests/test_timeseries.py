"""Per-key integer EWMA (datapipe/timeseries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.datapipe import timeseries as TS


def _fold(xs, num=1, den=5):
    y = xs[0]
    for x in xs[1:]:
        y = ((den - num) * y + num * x) // den
    return y


def test_ewma_matches_python_recurrence(spark):
    rows = [
        ("u1", 1, 10.0),
        ("u1", 2, 20.0),
        ("u1", 3, 5.5),
        ("u2", 1, 100.0),
    ]
    df = spark.createDataFrame(rows, "k string, ord int, value double")
    got = {
        r["k"]: (r["n_events"], r["ewma_scaled"])
        for r in TS.ewma_int_df(df, ["k"], ["ord"], "value").collect()
    }
    assert got["u1"] == (3, _fold([10000, 20000, 5500]))
    assert got["u2"] == (1, 100000)


def test_ewma_order_follows_order_cols_not_input_order(spark):
    rows = [("u", 3, 1.0), ("u", 1, 9.0), ("u", 2, 4.0)]
    df = spark.createDataFrame(rows, "k string, ord int, value double")
    [r] = TS.ewma_int_df(df, ["k"], ["ord"], "value").collect()
    assert r["ewma_scaled"] == _fold([9000, 4000, 1000])


def test_ewma_deterministic_under_repartition(spark):
    import random

    rng = random.Random(5)
    rows = [("k%d" % (i % 7), i, rng.uniform(0, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, ord int, value double")
    a = sorted(map(tuple, TS.ewma_int_df(df, ["k"], ["ord"], "value").collect()))
    b = sorted(
        map(
            tuple,
            TS.ewma_int_df(df.repartition(13), ["k"], ["ord"], "value").collect(),
        )
    )
    assert a == b


def test_ewma_single_exchange_plan(spark):
    df = spark.createDataFrame([("u", 1, 1.0)], "k string, ord int, value double")
    plan = (
        TS.ewma_int_df(df, ["k"], ["ord"], "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan  # one keyed agg, no window
