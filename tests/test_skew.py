"""Salted two-phase aggregation (datapipe/skew.py): results must be
bit-exact vs the unsalted aggregation, and the plan must fan the hot key
over the salt in the expensive phase."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.datapipe import skew


def _skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 13).alias("u"),
    )
    tail = spark.range(0, 100).select(
        F.concat(F.lit("t"), F.col("id") % 10).alias("k"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("u"),
    )
    return hot.unionByName(tail)


def test_salted_count_sum_matches_unsalted(spark):
    df = _skewed(spark)
    got = {
        r["k"]: (r["n"], r["total"])
        for r in skew.salted_count_sum(df, ["k"], "v", salt_buckets=8).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("DECIMAL(18,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert got == want


def test_salted_count_distinct_matches_unsalted(spark):
    df = _skewed(spark)
    got = {
        r["k"]: r["distinct_n"]
        for r in skew.salted_count_distinct(df, ["k"], "u", salt_buckets=8).collect()
    }
    want = {
        r["k"]: r["dn"]
        for r in df.groupBy("k").agg(F.count_distinct("u").alias("dn")).collect()
    }
    assert got == want


def test_salted_plan_fans_out_hot_key(spark):
    df = _skewed(spark)
    plan = (
        skew.salted_count_sum(df, ["k"], "v", salt_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase 1 exchanges on (k, salt) — the hot key spreads over 8 buckets
    assert "__salt" in plan.split("Exchange hashpartitioning(k")[0] or (
        "hashpartitioning(k#" in plan and "__salt" in plan
    )
    assert plan.count("Exchange hashpartitioning") == 2  # fan-out + combine


def test_salt_is_content_stable(spark):
    df = _skewed(spark)
    a = skew.with_salt(df, 8).groupBy("__salt").count().collect()
    b = skew.with_salt(df, 8).groupBy("__salt").count().collect()
    assert sorted((r["__salt"], r["count"]) for r in a) == sorted(
        (r["__salt"], r["count"]) for r in b
    )


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    # hot key 7 carries most of the fact rows
    facts = spark.createDataFrame(
        [(7, i) for i in range(500)] + [(k, k) for k in range(20)],
        "k: int, v: int",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 20, 2)] + [(7, "hot")], "dk: int, name: string"
    )
    plain = facts.join(dim, facts["k"] == dim["dk"]).select("k", "v", "name")
    salted = skew.salted_join(facts, dim, "k", "dk").select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join keeps unmatched fact rows exactly once
    plain_l = facts.join(dim, facts["k"] == dim["dk"], "left").select("k", "v", "name")
    salted_l = skew.salted_join(facts, dim, "k", "dk", how="left").select("k", "v", "name")
    assert sorted(map(tuple, salted_l.collect()), key=repr) == sorted(
        map(tuple, plain_l.collect()), key=repr
    )
    # the replicated-dim side really fans the hot key over salt buckets
    ex = skew.with_salt(facts, 8)
    assert ex.filter("k = 7").select("__salt").distinct().count() > 1
