"""Aggregate library tests — golden vectors from the reference ITCases
(FIXTURES.md §2)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.functions import aggregate as A


def ts(i):
    return datetime(2021, 1, 1, 0, 0, i)


# --- ArrayListAggFunction (ArrayListAggFunctionITCase.java:53-91) ---
def test_array_list_agg_distinct(spark):
    df = spark.createDataFrame(
        [("john", 35, 1), ("alice", 32, 2), ("bob", 35, 3), ("sarah", 32, 4)],
        "name: string, age: int, seq: int",
    )
    out = {
        r["age"]: r["names"]
        for r in df.groupBy("age")
        .agg(A.array_list_agg("name", "seq").alias("names"))
        .collect()
    }
    assert out == {35: ["john", "bob"], 32: ["alice", "sarah"]}


def test_array_list_agg_int_and_dupes(spark):
    # ArrayListAggFunction3ITCase.java:104-117 — generic over INT
    df = spark.createDataFrame(
        [(1, 35, 1), (11, 32, 2), (2, 35, 3), (12, 32, 4), (1, 35, 5)],
        "name: int, age: int, seq: int",
    )
    out = {
        r["age"]: r["names"]
        for r in df.groupBy("age")
        .agg(A.array_list_agg("name", "seq").alias("names"))
        .collect()
    }
    assert out == {35: [1, 2], 32: [11, 12]}


def test_list_agg(spark):
    # ListAggITCase112.java:100-109 final state
    df = spark.createDataFrame(
        [("john", 32, 1), ("alice", 32, 2), ("john", 32, 3)],
        "name: string, age: int, seq: int",
    )
    out = df.groupBy("age").agg(A.list_agg("name", "seq").alias("s")).collect()
    assert out[0]["s"] == "john,alice"


# --- LastNonNullValueAggFunction (fixture: null,1,2,null → 2) ---
def test_last_non_null(spark):
    df = spark.createDataFrame(
        [("john", None, 1), ("john", 1, 2), ("john", 2, 3), ("john", None, 4)],
        "k: string, v: int, seq: int",
    )
    out = df.groupBy("k").agg(A.last_non_null_value_agg("v", "seq").alias("v")).collect()
    assert out[0]["v"] == 2


def test_last_non_null_string(spark):
    df = spark.createDataFrame(
        [("j", None, 1), ("j", "a", 2), ("j", "b", 3), ("j", None, 4)],
        "k: string, v: string, seq: int",
    )
    assert (
        df.groupBy("k").agg(A.last_non_null_value_agg("v", "seq").alias("v")).collect()[0]["v"]
        == "b"
    )


# --- array-valued aggs (FIXTURES.md: [a],[a,b],[c],[a,b,d]) ---
def _arr_df(spark):
    seq = [(["a"], 1), (["a", "b"], 2), (["c"], 3), (["a", "b", "d"], 4)]
    return spark.createDataFrame(
        [("john", v, s) for v, s in seq], "k: string, v: array<string>, seq: int"
    )


def test_last_value_array(spark):
    df = _arr_df(spark)
    out = df.groupBy("k").agg(A.last_value_array_agg("v", "seq").alias("v")).collect()
    assert out[0]["v"] == ["a", "b", "d"]


def test_largest_array(spark):
    df = _arr_df(spark)
    out = df.groupBy("k").agg(A.largest_array_agg("v", "seq").alias("v")).collect()
    assert out[0]["v"] == ["a", "b", "d"]


def test_largest_array_tie_keeps_earliest(spark):
    # strictly-greater replaces (LargestStringArrayAggFunction.java:24-28):
    # a later equal-size array must NOT win
    df = spark.createDataFrame(
        [("k", ["x", "y"], 1), ("k", ["z", "w"], 2)],
        "k: string, v: array<string>, seq: int",
    )
    out = df.groupBy("k").agg(A.largest_array_agg("v", "seq").alias("v")).collect()
    assert out[0]["v"] == ["x", "y"]


# --- GetEmailAliasesAndCompany (GetEmailAliasesAndCompanyITCase.java:71-154) ---
def test_aliases_and_company_john(spark):
    rows = [
        ("john", "john@test.com", ts(1)),
        ("john", "john@apache.org", ts(2)),
        ("john", "john@mail.ru", ts(3)),
        ("john", "john@test2.com", ts(4)),
        ("john", "john@test.com", ts(5)),
    ]
    df = spark.createDataFrame(rows, "name: string, email: string, rowtime: timestamp")
    out = (
        df.groupBy("name")
        .agg(A.get_email_aliases_and_company("email", "rowtime").alias("p"))
        .select("p.*")
        .collect()[0]
    )
    assert sorted(out["aliases"]) == sorted(
        ["john@test.com", "john@apache.org", "john@mail.ru", "john@test2.com"]
    )
    assert out["aliases"][0] == "john@test.com"  # first-seen order
    assert out["company"] == "test.com"
    assert out["companySince"] == ts(5)  # re-seen at t5 after test2.com


def test_aliases_and_company_ververica_rewrite(spark):
    rows = [
        ("alice", "alice@apache.org", ts(1)),
        ("alice", "alice@data-artisans.com", ts(2)),
    ]
    df = spark.createDataFrame(rows, "name: string, email: string, rowtime: timestamp")
    out = (
        df.groupBy("name")
        .agg(A.get_email_aliases_and_company("email", "rowtime").alias("p"))
        .select("p.*")
        .collect()[0]
    )
    assert out["company"] == "ververica.com"
    assert out["companySince"] == ts(2)


def test_aliases_company_case_insensitive_exclude_and_no_domain(spark):
    rows = [
        ("bob", "bob@GMail.com", ts(1)),  # excluded case-insensitively
        ("bob", "plainname", ts(2)),  # no '@' → not a company
        ("bob", "bob@corp.io", ts(3)),
        ("bob", "bob@corp.io", ts(4)),  # repeat must not refresh since
    ]
    df = spark.createDataFrame(rows, "name: string, email: string, rowtime: timestamp")
    out = (
        df.groupBy("name")
        .agg(A.get_email_aliases_and_company("email", "rowtime").alias("p"))
        .select("p.*")
        .collect()[0]
    )
    assert out["company"] == "corp.io"
    assert out["companySince"] == ts(3)


def test_email_profiles_df_matches_expression_fold(spark):
    # the windowed change-point variant must equal the F.aggregate fold on
    # every tricky shape: A->B->A re-stamp, excluded domain inside a run,
    # null emails, persons with no valid domain at all
    from datetime import datetime as dt

    rows = [
        # A->B->A: since must re-stamp at t5
        ("p1", "x@test.com", dt(2021, 1, 1)),
        ("p1", "x@test2.com", dt(2021, 1, 2)),
        ("p1", "x@test.com", dt(2021, 1, 5)),
        # excluded domain mid-run must NOT break the run
        ("p2", "y@corp.io", dt(2021, 1, 1)),
        ("p2", "y@gmail.com", dt(2021, 1, 2)),
        ("p2", "y@corp.io", dt(2021, 1, 3)),
        # only excluded/null → company null
        ("p3", "z@gmail.com", dt(2021, 1, 1)),
        ("p3", None, dt(2021, 1, 2)),
        # historic domain rewrite on output
        ("p4", "w@data-artisans.com", dt(2021, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "person string, email string, ts timestamp")

    got = {
        r["person"]: (r["aliases"], r["company"], r["companySince"])
        for r in A.email_profiles_df(df).collect()
    }
    want = {
        r["person"]: (r["p"]["aliases"], r["p"]["company"], r["p"]["companySince"])
        for r in df.groupBy("person")
        .agg(A.get_email_aliases_and_company("email", "ts").alias("p"))
        .collect()
    }
    assert got == want
    assert got["p1"][1] == "test.com" and got["p1"][2] == dt(2021, 1, 5)
    assert got["p2"][2] == dt(2021, 1, 1)  # gmail didn't interrupt the run
    assert got["p3"][1] is None and got["p3"][2] is None
    assert got["p4"][1] == "ververica.com"


def test_email_profiles_df_single_exchange(spark):
    df = spark.createDataFrame(
        [("p", "a@b.com", None)], "person string, email string, ts timestamp"
    )
    plan = A.email_profiles_df(df)._jdf.queryExecution().executedPlan().toString()
    # the groupBy reuses the window's hashpartitioning(person): ONE exchange
    assert plan.count("Exchange hashpartitioning") == 1
