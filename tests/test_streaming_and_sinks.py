"""Streaming jobs + sink tests: watermark windowed aggs end-to-end over a
file-drop source with availableNow, and idempotent upsert convergence."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark import schemas
from lab_flink_repository_analytics_spark.io import sinks
from lab_flink_repository_analytics_spark.streaming import jobs


def _commit(date, files):
    return (None, None, None, date, None, None, files, None, None)


def _write_commits(spark, path, rows):
    spark.createDataFrame(rows, schemas.COMMIT).write.mode("append").parquet(path)


def test_streaming_commit_activity_end_to_end(spark, tmp_path):
    src = str(tmp_path / "commits")
    out = str(tmp_path / "summaries")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        _commit(datetime(2021, 1, 1, 10, 5), [("flink-core/src/A.java", 0, 10, 0)]),
        _commit(datetime(2021, 1, 1, 10, 45), [("flink-core/src/B.java", 0, 5, 0)]),
        _commit(datetime(2021, 1, 1, 11, 30), [("docs/x.md", 0, 7, 0)]),
    ]
    _write_commits(spark, src, rows)

    q = jobs.run_commit_activity_job(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = {
        (r["componentName"], r["windowStart"]): r["linesChanged"]
        for r in spark.read.parquet(out).collect()
    }
    assert got[("flink-core", datetime(2021, 1, 1, 10, 0))] == 15
    assert got[("docs", datetime(2021, 1, 1, 11, 0))] == 7

    # second batch arrives: late-ish update to an existing window plus a new
    # one — the upsert must converge (ES doc-id semantics), not duplicate
    _write_commits(
        spark,
        src,
        [_commit(datetime(2021, 1, 1, 10, 50), [("flink-core/src/C.java", 0, 100, 0)])],
    )
    q2 = jobs.run_commit_activity_job(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    got2 = {
        (r["componentName"], r["windowStart"]): r["linesChanged"]
        for r in spark.read.parquet(out).collect()
    }
    assert got2[("flink-core", datetime(2021, 1, 1, 10, 0))] == 115
    assert len(got2) == len(got)  # no duplicate keys


def test_streaming_users_per_window(spark, tmp_path):
    src = str(tmp_path / "mails")
    rows = [
        (datetime(2021, 1, 1), "a@x.com", None, None, None, None),
        (datetime(2021, 1, 2), "b@x.com", None, None, None, None),
        (datetime(2021, 1, 3), "a@x.com", None, None, None, None),
    ]
    spark.createDataFrame(rows, schemas.EMAIL).write.parquet(src)
    emails = jobs.stream_source(spark, src, schemas.EMAIL, "date", "1 day")
    agg = jobs.users_per_window_stream(emails, "365 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("upw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM upw").collect()
    assert len(out) == 1 and out[0]["cnt"] == 2


def test_upsert_by_key_converges(spark, tmp_path):
    path = str(tmp_path / "ds")
    df1 = spark.createDataFrame([("a", 1, 10), ("b", 1, 20)], "k: string, w: int, v: int")
    sinks.upsert_by_key(spark, df1, path, ["k", "w"])
    df2 = spark.createDataFrame([("a", 1, 99), ("c", 2, 30)], "k: string, w: int, v: int")
    sinks.upsert_by_key(spark, df2, path, ["k", "w"])
    sinks.upsert_by_key(spark, df2, path, ["k", "w"])  # idempotent re-run
    got = {(r["k"], r["w"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 99, ("b", 1): 20, ("c", 2): 30}


def test_kafka_json_shape(spark):
    df = spark.createDataFrame([(1, "x")], "id: int, name: string")
    out = sinks.to_kafka_json(df, key_cols=["id"]).collect()[0]
    assert out["key"] == '{"id":1}'
    assert out["value"] == '{"id":1,"name":"x"}'


def test_fan_out(spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,)], "x: int")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    sinks.fan_out(
        df,
        [
            lambda d: d.write.mode("overwrite").parquet(p1),
            lambda d: d.selectExpr("x * 2 AS x").write.mode("overwrite").parquet(p2),
        ],
    )
    assert sorted(r["x"] for r in spark.read.parquet(p1).collect()) == [1, 2]
    assert sorted(r["x"] for r in spark.read.parquet(p2).collect()) == [2, 4]
