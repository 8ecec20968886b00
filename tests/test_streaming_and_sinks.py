"""Streaming jobs + sink tests: watermark windowed aggs end-to-end over a
file-drop source with availableNow, and idempotent upsert convergence."""

from __future__ import annotations

from datetime import datetime

import pytest
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


def _run_profiles(spark, src, out, ckpt):
    from lab_flink_repository_analytics_spark.streaming import stateful

    emails = (
        spark.readStream.schema("person string, email string, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "1 day")
    )
    profiles = stateful.email_profiles_stream(emails)

    def _upsert(batch_df, batch_id):
        if not batch_df.isEmpty():
            sinks.upsert_by_key(batch_df.sparkSession, batch_df, out, ["person"])

    q = (
        profiles.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(_upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_email_profiles_across_batches(spark, tmp_path):
    src = str(tmp_path / "emails")
    out = str(tmp_path / "profiles")
    ckpt = str(tmp_path / "ckpt")
    schema = "person string, email string, ts timestamp"

    batch1 = [
        ("john", "john@test.com", datetime(2021, 1, 1)),
        ("john", "john@gmail.com", datetime(2021, 1, 2)),  # freemail: no company change
        ("jane", "jane@data-artisans.com", datetime(2021, 1, 1)),
    ]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    _run_profiles(spark, src, out, ckpt)
    got = {r["person"]: r for r in spark.read.parquet(out).collect()}
    assert got["john"]["company"] == "test.com"
    assert got["john"]["companySince"] == datetime(2021, 1, 1)
    assert got["john"]["aliases"] == ["john@test.com", "john@gmail.com"]
    assert got["jane"]["company"] == "ververica.com"  # historic-domain rewrite

    # second batch: company change for john — state must carry across the
    # restart (checkpointed state store), since must re-stamp
    batch2 = [("john", "john@new.io", datetime(2021, 2, 1))]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    _run_profiles(spark, src, out, ckpt)
    got2 = {r["person"]: r for r in spark.read.parquet(out).collect()}
    assert got2["john"]["company"] == "new.io"
    assert got2["john"]["companySince"] == datetime(2021, 2, 1)
    assert got2["john"]["aliases"] == [
        "john@test.com",
        "john@gmail.com",
        "john@new.io",
    ]
    assert got2["jane"]["company"] == "ververica.com"  # untouched key survives


def test_watermark_drops_late_rows_append_mode(spark, tmp_path):
    # reference watermark semantics (DDL delays, README.md:88/120/145):
    # rows older than the watermark are dropped, finalized windows emit once
    from datetime import datetime as dt

    src = str(tmp_path / "ev")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    schema = "k string, ts timestamp"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 day")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("ws"), "cnt")
        )
        q = (
            agg.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", dt(2021, 1, 10, 10, 0)), ("b", dt(2021, 1, 20, 9, 30))], schema
    ).write.mode("append").parquet(src)
    run()
    # watermark = Jan 19 09:30 → the Jan 10 window is finalized with cnt=1
    got = {r["ws"]: r["cnt"] for r in spark.read.parquet(out).collect()}
    assert got == {dt(2021, 1, 10, 10, 0): 1}

    # batch 2: a row 9 days behind the watermark (dropped) + a fresh row
    # that advances the watermark past the Jan 20 window
    spark.createDataFrame(
        [("late", dt(2021, 1, 10, 10, 30)), ("c", dt(2021, 1, 22, 0, 0))],
        schema,
    ).write.mode("append").parquet(src)
    run()
    got2 = {r["ws"]: r["cnt"] for r in spark.read.parquet(out).collect()}
    # Jan 10 window NOT re-emitted/incremented by the late row; Jan 20
    # window finalized at cnt=1
    assert got2 == {
        dt(2021, 1, 10, 10, 0): 1,
        dt(2021, 1, 20, 9, 0): 1,
    }


def test_streaming_session_windows_merge_and_finalize(spark, tmp_path):
    # session_threads_stream end-to-end: rows within the gap merge into
    # one session; the session only emits once the watermark passes
    # session_end + gap, and singleton sessions (cnt < 2) survive the
    # HAVING filter (ref README.md:227-236 unanswered-threads query)
    src = str(tmp_path / "mails")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    schema = "subject string, date timestamp"

    def run():
        emails = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("date", "1 day")
        )
        sess = jobs.session_threads_stream(emails, gap="2 days")
        q = (
            sess.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # thread A: two messages 1 day apart (merge into ONE session, cnt=2 →
    # filtered); thread B: singleton (cnt=1 → kept); plus a late-horizon
    # row far in the future so the watermark finalizes both sessions
    rows = [
        ("Re: [DISCUSS] thing", datetime(2021, 1, 1)),
        ("[DISCUSS] thing", datetime(2021, 1, 2)),
        ("[VOTE] lonely", datetime(2021, 1, 3)),
        ("closer", datetime(2021, 3, 1)),
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    run()
    got = {r["thread"]: r["cnt"] for r in spark.read.parquet(out).collect()}
    assert got.get("[VOTE] lonely") == 1
    assert "[DISCUSS] thing" not in got  # merged session has 2 msgs → filtered


def test_streaming_session_multi_batch_watermark_finalization_order(spark, tmp_path):
    """Multi-batch watermark advance (ref README.md:227-236 semantics):
    sessions finalize in event-time order as the watermark passes each
    session's end across RESTARTED runs sharing one checkpoint, and a
    message arriving in a later batch within the gap MERGES into the
    open session from state instead of opening a new one."""
    src = str(tmp_path / "mails")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    schema = "subject string, date timestamp"

    def run():
        emails = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("date", "1 day")
        )
        sess = jobs.session_threads_stream(emails, gap="2 days")
        q = (
            sess.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def emitted():
        try:
            return {r["thread"]: r["cnt"] for r in spark.read.parquet(out).collect()}
        except Exception:
            return {}

    # run 1: X's session [Jan 1, Jan 3) closes under wm Jan 4; Y's
    # [Jan 5, Jan 7) is still open
    spark.createDataFrame(
        [("[X] one", datetime(2021, 1, 1)), ("[Y] two", datetime(2021, 1, 5))],
        schema,
    ).write.mode("append").parquet(src)
    run()
    assert emitted() == {"[X] one": 1}

    # run 2: a second Y message INSIDE the gap merges with the open
    # session from checkpointed state (cnt -> 2, filtered by HAVING);
    # Z opens and stays open under wm Jan 19
    spark.createDataFrame(
        [("Re: [Y] two", datetime(2021, 1, 6)), ("[Z] three", datetime(2021, 1, 20))],
        schema,
    ).write.mode("append").parquet(src)
    run()
    assert emitted() == {"[X] one": 1}  # Y merged->filtered, Z still open

    # run 3: a far-future row advances the watermark past Z's end — Z
    # finalizes LAST, in event-time order
    spark.createDataFrame(
        [("closer", datetime(2021, 3, 1))], schema
    ).write.mode("append").parquet(src)
    run()
    assert emitted() == {"[X] one": 1, "[Z] three": 1}


def test_stream_stream_interval_join(spark, tmp_path):
    # watermarked stream-stream join: clicks within 10 min before an error
    # pair up; clicks outside the window don't; state is watermark-bounded
    src_e = str(tmp_path / "errors")
    src_c = str(tmp_path / "clicks")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, ts timestamp"

    spark.createDataFrame(
        [(100, 1, datetime(2021, 1, 1, 10, 0, 0)), (101, 2, datetime(2021, 1, 1, 10, 0, 0))],
        schema,
    ).write.parquet(src_e)
    spark.createDataFrame(
        [
            (1, 1, datetime(2021, 1, 1, 9, 51, 0)),   # in window for error 100
            (2, 1, datetime(2021, 1, 1, 9, 49, 0)),   # 11 min before → out
            (3, 2, datetime(2021, 1, 1, 9, 59, 0)),   # in window for error 101
            (4, 3, datetime(2021, 1, 1, 9, 59, 0)),   # other user → out
        ],
        schema,
    ).write.parquet(src_c)

    errors = jobs.stream_source(spark, src_e, schema, "ts", "1 hour")
    clicks = jobs.stream_source(spark, src_c, schema, "ts", "1 hour")
    joined = jobs.clicks_before_errors_stream(errors, clicks, 600.0)
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda b, _: None
            if b.isEmpty()
            else b.write.mode("append").parquet(out)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["error_id"], r["click_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(100, 1), (101, 3)}


def test_transform_with_state_profiles_across_batches(spark, tmp_path):
    # the Spark 4 transformWithStateInPandas twin must match the
    # applyInPandasWithState semantics exactly; it only runs on RocksDB.
    # Its Python state-server protocol needs the protobuf runtime, which
    # this container doesn't ship — skip (not fail) where it's absent; the
    # operator itself is plain Spark-4 API and runs wherever pyspark's
    # optional protobuf dependency is installed.
    pytest.importorskip("google.protobuf")
    from lab_flink_repository_analytics_spark.session import ROCKSDB_PROVIDER
    from lab_flink_repository_analytics_spark.streaming import stateful

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    src = str(tmp_path / "emails")
    out = str(tmp_path / "profiles")
    ckpt = str(tmp_path / "ckpt")
    schema = "person string, email string, ts timestamp"

    def run():
        emails = (
            spark.readStream.schema(schema).parquet(src).withWatermark("ts", "1 day")
        )
        profiles = stateful.email_profiles_stream_v2(emails)

        def _upsert(batch_df, batch_id):
            if not batch_df.isEmpty():
                sinks.upsert_by_key(
                    batch_df.sparkSession, batch_df, out, ["person"]
                )

        q = (
            profiles.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        batch1 = [
            ("john", "john@test.com", datetime(2021, 1, 1)),
            ("john", "john@gmail.com", datetime(2021, 1, 2)),
            ("jane", "jane@data-artisans.com", datetime(2021, 1, 1)),
        ]
        spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
        run()
        got = {r["person"]: r for r in spark.read.parquet(out).collect()}
        assert got["john"]["company"] == "test.com"
        assert got["john"]["aliases"] == ["john@test.com", "john@gmail.com"]
        assert got["jane"]["company"] == "ververica.com"

        batch2 = [("john", "john@new.io", datetime(2021, 2, 1))]
        spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
        run()
        got2 = {r["person"]: r for r in spark.read.parquet(out).collect()}
        assert got2["john"]["company"] == "new.io"
        assert got2["john"]["companySince"] == datetime(2021, 2, 1)
        assert got2["john"]["aliases"] == [
            "john@test.com",
            "john@gmail.com",
            "john@new.io",
        ]
        assert got2["jane"]["company"] == "ververica.com"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_transform_with_state_processor_parity_in_process():
    # drive the StatefulProcessor directly with a fake handle: the fold
    # must match the applyInPandasWithState twin across two "batches"
    import pandas as pd

    from lab_flink_repository_analytics_spark.streaming.stateful import (
        _EmailProfileProcessor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    proc = _EmailProfileProcessor()
    handle = FakeHandle()
    proc.init(handle)

    b1 = pd.DataFrame(
        {
            "person": ["john", "john"],
            "email": ["john@test.com", "john@gmail.com"],
            "ts": [datetime(2021, 1, 1), datetime(2021, 1, 2)],
        }
    )
    (out1,) = list(proc.handleInputRows(("john",), iter([b1]), None))
    assert out1.iloc[0]["company"] == "test.com"  # freemail excluded

    b2 = pd.DataFrame(
        {
            "person": ["john"],
            "email": ["john@new.io"],
            "ts": [datetime(2021, 2, 1)],
        }
    )
    (out2,) = list(proc.handleInputRows(("john",), iter([b2]), None))
    assert out2.iloc[0]["company"] == "new.io"
    assert out2.iloc[0]["companySince"] == datetime(2021, 2, 1)
    assert out2.iloc[0]["aliases"] == [
        "john@test.com",
        "john@gmail.com",
        "john@new.io",
    ]
    proc.close()


def test_stateful_profiles_on_rocksdb_state_store(spark, tmp_path):
    # the reference runs RocksDB state backends in every ITCase
    # (SURVEY.md §4); prove the stateful operator runs on Spark's RocksDB
    # provider (conf applies per started query)
    from lab_flink_repository_analytics_spark.session import ROCKSDB_PROVIDER

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        src = str(tmp_path / "emails")
        out = str(tmp_path / "profiles")
        ckpt = str(tmp_path / "ckpt")
        schema = "person string, email string, ts timestamp"
        spark.createDataFrame(
            [("ada", "ada@corp.com", datetime(2022, 3, 1))], schema
        ).write.parquet(src)
        _run_profiles(spark, src, out, ckpt)
        got = {r["person"]: r for r in spark.read.parquet(out).collect()}
        assert got["ada"]["company"] == "corp.com"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_minhash_dedup_stream_across_batches(spark, tmp_path):
    from lab_flink_repository_analytics_spark.streaming import stateful

    src = str(tmp_path / "docs")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    text = "the quick brown fox jumps over the lazy dog again and again"

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (
            stateful.minhash_dedup_stream(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def pairs():
        import os

        if not os.path.exists(out):
            return set()
        return {
            (r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()
        }

    spark.createDataFrame(
        [(1, text), (2, "completely unrelated content about query engines")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run()
    assert pairs() == set()  # no dups yet

    # batch 2 contains a near-dup of doc 1 — must pair against the STATE
    spark.createDataFrame(
        [(3, text + " tail")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    run()
    got = pairs()
    assert (1, 3) in got
    assert all(p == (1, 3) for p in got)  # no (2, x) noise


def test_exact_dedup_stream(spark, tmp_path):
    from lab_flink_repository_analytics_spark.streaming import stateful

    src = str(tmp_path / "docs")
    rows = [
        (1, "aaa", datetime(2021, 1, 1, 10)),
        (2, "aaa", datetime(2021, 1, 1, 11)),  # dup fingerprint within watermark
        (3, "bbb", datetime(2021, 1, 1, 12)),
    ]
    spark.createDataFrame(rows, "doc_id int, fp string, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("doc_id int, fp string, ts timestamp").parquet(src)
    deduped = stateful.exact_dedup_stream(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["fp"] for r in spark.sql("SELECT * FROM dedup_stream").collect())
    assert got == ["aaa", "bbb"]


def test_upsert_by_key_converges(spark, tmp_path):
    path = str(tmp_path / "ds")
    df1 = spark.createDataFrame([("a", 1, 10), ("b", 1, 20)], "k: string, w: int, v: int")
    sinks.upsert_by_key(spark, df1, path, ["k", "w"])
    df2 = spark.createDataFrame([("a", 1, 99), ("c", 2, 30)], "k: string, w: int, v: int")
    sinks.upsert_by_key(spark, df2, path, ["k", "w"])
    sinks.upsert_by_key(spark, df2, path, ["k", "w"])  # idempotent re-run
    got = {(r["k"], r["w"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 99, ("b", 1): 20, ("c", 2): 30}


def test_upsert_by_key_recovers_from_crash_between_renames(spark, tmp_path):
    # simulate _swap_in dying BETWEEN its two renames (the only window
    # where `path` is absent): dataset displaced to ._old, the committed
    # merge sitting complete in ._tmp.  The next upsert must first finish
    # the interrupted swap (the ._tmp copy wins — the merge had fully
    # committed), then apply its own updates on top.
    import shutil

    path = str(tmp_path / "ds")
    df1 = spark.createDataFrame([("a", 10), ("b", 20)], "k: string, v: int")
    sinks.upsert_by_key(spark, df1, path, ["k"])
    df2 = spark.createDataFrame([("a", 99)], "k: string, v: int")
    sinks.upsert_by_key(spark, df2, path, ["k"])
    # reconstruct the mid-swap crash state: `path` was renamed to ._old
    # (holding the PRE-merge state df1) and the merged result is in ._tmp
    shutil.move(path, path + "._old")
    shutil.copytree(path + "._old", path + "._tmp")
    # make ._tmp the POST-merge state so the two copies are distinguishable
    spark.createDataFrame(
        [("a", 99), ("b", 20)], "k: string, v: int"
    ).write.mode("overwrite").parquet(path + "._tmp")
    df3 = spark.createDataFrame([("c", 30)], "k: string, v: int")
    sinks.upsert_by_key(spark, df3, path, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 99, "b": 20, "c": 30}  # ._tmp (committed merge) won
    import os

    assert not os.path.exists(path + "._tmp") and not os.path.exists(path + "._old")


def test_upsert_by_key_ignores_aborted_tmp_write(spark, tmp_path):
    # crash DURING the tmp write: `path` still intact, ._tmp exists but has
    # no _SUCCESS marker — recovery must leave `path` alone and the next
    # merge must not read the aborted garbage
    import os

    path = str(tmp_path / "ds")
    df1 = spark.createDataFrame([("a", 10)], "k: string, v: int")
    sinks.upsert_by_key(spark, df1, path, ["k"])
    os.makedirs(path + "._tmp")
    with open(path + "._tmp/part-garbage.parquet", "wb") as f:
        f.write(b"not parquet")
    df2 = spark.createDataFrame([("b", 20)], "k: string, v: int")
    sinks.upsert_by_key(spark, df2, path, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 10, "b": 20}
    assert not os.path.exists(path + "._tmp")


def test_upsert_by_key_rolls_back_when_tmp_incomplete(spark, tmp_path):
    # crash mid-swap with an INCOMPLETE ._tmp (no _SUCCESS): path is gone,
    # ._old holds the only intact copy — recovery must restore it
    import os
    import shutil

    path = str(tmp_path / "ds")
    df1 = spark.createDataFrame([("a", 10), ("b", 20)], "k: string, v: int")
    sinks.upsert_by_key(spark, df1, path, ["k"])
    shutil.move(path, path + "._old")
    os.makedirs(path + "._tmp")  # aborted write: empty, no _SUCCESS
    df2 = spark.createDataFrame([("c", 30)], "k: string, v: int")
    sinks.upsert_by_key(spark, df2, path, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 10, "b": 20, "c": 30}  # rolled back to ._old, then merged
    assert not os.path.exists(path + "._tmp") and not os.path.exists(path + "._old")


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


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # simulate the streaming-upsert aftermath: 20 tiny appends
    for i in range(20):
        spark.range(i * 50, (i + 1) * 50).select(
            F.col("id"), (F.col("id") % 7).alias("g")
        ).coalesce(1).write.mode("append").parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 20

    n = sinks.compact_parquet(spark, path, target_rows_per_file=600, sort_cols=["id"])
    after = glob.glob(f"{path}/*.parquet")
    assert len(after) == n == 2  # 1000 rows / 600 → 2 files
    df = spark.read.parquet(path)
    assert df.count() == 1000
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(1000))
    # range-partitioned + sorted: each file's id span is disjoint
    import pyarrow.parquet as pq

    spans = sorted(
        (pq.read_table(f, columns=["id"])["id"].to_pylist()) for f in after
    )
    assert spans[0][-1] < spans[1][0]


def test_streaming_sliding_windows_emit_on_watermark(spark, tmp_path):
    # sliding (HOP) windows in streaming append mode: an event at 03:00
    # lands in the four 1-day/6h windows covering it; all four emit once
    # the watermark (driven by a far-future row) passes their ends
    src = str(tmp_path / "events")
    out = str(tmp_path / "rates")
    ckpt = str(tmp_path / "ckpt_slide")
    schema = "ts timestamp, event_type string"
    rows = [
        (datetime(2021, 1, 2, 3), "click"),
        (datetime(2021, 3, 1), "horizon"),  # advances the watermark
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    events = (
        spark.readStream.schema(schema).parquet(src).withWatermark("ts", "1 hour")
    )
    q = (
        jobs.sliding_activity_stream(events)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda b, _: None
            if b.isEmpty()
            else b.write.mode("append").parquet(out)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["window_start"], r["window_end"])
        for r in spark.read.parquet(out).filter("event_type = 'click'").collect()
    )
    assert len(got) == 4  # duration/slide = 4 overlapping windows
    assert got[0] == (datetime(2021, 1, 1, 6), datetime(2021, 1, 2, 6))
    assert got[-1] == (datetime(2021, 1, 2, 0), datetime(2021, 1, 3, 0))
    # every window covers the event instant
    assert all(s <= datetime(2021, 1, 2, 3) < e for s, e in got)


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    # 32×32 grid of (x, y): sorting by z-value then splitting into files
    # bounds BOTH x and y spans per file; sorting by x alone leaves y
    # spanning the whole domain in every file
    from pyspark.sql import functions as F

    grid = (
        spark.range(32 * 32)
        .select((F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y"))
    )
    z = grid.withColumn("z", sinks.zorder_value("x", "y", bits=5))
    # z-value is a bijection on the grid (no collisions)
    assert z.select("z").distinct().count() == 32 * 32
    n_files = 16
    zsorted = z.repartitionByRange(n_files, "z").sortWithinPartitions("z")
    spans = (
        zsorted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    # every file's bounding box is a fraction of the 31-wide domain on BOTH dims
    assert all(r["xs"] <= 16 and r["ys"] <= 16 for r in spans)
    xsorted = grid.repartitionByRange(n_files, "x").sortWithinPartitions("x")
    xspans = (
        xsorted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("ys"))
        .collect()
    )
    assert all(r["ys"] == 31 for r in xspans)  # x-sort leaves y unclustered


def test_streaming_histogram_store_matches_batch(spark, tmp_path):
    # two micro-batches merged incrementally == one batch histogram of all
    # rows; the store never exceeds keys×bins rows
    from lab_flink_repository_analytics_spark.datapipe import sketches as SK

    src = str(tmp_path / "vals")
    store = str(tmp_path / "hist_store")
    rows1 = [("a", float(v)) for v in range(0, 50)]
    rows2 = [("a", float(v)) for v in range(50, 100)] + [("b", 10.0)]
    schema = "event_type string, value double"
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = jobs.value_histogram_stream(
            stream, store, str(tmp_path / "ckpt_hist"), lo=0.0, hi=100.0, bins=10
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run()
    got = spark.read.parquet(store)
    expected = SK.value_histogram(
        spark.createDataFrame(rows1 + rows2, schema), "value", ["event_type"], 0.0, 100.0, bins=10
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    est = SK.histogram_quantiles(got, ["event_type"], [0.5], 0.0, 100.0, bins=10)
    m = {r["event_type"]: r["p50_est"] for r in est.collect()}
    assert abs(m["a"] - 50.0) <= 10.0  # uniform 0..99 → p50 within one bin


def test_drop_duplicates_within_watermark_builtin(spark, tmp_path):
    # Spark 3.5+ built-in bounded-state dedup: same semantic as
    # stateful.exact_dedup_stream but with engine-managed state eviction —
    # the zero-custom-code path for streaming dedup at scale.
    src = str(tmp_path / "docs")
    rows = [
        (1, "aaa", datetime(2021, 1, 1, 10)),
        (2, "aaa", datetime(2021, 1, 1, 10, 30)),  # dup inside the 1h window
        (3, "bbb", datetime(2021, 1, 1, 12)),
    ]
    spark.createDataFrame(rows, "doc_id int, fp string, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("doc_id int, fp string, ts timestamp").parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["fp"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddww_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["fp"] for r in spark.sql("SELECT * FROM ddww_stream").collect())
    assert got == ["aaa", "bbb"]


def test_streaming_word_topk_matches_batch(spark, tmp_path):
    # incremental top-k: two micro-batches of docs merge into the counter
    # store; the store's top-k equals a batch recount over ALL docs
    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    from lab_flink_repository_analytics_spark.streaming import jobs

    b1 = [(1, "a b a"), (2, "b c")]
    b2 = [(3, "a d d d")]
    spark.createDataFrame(b1, "doc_id long, text string").write.parquet(src)
    q = jobs.word_topk_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, ck,
    )
    q.awaitTermination(120)
    spark.createDataFrame(b2, "doc_id long, text string").write.mode("append").parquet(src)
    q = jobs.word_topk_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        store, ck,
    )
    q.awaitTermination(120)
    got = [(r["word"], r["cnt"]) for r in jobs.read_topk(spark, store, 3).collect()]
    assert got == [("a", 3), ("d", 3), ("b", 2)]  # tie a/d broken by word


def test_stream_stream_outer_interval_join_emits_on_watermark(spark, tmp_path):
    # left-outer: error 101 has no in-window click; its NULL-click row may
    # only surface after the watermark passes its window — i.e. on a LATER
    # run whose input advances event time (Flink outer interval semantics)
    src_e = str(tmp_path / "errors")
    src_c = str(tmp_path / "clicks")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, ts timestamp"

    def run_once():
        errors = jobs.stream_source(spark, src_e, schema, "ts", "10 minutes")
        clicks = jobs.stream_source(spark, src_c, schema, "ts", "10 minutes")
        joined = jobs.clicks_before_errors_stream(
            errors, clicks, 600.0, how="left_outer"
        )
        q = (
            joined.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(100, 1, datetime(2021, 1, 1, 10, 0, 0)), (101, 2, datetime(2021, 1, 1, 10, 0, 0))],
        schema,
    ).write.parquet(src_e)
    spark.createDataFrame(
        [(1, 1, datetime(2021, 1, 1, 9, 55, 0))],  # match for 100 only
        schema,
    ).write.parquet(src_c)
    run_once()
    matched = {
        (r["error_id"], r["click_id"]) for r in spark.read.parquet(out).collect()
    }
    assert (100, 1) in matched
    assert not any(e == 101 for e, _ in matched)  # unmatched not yet flushed

    # later traffic pushes the watermark far past error 101's window
    spark.createDataFrame(
        [(999, 9, datetime(2021, 1, 1, 13, 0, 0))], schema
    ).write.mode("append").parquet(src_c)
    spark.createDataFrame(
        [(998, 9, datetime(2021, 1, 1, 13, 0, 0))], schema
    ).write.mode("append").parquet(src_e)
    run_once()
    run_once()  # one more cycle: outer flush uses the PREVIOUS run's watermark
    got = {
        (r["error_id"], r["click_id"]) for r in spark.read.parquet(out).collect()
    }
    assert (101, None) in got, got


def test_streaming_ewma_matches_batch_operator(spark, tmp_path):
    # two micro-batches (batch 2 strictly later in event time so stream
    # arrival order == the batch operator's global (ts, event_id) order);
    # final streamed state must equal the batch integer fold exactly
    from lab_flink_repository_analytics_spark.datapipe import timeseries as TS
    from lab_flink_repository_analytics_spark.streaming import stateful

    src = str(tmp_path / "events")
    out = str(tmp_path / "ewma")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, ts timestamp, value double"

    def run_once():
        events = (
            spark.readStream.schema(schema).parquet(src).withWatermark("ts", "1 day")
        )
        def _upsert(batch_df, _):
            if not batch_df.isEmpty():
                sinks.upsert_by_key(
                    batch_df.sparkSession, batch_df, out, ["user_id"]
                )
        q = (
            stateful.ewma_stream(events)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [
        (1, 1, datetime(2021, 1, 1, 10), 10.0),
        (2, 1, datetime(2021, 1, 1, 11), 20.0),
        (3, 2, datetime(2021, 1, 1, 10), 7.25),
    ]
    batch2 = [
        (4, 1, datetime(2021, 1, 2, 10), 5.5),
        (5, 3, datetime(2021, 1, 2, 10), 1.0),
    ]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    run_once()

    streamed = {
        r["user_id"]: (r["n_events"], r["ewma_scaled"])
        for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    expect = {
        r["user_id"]: (r["n_events"], r["ewma_scaled"])
        for r in TS.ewma_int_df(
            batch_df, ["user_id"], ["ts", "event_id"], "value"
        ).collect()
    }
    assert streamed == expect


def test_compact_parquet_to_size_targets_bytes(spark, tmp_path):
    from lab_flink_repository_analytics_spark.io import sinks

    path = str(tmp_path / "sized")
    df = spark.range(0, 20_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    )
    df.repartition(16).write.parquet(path)
    import glob
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(path + "/*.parquet")
    )
    # aim for ~4 files from the measured bytes
    n = sinks.compact_parquet_to_size(spark, path, target_bytes=max(1, total // 4))
    files = glob.glob(path + "/*.parquet")
    assert n == len(files)
    assert 2 <= n <= 8  # byte-derived, not row-guessed
    assert spark.read.parquet(path).count() == 20_000


def test_compact_parquet_to_size_sees_partitioned_bytes(spark, tmp_path):
    from lab_flink_repository_analytics_spark.io import sinks

    path = str(tmp_path / "parted")
    df = spark.range(0, 8_000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS split", "repeat('y', 64) AS pad"
    )
    df.repartition(12).write.partitionBy("split").parquet(path)
    import glob
    total = sum(
        __import__("os").path.getsize(f)
        for f in glob.glob(path + "/*/*.parquet")
    )
    assert total > 0
    # recursive byte listing: a flat listStatus would see 0 bytes here and
    # collapse everything into one file regardless of target
    n = sinks.compact_parquet_to_size(spark, path, target_bytes=max(1, total // 3))
    assert 2 <= n <= 6
    assert spark.read.parquet(path).count() == 8_000
    # the Hive partition layout must SURVIVE compaction — the rewrite goes
    # through partitionBy, so split=... stays a directory level (partition
    # pruning keeps working), not a demoted data column in flat files
    import os
    subdirs = sorted(
        d for d in os.listdir(path) if d.startswith("split=")
    )
    assert subdirs == ["split=0", "split=1", "split=2"]
    assert not glob.glob(path + "/*.parquet")  # no flat data files
    pruned = spark.read.parquet(path).filter("split = '1'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan
    assert pruned.count() == sum(1 for i in range(8_000) if i % 3 == 1)


def test_streaming_histogram_store_feeds_psi_drift(spark, tmp_path):
    # the live drift gate: a streamed histogram store compared against a
    # frozen reference sketch via psi_drift must equal the all-batch PSI
    from lab_flink_repository_analytics_spark.datapipe import drift
    from lab_flink_repository_analytics_spark.datapipe import sketches as SK

    schema = "event_type string, value double"
    ref_rows = [("a", float(v % 10)) for v in range(100)]
    live_rows1 = [("a", float(v % 10 + 3)) for v in range(40)]
    live_rows2 = [("a", float(v % 10 + 3)) for v in range(40, 90)]

    src = str(tmp_path / "live")
    store = str(tmp_path / "live_hist")
    spark.createDataFrame(live_rows1, schema).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = jobs.value_histogram_stream(
            stream, store, str(tmp_path / "ckpt_drift"), lo=0.0, hi=20.0, bins=10
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(live_rows2, schema).write.mode("append").parquet(src)
    run()

    ref = SK.value_histogram(
        spark.createDataFrame(ref_rows, schema), "value", ["event_type"], 0.0, 20.0, bins=10
    )
    live = spark.read.parquet(store)
    got = drift.psi_drift(ref, live, ["event_type"], 10).collect()[0]
    batch_live = SK.value_histogram(
        spark.createDataFrame(live_rows1 + live_rows2, schema),
        "value", ["event_type"], 0.0, 20.0, bins=10,
    )
    want = drift.psi_drift(ref, batch_live, ["event_type"], 10).collect()[0]
    assert got["psi"] == want["psi"] and got["psi"] > 0.1  # real shift detected
    assert got["n_b"] == 90


def test_streaming_quota_fill_matches_batch_operator(spark, tmp_path):
    # per-source token-budget fill: the final streamed state over two
    # micro-batches (arrival order == the batch operator's salted-md5
    # order, per source) must equal the batch quota_fill exactly
    import hashlib

    from lab_flink_repository_analytics_spark.queries import analytics_extra as AX
    from lab_flink_repository_analytics_spark.streaming import stateful

    src = str(tmp_path / "docs")
    out = str(tmp_path / "fill")
    ckpt = str(tmp_path / "ckpt_fill")
    schema = "source string, doc_id long, text string"

    rows = [
        ("web" if i % 2 == 0 else "book", i, " ".join(["w"] * (3 + i % 5)))
        for i in range(1, 13)
    ]

    def h(doc_id):
        return int(hashlib.md5(f"quota{doc_id}".encode()).hexdigest()[:8], 16)

    # per-source md5 fill order, split into a prefix batch and the rest —
    # so stream arrival order equals the batch operator's window order
    by_source: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (h(r[1]), r[1])):
        by_source.setdefault(r[0], []).append(r)
    batch1 = [r for rs in by_source.values() for r in rs[:2]]
    batch2 = [r for rs in by_source.values() for r in rs[2:]]

    quotas = {"web": 11, "book": 9}  # partial fills w/ boundary crossings

    def run_once():
        docs = spark.readStream.schema(schema).parquet(src)

        def _upsert(batch_df, _):
            if not batch_df.isEmpty():
                sinks.upsert_by_key(
                    batch_df.sparkSession, batch_df, out, ["source"]
                )

        q = (
            stateful.quota_fill_stream(docs, quotas)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    run_once()

    streamed = {
        r["source"]: (r["token_quota"], r["n_docs_selected"], r["n_tokens_selected"])
        for r in spark.read.parquet(out).collect()
    }
    quotas_df = spark.createDataFrame(
        list(quotas.items()), "source string, token_quota bigint"
    )
    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    expect = {
        r["source"]: (r["token_quota"], r["n_docs_selected"], r["n_tokens_selected"])
        for r in AX.quota_fill(batch_df, quotas_df).collect()
    }
    assert streamed == expect


def test_streaming_commit_activity_restart_resume_sf001(spark, tmp_path):
    # the FLAGSHIP pipeline under real micro-batching at sf0.01: commits
    # synthesized from orders exactly like the graded `commit_activity`
    # query, split at the median commitDate into two drops, two
    # availableNow runs of run_commit_activity_job sharing one checkpoint
    # (the second is a restart resuming from source offsets + window
    # state), final upserted state == the same aggregation run in batch.
    # Mirrors GithubCommitSource.java:148-166 (resume) +
    # FlinkCommitProgram.java:96-141 (idempotent ES upsert).
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    k = F.col("o_orderkey")

    def fc(prefix_expr, mult):
        return F.struct(
            prefix_expr.alias("filename"),
            F.lit(0).alias("linesAdded"),
            ((k * mult) % 100).cast("int").alias("linesChanged"),
            F.lit(0).alias("linesRemoved"),
        )

    ns = F.lit(None).cast("string")
    nt = F.lit(None).cast("timestamp")
    commits = orders.select(
        ns.alias("author"),
        nt.alias("authorDate"),
        ns.alias("authorEmail"),
        F.col("o_orderdate").cast("timestamp").alias("commitDate"),
        ns.alias("committer"),
        ns.alias("committerEmail"),
        F.array(
            fc(F.concat(F.lit("flink-"), (k % 7).cast("string"), F.lit("/src/main/java/A.java")), 7),
            fc(F.concat(F.lit("docs/content/p"), (k % 5).cast("string"), F.lit(".md")), 11),
            fc(F.when(k % 4 == 0, F.lit("LICENSE")).otherwise(F.lit("tools/ci/t.sh")), 13),
        ).alias("filesChanged"),
        ns.alias("sha1"),
        ns.alias("shortInfo"),
    )
    split = commits.selectExpr(
        "percentile_approx(commitDate, 0.5) AS m"
    ).first()["m"]
    src = str(tmp_path / "commits")
    out = str(tmp_path / "summaries")
    ckpt = str(tmp_path / "ckpt")
    # one file per drop: within a micro-batch the watermark only advances
    # AFTER the batch, so unordered rows inside one drop can't be dropped
    # as late; across drops the median split keeps drop2 >= drop1's max
    # minus the 1-day watermark delay
    commits.filter(F.col("commitDate") < F.lit(split)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = jobs.run_commit_activity_job(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(180)
    mid = {
        (r["componentName"], r["windowStart"]): r["linesChanged"]
        for r in spark.read.parquet(out).collect()
    }
    commits.filter(F.col("commitDate") >= F.lit(split)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = jobs.run_commit_activity_job(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(180)

    got = {
        (r["componentName"], r["windowStart"]): r["linesChanged"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["componentName"], r["windowStart"]): r["linesChanged"]
        for r in jobs.commit_activity_stream(commits).collect()  # batch mode
    }
    assert got == want and len(want) > 0
    # the restart did real work: the second run added/updated windows
    assert mid != got and len(mid) > 0


def test_streaming_quiet_sessions_restart_resume_sf001(spark, tmp_path):
    # the graded quiet_sessions (12h session windows per user, HAVING
    # cnt < 2) under real micro-batching at sf0.01: events split at the
    # median ts so sessions STRADDLE the restart — batch-2 rows within
    # the gap must merge into open sessions from the checkpointed state,
    # not open new ones.  A far-future closer row (user -1) pushes the
    # watermark past every real session so the append-mode emitted set is
    # complete, then must equal the graded batch query exactly.
    from datetime import timedelta

    from lab_flink_repository_analytics_spark.queries import suite
    from lab_flink_repository_analytics_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"].select(
        "user_id", "ts"
    )
    rows = ev.orderBy("ts", "user_id").collect()
    half = len(rows) // 2
    closer = (-1, rows[-1]["ts"] + timedelta(days=100))
    src = str(tmp_path / "ev")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, ts timestamp"

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )

        def _sink(batch_df, _):
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out)

        q = (
            jobs.quiet_sessions_stream(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(rows[:half], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    spark.createDataFrame(rows[half:] + [closer], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["cnt"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != -1
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["cnt"])
        for r in suite.quiet_sessions(spark, "/root/testdata/sf0.01").collect()
    }
    assert got == want and len(want) > 0
    # the split actually straddled sessions: some user has rows on both
    # sides of the boundary within the gap, exercising state restore
    boundary = rows[half]["ts"]
    left_last = {}
    for r in rows[:half]:
        left_last[r["user_id"]] = r["ts"]
    straddled = sum(
        1
        for r in rows[half:]
        if r["user_id"] in left_last
        and (r["ts"] - left_last[r["user_id"]]) < timedelta(hours=12)
    )
    assert straddled > 0, boundary


def test_streaming_windowed_dedup_restart_resume_sf001(spark, tmp_path):
    # the graded windowed-dedup surface under REAL micro-batching at
    # sf0.01: file-drop readStream + checkpoint dir, two availableNow
    # runs (the second is a restart that must resume from the source
    # offsets + dedup state in the checkpoint), final emitted set equals
    # the batch twin on the full table.  Events are dropped in
    # (ts, event_id) order — the keyed-stream parity contract — with one
    # file per drop so within-batch arrival order is the file order.
    from lab_flink_repository_analytics_spark.datapipe import dedup as DD
    from lab_flink_repository_analytics_spark.streaming import stateful

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_id", "user_id", "event_type", "ts")
    )
    rows_sorted = ev.orderBy("ts", "event_id").collect()
    half = len(rows_sorted) // 2
    src = str(tmp_path / "ev")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        dd = stateful.windowed_dedup_stream(
            stream, ["user_id", "event_type"], "ts", "1 hour", "2 hours"
        )

        def _sink(batch_df, _):
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out)

        q = (
            dd.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(rows_sorted[:half], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    spark.createDataFrame(rows_sorted[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    want = {
        r["event_id"]
        for r in DD.windowed_dedup(
            ev, ["user_id", "event_type"], "ts", "1 hour", order_col="event_id"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_quota_fill_restart_resume_sf001(spark, tmp_path):
    # quota_fill_stream at sf0.01 under real micro-batching: per-source
    # quotas sized so the budget boundary is crossed in the SECOND drop —
    # the counters that survive the restart via the checkpointed state
    # are what decide the crossing doc, mirroring the reference's source
    # checkpoint contract (GithubCommitSource.java:148-166)
    import hashlib

    from lab_flink_repository_analytics_spark.queries import analytics_extra as AX
    from lab_flink_repository_analytics_spark.streaming import stateful

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("source", "doc_id", "text")
        .collect()
    )

    def h(doc_id):
        return int(hashlib.md5(f"quota{doc_id}".encode()).hexdigest()[:8], 16)

    by_source: dict[str, list] = {}
    for r in sorted(docs, key=lambda r: (h(r["doc_id"]), r["doc_id"])):
        by_source.setdefault(r["source"], []).append(r)
    drop1 = [r for rs in by_source.values() for r in rs[:10]]
    drop2 = [r for rs in by_source.values() for r in rs[10:]]
    quotas = {
        s: int(0.6 * sum(len(r["text"].split(" ")) for r in rs))
        for s, rs in by_source.items()
    }

    src = str(tmp_path / "docs")
    out = str(tmp_path / "fill_out")
    ckpt = str(tmp_path / "fill_ckpt")
    schema = "source string, doc_id bigint, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)

        def _upsert(batch_df, _):
            if not batch_df.isEmpty():
                sinks.upsert_by_key(
                    batch_df.sparkSession, batch_df, out, ["source"]
                )

        q = (
            stateful.quota_fill_stream(stream, quotas)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(drop1, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(drop2, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()

    streamed = {
        r["source"]: (r["token_quota"], r["n_docs_selected"], r["n_tokens_selected"])
        for r in spark.read.parquet(out).collect()
    }
    quotas_df = spark.createDataFrame(
        list(quotas.items()), "source string, token_quota bigint"
    )
    batch_df = spark.createDataFrame(drop1 + drop2, schema)
    expect = {
        r["source"]: (r["token_quota"], r["n_docs_selected"], r["n_tokens_selected"])
        for r in AX.quota_fill(batch_df, quotas_df).collect()
    }
    assert streamed == expect
    # the crossing really happened after the restart for most sources:
    # each source's first 10 docs must NOT already exhaust its quota
    crossed_late = sum(
        1
        for s, rs in by_source.items()
        if sum(len(r["text"].split(" ")) for r in rs[:10]) < quotas[s]
    )
    assert crossed_late >= len(by_source) // 2


def test_rename_or_raise_rejects_false_return():
    # Hadoop FileSystem.rename reports many failures by RETURNING FALSE
    # (dest exists, src missing, permission on some object stores) instead
    # of throwing.  A swallowed false in _swap_in means: path->._old fails
    # silently, ._tmp->path then also fails (dest still exists), the call
    # reports success with the merge unapplied, and the NEXT call's step-1
    # cleanup deletes the committed ._tmp — a silently dropped upsert.
    class _FakeFs:
        def __init__(self, ok):
            self._ok = ok
            self.calls = []

        def rename(self, src, dst):
            self.calls.append((src, dst))
            return self._ok

    sinks._rename_or_raise(_FakeFs(True), "a", "b")  # true passes through
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="rename failed"):
        sinks._rename_or_raise(_FakeFs(False), "a", "b")


def test_recover_swap_warns_when_nothing_salvageable(spark, tmp_path, caplog):
    # exists-but-empty `path` (crash before any complete copy existed) with
    # neither a _SUCCESS-marked ._tmp nor ._old: recovery finds nothing.
    # It must WARN so an operator can tell "crash left no complete copy"
    # apart from "never written" when the subsequent read fails.
    import logging
    import os

    path = str(tmp_path / "ds")
    os.makedirs(path)  # unhealthy: exists, zero entries
    with caplog.at_level(logging.WARNING, logger="lab_flink_repository_analytics_spark.io.sinks"):
        sinks._recover_swap(spark, path)
    assert any("no salvageable copy" in r.message for r in caplog.records)

    # healthy path or plain-missing path must NOT warn (first-call case)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="lab_flink_repository_analytics_spark.io.sinks"):
        sinks._recover_swap(spark, str(tmp_path / "never_written"))
    assert not caplog.records


def test_streaming_sliding_activity_restart_resume_sf001(spark, tmp_path):
    # the HOP-window twin under real micro-batching at sf0.01: events
    # split at the median ts into two drops, two availableNow runs
    # sharing one checkpoint (run 2 is a restart that must merge batch-2
    # rows into OPEN hop windows from the checkpointed state), final
    # append-mode emitted set == the same aggregation in batch mode.
    from datetime import timedelta

    from lab_flink_repository_analytics_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"].select(
        "event_type", "ts"
    )
    rows = ev.collect()
    split = sorted(r["ts"] for r in rows)[len(rows) // 2]
    closer = ("___closer___", max(r["ts"] for r in rows) + timedelta(days=100))
    src = str(tmp_path / "ev")
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_type string, ts timestamp"

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        q = (
            jobs.sliding_activity_stream(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    first = [r for r in rows if r["ts"] < split]
    second = [tuple(r) for r in rows if r["ts"] >= split] + [closer]
    spark.createDataFrame(first, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()
    mid_rows = spark.read.parquet(out).count()
    spark.createDataFrame(second, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()

    key = lambda r: (r["window_start"], r["window_end"], r["event_type"], r["events"])  # noqa: E731
    got = {
        key(r)
        for r in spark.read.parquet(out).collect()
        if r["event_type"] != "___closer___"
    }
    batch_in = spark.createDataFrame([tuple(r) for r in rows] + [closer], schema)
    want = {
        key(r)
        for r in jobs.sliding_activity_stream(batch_in).collect()
        if r["event_type"] != "___closer___"
    }
    assert got == want and len(want) > 0
    # restart did real work: run 2 closed windows run 1 could not, and at
    # least one emitted window STRADDLES the split (state restored, both
    # drops contributed to it)
    assert 0 < mid_rows < len(got)
    assert any(ws < split < we for ws, we, _, _ in got)


def test_streaming_session_threads_restart_resume_sf001(spark, tmp_path):
    # the unanswered-threads session twin (README session query) at
    # sf0.01 scale: emails synthesized from orders (thread key from
    # custkey, Re:-prefix variety so NormalizeEmailThread matters), split
    # at the median date, two runs sharing one checkpoint; sessions
    # straddling the split must merge from restored state; final emitted
    # set == the same session aggregation in batch mode.
    from datetime import timedelta

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    emails_df = orders.select(
        F.concat(
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("Re: ")).otherwise(F.lit("")),
            F.lit("[DISCUSS] topic-"),
            (F.col("o_custkey") % 200).cast("string"),
        ).alias("subject"),
        F.col("o_orderdate").cast("timestamp").alias("date"),
    )
    rows = [tuple(r) for r in emails_df.collect()]
    split = sorted(d for _, d in rows)[len(rows) // 2]
    closer = ("___closer___", max(d for _, d in rows) + timedelta(days=400))
    src = str(tmp_path / "mails")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    schema = "subject string, date timestamp"

    def run_once():
        emails = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("date", "1 day")
        )
        q = (
            jobs.session_threads_stream(emails)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [r for r in rows if r[1] < split], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(
        [r for r in rows if r[1] >= split] + [closer], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    key = lambda r: (r["thread"], r["session_end"], r["cnt"])  # noqa: E731
    got = {
        key(r)
        for r in spark.read.parquet(out).collect()
        if r["thread"] != "___closer___"
    }
    batch_in = spark.createDataFrame(rows + [closer], schema)
    want = {
        key(r)
        for r in jobs.session_threads_stream(batch_in).collect()
        if r["thread"] != "___closer___"
    }
    assert got == want and len(want) > 0
    # some thread has messages within the 30d gap on BOTH sides of the
    # split — those sessions merged from checkpointed state on restart
    from collections import defaultdict

    last_left = {}
    for s, d in rows:
        if d < split:
            last_left[s] = max(last_left.get(s, d), d)
    straddled = sum(
        1
        for s, d in rows
        if d >= split
        and s in last_left
        and (d - last_left[s]) < timedelta(days=30)
    )
    assert straddled > 0


def test_streaming_minhash_dedup_restart_resume_sf001(spark, tmp_path):
    # stateful MinHash-LSH banding at sf0.01 (the full documents table):
    # the SAME doc stream run (a) in one availableNow pass and (b) split
    # into two passes sharing a checkpoint must emit the IDENTICAL
    # candidate-pair set — the band-bucket state restored on restart
    # pairs batch-2 docs against batch-1 members exactly as the single
    # run's in-memory state did.  Drops respect doc_id order, matching
    # _update_band's per-batch id sort, so the fold order is identical.
    from lab_flink_repository_analytics_spark.streaming import stateful

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    rows = [tuple(r) for r in docs.collect()]
    half_id = rows[len(rows) // 2][0]
    schema = "doc_id long, text string"

    def run(src, out, ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stateful.minhash_dedup_stream(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda b, _: None
                if b.isEmpty()
                else b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def pairs(out):
        import os

        if not os.path.exists(out):
            return set()
        return {
            (r["id_a"], r["id_b"], r["band_key"], round(r["est_jaccard"], 9))
            for r in spark.read.parquet(out).collect()
        }

    # (a) single run, all docs
    src_a, out_a, ck_a = (str(tmp_path / p) for p in ("da", "pa", "ca"))
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src_a)
    run(src_a, out_a, ck_a)
    # (b) two runs, split at the median doc_id, shared checkpoint
    src_b, out_b, ck_b = (str(tmp_path / p) for p in ("db", "pb", "cb"))
    spark.createDataFrame(
        [r for r in rows if r[0] < half_id], schema
    ).coalesce(1).write.mode("append").parquet(src_b)
    run(src_b, out_b, ck_b)
    spark.createDataFrame(
        [r for r in rows if r[0] >= half_id], schema
    ).coalesce(1).write.mode("append").parquet(src_b)
    run(src_b, out_b, ck_b)

    single, split_run = pairs(out_a), pairs(out_b)
    assert single == split_run and len(single) > 0
    # the restart found CROSS-BOUNDARY candidates (batch-2 doc paired
    # against restored batch-1 state), not just within-batch ones
    assert any(a < half_id <= b for a, b, _, _ in split_run)


def test_streaming_ewma_restart_resume_sf001(spark, tmp_path):
    # per-user integer EWMA at sf0.01 (full events table): split at the
    # median ts, two availableNow runs sharing one checkpoint; the
    # restart must resume each user's (n, y) state, and the final
    # upserted state must equal the batch integer fold over the global
    # (ts, event_id) order — bit-exact, scaled-int recurrence.
    from lab_flink_repository_analytics_spark.datapipe import timeseries as TS
    from lab_flink_repository_analytics_spark.session import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01")["events"].select(
        "event_id", "user_id", "ts", "value"
    )
    rows = [tuple(r) for r in ev.collect()]
    split = sorted(r[2] for r in rows)[len(rows) // 2]
    src = str(tmp_path / "ev")
    out = str(tmp_path / "ewma")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, ts timestamp, value double"

    def run_once():
        from lab_flink_repository_analytics_spark.streaming import stateful

        events = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 day")
        )

        def _upsert(batch_df, _):
            if not batch_df.isEmpty():
                sinks.upsert_by_key(
                    batch_df.sparkSession, batch_df, out, ["user_id"]
                )

        q = (
            stateful.ewma_stream(events)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [r for r in rows if r[2] < split], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    mid = {
        r["user_id"]: (r["n_events"], r["ewma_scaled"])
        for r in spark.read.parquet(out).collect()
    }
    spark.createDataFrame(
        [r for r in rows if r[2] >= split], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    streamed = {
        r["user_id"]: (r["n_events"], r["ewma_scaled"])
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        r["user_id"]: (r["n_events"], r["ewma_scaled"])
        for r in TS.ewma_int_df(
            ev, ["user_id"], ["ts", "event_id"], "value"
        ).collect()
    }
    assert streamed == expect and len(expect) > 0
    # the restart continued from restored state: counts strictly grew
    assert any(
        mid.get(u, (0, None))[0] < n for u, (n, _) in streamed.items()
    ) and len(mid) > 0


def test_word_topk_store_recovers_from_mid_swap_crash(spark, tmp_path):
    # round 9: the counter-store merge now rides the upsert sink's
    # crash-safe rename swap (the old form double-wrote tmp→store with a
    # corruption window between the overwrites).  Simulate a crash
    # BETWEEN the two renames — store displaced to ._old, committed merge
    # complete in ._tmp — and verify the next run salvages the committed
    # copy and keeps counting on top of it.
    import shutil

    src = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    def run():
        q = jobs.word_topk_stream(
            spark.readStream.schema("doc_id long, text string").parquet(src),
            store, ck,
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, "a b a"), (2, "b c")], "doc_id long, text string").write.parquet(src)
    run()
    # mid-swap crash state: ._old = pre-merge garbage, ._tmp = the
    # committed post-batch-1 store
    shutil.move(store, store + "._tmp")
    spark.createDataFrame([("stale", 99)], "word string, cnt long").write.parquet(store + "._old")
    spark.createDataFrame([(3, "a d d d")], "doc_id long, text string").write.mode("append").parquet(src)
    run()
    got = {(r["word"], r["cnt"]) for r in jobs.read_topk(spark, store, 10).collect()}
    assert got == {("a", 3), ("d", 3), ("b", 2), ("c", 1)}
    import os

    assert not os.path.exists(store + "._tmp") and not os.path.exists(store + "._old")


def test_value_histogram_store_ignores_aborted_tmp(spark, tmp_path):
    # aborted tmp write (no _SUCCESS): the histogram merge must leave the
    # healthy store alone and not read the garbage
    import os

    import lab_flink_repository_analytics_spark.datapipe.sketches as SK

    src = str(tmp_path / "vals")
    store = str(tmp_path / "hist")
    schema = "event_type string, value double"
    spark.createDataFrame([("a", 5.0), ("a", 15.0)], schema).write.parquet(src)

    def run():
        q = jobs.value_histogram_stream(
            spark.readStream.schema(schema).parquet(src),
            store, str(tmp_path / "ck"), lo=0.0, hi=100.0, bins=10,
        )
        q.awaitTermination(120)

    run()
    os.makedirs(store + "._tmp")
    with open(store + "._tmp/part-garbage.parquet", "wb") as f:
        f.write(b"not parquet")
    spark.createDataFrame([("a", 25.0)], schema).write.mode("append").parquet(src)
    run()
    got = spark.read.parquet(store)
    expected = SK.value_histogram(
        spark.createDataFrame([("a", 5.0), ("a", 15.0), ("a", 25.0)], schema),
        "value", ["event_type"], 0.0, 100.0, bins=10,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    assert not os.path.exists(store + "._tmp")
