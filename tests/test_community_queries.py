"""Tests for the four README queries (queries/community.py) over hand-built
domain rows (FIXTURES.md §1/§3 shapes)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark import schemas
from lab_flink_repository_analytics_spark.queries import community as CQ


def _email(date, from_raw="", from_email="", subject="", text_body=""):
    return (date, from_email, from_raw, None, subject, text_body)


def _emails_df(spark, rows):
    return spark.createDataFrame(rows, schemas.EMAIL)


def test_distinct_users_per_window(spark):
    rows = [
        _email(datetime(2021, 3, 1), from_email="a@x.com"),
        _email(datetime(2021, 3, 2), from_email="b@x.com"),
        _email(datetime(2021, 6, 1), from_email="a@x.com"),  # same user, same 365d window
        _email(datetime(2022, 3, 1), from_email="a@x.com"),  # next window
    ]
    out = CQ.distinct_users_per_window(_emails_df(spark, rows)).collect()
    counts = sorted(r["cnt"] for r in out)
    assert counts == [1, 2]


def test_unanswered_threads(spark):
    rows = [
        # thread "How do I X?": two messages close together -> answered
        _email(datetime(2021, 5, 1), subject="How do I X?"),
        _email(datetime(2021, 5, 2), subject="Re: How do I X?"),
        # thread "help": single message -> unanswered
        _email(datetime(2021, 5, 3), subject="help"),
        # thread "old": outside the 1-year lookback -> excluded
        _email(datetime(2019, 1, 1), subject="old"),
    ]
    out = CQ.unanswered_threads(
        _emails_df(spark, rows), now="2021-06-01 00:00:00"
    ).collect()
    assert [r["thread"] for r in out] == ["help"]
    assert out[0]["cnt"] == 1


def _commit(date, files):
    return (None, None, None, date, None, None, files, None, None)


def test_commit_activity_per_component(spark):
    f = lambda name, lines: (name, 0, lines, 0)  # noqa: E731
    rows = [
        _commit(datetime(2021, 1, 1), [f("flink-core/src/main/A.java", 900)]),
        _commit(datetime(2021, 1, 2), [f("flink-core/src/main/B.java", 200)]),
        _commit(datetime(2021, 1, 3), [f("docs/x.md", 50), f("LICENSE", 9999)]),
    ]
    df = spark.createDataFrame(rows, schemas.COMMIT)
    out = CQ.commit_activity_per_component(df, min_lines=1000).collect()
    # flink-core: 1100 > 1000 kept; docs: 50 dropped; NULL (LICENSE): 9999 kept
    got = {r["component"]: r["lines_changed"] for r in out}
    assert got == {"flink-core": 1100, None: 9999}


def test_jira_tickets_per_component(spark):
    jira_from = '"Jane Doe (Jira)" <jira@apache.org>'
    created = "[jira] [Created] (FLINK-1) t"
    body = "          Components: Tests, Runtime"
    rows = [
        _email(datetime(2021, 1, 1), from_raw=jira_from, subject=created, text_body=body),
        _email(datetime(2021, 1, 2), from_raw=jira_from, subject=created, text_body=body),
        # not from jira -> filtered
        _email(datetime(2021, 1, 3), from_raw="someone", subject=created, text_body=body),
        # updated, not created -> filtered
        _email(
            datetime(2021, 1, 4),
            from_raw=jira_from,
            subject="[jira] [Updated] (FLINK-1) t",
            text_body=body,
        ),
        # created but no components line -> drops out of the inner unnest
        _email(
            datetime(2021, 1, 5), from_raw=jira_from, subject=created, text_body="none"
        ),
    ]
    out = CQ.jira_tickets_per_component(
        _emails_df(spark, rows), min_tickets=1
    ).collect()
    got = {r["component"]: r["created_tickets"] for r in out}
    assert got == {"Tests": 2, "Runtime": 2}


def test_commit_activity_window_bounds(spark):
    rows = [_commit(datetime(2021, 1, 1), [("flink-core/src/A.java", 0, 2000, 0)])]
    df = spark.createDataFrame(rows, schemas.COMMIT)
    out = CQ.commit_activity_per_component(df, min_lines=100).collect()[0]
    # 30-day windows are epoch-aligned; 2021-01-01 is epoch day 18628,
    # floor(18628/30)*30 = 18600 → window starts 2020-12-04
    assert out["window_start"] == datetime(2020, 12, 4)
    assert out["window_end"] == datetime(2021, 1, 3)


def test_commit_activity_early_return_quirk(spark):
    # ComponentExtractor.java:41-45: the DataStream pipeline RETURNS (not
    # continues) on the first unmatched filename — files after it are lost.
    # Per-file (default/SQL) semantics count every matched file.
    f = lambda name, lines: (name, 0, lines, 0)  # noqa: E731
    rows = [
        _commit(
            datetime(2021, 1, 1),
            [
                f("flink-core/src/main/A.java", 1500),
                f("LICENSE", 5000),  # no component → quirk aborts here
                f("flink-runtime/src/main/B.java", 2000),  # lost in quirk mode
            ],
        ),
    ]
    df = spark.createDataFrame(rows, schemas.COMMIT)
    faithful = CQ.commit_activity_per_component(
        df, min_lines=0, early_return=True
    ).collect()
    got = {r["component"]: r["lines_changed"] for r in faithful}
    assert got == {"flink-core": 1500}  # only the pre-abort prefix survives
    per_file = CQ.commit_activity_per_component(df, min_lines=0).collect()
    got2 = {r["component"]: r["lines_changed"] for r in per_file}
    assert got2 == {"flink-core": 1500, "flink-runtime": 2000, None: 5000}
