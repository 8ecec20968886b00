"""Scalar function tests — golden vectors from the reference ITCases
(FIXTURES.md §2; file:line citations inline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from lab_flink_repository_analytics_spark.functions import scalar as S


def _eval1(spark, fn, values, in_type="string"):
    schema = StructType([StructField("x", StringType() if in_type == "string" else None)])
    df = spark.createDataFrame([(v,) for v in values], "x: " + in_type)
    return [r[0] for r in df.select(fn(F.col("x")).alias("y")).collect()]


# --- GetSourceComponent (GetSourceComponent.java, PatternUtils.java:8-10) ---
@pytest.mark.parametrize(
    "filename,component",
    [
        ("flink-core/src/main/java/X.java", "flink-core"),
        # reference quirk: the pom.xml/README.md lookahead branches have no
        # leading '/', so the reluctant prefix keeps the trailing slash
        ("flink-runtime/pom.xml", "flink-runtime/"),
        ("flink-table/flink-table-api/src/main/F.java", "flink-table/flink-table-api"),
        ("docs/content/y.md", "docs"),
        ("flink-docs/a/b.md", "flink-docs"),
        ("tools/ci/x.sh", "tools"),
        ("flink-python/pyflink/a.py", "flink-python"),
        ("flink-end-to-end-tests/test-scripts/common.sh", "flink-end-to-end-tests/test-scripts"),
        ("flink-end-to-end-tests/run-nightly.sh", "flink-end-to-end-tests"),
        ("flink-scala-shell/start-script/start.sh", "flink-scala-shell"),
        ("flink-container/Dockerfile", "flink-container"),
        ("flink-contrib/docker-flink/x", "flink-contrib/docker-flink"),
        ("flink-table/flink-sql-client/conf/x", "flink-table/flink-sql-client"),
        ("LICENSE", None),
        ("", None),
        (None, None),
    ],
)
def test_get_source_component(spark, filename, component):
    assert _eval1(spark, S.get_source_component, [filename]) == [component]


# --- IsJiraTicket (IsJiraTicket.java; false on null per :14-15) ---
@pytest.mark.parametrize(
    "raw,expected",
    [
        ('"Jane Doe (Jira)" <jira@apache.org>', True),
        ('"Jane Doe (JIRA)" <jira@apache.org>', True),
        ('"Jane Doe" <jane@example.com>', False),
        ("plain text", False),
        (None, False),
    ],
)
def test_is_jira_ticket(spark, raw, expected):
    assert _eval1(spark, S.is_jira_ticket, [raw]) == [expected]


# --- NormalizeEmailThread (NormalizeEmailThread.java, PatternUtils.java:16-17) ---
@pytest.mark.parametrize(
    "subject,expected",
    [
        ("Re: Re: How do I X?", "How do I X?"),
        ("AW: something", "something"),
        ("re: aw: RE: mixed", "mixed"),
        ("  plain  ", "plain"),
        ("Re:", ""),
        (None, None),
    ],
)
def test_normalize_email_thread(spark, subject, expected):
    assert _eval1(spark, S.normalize_email_thread, [subject]) == [expected]


# --- Jira subject/from extraction (GetJiraTicket*.java) ---
JIRA_SUBJ = "[jira] [Created] (FLINK-12345) Some title"


def test_jira_subject_functions(spark):
    assert _eval1(spark, S.get_jira_ticket_number, [JIRA_SUBJ, "other", None]) == [
        "FLINK-12345",
        None,
        None,
    ]
    assert _eval1(spark, S.get_jira_ticket_action, [JIRA_SUBJ, "other", None]) == [
        "Created",
        None,
        None,
    ]


def test_jira_from(spark):
    raw = '"Jane Doe (Jira)" <jira@apache.org>'
    # group includes trailing space before '(' per the reference's greedy
    # "(?<ticketauthor>.*)\s*" — Java backtracking leaves it in the group
    out = _eval1(spark, S.get_jira_ticket_from, [raw, "nope", None])
    assert out[0].strip() == "Jane Doe"
    assert out[1] is None and out[2] is None


# --- GetJiraTicketComponents tri-state (FIXTURES.md §2) ---
def test_jira_components(spark):
    body_two = "          Components: Tests, Formats (JSON, Avro, Parquet, ORC, SequenceFile)"
    out = _eval1(
        spark,
        S.get_jira_ticket_components,
        [body_two, "          Components: Tests", "no components here", "", None],
    )
    assert out[0] == ["Tests", "Formats (JSON, Avro, Parquet, ORC, SequenceFile)"]
    assert out[1] == ["Tests"]
    assert out[2] == []
    assert out[3] == []
    assert out[4] is None


# --- Obfuscate (ObfuscateITCase.java:62-106 golden hashes) ---
def test_obfuscate(spark):
    out = _eval1(spark, S.obfuscate, ["john", "alice", "bob", "john@test.com", None])
    assert out == ["527bd5", "6384e2", "9f9d51", "527bd5@test.com", None]


def test_obfuscate_array(spark):
    df = spark.createDataFrame([(["alice", "alice"],), (None,)], "x: array<string>")
    out = [r[0] for r in df.select(S.obfuscate_array("x")).collect()]
    assert out == [["6384e2", "6384e2"], None]


# --- ArrayRepeat (ArrayRepeatITCase.java:62-105) ---
def test_array_repeat(spark):
    df = spark.createDataFrame(
        [("john", 1), ("alice", 2), (None, 2), ("x", None)], "x: string, n: int"
    )
    out = [r[0] for r in df.select(S.array_repeat_nullsafe("x", "n")).collect()]
    assert out == [["john"], ["alice", "alice"], None, None]

    df2 = spark.createDataFrame([(7, 2)], "x: int, n: int")
    assert df2.select(S.array_repeat_nullsafe("x", "n")).collect()[0][0] == [7, 7]


# --- SQL registration surface ---
def test_sql_registration(spark):
    S.register_sql_functions(spark)
    row = spark.sql(
        "SELECT Obfuscate('john@test.com') AS o, "
        "GetSourceComponent('flink-core/src/X.java') AS c, "
        "IsJiraTicket(NULL) AS j, "
        "NormalizeEmailThread('Re: hi') AS n, "
        "GetJiraTicketComponents('          Components: Tests') AS comps, "
        "ArrayRepeatString('a', 2) AS ar"
    ).collect()[0]
    assert row.o == "527bd5@test.com"
    assert row.c == "flink-core"
    assert row.j is False
    assert row.n == "hi"
    assert row.comps == ["Tests"]
    assert row.ar == ["a", "a"]
