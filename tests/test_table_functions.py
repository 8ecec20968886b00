"""Table-function (explode) tests — ExpandJiraTicketComponents[2]ITCase
golden vectors (FIXTURES.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.functions import table as T

TWO = "          Components: Tests, Formats (JSON, Avro, Parquet, ORC, SequenceFile)"


def _df(spark):
    return spark.createDataFrame(
        [(1, ""), (2, "          Components: Tests"), (3, TWO), (4, None)],
        "id: int, body: string",
    )


def test_expand_outer(spark):
    # LEFT JOIN LATERAL ... ON TRUE: empty body keeps its row with NULL
    # (ExpandJiraTicketComponentsITCase.java:62-68)
    df = _df(spark).select("id", T.expand_jira_ticket_components("body").alias("c"))
    got = sorted([(r["id"], r["c"]) for r in df.collect()])
    assert got == [
        (1, None),
        (2, "Tests"),
        (3, "Formats (JSON, Avro, Parquet, ORC, SequenceFile)"),
        (3, "Tests"),
        (4, None),
    ]


def test_expand_inner(spark):
    # CROSS JOIN UNNEST: non-matching rows dropped
    df = _df(spark).select(
        "id", T.expand_jira_ticket_components("body", outer=False).alias("c")
    )
    assert sorted(r["id"] for r in df.collect()) == [2, 3, 3]


def test_expand2_with_count(spark):
    # ExpandJiraTicketComponents2ITCase.java:85-91: componentCount = total
    df = (
        _df(spark)
        .select("id", T.expand_jira_ticket_components2("body").alias("s"))
        .select("id", "s.component", "s.componentCount")
    )
    got = sorted([tuple(r) for r in df.collect()], key=repr)
    assert (2, "Tests", 1) in got
    assert (3, "Tests", 2) in got
    assert (3, "Formats (JSON, Avro, Parquet, ORC, SequenceFile)", 2) in got
    assert (1, None, None) in got


def test_expand_components_python_udtf(spark):
    # the SQL LATERAL surface: same rows as the codegen explode form
    from lab_flink_repository_analytics_spark.functions import udtf as U

    U.register(spark)
    df = spark.createDataFrame(
        [(1, ["API", "Runtime"]), (2, []), (3, None)],
        "id int, components array<string>",
    )
    df.createOrReplaceTempView("tickets_udtf")
    out = spark.sql(
        """
        SELECT id, component, componentCount
        FROM tickets_udtf, LATERAL expand_jira_components(components)
        """
    ).collect()
    got = sorted((r["id"], r["component"], r["componentCount"]) for r in out)
    assert got == [(1, "API", 2), (1, "Runtime", 2)]
