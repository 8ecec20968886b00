"""Scalar function library (ref: sql-functions module, SURVEY.md §2.D).

Every function here is a **pure Column expression** — regex/string/hash work
that Catalyst folds into whole-stage codegen.  No Python UDFs: at 100 TB a
row-at-a-time Python hop on these hot columns would dominate the runtime.

Null semantics follow the reference exactly: NULL in → NULL out (except
``is_jira_ticket`` which maps NULL → false, ref IsJiraTicket.java:14-15).

The reference applies its patterns with ``matches()``; the anchored pattern
constants in :mod:`..patterns` plus the ``_extract_or_null`` helper bridge
that to Spark's find()-semantics regexp functions.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark import patterns as P


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _extract_or_null(col: Column, pattern: str, group: int) -> Column:
    """``regexp_extract`` that yields NULL when the pattern does not match.

    Spark's ``regexp_extract`` returns ``''`` both on no-match and on an
    empty capture; the reference distinguishes them (no-match → NULL,
    ref GetSourceComponent.java:21-24).  An ``rlike`` guard on the same
    pattern keeps both cases correct and stays inside codegen.
    """
    return F.when(col.rlike(pattern), F.regexp_extract(col, pattern, group))


def get_source_component(filename: Column | str) -> Column:
    """Flink component from a repo-relative path; NULL if no match.

    ref GetSourceComponent.java:13-27, PatternUtils.java:8-10.
    e.g. ``flink-core/src/main/java/X.java`` → ``flink-core``,
    ``docs/content/y.md`` → ``docs``, ``LICENSE`` → NULL.
    """
    col = _c(filename)
    return _extract_or_null(col, P.SOURCE_FILENAME_COMPONENT_PATTERN, 1)


def is_jira_ticket(from_raw: Column | str) -> Column:
    """TRUE iff the FROM field is a Jira sender; false (not NULL) on NULL.

    ref IsJiraTicket.java:11-20, PatternUtils.java:25-26.
    """
    col = _c(from_raw)
    return F.coalesce(
        col.rlike(P.EMAIL_FROM_JIRA_TICKET_AUTHOR_PATTERN), F.lit(False)
    )


def normalize_email_thread(subject: Column | str) -> Column:
    """Subject with ``Re:``/``AW:`` chains and outer whitespace stripped.

    ref NormalizeEmailThread.java:12-26, PatternUtils.java:16-17.
    """
    col = _c(subject)
    return _extract_or_null(col, P.EMAIL_SUBJECT_THREAD_PATTERN, 1)


def get_jira_ticket_number(subject: Column | str) -> Column:
    """``FLINK-<n>`` ticket id from a Jira notification subject, else NULL.

    ref GetJiraTicketNumber.java:9-23, PatternUtils.java:20-22.
    """
    col = _c(subject)
    return _extract_or_null(col, P.EMAIL_SUBJECT_JIRA_TICKET_PATTERN, 2)


def get_jira_ticket_action(subject: Column | str) -> Column:
    """Ticket action (Created/Closed/…) from a Jira subject, else NULL.

    ref GetJiraTicketAction.java:21-35.
    """
    col = _c(subject)
    return _extract_or_null(col, P.EMAIL_SUBJECT_JIRA_TICKET_PATTERN, 1)


def get_jira_ticket_from(from_raw: Column | str) -> Column:
    """Ticket author name from the Jira FROM field, else NULL.

    ref GetJiraTicketFrom.java:12-26.
    """
    col = _c(from_raw)
    return _extract_or_null(col, P.EMAIL_FROM_JIRA_TICKET_AUTHOR_PATTERN, 1)


def get_jira_ticket_components(text_body: Column | str) -> Column:
    """ARRAY<STRING> of Jira components from a notification body.

    Tri-state exactly like the reference (GetJiraTicketComponents.java:14-29):
    NULL body → NULL; no ``Components:`` line → empty array; else the
    paren-aware comma split (PatternUtils.java:43-44).
    """
    col = _c(text_body)
    line = F.regexp_extract(col, P.EMAIL_BODY_JIRA_TICKET_COMPONENTS_PATTERN, 1)
    return (
        F.when(col.isNull(), F.lit(None).cast("array<string>"))
        .when(
            ~col.rlike(P.EMAIL_BODY_JIRA_TICKET_COMPONENTS_PATTERN),
            F.array().cast("array<string>"),
        )
        .otherwise(
            F.split(line, P.EMAIL_BODY_JIRA_TICKET_COMPONENTS_SPLIT_PATTERN)
        )
    )


def obfuscate(email_or_name: Column | str) -> Column:
    """md5-short (6 hex chars) obfuscation; keeps the email domain.

    ``john@test.com`` → ``527bd5@test.com``; plain strings are hashed
    whole.  ref Obfuscate.java:15-51 (md5Short :24-27, email split :29-42).
    """
    col = _c(email_or_name)
    parts = F.split(col, "@", 2)
    local_hash = F.substring(F.md5(F.element_at(parts, 1)), 1, 6)
    return F.when(
        F.size(parts) == 2,
        F.concat(local_hash, F.lit("@"), F.element_at(parts, 2)),
    ).otherwise(local_hash)


def obfuscate_array(emails: Column | str) -> Column:
    """Array variant of :func:`obfuscate` (ref Obfuscate.java:48-50)."""
    return F.transform(_c(emails), obfuscate)


def array_repeat_nullsafe(value: Column | str, repetitions: Column | str) -> Column:
    """Repeat ``value`` N times; NULL if either argument is NULL.

    Type-generic like the overloaded reference (ArrayRepeat.java:8-29).
    Spark's built-in ``array_repeat`` would yield ``[NULL, NULL]`` for a
    NULL value — the reference returns NULL instead.
    """
    v, n = _c(value), _c(repetitions)
    return F.when(
        v.isNotNull() & n.isNotNull(), F.array_repeat(v, n)
    )


def _sql_lit(pattern: str) -> str:
    """Escape a regex for embedding in a Spark SQL single-quoted literal."""
    return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_extract_or_null(pattern: str, group: int, arg: str = "x") -> str:
    lit = _sql_lit(pattern)
    return (
        f"CASE WHEN {arg} RLIKE {lit} "
        f"THEN regexp_extract({arg}, {lit}, {group}) END"
    )


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the library to ``spark.sql`` as named SQL functions.

    The reference registers its functions with
    ``createTemporaryFunction`` (e.g. ObfuscateITCase.java:38); here each
    is a SQL scalar function (``CREATE FUNCTION ... RETURN <expr>``)
    defined over the same pure expressions, so the SQL surface stays
    UDF-free (codegen-able) too.
    """
    comp_lit = _sql_lit(P.EMAIL_BODY_JIRA_TICKET_COMPONENTS_PATTERN)
    split_lit = _sql_lit(P.EMAIL_BODY_JIRA_TICKET_COMPONENTS_SPLIT_PATTERN)
    obf_body = (
        "CASE WHEN size(split(x, '@', 2)) = 2 THEN "
        "concat(substring(md5(element_at(split(x, '@', 2), 1)), 1, 6), '@', "
        "element_at(split(x, '@', 2), 2)) "
        "ELSE substring(md5(element_at(split(x, '@', 2), 1)), 1, 6) END"
    )
    reg = [
        (
            "GetSourceComponent",
            "x STRING",
            "STRING",
            _sql_extract_or_null(P.SOURCE_FILENAME_COMPONENT_PATTERN, 1),
        ),
        (
            "IsJiraTicket",
            "x STRING",
            "BOOLEAN",
            f"coalesce(x RLIKE {_sql_lit(P.EMAIL_FROM_JIRA_TICKET_AUTHOR_PATTERN)}, false)",
        ),
        (
            "NormalizeEmailThread",
            "x STRING",
            "STRING",
            _sql_extract_or_null(P.EMAIL_SUBJECT_THREAD_PATTERN, 1),
        ),
        (
            "GetJiraTicketNumber",
            "x STRING",
            "STRING",
            _sql_extract_or_null(P.EMAIL_SUBJECT_JIRA_TICKET_PATTERN, 2),
        ),
        (
            "GetJiraTicketAction",
            "x STRING",
            "STRING",
            _sql_extract_or_null(P.EMAIL_SUBJECT_JIRA_TICKET_PATTERN, 1),
        ),
        (
            "GetJiraTicketFrom",
            "x STRING",
            "STRING",
            _sql_extract_or_null(P.EMAIL_FROM_JIRA_TICKET_AUTHOR_PATTERN, 1),
        ),
        (
            "GetJiraTicketComponents",
            "x STRING",
            "ARRAY<STRING>",
            f"CASE WHEN x IS NULL THEN CAST(NULL AS ARRAY<STRING>) "
            f"WHEN NOT (x RLIKE {comp_lit}) THEN array() "
            f"ELSE split(regexp_extract(x, {comp_lit}, 1), {split_lit}) END",
        ),
        ("Obfuscate", "x STRING", "STRING", obf_body),
        (
            "ObfuscateArray",
            "x ARRAY<STRING>",
            "ARRAY<STRING>",
            "transform(x, e -> "
            "CASE WHEN size(split(e, '@', 2)) = 2 THEN "
            "concat(substring(md5(element_at(split(e, '@', 2), 1)), 1, 6), '@', "
            "element_at(split(e, '@', 2), 2)) "
            "ELSE substring(md5(element_at(split(e, '@', 2), 1)), 1, 6) END)",
        ),
        (
            "ArrayRepeatString",
            "x STRING, n INT",
            "ARRAY<STRING>",
            "CASE WHEN x IS NOT NULL AND n IS NOT NULL THEN array_repeat(x, n) END",
        ),
        (
            "ArrayRepeatInt",
            "x INT, n INT",
            "ARRAY<INT>",
            "CASE WHEN x IS NOT NULL AND n IS NOT NULL THEN array_repeat(x, n) END",
        ),
    ]
    for name, sig, ret, body in reg:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
