"""Python UDTF surface (Spark 3.5+/4): the reference's table functions
re-expressed as user-defined TABLE functions callable from SQL LATERAL.

The HOT path for ExpandJiraTicketComponents[2] stays the pure-expression
``explode``/``transform`` forms in :mod:`functions.table` (JVM codegen, no
Python).  This module exists for the API-surface parity point — Flink
users write ``LEFT JOIN LATERAL TABLE(ExpandJiraTicketComponents(...))``
(ref ExpandJiraTicketComponents.java:15-37); Spark's equivalent escape
hatch for logic that genuinely needs Python is a UDTF, registered once
and then usable from plain SQL."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="component string, componentCount int")
class ExpandComponentsUdtf:
    """One output row per component plus the component count —
    ``ExpandJiraTicketComponents2`` semantics (ref
    ExpandJiraTicketComponents2.java:15-38): NULL or empty arrays yield
    no rows (the SQL LATERAL's ON TRUE outer behavior is the caller's
    join-type choice, exactly as in Flink)."""

    def eval(self, components):
        if components:
            n = len(components)
            for c in components:
                yield (c, n)


def register(spark) -> None:
    """Register the UDTFs for SQL use (idempotent per session)."""
    spark.udtf.register("expand_jira_components", ExpandComponentsUdtf)
