"""Table-function (UDTF) equivalents — expressed as explode compositions.

The reference's two ``TableFunction``s expand the Jira component list into
rows (ExpandJiraTicketComponents.java:14-29, ExpandJiraTicketComponents2
.java:14-40).  In Spark these are not UDTFs at all: ``explode`` /
``explode_outer`` over the already-pure component-array expression gives the
same rows with Catalyst-planned execution (generate + whole-stage codegen).

Join semantics mapping (SURVEY.md §2.E):
  * ``CROSS JOIN UNNEST(...)``                      → :func:`pyspark.sql.functions.explode`
  * ``LEFT JOIN LATERAL TABLE(f(x)) ON TRUE``       → ``explode_outer``
    (row preserved with NULL when the function emits nothing,
    ref ExpandJiraTicketComponentsITCase.java:57-67)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.functions.scalar import (
    get_jira_ticket_components,
)


def expand_jira_ticket_components(
    text_body: Column | str, outer: bool = True
) -> Column:
    """One row per Jira component of the notification body.

    ``outer=True`` = LEFT JOIN LATERAL semantics (NULL row when the body has
    no components — including the empty-string body, which yields an empty
    array, ref ExpandJiraTicketComponentsITCase.java:62-68).
    ``outer=False`` = CROSS JOIN UNNEST (row dropped).
    """
    arr = get_jira_ticket_components(text_body)
    return F.explode_outer(arr) if outer else F.explode(arr)


def expand_jira_ticket_components2(
    text_body: Column | str, outer: bool = True
) -> Column:
    """Like :func:`expand_jira_ticket_components` plus the per-body total.

    Emits a struct ``(component STRING, componentCount INT)`` — the count is
    the total number of components of the body, repeated on each row
    (ref ExpandJiraTicketComponents2.java:29-38; ITCase :85-91).  Select
    ``col("col.*")`` after exploding to flatten.
    """
    arr = get_jira_ticket_components(text_body)
    structs = F.transform(
        arr,
        lambda x: F.struct(
            x.alias("component"), F.size(arr).alias("componentCount")
        ),
    )
    return F.explode_outer(structs) if outer else F.explode(structs)
