"""Function library: scalar, table (explode), and aggregate equivalents of
the reference's ``sql-functions`` module — implemented as Column-expression
builders (JVM-side, whole-stage codegen) instead of UDFs wherever possible.
"""

from lab_flink_repository_analytics_spark.functions.scalar import (  # noqa: F401
    array_repeat_nullsafe,
    get_jira_ticket_action,
    get_jira_ticket_components,
    get_jira_ticket_from,
    get_jira_ticket_number,
    get_source_component,
    is_jira_ticket,
    normalize_email_thread,
    obfuscate,
    obfuscate_array,
    register_sql_functions,
)
from lab_flink_repository_analytics_spark.functions.table import (  # noqa: F401
    expand_jira_ticket_components,
    expand_jira_ticket_components2,
)
from lab_flink_repository_analytics_spark.functions.aggregate import (  # noqa: F401
    array_list_agg,
    get_email_aliases_and_company,
    largest_array_agg,
    last_non_null_value_agg,
    last_value_array_agg,
    list_agg,
)
