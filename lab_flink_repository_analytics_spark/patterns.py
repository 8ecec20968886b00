"""Regex pattern constants for the community-analytics function library.

Behavioral spec: common/src/main/java/com/ververica/platform/PatternUtils.java
(ref PatternUtils.java:8-44).  Spark's regexp functions run the same JVM
``java.util.regex`` engine, so the patterns are expressed directly in Java
regex syntax.

One semantic gap must be bridged here rather than per-call-site: the
reference applies most patterns with ``Matcher.matches()`` (whole-string
match), while Spark's ``rlike``/``regexp_extract`` use ``find()`` (substring
search).  Patterns meant for ``matches()`` therefore carry explicit
``^``/``\\z`` anchors in this module.  ``\\z`` (absolute end of input) rather
than ``$`` so a trailing newline cannot sneak past the anchor, exactly like
``matches()``.
"""

# Extracts the Flink source component from a repository-relative file path
# (ref PatternUtils.java:8-10; applied with matches() in
# GetSourceComponent.java:20-25).  The leading branch grabs the shortest
# path prefix that is followed by /src/, pom.xml or README.md; the other
# branches special-case top-level dirs that have no src/ layout.  Capture
# group 1 = component name.
SOURCE_FILENAME_COMPONENT_PATTERN = (
    r"^(.+?(?=/src/.*|pom.xml|README.md)"
    r"|(?:flink-)?docs(?=/.*)"
    r"|tools(?=/.*)"
    r"|flink-python(?=/.*)"
    r"|flink-end-to-end-tests/test-scripts(?=/.*)"
    r"|flink-scala-shell(?=/start-script/.*)"
    r"|flink-container(?=/.*)"
    r"|flink-contrib/docker-flink(?=/.*)"
    r"|flink-table/flink-sql-client(?=/.*)"
    r"|flink-end-to-end-tests(?=/[^/]*\.sh)).*?\z"
)

# Strips reply prefixes ("Re:", "AW:", case-insensitive, repeated) and
# surrounding whitespace from an email subject (ref PatternUtils.java:16-17;
# matches() in NormalizeEmailThread.java:19-24).  Group 1 = thread subject.
EMAIL_SUBJECT_THREAD_PATTERN = r"(?i)^\s*(?:(?:Re|AW):\s*)*(.*?)\s*\z"

# Jira notification subject "[jira] [Action] (FLINK-12345) ..." (ref
# PatternUtils.java:20-22; matches() in GetJiraTicketNumber.java:17-22 and
# GetJiraTicketAction.java:27-32).  Group 1 = action, group 2 = ticket id.
EMAIL_SUBJECT_JIRA_TICKET_PATTERN = (
    r"^\[jira\]\s*\[(.*)\]\s*\((FLINK-[0-9]+)\).*\z"
)

# Jira sender FROM field '"Author Name (Jira)" <jira@apache.org>' (ref
# PatternUtils.java:25-26; matches() in IsJiraTicket.java:17 and
# GetJiraTicketFrom.java:17-22).  Group 1 = ticket author.
EMAIL_FROM_JIRA_TICKET_AUTHOR_PATTERN = (
    r'^"(.*)\s*\((?:Jira|JIRA)\)"\s*<jira@apache\.org>\z'
)

# The "Components:" line of a Jira notification body — exactly ten leading
# spaces (ref PatternUtils.java:32-33; applied with find() in
# GetJiraTicketComponents.java:21-26, so deliberately NOT anchored).
# Group 1 = comma-separated component list.
EMAIL_BODY_JIRA_TICKET_COMPONENTS_PATTERN = r" {10}Components: (.*)"

# Splits the component list on ", " but only outside parentheses, so
# "Formats (JSON, Avro, Parquet, ORC, SequenceFile)" stays whole (ref
# PatternUtils.java:43-44): the lookahead requires the remainder of the
# string to contain only balanced "(...)" pairs after the split point.
EMAIL_BODY_JIRA_TICKET_COMPONENTS_SPLIT_PATTERN = (
    r", (?=(?:[^(]*\([^)]*\))*[^)]*$)"
)
