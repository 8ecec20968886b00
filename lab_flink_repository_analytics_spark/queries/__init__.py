"""Query suites.

``community.py`` — the reference's four documented README queries as
parameterized builders over the domain tables (commits / pulls / emails).

``suite.py`` — the driver-gradeable inventory: every operator family from
SURVEY.md §2 (plus the training-data-pipeline operators) expressed over the
driver's synthetic tables, each paired with an ANSI-SQL DuckDB oracle.
"""
