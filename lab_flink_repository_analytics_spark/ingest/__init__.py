"""Batch ingesters producing the domain tables (schemas.py shapes).

The reference's custom Flink sources (SURVEY.md §2.A) are connection
managers + parsers wrapped in DataStream lifecycle; Spark-side the right
shape is plain ingest-to-Parquet scripts whose output the engine reads —
connection/retry/incremental state lives outside the query engine:

* gitlog.py  — git history → commits         (ref JGitCommitSource.java)
* mbox.py    — mbox archives → emails        (ref ApacheMboxSource.java)
* github.py  — GitHub REST → commits/pulls   (ref Github*Source.java)

Each ingester records its resume position (last SHA / last date) just like
the reference's CheckpointedFunction ListState (JGitCommitSource.java:
236-256, ApacheMboxSource.java:341-358).
"""
