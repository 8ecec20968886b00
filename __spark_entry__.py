"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (commit activity per component per
30-day window — README.md:242-251 ≙ FlinkCommitProgram.java:70-87) on
sf0.001.  ``queries()``/``oracle_sql()`` expose the full driver-gradeable
inventory from ``lab_flink_repository_analytics_spark.queries.suite``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab_flink_repository_analytics_spark.queries import suite as _suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _suite.commit_activity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ datapipe)."""
    return _suite.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each ``queries()`` entry."""
    return _suite.oracle_sql()
