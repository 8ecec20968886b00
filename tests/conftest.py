"""Shared pytest fixtures.

Session-scoped local SparkSession ≙ the reference's
MiniClusterWithClientResource (AbstractTableTestBase.java:15-21):
parallelism 4, UTC, shared across all tests.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_flink_repository_analytics_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


def rows(df, *cols):
    """Collect as sorted list of tuples (order-insensitive assert helper,
    ≙ the reference's containsInAnyOrder)."""
    data = [tuple(r) for r in (df.select(*cols) if cols else df).collect()]
    return sorted(data, key=repr)
