"""GitHub commits as a native Spark 4 Python DataSource.

The reference implements `GithubCommitSource` as a custom Flink
SourceFunction polling 1-day slices (GithubCommitSource.java:137-146) on
the task manager.  The Spark-4-native equivalent is the Python DataSource
API (SPARK-44076): ``spark.read.format("github_commits")`` with ONE INPUT
PARTITION PER DAY SLICE, so a large backfill fans out across executors
instead of paging through the driver — planning stays in Catalyst (the
source reports partitions; Spark schedules them like any scan).

Offline-first: pass ``fixture_dir`` and each slice reads
``<fixture_dir>/commits_<YYYY-MM-DD>.json`` (a JSON array of GitHub commit
API objects, detail shape) instead of the network — that's also the test
path, since this container is network-free.  With no ``fixture_dir`` the
partition fetches ``/repos/<repo>/commits?since&until`` pages and the
per-commit detail URL, exactly like the reference.

Register per session::

    from lab_flink_repository_analytics_spark.ingest.github_source import (
        register,
    )
    register(spark)
    df = (spark.read.format("github_commits")
          .option("since", "2024-01-01").option("until", "2024-01-08")
          .option("fixture_dir", "/path/to/json").load())
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from lab_flink_repository_analytics_spark import schemas
from lab_flink_repository_analytics_spark.util import parse_flexible_date
from lab_flink_repository_analytics_spark.ingest.github import (
    API,
    PAGE_SIZE,
    commit_row,
    fetch_json,
)

_FIELDS = [f.name for f in schemas.COMMIT.fields]


class _DaySlice(InputPartition):
    def __init__(self, day: str):
        self.day = day  # YYYY-MM-DD


class GithubCommitsReader(DataSourceReader):
    def __init__(self, options):
        self.repo = options.get("repo", "apache/flink")
        self.since = options.get("since")
        self.until = options.get("until")
        self.token = options.get("token")
        self.fixture_dir = options.get("fixture_dir")
        if not self.since or not self.until:
            raise ValueError("github_commits requires 'since' and 'until' options")
        self._pushed_lo = None  # date bounds tightened by pushFilters
        self._pushed_hi = None

    def pushFilters(self, filters):
        """Prune day-slice partitions from commitDate range predicates.

        Every filter is also returned (Spark re-applies it exactly); the
        source only uses the bounds to shrink the slice list — partition
        pruning for a Python source, same contract as parquet partition
        filters.  A ``commitDate >= X`` drops the days before X's; a
        ``< / <= X`` drops the days after.
        """
        from pyspark.sql.datasource import (
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            if getattr(f, "attribute", None) == ("commitDate",):
                v = getattr(f, "value", None)
                if isinstance(v, datetime) and v.tzinfo is not None:
                    from datetime import timezone

                    v = v.astimezone(timezone.utc).replace(tzinfo=None)
                d = v.date() if isinstance(v, datetime) else None
                if d is not None:
                    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                        if self._pushed_lo is None or d > self._pushed_lo:
                            self._pushed_lo = d
                    elif isinstance(f, (LessThan, LessThanOrEqual)):
                        # strict < at exact midnight excludes that whole day
                        at_midnight = v == datetime(d.year, d.month, d.day)
                        hi = (
                            d
                            if isinstance(f, LessThan) and at_midnight
                            else d + timedelta(days=1)
                        )
                        if self._pushed_hi is None or hi < self._pushed_hi:
                            self._pushed_hi = hi
            yield f

    def partitions(self):
        # flexible forms per the reference CLI: "2024", "2024-01",
        # "2024-01-15", "2024-01-15T06:00:00Z" (Utils.parseFlexibleDate)
        d0 = parse_flexible_date(self.since).date()
        d1 = parse_flexible_date(self.until).date()
        if self._pushed_lo is not None and self._pushed_lo > d0:
            d0 = self._pushed_lo
        if self._pushed_hi is not None and self._pushed_hi < d1:
            d1 = self._pushed_hi
        return [
            _DaySlice((d0 + timedelta(days=i)).isoformat())
            for i in range(max((d1 - d0).days, 0))
        ]

    def read(self, partition: _DaySlice):
        if self.fixture_dir:
            path = os.path.join(
                self.fixture_dir, f"commits_{partition.day}.json"
            )
            commits = []
            if os.path.exists(path):
                with open(path, encoding="utf-8") as fh:
                    commits = json.load(fh)
        else:  # pragma: no cover - network path, exercised only live
            commits = self._fetch_day(partition.day)
        for api_commit in commits:
            row = commit_row(api_commit)
            yield tuple(row[f] for f in _FIELDS)

    def _fetch_day(self, day: str):  # pragma: no cover - network path
        since = f"{day}T00:00:00Z"
        until_d = datetime.fromisoformat(day) + timedelta(days=1)
        until = until_d.strftime("%Y-%m-%dT00:00:00Z")
        out, page = [], 1
        while True:
            listing = fetch_json(
                f"{API}/repos/{self.repo}/commits?since={since}&until={until}"
                f"&per_page={PAGE_SIZE}&page={page}",
                self.token,
            )
            if not listing:
                return out
            for item in listing:
                out.append(
                    fetch_json(
                        f"{API}/repos/{self.repo}/commits/{item['sha']}",
                        self.token,
                    )
                )
            if len(listing) < PAGE_SIZE:
                return out
            page += 1


class GithubCommitsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "github_commits"

    def schema(self):
        return schemas.COMMIT

    def reader(self, schema) -> DataSourceReader:
        return GithubCommitsReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(GithubCommitsDataSource)
