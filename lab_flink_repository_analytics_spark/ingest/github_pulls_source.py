"""GitHub pull requests as a native Spark 4 Python DataSource.

Parity with ``github_source.py`` (commits) for the reference's
`GithubPullRequestSource` (GithubPullRequestSource.java:55-107): the
reference pages the PR list sorted by created-ascending and emits rows
created after its checkpointed ``lastTime``.  The PR listing API has no
``since``/``until`` server-side slicing (unlike commits), so the batch
partitioning unit is the PAGE, not the day: ONE INPUT PARTITION PER PAGE
of ``sort=created&direction=asc`` — a backfill of N pages fans out as N
tasks, and the reference's resume-after-``lastTime`` becomes a row-level
``since`` filter (option, ISO timestamp) applied inside each partition.

No filter pushdown here on purpose: created-sorted pages support early
termination on a live cursor, not random page pruning — a created-at
bound cannot be mapped to page numbers without fetching them.  The
commits source (day-sliced) is where range pushdown pays; documented so
the asymmetry is a decision, not an omission.

Offline-first: with ``fixture_dir`` each partition reads
``pulls_page_<N>.json`` (a JSON array of GitHub pull API objects).
``pages`` bounds the page range explicitly; with a fixture dir it
defaults to the fixture pages present.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from lab_flink_repository_analytics_spark import schemas
from lab_flink_repository_analytics_spark.util import parse_flexible_date
from lab_flink_repository_analytics_spark.ingest.github import (
    API,
    PAGE_SIZE,
    fetch_json,
    pull_row,
)

_FIELDS = [f.name for f in schemas.PULL_REQUEST.fields]


class _PageSlice(InputPartition):
    def __init__(self, page: int):
        self.page = page  # 1-based, GitHub convention


class GithubPullsReader(DataSourceReader):
    def __init__(self, options):
        self.repo = options.get("repo", "apache/flink")
        self.token = options.get("token")
        self.fixture_dir = options.get("fixture_dir")
        self.since = options.get("since")  # ISO ts: only PRs created after
        pages = options.get("pages")
        if pages is not None:
            self.pages = int(pages)
        elif self.fixture_dir:
            pat = re.compile(r"pulls_page_(\d+)\.json$")
            found = [
                int(m.group(1))
                for m in map(pat.match, os.listdir(self.fixture_dir))
                if m
            ]
            self.pages = max(found, default=0)
        else:
            raise ValueError("github_pulls requires 'pages' when live")

    def partitions(self):
        return [_PageSlice(p) for p in range(1, self.pages + 1)]

    def read(self, partition: _PageSlice):
        if self.fixture_dir:
            path = os.path.join(
                self.fixture_dir, f"pulls_page_{partition.page}.json"
            )
            pulls = []
            if os.path.exists(path):
                with open(path, encoding="utf-8") as fh:
                    pulls = json.load(fh)
        else:  # pragma: no cover - network path, exercised only live
            pulls = fetch_json(
                f"{API}/repos/{self.repo}/pulls?state=all&sort=created"
                f"&direction=asc&per_page={PAGE_SIZE}&page={partition.page}",
                self.token,
            )
        since = (
            parse_flexible_date(self.since) if self.since else None
        )
        for api_pull in pulls or []:
            row = pull_row(api_pull)
            if since is not None:
                created = row.get("createdAt")
                if created is None or created <= since:
                    continue
            yield tuple(row[f] for f in _FIELDS)


class GithubPullsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "github_pulls"

    def schema(self):
        return schemas.PULL_REQUEST

    def reader(self, schema) -> DataSourceReader:
        return GithubPullsReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(GithubPullsDataSource)
