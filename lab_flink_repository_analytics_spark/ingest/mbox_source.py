"""Apache mailing-list archives as a native Spark 4 Python DataSource.

The reference's `ApacheMboxSource` streams MONTHLY mbox files one at a
time on a single task (ApacheMboxSource.java:118-122 downloads
``<list>_<year>_<month>.mbox``; :194-217 advances month by month).  The
batch-parallel equivalent: ``format("mbox")`` over a directory of monthly
mbox files with ONE INPUT PARTITION PER FILE — a multi-year archive
backfill parses every month concurrently across executors instead of
sequentially on one thread.  Parsing (charset fallback, multipart
text/html split, From/Sender fallback) is `ingest/mbox.py`'s, unchanged;
this module only contributes the partitioning.

The reference's resume point (``lastDate``, ApacheMboxSource.java:157)
maps to the ``after`` option (ISO timestamp, strictly-after filter) —
months before the cutoff still list as partitions but cheap-skip at the
file-name level when their month obviously precedes it.

Usage::

    from lab_flink_repository_analytics_spark.ingest.mbox_source import register
    register(spark)
    df = (spark.read.format("mbox")
          .option("dir", "/archives/flink-dev").load())
"""

from __future__ import annotations

import os
import re
from datetime import datetime

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from lab_flink_repository_analytics_spark import schemas
from lab_flink_repository_analytics_spark.util import parse_flexible_date

_FIELDS = [f.name for f in schemas.EMAIL.fields]
# reference file naming: <list>-YYYY-MM.mbox or <list>_YYYY_MM.mbox
_MONTH_PAT = re.compile(r"(\d{4})[-_](\d{2})\.mbox$")


class _MboxFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MboxReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("dir")
        self.after = options.get("after")  # ISO ts, strictly-after filter
        if not self.dir:
            raise ValueError("mbox source requires the 'dir' option")

    def partitions(self):
        after_month = None
        if self.after:
            d = parse_flexible_date(self.after)
            after_month = (d.year, d.month)
        parts = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".mbox"):
                continue
            m = _MONTH_PAT.search(name)
            if m and after_month:
                # a month that ends before the cutoff month can't contain
                # any email strictly after it — skip the whole file
                if (int(m.group(1)), int(m.group(2))) < after_month:
                    continue
            parts.append(_MboxFile(os.path.join(self.dir, name)))
        return parts

    def read(self, partition: _MboxFile):
        from lab_flink_repository_analytics_spark.ingest.mbox import read_emails

        after = parse_flexible_date(self.after) if self.after else None
        for row in read_emails(partition.path, after=after):
            yield tuple(row[f] for f in _FIELDS)


class MboxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mbox"

    def schema(self):
        return schemas.EMAIL

    def reader(self, schema) -> DataSourceReader:
        return MboxReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(MboxDataSource)
