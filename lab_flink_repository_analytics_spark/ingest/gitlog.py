"""Git-history ingester: ``git log --numstat`` → Commit rows → Parquet.

Replicates JGitCommitSource's semantics (ref JGitCommitSource.java):

* oldest→newest traversal (``--reverse`` ≙ RevSort.REVERSE, :92)
* per-file ``linesAdded`` / ``linesRemoved`` straight diff line counts with
  ``linesChanged = linesAdded + linesRemoved`` (:190-211 — DELETE adds to
  removed, INSERT to added, REPLACE to both; numstat reports exactly these
  totals)
* no rename detection (rename detection is disabled in the reference's
  DiffFormatter, :178-179 → ``--no-renames``)
* binary files: numstat prints ``-`` → counted as 0 lines
* incremental resume after a known SHA (≙ ListState checkpoint of
  ``lastCommitHash``, :94-106, :236-256)
* timestamps truncated to ms UTC (TIMESTAMP(3), Utils.java:19)
"""

from __future__ import annotations

import subprocess
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from lab_flink_repository_analytics_spark import schemas

_SEP = "\x1f"  # unit separator — field delimiter
_REC = "\x1e"  # record separator

_FORMAT = _REC + _SEP.join(
    ["%H", "%an", "%ae", "%aI", "%cn", "%ce", "%cI", "%s"]
)


def read_commits(
    repo_dir: str,
    after_sha: str | None = None,
    ref: str = "HEAD",
) -> list[dict]:
    """Parse the repo's history into Commit dicts (schemas.COMMIT shape)."""
    rng = f"{after_sha}..{ref}" if after_sha else ref
    out = subprocess.run(
        [
            "git",
            "-C",
            repo_dir,
            "log",
            "--reverse",
            "--no-renames",
            "--numstat",
            f"--pretty=format:{_FORMAT}",
            rng,
        ],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    commits = []
    for block in out.split(_REC):
        if not block.strip():
            continue
        lines = block.strip("\n").split("\n")
        # subject is the last field: maxsplit keeps a subject containing the
        # field separator intact.  Subjects are contributor-controlled bytes;
        # a block that still doesn't yield 8 fields (e.g. the tail of a
        # subject containing the record separator) is skipped, not crashed on.
        head = lines[0].split(_SEP, 7)
        if len(head) != 8:
            continue
        sha, author, author_email, a_date, committer, c_email, c_date, subject = head
        files = []
        for line in lines[1:]:
            parts = line.split("\t")
            if len(parts) != 3:
                continue
            added_s, removed_s, filename = parts
            added = 0 if added_s == "-" else int(added_s)
            removed = 0 if removed_s == "-" else int(removed_s)
            files.append(
                {
                    "filename": filename,
                    "linesAdded": added,
                    "linesChanged": added + removed,
                    "linesRemoved": removed,
                }
            )
        commits.append(
            {
                "author": author,
                "authorDate": _parse_iso_ms(a_date),
                "authorEmail": author_email,
                "commitDate": _parse_iso_ms(c_date),
                "committer": committer,
                "committerEmail": c_email,
                "filesChanged": files,
                "sha1": sha,
                "shortInfo": subject,
            }
        )
    return commits


def _parse_iso_ms(s: str) -> datetime:
    """ISO-8601 → UTC-naive datetime truncated to ms (TIMESTAMP(3))."""
    dt = datetime.fromisoformat(s).astimezone(timezone.utc).replace(tzinfo=None)
    return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)


def commits_df(
    spark: SparkSession,
    repo_dir: str,
    after_sha: str | None = None,
    rows: list[dict] | None = None,
) -> DataFrame:
    """Commits as a DataFrame with the canonical COMMIT schema.

    Pass ``rows`` to reuse an existing :func:`read_commits` result instead
    of re-parsing the repository history.
    """
    if rows is None:
        rows = read_commits(repo_dir, after_sha)
    tuples = [
        tuple(r[f.name] if f.name != "filesChanged" else [
            (x["filename"], x["linesAdded"], x["linesChanged"], x["linesRemoved"])
            for x in r["filesChanged"]
        ] for f in schemas.COMMIT.fields)
        for r in rows
    ]
    return spark.createDataFrame(tuples, schemas.COMMIT)


def ingest_to_parquet(
    spark: SparkSession,
    repo_dir: str,
    output_path: str,
    after_sha: str | None = None,
) -> str | None:
    """Append new commits to a parquet dataset; returns the new last SHA.

    At scale the output is partitioned by commit month so the windowed
    queries prune partitions on commitDate.
    """
    rows = read_commits(repo_dir, after_sha)
    if not rows:
        return after_sha
    from pyspark.sql import functions as F

    df = commits_df(spark, repo_dir, after_sha, rows=rows)
    (
        df.withColumn("commit_month", F.date_format("commitDate", "yyyy-MM"))
        .repartition("commit_month")
        .write.mode("append")
        .partitionBy("commit_month")
        .parquet(output_path)
    )
    return rows[-1]["sha1"]
