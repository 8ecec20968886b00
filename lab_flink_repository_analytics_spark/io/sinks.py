"""Sinks — idempotent upsert + fan-out writers (SURVEY.md §2.B).

The reference's sinks:

* Elasticsearch upsert keyed by hash(componentName, windowStart) — an
  idempotent write of window summaries (FlinkCommitProgram.java:96-141,
  doc-id :133-137).  Spark-side: key-merge into a parquet dataset (or
  Delta MERGE where available) — ``upsert_by_key``.
* Kafka JSON topics via ``executeInsert`` (FlinkCommitsToKafka.java:47-93
  etc.).  Spark-side: ``to_kafka_json`` builds the (key, value JSON) frame;
  actual Kafka delivery needs the kafka connector package at runtime.
* Multi-sink statement set (FlinkMailingListToKafka.java:169-174) —
  Spark-side: ``fan_out`` writes one cached source to N sinks.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def _rename_or_raise(fs, src, dst) -> None:
    """Hadoop ``FileSystem.rename`` reports most failures (dest exists,
    src missing, cross-FS, permission on some stores) by returning
    ``false``, not raising.  Swallowing that here would let a failed swap
    report success and the next call's step-1 cleanup garbage-collect the
    committed ``._tmp`` — so any ``false`` is fatal."""
    if not fs.rename(src, dst):
        raise RuntimeError(f"rename failed (returned false): {src} -> {dst}")


def upsert_by_key(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
) -> None:
    """Idempotent key-merge into a parquet dataset.

    Without a transactional table format, merge = read-existing ∪ updates,
    keep the update on key collision, rewrite.  Mirrors the ES upsert
    doc-id semantics (hash of the key columns, FlinkCommitProgram.java:
    133-137): re-running the same window summaries converges.

    At scale this should be Delta/Iceberg ``MERGE INTO`` keyed the same
    way (or partition-overwrite when updates align to partitions); the
    rewrite here is the dependency-free fallback.

    Cost bound (measured, tools/bench_upsert.py at the sf1 replica —
    BENCH_SF10.md "upsert_by_key at replica scale"): each call rewrites
    the FULL existing dataset, so cost is O(existing ∪ update) — ~1-2s
    at 400k window-summary rows, linear beyond.  Intended for
    window-summary-sized datasets (the reference's ES index held one doc
    per (component, windowStart) — thousands of rows); past ~10M rows /
    ~1 GB prefer :func:`apply_changelog` (delta-driven) with
    partition-aligned overwrite, or a transactional MERGE.

    Crash safety (round-8 rework): the merged result is written ONCE to
    ``path._tmp`` while the live dataset is still being read, then swapped
    in by two FileSystem renames (``path``→``path._old``,
    ``path._tmp``→``path``).  Every crash window leaves a complete copy
    recoverable by :func:`_recover_swap`, which both merge entry points
    run first — a crash between the renames leaves ``._tmp`` (complete,
    ``_SUCCESS``-marked) as the new state; a crash during the tmp write
    leaves ``path`` untouched.  Renames are atomic on HDFS/local file
    systems; on S3-style object stores (copy-based rename) use a
    transactional table format instead — same advice as the scale note
    above.
    """
    _recover_swap(spark, path)
    updates = updates.withColumn("_is_update", F.lit(1))
    if _exists(spark, path):
        existing = spark.read.parquet(path).withColumn("_is_update", F.lit(0))
        merged = existing.unionByName(updates)
    else:
        merged = updates
    w_cols = [F.col(c) for c in key_cols]
    from pyspark.sql import Window

    w = Window.partitionBy(*w_cols).orderBy(F.col("_is_update").desc())
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )
    _swap_in(spark, result, path)


def apply_changelog(
    spark: SparkSession,
    deltas: DataFrame,
    path: str,
    key_cols: list[str],
    kind_col: str = "kind",
) -> None:
    """Incremental materialized-view maintenance: apply a RowKind delta
    stream (``changelog.changelog_deltas`` output — +I/-D/-U/+U rows) to a
    keyed parquet dataset.

    +I/+U upsert their row; -D removes the key; -U (update-before) carries
    no new state and is skipped.  Re-applying the same delta batch
    converges (idempotent like :func:`upsert_by_key`), so this is the
    at-scale refresh path for window summaries: diff yesterday's
    materialization against today's (one full-outer join) and rewrite only
    through the delta set instead of recomputing consumers downstream.
    Delta/Iceberg ``MERGE WHEN MATCHED [AND kind='-D'] THEN DELETE`` is the
    transactional equivalent.
    """
    kc = F.col(kind_col)
    _recover_swap(spark, path)
    ups = deltas.filter(kc.isin("+I", "+U")).drop(kind_col)
    dels = deltas.filter(kc == "-D").select(*key_cols).distinct()
    if _exists(spark, path):
        existing = spark.read.parquet(path)
        survivors = existing.join(dels, on=list(key_cols), how="left_anti")
        merged = survivors.withColumn("_is_update", F.lit(0)).unionByName(
            ups.withColumn("_is_update", F.lit(1))
        )
        from pyspark.sql import Window

        w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
            F.col("_is_update").desc()
        )
        result = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_is_update")
        )
    else:
        result = ups
    _swap_in(spark, result, path)


def _swap_in(spark: SparkSession, result: DataFrame, path: str) -> None:
    """Materialize ``result`` (which may lazily read from ``path``) and
    swap it into place via renames, never a second data write.

    Order of operations and the crash window each step leaves:

    1. drop stale ``._tmp``/``._old`` survivors of an earlier crash
       (after :func:`_recover_swap` has already salvaged any complete one)
    2. write the full result to ``path._tmp`` — crash here leaves ``path``
       untouched and an incomplete ``._tmp`` (no ``_SUCCESS``) that step 1
       of the next call removes
    3. rename ``path`` → ``path._old`` — crash here (or between 3 and 4)
       leaves ``._tmp`` complete + ``_SUCCESS``-marked; recovery renames
       it into place (the merge had fully committed, so finishing the
       swap, not rolling back, preserves idempotent re-delivery)
    4. rename ``path._tmp`` → ``path`` — crash after leaves only a stale
       ``._old`` to garbage-collect

    The two renames are metadata-only on HDFS and local file systems;
    total data written per merge is exactly one copy of the result (the
    pre-round-8 version wrote it twice: tmp, then read-tmp-write-path).
    """
    base = path.rstrip("/")
    tmp_s, old_s = base + "._tmp", base + "._old"
    _rm(spark, tmp_s)
    _rm(spark, old_s)
    result.write.mode("overwrite").parquet(tmp_s)
    fs, hpath = _hadoop_fs(spark, path)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(tmp_s)
    old = jvm.org.apache.hadoop.fs.Path(old_s)
    if fs.exists(hpath):
        _rename_or_raise(fs, hpath, old)
    _rename_or_raise(fs, tmp, hpath)
    _rm(spark, old_s)


def _recover_swap(spark: SparkSession, path: str) -> None:
    """Salvage a crashed :func:`_swap_in`: if ``path`` is missing/empty
    but a COMPLETE ``path._tmp`` (``_SUCCESS`` present) or the displaced
    ``path._old`` exists, rename the best copy back into place.  A
    ``._tmp`` without ``_SUCCESS`` is an aborted write and is ignored
    (then deleted by the next swap's step 1).  No-op in the common case —
    one ``exists`` call when ``path`` is healthy."""
    fs, hpath = _hadoop_fs(spark, path)
    if fs.exists(hpath) and len(fs.listStatus(hpath)) > 0:
        return
    jvm = spark._jvm
    base = path.rstrip("/")
    tmp = jvm.org.apache.hadoop.fs.Path(base + "._tmp")
    old = jvm.org.apache.hadoop.fs.Path(base + "._old")
    success = jvm.org.apache.hadoop.fs.Path(base + "._tmp/_SUCCESS")
    src = None
    if fs.exists(tmp) and fs.exists(success):
        src = tmp  # merge committed: finish the interrupted swap
    elif fs.exists(old):
        src = old  # tmp incomplete/gone: roll back to the prior state
    if src is not None:
        if fs.exists(hpath):
            fs.delete(hpath, True)
        _rename_or_raise(fs, src, hpath)
    elif fs.exists(hpath):
        # Unhealthy (exists-but-empty) and nothing salvageable: a crash
        # left no complete copy.  Warn so operators can tell this apart
        # from "never written" when a later read fails.
        _LOG.warning(
            "upsert recovery: %s is empty and no complete ._tmp/._old "
            "survivor exists — no salvageable copy found",
            path,
        )


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-supported scheme (file/hdfs/s3a/…).

    Going through the JVM FileSystem API — not os.path — so the upsert
    works against remote object stores and partitioned datasets, exactly
    where the at-scale sink runs.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return False
    # a directory with any content counts (plain files, partition dirs, or
    # a _SUCCESS marker); an empty dir from a failed write does not
    return len(fs.listStatus(hpath)) > 0


def _rm(spark: SparkSession, path: str) -> None:
    fs, hpath = _hadoop_fs(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def to_kafka_json(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """(key, value) frame in Kafka JSON wire shape:
    ``value = to_json(struct(*))`` like the reference's JSON-format topics
    (README.md:78-100)."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    key = (
        F.to_json(F.struct(*[F.col(c) for c in key_cols]))
        if key_cols
        else F.lit(None).cast("string")
    )
    return df.select(key.alias("key"), value.alias("value"))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    The 100 TB co-location strategy: two tables bucketed on the same key
    with the same bucket count join with **no shuffle of either side** (and
    no sort when ``sort_cols`` matches) — the per-bucket files are read
    pre-partitioned.  Worth it for any fact table joined repeatedly on the
    same key (e.g. lineitem ⋈ orders on orderkey); bucket count should be
    sized so one bucket of the largest table fits an executor's memory.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table, format="parquet")


def fan_out(df: DataFrame, writers: list) -> None:
    """One source, N sinks (≙ the reference's StatementSet multi-insert,
    FlinkMailingListToKafka.java:169-174).  Caches the source once."""
    df.persist()
    try:
        for write in writers:
            write(df)
    finally:
        df.unpersist()


def _detect_partition_cols(spark: SparkSession, path: str) -> list[str]:
    """Hive-style partition columns of a parquet directory, outermost
    first — read off the ``k=v`` directory chain, not the schema (the
    schema doesn't say which columns are layout)."""
    fs, jpath = _hadoop_fs(spark, path)
    cols: list[str] = []
    cur = jpath
    while True:
        sub = [
            st.getPath()
            for st in fs.listStatus(cur)
            if st.isDirectory() and "=" in st.getPath().getName()
        ]
        if not sub:
            return cols
        cols.append(sub[0].getName().split("=", 1)[0])
        cur = sub[0]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into right-sized files; returns the new
    file (task) count.

    Streaming ``foreachBatch`` upserts and frequent small appends leave
    thousands of tiny files — at 100 TB that's a listing/footer-overhead
    tax on every scan.  Compaction reads once, repartitions to
    ``ceil(rows/target)`` output files (range-partitioned + sorted on
    ``sort_cols`` when given, so per-file min/max statistics become
    selective and row-group skipping works), and atomically swaps via a
    temp directory + rename.  The Delta/Iceberg equivalent is OPTIMIZE
    [ZORDER]; this is the plain-parquet fallback with the same contract.

    Hive-partitioned datasets (``split=.../part-*.parquet``) keep their
    layout: partition columns are auto-detected from the directory chain
    (or passed explicitly) and the rewrite goes through
    ``partitionBy(...)`` with the range-shuffle keyed on the partition
    columns first, so each output task holds ~one partition value and the
    file-count target survives the partitioned write.
    """
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ module style)

    if partition_cols is None:
        partition_cols = _detect_partition_cols(spark, path)
    # Partition values must round-trip VERBATIM: with type inference on,
    # a string partition value that parses as a number/date (split=01,
    # day=2021-1-5) would be re-typed on read and written back under a
    # RENAMED directory (split=1), silently mutating the layout and the
    # downstream partition-column types.  Read with inference off so
    # partition columns stay strings and directory names are preserved.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        # partition discovery happens eagerly at load(), so the conf can
        # be restored as soon as the DataFrame exists
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(infer_key, prev_infer)
    if partition_cols and not all(c in df.columns for c in partition_cols):
        # detected layout disagrees with the actual read schema (stray
        # k=v-named directory, mixed-depth layout): partitionBy on a
        # missing column would fail the rewrite mid-flight — fall back
        # to the flat path, which preserves all data
        partition_cols = []
    rows = df.count()
    n_files = max(1, -(-rows // target_rows_per_file))
    range_cols = [*(partition_cols or []), *(sort_cols or [])]
    if range_cols:
        out = df.repartitionByRange(n_files, *range_cols)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    fs, jpath = _hadoop_fs(spark, path)
    _rm(spark, path)
    fs.rename(
        spark._jvm.org.apache.hadoop.fs.Path(tmp),
        jpath,
    )
    return n_files


def compact_parquet_to_size(
    spark: SparkSession,
    path: str,
    target_bytes: int = 512 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Byte-targeted compaction: choose the output file count from the
    directory's ACTUAL parquet bytes (post-encoding, post-compression),
    then delegate to :func:`compact_parquet`.

    Row-count targets drift as row width changes between tables (a
    10-column metrics table and a documents table with 100 KB text rows
    need very different rows-per-file); bytes on disk are the ground
    truth the 128 MB-to-1 GB file-sizing guidance is stated in.  The size
    probe is one namenode listing — no data read.
    """
    fs, jpath = _hadoop_fs(spark, path)
    total = 0
    # recursive listing: partitioned datasets (split=.../part-*.parquet)
    # keep their data files in subdirectories — a flat listStatus would
    # see only directories, total 0 bytes, and compact everything to ONE file
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    rows = spark.read.parquet(path).count()
    n_files = max(1, -(-total // max(1, target_bytes)))
    target_rows = max(1, -(-rows // n_files))
    return compact_parquet(
        spark,
        path,
        target_rows_per_file=target_rows,
        sort_cols=sort_cols,
        partition_cols=partition_cols,
    )


def zorder_value(*cols, bits: int = 16):
    """Z-order (Morton) curve value: interleave the top ``bits`` of each
    column's rank-space so sorting by ONE value clusters on ALL dims —
    per-file min/max stay selective for every interleaved column, which is
    what makes multi-predicate row-group skipping work (Delta/Iceberg's
    OPTIMIZE ZORDER BY, as a plain codegen expression).

    Columns must already be non-negative integers in [0, 2^bits) — map
    real domains first (e.g. ``F.floor(value / step)``, day numbers,
    dictionary codes).  Pure bit arithmetic: shiftleft/|, no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    parts = []
    for ci, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("bigint")
        for b in range(bits):
            # bit b of column ci lands at interleaved position b*n + ci
            parts.append(
                F.shiftleft(
                    F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + ci
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out
