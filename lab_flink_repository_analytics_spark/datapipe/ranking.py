"""Distributed EXACT global ranking — row_number / ntile without the
single-partition window.

``Window.orderBy(...)`` with no partition key moves every row to ONE
partition (Spark warns exactly this); at 100 TB that executor dies.  The
classic scale-safe construction used here:

1. ``repartitionByRange(order_cols)`` — one total-order range shuffle
   (sampled boundaries, same machinery as a global sort);
2. per-partition row counts — ONE tiny driver collect of ~#partitions
   scalars (the same bounded-driver-state pattern as
   ``datapipe/graph.py``'s convergence checksum);
3. global row_number = partition offset (a broadcast map of cumulative
   counts) + intra-partition row_number — the intra-partition window
   partitions on the materialized partition id, so no data moves again
   (the range shuffle's output is cached across the two passes).

``exact_ntile`` then derives SQL-exact NTILE(n) bucket ids from the global
rank and total count N with pure integer arithmetic: the first ``N mod n``
buckets get ``ceil(N/n)`` rows, the rest ``floor(N/n)`` — bit-identical to
the single-partition form, verified against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach an exact global 1-based row number ordered by ``order_cols``.

    Returns ``(df_with_rank, total_count)``.  ``order_cols`` must be a
    total order (append a tie-breaker key) for the rank to be
    deterministic.  Cost: one range shuffle + one #partitions-sized driver
    collect; no single-partition stage at any scale.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    # tiny: one row per shuffle partition
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[x for pid in sorted(offsets) for x in (F.lit(pid), F.lit(offsets[pid]))]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*cols)
    out = (
        ranged.withColumn(out_col, (F.row_number().over(w) + off_expr).cast("long"))
        .drop("__pid")
    )
    return out, total


def exact_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL-exact ``NTILE(n) OVER (ORDER BY ...)`` without a global window.

    Bucket sizes follow the standard: with ``q = N div n`` and
    ``r = N mod n``, buckets ``1..r`` hold ``q+1`` rows, buckets
    ``r+1..n`` hold ``q``.
    """
    ranked, total = with_global_row_number(
        df, order_cols, out_col="__rn", num_partitions=num_partitions
    )
    q, r = divmod(total, n_buckets)
    head = r * (q + 1)  # rows living in the q+1-sized buckets
    rn = F.col("__rn")
    if q == 0:
        bucket = rn  # fewer rows than buckets: one row per bucket
    else:
        # integer-exact ceil divisions (float floor would wobble past 2^53)
        bucket = F.when(
            rn <= F.lit(head), F.expr(f"(__rn + {q}) div {q + 1}")
        ).otherwise(F.expr(f"{r} + ((__rn - {head} + {q - 1}) div {q})"))
    return ranked.withColumn(out_col, bucket.cast("int")).drop("__rn")
