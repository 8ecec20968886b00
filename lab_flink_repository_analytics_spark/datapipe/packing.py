"""Bin packing for training-sequence assembly.

Two packing strategies for fitting variable-length documents into
fixed-capacity training sequences:

* concat-then-split (queries/suite.py::sequence_packing) — zero waste but
  documents straddle bin boundaries; pure window SQL, oracle-checked.
* first-fit-decreasing (here) — documents stay whole; procedural bin state,
  so it runs as an Arrow-batched ``applyInPandas`` per shard.  This is the
  standard greedy FFD heuristic (≤ 11/9·OPT + 1 bins).

Scale shape: one shuffle on the shard column; each shard packs
independently inside a single Python worker over Arrow batches.  Shards are
the parallelism unit — shard by e.g. ``lang`` × hash-bucket so each group
holds ~10⁴–10⁶ docs, NOT the whole corpus.  Oversized documents (longer
than the capacity) get a bin of their own and are flagged, never dropped
silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def first_fit_pack(
    df: DataFrame,
    capacity: int,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Pack each shard's rows into bins of ``capacity`` tokens with
    first-fit-decreasing; returns one row per input row with its bin.

    Output columns: ``shard, doc_id, n_tokens, bin, oversize``.  Bin ids are
    deterministic: docs sort by (size desc, id) before greedy placement, so
    re-runs and reshards reproduce the same assignment within each shard.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    out_schema = StructType(
        [
            StructField("shard", StringType()),
            StructField(id_col, LongType()),
            StructField(size_col, LongType()),
            StructField("bin", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            [size_col, id_col], ascending=[False, True], kind="mergesort"
        )
        # bins: list of remaining capacities; linear first-fit scan.  A
        # real 10⁶-doc shard would keep a best-fit heap; linear is fine for
        # the 10⁴-doc shards the shard_col contract targets.
        remaining: list[int] = []
        bins = []
        oversize = []
        for size in pdf[size_col].astype("int64"):
            if size > capacity:
                bins.append(len(remaining))
                remaining.append(0)
                oversize.append(True)
                continue
            for i, room in enumerate(remaining):
                if room >= size:
                    remaining[i] = room - size
                    bins.append(i)
                    break
            else:
                bins.append(len(remaining))
                remaining.append(capacity - size)
            oversize.append(False)
        return pd.DataFrame(
            {
                "shard": pdf[shard_col].astype(str),
                id_col: pdf[id_col].astype("int64"),
                size_col: pdf[size_col].astype("int64"),
                "bin": pd.Series(bins, index=pdf.index, dtype="int64"),
                "oversize": pd.Series(oversize, index=pdf.index, dtype=bool),
            }
        )

    cols = [shard_col, id_col, size_col]
    return df.select(*cols).groupBy(shard_col).applyInPandas(pack, out_schema)


def packing_summary(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency: bins used, fill rate, waste."""
    per_bin = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_bin.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.round(
            F.sum("bin_tokens").cast("double")
            / (F.count(F.lit(1)) * F.lit(capacity)).cast("double"),
            6,
        ).alias("fill_rate"),
        F.sum("has_oversize").alias("n_oversize_bins"),
    )
