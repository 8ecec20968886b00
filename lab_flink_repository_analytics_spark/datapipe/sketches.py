"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 3.5+ as ``hll_sketch_agg`` / ``hll_union_agg``).

Why this exists: exact COUNT(DISTINCT) re-shuffles raw values every time a
rollup is recomputed, and cannot be maintained incrementally — at 100 TB
the daily-to-monthly-to-total distinct-user rollup either re-scans history
or keeps sketches.  An HLL sketch is a few KB per group, mergeable
map-side (partial aggregation works), unions in O(registers), and lands in
a parquet BINARY column, so coarser periods are computed from the stored
fine-period sketches without touching raw data again.

No DuckDB oracle: sketch binaries are implementation-defined (DataSketches
vs DuckDB's own HLL), so parity is pinned by pytest invariants instead —
merge-consistency (union of daily sketches == sketch of the union) and
estimate accuracy vs exact counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2(registers) — 12 ⇒ 4096 registers ≈ 1.6% relative standard error,
#: the DataSketches default trade-off for KB-scale state per group.
DEFAULT_LG_K = 12


def distinct_sketches(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_alias: str = "sketch",
) -> DataFrame:
    """Per-key HLL sketch of ``col`` — the storable/mergeable unit.  One
    hash exchange with map-side partial sketches (hll_sketch_agg is an
    algebraic aggregate)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_alias)
    )


def rollup_sketches(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    estimate_alias: str = "distinct_est",
) -> DataFrame:
    """Merge finer-grained sketches up to ``keys`` and estimate — no
    re-scan of raw data; input is the (tiny) sketch table."""
    grouped = (
        sketches.groupBy(*keys) if keys else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            estimate_alias
        )
    )
