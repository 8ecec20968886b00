"""Distribution-drift monitoring between corpus/feature snapshots —
Population Stability Index (PSI) over the package's mergeable histogram
sketches (:mod:`datapipe.sketches`).

The recurring-pipeline gate: yesterday's ingest vs today's (or train-time
vs serve-time feature distributions), scored per key.  PSI =
Σ_bins (p_a − p_b)·ln(p_a/p_b) with add-one smoothing per bin so empty
bins are defined; the conventional read: < 0.1 stable, 0.1–0.25 moderate
shift, > 0.25 action.

Scale shape: inputs are HISTOGRAM SKETCHES, not raw data — |keys|×bins
counter rows each (the raw scans happened once, inside
``sketches.value_histogram``, possibly on different days/clusters).  The
full bin grid is materialized per key (empty-in-both bins still carry
smoothed mass when totals differ, so the grid is part of the definition),
the per-key totals join is broadcast-sized, and the PSI terms are summed
as exact DECIMALs — double summation order is engine-dependent, decimal
is not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_drift(
    hist_a: DataFrame,
    hist_b: DataFrame,
    keys: Sequence[str],
    bins: int,
) -> DataFrame:
    """Per-key PSI between two ``sketches.value_histogram`` outputs built
    on the SAME (lo, hi, bins) grid.  Output: (keys…, n_a, n_b, psi)."""
    keys = list(keys)
    a = hist_a.select(*keys, "bin", F.col("c").alias("ca"))
    b = hist_b.select(*keys, "bin", F.col("c").alias("cb"))
    kd = a.select(*keys).unionByName(b.select(*keys)).distinct()
    grid = kd.select(
        *keys, F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin")
    )
    j = (
        grid.join(a, [*keys, "bin"], "left")
        .join(b, [*keys, "bin"], "left")
        .fillna(0, ["ca", "cb"])
    )
    totals = j.groupBy(*keys).agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    jt = j.join(F.broadcast(totals), keys)
    pa = (F.col("ca") + 1).cast("double") / (F.col("n_a") + F.lit(bins))
    pb = (F.col("cb") + 1).cast("double") / (F.col("n_b") + F.lit(bins))
    term = ((pa - pb) * F.log(pa / pb)).cast("decimal(25,18)")
    return (
        jt.select(*keys, "n_a", "n_b", term.alias("t"))
        .groupBy(*keys, "n_a", "n_b")
        .agg(F.round(F.sum("t").cast("double"), 6).alias("psi"))
    )
