"""Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023).

Completes the sketch family next to the HLL distinct sketch, the count-min
frequency sketch, and the fixed-bin histogram (datapipe/sketches.py).  The
histogram needs a known [lo, hi) and spends resolution uniformly; the
t-digest is range-free and concentrates resolution at the tails — the
right sketch for long-tailed latency/size columns where p99/p999 matter.

Representation: per group, two sorted arrays (centroid means, weights)
with the scale-function size bound k1 (weight of a centroid ≤
4·n·q(1-q)/δ).  Built per shard with an Arrow-batched ``applyInPandas``
(numpy inside), merged by concatenating centroid lists and re-compressing
— associative and commutative up to sketch error, so per-day digests roll
up to months/years without re-scanning raw data, exactly like the other
sketches.

No DuckDB oracle: the sketch is approximate and implementation-defined;
parity is pinned by pytest invariants (size bound, merge consistency,
quantile accuracy vs exact percentiles).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: compression parameter δ — ~2·δ centroids retained; 100 gives ≲0.5%
#: quantile error in the mid-range and far better at the tails.
DEFAULT_DELTA = 100


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Merge sorted centroids left-to-right under the k1 size bound."""
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0  # weight strictly before the open centroid
    cm, cw = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cw / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cw + w <= max(limit, 1.0):
            cm = (cm * cw + float(m) * float(w)) / (cw + float(w))
            cw += float(w)
        else:
            out_m.append(cm)
            out_w.append(cw)
            cum += cw
            cm, cw = float(m), float(w)
    out_m.append(cm)
    out_w.append(cw)
    return np.asarray(out_m), np.asarray(out_w)


_DIGEST_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("means", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("n", LongType()),
    ]
)


def tdigest_build(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """One digest row per group: (group, means[], weights[], n).

    ``keys`` are concatenated into the string ``group`` column (portable
    storage key).  One shuffle on the group; each group's values compress
    inside a single Arrow batch stream.  For groups too hot for one task,
    build per (group, salt) and ``tdigest_merge`` the salted digests —
    the merge IS the scale path."""

    def build(pdf):
        import pandas as pd

        vals = pdf["_v"].to_numpy(dtype=float)
        m, w = _compress(vals, np.ones_like(vals), delta)
        return pd.DataFrame(
            {
                "group": [pdf["_g"].iloc[0]],
                "means": [m.tolist()],
                "weights": [w.tolist()],
                "n": [len(vals)],
            }
        )

    keyed = df.select(
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return keyed.groupBy("_g").applyInPandas(build, _DIGEST_SCHEMA)


def tdigest_merge(digests: DataFrame, delta: int = DEFAULT_DELTA) -> DataFrame:
    """Merge digest rows sharing a group (shards, days → month) by
    concatenating centroids and re-compressing — constant-size state out."""

    def merge(pdf):
        import pandas as pd

        m = np.concatenate([np.asarray(x, dtype=float) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=float) for x in pdf["weights"]])
        mm, mw = _compress(m, w, delta)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "means": [mm.tolist()],
                "weights": [mw.tolist()],
                "n": [int(pdf["n"].sum())],
            }
        )

    return digests.groupBy("group").applyInPandas(merge, _DIGEST_SCHEMA)


def tdigest_quantile(means, weights, q: float) -> float:
    """Estimate the q-quantile from one digest (driver-side helper):
    piecewise-linear interpolation between centroid midpoints."""
    m = np.asarray(means, dtype=float)
    w = np.asarray(weights, dtype=float)
    total = w.sum()
    target = q * total
    mid = np.cumsum(w) - w / 2.0
    if target <= mid[0]:
        return float(m[0])
    if target >= mid[-1]:
        return float(m[-1])
    i = int(np.searchsorted(mid, target) - 1)
    frac = (target - mid[i]) / (mid[i + 1] - mid[i])
    return float(m[i] + frac * (m[i + 1] - m[i]))
