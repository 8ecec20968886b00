"""Keyed time-series recurrences — EWMA smoothing in exact integer
arithmetic.

An EWMA is a sequential linear recurrence (``y_i = (1-α)·y_{i-1} + α·x_i``)
— the one shape a declarative engine cannot express as a plain aggregate
because it is order-dependent and (in truncating integer form) non-
associative.  The scalable decomposition is BY KEY: billions of
independent per-key timelines parallelize perfectly, each key's fold runs
where its group lands after ONE hash exchange, and per-key state is one
scalar.

Arithmetic is scaled-integer (same discipline as
``datapipe/graph.py::pagerank_int``): with ``α = num/den``,

    y_1 = x_1;  y_i = ((den-num)·y_{i-1} + num·x_i) DIV den

over ``x`` scaled by a fixed factor — bit-exact on any engine and any
partitioning, so a DuckDB ``list_reduce`` oracle reproduces it exactly
(floating-point EWMA would drift in the last ulps and break hash
comparison).  The fold itself is a JVM higher-order ``aggregate`` over the
key's time-sorted value array — no Python, no window, no second exchange;
per-key arrays are bounded by the same contract as ``list_agg``
(a single key's history fits an executor — salt or re-window keys that
don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _idiv(a, den: int):
    """Exact integer division on BIGINT-ranged values: (a - a mod den)/den.

    The double division is exact because |a| stays far below 2^53 by the
    scaling contract; floor-mod matches DuckDB ``//`` for the non-negative
    values the scaling produces."""
    return ((a - (a % den)) / den).cast("long")


def scaled_int(value, scale: int = 1000):
    """Half-up fixed-point scaling (the engine-portable rounding form used
    by ``int8_quantize``): floor(v·scale + 0.5)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.floor(v.cast("double") * scale + F.lit(0.5)).cast("long")


def ewma_int_df(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 5,
    scale: int = 1000,
) -> DataFrame:
    """Per-key integer EWMA: (``*key_cols``, n_events, ewma_scaled).

    ``order_cols`` must totally order each key's events (append an id).
    ``ewma_scaled`` is the final recurrence state in ``scale`` fixed-point
    units; divide by ``scale`` for the real-valued smoothed metric.
    """
    keep = alpha_den - alpha_num
    ordered = df.select(
        *key_cols,
        F.struct(*[F.col(c) for c in order_cols]).alias("_o"),
        scaled_int(value_col, scale).alias("_x"),
    )
    arr = (
        ordered.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_o", "_x"))),
                lambda s: s["_x"],
            ).alias("_xs"),
        )
    )
    fold = F.aggregate(
        F.slice(F.col("_xs"), 2, F.greatest(F.size("_xs") - 1, F.lit(0))),
        F.element_at(F.col("_xs"), 1),
        lambda acc, x: _idiv(F.lit(keep) * acc + F.lit(alpha_num) * x, alpha_den),
    )
    return arr.select(
        *key_cols,
        F.col("n_events").cast("bigint").alias("n_events"),
        fold.alias("ewma_scaled"),
    )
