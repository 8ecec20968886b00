"""Changelog / retraction materialization (SURVEY.md §7 hard-part 1).

The reference's sources can be declared ``'changelog-mode' = 'I,UA,UB,D'``
(ListAggITCase112.java:50-62) and its aggregates implement ``retract()``;
Flink's planner then emits retraction streams.  Spark batch has no row
kinds — the engine-level equivalence chosen here is **final-state**: a
changelog is first materialized to its net row set, then any query runs on
that (what the reference's tests net out to after folding their asserted
UB/UA/D sequences).

Two materializations cover the reference's two source declarations:

* :func:`materialize_multiset` — un-keyed changelog (the values-connector
  case): ``+1`` for I/UA, ``-1`` for UB/D per row *value*; rows with
  positive net count survive with that multiplicity.  One hash aggregation
  on the value columns — shuffle ∝ distinct rows, scale-safe.
* :func:`materialize_upserts` — primary-keyed changelog
  (LastNonNullValueAggFunctionITCase.java:88-92, ``PRIMARY KEY (f0)``):
  last row per key in changelog order wins; keys whose last kind is D
  disappear.  ``max_by`` per key — O(1) state per key.

Streaming note: the live equivalents are output-mode ``update``/``complete``
(Spark emits upserts, not retractions) and ``streaming/stateful.py`` for
keyed state; these batch materializations exist so changelog-shaped inputs
can be replayed and cross-checked against final-state oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Flink RowKind short strings as they appear in changelog dumps.
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = "+I", "-U", "+U", "-D"

_ADDS = (INSERT, UPDATE_AFTER, "I", "UA")
_RETRACTS = (UPDATE_BEFORE, DELETE, "U", "UB", "D")


def _sign(kind_col: F.Column) -> F.Column:
    return (
        F.when(kind_col.isin(*_ADDS), F.lit(1))
        .when(kind_col.isin(*_RETRACTS), F.lit(-1))
        .otherwise(F.lit(0))
    )


def materialize_multiset(df: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Net row multiset of an un-keyed changelog.

    Each surviving row value is emitted ``count(adds) - count(retracts)``
    times (0 or negative → dropped, matching Flink's multiset retraction).
    """
    value_cols = [c for c in df.columns if c != kind_col]
    net = (
        df.groupBy(*value_cols)
        .agg(F.sum(_sign(F.col(kind_col))).alias("_net"))
        .filter(F.col("_net") > 0)
    )
    return net.select(
        *value_cols,
        F.explode(F.array_repeat(F.lit(1), F.col("_net").cast("int"))).alias("_i"),
    ).drop("_i")


def materialize_upserts(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    kind_col: str = "kind",
) -> DataFrame:
    """Final state of a primary-keyed changelog: last row per key wins,
    keys ending in DELETE vanish.  ``order_col`` is the changelog position
    (offset / ingest sequence) — batch's explicit stand-in for arrival
    order, per the engine's determinism rule (SURVEY.md §7.2).
    """
    value_cols = [c for c in df.columns if c not in (kind_col, order_col)]
    last = df.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(F.col(kind_col).alias("k"), *[F.col(c) for c in value_cols if c not in key_cols]),
            F.col(order_col),
        ).alias("_last")
    )
    alive = last.filter(~F.col("_last.k").isin(DELETE, "D"))
    return alive.select(
        *key_cols,
        *[F.col(f"_last.{c}").alias(c) for c in value_cols if c not in key_cols],
    )
