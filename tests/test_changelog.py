"""Changelog materialization vs the reference's retraction fixtures.

Each case replays a reference ITCase changelog input and asserts our
final-state materialization + aggregate equals the *net* of the reference's
asserted RowKind sequence (fold +I/+U as add, -U/-D as remove).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark import changelog as CL
from lab_flink_repository_analytics_spark.functions import aggregate as AGG


def _cdf(spark, rows, schema="kind string, name string, age int"):
    return spark.createDataFrame(rows, schema)


def test_multiset_listagg1(spark):
    # ListAggITCase112.testListAgg1: I(john,32) I(john,32) UB(john,32)
    # UA(john,33) → net final: {32: john, 33: john}
    df = _cdf(
        spark,
        [("+I", "john", 32), ("+I", "john", 32), ("-U", "john", 32), ("+U", "john", 33)],
    )
    final = (
        CL.materialize_multiset(df)
        .groupBy("age")
        .agg(AGG.list_agg("name", order_by="name").alias("names"))
    )
    got = {r["age"]: r["names"] for r in final.collect()}
    assert got == {32: "john", 33: "john"}


def test_multiset_listagg2(spark):
    # testListAgg2: I(john,32) UB(john,32) UA(john,33) → reference emits
    # I 32, D 32, I 33 — net final: {33: john}
    df = _cdf(spark, [("+I", "john", 32), ("-U", "john", 32), ("+U", "john", 33)])
    final = (
        CL.materialize_multiset(df)
        .groupBy("age")
        .agg(AGG.list_agg("name", order_by="name").alias("names"))
    )
    got = {r["age"]: r["names"] for r in final.collect()}
    assert got == {33: "john"}


def test_multiset_full_delete(spark):
    df = _cdf(spark, [("+I", "a", 1), ("-D", "a", 1)])
    assert CL.materialize_multiset(df).count() == 0


def test_multiset_multiplicity(spark):
    # two identical inserts, one retraction → one surviving instance
    df = _cdf(spark, [("+I", "a", 1), ("+I", "a", 1), ("-U", "a", 1)])
    out = CL.materialize_multiset(df).collect()
    assert len(out) == 1 and out[0]["name"] == "a"


def test_multiset_random_changelogs_match_simulation(spark):
    """Batched property test: random I/UA/UB/D sequences materialize to the
    same multiset a direct Python simulation produces."""
    import random
    from collections import Counter

    rng = random.Random(42)
    rows, expected = [], Counter()
    for case in range(40):
        n = rng.randint(1, 12)
        for _ in range(n):
            kind = rng.choice(["+I", "+I", "+U", "-U", "-D"])
            name = rng.choice(["a", "b", "c"])
            age = rng.randint(1, 3) + case * 10  # cases don't collide
            rows.append((kind, name, age))
            if kind in ("+I", "+U"):
                expected[(name, age)] += 1
            else:
                expected[(name, age)] -= 1
    df = _cdf(spark, rows)
    got = Counter(
        (r["name"], r["age"]) for r in CL.materialize_multiset(df).collect()
    )
    assert got == Counter({k: v for k, v in expected.items() if v > 0})


def test_multiset_counts_equal_explode_then_count(spark):
    """materialize_multiset_counts(df)._net ≡ count(*) of
    materialize_multiset(df) grouped by the full value tuple — the
    changelog_net_counts query rides this identity (round-10 opt: no
    explode back to changelog volume, no second aggregation)."""
    import random

    rng = random.Random(7)
    rows = [
        (rng.choice(["+I", "+I", "+U", "-U", "-D"]),
         rng.choice(["a", "b", "c"]), rng.randint(1, 4))
        for _ in range(200)
    ]
    df = _cdf(spark, rows)
    via_explode = {
        (r["name"], r["age"]): r["n"]
        for r in CL.materialize_multiset(df)
        .groupBy("name", "age")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    via_counts = {
        (r["name"], r["age"]): r["_net"]
        for r in CL.materialize_multiset_counts(df).collect()
    }
    assert via_counts == via_explode


# ---------------------------------------------------------------------------
# RowKind EMISSION parity: replay the reference's changelog fixtures and
# assert the emitted +I/-D/-U/+U stream itself, not just the folded state
# (ListAggITCase112.java:70-109 asserts these exact sequences with
# containsInAnyOrder; ListAggITCase113.java:56-103 replays the SAME
# fixtures through the 1.13 from/toChangelogStream API — one emission
# test covers both)


def _listagg_state(prefix):
    """age → LISTAGG(DISTINCT name) over the net multiset of the prefix,
    names in arrival order (Flink's accumulator appends on first add)."""
    net = (
        prefix.groupBy("name", "age")
        .agg(
            F.sum(CL._sign(F.col("kind"))).alias("_net"),
            F.min(F.when(CL._sign(F.col("kind")) > 0, F.col("pos"))).alias("_first"),
        )
        .filter(F.col("_net") > 0)
    )
    return net.groupBy("age").agg(
        AGG.list_agg("name", order_by="_first").alias("names")
    )


def _pdf(spark, rows):
    return spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "pos long, kind string, name string, age int",
    )


def _replay(spark, rows):
    df = _pdf(spark, rows)
    return CL.replay_changelog(df, _listagg_state, ["age"], order_col="pos")


def test_emission_listagg1(spark):
    # ITCase112.testListAgg1:70-82 — duplicate insert + retract of one
    # duplicate emit NOTHING (distinct state unchanged); only the two
    # inserts surface
    got = _replay(
        spark,
        [("+I", "john", 32), ("+I", "john", 32), ("-U", "john", 32), ("+U", "john", 33)],
    )
    assert sorted(got) == sorted(
        [("+I", (32, "john")), ("+I", (33, "john"))]
    )


def test_emission_listagg2(spark):
    # ITCase112.testListAgg2:85-97 — the group emptying emits a DELETE
    got = _replay(
        spark, [("+I", "john", 32), ("-U", "john", 32), ("+U", "john", 33)]
    )
    assert sorted(got) == sorted(
        [("+I", (32, "john")), ("-D", (32, "john")), ("+I", (33, "john"))]
    )


def test_emission_listagg3(spark):
    # ITCase112.testListAgg3:100-109 — second name in the same group emits
    # an UPDATE_BEFORE/UPDATE_AFTER pair, arrival order preserved
    got = _replay(spark, [("+I", "john", 32), ("+I", "alice", 32)])
    assert sorted(got) == sorted(
        [
            ("+I", (32, "john")),
            ("-U", (32, "john")),
            ("+U", (32, "john,alice")),
        ]
    )


def test_emission_batched_folds_intermediate_states(spark):
    # batch_size=2: testListAgg2's first two rows land in one step whose
    # net state is empty → nothing emitted for age 32 at all
    df = _pdf(spark, [("+I", "john", 32), ("-U", "john", 32), ("+U", "john", 33)])
    got = CL.replay_changelog(
        df, _listagg_state, ["age"], order_col="pos", batch_size=2
    )
    assert got == [("+I", (33, "john"))]


def test_changelog_deltas_column_order_stable_when_key_not_first(spark):
    # round-3 ADVICE: with a schema whose key column is NOT first, the
    # prev=None (+I) emission must use the same (kind, *keys, *values)
    # order as the diff branch, or positional consumers silently swap
    # fields between the first and later emissions
    new1 = spark.createDataFrame([("a", 7)], "v string, k int")
    first = CL.changelog_deltas(None, new1, ["k"])
    assert first.columns == ["kind", "k", "v"]
    new2 = spark.createDataFrame([("b", 7)], "v string, k int")
    diff = CL.changelog_deltas(new1, new2, ["k"])
    assert diff.columns == first.columns
    got = sorted((r["kind"], r["k"], r["v"]) for r in diff.collect())
    assert got == [("+U", 7, "b"), ("-U", 7, "a")]


def test_changelog_deltas_null_safe_values(spark):
    prev = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    got = sorted(
        (r["kind"], r["k"], r["v"])
        for r in CL.changelog_deltas(prev, new, ["k"]).collect()
    )
    # k=1 unchanged (null-safe compare); k=2 value change → UB/UA pair
    assert got == [("+U", 2, None), ("-U", 2, "x")]


def test_upsert_last_wins_and_delete(spark):
    # primary-keyed source (LastNonNullValueAggFunctionITCase.java:88-92):
    # upserts by key f0; a trailing delete removes the key
    rows = [
        ("+I", 1, "x", 0),
        ("+U", 1, "y", 1),
        ("+I", 2, "p", 2),
        ("-D", 2, None, 3),
        ("+I", 3, "q", 4),
    ]
    df = spark.createDataFrame(rows, "kind string, f0 int, v string, pos long")
    out = {
        r["f0"]: r["v"]
        for r in CL.materialize_upserts(df, ["f0"], "pos").collect()
    }
    assert out == {1: "y", 3: "q"}


def test_upsert_then_last_non_null_agg(spark):
    # end-to-end: keyed changelog → materialize → LastNonNullValue over the
    # final state (the reference pipes the same changelog into the UDAF)
    rows = [
        ("+I", 1, "a", 0),
        ("+U", 1, None, 1),  # null value must not count as the last
        ("+I", 2, "b", 2),
    ]
    df = spark.createDataFrame(rows, "kind string, f0 int, v string, pos long")
    final = CL.materialize_upserts(df, ["f0"], "pos")
    agg = final.select(
        AGG.last_non_null_value_agg("v", "f0").alias("last_v")
    ).collect()[0]
    assert agg["last_v"] == "b"


def test_apply_changelog_incremental_view(spark, tmp_path):
    # end-to-end incremental materialized view: replay the ITCase-2 input
    # step by step, apply each step's RowKind deltas to a parquet view,
    # and land on exactly the final state (ListAggITCase112.java:85-97)
    from lab_flink_repository_analytics_spark.io import sinks

    path = str(tmp_path / "mv")
    df = _pdf(spark, [("+I", "john", 32), ("-U", "john", 32), ("+U", "john", 33)])
    prev = None
    for end in [0, 1, 2]:
        cur = _listagg_state(df.filter(F.col("pos") <= end)).localCheckpoint(eager=True)
        deltas = CL.changelog_deltas(prev, cur, ["age"])
        sinks.apply_changelog(spark, deltas, path, ["age"])
        prev = cur
    got = {(r["age"], r["names"]) for r in spark.read.parquet(path).collect()}
    assert got == {(33, "john")}
    # idempotent: re-applying the LAST delta batch changes nothing
    deltas = CL.changelog_deltas(prev, prev, ["age"])
    sinks.apply_changelog(spark, deltas, path, ["age"])
    assert {(r["age"], r["names"]) for r in spark.read.parquet(path).collect()} == {
        (33, "john")
    }


def test_replay_changelog_refuses_production_sized_input(spark):
    # the prefix-replay parity mode is driver-side by construction; the
    # hard bound turns an accidental data-scale invocation into an error
    import pytest

    from lab_flink_repository_analytics_spark import changelog as CL

    old = CL.MAX_REPLAY_ROWS
    try:
        CL.MAX_REPLAY_ROWS = 5
        df = spark.range(6).select(
            F.col("id").alias("pos"), (F.col("id") % 2).alias("k")
        )
        with pytest.raises(ValueError, match="MAX_REPLAY_ROWS"):
            CL.replay_changelog(df, lambda d: d.groupBy("k").count(), ["k"])
    finally:
        CL.MAX_REPLAY_ROWS = old
