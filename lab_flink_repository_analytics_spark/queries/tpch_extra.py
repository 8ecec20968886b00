"""Classic TPC-H query shapes adapted to the driver's slimmed schemas.

The reference exercises Flink's relational SQL surface (README.md:217-260:
windowed group-aggs, HAVING, joins, lateral unnest); these queries complete
the classic relational coverage on the same tables with the shapes the
reference never reaches: single-row global aggregates (Q6/Q14), nation-pair
self-joined dims (Q7), disjunctive multi-bracket predicates (Q19), scalar
subqueries (Q15/Q22), HAVING-driven semi joins (Q18), and the double
EXISTS / NOT EXISTS self-join (Q21).

Schema notes (TESTDATA.md): lineitem has no commitdate/receiptdate/shipmode,
part has no container, customer has no phone — where the classic query uses a
missing column the shape is preserved on an available one and the docstring
says so.

Float policy is suite-wide (suite.py): money sums go through DECIMAL(18,6)
then cast DOUBLE; double division uses identical operand order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.session import load_tables

DEC = "DECIMAL(18,6)"
_REV = f"CAST(l_extendedprice * (1 - l_discount) AS {DEC})"
_REV_SQL = f"CAST(sum({_REV}) AS DOUBLE)"


def _rev() -> F.Column:
    return F.sum(F.expr(_REV)).cast("double")


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan + filter + single-row global agg.


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates reach the parquet scan (PushedFilters); the agg
    is a partial/final pair over a single global group — the minimal
    full-scan query, a pure scan-throughput probe at 100 TB."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.expr(f"CAST(l_extendedprice * l_discount AS {DEC})"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q6_SQL = f"""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS {DEC})) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dim self-join, either direction).


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation joins twice under two roles (supplier side / customer side);
    the symmetric pair filter is an OR over the two orientations.  Both
    nation copies broadcast; lineitem⋈orders is the only shuffle."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_rev().alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {_REV_SQL} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — market share: nation's slice of regional revenue per year.


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The widest star in the suite: lineitem⋈orders backbone with part,
    supplier, customer, nation×2, region all broadcast.  The share is a
    conditional-sum ratio per year — numerator and denominator come out of
    ONE aggregation (no second pass, no self-join)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(t["region"]), F.col("c_rk") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    vol = F.expr(_REV)
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                F.lit(0).cast(DEC)
            ))
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .withColumn(
            "mkt_share",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6),
        )
    )


Q8_SQL = f"""
SELECT o_year,
       nation_volume, total_volume,
       round(nation_volume / total_volume, 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV}
                       ELSE CAST(0 AS {DEC}) END) AS DOUBLE) AS nation_volume,
         CAST(sum({_REV}) AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by lost revenue.


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One quarter of orders, returned lines only; customer+nation broadcast
    onto the orders⋈lineitem shuffle; deterministic top-20 (revenue desc,
    custkey)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {_REV_SQL} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 shape — conditional aggregation by line status (shipmode is absent from
# the driver schema; the CASE-bucketed priority counts are the Q12 core).


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + CASE-conditional counts: high- vs low-priority line counts per
    linestatus for one ship year — map-side partials collapse each group to
    two longs before the exchange."""
    t = load_tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue share: two conditional sums folded into one ratio.


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast part onto the filtered lineitem scan; numerator and
    denominator are DECIMAL-exact partial sums, divided once at the end
    (identical operand order on both engines)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    joined = li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.expr(_REV)).otherwise(
            F.lit(0).cast(DEC)
        )
    ).cast("double")
    return joined.agg(
        (F.lit(100.0) * promo / _rev()).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
             / {_REV_SQL} AS promo_share_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + scalar max subquery.


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view aggregates lineitem exactly once; the scalar max is
    a global window over the *aggregated* view (supplier-cardinality — tiny
    relative to the fact), so the plan has ONE lineitem scan regardless of
    AQE exchange-reuse.  A join-back-to-max formulation would scan the fact
    twice in the initial plan and only dedup at runtime."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev().alias("total_revenue"))
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING-driven semi join back to the fact.


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate lineitem per order, keep orders whose total quantity clears
    the threshold (rare), then enrich with orders+customer — the big table is
    aggregated exactly once and the survivors drive broadcast joins."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.expr(f"CAST(l_quantity AS {DEC})")).cast("double").alias("sum_qty")
        )
        .filter(F.col("sum_qty") > 230)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 230
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive bracket predicates (container/shipmode absent; the
# OR-of-conjunctive-brackets over brand × size × quantity is the Q19 core).


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three (brand, size-range, quantity-range) brackets OR'd together.
    Catalyst extracts the common l_quantity bounds below the join and keeps
    the residual disjunction as the join filter; part broadcasts."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    b1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    b2 = (
        (F.col("p_brand") == "Brand#22")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    b3 = (
        (F.col("p_brand") == "Brand#33")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(b1 | b2 | b3).agg(
        _rev().alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


Q19_SQL = f"""
SELECT {_REV_SQL} AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 shape — the only supplier who returned stock on a shared order
# (receipt/commit dates absent; the EXISTS + NOT EXISTS self-join pair on
# lineitem is the Q21 core, preserved on returnflag).


def q21_lone_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l1 (returned lines of finished orders) semi-joins "another supplier
    touched this order" and anti-joins "another supplier also returned" —
    both against the same lineitem scan, shuffled once on orderkey."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q22 shape — rich-but-idle customers: scalar avg subquery + anti join
# (phone prefixes absent; mktsegment plays the grouping role).


def q22_idle_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global average broadcasts as a one-row scalar; customers above it
    anti-join recent orders (NOT EXISTS an order since 2000 — "churned") and
    aggregate per segment.  The recency filter is pushed into the orders scan
    before the anti-join hash table builds on custkey."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.expr(f"CAST(c_acctbal AS {DEC})")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    rich = (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    idle = rich.join(
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.expr(f"CAST(c_acctbal AS {DEC})")).cast("double").alias("totacctbal"),
    )


Q22_SQL = f"""
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year, ADAPTED: the slim schema has
# no partsupp, so profit = revenue (extendedprice·(1-disc)) rather than
# revenue - supplycost·quantity; the SHAPE (LIKE-filtered part dim, widest
# fact join, (nation, year) rollup) is the point.


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: lineitem ⋈ supplier ⋈ nation ⋈ orders ⋈ part(LIKE) —
    dims broadcast onto the fact backbone, one (nation, year) rollup."""
    t = load_tables(spark, sf_dir)
    li, sup, nat, orders, part = (
        t["lineitem"],
        t["supplier"],
        t["nation"],
        t["orders"],
        t["part"],
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%"))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(_rev().alias("profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {_REV_SQL} AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: the LEFT OUTER join + double
# aggregation (count per customer, then histogram of counts) the suite
# otherwise lacks.


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: customers LEFT OUTER their non-special orders, count per
    customer (zero included), then the distribution of those counts.
    Two aggregations, both keyed — no single-partition stage."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(~F.col("o_orderpriority").like("%SPECIAL%"))
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%SPECIAL%'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q12_priority_lines": q12_priority_lines,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q21_lone_returner": q21_lone_returner,
    "q22_idle_accounts": q22_idle_accounts,
    "q9_nation_profit": q9_nation_profit,
    "q13_customer_distribution": q13_customer_distribution,
}

ORACLES = {
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_lines": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_bracket_revenue": Q19_SQL,
    "q21_lone_returner": Q21_SQL,
    "q22_idle_accounts": Q22_SQL,
    "q9_nation_profit": Q9_SQL,
    "q13_customer_distribution": Q13_SQL,
}
