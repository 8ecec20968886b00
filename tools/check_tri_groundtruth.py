#!/usr/bin/env python
"""Scale-checkable ground truth for ``copurchase_triangles``.

The standard oracle (analytics_extra.TRIANGLES_SQL) enumerates triangles
with an UNDIRECTED wedge join + EXISTS probe — at the /tmp/scale/sf10
replica that join explodes (measured: >17 min, 117 GB RSS, 47 GB of
DuckDB spill before the kill), leaving the Spark side value-unverified
above sf1.

This tool keeps the oracle's ``edges`` CTE verbatim (the distinct
co-purchase pair list — one bounded self-join on l_orderkey) and swaps
ONLY the enumeration for the degree-ordered oriented formulation — the
same O(m^1.5) bound the Spark side uses (analytics_extra.py:711-860),
computed INDEPENDENTLY by DuckDB:

* each node gets a total-order rank by (degree, node id);
* each edge is oriented low-rank → high-rank;
* a triangle is counted exactly once as a wedge (u→v, u→w) with
  rank(v) < rank(w) whose closing edge (v→w) exists.

Triangle count, edge count, and wedge count are orientation-invariant
integers (pure graph theory, no float policy), so this is the SAME
answer the direct oracle defines, reachable at replica scale.  The tool
cross-validates itself against the direct TRIANGLES_SQL at small sf
(tests/test_tools_groundtruth.py) and compares Spark vs ground truth
with the driver-mirror canonicalization check_correctness uses.

Usage: python tools/check_tri_groundtruth.py [--json OUT] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import check_correctness as CC

#: the oriented enumeration: identical `edges` text to TRIANGLES_SQL,
#: then rank-oriented wedge closure instead of undirected + EXISTS
ORIENTED_TRI_SQL = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT pa AS node FROM edges UNION ALL SELECT pb AS node FROM edges
  ) GROUP BY node
),
rk AS (SELECT node, row_number() OVER (ORDER BY deg, node) AS r FROM deg),
o AS (
  SELECT CASE WHEN ra.r < rb.r THEN e.pa ELSE e.pb END AS u,
         CASE WHEN ra.r < rb.r THEN e.pb ELSE e.pa END AS v,
         CASE WHEN ra.r < rb.r THEN rb.r ELSE ra.r END AS rv
  FROM edges e
  JOIN rk ra ON ra.node = e.pa
  JOIN rk rb ON rb.node = e.pb
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM o a JOIN o b ON a.u = b.u AND a.rv < b.rv
  JOIN o c ON c.u = a.v AND c.v = b.v
),
wedges AS (SELECT CAST(sum(CAST(deg * (deg - 1) / 2 AS BIGINT)) AS BIGINT)
             AS n_wedges FROM deg),
ne AS (SELECT count(*) AS n_edges FROM edges)
SELECT n_edges, n_triangles, n_wedges,
       round(3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)
         AS clustering_coefficient
FROM ne CROSS JOIN tri CROSS JOIN wedges
"""


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from lab_flink_repository_analytics_spark.queries import analytics_extra as AX
    from lab_flink_repository_analytics_spark.session import get_spark

    spark = get_spark(app_name="check-tri-groundtruth")

    con = duckdb.connect()
    path = os.path.join(sf_dir, "lineitem.parquet")
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE OR REPLACE VIEW lineitem AS SELECT * FROM '{src}'")

    t0 = time.time()
    truth_pd = con.sql(ORIENTED_TRI_SQL).df()
    t_truth = time.time() - t0

    t0 = time.time()
    spark_pd = AX.copurchase_triangles(spark, sf_dir).toPandas()
    t_spark = time.time() - t0

    scols, srows = CC._driver_normalize(spark_pd)
    dcols, drows = CC._driver_normalize(truth_pd)
    ok = scols == dcols and srows == drows
    report = {
        "copurchase_triangles": {
            "rows_match": len(srows) == len(drows),
            "schema_match": scols == dcols,
            "hash_match": ok,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "oracle": "oriented-wedge-groundtruth",
            "err": None if ok else f"mismatch: spark={srows} truth={drows}",
        },
        "_meta": {
            "sf_dir": sf_dir,
            "truth_sec": round(t_truth, 1),
            "spark_sec": round(t_spark, 1),
            "values": {c: CC._norm_cell(v) for c, v in zip(dcols, drows[0])}
            if drows
            else None,
        },
    }
    print(json.dumps(report, indent=1, default=str))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, default=str)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
