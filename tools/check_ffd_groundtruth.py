#!/usr/bin/env python
"""Scale-checkable ground truth for ``ffd_packing_summary``.

The standard oracle replays the first-fit fold as a DuckDB ``list_reduce``
whose accumulator (the bin-remainder list) is COPIED per step — ~cubic in
shard size, measured 2273s at the sf1 replica and dominating every full
sf1 refresh (BENCH_SF1.md).  Same paradigm as ``check_cc_groundtruth.py``:
keep every cheap part of the oracle in DuckDB (tokenization, per-shard
totals/oversize counts, the final projection with its ``round``), replace
ONLY the fold with a driver-side replay:

* the replay is the NAIVE first-fit scan (numpy-vectorized leftmost-fit
  lookup), i.e. the same semantics as the SQL ``list_reduce`` — NOT the
  segment tree the Spark side uses, so production and ground truth stay
  independent implementations (their equivalence is separately pinned by
  ``tests/test_packing.py::test_first_fit_segment_tree_matches_naive_scan``);
* per-shard ``n_bins`` from the replay is registered as a DuckDB table
  and substituted into the oracle's final SELECT.

Usage: python tools/check_ffd_groundtruth.py [--json OUT] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import numpy as np

import check_correctness as CC

CAPACITY = 256

#: the oracle's ``d`` CTE verbatim (analytics_extra.FFD_PACKING_SQL)
_SIZES_SQL = """
SELECT doc_id, lang AS shard,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
ORDER BY shard, n_tokens DESC, doc_id ASC
"""


def first_fit_bins(sizes: np.ndarray, capacity: int = CAPACITY) -> int:
    """Naive leftmost-fit replay over (size desc, id asc)-ordered sizes.

    Oversize docs occupy a dedicated rem=0 bin, exactly like the SQL fold
    and ``datapipe/packing.py::first_fit_pack``.  The remainder array is
    scanned with a vectorized ``argmax(rem >= s)`` — O(bins) per doc in C,
    which holds up at the 100× replica where the pure-Python scan and the
    SQL list_reduce do not.
    """
    rem = np.empty(len(sizes), dtype=np.int64)
    n = 0
    for s in sizes:
        if s > capacity:
            rem[n] = 0
            n += 1
            continue
        if n:
            window = rem[:n]
            fits = window >= s
            if fits.any():
                i = int(np.argmax(fits))
                rem[i] -= s
                continue
        rem[n] = capacity - s
        n += 1
    return n


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args.pop(0) if args else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod
    from lab_flink_repository_analytics_spark.session import get_spark

    spark = get_spark(app_name="check-ffd-groundtruth")
    con = duckdb.connect()
    for t in CC.TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        if os.path.exists(path):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")

    t0 = time.time()
    sizes = con.sql(_SIZES_SQL).df()
    rows = []
    for shard, grp in sizes.groupby("shard", sort=True):
        rows.append((shard, first_fit_bins(grp["n_tokens"].to_numpy())))
    t_gt = time.time() - t0
    print(
        f"ground truth: {len(sizes)} docs, {len(rows)} shards  ({t_gt:.1f}s)",
        file=sys.stderr,
    )
    import pandas as pd

    con.register("ffd_bins_src", pd.DataFrame(rows, columns=["shard", "n_bins"]))

    # the oracle minus the fold: totals/oversize in SQL, n_bins joined in
    sub = f"""
WITH d AS (
  SELECT doc_id, lang AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
folded AS (
  SELECT d.shard,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN n_tokens > {CAPACITY} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oversize_bins,
         CAST(any_value(b.n_bins) AS BIGINT) AS n_bins
  FROM d JOIN ffd_bins_src b ON d.shard = b.shard
  GROUP BY d.shard
)
SELECT shard, n_bins, total_tokens,
       round(CAST(total_tokens AS DOUBLE) / (n_bins * {CAPACITY}), 6) AS fill_rate,
       n_oversize_bins
FROM folded
"""
    t0 = time.time()
    spark_pd = entry_mod.queries()["ffd_packing_summary"](spark, sf_dir).toPandas()
    oracle_pd = con.sql(sub).df()
    s_cols, s_rows = CC._driver_normalize(spark_pd)
    o_cols, o_rows = CC._driver_normalize(oracle_pd)
    hash_ = s_cols == o_cols and s_rows == o_rows
    report = {
        "ffd_packing_summary": {
            "rows_match": len(s_rows) == len(o_rows),
            "schema_match": s_cols == o_cols,
            "hash_match": hash_,
            "spark_rows": len(s_rows),
            "oracle_rows": len(o_rows),
            "oracle": "python-firstfit-groundtruth",
            "err": None,
        },
        "_groundtruth": {
            "docs": int(len(sizes)),
            "shards": len(rows),
            "build_sec": round(t_gt, 1),
            "sf_dir": sf_dir,
        },
    }
    status = "OK " if hash_ else "FAIL"
    print(
        f"{status}  ffd_packing_summary: {len(s_rows)} rows "
        f"{'exact' if hash_ else 'MISMATCH'}  ({time.time()-t0:.1f}s)",
        file=sys.stderr,
    )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()
    sys.exit(0 if hash_ else 1)


if __name__ == "__main__":
    main()
