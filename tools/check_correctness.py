#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` AND its
``oracle_sql()`` DuckDB equivalent on the same parquet tables, then
compares row count, column names, and values (columns sorted by name,
rows sorted, exact match with a float-tolerance fallback that is reported
separately).

Usage: python tools/check_correctness.py [--driver-mirror] [sf_dir] [query ...]

``--driver-mirror`` canonicalizes exactly like the driver harness does
(``pandas.DataFrame.sort_values`` over all columns, no list→tuple
rescue).  Any output schema the driver cannot sort — e.g. an ARRAY
column — FAILS here instead of silently passing the list-aware local
check.  Round 2 shipped 5 array-valued queries that were value-exact
locally but `err` on the driver for exactly this reason; ci.sh now runs
this mode so the class is caught pre-handoff.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize the sign of zero: Spark's round() (BigDecimal
        # HALF_UP) returns +0.0 where DuckDB's keeps -0.0 for a tiny
        # negative input.  -0.0 == 0.0 everywhere that matters (pandas
        # sort_values, tuple ==, the driver's canonicalization), but this
        # tool sorts rows by repr(), where '-0.0' != '0.0' reorders the
        # row lists and a value-identical result read as a mismatch
        # (r11 inherited-state finding: embedding_covariance cell (6,10)).
        return v + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime / Timestamp
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy array or scalar
        r = v.tolist()
        return _norm_cell(tuple(r) if isinstance(r, list) else r)
    return v


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    out = []
    for row in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=repr)
    return cols, out


def _driver_normalize(df_pandas):
    """Mirror of the driver's ``_canon``: sort columns by name, then
    ``sort_values`` over all of them.  Raises (→ FAIL) on unsortable
    cell types such as lists, exactly like the driver does."""
    cols = sorted(df_pandas.columns)
    canon = df_pandas[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    rows = [tuple(_norm_cell(v) for v in r) for r in canon.itertuples(index=False, name=None)]
    return cols, rows


def _approx_equal(a, b, tol=1e-9):
    if type(a) is tuple and type(b) is tuple:
        return len(a) == len(b) and all(_approx_equal(x, y, tol) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b


def main():
    args = [a for a in sys.argv[1:]]
    driver_mirror = "--driver-mirror" in args
    args = [a for a in args if a != "--driver-mirror"]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    normalize = _driver_normalize if driver_mirror else _normalize
    # --exclude NAME (repeatable): skip queries whose oracle is replaced
    # by a faster ground-truth tool at big scale factors (ffd →
    # check_ffd_groundtruth.py, CC family → check_cc_groundtruth.py); the
    # skipped names are recorded in the JSON so an excluded query can
    # never silently read as green.  Extracted BEFORE the sf_dir
    # positional pop — popping first made `--exclude X /data/sf1` treat
    # the dir as a query-name filter and exit 0 with zero queries run
    # (round-10 advisor fix).
    excluded = []
    while "--exclude" in args:
        i = args.index("--exclude")
        excluded.append(args[i + 1])
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args)
    report: dict[str, dict] = {}

    def record(name, *, rows=False, schema=False, hash_=False, s_rows=None,
               o_rows=None, err=None):
        report[name] = {
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": hash_,
            "spark_rows": s_rows,
            "oracle_rows": o_rows,
            "err": err,
        }
    if driver_mirror:
        print("mode: driver-mirror (pandas sort_values canonicalization)")

    import __spark_entry__ as entry_mod
    from lab_flink_repository_analytics_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written replicas
        # (tools/make_scale_data.py) are directories of part files — glob
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: filter names not in the registry: {sorted(unknown)}")
        sys.exit(2)
    if only and not (only & set(qs)):
        print("ERROR: query filter matched nothing — zero queries would run")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in excluded:
            report[name] = {"skipped": "excluded (checked by ground-truth tool)"}
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            record(name, err=f"spark: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pd)} rows (no oracle — rows-only check)")
            record(name, rows=True, s_rows=len(spark_pd), err="rows-only (no oracle)")
            continue
        try:
            duck_pd = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            record(name, err=f"oracle: {e}")
            continue
        try:
            scols, srows = normalize(spark_pd)
            dcols, drows = normalize(duck_pd)
        except Exception as e:
            print(f"FAIL  {name}: canonicalization error (driver would err): {e}")
            failures.append(name)
            record(name, err=f"canon: {e}")
            continue
        dt = time.time() - t0
        nr = (len(srows), len(drows))
        if scols != dcols:
            print(f"FAIL  {name}: schema {scols} vs {dcols}")
            failures.append(name)
            record(name, rows=nr[0] == nr[1], s_rows=nr[0], o_rows=nr[1],
                   err="schema mismatch")
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            failures.append(name)
            record(name, schema=True, s_rows=nr[0], o_rows=nr[1],
                   err="rowcount mismatch")
            _show_diff(srows, drows)
            continue
        if srows == drows:
            print(f"OK    {name}: {len(srows)} rows exact  ({dt:.1f}s)")
            record(name, rows=True, schema=True, hash_=True,
                   s_rows=nr[0], o_rows=nr[1])
            continue
        if all(_approx_equal(a, b) for a, b in zip(srows, drows)):
            print(f"OK~   {name}: {len(srows)} rows approx-only (float ulp) ({dt:.1f}s)")
            record(name, rows=True, schema=True, s_rows=nr[0], o_rows=nr[1],
                   err="approx-only (float ulp)")
            continue
        print(f"FAIL  {name}: value mismatch ({len(srows)} rows)")
        failures.append(name)
        record(name, rows=True, schema=True, s_rows=nr[0], o_rows=nr[1],
               err="value mismatch")
        _show_diff(srows, drows)

    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(report, f, indent=2)
        print(f"wrote {json_out}")

    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL OK")


def _show_diff(srows, drows, n=3):
    sset, dset = set(map(repr, srows)), set(map(repr, drows))
    only_s = [r for r in srows if repr(r) not in dset][:n]
    only_d = [r for r in drows if repr(r) not in sset][:n]
    for r in only_s:
        print(f"      spark-only: {r}")
    for r in only_d:
        print(f"      duck-only : {r}")


if __name__ == "__main__":
    main()
