#!/usr/bin/env bash
# Pre-handoff gate — run before updating COVERAGE.md claims or handing off.
#
# Round 1 shipped a claims file ("94/95 hash-match") the actual runtime
# contradicted (0/50 — an untested environment assumption in load_tables).
# This script is the fix-as-habit: claims only after these three pass HERE.
#
#   1. pytest tests/                 (full unit/integration suite)
#   2. tools/check_correctness.py    (driver-gate mirror, sf0.01, all queries)
#   3. bench.py smoke                (sf0.001 — proves rc=0 end-to-end)
#
# Usage: tools/ci.sh [--quick]   (--quick: sf0.001 correctness, subset pytest)

set -euo pipefail
cd "$(dirname "$0")/.."

QUICK="${1:-}"

echo "=== [1/3] pytest ==="
if [[ "$QUICK" == "--quick" ]]; then
  python -m pytest tests/ -x -q -k "environment or util or plans"
else
  python -m pytest tests/ -x -q
fi

echo "=== [2/3] correctness vs DuckDB oracle (driver-mirror canon) ==="
# --driver-mirror: canonicalize exactly like the driver (pandas sort_values,
# no list rescue) so unsortable output schemas fail HERE, not on the driver.
if [[ "$QUICK" == "--quick" ]]; then
  python tools/check_correctness.py --driver-mirror /root/testdata/sf0.001
else
  python tools/check_correctness.py --driver-mirror /root/testdata/sf0.01
fi

echo "=== [3/3] bench smoke (sf0.001) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py

echo "=== [extra] bench regression compare (non-fatal) ==="
python tools/bench_compare.py || true

echo "=== CI GATE: ALL GREEN ==="
