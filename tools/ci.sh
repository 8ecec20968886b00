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
# Usage: tools/ci.sh [--quick|--extended-smoke]
#   --quick           sf0.001 correctness, subset pytest
#   --extended-smoke  NO pytest — just a <5 min driver-mirror oracle pass
#                     over a fixed spot-check list spanning every extension
#                     module (graph, BPE, dup-span, similarity, sketches,
#                     text, sampling), at sf0.001.  Run after touching any
#                     extension operator to catch regressions in minutes;
#                     the full gate still runs before handoff.

set -euo pipefail
cd "$(dirname "$0")/.."

QUICK="${1:-}"

# one graded + ungraded query per extension module — the round-3 judge's
# 13-query spot-check list, kept as the standing fast regression net
EXTENDED_SMOKE_QUERIES=(
  copurchase_triangles copurchase_pagerank dedup_clusters
  bpe_merges bpe_token_counts duplicate_text_spans boilerplate_gram_frac
  bigram_lm_scores source_gram_overlap source_token_entropy
  semantic_dedup kmeans_clusters embedding_covariance
  leakage_safe_split_counts ffd_packing_summary event_value_drift
  bpe_fertility_by_source near_dup_source_matrix mixture_token_quotas
  quota_fill_counts length_bucket_stats source_mixture_weights
)

if [[ "$QUICK" == "--extended-smoke" ]]; then
  echo "=== extended smoke: driver-mirror oracle over ${#EXTENDED_SMOKE_QUERIES[@]} extension queries (sf0.001) ==="
  python tools/check_correctness.py --driver-mirror /root/testdata/sf0.001 \
    "${EXTENDED_SMOKE_QUERIES[@]}"
  echo "=== EXTENDED SMOKE: GREEN ==="
  exit 0
fi

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

echo "=== [extra] bench regression gate (canary-normalized, fatal >1.5x) ==="
# compares the two most recent driver BENCH_r*.json artifacts; a real
# (canary-normalized) per-query slowdown now FAILS the gate instead of
# scrolling by as a report (round-10 verdict task 5)
python tools/bench_compare.py --gate

echo "=== CI GATE: ALL GREEN ==="
