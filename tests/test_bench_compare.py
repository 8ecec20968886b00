"""tools/bench_compare.py: the canary-normalized regression gate.

Round-10 verdict task 5: a deliberate slowdown must trip the ``--gate``
mode (exit 2) while an unchanged artifact pair passes — and wrapper
artifacts whose ``parsed.queries`` carry BENCH_SEQ-style stat dicts must
normalize to medians instead of raising in the ratio math (round-10
advisor fix).  Pure-subprocess tests; no Spark session needed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(ROOT, "tools", "bench_compare.py")


def _artifact(tmp_path, name, queries, canary=0.4):
    d = {
        "n": 1,
        "rc": 0,
        "parsed": {
            "queries": queries,
            "canary_start": {"median": canary},
            "canary_end": {"median": canary},
        },
    }
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return str(p)


def _run(*argv):
    return subprocess.run(
        [sys.executable, TOOL, *argv], capture_output=True, text=True, cwd=ROOT
    )


def test_gate_passes_on_parity(tmp_path):
    old = _artifact(tmp_path, "old.json", {"q_a": 2.0, "q_b": 1.0})
    new = _artifact(tmp_path, "new.json", {"q_a": 2.1, "q_b": 0.9})
    r = _run("--gate", old, new)
    assert r.returncode == 0, r.stdout + r.stderr


def test_gate_trips_on_slowdown(tmp_path):
    old = _artifact(tmp_path, "old.json", {"q_a": 2.0, "q_b": 1.0})
    new = _artifact(tmp_path, "new.json", {"q_a": 6.0, "q_b": 1.0})
    r = _run("--gate", old, new)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "GATE FAILED" in r.stdout


def test_gate_normalizes_by_canary(tmp_path):
    # a uniform 2x slowdown fully explained by a 2x-slower canary must
    # NOT trip the gate — that's host drift, not a code regression
    old = _artifact(tmp_path, "old.json", {"q_a": 2.0, "q_b": 1.0}, canary=0.4)
    new = _artifact(tmp_path, "new.json", {"q_a": 4.0, "q_b": 2.0}, canary=0.8)
    r = _run("--gate", old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "host ratio 2.00x" in r.stdout


def test_parsed_branch_tolerates_stat_dicts(tmp_path):
    # wrapper artifacts carrying per-query stat dicts under parsed.queries
    # must be reduced to medians, same as the top-level branch
    old = _artifact(
        tmp_path, "old.json", {"q_a": {"median": 2.0, "runs": [1.9, 2.1]}}
    )
    new = _artifact(tmp_path, "new.json", {"q_a": {"median": 2.0, "runs": [2.0]}})
    r = _run("--gate", old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "TypeError" not in r.stderr
