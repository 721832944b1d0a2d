"""bench.py --check regression-tripwire tests (VERDICT r7 ask #6).

The envelope rule itself is unit-tested (pure function, no JVM); one
subprocess test proves the flag actually fires end-to-end — a
fabricated previous artifact claims a query was near-instant, so the
real run must trip the >2x-and-above-floor rule and exit non-zero.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_check_regressions_envelope_rule():
    prev = {"fast": 0.2, "slow": 3.0, "gone": 1.0, "zero": 0.0}
    curr = {"fast": 0.5, "slow": 7.0, "new": 9.9, "zero": 5.0}
    bad = bench.check_regressions(prev, curr)
    # slow: 3 -> 7 is >2x and above the floor -> fires
    assert len(bad) == 1 and bad[0].startswith("slow:"), bad
    # fast: 0.2 -> 0.5 is >2x but under the 0.75 s noise floor -> noise
    # new/gone: present on one side only -> recomposition, ignored
    # zero: old <= 0 -> ratio undefined, ignored
    assert bench.check_regressions(prev, {"slow": 5.9}) == []  # <2x: ok
    assert bench.check_regressions({}, curr) == []


def test_check_regressions_floor_param():
    prev, curr = {"q": 0.1}, {"q": 0.4}
    assert bench.check_regressions(prev, curr) == []  # under default floor
    assert len(bench.check_regressions(prev, curr, floor=0.05)) == 1


def test_load_prev_timings_both_shapes(tmp_path):
    line = {"metric": "headline_queries_total_sec", "queries": {"a": 1.5}}
    p1 = tmp_path / "line.json"
    p1.write_text(json.dumps(line))
    assert bench.load_prev_timings(str(p1)) == {"a": 1.5}
    wrapper = {"n": 7, "rc": 0, "tail": "noise\n" + json.dumps(line) + "\n"}
    p2 = tmp_path / "wrap.json"
    p2.write_text(json.dumps(wrapper))
    assert bench.load_prev_timings(str(p2)) == {"a": 1.5}


def test_check_flag_fires_end_to_end(tmp_path):
    """Deliberate-slowdown self-test: the previous artifact claims
    suite_scan_sort took 1 ms, so the real sf0.001 run (~0.3 s) is a
    >2x regression above the (env-lowered) floor — bench.py must exit
    non-zero and name the offender on stderr."""
    prev = tmp_path / "prev.json"
    prev.write_text(json.dumps({"queries": {"suite_scan_sort": 0.001}}))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_CHECK_FLOOR="0.05",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--only", "suite_scan_sort", "--check", str(prev)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 1, (r.returncode, r.stderr[-500:])
    assert "suite_scan_sort" in r.stderr and "REGRESSIONS" in r.stderr
